package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession

/** Column-API entry points for the engine's custom Catalyst expressions. */
package object functions {
  /** 64-bit FNV-1a fingerprint of a string column (codegen'd). */
  def fnv1a64(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      Fnv1a64(org.apache.spark.sql.GraftShims.expression(c)))

  /** Register SQL-callable names for the custom expressions. */
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv1a64", exprs => Fnv1a64(exprs.head), "scala_udf")
  }
}
