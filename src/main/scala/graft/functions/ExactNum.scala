package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent numeric aggregation helpers.
  *
  * `sum(double)` is not associative-stable: at 1000 executors the partial
  * aggregation order differs run to run, and from any other engine. Money
  * columns in this dataset carry at most 2 decimal digits (the reference
  * also keeps money as double and rounds explicitly, e.g.
  * `orders-stats-flink/.../TableApp.kt:194`), so summing the values as
  * fixed-point decimals is exact, deterministic at any parallelism, and
  * reproducible bit-for-bit in DuckDB — which is what the oracle hash
  * compare requires. The per-row double→decimal cast is itself
  * deterministic (no double lies exactly on a decimal half-boundary).
  */
object ExactNum {
  /** Exact sum of a ≤2dp money column, returned as double. */
  def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum of an arbitrary-expression money product (kept to 4dp). */
  def moneySum4(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  def moneySum6(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Revenue expression shared by the dashboard/TPC-H-style queries:
    * extendedprice * (1 - discount), fixed to 4dp per row. The per-row
    * double multiply is IEEE-deterministic; the decimal cast pins it.
    */
  def revenue(price: Column, discount: Column): Column =
    (price * (lit(1.0) - discount)).cast(DecimalType(18, 4))
}
