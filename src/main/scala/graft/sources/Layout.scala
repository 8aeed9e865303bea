package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout helpers for the 100 TB ingest side: hive-partitioned
  * parquet so downstream scans prune whole directories, the companion
  * of bucketing (BucketingSpec) for the join side.
  *
  * Partition columns should be low-cardinality dimensions the workload
  * filters on (event_type, date); pruning shows up in the scan node as
  * `PartitionFilters` and skips file listing + IO entirely for
  * non-matching partitions.
  */
object Layout {

  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
