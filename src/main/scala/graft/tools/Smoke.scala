package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: schema/plan inspection on the sf0.001 data. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts2", timestamp_micros((col("ts") / 1000L).cast("long")))
    ev.printSchema()
    ev.show(3, truncate = false)
    println("count=" + ev.count())
    spark.stop()
  }
}
