package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // two hour-windows per type; type "b" shifts its distribution in the
  // second hour, type "a" stays put
  private val rows = Seq(
    ("a", 1.0, "2024-01-01 00:10:00"), ("a", 2.0, "2024-01-01 00:20:00"),
    ("a", 3.0, "2024-01-01 00:30:00"), ("b", 10.0, "2024-01-01 00:15:00"),
    ("b", 11.0, "2024-01-01 00:25:00"), ("b", 12.0, "2024-01-01 00:35:00"),
    ("a", 1.5, "2024-01-01 01:10:00"), ("a", 2.5, "2024-01-01 01:20:00"),
    ("b", 99.0, "2024-01-01 01:15:00"), ("b", 99.5, "2024-01-01 01:25:00"),
    // watermark pusher: closes both hours
    ("a", 2.0, "2024-01-01 03:00:00"))
    .map { case (t, v, s) => (t, v, ts(s)) }

  test("streaming windowed PSI equals the batch fold over the same rows") {
    implicit val sqlCtx = spark.sqlContext
    // reference = the first hour's distribution (the training snapshot)
    val reference = DriftStream.referenceShares(
      rows.toDF("event_type", "value", "ts")
        .filter($"ts" < ts("2024-01-01 01:00:00"))
        .select($"event_type", $"value")).cache()
    val mem = MemoryStream[(String, Double, java.sql.Timestamp)]
    val counts = DriftStream.windowedBinCounts(
      mem.toDF().toDF("event_type", "value", "ts"), reference)
    val q = counts.writeStream.format("memory").queryName("drift_counts")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData(("a", 2.0, ts("2024-01-01 05:00:00")))
      q.processAllAvailable()
      val streamedCounts = spark.table("drift_counts")
      // both closed hours must be present for both types
      assert(streamedCounts.select("window_start").distinct().count() >= 2)

      val streamPsi = DriftStream.psiOfBinCounts(streamedCounts, reference)
        .orderBy("window_start", "event_type").collect()

      // batch twin: same rows, same windows, same reference
      val batchCounts = rows.toDF("event_type", "value", "ts")
        .join(broadcast(reference.select("event_type", "lo", "hi").distinct()),
          "event_type")
        .withColumn("bin", DriftStream.binOf(col("value"), col("lo"), col("hi")))
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"), col("bin"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("bin"), col("n"))
        // restrict to the windows the stream closed
        .join(streamedCounts.select("window_start").distinct(), "window_start")
      val batchPsi = DriftStream.psiOfBinCounts(batchCounts, reference)
        .orderBy("window_start", "event_type").collect()

      assert(streamPsi.map(_.toSeq).toSeq == batchPsi.map(_.toSeq).toSeq,
        "streaming PSI diverges from the batch fold")
      // the shifted type must read as more drifted in its shifted hour
      val psiOf = streamPsi.map(r => (r.getAs[java.sql.Timestamp]("window_start").toString,
        r.getAs[String]("event_type")) -> r.getAs[Double]("psi")).toMap
      val h0 = "2024-01-01 00:00:00.0"; val h1 = "2024-01-01 01:00:00.0"
      assert(psiOf((h1, "b")) > psiOf((h0, "b")),
        s"shifted type not flagged: $psiOf")
    } finally q.stop()
  }
}
