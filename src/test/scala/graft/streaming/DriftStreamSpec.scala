package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** The hour window a timestamp lands in, computed the way Spark's
    * `window()` does — epoch-aligned flooring — so the expected values
    * hold in any JVM timezone (Timestamp.toString rendering does not). */
  private def hourWindow(s: String): java.sql.Timestamp =
    new java.sql.Timestamp(ts(s).getTime / 3600000L * 3600000L)

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
      // the exact closed-window set: hours 0 and 1 for both types plus
      // the watermark pusher's own [03:00, 04:00) window for type "a"
      val closed = streamedCounts
        .select("window_start", "event_type").distinct().collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start"),
          r.getAs[String]("event_type"))).toSet
      assert(closed == Set(
        (hourWindow("2024-01-01 00:10:00"), "a"), (hourWindow("2024-01-01 00:10:00"), "b"),
        (hourWindow("2024-01-01 01:10:00"), "a"), (hourWindow("2024-01-01 01:10:00"), "b"),
        (hourWindow("2024-01-01 03:00:00"), "a")), s"unexpected closed windows: $closed")

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
      val psiOf = streamPsi.map(r => (r.getAs[java.sql.Timestamp]("window_start"),
        r.getAs[String]("event_type")) -> r.getAs[Double]("psi")).toMap
      val h0 = hourWindow("2024-01-01 00:10:00"); val h1 = hourWindow("2024-01-01 01:10:00")
      assert(psiOf((h1, "b")) > psiOf((h0, "b")),
        s"shifted type not flagged: $psiOf")
    } finally q.stop()
  }

  test("down-shifted values clamp into bin 0 and unknown types flag drift") {
    implicit val sqlCtx = spark.sqlContext
    // reference knows types a ∈ [1,3] and b ∈ [10,12] — NOT type c
    val reference = DriftStream.referenceShares(
      Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
        ("b", 10.0), ("b", 11.0), ("b", 12.0))
        .toDF("event_type", "value")).cache()
    val mem = MemoryStream[(String, Double, java.sql.Timestamp)]
    val counts = DriftStream.windowedBinCounts(
      mem.toDF().toDF("event_type", "value", "ts"), reference)
    val q = counts.writeStream.format("memory").queryName("drift_edge")
      .outputMode("append").start()
    try {
      mem.addData(
        // type b shifts BELOW its fitted range — must clamp to bin 0,
        // not vanish into a negative bin id
        ("b", 5.0, ts("2024-01-01 00:10:00")),
        ("b", 5.5, ts("2024-01-01 00:20:00")),
        // type c did not exist when the reference was fitted
        ("c", 7.0, ts("2024-01-01 00:15:00")),
        // watermark pusher
        ("a", 2.0, ts("2024-01-01 03:00:00")))
      q.processAllAvailable()
      mem.addData(("a", 2.0, ts("2024-01-01 05:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("drift_edge")
      val h0 = hourWindow("2024-01-01 00:10:00")
      val binsOf = streamed.collect().map(r =>
        (r.getAs[java.sql.Timestamp]("window_start"),
          r.getAs[String]("event_type")) -> r.getAs[Int]("bin")).toMap
      assert(binsOf((h0, "b")) == 0, s"down-shift not clamped to bin 0: $binsOf")
      assert(binsOf((h0, "c")) == -1, s"unknown type not tagged bin -1: $binsOf")

      val psi = DriftStream.psiOfBinCounts(streamed, reference)
        .filter(col("window_start") === h0).collect()
        .map(r => r.getAs[String]("event_type") ->
          (Option(r.getAs[java.lang.Double]("psi")), r.getAs[Boolean]("drifted"))).toMap
      // all live mass in bin 0 where the reference holds ε — max drift
      assert(psi("b")._2 && psi("b")._1.exists(_ > graft.functions.Drift.Threshold),
        s"down-shift not flagged: $psi")
      // a structurally new type is an alert with no defined PSI
      assert(psi("c") == (None, true), s"unknown type not flagged: $psi")
    } finally q.stop()
  }
}
