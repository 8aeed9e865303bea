package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IngestMonitorStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // Two minute-windows, two sources. src_a: one passing doc (12 tokens
  // with stopwords, >= 50 chars) + one failing (short) per window;
  // src_b: failing docs only. A far-future row closes every window.
  private val passDoc =
    "the quick brown fox jumps over a lazy dog of great renown today"
  private val rows = Seq(
    ("src_a", passDoc, "2024-01-01 00:00:10"),
    ("src_a", "tiny doc", "2024-01-01 00:00:40"),
    ("src_b", "spam spam spam", "2024-01-01 00:00:20"),
    ("src_a", passDoc, "2024-01-01 00:01:15"),
    ("src_b", "buy now", "2024-01-01 00:01:30"),
    // watermark pusher (its own window may stay open; excluded below)
    ("src_a", passDoc, "2024-01-01 00:10:00"))
    .map { case (src, text, t) => (src, text, ts(t)) }

  private def withCols(df: org.apache.spark.sql.DataFrame) =
    df.toDF("source", "text", "ts")
      .withColumn("n_chars", IngestMonitorStream.charCount(col("text")))

  test("streaming ingest monitor: closed windows equal the batch core on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, java.sql.Timestamp)]
    val q = IngestMonitorStream.monitorStream(withCols(mem.toDF()))
      .writeStream.format("memory").queryName("ingest_monitor")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      // second batch advances the watermark past every first-minute
      // window so both sources' windows 0 and 1 emit
      mem.addData(("src_a", passDoc, ts("2024-01-01 00:20:00")))
      q.processAllAvailable()
      val streamed = spark.table("ingest_monitor")
        .filter(col("window_start") < "2024-01-01 00:10:00")
        .collect().map(_.toSeq).toSet
      val batch = IngestMonitorStream.ingestCore(
          IngestMonitorStream.docMetrics(withCols(rows.toDF())))
        .filter(col("window_start") < "2024-01-01 00:10:00")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch,
        s"stream:\n$streamed\nbatch:\n$batch")
      // sanity on the gate itself: src_a window 0 is 1/2 passed
      val w0 = spark.table("ingest_monitor")
        .filter(col("source") === "src_a" &&
          col("window_start") === "2024-01-01 00:00:00")
        .select("n_docs", "n_passed", "pass_rate")
        .as[(Long, Long, Double)].collect()
      assert(w0.toSeq == Seq((2L, 1L, 0.5)))
    } finally q.stop()
  }

  test("late document beyond the watermark is dropped, not re-opened") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, java.sql.Timestamp)]
    val q = IngestMonitorStream.monitorStream(withCols(mem.toDF()))
      .writeStream.format("memory").queryName("ingest_monitor_late")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData(("src_a", passDoc, ts("2024-01-01 00:20:00")))
      q.processAllAvailable()
      val before = spark.table("ingest_monitor_late").count()
      // watermark sits at 00:19 — this doc's 00:00 window is closed
      mem.addData(("src_a", passDoc, ts("2024-01-01 00:00:30")))
      q.processAllAvailable()
      val after = spark.table("ingest_monitor_late").count()
      assert(after == before, "late doc re-emitted a closed window")
    } finally q.stop()
  }
}
