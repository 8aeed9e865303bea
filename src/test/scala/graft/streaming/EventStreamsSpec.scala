package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch-vs-stream agreement for session windows and the stream-stream
  * interval join (the reference's multi-engine cross-check pattern,
  * SURVEY.md §5.3, applied to the event-analytics operators). */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // (user_id, ts, value): user 1 has two sessions split by a >30min gap;
  // user 2 has one session; the final far-future row closes everything.
  private val sessionRows = Seq(
    (1L, "2024-01-01 00:00:00", 1.0),
    (1L, "2024-01-01 00:10:00", 2.5),
    (1L, "2024-01-01 01:00:00", 4.0), // 50 min after previous → new session
    (2L, "2024-01-01 00:05:00", 7.25),
    (9L, "2024-01-02 12:00:00", 0.0)) // watermark pusher

  test("streaming session windows equal the batch session_window result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val in = mem.toDF().toDF("user_id", "ts_s", "value")
      .select($"user_id", to_timestamp($"ts_s").as("ts"), $"value")
    val q = EventStreams.sessionAgg(in)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      mem.addData(sessionRows: _*)
      q.processAllAvailable()
      mem.addData((9L, "2024-01-03 00:00:00", 0.0)) // second batch closes the pusher's own session too
      q.processAllAvailable()
      val streamed = spark.table("sessions_out")
        .filter($"user_id" =!= 9L)
        .orderBy("user_id", "session_start_us")
        .collect().map(_.toSeq).toSeq

      val batch = sessionRows.toDF("user_id", "ts_s", "value")
        .select($"user_id", to_timestamp($"ts_s").as("ts"), $"value")
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).cast("long").as("n_events"),
          round(sum($"value".cast("decimal(18,2)")).cast("double"), 2)
            .as("session_value"))
        .select($"user_id",
          unix_micros($"session_window.start").as("session_start_us"),
          unix_micros($"session_window.end").as("session_end_us"),
          $"n_events", $"session_value")
        .filter($"user_id" =!= 9L)
        .orderBy("user_id", "session_start_us")
        .collect().map(_.toSeq).toSeq

      assert(streamed == batch && streamed.size == 3,
        s"streamed=$streamed batch=$batch")
      // user 1's first session: 2 events, merged span 00:00 → 00:10+30min
      val u1 = streamed.head
      assert(u1(3) == 2L && u1(4) == 3.5)
    } finally q.stop()
  }

  test("streaming transition pairs equal the batch lead-window result") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      EvIn(1L, 1L, 1000L, "view"), EvIn(1L, 2L, 2000L, "click"),
      EvIn(2L, 3L, 1500L, "view"),
      EvIn(1L, 4L, 3000L, "purchase"),          // arrives in batch 2
      EvIn(2L, 5L, 2500L, "error"), EvIn(2L, 6L, 2600L, "view"),
      EvIn(3L, 7L, 100L, "signup"))             // single event: no pair
    val mem = MemoryStream[EvIn]
    val q = EventStreams.transitionPairs(mem.toDS())
      .writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(3): _*)   // splits user 1 across batches
      q.processAllAvailable()
      mem.addData(rows.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("trans_out")
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
        .orderBy("from_type", "to_type").collect().map(_.toSeq).toSeq

      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      val batch = rows.toDF()
        .withColumn("to_type", lead($"event_type", 1).over(w))
        .filter($"to_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"to_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("from_type", "to_type").collect().map(_.toSeq).toSeq

      assert(streamed == batch && streamed.nonEmpty,
        s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("streaming funnel stage counts equal the batch funnel") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      // user 1: full funnel, split across batches
      EvIn(1L, 1L, 1000L, "view"), EvIn(1L, 2L, 2000L, "click"),
      EvIn(1L, 3L, 3000L, "purchase"),
      // user 2: click BEFORE any view (ignored), then view + later click
      EvIn(2L, 4L, 500L, "click"), EvIn(2L, 5L, 1000L, "view"),
      EvIn(2L, 6L, 1500L, "click"),
      // user 3: view only; user 4: purchase with no click (ignored)
      EvIn(3L, 7L, 100L, "view"), EvIn(4L, 8L, 100L, "purchase"))
    val mem = MemoryStream[EvIn]
    val q = EventStreams.funnelStages(mem.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(2): _*) // user 1 split mid-funnel
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("funnel_out")
        .groupBy("stage").agg(count(lit(1)).as("n_users"))
        .orderBy("stage").as[(String, Long)].collect().toSeq

      // batch reference: the q86 shape on the same rows
      val ev = rows.toDF()
      val view = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts_us").as("view_us"))
      val click = ev.filter($"event_type" === "click").join(view, "user_id")
        .filter($"ts_us" > $"view_us")
        .groupBy($"user_id").agg(min($"ts_us").as("click_us"))
      val purchase = ev.filter($"event_type" === "purchase").join(click, "user_id")
        .filter($"ts_us" > $"click_us")
        .groupBy($"user_id").agg(min($"ts_us").as("purchase_us"))
      val batch = Seq(
        ("1_view", view.count()), ("2_click", click.count()),
        ("3_purchase", purchase.count()))
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed.map(_._2) == Seq(3L, 2L, 1L))
    } finally q.stop()
  }

  test("count-min sketch as streaming state equals the batch sketch") {
    // Cms.sketchAgg is a plain Aggregator, so it runs unchanged as a
    // streaming global aggregate (complete mode): the sketch IS the
    // state, and elementwise-add merges make every micro-batch path
    // produce the same array as one batch pass.
    implicit val sqlCtx = spark.sqlContext
    val words = Seq("a", "b", "a", "c", "a", "b", "d", "a", "e", "b")
    val mem = MemoryStream[String]
    val q = mem.toDS().toDF("t")
      .agg(graft.functions.Cms.sketchAgg($"t", 64).as("sketch"))
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("complete").start()
    try {
      mem.addData(words.take(4): _*)
      q.processAllAvailable()
      mem.addData(words.drop(4): _*)
      q.processAllAvailable()
      val streamed = spark.table("cms_out")
        .select("sketch").as[Array[Long]].head().toSeq
      val batch = words.toDF("t")
        .agg(graft.functions.Cms.sketchAgg($"t", 64).as("sketch"))
        .as[Array[Long]].head().toSeq
      assert(streamed == batch)
      // and the estimate expression reads the streamed sketch correctly
      val est = spark.table("cms_out")
        .select(graft.functions.Cms.estimate($"sketch", lit("a"), 64))
        .as[Long].head()
      assert(est >= 4L && est <= words.size.toLong)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch join and expires state") {
    implicit val sqlCtx = spark.sqlContext
    val pMem = MemoryStream[(Long, Long, String)]
    val vMem = MemoryStream[(Long, Long, String, Double)]
    val p = pMem.toDF().toDF("p_event_id", "p_user", "p_ts_s")
      .select($"p_event_id", $"p_user", to_timestamp($"p_ts_s").as("p_ts"))
    val v = vMem.toDF().toDF("v_event_id", "v_user", "v_ts_s", "v_value")
      .select($"v_event_id", $"v_user", to_timestamp($"v_ts_s").as("v_ts"),
        $"v_value")
    val q = EventStreams.purchasesWithRecentViews(p, v)
      .writeStream.format("memory").queryName("pv_join_out")
      .outputMode("append").start()
    try {
      // views: two in-window for purchase 100, one too old, one other-user
      vMem.addData(
        (10L, 1L, "2024-01-01 09:30:00", 1.0),
        (11L, 1L, "2024-01-01 09:59:00", 2.0),
        (12L, 1L, "2024-01-01 08:00:00", 4.0), // > 1h before → no match
        (13L, 2L, "2024-01-01 09:45:00", 8.0))
      pMem.addData((100L, 1L, "2024-01-01 10:00:00"))
      q.processAllAvailable()
      val got = spark.table("pv_join_out")
        .select($"event_id", $"view_id").as[(Long, Long)].collect().toSet
      assert(got == Set((100L, 10L), (100L, 11L)), s"got $got")

      // a purchase far in the future: watermark advance expires old view
      // state; its only candidate views are long gone
      pMem.addData((200L, 1L, "2024-01-02 10:00:00"))
      q.processAllAvailable()
      val after = spark.table("pv_join_out").count()
      assert(after == 2, "expired views must not join")
    } finally q.stop()
  }
}
