package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SupplierStats

/** The reference's own correctness trick, turned into a test: the same
  * supplier-stats query must agree across engine modes (reference runs it
  * on Kafka Streams vs Flink DataStream vs Flink Table; here batch
  * DataFrame vs Structured Streaming over identical input —
  * SURVEY.md §5.3). */
class SupplierStatsStreamSpec extends SparkSpec {
  import spark.implicits._

  private def orderJson(id: String, bidTime: String, price: Double,
                        supplier: String): String =
    s"""{"order_id":"$id","bid_time":"$bidTime","price":$price,""" +
      s""""item":"thing","supplier":"$supplier"}"""

  // Fixture per FIXTURES.md §1: in-order rows, an out-of-order row inside
  // the watermark, two suppliers sharing a window.
  private val rows = Seq(
    orderJson("o1", "2024-01-01 00:00:01", 10.00, "Alice"),
    orderJson("o2", "2024-01-01 00:00:03", 20.50, "Alice"),
    orderJson("o3", "2024-01-01 00:00:04", 5.25, "Bob"),
    orderJson("o4", "2024-01-01 00:00:02", 1.00, "Bob"), // out-of-order, in grace
    orderJson("o5", "2024-01-01 00:00:07", 2.00, "Alice"),
    orderJson("o6", "2024-01-01 00:00:30", 9.99, "Bob")) // advances watermark far

  test("streaming append-mode stats equal batch stats on the same input") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val parsed = SupplierStatsStream.parseOrders(
      mem.toDF().select(col("value")))
    val q = SupplierStatsStream.stats(parsed)
      .writeStream.format("memory").queryName("stats_out")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      // o6 pushes the watermark to 00:00:25 → windows [0,5) and [5,10)
      // are closed and emitted; o6's own window [30,35) stays open.
      val streamed = spark.table("stats_out")
        .orderBy("window_start", "supplier")
        .collect().map(_.toSeq).toSeq

      val batch = SupplierStats.tumble(
        SupplierStatsStream.parseOrders(rows.toDF("value")),
        col("bid_time"), col("supplier"), col("price"))
        .filter($"window_start" < "2024-01-01 00:00:30")
        .orderBy("window_start", "supplier")
        .collect().map(_.toSeq).toSeq

      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // spot-check the flagship numbers: Alice [0,5) = 10.00+20.50
      val alice0 = streamed.find(r =>
        r(2) == "Alice" && r(0) == "2024-01-01 00:00:00").get
      assert(alice0(3) == 30.5 && alice0(4) == 2L)
    } finally q.stop()
  }

  test("idle sub-stream cannot stall the watermark: its windows still close (T3)") {
    // Flink needs per-partition idleness (SupplierWatermarkStrategy.kt:32)
    // because its watermark is the MIN across partitions — one idle
    // partition stalls everything. Structured Streaming computes the
    // watermark from the max event time OBSERVED across the whole
    // source set, so an idle sub-stream holds nothing back; only a
    // fully idle source freezes the watermark. Demonstrated here: the
    // idle stream's early window closes on the strength of the ACTIVE
    // stream's progress alone.
    implicit val sqlCtx = spark.sqlContext
    val idle = MemoryStream[String]
    val active = MemoryStream[String]
    val parsed = SupplierStatsStream.parseOrders(
      idle.toDF().select(col("value"))
        .unionByName(active.toDF().select(col("value"))))
    val q = SupplierStatsStream.stats(parsed)
      .writeStream.format("memory").queryName("stats_idle")
      .outputMode("append").start()
    try {
      idle.addData(orderJson("i1", "2024-01-01 00:00:01", 3.00, "Idle"))
      q.processAllAvailable()
      // idle stream goes quiet; only the active stream advances
      active.addData(orderJson("a1", "2024-01-01 00:00:30", 1.00, "Act"))
      q.processAllAvailable()
      active.addData(orderJson("a2", "2024-01-01 00:01:00", 1.00, "Act"))
      q.processAllAvailable()
      val closed = spark.table("stats_idle")
        .filter(col("supplier") === "Idle").collect()
      assert(closed.length == 1 && closed(0).getAs[Double]("total_price") == 3.0,
        "idle sub-stream's window must close from the active stream's watermark")
    } finally q.stop()
  }

  test("update mode re-emits a window when in-grace data arrives late (T5)") {
    // Flink's allowed-lateness "update the already-emitted window"
    // behavior maps to OutputMode.Update: the window's row appears
    // again with refreshed totals when a late-but-in-watermark record
    // lands (SURVEY §2.9 T5 divergence note: firing timing differs,
    // final totals agree).
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = SupplierStatsStream.stats(
      SupplierStatsStream.parseOrders(mem.toDF().select(col("value"))))
      .writeStream.format("memory").queryName("stats_upd")
      .outputMode("update").start()
    try {
      mem.addData(orderJson("u1", "2024-01-01 00:00:01", 10.00, "Alice"))
      q.processAllAvailable()
      // within watermark (delay 5 s): same window updates
      mem.addData(orderJson("u2", "2024-01-01 00:00:02", 5.00, "Alice"))
      q.processAllAvailable()
      val emits = spark.table("stats_upd")
        .filter($"window_start" === "2024-01-01 00:00:00" && $"supplier" === "Alice")
        .select($"total_price", $"cnt").as[(Double, Long)].collect().toSeq
      assert(emits.contains((10.0, 1L)) && emits.contains((15.0, 2L)),
        s"got $emits")
    } finally q.stop()
  }

  test("unparseable bid_time falls back, missing fields get defaults") {
    val df = SupplierStatsStream.parseOrders(
      Seq("""{"order_id":"x","bid_time":"not a time","item":"i"}""")
        .toDF("value"))
    val r = df.collect()(0)
    assert(!r.isNullAt(r.fieldIndex("bid_time"))) // processing-time fallback
    assert(r.getAs[Double]("price") == 0.0)
    assert(r.getAs[String]("supplier") == "UNKNOWN")
  }

  test("checkpoint recovery: restart resumes offsets, no loss or dupes (T11)") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("ckpt_out").toString
    val mem = MemoryStream[String]
    // memory sink can't recover from a checkpoint; the file sink can —
    // and its exactly-once file manifest is the dupe/loss check itself.
    def start() = SupplierStatsStream.stats(
      SupplierStatsStream.parseOrders(mem.toDF().select(col("value"))))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    mem.addData(
      orderJson("c1", "2024-01-01 00:00:01", 10.00, "Alice"),
      orderJson("c2", "2024-01-01 00:00:30", 1.00, "Bob")) // closes [0,5)
    q1.processAllAvailable()
    val afterFirst = spark.read.parquet(out).count()
    q1.stop()

    // restart from the checkpoint; push the watermark past [30,35)
    val q2 = start()
    mem.addData(orderJson("c3", "2024-01-01 00:01:00", 2.00, "Alice"))
    q2.processAllAvailable()
    try {
      val rows = spark.read.parquet(out)
        .select($"window_start", $"supplier", $"total_price", $"cnt")
        .collect().map(_.toSeq).toSeq
      // exactly one emission per closed window across the restart:
      assert(rows.distinct.size == rows.size, s"duplicated emissions: $rows")
      assert(rows.contains(Seq("2024-01-01 00:00:00", "Alice", 10.0, 1L)))
      assert(rows.contains(Seq("2024-01-01 00:00:30", "Bob", 1.0, 1L)))
      assert(afterFirst >= 1)
    } finally q2.stop()
  }

  test("forkBatch drives two live sinks from one streaming query") {
    implicit val sqlCtx = spark.sqlContext
    val tracker = new SupplierStatsStream.StreamTimeTracker
    val validSeen = scala.collection.mutable.ArrayBuffer.empty[String]
    val lateSeen = scala.collection.mutable.ArrayBuffer.empty[String]
    val mem = MemoryStream[String]
    val fork: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      SupplierStatsStream.forkBatch(tracker)(
        v => validSeen.synchronized {
          validSeen ++= v.select("order_id").as[String].collect() },
        l => lateSeen.synchronized {
          lateSeen ++= l.filter(col("late")).select("order_id").as[String].collect() })
    val q = SupplierStatsStream.parseOrders(mem.toDF().select(col("value")))
      .writeStream.outputMode("append")
      .foreachBatch(fork)
      .start()
    try {
      mem.addData(orderJson("f1", "2024-01-01 00:01:00", 1, "S"))
      q.processAllAvailable()
      mem.addData(
        orderJson("f2", "2024-01-01 00:00:01", 1, "S"), // window closed long ago
        orderJson("f3", "2024-01-01 00:01:02", 1, "S"))
      q.processAllAvailable()
      assert(validSeen.sorted == Seq("f1", "f3"), s"valid=$validSeen")
      assert(lateSeen.toSeq == Seq("f2"), s"late=$lateSeen")
    } finally q.stop()
  }

  test("forkBatch tags against observed stream time and routes branches") {
    val tracker = new SupplierStatsStream.StreamTimeTracker
    var valid = Seq.empty[String]
    var late = Seq.empty[String]
    def run(batch: Seq[String], id: Long): Unit =
      SupplierStatsStream.forkBatch(tracker)(
        v => valid = v.select("order_id").as[String].collect().toSeq,
        l => late = l.filter(col("late")).select("order_id").as[String].collect().toSeq)(
        SupplierStatsStream.parseOrders(batch.toDF("value")), id)

    // Batch 1: advances stream time to 00:01:00.
    run(Seq(orderJson("a", "2024-01-01 00:01:00", 1, "S")), 0)
    assert(valid == Seq("a") && late.isEmpty)
    // Batch 2: a record whose window [0,5) closed at 00:00:10 (incl.
    // grace) long before stream time 00:01:00 → late; a fresh record is
    // valid. Mirrors LateRecordProcessor.kt:46-64 math.
    run(Seq(
      orderJson("b", "2024-01-01 00:00:01", 1, "S"),
      orderJson("c", "2024-01-01 00:01:02", 1, "S")), 1)
    assert(valid == Seq("c") && late == Seq("b"))
  }

  test("framed-Avro stream decodes through the same windowed stats (S9 end-to-end)") {
    import graft.sources.AvroSerde
    implicit val sqlCtx = spark.sqlContext
    // encode the same six orders as registry-framed Avro payloads
    val orderRows = Seq(
      AvroSerde.OrderRow("o1", "2024-01-01 00:00:01", 10.00, "item", "Alice"),
      AvroSerde.OrderRow("o2", "2024-01-01 00:00:03", 20.50, "item", "Alice"),
      AvroSerde.OrderRow("o3", "2024-01-01 00:00:04", 5.25, "item", "Bob"),
      AvroSerde.OrderRow("o4", "2024-01-01 00:00:02", 1.00, "item", "Bob"),
      AvroSerde.OrderRow("o5", "2024-01-01 00:00:07", 2.00, "item", "Alice"),
      AvroSerde.OrderRow("o6", "2024-01-01 00:00:30", 9.99, "item", "Bob"))
    val payloads = AvroSerde.encodeOrdersFramed(orderRows.toDS())
      .select("value").as[Array[Byte]].collect()
    val mem = MemoryStream[Array[Byte]]
    val parsed = SupplierStatsStream.parseAvroFramedOrders(
      mem.toDF().select(col("value")))
    val q = SupplierStatsStream.stats(parsed)
      .writeStream.format("memory").queryName("avro_stats_out")
      .outputMode("append").start()
    try {
      mem.addData(payloads: _*)
      q.processAllAvailable()
      val got = spark.table("avro_stats_out")
        .select("supplier", "total_price", "cnt")
        .as[(String, Double, Long)].collect().toSet
      // same closed windows as the JSON-stream test: [0,5) and [5,10)
      assert(got == Set(("Alice", 30.50, 2L), ("Bob", 6.25, 2L), ("Alice", 2.00, 1L)),
        s"got $got")
    } finally q.stop()
  }
}
