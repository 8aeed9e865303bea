package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SupplierStats

/** Long-haul streaming soak: the restart specs in
  * `SupplierStatsStreamSpec` cover a handful of micro-batches, which
  * never drives the state store's maintenance paths (RocksDB snapshot
  * upload + changelog replay happen on a cadence measured in tens of
  * batches). This spec runs the supplier-stats query over 50
  * micro-batches against the RocksDB provider with a cold checkpoint
  * restart in the middle, then asserts the COMPLETE streamed output —
  * every closed window across both query incarnations — equals the
  * batch `SupplierStats.tumble` over the same rows: exactly-once per
  * window, no loss, no dupes, state intact across the restart. */
class SupplierStatsLongHaulSpec extends SparkSpec {
  import spark.implicits._

  private def orderJson(id: String, epochSec: Int, price: Double,
                        supplier: String): String = {
    val ts = java.time.LocalDateTime.ofEpochSecond(
      1704067200L + epochSec, 0, java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    s"""{"order_id":"$id","bid_time":"$ts","price":$price,""" +
      s""""item":"thing","supplier":"$supplier"}"""
  }

  test("50 micro-batches on RocksDB with a mid-run restart equal the batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("longhaul_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("longhaul_out").toString
    val mem = MemoryStream[String]
    def start() = SupplierStatsStream.stats(
      SupplierStatsStream.parseOrders(mem.toDF().select(col("value"))))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // 50 batches, event time advancing 2 s per batch over 5 s windows:
    // two suppliers per batch plus a deterministic out-of-order row
    // (1 s behind, inside the 5 s watermark) every third batch.
    val Batches = 50
    val all = scala.collection.mutable.ArrayBuffer.empty[String]
    def batchRows(i: Int): Seq[String] = {
      val t = i * 2
      val base = Seq(
        orderJson(s"a$i", t, (i % 7) + 1.25, "Alice"),
        orderJson(s"b$i", t + 1, (i % 5) + 0.50, "Bob"))
      if (i % 3 == 0 && i > 0) base :+ orderJson(s"l$i", t - 1, 0.75, "Late")
      else base
    }
    try {
      var q = start()
      (0 until Batches).foreach { i =>
        if (i == Batches / 2) { // cold restart mid-run, state recovered
          q.stop()
          q = start()
        }
        val rows = batchRows(i)
        all ++= rows
        mem.addData(rows: _*)
        q.processAllAvailable()
      }
      // final flush: push the watermark far past every data window
      val flush = orderJson("flush", 100000, 0.01, "Flush")
      all += flush
      mem.addData(flush)
      q.processAllAvailable()
      q.stop()

      val streamed = spark.read.parquet(out)
        .select($"window_start", $"supplier", $"total_price", $"cnt")
        .collect().map(_.toSeq).toSeq
      val batch = SupplierStats.tumble(
          SupplierStatsStream.parseOrders(all.toSeq.toDF("value")),
          col("bid_time"), col("supplier"), col("price"))
        .filter($"supplier" =!= "Flush") // its window never closes
        .select($"window_start", $"supplier", $"total_price", $"cnt")
        .collect().map(_.toSeq).toSeq
      assert(streamed.distinct.size == streamed.size,
        s"duplicated window emissions across the restart")
      assert(streamed.toSet == batch.toSet,
        s"streamed-only=${streamed.toSet -- batch.toSet} " +
          s"batch-only=${batch.toSet -- streamed.toSet}")
      // sanity on scale: ~20 windows per supplier across 3 suppliers
      assert(batch.size > 50, s"fixture closed only ${batch.size} windows")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
