package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ml.LinUCB
import graft.ml.LinUCB.{Feedback, Model}
import graft.streaming.LinUCBStream.TimedFeedback

/** Long-haul soak for the CUSTOM stateful operator
  * ([[LinUCBStream.updateArmEventTime]], `flatMapGroupsWithState` +
  * EventTimeTimeout): `SupplierStatsLongHaulSpec` soaks the built-in
  * windowed aggregation, but the trainer carries hand-rolled state
  * (per-arm A/b accumulators + a timer deadline) whose encode/decode
  * and timer re-arm paths only RocksDB snapshot/changelog cycles at
  * tens of batches actually drive. 50 micro-batches, RocksDB provider,
  * cold checkpoint restart mid-run; final per-arm models (the max-n
  * emission — the trainer is Update-mode, so emission duplication on
  * restart replay is legal and the latest-model merge is the
  * documented consumer discipline) must equal the batch seed over the
  * same rows: state bit-survived the restart and 50 batches of store
  * maintenance. */
class LinUCBLongHaulSpec extends SparkSpec {
  import spark.implicits._

  private def ts(epochSec: Long) = new java.sql.Timestamp(
    1704067200000L + epochSec * 1000L)

  test("50 micro-batches on RocksDB with a mid-run restart equal the batch seed") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("linucb_longhaul_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("linucb_longhaul_out").toString
    val mem = MemoryStream[TimedFeedback]
    def start() = LinUCBStream.trainEventTime(mem.toDS(), dim = 2)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: Dataset[Model], _: Long) =>
        df.write.mode("append").parquet(out)
      }
      .start()

    // 50 batches, event time advancing 1 s per batch, 5 arms hit in a
    // rotating pattern (two per batch) — deadlines (first pending event
    // + 5 s) fire repeatedly as the watermark advances, so the run
    // exercises many emit → re-accumulate → re-arm cycles per arm.
    val Batches = 50
    def batchRows(i: Int): Seq[TimedFeedback] = Seq(
      TimedFeedback(s"p${i % 5}", Array(1.0, (i % 10) / 10.0),
        (i % 3).toDouble / 2.0, ts(i)),
      TimedFeedback(s"p${(i + 3) % 5}", Array(1.0, ((i * 7) % 10) / 10.0),
        ((i + 1) % 2).toDouble, ts(i)))
    val all = scala.collection.mutable.ArrayBuffer.empty[TimedFeedback]
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
      // flush: two watermark advancers on a throwaway arm push every
      // pending event-time timer (including the first flush's own)
      val f1 = TimedFeedback("zz_flush", Array(1.0, 0.0), 0.0, ts(3600))
      val f2 = TimedFeedback("zz_flush", Array(1.0, 0.0), 0.0, ts(7200))
      all += f1; all += f2
      mem.addData(f1); q.processAllAvailable()
      mem.addData(f2); q.processAllAvailable()
      q.stop()

      val streamed = spark.read.parquet(out).as[Model].collect()
        .groupBy(_.productId).map { case (p, ms) => p -> ms.maxBy(_.n) }
      val batch = LinUCB.seed(
          all.toSeq.map(e => Feedback(e.productId, e.x, e.reward)).toDS(), 2)
        .collect().map(m => m.productId -> m).toMap
      // every real arm present, none invented
      assert(streamed.keySet.filterNot(_ == "zz_flush") ==
        batch.keySet.filterNot(_ == "zz_flush"))
      for ((pid, bm) <- batch if pid != "zz_flush") {
        val got = streamed(pid)
        assert(got.n == bm.n, s"$pid n=${got.n} want ${bm.n}")
        assert(got.aInv.zip(bm.aInv).forall { case (a, b) => math.abs(a - b) < 1e-9 }, pid)
        assert(got.b.zip(bm.b).forall { case (a, b) => math.abs(a - b) < 1e-9 }, pid)
      }
      // the soak really spanned the restart: each arm saw ~20 events
      assert(batch.filterNot(_._1 == "zz_flush").values.forall(_.n >= 15),
        batch.view.mapValues(_.n).toMap.toString)
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
