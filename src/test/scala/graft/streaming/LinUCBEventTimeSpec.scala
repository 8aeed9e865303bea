package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ml.LinUCB
import graft.ml.LinUCB.{Feedback, Model}
import graft.streaming.LinUCBStream.TimedFeedback

/** Event-time trainer determinism: emission content must be a pure
  * function of the event history — identical whether the events arrive
  * in one micro-batch or one-by-one (a replay), and identical to the
  * batch seed. Runs against the RocksDB state store provider, the
  * production configuration the scaladoc documents. */
class LinUCBEventTimeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val events = Seq(
    TimedFeedback("p1", Array(1.0, 0.2), 1.0, ts("2024-01-01 00:00:01")),
    TimedFeedback("p1", Array(1.0, 0.7), 0.0, ts("2024-01-01 00:00:02")),
    TimedFeedback("p2", Array(1.0, 0.4), 1.0, ts("2024-01-01 00:00:03")),
    TimedFeedback("p1", Array(1.0, 0.9), 1.0, ts("2024-01-01 00:00:04")))

  // watermark advancers on a throwaway arm: push the watermark far past
  // every real deadline so all pending event-time timers fire
  private def flush(t: String) =
    TimedFeedback("zz_flush", Array(1.0, 0.0), 0.0, ts(t))

  private def runStream(batches: Seq[Seq[TimedFeedback]],
                        name: String): Map[String, Model] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TimedFeedback]
    val q = LinUCBStream.trainEventTime(mem.toDS(), dim = 2)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      mem.addData(flush("2024-01-01 01:00:00")); q.processAllAvailable()
      mem.addData(flush("2024-01-01 02:00:00")); q.processAllAvailable()
      spark.table(name).as[Model].collect()
        .groupBy(_.productId).map { case (p, ms) => p -> ms.maxBy(_.n) }.toMap
    } finally q.stop()
  }

  test("event-time timers: one-shot == per-event replay == batch seed (RocksDB)") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val oneGo = runStream(Seq(events), "et_one")
      val replay = runStream(events.map(Seq(_)), "et_replay")
      val batch = LinUCB.seed(
          events.map(e => Feedback(e.productId, e.x, e.reward)).toDS(), 2)
        .collect().map(m => m.productId -> m).toMap
      for ((pid, bm) <- batch) {
        for (got <- Seq(oneGo(pid), replay(pid))) {
          assert(got.n == bm.n, s"$pid n=${got.n} want ${bm.n}")
          assert(got.aInv.zip(bm.aInv).forall { case (a, b) => math.abs(a - b) < 1e-9 }, pid)
          assert(got.b.zip(bm.b).forall { case (a, b) => math.abs(a - b) < 1e-9 }, pid)
        }
      }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
