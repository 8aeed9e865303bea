package graft.ml

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ml.LinUCB.{Feedback, Model}

/** SURVEY §3.3 end-to-end: serve → feedback → stateful train → publish,
  * closed through the model store exactly as the reference closes it
  * through Redis. */
class ServingLoopSpec extends SparkSpec {
  import spark.implicits._

  test("bootstrap-publish + stream-train + store-upsert + topK serve compose") {
    val dir = java.nio.file.Files.createTempDirectory("loop").toFile
    val path = new java.io.File(dir, "models.parquet").getAbsolutePath
    val store = new ModelStore(path)

    val history = Seq(
      Feedback("arm_a", Array(1.0, 0.9), 1.0),
      Feedback("arm_a", Array(1.0, 0.1), 0.0),
      Feedback("arm_b", Array(1.0, 0.5), 1.0),
      Feedback("arm_cold", Array(1.0, 0.4), 1.0)) // history-only arm
    val live = Seq(
      Feedback("arm_a", Array(1.0, 0.8), 1.0),
      Feedback("arm_b", Array(1.0, 0.2), 0.0))

    // 1. publish the batch seed (the documented contract for arms that
    //    may never appear on the live stream)
    store.upsert(LinUCB.seed(history.toDS(), 2), batchId = -1L)

    // 2. stream live feedback through the stateful trainer into the store
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Feedback]
    val q = graft.streaming.LinUCBStream
      .trainWithBootstrap(history.toDS(), mem.toDS(), dim = 2, emitEveryMs = 0L)
      .writeStream.outputMode("update")
      .foreachBatch(store.sink)
      .start()
    try {
      mem.addData(live: _*)
      q.processAllAvailable()
    } finally q.stop()

    // 3. store now has: streamed models for live arms, seed for cold arm
    val stored = store.read(spark).collect().map(m => m.productId -> m).toMap
    assert(stored.keySet == Set("arm_a", "arm_b", "arm_cold"))
    assert(stored("arm_a").n == 3L, "live arm reflects history+live")
    assert(stored("arm_cold").n == 1L, "cold arm keeps its seed model")
    // streamed result equals a full batch seed over all data
    val full = LinUCB.seed((history ++ live).toDS(), 2).collect()
      .map(m => m.productId -> m).toMap
    stored.foreach { case (pid, sm) =>
      assert(sm.aInv.zip(full(pid).aInv).forall { case (x, y) => math.abs(x - y) < 1e-9 }, pid)
    }

    // 4. serve: broadcast-join the store against contexts, top-2 arms
    val contexts = Seq((0L, Seq(1.0, 0.9)), (1L, Seq(1.0, 0.1)))
      .toDF("ctx_id", "x")
    val served = LinUCB.topK(contexts, store.read(spark), alpha = 0.3, k = 2)(spark)
    val perCtx = served.collect().groupBy(_.getLong(0))
    assert(perCtx.keySet == Set(0L, 1L))
    assert(perCtx.values.forall(_.map(_.getLong(2)).sorted.sameElements(Seq(1L, 2L))))
  }
}
