package graft.ml

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ml.LinUCB.{Feedback, Model}

class PolicyAndStoreSpec extends SparkSpec {
  import spark.implicits._

  test("policy benchmark ranks LinUCB above the random baseline") {
    // The reference's relative oracle (evaluate.py): a learned policy
    // must beat random; random must sit near AUC 0.5.
    val sql = PolicyEval.evalSqlPolicies(spark, sf("0.01")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val linucb = PolicyEval.evalLinUCB(spark, sf("0.01")).collect()(0).getDouble(1)
    assert(math.abs(sql("random") - 0.5) < 0.02, s"random AUC ${sql("random")}")
    assert(linucb > sql("random") + 0.05, s"linucb $linucb vs random ${sql("random")}")
  }

  test("bootstrap-then-live: seed(history) + stream(live) == seed(history ++ live)") {
    val history = Seq(
      Feedback("p1", Array(1.0, 0.2), 1.0),
      Feedback("p1", Array(1.0, 0.7), 0.0),
      Feedback("p2", Array(1.0, 0.4), 1.0))
    val live = Seq(
      Feedback("p1", Array(1.0, 0.9), 1.0),
      Feedback("p2", Array(1.0, 0.1), 0.0),
      Feedback("p3", Array(1.0, 0.5), 1.0)) // unseen arm starts from zero state

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Feedback]
    val q = graft.streaming.LinUCBStream
      .trainWithBootstrap(history.toDS(), mem.toDS(), dim = 2, emitEveryMs = 0L)
      .writeStream.format("memory").queryName("boot_out")
      .outputMode("update").start()
    try {
      mem.addData(live: _*)
      q.processAllAvailable()
      val streamed = spark.table("boot_out").as[Model].collect()
        .groupBy(_.productId).map { case (p, ms) => p -> ms.maxBy(_.n) }
      val full = LinUCB.seed((history ++ live).toDS(), 2).collect()
        .map(m => m.productId -> m).toMap
      full.foreach { case (pid, bm) =>
        val sm = streamed(pid)
        assert(sm.n == bm.n, s"$pid n=${sm.n} want ${bm.n}")
        assert(sm.aInv.zip(bm.aInv).forall { case (x, y) => math.abs(x - y) < 1e-9 }, pid)
        assert(sm.b.zip(bm.b).forall { case (x, y) => math.abs(x - y) < 1e-9 }, pid)
      }
    } finally q.stop()
  }

  test("model store upsert is idempotent and keeps latest per arm") {
    val dir = java.nio.file.Files.createTempDirectory("modelstore").toFile
    val path = new java.io.File(dir, "models.parquet").getAbsolutePath
    val store = new ModelStore(path)
    val m1 = Seq(Model("p1", Array(1.0), Array(0.5), 1, 1L),
      Model("p2", Array(1.0), Array(0.1), 1, 1L)).toDS()
    val m2 = Seq(Model("p1", Array(2.0), Array(0.9), 1, 5L)).toDS()
    store.upsert(m1, 0L)
    store.upsert(m2, 1L)
    store.upsert(m2, 1L) // replayed batch — idempotent
    val out = store.read(spark).collect().map(m => m.productId -> m).toMap
    assert(out.size == 2)
    assert(out("p1").n == 5L && out("p1").b(0) == 0.9)
    assert(out("p2").n == 1L)
  }
}
