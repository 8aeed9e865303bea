package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Online ANN serving: streamed query batches must score exactly like
  * the batch operator — same corpus, same codes, same ranks. */
class AnnServeStreamSpec extends SparkSpec {
  import spark.implicits._

  test("served micro-batches equal the batch SQ8 top-k per query set") {
    implicit val sqlCtx = spark.sqlContext
    // real corpus vectors as the query stream (ids re-keyed so results
    // are distinguishable from the corpus side's vec_id)
    val corpus = graft.Tables.embeddings(spark, sf())
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().toMap
    val batch1 = Seq(1000L -> corpus(0L), 1001L -> corpus(3L))
    val batch2 = Seq(1002L -> corpus(7L))
    val mem = MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val q = AnnServeStream.serve(spark, sf(),
      mem.toDF().toDF("qid", "qemb")) { out =>
      got.synchronized {
        got ++= out.as[(Long, Long, Long, Double)].collect()
      }
    }
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      val afterFirst = got.synchronized(got.size)
      assert(afterFirst == 2 * 5, s"batch1 served $afterFirst rows")
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val expect = graft.operators.Sq.sqTopKFor(spark, sf(),
          (batch1 ++ batch2).toDF("qid", "qemb"))
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got.synchronized(got.toSet) == expect,
        s"served:\n${got.sortBy(r => (r._1, r._3))}\nbatch:\n${expect.toSeq.sortBy(r => (r._1, r._3))}")
    } finally q.stop()
  }
}
