package graft

import org.apache.spark.sql.DataFrame

class SessionCacheSpec extends SparkSpec {
  import spark.implicits._

  /** RDD id behind a localCheckpointed frame (−1 if none). */
  private def ckptId(df: DataFrame): Int = {
    var id = -1
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => id = l.rdd.id
      case _ => ()
    }
    id
  }

  test("LRU bound: a second layer variant evicts the first and releases its checkpoint blocks") {
    val cache = new SessionCache[Int, DataFrame](
      maxEntries = 1, onEvict = SessionCache.unpersistCheckpoint)
    def build(i: Int) = Seq((i.toLong, s"v$i")).toDF("k", "v").localCheckpoint()
    val a = cache.getOrCompute(spark, 1)(build(1))
    val aId = ckptId(a)
    assert(aId >= 0 && spark.sparkContext.getPersistentRDDs.contains(aId),
      "first layer not pinned after build")
    val b = cache.getOrCompute(spark, 2)(build(2))
    val bId = ckptId(b)
    // the bound evicted entry 1 AND released its executor blocks — a
    // second (sfDir, threshold) variant must not double pinned storage
    assert(!spark.sparkContext.getPersistentRDDs.contains(aId),
      "evicted layer still pins its checkpoint blocks")
    assert(spark.sparkContext.getPersistentRDDs.contains(bId),
      "resident layer lost its blocks")
    // the resident entry is served from cache, not rebuilt
    val b2 = cache.getOrCompute(spark, 2)(fail("entry 2 should be cached"))
    assert(b2.as[(Long, String)].collect().toSeq == Seq((2L, "v2")))
  }

  test("hits keep an entry resident and never rebuild it") {
    var builds = 0
    val cache = new SessionCache[String, Int](maxEntries = 2)
    assert(cache.getOrCompute(spark, "a") { builds += 1; 10 } == 10)
    assert(cache.getOrCompute(spark, "a") { builds += 1; 99 } == 10)
    assert(builds == 1)
    // access order: touching "a" makes "b" the LRU victim
    cache.getOrCompute(spark, "b") { 20 }: Unit
    cache.getOrCompute(spark, "a") { builds += 1; 99 }: Unit
    cache.getOrCompute(spark, "c") { 30 }: Unit // evicts "b", not "a"
    assert(cache.getOrCompute(spark, "a") { builds += 1; 99 } == 10)
    assert(builds == 1, "LRU evicted the most-recently-used entry")
  }
}
