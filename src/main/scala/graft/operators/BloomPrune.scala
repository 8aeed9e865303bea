package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.Tables
import graft.functions.ExactNum._

/** Bloom-filter join pruning — the scale move for a selective
  * dim-filter joining a huge fact: build a bloom over the FILTERED dim
  * keys (small), probe it on the fact side BEFORE the join shuffle, so
  * only might-match rows are ever exchanged. False positives are
  * eliminated by the exact join that follows, so the rewrite is
  * semantics-preserving by construction — the oracle is the plain join.
  *
  * This is the manual, deterministic form of Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` row-level runtime filter
  * (which injects the same BloomFilterAggregate/MightContain pair under
  * AQE when stats justify it). Building the sketch via
  * `df.stat.bloomFilter` keeps the bitmap bounded (numBits from
  * expectedItems×fpp, independent of fact size); probing reuses
  * Catalyst's codegen'd [[BloomFilterMightContain]], so the probe stays
  * inside whole-stage codegen — no Scala UDF on the hot path.
  *
  * Reference corollary: the dashboards join full dims every refresh
  * (`product-demos/producer/api.py:102-107`); at 100 TB the equivalent
  * join wants exactly this pre-shuffle pruning.
  */
object BloomPrune {

  /** `fact` rows whose `factKey` might be in `dim`'s `dimKey` set.
    * Key columns must be integral (probed as long).
    *
    * `expectedItems <= 0` (the default) sizes the filter from
    * `dim.count()` — one cheap action over the already-filtered dim
    * side. A fixed capacity would silently saturate at larger scale
    * factors (fpp degrades toward 1 and the pruning claim evaporates,
    * even though the exact join keeps the RESULT correct); callers that
    * know a tight upper bound can pass it to skip the count.
    *
    * The built sketch (count pass + aggregation pass) is memoized per
    * (session, canonicalized dim plan, key, sizing) — repeat callers
    * of the same pruned join (dashboard refresh, bench iterations)
    * reuse the serialized bitmap instead of re-scanning the dim twice
    * per call. Keying on the CANONICALIZED logical plan makes cache
    * identity semantic equality, so two different dims can never
    * collide into each other's bitmap (a false sharing there would
    * wrongly drop fact rows — the exact join only repairs false
    * POSITIVES, never false negatives). Like every session layer
    * ([[graft.SessionCache]]), the memo assumes the data under a plan
    * is immutable for the session — an in-place refresh of the dim's
    * files mid-session requires a new session to avoid a stale
    * bitmap, the standard warehouse snapshot assumption. */
  def prunedFact(fact: DataFrame, factKey: String,
                 dim: DataFrame, dimKey: String,
                 expectedItems: Long = -1L,
                 fpp: Double = 0.01): DataFrame = {
    val cacheKey = (dim.queryExecution.analyzed.canonicalized,
      dimKey, expectedItems, fpp)
    val bytes = bloomCache.getOrCompute(dim.sparkSession, cacheKey) {
      val expected =
        if (expectedItems > 0) expectedItems else math.max(dim.count(), 1L)
      val bf = dim.stat.bloomFilter(dimKey, expected, fpp)
      val bos = new ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val mightContain: Column = GraftShims.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      GraftShims.expression(col(factKey).cast("long"))))
    fact.filter(mightContain)
  }

  private val bloomCache = new graft.SessionCache[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, Long, Double),
    Array[Byte]]()

  /** Monthly revenue from URGENT-priority orders: bloom on the filtered
    * order keys prunes ~4/5 of lineitem before the join shuffle. */
  def urgentRevenueByMonth(spark: SparkSession, sfDir: String): DataFrame = {
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val fact = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    prunedFact(fact, "l_orderkey", urgent, "o_orderkey")
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
      .agg(
        round(moneySum4(revenue(col("l_extendedprice"), col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }
}
