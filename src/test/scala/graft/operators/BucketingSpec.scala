package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing = pre-shuffling at write time: both sides of a recurring
  * join stored bucketed by the join key join WITHOUT a shuffle — the
  * co-located-join strategy the engine prescribes for repeated joins at
  * 100 TB (pay the shuffle once at ingest, not per query). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def countShuffles(plan: SparkPlan): Int =
    plan.collect { case _: ShuffleExchangeExec => 1 }.sum

  test("bucketed-by-key tables join with zero shuffle exchanges") {
    // (managed tables land in the default ./spark-warehouse — static
    // conf, can't point it at a tempdir post-session; dropped in finally)
    // bucketed sort-merge beats broadcast only when both sides are big;
    // disable auto-broadcast so the plan shows the bucketing effect
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.Tables.lineitem(spark, sf()).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      graft.Tables.orders(spark, sf()).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")

      val bucketedJoin = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      val planned = bucketedJoin.queryExecution.executedPlan
      // the join itself introduces no exchange; only the final
      // aggregation shuffles (on the group key)
      val shuffles = countShuffles(planned)
      assert(shuffles <= 1, s"expected join without exchange, got $shuffles:\n$planned")

      // and the result matches the plain (shuffling) join
      val plain = graft.Tables.lineitem(spark, sf())
        .join(graft.Tables.orders(spark, sf()), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(_.toSeq).toSet
      assert(bucketedJoin.collect().map(_.toSeq).toSet == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
