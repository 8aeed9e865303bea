package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec

/** Specs for the scale-path mechanics: salting preserves join semantics,
  * decimal-exact sums are partitioning-independent, the HLL distinct
  * sketch tracks the exact count. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join == plain join (row multiset), skew notwithstanding") {
    // 90% of fact rows share one key — the skew scenario.
    val fact = spark.range(20000).select(
      when($"id" % 10 =!= 0, lit(1L)).otherwise($"id" % 50).as("k"),
      ($"id" * 7 % 1000).as("v"))
    val dim = spark.range(50).select($"id".as("k"), concat(lit("d"), $"id").as("name"))
    val plain = fact.join(dim, "k")
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("k").collect().toSeq
    val salted = SkewJoin.salted(fact, dim, "k", salts = 8)
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("decimal money sums are identical under any partitioning") {
    val l = spark.read.parquet(sf("0.01") + "/lineitem.parquet")
    def total(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast(DecimalType(18, 4))).cast("double")).as[Double].collect()(0)
    val t1 = total(l.coalesce(1))
    val t32 = total(l.repartition(32))
    assert(t1 == t32, s"$t1 != $t32") // bitwise, not approx
  }

  test("approx distinct (HLL) lands within its error bound of exact") {
    val base = Relational.dashboardBase(spark, sf("0.01"))
    val (exact, approx) = base.agg(
      countDistinct($"o_orderkey").as("e"),
      approx_count_distinct($"o_orderkey", 0.01).as("a"))
      .as[(Long, Long)].collect()(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("approx percentiles (GK sketch) track exact quantiles per group") {
    val exact = graft.operators.Relational.valuePercentiles(spark, sf("0.01"))
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val approx = graft.operators.Relational.valuePercentilesApprox(spark, sf("0.01"))
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    for ((k, e) <- exact) {
      val a = approx(k)
      // rank error n/10000 on ~12k rows/group = a few ranks; values are
      // dense in [0, 1000], so a 1% value envelope is generous
      def close(x: Double, y: Double, tol: Double) = math.abs(x - y) <= tol
      assert(close(a._2, e._2, 0.01 * math.max(1.0, e._2)), s"$k p50 ${a._2} vs ${e._2}")
      assert(close(a._3, e._3, 0.01 * math.max(1.0, e._3)), s"$k p90 ${a._3} vs ${e._3}")
      assert(close(a._4, e._4, 0.01 * math.max(1.0, e._4)), s"$k p99 ${a._4} vs ${e._4}")
      assert(a._5 == e._5, s"$k max must be exact")
    }
  }
}
