package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-3 analytic surface: grouping sets vs manual union, value-range
  * frames, exact-sufficient-stats correlation vs direct float math,
  * histogram/cohort/gap-fill invariants. */
class Round3AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = sf()

  test("revenueGroupingSets equals the union of the three manual groupings") {
    val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")
    val li = Tables.lineitem(spark, sfDir)
    def agg(gs: Seq[String]) = {
      val grouped = if (gs.isEmpty) li.groupBy() else li.groupBy(gs.map(col): _*)
      val a = grouped.agg(count(lit(1)).as("n"),
        round(sum(rev).cast("double"), 2).as("revenue"))
      val withFlag = if (gs.contains("l_returnflag")) a.withColumn("flag", col("l_returnflag"))
        else a.withColumn("flag", lit("ALL"))
      val withStatus = if (gs.contains("l_linestatus")) withFlag.withColumn("status", col("l_linestatus"))
        else withFlag.withColumn("status", lit("ALL"))
      withStatus.select("flag", "status", "n", "revenue")
    }
    val manual = agg(Seq("l_returnflag", "l_linestatus"))
      .unionByName(agg(Seq("l_returnflag")))
      .unionByName(agg(Seq.empty))
      .collect().map(_.toSeq).toSet
    val gsResult = Analytics.revenueGroupingSets(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(gsResult == manual && gsResult.nonEmpty)
  }

  test("movingRevenue frames stay within one customer and within 30 days") {
    // re-derive each frame by brute force on the driver (sf0.001 is small)
    val rows = Tables.orders(spark, sfDir)
      .select($"o_orderkey".as[Long], $"o_custkey".as[Long],
        unix_seconds($"o_orderdate".cast("timestamp")).as[Long],
        $"o_totalprice".as[Double])
      .collect()
    val expected = rows.map { case (ok, ck, es, _) =>
      val s = rows.filter(r => r._2 == ck && r._3 <= es && r._3 >= es - 2592000L)
        .map(r => BigDecimal(r._4).setScale(4))
        .sum
      (ok, ck, es) -> s.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = Analytics.movingRevenue(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == rows.length)
    got.foreach { case (ok, ck, es, rev) =>
      assert(math.abs(rev - expected((ok, ck, es))) < 1e-6,
        s"order $ok: got $rev expected ${expected((ok, ck, es))}")
    }
  }

  test("corrStats matches direct double-precision correlation to output precision") {
    val direct = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag".as[String], $"l_quantity".as[Double],
        $"l_extendedprice".as[Double])
      .collect().groupBy(_._1).map { case (flag, rs) =>
        val n = rs.length.toDouble
        val xs = rs.map(_._2); val ys = rs.map(_._3)
        val sx = xs.sum; val sy = ys.sum
        val sxx = xs.map(x => x * x).sum
        val sxy = rs.map(r => r._2 * r._3).sum
        val syy = ys.map(y => y * y).sum
        flag -> (n * sxy - sx * sy) /
          (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      }
    val got = Analytics.corrStats(spark, sfDir)
      .select($"flag".as[String], $"corr_qp".as[Double]).collect().toMap
    assert(got.size == direct.size)
    got.foreach { case (flag, c) =>
      // query output carries round(..., 6): allow the half-ulp of that
      // rounding plus float noise from the spec's naive accumulation
      assert(math.abs(c - direct(flag)) < 5.1e-7, s"$flag: $c vs ${direct(flag)}")
      assert(c > -1.0 && c < 1.0)
    }
  }

  test("acctbalHistogram bins partition the customer table") {
    val h = Analytics.acctbalHistogram(spark, sfDir)
      .select($"bin".as[Long], $"n".as[Long], $"lo".as[Double]).collect()
    assert(h.map(_._2).sum == Tables.customer(spark, sfDir).count())
    h.foreach { case (bin, _, lo) => assert(lo == bin * 500.0 - 1000.0) }
    assert(h.map(_._1).distinct.length == h.length)
  }

  test("customerCohorts: cohorts are disjoint and match direct set algebra") {
    val o = Tables.orders(spark, sfDir)
    def yearSet(y: Int) = o.filter(year($"o_orderdate") === y)
      .select($"o_custkey".as[Long]).collect().toSet
    val y1 = yearSet(1995); val y2 = yearSet(1996)
    val got = Analytics.customerCohorts(spark, sfDir)
      .as[(Long, String)].collect().groupBy(_._2)
      .map { case (k, v) => k -> v.map(_._1).toSet }
    assert(got("retained") == (y1 intersect y2))
    assert(got("churned") == (y1 diff y2))
    assert((got("retained") intersect got("churned")).isEmpty)
  }

  test("gapFillHourly: dense hourly spine, zero-filled counts, monotone forward fill") {
    val g = Analytics.gapFillHourly(spark, sfDir)
      .select($"event_type".as[String], $"hour_us".as[Long], $"n".as[Long],
        $"last_active_us".as[Long])
      .collect().groupBy(_._1)
    val rawTotal = Tables.events(spark, sfDir).count()
    assert(g.values.map(_.map(_._3).sum).sum == rawTotal)
    g.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      // spine density: consecutive hours, no gaps
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._2 - a._2 == 3600L * 1000000L)
        case _ =>
      }
      // forward fill: last_active is the latest hour with n > 0 at or
      // before this slot (first slot always has n > 0 by construction)
      var lastActive = sorted.head._2
      assert(sorted.head._3 > 0)
      sorted.foreach { case (_, h, n, la) =>
        if (n > 0) lastActive = h
        assert(la == lastActive)
      }
    }
  }

  test("labelStats covers every vector exactly once and bounds hold") {
    val s = Similarity.labelStats(spark, sfDir)
      .select($"label".as[Int], $"n".as[Long], $"nrm_min".as[Double],
        $"nrm_max".as[Double]).collect()
    assert(s.map(_._2).sum == Tables.embeddings(spark, sfDir).count())
    s.foreach { case (_, _, lo, hi) => assert(lo >= 0.0 && lo <= hi) }
  }

  test("materializeLatest: no deleted keys, closed-form size, bumped quantities") {
    val m = Cdc.materializeLatest(spark, sfDir)
      .select($"order_id".as[Long], $"line_no".as[Int], $"quantity".as[Double])
      .collect()
    // every surviving key has h < 8; quantity bump iff h >= 4
    m.foreach { case (ok, ln, _) =>
      val h = math.floorMod(ok * 31 + ln, 10)
      assert(h < 8, s"deleted key ($ok,$ln) survived")
    }
    val expectedKeys = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey".as[Long], $"l_linenumber".as[Int]).collect()
      .distinct.count { case (ok, ln) => math.floorMod(ok * 31 + ln, 10) < 8 }
    assert(m.length == expectedKeys)
  }
}
