package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract checks for q164 (ensemble quality blend) and q165
  * (hard-negative mining). */
class EnsembleNegativesSpec extends SparkSpec {

  private def r6(x: Double) = math.rint(x * 1e6) / 1e6

  test("quality ensemble: percentiles and blend recompute driver-side") {
    val out = TextOps.qualityEnsemble(spark, sf()).collect()
    assert(out.nonEmpty)
    val n = out.length
    val lm = out.map(_.getDouble(1)).sorted
    val sur = out.map(_.getDouble(2)).sorted
    val ent = out.map(_.getDouble(3)).sorted
    def cntLess(sorted: Array[Double], v: Double): Long = {
      var lo = 0; var hi = sorted.length
      while (lo < hi) {
        val m = (lo + hi) / 2
        if (sorted(m) < v) lo = m + 1 else hi = m
      }
      lo.toLong
    }
    out.foreach { r =>
      val rLm = cntLess(lm, r.getDouble(1))
      // surprisal ranks DESCENDING: count of strictly larger values
      val rSur = (n - cntLess(sur, r.getDouble(2)) -
        sur.count(_ == r.getDouble(2))).toLong
      val rEnt = cntLess(ent, r.getDouble(3))
      assert(r.getDouble(4) == r6(rLm.toDouble / (n - 1)), s"p_lm doc ${r.getLong(0)}")
      assert(r.getDouble(5) == r6(rSur.toDouble / (n - 1)), s"p_sur doc ${r.getLong(0)}")
      assert(r.getDouble(6) == r6(rEnt.toDouble / (n - 1)), s"p_ent doc ${r.getLong(0)}")
      val blend = r6((rLm + rSur + rEnt) / (3.0 * (n - 1)))
      assert(r.getDouble(7) == blend, s"blend doc ${r.getLong(0)}")
      assert(r.getBoolean(8) == (blend >= 0.5))
    }
    val kept = out.count(_.getBoolean(8))
    assert(kept > 0 && kept < n, "the blend gate must discriminate on the fixture")
  }

  test("quality ensemble: signals agree with their source operators") {
    val ens = TextOps.qualityEnsemble(spark, sf()).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val lm = TextOps.lmScore(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val sur = TextOps.unigramSurprisal(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ent = TextOps.tokenEntropy(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    ens.foreach { case (d, (l, s, e)) =>
      assert(lm(d) == l && sur(d) == s && ent(d) == e, s"signal drift at doc $d")
    }
  }

  test("hard negatives: wrong-label only, ranks dense, exactly the filtered brute") {
    val out = Similarity.hardNegatives(spark, sf()).collect()
    assert(out.length == 50)
    out.foreach(r => assert(r.getInt(1) != r.getInt(3),
      s"query ${r.getLong(0)} mined a same-label 'negative'"))
    // driver-side brute replay over the label-filtered corpus
    val all = graft.Tables.embeddings(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      math.rint(d / (math.sqrt(na) * math.sqrt(nb)) * 1e4) / 1e4
    }
    val byQ = out.groupBy(_.getLong(0))
    all.filter(_._1 < 10).foreach { case (qid, qLabel, qEmb) =>
      val expect = all
        .filter { case (id, l, _) => id != qid && l != qLabel }
        .map { case (id, l, e) => (id, l, cos(qEmb, e)) }
        .sortBy { case (id, _, c) => (-c, id) }
        .take(5)
      val got = byQ(qid).sortBy(_.getLong(4))
        .map(r => (r.getLong(2), r.getInt(3), r.getDouble(5)))
      assert(got.toSeq == expect.toSeq, s"qid $qid mismatch")
    }
  }

  test("plan audit: ensemble has no single-partition window, negatives no UDF") {
    val dfe = TextOps.qualityEnsemble(spark, sf())
    // typed traversal: every rank window must carry the pid partition
    // key from the prefix scan — a window keyed only on the signal
    // value would be a single-partition global sort
    val wins = graft.PlanAudit.windowPartitionKeys(dfe)
    assert(wins.nonEmpty, "percentile windows missing from the plan")
    wins.foreach(keys => assert(keys.contains("pid"),
      s"a percentile window runs unpartitioned: $wins"))
    assert(!graft.PlanAudit.hasScalaUDF(dfe))
    val dfn = Similarity.hardNegatives(spark, sf())
    assert(!graft.PlanAudit.hasScalaUDF(dfn) &&
      !graft.PlanAudit.hasCartesian(dfn))
  }
}
