package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract checks for the composed curation queries (q145/q146) —
  * the hash oracles pin exact values; these pin the RELATIONSHIPS
  * between the compositions and their component operators, so a
  * wiring bug that happened to hash-match a rewired oracle still
  * fails. */
class CurationSpec extends SparkSpec {

  test("decontaminated set is a subset of the curation set") {
    val base = Curation.trainingSet(spark, sf())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dec = Curation.trainingSetDecontaminated(spark, sf())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dec.subsetOf(base), s"gates ADDED docs: ${dec.diff(base).take(5)}")
    assert(dec.size < base.size, "decontamination gates removed nothing " +
      "on a corpus whose eval slices overlap the pool by construction")
  }

  test("curation v2 is the q145 set minus exactly the gopher and tail-bucket failures") {
    val base = Curation.trainingSet(spark, sf())
    val v2 = Curation.trainingSetV2(spark, sf())
    val v2Ids = v2.select("doc_id").collect().map(_.getLong(0)).toSet
    // recompute the expected survivor set from the component operators
    val gopherOk = base
      .filter(TextOps.gopherPass(col("clean_text")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val notTail = TextOps.perplexityBuckets(spark, sf())
      .filter(col("ppl_bucket") =!= "tail")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val baseIds = base.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(v2Ids == (baseIds intersect gopherOk intersect notTail),
      "v2 survivors != base ∩ gopher-pass ∩ non-tail")
    assert(v2Ids.nonEmpty && v2Ids.size < baseIds.size,
      "the v2 gates must bite on the fixture")
    // carried buckets agree with q150's verdicts
    val buckets = TextOps.perplexityBuckets(spark, sf())
      .select("doc_id", "ppl_bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    v2.select("doc_id", "ppl_bucket").collect().foreach { r =>
      assert(buckets(r.getLong(0)) == r.getString(1),
        s"doc ${r.getLong(0)} carries a bucket q150 disagrees with")
    }
  }

  test("no survivor shares a shingle with the eval docs or sits near an eval vector") {
    val dec = Curation.trainingSetDecontaminated(spark, sf())
    // lexical: the q79 hit list and the survivor set must be disjoint
    val hits = TextOps.decontamination(spark, sf())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val survivors = dec.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors.intersect(hits).isEmpty,
      s"lexically contaminated docs survived: ${survivors.intersect(hits).take(5)}")
    // eval membership: neither the lexical eval docs nor the embedding
    // eval slice may appear in the shipped set
    assert(survivors.forall(id => id >= 5 && id % 50 != 0),
      "an eval document survived into the training set")
    // semantic: every carried margin is below the gate, and agrees with
    // the q142 verdict table exactly
    val verdicts = Similarity.embeddingDecontam(spark, sf())
      .select(col("vec_id"), col("max_eval_cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    dec.select("doc_id", "max_eval_cos").collect().foreach { r =>
      val (id, cos) = (r.getLong(0), r.getDouble(1))
      assert(cos < 0.6, s"doc $id shipped with cos $cos >= gate")
      assert(verdicts(id) == cos, s"doc $id margin $cos != q142 ${verdicts(id)}")
    }
  }

  test("funnel stages are monotone and its last two stages ARE q145/q146's " +
    "per-source row counts") {
    val funnel = Curation.curationFunnel(spark, sf()).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // cumulative flags -> every stage count is <= its predecessor
    funnel.values.foreach { r =>
      val chain = Seq("n_docs", "n_gated", "n_canonical", "n_semantic",
        "n_sampled", "n_final").map(r.getAs[Long])
      assert(chain.zip(chain.tail).forall { case (a, b) => a >= b },
        s"${r.getAs[String]("source")}: non-monotone funnel $chain")
    }
    def perSource(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val q145 = perSource(Curation.trainingSet(spark, sf()))
    val q146 = perSource(Curation.trainingSetDecontaminated(spark, sf()))
    funnel.foreach { case (src, r) =>
      assert(r.getAs[Long]("n_sampled") == q145.getOrElse(src, 0L),
        s"$src: n_sampled != q145 rows")
      assert(r.getAs[Long]("n_final") == q146.getOrElse(src, 0L),
        s"$src: n_final != q146 rows")
    }
  }

  test("dataset card reconciles with a driver-side replay (sf0.1 plants dups)") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf("0.1"))
      .select("source", "lang", "text").as[(String, String, String)].collect()
    val got = Curation.datasetCard(spark, sf("0.1")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.values.map(_.getLong(1)).sum == docs.length)
    val globalTc = docs.groupBy(_._3).map { case (t, g) => t -> g.length }
    val bySrc = docs.groupBy(_._1)
    bySrc.foreach { case (src, rows) =>
      val r = got(src)
      assert(r.getLong(1) == rows.length, s"$src n_docs")
      assert(r.getLong(4) == rows.length - rows.map(_._3).distinct.length,
        s"$src n_exact_dups")
      assert(r.getLong(5) == rows.count(d => globalTc(d._3) > 1),
        s"$src n_dup_rows")
      val en = rows.count(_._2 == "en").toDouble / rows.length
      assert(r.getDouble(7) ==
        BigDecimal(en).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"$src en_share")
    }
    // sf0.1's planted exact duplicates are CROSS-source (syndication):
    // they must surface in n_dup_rows while within-source counts may
    // legitimately stay zero — the distinction is the column's point
    assert(got.values.map(_.getLong(5)).sum > 0, "no dup rows counted at sf0.1")
  }
}
