package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR importance-weight contract: target-like raw docs outrank
  * junk, weights are partitioning-independent, and the feature count
  * is the exact unigram+bigram arithmetic. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("target-like raw documents outrank junk under the log likelihood ratio") {
    // target pool speaks "alpha beta"; raw doc 10 mimics it, raw doc 11
    // shares nothing with the target
    val docs = corpus(
      (0L, "tgt", "alpha beta alpha beta alpha"),
      (1L, "tgt", "beta alpha beta alpha"),
      (2L, "tgt", "alpha beta gamma alpha beta"),
      (10L, "raw", "alpha beta alpha gamma"),
      (11L, "raw", "zork quux blarg nix"))
    val w = Dsir.importanceWeightsFrom(docs, "tgt", 256)
      .select(col("doc_id"), col("weight")).as[(Long, Double)].collect().toMap
    assert(w.keySet == Set(10L, 11L), s"raw docs only: ${w.keySet}")
    assert(w(10L) > w(11L),
      s"target-like doc should outrank junk: ${w(10L)} vs ${w(11L)}")
  }

  test("weights are bit-identical under repartitioning") {
    val docs = graft.Tables.documents(spark, sf("0.001"))
      .select(col("doc_id"), col("source"), col("text"))
    val a = Dsir.importanceWeightsFrom(docs, "src0", 4096)
      .as[(Long, Long, Double)].collect().toSet
    val b = Dsir.importanceWeightsFrom(docs.repartition(7), "src0", 4096)
      .as[(Long, Long, Double)].collect().toSet
    assert(a == b)
  }

  test("n_feats is exactly unigrams + bigrams (2·len − 1)") {
    val docs = corpus(
      (0L, "tgt", "a b c"),
      (10L, "raw", "a b c d"),     // 4 + 3 = 7
      (11L, "raw", "solo"))        // 1 + 0 = 1
    val nf = Dsir.importanceWeightsFrom(docs, "tgt", 64)
      .select(col("doc_id"), col("n_feats")).as[(Long, Long)].collect().toMap
    assert(nf == Map(10L -> 7L, 11L -> 1L))
  }
}
