package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the corpus-scrub + event-analytics additions: PII
  * redaction on planted fixtures, funnel monotonicity, transition-row
  * normalization.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("redactedText masks planted emails and long digit runs") {
    val docs = Seq(
      "Contact Bob.Smith+spam@Example-Mail.org  today",
      "call 5551234567 or 42 times",
      "already   clean text").toDF("text")
    val out = docs.select(TextOps.redactedText($"text").as("c")).as[String].collect()
    assert(out(0) == "contact <EMAIL> today")
    assert(out(1) == "call <NUM> or 42 times") // 2-digit run survives
    assert(out(2) == "already clean text")     // whitespace collapsed
  }

  test("redactPii counts match the masks it applied") {
    val df = TextOps.redactPii(spark, sf("0.001"))
    val bad = df.filter(
      (col("n_emails") > 0 && !col("clean_text").contains("<EMAIL>")) ||
      (col("n_long_nums") > 0 && !col("clean_text").contains("<NUM>")))
    assert(bad.count() == 0)
    // normalization: no residual runs of whitespace anywhere
    assert(df.filter(col("clean_text").contains("  ")).count() == 0)
  }

  test("funnel stages are monotone non-increasing") {
    val rows = Analytics.funnel(spark, sf("0.001"))
      .orderBy("stage").select("n_users").as[Long].collect()
    assert(rows.length == 3)
    assert(rows(0) >= rows(1) && rows(1) >= rows(2))
    assert(rows(0) > 0)
  }

  test("transition shares sum to ~1 per from_type") {
    val sums = Analytics.transitionMatrix(spark, sf("0.001"))
      .groupBy("from_type").agg(sum("p_trans").as("s"))
      .as[(String, Double)].collect()
    assert(sums.nonEmpty)
    sums.foreach { case (t, s) =>
      assert(math.abs(s - 1.0) < 0.01, s"$t sums to $s")
    }
  }
}
