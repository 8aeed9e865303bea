package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A12: the offline policy benchmark (`recsys-engine/evaluate.py:62-108`)
  * — AUC / CTR over competing policies — as Spark plans.
  *
  * AUC is the Mann-Whitney statistic with tie correction computed from
  * INTEGER rank bounds: for each positive, its tied group contributes
  * `(min_rank + max_rank)` (twice the average rank); every intermediate
  * sum is integer-valued and exact in double (< 2^53), so the statistic
  * is bit-identical under any partitioning and across engines —
  * float-summed average ranks would not be. One global sort of the
  * score column is required for exact ranks (the engine's only
  * global-sort operator); the 100 TB variant would swap in an
  * approximate quantile-bucketed AUC.
  */
object PolicyEval {

  /** Tie-corrected AUC of `score` against binary `label`, plus CTR.
    *
    * Ranks are derived from a distributed group-by on the score (one
    * shuffle), then a cumulative count over DISTINCT scores — so the
    * only ordered pass touches |distinct scores| rows, not |rows|. A
    * tie group spanning ranks [c-cnt+1, c] contributes
    * `pos · (mn + mx)` with `mn+mx = 2c - cnt + 1` — integers
    * throughout, so the statistic is exact and partitioning-independent.
    */
  def aucOf(df: DataFrame, score: Column, label: Column): DataFrame =
    aucPerPolicy(df, lit("_"), score, label).drop("policy")

  /** [[aucOf]] generalized to several policies in ONE pass: the same
    * integer-rank construction, windowed and grouped by a policy
    * column — evaluating k policies costs one scan of the melted
    * (policy, score, label) frame instead of k scans of the source. */
  def aucPerPolicy(df: DataFrame, policy: Column, score: Column,
                   label: Column): DataFrame = {
    val grouped = df.select(policy.as("policy"), score.as("s"), label.as("y"))
      .groupBy(col("policy"), col("s"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    val cum = grouped.withColumn("c",
      sum(col("cnt")).over(Window.partitionBy(col("policy")).orderBy(col("s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.groupBy(col("policy")).agg(
      round(
        (sum(col("pos") * (lit(2) * col("c") - col("cnt") + 1)) / 2.0 -
          (sum(col("pos")) * (sum(col("pos")) + 1.0)) / 2.0) /
          (sum(col("pos")) * (sum(col("cnt")) - sum(col("pos")))), 6).as("auc"),
      round(sum(col("pos")) / sum(col("cnt")), 6).as("ctr"),
      sum(col("cnt")).as("n"))
  }

  /** The interaction log with engine-portable keys: arm = p_brand,
    * label = "was returned", plus a deterministic pseudo-random score
    * every engine can recompute (no hash builtin needed). */
  private def interactions(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.lineitem(spark, sfDir)
      .join(broadcast(graft.Tables.part(spark, sfDir)),
        col("l_partkey") === col("p_partkey"))
      .select(
        col("p_brand").as("arm"),
        when(col("l_quantity") * 0.012 + col("l_discount") * 4.0 > 0.5, 1.0)
          .otherwise(0.0).as("y"),
        pmod(col("l_orderkey") * 131 + col("l_linenumber"), lit(10007))
          .cast("double").as("rnd_score"))

  /** SQL-expressible policies: popularity (arm mean reward) and the
    * pseudo-random baseline, melted into ONE pass over the joined frame
    * (both scores live on the same rows). Oracle-checked. */
  def evalSqlPolicies(spark: SparkSession, sfDir: String): DataFrame = {
    val fb = interactions(spark, sfDir)
    val scored = fb.join(
      broadcast(fb.groupBy("arm").agg(round(avg("y"), 6).as("pop_score"))), "arm")
    val melted = scored.selectExpr(
      "stack(2, 'popularity', pop_score, 'random', rnd_score) AS (policy, s)",
      "y")
    aucPerPolicy(melted, col("policy"), col("s"), col("y"))
  }

  /** Model-based policy eval (rows-only: scoring needs A⁻¹): score each
    * interaction's own (arm, context) with the seeded models, AUC over
    * the pooled scores — LinUCB (exploration bonus α=0.1), LinGreedy
    * (α=0, pure posterior mean) and LinTS (Thompson sampling with
    * deterministic seeded noise, ν=0.05) — the reference's linear
    * policy family (`evaluate.py:65-70`). The oracle is relative,
    * exactly like the reference's (`evaluate.py` ranks policies; the
    * linear policies must beat random) — asserted in spec. */
  def evalLinUCB(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fb = LinUCB.feedbackFromLineitem(spark, sfDir)
    // hoist the per-ARM factors (θ, chol(A⁻¹)) out of the per-row UDFs:
    // O(d³) work happens once per model on the broadcast side, the row
    // path only draws z and takes dot products
    val models = LinUCB.seed(fb, LinUCB.Dim)
      .map(m => (m.productId, m.aInv, m.b, m.d,
        LinUCB.thetaOf(m), LinAlg.choleskyLower(m.aInv, m.d)))
      .toDF("productId", "aInv", "b", "d", "theta", "lchol")
    def scoreUdf(alpha: Double) =
      udf((x: Seq[Double], aInv: Seq[Double], b: Seq[Double], d: Int) =>
        LinUCB.score(x.toArray, LinUCB.Model("", aInv.toArray, b.toArray, d, 0L), alpha))
    val tsUdf = udf((x: Seq[Double], theta: Seq[Double], lchol: Seq[Double],
                     d: Int, seed: Long) =>
      LinUCB.scoreTSPre(x.toArray, theta.toArray, lchol.toArray, d,
        nu = 0.05, seed = seed))
    val scored = fb.toDF()
      .join(broadcast(models), "productId")
      .withColumn("s_ucb",
        round(scoreUdf(0.1)(col("x"), col("aInv"), col("b"), col("d")), 9))
      .withColumn("s_greedy",
        round(scoreUdf(0.0)(col("x"), col("aInv"), col("b"), col("d")), 9))
      // seed = content hash of (arm, context): deterministic across
      // runs and partitionings, unique per distinct interaction shape
      .withColumn("s_ts",
        round(tsUdf(col("x"), col("theta"), col("lchol"), col("d"),
          xxhash64(col("productId"), col("x"))), 9))
    // melt to (policy, score) so ALL policies evaluate from one pass
    // over the scoring subtree (a per-policy union would re-run the
    // seed aggregation + scoring UDFs once per branch)
    val melted = scored.selectExpr(
      "stack(3, 'linucb', s_ucb, 'lin_greedy', s_greedy, 'lin_ts', s_ts) AS (policy, s)",
      "reward AS y")
    aucPerPolicy(melted, col("policy"), col("s"), col("y"))
  }
}
