package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Analytic-SQL surface past the reference's needs (SURVEY.md §2.5
  * notes the reference uses no SQL window functions): native session
  * windows, CUBE, pivot, ranking analytics, deterministic stratified
  * sampling, and corpus n-gram frequency — the shapes a training-data
  * pipeline leans on for curriculum mixing and corpus statistics.
  */
object Analytics {

  /** Native `session_window` (gap 30 min) per user over events — the
    * declarative form of the hand-rolled sessionization in
    * [[Relational.sessionize]]; both derive the same sessions. The
    * window close is `last event + gap`, matching Spark's streaming
    * session semantics so the same plan runs under `readStream`. */
  def sessionWindows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        round(sum(col("value").cast(DecimalType(18, 2))).cast("double"), 2)
          .as("session_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("session_value"))

  /** CUBE over (segment, priority): every aggregation granularity in
    * one pass — Spark expands the grouping sets and still does partial
    * aggregation map-side. */
  def revenueCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment").as("segment"),
        col("o_orderpriority").as("priority"))
      .agg(round(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))

  /** Pivot: hour-of-day × event-type counts, wide. The pivot values are
    * a FIXED list (schema stability — same reason the reference
    * reindex-aligns its one-hots, `preprocessor.py:104-109`). */
  def hourlyTypePivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(hour(col("ts")).cast("long").as("hr"), col("event_type"))
      .groupBy(col("hr"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("hr"), col("click").as("n_click"), col("error").as("n_error"),
        col("purchase").as("n_purchase"), col("signup").as("n_signup"),
        col("view").as("n_view"))

  /** Ranking/analytic window functions over customer balances within
    * segment: rank/dense_rank/percent_rank/cume_dist on the VALUE
    * ordering (ties share ranks), ntile(4) on a fully tie-broken
    * ordering (deterministic bucket assignment). */
  def balanceAnalytics(spark: SparkSession, sfDir: String): DataFrame = {
    val byValue = Window.partitionBy(col("c_mktsegment"))
      .orderBy(desc("c_acctbal"))
    val total = Window.partitionBy(col("c_mktsegment"))
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(spark, sfDir).select(
      col("c_custkey").as("user_id"),
      col("c_mktsegment").as("segment"),
      col("c_acctbal").as("acctbal"),
      rank().over(byValue).cast("long").as("rnk"),
      dense_rank().over(byValue).cast("long").as("dense_rnk"),
      round(percent_rank().over(byValue), 6).as("pct_rank"),
      round(cume_dist().over(byValue), 6).as("cume"),
      ntile(4).over(total).cast("long").as("quartile"),
      // decimal-exact diff: balances carry 2 decimals, so the DECIMAL
      // subtraction is exact and engine-independent (no double round)
      (col("c_acctbal").cast(DecimalType(18, 2)) -
        coalesce(lag(col("c_acctbal").cast(DecimalType(18, 2)), 1).over(total),
          col("c_acctbal").cast(DecimalType(18, 2)))).cast("double")
        .as("gap_to_prev"))
  }

  /** Deterministic stratified sampling: per-language keep rates applied
    * through an arithmetic hash of the id (no RNG state — reproducible
    * on any engine, any partitioning; the same trick as the reference's
    * fixed seeds, `prepare_data.py:25`). The sampled subset is
    * engine-independent, so it oracle-checks exactly. */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    // pmod-reduce the id BEFORE multiplying: (id mod 2^20) < 2^20 times
    // 2654435761 < 2^32 stays under 2^52 — exact in a long on Spark AND
    // in DuckDB's BIGINT (no wrap on one engine vs promote on the other),
    // and pmod keeps the expression correct for negative ids too.
    val h = pmod(pmod(col("doc_id"), lit(1048576L)) * lit(2654435761L), lit(1048576L))
    val u = h / lit(1048576.0)
    val rate = when(col("lang") === "en", 0.25).otherwise(0.75)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), round(u, 6).as("u"))
      .filter(u < rate)
  }

  /** Corpus bigram frequency, top 20 (count desc, bigram asc): the
    * explode → groupBy shape whose shuffle carries (bigram, partial
    * count) — map-side combine keeps it narrow at corpus scale. */
  def topBigrams(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val grams = Tables.documents(spark, sfDir)
      // tokenize ONCE per row (the lambda would otherwise re-split per
      // reference — Catalyst does not CSE inside higher-order functions)
      .select(split(col("text"), " ").as("t"))
      // guard: sequence(1, 0) would run DESCENDING in Spark, not empty
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> concat_ws(' ', t[i-1], t[i]))"))
        .as("bigram"))
    grams.groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("bigram"))
      .limit(k)
  }
}
