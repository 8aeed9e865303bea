package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference's scalar-function surface (SURVEY.md §2.8), as pure
  * column expressions — everything stays inside whole-stage codegen; no
  * UDFs on the hot path.
  */
object ScalarFuncs {

  /** F3: time-of-day bucketing (`bandit_simulator.py:24-47`). */
  def timeOfDay(ts: Column): Column =
    when(hour(ts).between(6, 11), "morning")
      .when(hour(ts).between(12, 17), "afternoon")
      .otherwise("evening")

  /** F3: weekend flag. Uses the day name rather than dayofweek() because
    * engines disagree on week-start numbering. */
  def isWeekend(ts: Column): Column =
    date_format(ts, "EEEE").isin("Saturday", "Sunday")

  /** F8: sigmoid link (`bandit_simulator.py:57-82`). */
  def sigmoid(score: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-score))

  /** F5: email-style normalized concat (`models.py:122`). */
  def emailOf(first: Column, domain: String): Column =
    concat(lower(regexp_replace(first, "[^A-Za-z0-9]", "")), lit("@" + domain))

  /** Demonstration frame over `events`: one column per function family
    * (F1 parse/format, F3 buckets, F4 epoch, F5 strings, F7 rounding,
    * F8 sigmoid), all deterministic for the oracle. */
  def demo(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(
      col("event_id"),
      // F1: format timestamps to the reference's wire format
      // (ProducerApp.kt:76-83)
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
      // F4: epoch conversions (truncated to ms like timestamp-millis)
      expr("ts_us div 1000").as("epoch_ms"),
      // F3: calendar buckets
      hour(col("ts")).cast("long").as("hr"),
      date_format(col("ts"), "EEEE").as("day_name"),
      isWeekend(col("ts")).as("is_weekend"),
      timeOfDay(col("ts")).as("tod"),
      // F5: string ops
      upper(col("event_type")).as("event_type_uc"),
      emailOf(col("event_type"), "example.com").as("synth_email"),
      // F7: rounding
      round(col("value") / lit(7.0), 2).as("value_scaled"),
      // F8: sigmoid score, rounded to keep libm ulp differences out of
      // the hash compare
      round(sigmoid(col("value") / lit(100.0)), 6).as("sigmoid_score"))

  /** A11: weighted categorical sampling as a deterministic column
    * computation — the reference draws with `random.choices(pop,
    * weights)` (`models.py:45-53`); the engine derives a uniform in
    * [0,1) from a hash of the row key and walks the cumulative-weight
    * ladder. Deterministic ⇒ oracle-checkable, and at scale it is a
    * pure map (no RNG state, no driver coordination). */
  def weightedPick(key: Column, choices: Seq[(String, Double)]): Column = {
    val total = choices.map(_._2).sum
    // uniform from a Knuth multiplicative hash of the numeric key —
    // engine-portable (exact BIGINT arithmetic), unlike xxhash64
    val u = pmod(key.cast("long") * lit(2654435761L), lit(1048576L))
      .cast("double") / lit(1048576.0)
    val cum = choices.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    choices.zip(cum).init.foldRight(lit(choices.last._1)) {
      case (((name, _), bound), elseCol) => when(u < bound, name).otherwise(elseCol)
    }
  }

  /** A11 over events: deterministic traffic-source assignment with the
    * reference's weights (`models.py:100-137` style), aggregated so the
    * draw distribution itself is the checked result. */
  def weightedPickAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"),
        weightedPick(col("event_id"),
          Seq("Organic" -> 0.5, "Search" -> 0.3, "Email" -> 0.15, "Display" -> 0.05))
          .as("src"))
      .groupBy(col("src")).agg(count(lit(1)).as("n"))

  /** F10: JSON field extraction from the `props` payload column —
    * the engine-side shape of consuming loosely-typed event payloads
    * (`ps_sub.py:10-12`). */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))

  /** Aggregated view of the extracted JSON field (F10 + A3). */
  def jsonExtractAgg(spark: SparkSession, sfDir: String): DataFrame =
    jsonExtract(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
}
