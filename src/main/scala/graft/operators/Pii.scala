package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PII detection and redaction — the scrub pass every shipped
  * training corpus runs (the BigScience ROOTS / Dolma discipline:
  * pattern-match the high-precision identifier shapes, count them for
  * the audit log, replace them with typed placeholders).
  *
  * The patterns stay inside the portable regex intersection (no
  * lookaround, no backreferences) so the exact same strings drive
  * Spark's codegen'd `regexp_*` (java.util.regex) and the DuckDB
  * oracle's RE2 — the engine-portability discipline every other
  * operator's oracle already relies on.
  *
  * Scale shape: map-only, zero shuffle — each document is scanned and
  * rewritten in place, so the pass composes with any scan pushdown and
  * parallelizes with the input split count. Redaction order is fixed
  * (email → IP → phone): earlier rewrites only ever REMOVE digit runs,
  * so later patterns cannot match inside an earlier placeholder.
  */
object Pii {

  /** High-precision identifier shapes. Local parts and hosts are
    * matched lowercase — the fixture normalizes case upstream, and a
    * production caller wraps with `lower()` per their corpus policy. */
  val EmailRe = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
  val PhoneRe = """\b[0-9]{3}-[0-9]{4}\b"""
  val IpRe = """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"""

  /** Generic entry point: append per-row match counts and the redacted
    * text for `textCol`. Pure projection — safe on any frame. */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", regexp_count(t, lit(EmailRe)).cast("long"))
      .withColumn("n_phones", regexp_count(t, lit(PhoneRe)).cast("long"))
      .withColumn("n_ips", regexp_count(t, lit(IpRe)).cast("long"))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            IpRe, "<IP>"),
          PhoneRe, "<PHONE>"))
  }

  /** q148 fixture surface: deterministic "support tickets" assembled
    * from the customer table (the lake carries no raw contact text, so
    * the fixture synthesizes one per customer — the q114 generator
    * discipline: every byte a pure function of table columns, so the
    * oracle rebuilds the identical input and the scrub arithmetic is
    * what gets verified). Contact fields appear conditionally on the
    * key so the counts genuinely vary: a second email at key%5=0, the
    * phone dropped at key%3=0, the IP dropped at key%4=0. */
  def ticketScrub(spark: SparkSession, sfDir: String): DataFrame = {
    def s(c: Column) = c.cast("string")
    val key = col("c_custkey")
    val ticket = concat(
      lit("cust "), col("c_name"),
      lit(" <u"), s(key), lit("@example.com>"),
      when(key % 5 === 0,
        concat(lit(" cc u"), s(key), lit(".alt@mail.example.org")))
        .otherwise(lit("")),
      when(key % 3 > 0,
        concat(lit(" call "), lpad(s(key * 7 % 1000), 3, "0"),
          lit("-"), lpad(s(key * 31 % 10000), 4, "0")))
        .otherwise(lit("")),
      when(key % 4 > 0,
        concat(lit(" from 10."), s(key % 256), lit("."),
          s(key * 3 % 256), lit("."), s(key * 7 % 256)))
        .otherwise(lit("")),
      lit(" re "), lower(col("c_mktsegment")))
    scrub(Tables.customer(spark, sfDir)
      .select(col("c_custkey"), ticket.as("ticket")), "ticket")
      .drop("ticket")
  }
}
