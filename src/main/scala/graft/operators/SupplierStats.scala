package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** The reference's flagship computation — per-key tumbling event-time
  * window → sum(price), count(*) — implemented three times there (Kafka
  * Streams `StreamsApp.kt:130-159`, Flink DataStream
  * `SupplierStatsAggregator.kt:12-34`, Flink Table `TableApp.kt:185-196`).
  * This is the fourth implementation: one declarative transform shared by
  * the batch query (oracle-checked) and the Structured Streaming query
  * (see graft.streaming.SupplierStatsStream), which is exactly the
  * reference's own "same query, different engine" agreement trick.
  *
  * Spark's HashAggregateExec gives the partial/final split the Flink
  * AggregateFunction hand-codes; the only shuffle is on (window, key).
  */
object SupplierStats {

  /** A5/A6/A7 + T4: tumbling window stats. Window bounds are formatted
    * "yyyy-MM-dd HH:mm:ss" strings exactly like the reference's output
    * (`SupplierStatsFunction.kt:24-25`), totals rounded to 2dp
    * (`TableApp.kt:194`).
    */
  def tumble(df: DataFrame, eventTime: Column, key: Column, price: Column,
             width: String = "5 seconds"): DataFrame =
    format(aggCore(df, eventTime, key, price, width))

  /** The shared aggregation core: one declarative transform used by BOTH
    * the batch query and the Structured Streaming query
    * ([[graft.streaming.SupplierStatsStream]]) — the literal "same query,
    * different engine mode" agreement the reference builds by hand across
    * three engines. */
  def aggCore(df: DataFrame, eventTime: Column, key: Column, price: Column,
              width: String): DataFrame =
    df.groupBy(window(eventTime, width).as("w"), key.as("supplier"))
      .agg(
        round(sum(price.cast(DecimalType(18, 2))).cast("double"), 2).as("total_price"),
        count(lit(1)).as("cnt"))

  /** Window bounds formatted exactly like the reference's output
    * (`SupplierStatsFunction.kt:24-25`). */
  def format(agg: DataFrame): DataFrame =
    agg.select(
      date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
      date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("window_end"),
      col("supplier"), col("total_price"), col("cnt"))

  /** Batch query over the events table: event_type stands in for the
    * supplier key (FIXTURES.md §6), 5 s tumble mirroring the reference's
    * window size (`StreamsApp.kt:43`). */
  def tumbleEvents(spark: SparkSession, sfDir: String, width: String = "5 seconds"): DataFrame =
    tumble(Tables.events(spark, sfDir), col("ts"), col("event_type"), col("value"), width)

  /** T12 as a first-class window shape: the reference's dashboard
    * re-queries a 5-minute lookback every refresh — an overlapping
    * sliding snapshot. Spark expresses it directly:
    * `window(ts, width, slide)` assigns each event to width/slide
    * overlapping windows (here 10 min / 5 min → 2). Same agg core as
    * the tumbling flagship. */
  def slidingEvents(spark: SparkSession, sfDir: String,
                    width: String = "10 minutes", slide: String = "5 minutes"): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.groupBy(window(col("ts"), width, slide).as("w"), col("event_type").as("supplier"))
      .agg(
        round(sum(col("value").cast(DecimalType(18, 2))).cast("double"), 2).as("total_price"),
        count(lit(1)).as("cnt"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("supplier"), col("total_price"), col("cnt"))
  }

  // --- Late-record semantics (T6) ---
  // The reference computes, per record: windowEnd = ((ts/size)+1)*size and
  // flags the record late iff streamTime > windowEnd + grace, where
  // streamTime is the max event time observed so far in arrival order
  // (`orders-stats-streams/.../LateRecordProcessor.kt:24-79`;
  // `orders-stats-flink/.../LateDataRouter.kt:19-40`). Spark has no side
  // outputs, so the engine tags first and forks two filtered sinks (P5).

  private val windowUs = 5000000L // 5 s window (StreamsApp.kt:43)
  private val graceUs = 5000000L  // 5 s grace  (StreamsApp.kt:44)

  /** Window close boundary for a record: ((ts div size)+1)*size, computed
    * with exact long arithmetic (ts - ts mod size + size); a double
    * division here could misassign records near a window boundary at
    * epoch-micros magnitudes. */
  def windowEndUs(tsUs: Column): Column =
    tsUs - pmod(tsUs, lit(windowUs)) + lit(windowUs)

  /** Pure-column form of the window-close predicate, given the observed
    * stream time (max event time so far). All integer math — exact. */
  def lateFlag(tsUs: Column, streamTimeUs: Column): Column =
    streamTimeUs > windowEndUs(tsUs) + lit(graceUs)

  /** Batch analog of the tag step: arrival order = event_id, stream time =
    * running max of event time (inclusive — a record can never make itself
    * late since windowEnd + grace > its own timestamp).
    *
    * SCALE CONSTRAINT: the unpartitioned `Window.orderBy(event_id)` below
    * is a single-partition global running max — inherent to the semantics
    * (stream time is a sequential fold over ARRIVAL order; the reference's
    * `LateRecordProcessor.kt:24-79` is the same single-threaded fold). This
    * batch form exists to make the tag oracle-checkable; the 100 TB path is
    * the streaming twin ([[graft.streaming.SupplierStatsStream.forkBatch]]),
    * which tracks the same high-watermark incrementally per micro-batch and
    * never sorts the history. */
  def tagLate(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("stream_us", max(col("ts_us")).over(w))
      .withColumn("window_end_us", windowEndUs(col("ts_us")))
      .withColumn("late", col("stream_us") > col("window_end_us") + graceUs)
      .select(col("event_id"), col("window_end_us"), col("late"))
  }

  /** P5 + T7: the branch/split — two outputs from one tagged frame, late
    * branch enriched with `late=true` exactly like the reference's skipped
    * topic (`DataStreamApp.kt:112-129`). Here summarized per branch so the
    * fork is oracle-checkable as a single result set. One conditional
    * aggregation pass, then unpivoted — two filtered branches would
    * recompute the running-max window (a global sort) once each. */
  def branchCounts(spark: SparkSession, sfDir: String): DataFrame =
    tagLate(spark, sfDir)
      .agg(
        // coalesce: sum over zero rows is NULL, but the branch counts
        // must read 0 on an empty input (as the oracle's COUNT(*) does)
        coalesce(sum(when(!col("late"), 1L).otherwise(0L)), lit(0L)).as("n_valid"),
        coalesce(sum(when(col("late"), 1L).otherwise(0L)), lit(0L)).as("n_late"))
      .selectExpr("stack(2, 'valid', n_valid, 'late', n_late) AS (branch, n)")
}
