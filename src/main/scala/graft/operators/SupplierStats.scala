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
    * late since windowEnd + grace > its own timestamp). Semantics match
    * the reference's sequential fold (`LateRecordProcessor.kt:24-79`).
    *
    * SCALE SHAPE: a naive `Window.orderBy(event_id)` running max is a
    * single-partition global sort — the round-5 scale-killer. This form
    * distributes the same sequential fold as a classic parallel
    * prefix-scan over the dense arrival key:
    *   1. bucket records by `event_id div width` (deterministic — no
    *      range-sampling, so the two passes can never disagree);
    *   2. one map-side-combined aggregation yields each bucket's max
    *      event time — `buckets` rows to the driver;
    *   3. the driver prefix-scans those `buckets` values into exclusive
    *      offsets (the only sequential step, O(buckets) not O(rows));
    *   4. the per-record running max is a window PARTITIONED by bucket
    *      (parallel, each sort bounded by rows/buckets), combined with
    *      the broadcast offset: `stream = max(bucket-local running max,
    *      max of all earlier buckets)`.
    * The streaming twin
    * ([[graft.streaming.SupplierStatsStream.forkBatch]]) remains the
    * incremental path; this batch form is now scale-safe on its own
    * (plan-audited: no SinglePartition window). */
  def tagLate(spark: SparkSession, sfDir: String, buckets: Int = 256): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // construction runs two small eager jobs (max id, per-bucket maxes)
    // — memoize the finished frame so repeat callers (q14 + q15 share
    // it) don't re-run them
    tagCache.getOrCompute(spark, (sfDir, buckets)) {
      buildTagLate(spark, sfDir, buckets)
    }
  }

  private val tagCache = new graft.SessionCache[(String, Int), DataFrame](
    onEvict = graft.SessionCache.unpersistCheckpoint)

  private def buildTagLate(spark: SparkSession, sfDir: String,
                           buckets: Int): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val maxId = Option(ev.agg(max(col("event_id"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val width = maxId / buckets + 1
    val bucketed = ev.select(col("event_id"), col("ts_us"))
      .withColumn("bkt", expr(s"event_id div $width"))
    val bucketMax = bucketed.groupBy(col("bkt")).agg(max(col("ts_us")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // exclusive prefix max: offset(b) = max over all buckets < b
    val offsets = bucketMax.scanLeft((-1L, Long.MinValue)) {
      case ((_, acc), (b, m)) => (b, math.max(acc, m))
    }.sliding(2).collect { case Array((_, prev), (b, _)) => (b, prev) }.toSeq
    import ev.sparkSession.implicits._
    val offDf = offsets.toDF("bkt", "off")
    bucketed
      .join(broadcast(offDf), Seq("bkt"), "left")
      .withColumn("run", max(col("ts_us")).over(
        Window.partitionBy(col("bkt")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("stream_us", greatest(col("run"), coalesce(col("off"), col("run"))))
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
