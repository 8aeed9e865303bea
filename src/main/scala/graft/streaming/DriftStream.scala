package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** CONTINUOUS drift monitoring — [[graft.operators.Analytics.valueDrift]]
  * as a streaming pipeline: a reference distribution is fitted once
  * from a batch snapshot (per-type bin edges + shares, broadcastable),
  * the live stream runs ONE standard watermarked windowed aggregation
  * producing per-(window, type, bin) counts, and the PSI fold runs in
  * the monitor sink per micro-batch (`foreachBatch` side) against the
  * broadcast reference — the production monitoring architecture:
  * heavy counting distributed and incremental, the tiny
  * windows×types×bins fold at the sink.
  *
  * Engine-portable fp discipline as the batch twin: ε-clamped shares,
  * 9dp-decimal PSI terms. Spec: the sink-side PSI over a replayed
  * MemoryStream equals the batch PSI on the same rows.
  */
object DriftStream {

  val Bins = 10
  val Eps = 1e-6

  /** Reference distribution from a batch snapshot: per event type, the
    * value range (bin edges) and each bin's share. Types×bins rows —
    * broadcastable at any corpus scale. */
  def referenceShares(spark: SparkSession, sfDir: String): DataFrame =
    referenceShares(Tables.events(spark, sfDir).select(col("event_type"), col("value")))

  /** [[referenceShares]] over any `(event_type, value)` snapshot frame.
    * Emits ALL `Bins` bins per type — bins the snapshot never hit carry
    * ε mass. Without the fill, live data landing in an unseen bin would
    * silently drop out of the monitor's denominator. */
  def referenceShares(ev: DataFrame): DataFrame = {
    val rng = ev.groupBy(col("event_type"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val observed = ev.join(broadcast(rng), "event_type")
      .withColumn("bin", binOf(col("value"), col("lo"), col("hi")))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share",
        col("n").cast("double") /
          sum(col("n")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type"))).cast("double"))
    rng.select(col("event_type"), col("lo"), col("hi"),
        explode(sequence(lit(0), lit(Bins - 1))).as("bin"))
      .join(observed.select(col("event_type").as("o_et"),
        col("bin").as("o_bin"), col("share")),
        col("event_type") === col("o_et") && col("bin") === col("o_bin"), "left")
      .select(col("event_type"), col("lo"), col("hi"), col("bin"),
        greatest(coalesce(col("share"), lit(0.0)), lit(Eps)).as("p_ref"))
  }

  /** The shared bin assignment (identical to the batch monitor's). */
  def binOf(value: Column, lo: Column, hi: Column): Column =
    least(floor((value - lo) * Bins / greatest(hi - lo, lit(1e-12))),
      lit(Bins - 1)).cast("int")

  /** The STREAMING side: watermarked tumbling-window bin counts — a
    * single-level windowed aggregation (Append emits each closed
    * window once), joined map-side against the broadcast reference
    * edges. `events` needs (ts timestamp, event_type, value). */
  def windowedBinCounts(events: DataFrame, reference: DataFrame,
                        window: String = "1 hour",
                        watermarkDelay: String = "10 minutes"): DataFrame = {
    val edges = reference.select("event_type", "lo", "hi").distinct()
    events.withWatermark("ts", watermarkDelay)
      .join(broadcast(edges), "event_type")
      .withColumn("bin", binOf(col("value"), col("lo"), col("hi")))
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window).as("w"),
        col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("bin"), col("n"))
  }

  /** The monitor-sink fold (run per micro-batch over the CLOSED-window
    * counts, or over any batch of them): PSI of each (window, type)
    * against the reference shares. Input is windows×types×bins rows —
    * sink-sized, never stream-sized. */
  def psiOfBinCounts(binCounts: DataFrame, reference: DataFrame): DataFrame = {
    val byWt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"), col("event_type"))
    // every (window, type) carries ALL reference bins: a bin the window
    // never hit still contributes its reference mass (p_cur = ε) —
    // only joining observed bins would understate drift. The observed
    // side re-aliases every column (fresh attribute ids) because both
    // join inputs derive from the same binCounts plan.
    val full = binCounts.select(col("window_start"), col("event_type")).distinct()
      .join(broadcast(reference.select("event_type", "bin", "p_ref")),
        Seq("event_type"))
    val obs = binCounts.select(col("window_start").as("o_ws"),
      col("event_type").as("o_et"), col("bin").as("o_bin"), col("n"))
    full.join(obs,
        col("window_start") === col("o_ws") && col("event_type") === col("o_et") &&
          col("bin") === col("o_bin"), "left")
      .drop("o_ws", "o_et", "o_bin")
      .withColumn("p_cur",
        greatest(coalesce(col("n"), lit(0L)).cast("double") /
          sum(coalesce(col("n"), lit(0L))).over(byWt).cast("double"), lit(Eps)))
      .withColumn("term",
        round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")), 9)
          .cast(DecimalType(18, 9)))
      .groupBy(col("window_start"), col("event_type"))
      .agg(round(sum(col("term")).cast("double"), 6).as("psi"),
        sum(coalesce(col("n"), lit(0L))).as("n_window"))
      .withColumn("drifted", col("psi") > 0.25)
  }
}
