package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming curation — the incremental face of the nightly batch
  * curation chain (q145): the reference's heart is incremental
  * processing, and until this object the gate/dedup/monitor pieces
  * each had a streaming twin but the COMPOSITION ran batch-only. One
  * streaming DAG now chains the three:
  *
  *   1. exact first-arrival dedup by content fingerprint
  *      ([[StreamingDedup.firstArrival]] on `sha2(text)` — the q112
  *      incremental-dedup key), watermark-bounded state;
  *   2. the q27 composite quality gate (ONE definition —
  *      [[graft.operators.TextOps.qualityGate]], the same column the
  *      batch chain filters on), either as the curated-docs filter or
  *      as the monitor's pass/fail annotation;
  *   3. the ingest-monitor windowed aggregation
  *      ([[IngestMonitorStream.ingestCore]]) over the DEDUPED stream,
  *      so pass_rate measures what curation actually sees rather than
  *      double-counting re-deliveries.
  *
  * [[curationMonitorStream]] is one `writeStream` with two chained
  * stateful operators (dedup state, then window state) — the
  * multi-stateful append-mode pipeline Structured Streaming supports
  * since 3.4; [[curatedStream]] is the per-document product (dedup →
  * gate filter, stateless after the dedup). Batch twins
  * ([[batchDeduped]] and friends) define the agreement contract the
  * spec pins across state-bridged micro-batches and a cold checkpoint
  * restart.
  *
  * State scale: dedup keeps one 32-byte fingerprint per distinct
  * document inside the watermark horizon (arrival-rate × delay
  * bounded, never corpus-bounded); the window state is open-windows ×
  * sources. Both are the shapes the batch chain's 100 TB audit
  * already costs — nothing here shuffles text except the initial
  * metric projection, which is map-side.
  */
object CurationStream {

  /** Which copy of an in-horizon duplicate the stream keeps. */
  sealed trait KeepRule
  object KeepRule {
    /** Processing-order first arrival (the default): zero added
      * latency, state = one fingerprint per in-horizon key, but
      * divergent from the batch twin for out-of-order cross-source
      * duplicates (the spec-pinned contract boundary). */
    case object FirstArrival extends KeepRule
    /** The batch twin's (ts, source, text)-least row, emitted when the
      * watermark closes the fingerprint's horizon
      * ([[StreamingDedup.keepLeast]]): competing copies delivered
      * inside the watermark resolve exactly as [[batchDeduped]]
      * resolves them, at the standard append-aggregation latency of
      * one watermark delay. Post-eviction re-deliveries still re-emit
      * — that divergence is inherent to bounded state. */
    case object TsLeast extends KeepRule
  }

  /** Content fingerprint — the q112 incremental-dedup key. */
  private def fingerprinted(docs: DataFrame): DataFrame =
    docs.withColumn("fp", sha2(col("text"), 256))

  /** Stage 1: one row per content fingerprint, state expiring past the
    * watermark on `ts`. Input carries at least
    * (source, ts, text, n_chars). Which copy survives is the
    * `keep` rule: [[KeepRule.FirstArrival]] uses the dedicated
    * [[StreamingDedup.withinWatermark]] form (the engine evicts each
    * fingerprint's state once the watermark passes its event time,
    * keeping dedup state rate-bounded instead of corpus-bounded);
    * [[KeepRule.TsLeast]] matches the batch keep rule for every
    * in-horizon competitor at one watermark delay of latency. */
  def dedupedDocs(docs: DataFrame, watermark: String = "1 minute",
                  keep: KeepRule = KeepRule.FirstArrival): DataFrame =
    keep match {
      case KeepRule.FirstArrival =>
        StreamingDedup.withinWatermark(
          fingerprinted(docs), "ts", watermark, "fp")
      case KeepRule.TsLeast =>
        val spark = docs.sparkSession
        import spark.implicits._
        StreamingDedup.keepLeast(
          fingerprinted(docs)
            .select(col("fp"), col("source"), col("ts"), col("text"),
              col("n_chars").cast("long").as("n_chars"))
            .as[StreamingDedup.FpDoc],
          "ts", watermark).toDF()
    }

  /** Stages 1+2: the curated per-document stream — deduped docs that
    * pass the q27 gate, with the token count the downstream trainer
    * bills by. Append-mode, stateless past the dedup. */
  def curatedStream(docs: DataFrame, watermark: String = "1 minute",
                    keep: KeepRule = KeepRule.FirstArrival): DataFrame =
    dedupedDocs(docs, watermark, keep)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("n_stop", graft.operators.TextOps.stopHits)
      .filter(graft.operators.TextOps.qualityGate)
      .select(col("fp"), col("source"), col("ts"), col("n_tokens"))

  /** Stages 1+2+3 in ONE writeStream: the ingest monitor over the
    * deduped stream — (window, source) doc/token volumes and gate
    * pass rate, re-deliveries removed before they can inflate either
    * the volume or the pass rate. */
  def curationMonitorStream(docs: DataFrame, watermark: String = "1 minute",
                            width: String = "1 minute"): DataFrame =
    IngestMonitorStream.ingestCore(
      IngestMonitorStream.docMetrics(
        dedupedDocs(docs, watermark)
          .select(col("source"), col("ts"), col("text"), col("n_chars"))),
      width)

  /** Batch twin of [[dedupedDocs]]: first arrival = the (ts, source,
    * text)-least row per fingerprint. Deterministic on any engine —
    * the agreement specs feed true re-deliveries (identical tuples),
    * for which ANY kept copy is the same row.
    *
    * CONTRACT BOUNDARY (spec-pinned, not just noted): the twins
    * diverge by design for (a) the same text arriving from different
    * (source, ts) out of event-time order — the stream keeps the
    * processing-order first, this twin the (ts, source, text)-least —
    * and (b) duplicates re-delivered after the watermark evicted their
    * fingerprint state, which the stream re-emits and this twin never
    * does. [[KeepRule.TsLeast]] collapses divergence (a) for every
    * competitor inside the watermark horizon (spec-asserted); feeds
    * that must also agree across (b) need event-time-ordered delivery
    * within the watermark, the standard log-compaction assumption. */
  def batchDeduped(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    fingerprinted(docs)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("fp"))
          .orderBy(col("ts"), col("source"), col("text"))))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Batch twin of [[curatedStream]]. */
  def batchCurated(docs: DataFrame): DataFrame =
    batchDeduped(docs)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("n_stop", graft.operators.TextOps.stopHits)
      .filter(graft.operators.TextOps.qualityGate)
      .select(col("fp"), col("source"), col("ts"), col("n_tokens"))

  /** Batch twin of [[curationMonitorStream]]. */
  def batchMonitor(docs: DataFrame, width: String = "1 minute"): DataFrame =
    IngestMonitorStream.ingestCore(
      IngestMonitorStream.docMetrics(
        batchDeduped(docs)
          .select(col("source"), col("ts"), col("text"), col("n_chars"))),
      width)
}
