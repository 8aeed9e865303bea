package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The end-to-end nightly curation query (q145): the single query a
  * training-data pipeline runs to materialize "tonight's training set"
  * — every stage an existing, individually-oracle-checked operator,
  * composed through the session's materialized layers so each layer is
  * built once and read once:
  *
  *   1. substring-level dedup strip (q134, `dup_spans` layer): cut
  *      corpus-duplicated ≥8-token spans out of every document
  *      (Lee et al. 2022) — boilerplate removal BEFORE quality
  *      scoring, so templated headers can't buy a document its
  *      stopword quota;
  *   2. quality + language gate (the q27/q28 composite of q62) over
  *      the CLEANED text — [[TextOps.qualityGate]] +
  *      [[TextOps.englishArgmax]], one projection, no second corpus
  *      scan;
  *   3. near-dup canonical keep (q61 semantics, `dedup_clusters`
  *      layer): survivors are their own cluster representative;
  *   4. semantic dedup keep (q129, the session IVF layer at the
  *      corpus-derived k): drop embedding-space near-copies within
  *      each cell, min-id dominance;
  *   5. mixture-weighted sampling (q97): per-language keep rates from
  *      the sqrt-smoothed token budget, decided by the deterministic
  *      doc-id hash.
  *
  * Scale shape: stages 2 and 5's predicates are map-side; every join
  * is a doc-keyed equi-join against a frame no larger than the corpus
  * (labels, semantic survivors, the 5-row broadcast rate table); the
  * only corpus-shaped shuffles are the ones the component operators
  * already pay (the span table's gram pass, the cluster labels, the
  * within-cell dominance join) — each paid ONCE via its session layer
  * regardless of how many consumers the session runs.
  *
  * Output: one row per kept document — the training set with its
  * cleaned text, semantic cell (for downstream balanced sampling),
  * and per-doc accounting of what the strip removed.
  */
object Curation {

  def trainingSet(spark: SparkSession, sfDir: String): DataFrame = {
    // 1. strip (dup_spans layer); gate metrics bind to the CLEANED text
    val cleaned = Dedup.stripDupSpans(spark, sfDir)
      .select(col("doc_id"), col("n_removed"),
        col("clean_text").as("text"))
    // 2. quality + English gate on what would actually be trained on
    val gated = cleaned
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_stop", TextOps.stopHits)
      .withColumn("score_en", TextOps.markerHits(TextOps.EnMarkers))
      .withColumn("score_es", TextOps.markerHits(TextOps.EsMarkers))
      .withColumn("score_de", TextOps.markerHits(TextOps.DeMarkers))
      .withColumn("score_fr", TextOps.markerHits(TextOps.FrMarkers))
      .filter(TextOps.qualityGate && TextOps.englishArgmax)
      .select(col("doc_id"), col("n_tokens").as("n_tokens_clean"),
        col("n_removed"), col("text").as("clean_text"))
    // 3. canonical near-dup representative (dedup_clusters layer)
    val canonical = Dedup.materializedClusters(spark, sfDir)
      .filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id"))
    // 4. semantic survivors (IVF layer, fixture doc_id = vec_id pairing)
    val semantic = Ivf.semanticKeep(spark, sfDir)
      .select(col("vec_id").as("doc_id"), col("cell"))
    // 5. mixture-sampled membership (rates broadcast inside the op)
    val sampled = TextOps.mixtureSample(spark, sfDir)
      .select(col("doc_id"), col("lang"))
    gated
      .join(canonical, Seq("doc_id"))
      .join(semantic, Seq("doc_id"))
      .join(sampled, Seq("doc_id"))
      .join(Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("cell"),
        col("n_tokens_clean"), col("n_removed"), col("clean_text"))
  }

  /** q146: [[trainingSet]] with BOTH decontamination gates applied —
    * the eval-set-protected variant a lab actually ships from. Two
    * independent leakage channels close:
    *
    *   - lexical: any document sharing an 8-gram shingle with the
    *     held-out eval slice is dropped ([[TextOps.decontamination]],
    *     q79 — verbatim and near-verbatim copies), and the eval
    *     documents themselves leave the pool;
    *   - semantic: any document whose embedding lands within cosine
    *     `0.6` of an eval vector is dropped
    *     ([[Similarity.embeddingDecontam]], q142 — paraphrased leakage
    *     that shares no 8-gram but sits next to its source in
    *     embedding space), and the eval vectors' own documents leave
    *     the pool (the q142 corpus already excludes them, so the
    *     doc-keyed inner join enforces it).
    *
    * Scale shape on top of q145's: the lexical gate is the q79
    * broadcast semi-join (eval grams are small by construction; the
    * corpus stream is already exploded once for the `dup_spans` layer,
    * and the anti-join here keys on doc_id against a
    * contamination-density-bounded hit list), the semantic gate is
    * q142's map-side partial-max fan-out — one row per corpus vector
    * reaches the final doc-keyed joins. Survivors carry
    * `max_eval_cos` so downstream audits can re-check the margin. */
  def trainingSetDecontaminated(spark: SparkSession, sfDir: String,
                                nEvalDocs: Int = 5): DataFrame = {
    val ngramHits = TextOps.decontamination(spark, sfDir, nEvalDocs)
      .select(col("doc_id"))
    val semanticVerdicts = Similarity.embeddingDecontam(spark, sfDir)
      .select(col("vec_id").as("doc_id"), col("max_eval_cos"),
        col("contaminated"))
    trainingSet(spark, sfDir)
      .filter(col("doc_id") >= nEvalDocs)
      .join(ngramHits, Seq("doc_id"), "left_anti")
      .join(semanticVerdicts, Seq("doc_id"))
      .filter(!col("contaminated"))
      .select(col("doc_id"), col("lang"), col("source"), col("cell"),
        col("n_tokens_clean"), col("n_removed"), col("max_eval_cos"),
        col("clean_text"))
  }
}
