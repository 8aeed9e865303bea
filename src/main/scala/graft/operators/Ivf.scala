package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to [[Similarity.lshTopK]]: a coarse k-means quantizer
  * partitions the corpus into cells; a query probes only its `nProbe`
  * nearest cells, so the scored candidate set is |corpus|·nProbe/k
  * instead of |corpus|.
  *
  * Everything is DataFrame ops: assignment is a broadcast of the k×d
  * centroid matrix (tiny) + argmin distance per row; centroid updates
  * are `posexplode` → per-(cluster, dim) mean → collect k×d back
  * (bounded by k·d, not corpus). Deterministic init (first k vectors
  * by id) keeps runs comparable; float-mean drift across partitionings
  * is possible in principle (documented) which is why correctness is
  * asserted via the probe-all ≡ brute-force invariant and recall
  * bounds, not bitwise equality.
  */
object Ivf {

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"),
      Similarity.l2norm(col("embedding")).as("nrm"))

  // Assignment and probing are the native codegen'd
  // [[graft.functions.NearestCentroids]] expression (ties → lowest
  // cluster id, identical arithmetic to the former per-row Scala UDFs —
  // which cost a serialize/deserialize per row and broke whole-stage
  // codegen on the scan).
  private[operators] def assignExpr(centroids: Array[Array[Double]]) = (emb: Column) =>
    graft.functions.nearestCentroids(emb, centroids.flatten, centroids.length, 1)
      .getItem(0)

  private[operators] def nearestClusters(centroids: Array[Array[Double]], nProbe: Int) =
    (emb: Column) =>
      graft.functions.nearestCentroids(emb, centroids.flatten, centroids.length, nProbe)

  /** Lloyd iterations; returns the centroid matrix. */
  def fitCentroids(spark: SparkSession, sfDir: String, k: Int,
                   iters: Int): Array[Array[Double]] = {
    import spark.implicits._
    val e = Similarity.spread(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), col("embedding")).cache()
    // deterministic init: the k lowest vec_ids
    var centroids = e.orderBy("vec_id").limit(k)
      .select("embedding").as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    var it = 0
    while (it < iters) {
      val assigned = e.withColumn("cluster", assignExpr(centroids)(col("embedding")))
      val means = assigned
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("cluster", "dim").agg(avg(col("v")).as("m"))
        .groupBy("cluster").agg(collect_list(struct(col("dim"), col("m"))).as("dm"))
        .as[(Int, Seq[(Int, Double)])].collect()
      val next = centroids.clone()
      means.foreach { case (c, dm) =>
        val arr = new Array[Double](dm.length)
        dm.foreach { case (d, m) => arr(d) = m }
        next(c) = arr
      }
      centroids = next
      it += 1
    }
    e.unpersist()
    centroids
  }

  /** The materialized INDEX layer: an IVF index is built once and every
    * query probes it — the centroid matrix (k×d, catalog-bounded) is
    * fitted once per (session, sfDir, k, iters), the same layer
    * discipline as [[Dedup.materializedClusters]] and
    * [[graft.ml.LinUCB.seededModels]]. */
  def fittedCentroids(spark: SparkSession, sfDir: String, k: Int,
                      iters: Int): Array[Array[Double]] =
    centroidCache.getOrCompute(spark, (sfDir, k, iters)) {
      fitCentroids(spark, sfDir, k, iters)
    }

  private val centroidCache =
    new graft.SessionCache[(String, Int, Int), Array[Array[Double]]]()

  /** ANN top-k probing `nProbe` of `k` cells. `nProbe == k` degenerates
    * to exact brute force (spec-asserted invariant). */
  def topK(spark: SparkSession, sfDir: String, nQueries: Int = 10, topk: Int = 5,
           kClusters: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame = {
    val centroids = fittedCentroids(spark, sfDir, kClusters, iters)
    val e = withNorm(Similarity.spread(Tables.embeddings(spark, sfDir)))
      .withColumn("cluster", assignExpr(centroids)(col("embedding")))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
        col("nrm").as("qnrm"))
      .withColumn("probe", explode(nearestClusters(centroids, nProbe)(col("qemb"))))
    val scored = e.join(broadcast(q),
        col("cluster") === col("probe") && col("vec_id") =!= col("qid"))
      .withColumn("cos_sim", round(
        Similarity.dot(col("embedding"), col("qemb")) / (col("nrm") * col("qnrm")), 4))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cos_sim"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topk)
      .select(col("qid"), col("vec_id").as("nbr_id"), col("rank"), col("cos_sim"))
  }
}
