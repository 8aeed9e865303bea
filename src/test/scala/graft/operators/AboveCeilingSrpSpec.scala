package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** End-to-end exercise of [[Dedup.deriveSrpPlanes]]'s above-ceiling
  * branch — the band refinement no fixture scale reaches (every driver
  * corpus is 500–5,000 vectors, below the 8192 six-plane ceiling).
  * Companion to [[AboveCeilingKnnSpec]]: builds a >8192-vector corpus
  * with PLANTED near-dup pairs, lets the band width default through the
  * derived branch, and asserts the claims the scale story makes — the
  * width actually refines, candidate generation stays a bucket
  * equi-join, precision is exact by construction, and the planted
  * near-dups survive the extra sign-agreement factor.
  */
class AboveCeilingSrpSpec extends SparkSpec {
  import spark.implicits._

  private val N = 9000        // > Dedup.SrpOracleMaxVectors = 8192
  private val Dim = 64
  private val Clusters = 600  // 15 per cluster: bounded true-pair count
  private val dir = "target/test-srp-scale"

  /** Deterministic clustered corpus: same-cluster points are planted
    * near-dups (small noise on a shared center ⇒ cosine ≈ 1), cross-
    * cluster pairs are near-orthogonal in 64 dims. ~2.2 MB of fixture. */
  private lazy val corpusDir: String = {
    val rnd = new scala.util.Random(0x5EED23)
    val centers = Array.fill(Clusters, Dim)(rnd.nextGaussian())
    val rows = (0 until N).map { i =>
      val c = i % Clusters
      val v = Array.tabulate(Dim)(j =>
        (centers(c)(j) + 0.05 * rnd.nextGaussian()).toFloat)
      Row(i.toLong, v.toSeq)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 4), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("above the ceiling the derived width refines and keeps planted near-dups") {
    val d = corpusDir
    assert(N > Dedup.SrpOracleMaxVectors)
    assert(Dedup.deriveSrpPlanes(N.toLong) == 7, "expected one refinement step")
    val pairs = Dedup.embeddingPairsBucketed(spark, d, 0.9)
      .select("vec_i", "vec_j").as[(Long, Long)].collect().toSet
    // precision is exact by construction (candidates verify against the
    // true cosine before emission); recall is the claim to check: at
    // cos ≈ 0.99 the per-band collision odds are ~(1−θ/π)⁷ ≈ 0.76, so
    // a planted pair escapes all 8 bands with probability ~1e-5. Demand
    // ≥ 99% of a planted-pair sample.
    val planted = (0 until 2000).map(i => (i.toLong, (i + Clusters).toLong))
    val found = planted.count { case (a, b) => pairs.contains((a, b)) }
    assert(found >= 1980, s"planted-pair recall $found/2000 at the refined width")
    // and the refinement actually separates: cross-cluster pairs are
    // near-orthogonal, so everything emitted should be same-cluster
    val crossCluster = pairs.count { case (a, b) => a % Clusters != b % Clusters }
    assert(crossCluster == 0, s"$crossCluster cross-cluster pairs above cos 0.9")
  }

  test("above-ceiling candidate generation stays a bucket equi-join") {
    val p = Dedup.embeddingPairsBucketed(spark, corpusDir, 0.9)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"refined-band candidate join degenerated:\n$p")
    // the banding index is checkpointed (built once, probed from both
    // join sides); the portable signature lives in the index BUILD plan
    assert(p.contains("ExistingRDD"),
      s"banding index should be a checkpointed scan:\n$p")
    val e = spark.read.parquet(s"$corpusDir/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val bp = Dedup.srpBandKeys(e, 7, 8).queryExecution.executedPlan.toString
    assert(bp.contains("srp_sig_portable"), s"portable signature missing:\n$bp")
  }
}
