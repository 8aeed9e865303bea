package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values / bottom-k theta) sketch over a string key
  * stream — the SET-OPERATION member of the engine's sketch family
  * (HLL answers "how many distinct", CMS answers "how often", MinHash
  * answers "how similar are two documents"; KMV answers "how much do
  * two TABLES' key sets overlap" without joining them). Keep the k
  * smallest `xxhash64` values of the distinct keys; then
  *
  *  - distinct estimate: `(k − 1) / θ` where θ is the k-th smallest
  *    hash mapped to (0, 1];
  *  - for two sketches: merge = bottom-k of the union (the sketch of
  *    the union by construction), Jaccard ≈ |bottomK(A∪B) ∩ A ∩ B|/k,
  *    and `|A ∩ B| ≈ J · |A ∪ B|` — the standard theta-sketch
  *    intersection estimate.
  *
  * The buffer is a sorted `Array[Long]` of at most k hashes; merge is
  * a bounded sorted-union — commutative/associative, so the sketch is
  * identical under ANY partitioning (spec-asserted), and k·8 bytes
  * bound the shuffle regardless of input size. Two 100 TB fact tables
  * compare with one map-side pass each plus a k-value driver fold —
  * the shape a lakehouse uses to estimate join cardinality or key-
  * coverage drift between snapshots before committing to the join.
  */
object Kmv {

  /** Hash a key to the full signed 64-bit range (seed 77 keeps the
    * stream independent of the CMS rows' `xxhash64(i, s)` draws).
    * Reuses the sketch family's shared string hash
    * ([[SketchHash.hashString]]). */
  def hash(s: String): Long =
    SketchHash.hashString(UTF8String.fromString(s), 77L)

  /** Sorted bottom-k union of two sorted arrays, distinct values. */
  def mergeBottomK(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    var last = 0L; var any = false
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (!any || v != last) { out(n) = v; n += 1; last = v; any = true }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  class SketchAggregator(k: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(k >= 2, s"k must be >= 2, got $k")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], s: String): Array[Long] =
      if (s == null) buf
      else {
        val h = hash(s)
        // saturation fast-path: once the sketch holds k values, a hash
        // at or above the current θ can never enter — O(1) with zero
        // allocation for virtually every row of a large scan, which is
        // where the one-pass 100 TB cost argument actually lives
        if (buf.length == k && h >= buf(k - 1)) buf
        else mergeBottomK(buf, Array(h), k)
      }
    override def merge(l: Array[Long], r: Array[Long]): Array[Long] =
      mergeBottomK(l, r, k)
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Map a signed 64-bit hash to (0, 1] — the θ scale. */
  private def toUnit(h: Long): Double =
    (h.toDouble - Long.MinValue.toDouble) / 1.8446744073709552e19 + 5.421e-20

  /** Distinct-count estimate from one sketch: `(k' − 1)/θ` with
    * k' = values held (exact count when the sketch never filled). */
  def distinctEstimate(sketch: Array[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble / toUnit(sketch(k - 1))

  /** θ-sketch intersection of two sketches: returns
    * (jaccard, unionEstimate, intersectEstimate). */
  def intersect(a: Array[Long], b: Array[Long], k: Int): (Double, Double, Double) = {
    val u = mergeBottomK(a, b, k)
    val aSet = a.toSet; val bSet = b.toSet
    val common = u.count(h => aSet.contains(h) && bSet.contains(h))
    val j = if (u.isEmpty) 0.0 else common.toDouble / u.length
    val uEst = distinctEstimate(u, k)
    (j, uEst, j * uEst)
  }
}
