package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

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

  /** Hash a key to [0, 2^60) via the sketch family's ENGINE-PORTABLE
    * md5 prefix ([[PortableHash.hex60]]): any SQL engine can recompute
    * the hash stream (`CAST('0x' || substr(md5(key), 1, 15) AS
    * BIGINT)` in DuckDB), so the bottom-k sketch — and every estimate
    * derived from it — is externally checkable bit-for-bit, the same
    * contract as the MinHash/SimHash signatures. (xxhash64 was the
    * original choice; md5 costs more per key but a key-overlap probe
    * is one narrow column pass, not a hot loop.) */
  def hash(s: String): Long =
    PortableHash.hex60(s.getBytes("UTF-8"))

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

  /** The hash range: [[PortableHash.hex60]] emits 60-bit values. */
  val HashSpan: Double = 1152921504606846976.0 // 2^60

  /** Map a 60-bit hash to (0, 1] — the θ scale. `(h + 1) / 2^60` in
    * plain IEEE double ops, so an external engine reproduces the θ
    * (and the estimates) bit-for-bit from the same hash. */
  private def toUnit(h: Long): Double = (h.toDouble + 1.0) / HashSpan

  /** Distinct-count estimate from one sketch: `(k' − 1)/θ` with
    * k' = values held (exact count when the sketch never filled). */
  def distinctEstimate(sketch: Array[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble / toUnit(sketch(k - 1))

  /** θ-sketch intersection of two sketches: returns the raw
    * ingredients `(nCommon, nUnionSketch, unionEstimate)` — callers
    * derive Jaccard (`nCommon/nUnionSketch`) and the intersection
    * estimate (`jaccard · unionEstimate`); keeping the counts integral
    * here lets the query surface emit engine-exact columns. */
  def intersect(a: Array[Long], b: Array[Long], k: Int): (Int, Int, Double) = {
    val u = mergeBottomK(a, b, k)
    val aSet = a.toSet; val bSet = b.toSet
    val common = u.count(h => aSet.contains(h) && bSet.contains(h))
    (common, u.length, distinctEstimate(u, k))
  }
}
