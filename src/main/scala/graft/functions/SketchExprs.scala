package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketch signatures (MinHash, SimHash, sign-random-projection) as
  * native expressions.
  *
  * These replace declarative forms built from nested higher-order
  * functions (`transform(sequence(0,63), i -> array_min(transform(...,
  * s -> xxhash64(s, i))))`), which Spark evaluates interpreted, one
  * lambda call per (element × hash). A signature over a 100-token
  * document costs 64×100 interpreted evals that way; here it is one
  * `eval` call per row with tight JVM loops inside. `CodegenFallback`
  * is deliberate: the per-row work (thousands of hash mixes) dwarfs the
  * row-transition overhead codegen would save, and the hash loop
  * itself is already compiled Java.
  *
  * Hash parity: uses Spark's own [[XXH64]] with the exact chaining the
  * `xxhash64(...)` SQL function applies (seed 42, each argument's hash
  * seeds the next), so results are bit-identical to the declarative
  * form — asserted by ScalaTest cross-checks.
  */
object SketchHash {
  val Seed = 42L

  /** xxhash64(s) for one UTF8String, as the SQL function computes it. */
  def hashString(s: UTF8String, seed: Long = Seed): Long =
    XXH64.hashUTF8String(s, seed)

  /** xxhash64(s, i) where i is an INT: chain int hash after string. */
  def hashStringInt(stringHash: Long, i: Int): Long =
    XXH64.hashInt(i, stringHash)
}

/** MinHash signature: `minhash_sig(shingles, k)` → `array<long>` where
  * `sig[i] = min over shingles of xxhash64(shingle, i)`.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  require(numHashes >= 1, s"minhash_sig needs numHashes >= 1, got $numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // empty input arrays produce null irrespective of child nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val total = arr.numElements()
    // Hash every shingle once; the per-slot hash is a cheap int-mix of
    // the precomputed 64-bit string hash (exactly xxhash64(s, i)).
    // Null elements contribute nothing (same as xxhash64 skipping a
    // null argument would drop it from the chain).
    val base = new Array[Long](total)
    var n = 0
    var j = 0
    while (j < total) {
      val s = arr.getUTF8String(j)
      if (s != null) { base(n) = SketchHash.hashString(s); n += 1 }
      j += 1
    }
    if (n == 0) return null
    val sig = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      var min = Long.MaxValue
      var k = 0
      while (k < n) {
        val h = SketchHash.hashStringInt(base(k), i)
        if (h < min) min = h
        k += 1
      }
      sig(i) = min
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** SimHash: `simhash64(shingles)` → 64-bit signature. Bit b is set iff
  * the sum over shingles of (+1 if bit b of xxhash64(shingle) else -1)
  * is positive.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  // content-free input (empty / all-null array) yields null, matching
  // MinHashSig — otherwise every empty doc would share signature 0 and
  // collide at hamming 0
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val bitsums = new Array[Int](64)
    var contributed = 0
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        contributed += 1
        val h = SketchHash.hashString(s)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) bitsums(b) += 1 else bitsums(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    if (contributed == 0) return null
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (bitsums(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Sign-random-projection LSH bucket id: `srp_bucket(embedding, p)` —
  * bit p of the bucket is the sign of the projection onto pseudo-random
  * hyperplane p, whose weights are derived arithmetically from
  * xxhash64 of (plane, dim) — deterministic, no RNG state to ship.
  * Weight parity with the declarative form
  * `(pmod(xxhash64(p*1024+i), 2000001) - 1e6) / 1e6` is exact.
  */
case class SrpBucket(child: Expression, numPlanes: Int)
    extends UnaryExpression with CodegenFallback {
  // One bit per plane packed into a single long: >64 planes would wrap
  // the `1L << p` shift mod 64 and silently alias bucket ids.
  require(numPlanes >= 1 && numPlanes <= 64,
    s"srp_bucket needs 1 <= numPlanes <= 64, got $numPlanes")
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_bucket requires array<float>, got ${t.simpleString}")
  }

  // Weight matrix is a pure function of (plane, dim): materialize once
  // per executor at first use, not per row. 1024 dims is the cap the
  // hash-index scheme encodes.
  @transient private lazy val weights: Array[Array[Double]] =
    Array.tabulate(numPlanes, SrpBucket.MaxDims) { (p, i) =>
      val h = XXH64.hashInt(p * 1024 + i, SketchHash.Seed)
      (java.lang.Math.floorMod(h, 2000001L) - 1000000L).toDouble / 1000000.0
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), SrpBucket.MaxDims)
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      val w = weights(p)
      var proj = 0.0
      var i = 0
      while (i < n) {
        proj += arr.getFloat(i).toDouble * w(i)
        i += 1
      }
      if (proj >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
  override def prettyName: String = "srp_bucket"
}

object SrpBucket {
  val MaxDims = 1024
}

/** ENGINE-PORTABLE sign-random-projection signature: like [[SrpBucket]]
  * but the hyperplane weights come from pure integer arithmetic —
  * `w(p,i) = (((p·1024 + i) · 2654435761) mod 2000001 − 1000000) / 10⁶`
  * — so an external SQL engine can recompute the signature bit-for-bit
  * (the [[SrpBucket]] weights come from Spark's xxhash64, which DuckDB
  * cannot evaluate). This is what lets the bucketed embedding near-dup
  * join keep a hash-checked oracle: both engines derive the same
  * buckets, so the bucket-restricted result sets are comparable.
  *
  * The signature packs one sign bit per plane (bit p = 1 iff the
  * projection onto plane p is ≥ 0, accumulated left-to-right in double —
  * the same fold order as `list_sum`/`aggregate`, which is what makes
  * the sign reproducible). Band keys are then bit-slices of the
  * signature (`shiftright(sig, band·r) & (2^r − 1)`) — derived in plain
  * SQL on both sides.
  */
case class PortableSrpSig(child: Expression, numPlanes: Int)
    extends UnaryExpression with CodegenFallback {
  require(numPlanes >= 1 && numPlanes <= 64,
    s"srp_sig_portable needs 1 <= numPlanes <= 64, got $numPlanes")
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_sig_portable requires array<float>, got ${t.simpleString}")
  }

  @transient private lazy val weights: Array[Array[Double]] =
    Array.tabulate(numPlanes, SrpBucket.MaxDims) { (p, i) =>
      PortableSrpSig.weight(p, i)
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), SrpBucket.MaxDims)
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      val w = weights(p)
      var proj = 0.0
      var i = 0
      while (i < n) {
        proj += arr.getFloat(i).toDouble * w(i)
        i += 1
      }
      if (proj >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): PortableSrpSig =
    copy(child = newChild)
  override def prettyName: String = "srp_sig_portable"
}

object PortableSrpSig {
  /** The portable weight formula — kept callable so specs can assert
    * the SQL-side reconstruction matches. Knuth multiplier stride mod a
    * prime-ish modulus: uniform-ish in [-1, 1], zero state to ship. */
  def weight(plane: Int, dim: Int): Double =
    (((plane.toLong * 1024L + dim) * 2654435761L) % 2000001L - 1000000L)
      .toDouble / 1000000.0
}
