package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.SparkSpec

/** Property-style hardening of the round-6 native expressions and the
  * media codec: seeded random inputs exercise shapes the fixtures never
  * produce (degenerate sizes, out-of-range indices, extreme header
  * values), asserting each static helper against a naive reference
  * implementation. These run WITHOUT Spark plans (the helpers are the
  * exact code both interpreted eval and codegen call), which is what
  * makes thousands of cases cheap. */
class NativeExprPropSpec extends SparkSpec {

  private def arr(xs: Array[Double]) = new GenericArrayData(xs)

  test("DenseOps.scatter == naive scatter on random (idx, vals), incl. out-of-range") {
    val r = new scala.util.Random(20260813L)
    for (_ <- 1 to 500) {
      val size = r.nextInt(40)
      val n = r.nextInt(30)
      // indices deliberately range over [-5, size+5): out-of-range must
      // be skipped, never thrown
      val idx = Array.fill(n)(r.nextInt(size + 10) - 5)
      val vals = Array.fill(n)(r.nextDouble() * 100 - 50)
      val got = DenseOps.scatter(
        new GenericArrayData(idx), arr(vals), size).toDoubleArray()
      val want = new Array[Double](size)
      for (i <- 0 until n if idx(i) >= 0 && idx(i) < size) want(idx(i)) = vals(i)
      assert(got.sameElements(want))
    }
  }

  test("DenseOps.matVec == naive matrix fold on random vectors/matrices") {
    val r = new scala.util.Random(42L)
    for (_ <- 1 to 300) {
      val v = 1 + r.nextInt(20)
      val k = 1 + r.nextInt(8)
      val proj = Array.fill(v * k)(r.nextDouble() * 2 - 1)
      val x = Array.fill(v)(if (r.nextInt(3) == 0) 0.0 else r.nextDouble() * 4 - 2)
      val got = DenseOps.matVec(arr(x), proj, v, k).toDoubleArray()
      val want = new Array[Double](k)
      for (i <- 0 until v; c <- 0 until k) want(c) += x(i) * proj(i * k + c)
      for (c <- 0 until k) want(c) = math.rint(want(c) * 1e6) / 1e6
      assert(got.sameElements(want))
    }
  }

  test("PolicyMath draws are in range and deterministic across calls") {
    val r = new scala.util.Random(7L)
    for (_ <- 1 to 2000) {
      val seed = r.nextLong()
      val u = PolicyMath.seededUniform(seed)
      assert(u > 0.0 && u <= 1.0, s"uniform $u out of (0,1] for seed $seed")
      assert(u == PolicyMath.seededUniform(seed))
      val z = PolicyMath.seededNormal(seed)
      assert(!z.isNaN && !z.isInfinite)
      assert(z == PolicyMath.seededNormal(seed))
    }
  }

  test("GenOps pattern subset: group quantifiers, empty branches, plan-time rejection") {
    // (a|b){2}: the quantifier applies to the GROUP, drawn per repetition
    val e = GenOps.parse("(a|b){2}")
    for (seed <- 1L to 200L) {
      val s = GenOps.gen(e, seed).toString
      assert(s.length == 2 && s.forall(c => c == 'a' || c == 'b'), s)
    }
    // empty alternation branch is reachable
    val e2 = GenOps.parse("(x|)")
    val outs = (1L to 200L).map(s => GenOps.gen(e2, s).toString).toSet
    assert(outs == Set("x", ""), s"empty branch unreachable: $outs")
    // malformed patterns die at PLAN time, never per-row
    intercept[IllegalArgumentException](GenOps.parse("[]{3}"))
    intercept[IllegalArgumentException](GenOps.parse("(a|b"))
    intercept[IllegalArgumentException](GenOps.parse("[z-a]"))
  }

  test("NearestCentroids.nearest == naive probe order on random vectors, ties to lowest cell") {
    val r = new scala.util.Random(1281290L)
    for (_ <- 1 to 300) {
      val dim = 1 + r.nextInt(16)
      val k = 1 + r.nextInt(10)
      val flat = Array.fill(k * dim)(r.nextDouble() * 2 - 1)
      // force exact distance ties on ~1/3 of the cases by duplicating a
      // centroid: the tie MUST resolve to the lower cell id, in every
      // probe position
      if (k >= 2 && r.nextInt(3) == 0) {
        val src = r.nextInt(k); val dst = r.nextInt(k)
        System.arraycopy(flat, src * dim, flat, dst * dim, dim)
      }
      val v = Array.fill(dim)(r.nextFloat() * 2 - 1)
      val nProbe = 1 + r.nextInt(k)
      val got = NearestCentroids.nearest(
        new GenericArrayData(v), flat, k, nProbe).toIntArray()
      val want = (0 until k).map { c =>
        var d = 0.0; var i = 0
        while (i < dim) {
          val diff = v(i).toDouble - flat(c * dim + i); d += diff * diff; i += 1
        }
        (d, c)
      }.sortBy { case (d, c) => (d, c) }.take(nProbe).map(_._2).toArray
      assert(got.sameElements(want),
        s"probe order ${got.toSeq} != ${want.toSeq} (k=$k dim=$dim nProbe=$nProbe)")
    }
  }

  test("MediaCodec wav/bmp round-trip on random dimensions and payloads") {
    import graft.operators.MediaCodec
    val r = new scala.util.Random(99L)
    for (_ <- 1 to 300) {
      val data = Array.fill(r.nextInt(200))(r.nextInt(256).toByte)
      val w = 1 + r.nextInt(8192)
      val h = 1 + r.nextInt(8192)
      val di = MediaCodec.decode(1L, MediaCodec.bmp(w, h, data))
      assert(di.container == "bmp" && di.width_px.contains(w.toLong) &&
        di.height_px.contains(h.toLong) && di.data_bytes == data.length.toLong)
      val ch = 1 + r.nextInt(8)
      val rate = 1 + r.nextInt(192000)
      val da = MediaCodec.decode(2L, MediaCodec.wav(ch, rate, data))
      assert(da.container == "wav" && da.channels.contains(ch.toLong) &&
        da.sample_rate.contains(rate.toLong) && da.data_bytes == data.length.toLong)
      val wantMs = data.length.toLong * 1000L / (rate.toLong * ch * 2L)
      assert(da.duration_ms.contains(wantMs))
    }
  }
}
