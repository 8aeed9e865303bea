package graft.functions

import org.apache.spark.sql.{Column, Encoder, GraftShims}
import org.apache.spark.sql.catalyst.expressions.XxHash64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch over a string stream — the point-frequency twin of
  * the Misra-Gries candidate pass ([[graft.operators.HeavyHitters]]):
  * `depth` hash rows × `width` counters, update = +1 at one bucket per
  * row, estimate = min over rows. Never underestimates; overestimates
  * by ≤ e·n/width with probability 1−e^−depth. The buffer is a flat
  * `Array[Long]` whose merge is pure elementwise addition — perfectly
  * commutative/associative, so the sketch is bit-identical under ANY
  * partitioning (spec-asserted), the property that makes it a safe
  * distributed accumulator at 100 TB.
  *
  * Hashing: row i uses `xxhash64(i, value)` — Spark's own codegen'd
  * [[XxHash64]] with the row index as a leading column, so the
  * ESTIMATE side can be a pure column expression over the collected
  * sketch (no UDF): the aggregator and the probe compute the identical
  * hash by construction ([[Cms.estimate]]).
  */
object Cms {
  final val Depth = 4

  class SketchAggregator(width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](Depth * width)
    override def reduce(buf: Array[Long], s: String): Array[Long] = {
      // nulls are skipped like SQL aggregates skip them — the public
      // column-level API must not NPE inside UTF8String/xxhash on a
      // null input string
      if (s != null) {
        var i = 0
        while (i < Depth) {
          buf(i * width + Cms.bucket(s, i, width)) += 1L
          i += 1
        }
      }
      buf
    }
    override def merge(l: Array[Long], r: Array[Long]): Array[Long] = {
      var i = 0
      while (i < l.length) { l(i) += r(i); i += 1 }
      l
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Bucket of `s` in hash row `i`: the same `xxhash64(i, s)` the
    * estimate expression computes. */
  def bucket(s: String, i: Int, width: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      UTF8String.fromString(s), StringType,
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        i.toLong, org.apache.spark.sql.types.LongType, 42L))
    (((h % width) + width) % width).toInt
  }

  /** Sketch column aggregating `c` (strings). */
  def sketchAgg(c: Column, width: Int): Column =
    udaf(new SketchAggregator(width)).apply(c)

  /** Point estimate of `token`'s count from `sketch` (array<long> of
    * Depth·width), as a pure column expression — min over the Depth
    * row buckets, each addressed by the codegen'd xxhash64. */
  def estimate(sketch: Column, token: Column, width: Int): Column = {
    val rows = (0 until Depth).map { i =>
      val h = GraftShims.column(XxHash64(
        Seq(GraftShims.expression(lit(i.toLong)),
          GraftShims.expression(token)), 42L))
      element_at(sketch, (lit(i * width) + pmod(h, lit(width)) + 1).cast("int"))
    }
    least(rows: _*)
  }
}
