package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Dot product of two `array<float>` columns, accumulated left-to-right
  * in double — a native Catalyst expression with whole-stage codegen.
  *
  * Semantically identical (bit-for-bit) to the declarative form
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0D, +)`,
  * but ~100× faster: Spark's higher-order functions are interpreted
  * per element (a lambda invocation per array slot), while this emits
  * one tight Java loop inside the generated code. On an ANN scan that
  * evaluates millions of candidate pairs × 64 dims, the interpreted
  * version dominates the query; this keeps the scan codegen'd
  * end-to-end. Sequential accumulation order is part of the contract —
  * it is what makes the result reproducible against other engines
  * (see SURVEY.md §7.3 on oracle parity).
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f32 requires (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF32 =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_f32"
}

/** Indices of the `nProbe` nearest centroids (squared L2, ties → lower
  * index) for an `array<float>` vector against a k×d row-major centroid
  * matrix baked in at plan time — the IVF assignment/probe primitive
  * (`Ivf.scala`). Replaces per-row Scala UDFs: the centroid matrix rides
  * along as a codegen reference object (broadcast with the task binary,
  * not serialized per row), the distance loop is one tight JVM method,
  * and the expression stays inside whole-stage codegen like
  * [[DotProductF32]].
  *
  * The selection is a partial selection sort — O(k·nProbe) with
  * k = #centroids ≤ a few hundred — semantically identical to sorting
  * all (distance, index) pairs ascending and taking the first nProbe.
  */
case class NearestCentroids(child: Expression, centroids: Array[Double],
                            nCentroids: Int, nProbe: Int)
    extends UnaryExpression {
  require(nCentroids >= 1 && centroids.length % nCentroids == 0,
    s"centroid matrix length ${centroids.length} not divisible by $nCentroids")
  require(nProbe >= 1 && nProbe <= nCentroids,
    s"nearest_centroids needs 1 <= nProbe <= nCentroids, got $nProbe of $nCentroids")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids requires array<float>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NearestCentroids.nearest(
      input.asInstanceOf[ArrayData], centroids, nCentroids, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NearestCentroids.nearest($a, $ref, $nCentroids, $nProbe);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
  override def prettyName: String = "nearest_centroids"
}

object NearestCentroids {
  /** Shared by interpreted eval and generated code. Accumulates the
    * squared distance in double with ascending-index scan order — the
    * exact arithmetic the previous UDF used, so assignments (and hence
    * q44 output) are bit-identical. */
  def nearest(arr: ArrayData, centroids: Array[Double],
              nCentroids: Int, nProbe: Int): ArrayData = {
    val dim = centroids.length / nCentroids
    val dists = new Array[Double](nCentroids)
    var c = 0
    while (c < nCentroids) {
      val base = c * dim
      var d = 0.0
      var i = 0
      val n = math.min(dim, arr.numElements())
      while (i < n) {
        val diff = arr.getFloat(i).toDouble - centroids(base + i)
        d += diff * diff
        i += 1
      }
      dists(c) = d
      c += 1
    }
    val out = new Array[Int](nProbe)
    val taken = new Array[Boolean](nCentroids)
    var p = 0
    while (p < nProbe) {
      var best = -1
      var bestD = Double.MaxValue
      c = 0
      while (c < nCentroids) {
        // strict < with ascending scan → ties resolve to the lower index
        if (!taken(c) && dists(c) < bestD) { bestD = dists(c); best = c }
        c += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
