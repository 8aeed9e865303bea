package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Dense-vector assembly/projection expressions — the de-UDF'd forms of
  * the embedding pipeline's last Scala UDFs ([[graft.features.Features]]):
  * scatter (sparse index/value pairs → fixed-width dense array) and a
  * plan-time-matrix projection. Same static-helper codegen pattern as
  * [[NearestCentroids]]; arithmetic (loop order, zero-skip, final
  * rounding) is identical to the UDF bodies they replace, so outputs
  * are bit-for-bit unchanged.
  */
object DenseOps {
  /** Scatter `(indices, values)` into a zero-initialized `size`-wide
    * dense array: `out(indices(i)) = values(i)`. Out-of-range indices
    * are skipped (the UDF form's out-of-vocabulary semantics). */
  def scatter(idx: ArrayData, vals: ArrayData, size: Int): ArrayData = {
    val out = new Array[Double](size)
    val n = math.min(idx.numElements(), vals.numElements())
    var i = 0
    while (i < n) {
      val j = idx.getInt(i)
      if (j >= 0 && j < size) out(j) = vals.getDouble(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** `out = round6(xᵀ · P)` for a v×k row-major plan-time matrix:
    * zero-skipping row loop, 1e-6 rint rounding — exactly the embed
    * UDF's fold. */
  def matVec(x: ArrayData, proj: Array[Double], v: Int, k: Int): ArrayData = {
    val out = new Array[Double](k)
    val n = math.min(v, x.numElements())
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      if (xi != 0.0) {
        var c = 0
        while (c < k) { out(c) += xi * proj(i * k + c); c += 1 }
      }
      i += 1
    }
    var c = 0
    while (c < k) { out(c) = math.rint(out(c) * 1e6) / 1e6; c += 1 }
    new GenericArrayData(out)
  }
}

/** `scatter_dense(indices, values)` with plan-time width. */
case class ScatterDense(left: Expression, right: Expression, size: Int)
    extends BinaryExpression {
  require(size >= 0, s"scatter_dense width must be >= 0, got $size")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"scatter_dense requires (array<int>, array<double>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def nullSafeEval(idx: Any, vals: Any): Any =
    DenseOps.scatter(idx.asInstanceOf[ArrayData], vals.asInstanceOf[ArrayData], size)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (i, v) =>
      s"${ev.value} = graft.functions.DenseOps.scatter($i, $v, $size);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScatterDense =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "scatter_dense"
}

/** `mat_vec_project(x)` against a plan-time v×k row-major matrix (rides
  * into generated code as a reference object, broadcast with the task
  * binary — never serialized per row). */
case class MatVecProject(child: Expression, proj: Array[Double],
                         v: Int, k: Int) extends UnaryExpression {
  require(v >= 0 && k >= 0 && proj.length == v * k,
    s"projection matrix ${proj.length} != $v x $k")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mat_vec_project requires array<double>, got ${t.simpleString}")
  }
  override def nullSafeEval(x: Any): Any =
    DenseOps.matVec(x.asInstanceOf[ArrayData], proj, v, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("proj", proj, "double[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.DenseOps.matVec($x, $ref, $v, $k);")
  }
  override protected def withNewChildInternal(newChild: Expression): MatVecProject =
    copy(child = newChild)
  override def prettyName: String = "mat_vec_project"
}
