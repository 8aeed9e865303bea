package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (z-order) bit interleave of two non-negative longs as one
  * native codegen'd expression: bit i of `x` lands at position 2i, bit
  * i of `y` at 2i+1, over the low `bits` bits of each.
  *
  * The declarative twin ([[graft.operators.ZOrder.interleave]], a fold
  * of shift/mask columns) stays as the spec-side oracle; this form
  * collapses the 2·bits-node expression tree into one tight loop — the
  * codegen tier of SURVEY.md §4.2's preference order, worth it because
  * z-values are computed once per ROW of a 100 TB table at layout time.
  */
case class ZOrderInterleave(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 32, s"bits must be in [1,32], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderInterleave.interleave(
      x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val z = ctx.freshName("zVal")
      val i = ctx.freshName("zI")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($x >>> $i) & 1L) << (2 * $i);
         |  $z |= (($y >>> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderInterleave =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "zorder2"
}

object ZOrderInterleave {
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
