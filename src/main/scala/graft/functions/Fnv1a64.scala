package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable rolling fingerprint: `h ← (h·31 + codepoint) mod
  * 1e9+7` over Unicode codepoints. Unlike FNV-1a/xxhash64 this is
  * reproducible in plain SQL on any engine (the DuckDB oracle computes
  * it with `list_reduce` over `ascii(ch)`), which makes fingerprints an
  * oracle-CHECKED dedup key rather than a rows-only one. Codepoint
  * iteration (not UTF-16 units) keeps multi-byte text (`zh` docs)
  * consistent with engines that index by codepoint. */
case class PolyHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"poly_hash64 requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // same codepoint loop as nullSafeEval, emitted into whole-stage
      // codegen; freshName so multiple calls can share a method
      val s = ctx.freshName("phStr")
      val h = ctx.freshName("phH")
      val i = ctx.freshName("phI")
      val cp = ctx.freshName("phCp")
      s"""
         |String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31L + $cp) % 1000000007L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
  override def prettyName: String = "poly_hash64"
}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit FNV-1a document fingerprint as a native Catalyst expression.
  *
  * Preference order for extending Spark (SURVEY.md §4.2): compose
  * built-ins > custom `Expression` with codegen > UDF. A fingerprint
  * over raw bytes has no built-in composition, so this is the codegen
  * tier: `doGenCode` emits a tight byte loop that participates in
  * whole-stage codegen — no boxing, no UDF call overhead, which matters
  * when fingerprinting 100 TB of documents.
  */
case class Fnv1a64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fnv1a64 requires STRING input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Fnv1a64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName: two fnv1a64 calls can land in one codegen method —
      // fixed local names would collide and break whole-stage codegen
      val bytes = ctx.freshName("fnvBytes")
      val h = ctx.freshName("fnvH")
      val i = ctx.freshName("fnvI")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = ${Fnv1a64.OffsetBasis}L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h ^= (long)($bytes[$i] & 0xff);
         |  $h *= ${Fnv1a64.Prime}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
  override def prettyName: String = "fnv1a64"
}

object Fnv1a64 {
  val OffsetBasis: Long = -3750763034362895579L // 0xcbf29ce484222325
  val Prime: Long = 1099511628211L              // 0x100000001b3

  def hash(bytes: Array[Byte]): Long = {
    var h = OffsetBasis
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xff).toLong
      h *= Prime
      i += 1
    }
    h
  }
}
