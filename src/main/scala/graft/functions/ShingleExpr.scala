package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column —
  * `word_shingles(text, n)` → `array<string>`, null when the text has
  * fewer than n tokens.
  *
  * Semantically identical to
  * `array_distinct(transform(sequence(0, size(toks)-n), i ->
  * concat_ws(' ', slice(toks, i+1, n))))` over `split(text, ' ')`, but
  * one `eval` per row with a single tokenize pass and a hash-set
  * dedupe, instead of an interpreted lambda per shingle. Shingling
  * feeds every dedup path (Jaccard join, MinHash, SimHash), and in a
  * self-join Spark evaluates the subtree once per side — so this sits
  * on the hottest path of the corpus-dedup queries twice over.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // produces null for sub-n-token inputs regardless of child
  // nullability — without this override Catalyst would fold away the
  // IsNotNull guards callers rely on
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires STRING, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) return null
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    var i = 0
    val last = toks.length - n
    val sb = new java.lang.StringBuilder(64)
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}
