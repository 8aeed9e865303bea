package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic-value generators — the engine-side forms of
  * the reference's data-gen helpers (F6 `faker.regexify`,
  * `ProducerApp.kt:51`; F11 `fake.uuid4()`/`UUID.randomUUID()`,
  * `models.py:99`, `ProducerApp.kt:47`). The reference draws from
  * global RNGs; the engine's reproducibility discipline (seed 1237
  * everywhere, deterministic splitmix64 streams — same as the policy
  * draws) makes both a pure function of a bigint seed column, so
  * generated datasets are identical across runs, partitionings, and
  * replays.
  */
object GenOps {

  private def next(state: Long): Long = {
    var z = state + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** RFC-4122 v4-format UUID from two splitmix64 draws of `seed`
    * (version nibble 4, variant bits 10). */
  def uuid(seed: Long): UTF8String = {
    val hi0 = next(seed)
    val lo0 = next(seed + 1)
    val hi = (hi0 & 0xffffffffffff0fffL) | 0x0000000000004000L
    val lo = (lo0 & 0x3fffffffffffffffL) | 0x8000000000000000L
    val s = new java.lang.StringBuilder(36)
    def hex(v: Long, digits: Int): Unit = {
      var i = (digits - 1) * 4
      while (i >= 0) {
        s.append(Character.forDigit(((v >>> i) & 0xf).toInt, 16))
        i -= 4
      }
    }
    hex(hi >>> 32, 8); s.append('-')
    hex(hi >>> 16, 4); s.append('-')
    hex(hi, 4); s.append('-')
    hex(lo >>> 48, 4); s.append('-')
    hex(lo, 12)
    UTF8String.fromString(s.toString)
  }

  /** One parsed element of the supported pattern subset. */
  sealed trait Elem
  final case class Alt(options: Array[String], count: Int) extends Elem
  final case class Chars(set: Array[Char], count: Int) extends Elem
  final case class Lit(s: String) extends Elem

  /** Parse the regexify subset: `(a|b|c)` alternations, `[a-z0-9]{n}`
    * character classes (ranges + singles), `\d`/`\w` shorthands with
    * optional `{n}`, and literal characters. Fails fast at plan time on
    * anything outside the subset. */
  def parse(pattern: String): Array[Elem] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Elem]
    var i = 0
    def quant(default: Int): Int =
      if (i < pattern.length && pattern(i) == '{') {
        val close = pattern.indexOf('}', i)
        require(close > i, s"unclosed {n} in '$pattern'")
        val n = pattern.substring(i + 1, close).trim.toInt
        require(n >= 0, s"negative quantifier in '$pattern'")
        i = close + 1
        n
      } else default
    while (i < pattern.length) {
      pattern(i) match {
        case '(' =>
          val close = pattern.indexOf(')', i)
          require(close > i, s"unclosed group in '$pattern'")
          // limit -1 keeps EMPTY branches ("(a|)" really draws the
          // empty string half the time); a following {n} repeats the
          // whole alternation, each repetition drawn independently
          val opts = pattern.substring(i + 1, close).split("\\|", -1)
          i = close + 1
          out += Alt(opts, quant(1))
        case '[' =>
          val close = pattern.indexOf(']', i)
          require(close > i, s"unclosed class in '$pattern'")
          val body = pattern.substring(i + 1, close)
          val set = scala.collection.mutable.ArrayBuffer.empty[Char]
          var j = 0
          while (j < body.length) {
            if (j + 2 < body.length && body(j + 1) == '-') {
              require(body(j) <= body(j + 2), s"bad range in '$pattern'")
              (body(j) to body(j + 2)).foreach(set += _)
              j += 3
            } else { set += body(j); j += 1 }
          }
          require(set.nonEmpty, s"empty character class in '$pattern'")
          i = close + 1
          out += Chars(set.toArray, quant(1))
        case '\\' =>
          require(i + 1 < pattern.length, s"dangling escape in '$pattern'")
          val c = pattern(i + 1)
          i += 2
          c match {
            case 'd' => out += Chars(('0' to '9').toArray, quant(1))
            case 'w' => out += Chars(
              (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') :+ '_').toArray, quant(1))
            case other => out += Lit(other.toString)
          }
        case c =>
          i += 1
          out += Lit(c.toString)
      }
    }
    out.toArray
  }

  /** Generate one string for `seed` over the parsed elements: one
    * splitmix64 draw per choice, stream advanced left to right.
    * Takes `AnyRef` so generated Java can hold the reference object as
    * a plain `Object` (the Scala inner type `GenOps$Elem[]` has no
    * valid Java source name). */
  def gen(elemsObj: AnyRef, seed: Long): UTF8String = {
    val elems = elemsObj.asInstanceOf[Array[Elem]]
    val s = new java.lang.StringBuilder
    var state = seed
    def draw(bound: Int): Int = {
      state = next(state)
      // state >>> 1 is non-negative, so one modulo suffices
      ((state >>> 1) % bound).toInt
    }
    elems.foreach {
      case Alt(opts, n) =>
        var c = 0
        while (c < n) { s.append(opts(draw(opts.length))); c += 1 }
      case Chars(set, n) =>
        var c = 0
        while (c < n) { s.append(set(draw(set.length))); c += 1 }
      case Lit(l) => s.append(l)
    }
    UTF8String.fromString(s.toString)
  }
}

/** `seeded_uuid(seed)` — v4-format UUID, pure function of the seed. */
case class SeededUuid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"seeded_uuid requires bigint, got ${child.dataType.simpleString}")
  override def nullSafeEval(seed: Any): Any =
    GenOps.uuid(seed.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.GenOps.uuid($s)")
  override protected def withNewChildInternal(newChild: Expression): SeededUuid =
    copy(child = newChild)
  override def prettyName: String = "seeded_uuid"
}

/** `regex_gen('(Alice|Bob)[a-z]{3}', seed)` — deterministic regexify
  * over the supported subset; the pattern parses once at plan time and
  * rides into codegen as a reference object. */
case class RegexGen(child: Expression, pattern: String)
    extends UnaryExpression {
  private val elems = GenOps.parse(pattern) // fail fast at plan time
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"regex_gen requires a bigint seed, got ${child.dataType.simpleString}")
  override def nullSafeEval(seed: Any): Any =
    GenOps.gen(elems, seed.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("elems", elems, "java.lang.Object")
    defineCodeGen(ctx, ev, s => s"graft.functions.GenOps.gen($ref, $s)")
  }
  override protected def withNewChildInternal(newChild: Expression): RegexGen =
    copy(child = newChild)
  override def prettyName: String = "regex_gen"
}
