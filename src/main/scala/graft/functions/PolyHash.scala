package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial code-point rolling hash `h ← (31·h + codepoint) mod m` in one
  * native pass over the string.
  *
  * Bit-identical to the relational fold
  * `aggregate(transform(split(s, ""), c -> ascii(c)), 0, (h, c) -> (h*31 + c) % m)`
  * (java's `split("")` breaks between CODE POINTS — surrogate pairs stay
  * whole — and `ascii` returns the first code point; parity is spec-pinned
  * over the corpus), but that formulation rides higher-order functions,
  * which are CodegenFallback: every scoring pipeline that buckets tokens
  * through it drops out of whole-stage codegen and allocates a per-char
  * array per token. The native expression restores the codegen span and
  * runs allocation-free. The modulus is a compile-time argument (a prime
  * below 2^53 keeps `h*31 + c` inside exact long range — [[graft.llm
  * .TextAnalysis.RollMod]]); DuckDB evaluates the identical arithmetic, so
  * oracles are unchanged.
  */
object PolyHashFns {

  /** Static worker shared by interpreted eval and generated code. */
  def polyHash(s: UTF8String, mod: Long): Long = {
    val str = s.toString
    val n = str.length
    var h = 0L
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  def polyHash(s: Column, mod: Long): Column =
    Bridge.column(PolyHash(Bridge.expression(s), mod))
}

/** `poly_hash(string) -> bigint` — see [[PolyHashFns]]. */
case class PolyHash(child: Expression, mod: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHashFns.polyHash(input.asInstanceOf[UTF8String], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.PolyHashFns.polyHash($a, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}
