package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column in one codegen'd pass.
  *
  * Replaces `array_distinct(zip_with-chain(slice(split(lower(text)))))` —
  * a stack of CodegenFallback higher-order functions that re-walks the
  * token array n times per document. One expression: lowercase, whitespace
  * split (the same UTF8String regex split `split(lower(text), "\\s+")`
  * lowers to), join n consecutive tokens with single spaces, keep the
  * FIRST occurrence of each distinct shingle (array_distinct order).
  * Documents with fewer than n tokens yield an empty array. Output strings
  * are byte-identical to the HOF formulation (WordShinglesSpec asserts
  * array equality on real documents), so minhash signatures, Jaccard
  * verification, and the DuckDB shingle oracles are unchanged.
  */
object ShingleFns {

  private val WsPattern = UTF8String.fromString("\\s+")
  private val Space = UTF8String.fromString(" ")

  /** Static worker shared by interpreted eval and generated code. */
  def shingles(text: UTF8String, n: Int): GenericArrayData = {
    val tokens = text.toLowerCase.split(WsPattern, -1)
    val count = tokens.length - (n - 1)
    if (count <= 0) return new GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 0
    while (i < count) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        parts(2 * j) = tokens(i + j)
        if (j < n - 1) parts(2 * j + 1) = Space
        j += 1
      }
      seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  def wordShingles(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))
}

/** `word_shingles(string, n) -> array<string>` — see [[ShingleFns]]. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string argument and n > 0, got ${other.catalogString}, n=$n")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleFns.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleFns.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
