package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit frequency-weighted SimHash of a token array in one pass.
  *
  * The relational formulation — explode(tokens) → groupBy(doc) → 64
  * conditional sums — is correct but pays a full shuffle (one combined row
  * per doc per partition) for what is a PER-DOCUMENT computation. As a
  * native expression the fingerprint is a narrow map: each token occurrence
  * votes ±1 on each of the 64 bits of its `xxhash64`, bit k of the result
  * is the sign of the tally. Bit-identical to the aggregation version
  * (same XXH64 base hash, same ±1 votes, same >0 threshold); at 100 TB the
  * operator needs ZERO data movement.
  */
object SimhashFns {

  private val XxSeed = 42L

  /** Static worker shared by interpreted eval and generated code. */
  def simhash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (tokens.isNullAt(i)) XxSeed
        else XXH64.hashUTF8String(tokens.getUTF8String(i), XxSeed)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) {
      if (votes(k) > 0) out |= (1L << k)
      k += 1
    }
    out
  }

  def simhash64(tokens: Column): Column =
    Bridge.column(Simhash64(Bridge.expression(tokens)))
}

/** `simhash64(array<string>) -> bigint` — see [[SimhashFns]]. */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires an array<string> argument, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimhashFns.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimhashFns.simhash($a)")

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}
