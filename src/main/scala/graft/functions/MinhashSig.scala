package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused MinHash signature: k seeded minima over a shingle-string array in
  * ONE codegen'd pass.
  *
  * The composable formulation — `transform(sh, x => xxhash64(x))` to get
  * base hashes, then k × `array_min(transform(hs, h => xxhash64(lit(s),
  * h)))` — walks interpreted higher-order expressions k+1 times per
  * document (HOFs are CodegenFallback) and dominated the near-dup
  * operators' cost. This expression computes base hashes once and streams
  * all k seeded minima in a tight primitive loop, bit-identical to the HOF
  * version: base = XXH64(utf8, seed=42) (Spark's `xxhash64(x)`), candidate
  * for seed s = XXH64.hashLong(base, XXH64.hashInt(s, 42)) (Spark's
  * `xxhash64(lit(s), h)` seed chaining), null shingles hash to the seed
  * itself (Spark's null-skip rule). Min-wise independence is unchanged —
  * same hash family, same values.
  */
object MinhashFns {

  private val XxSeed = 42L

  /** Static worker shared by interpreted eval and generated code. */
  def sig(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val bases = new Array[Long](n)
    var i = 0
    while (i < n) {
      bases(i) =
        if (shingles.isNullAt(i)) XxSeed
        else XXH64.hashUTF8String(shingles.getUTF8String(i), XxSeed)
      i += 1
    }
    val out = new Array[Long](k)
    var s = 0
    while (s < k) {
      val seed = XXH64.hashInt(s, XxSeed)
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = XXH64.hashLong(bases(j), seed)
        if (v < m) m = v
        j += 1
      }
      out(s) = m
      s += 1
    }
    new GenericArrayData(out)
  }

  def minhashSig(shingles: Column, k: Int): Column =
    Bridge.column(MinhashSig(Bridge.expression(shingles), k))
}

/** `minhash_sig(array<string>, k) -> array<long>` — see [[MinhashFns]].
  * Null on null or EMPTY input (a document with no shingles has no
  * signature; callers filter empties like the HOF pipeline did).
  */
case class MinhashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires an array<string> argument and k > 0, got ${other.catalogString}, k=$k")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null else MinhashFns.sig(arr, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |if ($a.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.MinhashFns.sig($a, $k);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}
