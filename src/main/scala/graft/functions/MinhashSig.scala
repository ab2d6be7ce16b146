package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused MinHash signature: k seeded minima over a shingle-string array in
  * ONE codegen'd pass.
  *
  * The composable formulation — per-shingle base hash, then k ×
  * `array_min(seeded rehash)` — walks interpreted higher-order expressions
  * k+1 times per document (HOFs are CodegenFallback) and dominated the
  * near-dup operators' cost. This expression computes base hashes once and
  * streams all k seeded minima in a tight primitive loop.
  *
  * ENGINE-PORTABLE FAMILY (VERDICT r13 #3): the original family was
  * XXH64-seed-chained, which DuckDB cannot recompute, so every def whose
  * OUTPUT carries signature arithmetic (d24's estimator column) was
  * rows-only. The family is now the classic 2-universal linear congruence
  * over the portable poly-fold base hash of [[SimhashFns.tokenHash]]:
  *
  *   base_j = tokenHash(shingle_j) mod P          (P = 2147483629 < 2^31)
  *   h_s    = min_j (A_s · base_j + B_s) mod P    (A_s,B_s < P, so the
  *                                                 product < 2^62 — exact
  *                                                 in BIGINT on BOTH
  *                                                 engines, no overflow)
  *   A_s = 506952132·(s+1) mod P  (≢ 0: P prime, factor ≢ 0)
  *   B_s = 1013904223·(s+1) mod P
  *
  * Every step is exact integer arithmetic DuckDB replays verbatim
  * (list_reduce folds for the base, one modular affine map per seed), so
  * oracles can hash-gate signature-derived columns. Min-wise quality is
  * the standard universal-hashing one (Broder et al.); the banding
  * pigeonhole guarantee — est_j ≥ 1 − bands·rows⁻¹·… — is family-independent.
  */
object MinhashFns {

  val P = 2147483629L // prime < 2^31

  /** Seed s affine coefficients — MUST match the SQL twin in [[sqlSeedA]]/
    * [[sqlSeedB]] literally.
    */
  def seedA(s: Int): Long = (506952132L * (s + 1)) % P
  def seedB(s: Int): Long = (1013904223L * (s + 1)) % P

  /** Static worker shared by interpreted eval and generated code. */
  def sig(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val bases = new Array[Long](n)
    var i = 0
    while (i < n) {
      bases(i) =
        if (shingles.isNullAt(i)) 0L
        else SimhashFns.tokenHash(shingles.getUTF8String(i)) % P
      i += 1
    }
    val out = new Array[Long](k)
    var s = 0
    while (s < k) {
      val a = seedA(s)
      val b = seedB(s)
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a * bases(j) + b) % P
        if (v < m) m = v
        j += 1
      }
      out(s) = m
      s += 1
    }
    new GenericArrayData(out)
  }

  /** DuckDB twin: (id, s, component) rows — the k seeded minima per id —
    * from (id, shingle) rows. `$shingleRows` must be a SELECT producing
    * columns ($idCol, shingle).
    */
  def sqlSigComponents(idCol: String, shingleRows: String, k: Int): String =
    s"""SELECT $idCol, sd.s,
           MIN(((506952132 * (sd.s + 1)) % $P * b + (1013904223 * (sd.s + 1)) % $P) % $P) AS v
        FROM (SELECT $idCol, ${SimhashFns.sqlTokenHash("shingle")} % $P AS b
              FROM ($shingleRows) sr)
        CROSS JOIN (SELECT unnest(generate_series(0, ${k - 1})) AS s) sd
        GROUP BY $idCol, sd.s"""

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
