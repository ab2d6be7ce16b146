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
  *
  * (A_s, B_s) are 64 FIXED CONSTANTS (a splitmix64 stream, embedded as
  * literals here and in the SQL twin's VALUES list). They must be mutually
  * independent: the first cut derived both from s — A_s = a·(s+1),
  * B_s = c·(s+1) — which collapses every seeded map to (s+1)·(a·b+c) mod P,
  * one fixed scramble rescaled per seed; the 64 minima stop being
  * independent permutations and est_j read 0.55 for a pair with true
  * j = 0.02 (caught by LlmSpec's error-bound pin).
  *
  * Every step is exact integer arithmetic DuckDB replays verbatim
  * (list_reduce folds for the base, one modular affine map per seed), so
  * oracles can hash-gate signature-derived columns. Min-wise quality is
  * the standard universal-hashing one (Broder et al.); the banding
  * pigeonhole guarantee — est_j ≥ 1 − bands·rows⁻¹·… — is family-independent.
  */
object MinhashFns {

  val P = 2147483629L // prime < 2^31

  val SeedA: Array[Long] = Array(
    1502300450L, 400716308L, 938460835L, 1389245833L, 699789887L, 1999155067L, 28281638L, 622240233L,
    606229130L, 1723931715L, 697104036L, 2102126075L, 141256599L, 350034680L, 505614177L, 1890132987L,
    402153486L, 1214751178L, 89876680L, 943870141L, 794318245L, 305234330L, 2129169706L, 526857626L,
    555734937L, 333128278L, 872343578L, 2067616244L, 2065590944L, 398016220L, 1522335626L, 1870706795L,
    1172616414L, 85151003L, 1240545854L, 2120193692L, 2028770058L, 797664174L, 148566233L, 746177285L,
    1016959619L, 719606130L, 1784755577L, 543959990L, 983257896L, 1205964039L, 2106936871L, 1381933004L,
    1887622535L, 122494140L, 1474076458L, 1981814469L, 1712300477L, 857831000L, 665260838L, 1940475616L,
    657735818L, 1030671931L, 219662345L, 2015277395L, 1375930879L, 1381648963L, 486890183L, 1967690759L)

  val SeedB: Array[Long] = Array(
    797764987L, 1711211183L, 124968309L, 1128078009L, 76446941L, 823810552L, 1431687361L, 506145128L,
    2033138920L, 1212096207L, 2100744142L, 905006066L, 683436865L, 741869348L, 344350271L, 2140229211L,
    1037138456L, 1660130882L, 880673126L, 252121797L, 522999117L, 680252590L, 1569823863L, 1308980860L,
    255357370L, 783696593L, 1470189693L, 1029473882L, 1300729794L, 894782181L, 129055726L, 689220203L,
    598156491L, 1785531468L, 1335756995L, 982238307L, 2134836598L, 288808813L, 1237072212L, 918236525L,
    953735118L, 1041890581L, 400442086L, 369155998L, 551987651L, 5347676L, 1950964501L, 1345620729L,
    1605439545L, 1581194528L, 492713095L, 841703457L, 266548238L, 47256185L, 1886571278L, 1771982799L,
    1428840422L, 59525393L, 365983323L, 468019575L, 91093577L, 1305895658L, 406954011L, 1041445348L)

  /** Seed s affine coefficients — the same literals the SQL twin inlines. */
  def seedA(s: Int): Long = SeedA(s)
  def seedB(s: Int): Long = SeedB(s)

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
    * columns ($idCol, shingle). The seed constants are inlined as a
    * VALUES list — literal-for-literal the Scala arrays above.
    */
  def sqlSigComponents(idCol: String, shingleRows: String, k: Int): String = {
    require(k <= SeedA.length, s"sqlSigComponents: k=$k exceeds the ${SeedA.length}-seed family")
    val seeds = (0 until k)
      .map(s => s"($s, ${SeedA(s)}, ${SeedB(s)})").mkString(", ")
    s"""SELECT $idCol, sd.s, MIN((sd.a * b + sd.bb) % $P) AS v
        FROM (SELECT $idCol, ${SimhashFns.sqlTokenHash("shingle")} % $P AS b
              FROM ($shingleRows) sr)
        CROSS JOIN (SELECT * FROM (VALUES $seeds) AS st(s, a, bb)) sd
        GROUP BY $idCol, sd.s"""
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
    case ArrayType(StringType, _) if k > 0 && k <= MinhashFns.SeedA.length =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires an array<string> argument and 0 < k <= " +
        s"${MinhashFns.SeedA.length}, got ${other.catalogString}, k=$k")
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
