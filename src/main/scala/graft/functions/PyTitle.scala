package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Python-exact `str.title()` semantics (reference
  * /root/reference/src/transform.py:45-106 standardize_category/merchant/
  * payment_method all call `.title()`).
  *
  * Python title-cases a letter whenever the PREVIOUS character is not a
  * cased letter — so apostrophes and digits restart capitalization:
  * `"o'brien-smith 2x llc"` → `"O'Brien-Smith 2X Llc"`. Spark's built-in
  * `initcap` only capitalizes after whitespace (`"O'brien-smith 2x llc"`),
  * which is the semantic gap SURVEY §7.4 #3 flags. Implemented as a native
  * Catalyst expression with codegen (not a Scala UDF) so it stays inside
  * whole-stage codegen in the hot path.
  */
object PyTitle {

  /** Static worker (scalac emits a static forwarder on the companion class,
    * so generated Java code can call `graft.functions.PyTitle.title(...)`).
    */
  def title(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = new java.lang.StringBuilder(str.length)
    var prevLetter = false
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (Character.isLetter(c)) {
        out.append(if (prevLetter) Character.toLowerCase(c) else Character.toUpperCase(c))
        prevLetter = true
      } else {
        out.append(c)
        prevLetter = false
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  /** Column wrapper over the native expression. */
  def pyTitle(c: Column): Column =
    Bridge.column(PyTitleCase(Bridge.expression(c)))

  /** DuckDB-SQL equivalent for the correctness oracle: per-character lambda
    * that uppercases a char when the preceding char is not a letter. The
    * argument must be a SIMPLE column reference (it is repeated inside the
    * lambda); oracle SQL stages complex inputs through CTE aliases first.
    */
  def sqlPyTitle(col: String): String =
    s"""CASE WHEN $col IS NULL THEN NULL ELSE COALESCE(list_aggregate(
       |  list_transform(split($col, ''), (c, i) -> CASE
       |    WHEN i = 1 OR NOT regexp_matches($col[i-1:i-1], '[A-Za-z]')
       |    THEN upper(c) ELSE lower(c) END),
       |  'string_agg', ''), '') END""".stripMargin.replaceAll("\n", " ")
}

/** `py_title(string) -> string` — see [[PyTitle]]. Null-safe, codegen'd. */
case class PyTitleCase(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"py_title requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "py_title"

  override protected def nullSafeEval(input: Any): Any =
    PyTitle.title(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PyTitle.title($c)")

  override protected def withNewChildInternal(newChild: Expression): PyTitleCase =
    copy(child = newChild)
}
