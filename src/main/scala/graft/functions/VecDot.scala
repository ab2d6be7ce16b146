package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `Array[Float]` columns.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`, the composable
  * formulation) are `CodegenFallback` — every element evaluates through the
  * interpreted expression walker, which dominates the ANN operators' cost
  * (the 64-dim dot product runs per candidate pair in s01-s03/d04 and 64×
  * per vector in LSH bucketing). This expression compiles to one tight
  * primitive loop inside whole-stage codegen.
  *
  * Arithmetic contract (oracle determinism): float elements widen exactly to
  * double, products accumulate STRICTLY left-to-right in double — bit-for-bit
  * the same result as the zip_with/aggregate formulation it replaces and as
  * DuckDB's `list_dot_product`. Null result on null/length-mismatched inputs
  * or any null element (matching the HOF formulation's null poisoning).
  */
object VecMath {

  /** Static worker shared by interpreted eval and generated code. The
    * `aDouble`/`bDouble` flags are compile-time constants in generated code
    * (element types are known statically), so the JIT drops the dead branch.
    */
  def dot(a: ArrayData, aDouble: Boolean, b: ArrayData, bDouble: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val av = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val bv = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      acc += av * bv
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def vecDot(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))
}

/** `vec_dot(array<float|double>, array<float|double>) -> double` — see
  * [[VecMath]]. Each side's element type may be float or double (the LSH
  * hyperplanes are double literals dotted against float embeddings); floats
  * widen exactly to double before multiplying, as the HOF formulation did.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isDoubleArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<float|double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dot(a.asInstanceOf[ArrayData], isDoubleArr(left),
      b.asInstanceOf[ArrayData], isDoubleArr(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecDotRes")
      s"""
         |java.lang.Double $r = graft.functions.VecMath.dot(
         |  $a, ${isDoubleArr(left)}, $b, ${isDoubleArr(right)});
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
