package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Fused IVF cell assignment: the argmax-cosine cell over the whole
  * centroid set in ONE codegen'd pass.
  *
  * The composable formulation in `Similarity.ivfAssign` — per cell a
  * `vec_dot(embedding, typedlit(centroid)) / (norm(embedding) * cNorm)`
  * struct and an `array_max` over all C of them — inlines C dim-element
  * literals into the expression tree. At the test default (32 cells) that
  * is tolerable; at a realistic coarse-quantizer size for a 100 TB corpus
  * (C ~ √N, thousands of cells) the generated method crosses janino's
  * 64 KB limit and the WHOLE corpus-scan assignment drops to interpreted
  * eval — the same pathology [[LshFns.lshCodes]] cured for LSH bucketing.
  * This expression holds the centroid matrix as flat reference objects
  * and streams the argmax in a tight primitive loop.
  *
  * Bit parity with the tree formulation (spec-pinned, incl. C large
  * enough that the tree form falls back to interpreted eval):
  *   - products and norms accumulate STRICTLY left-to-right in double,
  *     exactly like [[VecMath.dot]] / `sqrt(vec_dot(e, e))`;
  *   - per-cell centroid norms replicate the driver-side
  *     `sqrt(foldLeft(0.0)(acc + x²))` fold;
  *   - the winner replicates `array_max` over (score, -cell) structs:
  *     Spark's double order puts NaN above every value (so a NaN score
  *     wins) and equal scores fall to the larger -cell, i.e. the SMALLEST
  *     cell — iterating cells in ascending order and keeping the first
  *     strict winner reproduces both rules;
  *   - degenerate inputs (null array, null element, length ≠ dim) made
  *     every score null, and `array_max` then picks the largest -cell —
  *     the smallest cell id. Never null.
  */
object IvfFns {

  /** Static worker shared by interpreted eval and generated code. */
  def argmax(emb: ArrayData, isDouble: Boolean, cellIds: Array[Long],
             mat: Array[Double], norms: Array[Double], dim: Int): Long = {
    val c = cellIds.length
    if (emb == null || emb.numElements() != dim) return cellIds(0)
    val e = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      if (emb.isNullAt(d)) return cellIds(0)
      e(d) = if (isDouble) emb.getDouble(d) else emb.getFloat(d).toDouble
      d += 1
    }
    var nAcc = 0.0
    d = 0
    while (d < dim) { nAcc += e(d) * e(d); d += 1 }
    val embNorm = java.lang.Math.sqrt(nAcc)
    var bestIdx = 0
    var bestScore = Double.NaN
    var first = true
    var i = 0
    while (i < c) {
      val off = i * dim
      var acc = 0.0
      var j = 0
      while (j < dim) { acc += e(j) * mat(off + j); j += 1 }
      val score = acc / (embNorm * norms(i))
      // Spark double order: NaN above everything, NaN == NaN; ties keep
      // the earlier (smaller) cell, so only a STRICT win replaces
      val wins =
        if (first) true
        else if (java.lang.Double.isNaN(score)) !java.lang.Double.isNaN(bestScore)
        else if (java.lang.Double.isNaN(bestScore)) false
        else score > bestScore
      if (wins) { bestIdx = i; bestScore = score; first = false }
      i += 1
    }
    cellIds(bestIdx)
  }

  def ivfArgmax(embedding: Column, cents: Seq[(Long, Seq[Float])]): Column =
    Bridge.column(IvfArgmax(Bridge.expression(embedding), cents))
}

/** `ivf_argmax(array<float|double>) -> long` — see [[IvfFns]]. `cents`
  * must be sorted by ascending cell id (as `ivfAssign` collects them); a
  * Seq field keeps expression equality structural for Catalyst CSE.
  */
case class IvfArgmax(child: Expression, cents: Seq[(Long, Seq[Float])])
    extends UnaryExpression {

  private def isDoubleArr: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
        if cents.nonEmpty && cents.forall(_._2.length == cents.head._2.length) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_argmax requires an array<float|double> argument and a non-empty " +
        s"equal-length centroid set; got ${other.catalogString}, |cents|=${cents.length}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "ivf_argmax"

  @transient private lazy val dim: Int = cents.head._2.length
  @transient private lazy val cellIds: Array[Long] = cents.map(_._1).toArray
  @transient private lazy val mat: Array[Double] = {
    val out = new Array[Double](cents.length * dim)
    var i = 0
    cents.foreach { case (_, ce) =>
      var d = 0
      while (d < dim) { out(i * dim + d) = ce(d).toDouble; d += 1 }
      i += 1
    }
    out
  }
  // replicate ivfAssign's driver-side fold bit-for-bit
  @transient private lazy val norms: Array[Double] =
    cents.map { case (_, ce) =>
      java.lang.Math.sqrt(ce.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
    }.toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    IvfFns.argmax(v.asInstanceOf[ArrayData], isDoubleArr, cellIds, mat, norms, dim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("ivfCells", cellIds, "long[]")
    val matRef = ctx.addReferenceObj("ivfMat", mat, "double[]")
    val normsRef = ctx.addReferenceObj("ivfNorms", norms, "double[]")
    val c = child.genCode(ctx)
    val childVal = ctx.freshName("ivfEmb")
    val block =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData $childVal =
          ${c.isNull} ? null : ${c.value};
        long ${ev.value} = graft.functions.IvfFns.argmax(
          $childVal, $isDoubleArr, $cellsRef, $matRef, $normsRef, $dim);
      """
    ev.copy(code = block, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): IvfArgmax =
    copy(child = newChild)
}
