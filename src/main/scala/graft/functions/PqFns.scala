package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization kernels (Jégou et al., PAMI 2011): the 4-bit-per-
  * subspace compression an ANN tier applies when even int8 vectors are too
  * large to scan — m subspace codes of log2(k) bits replace the whole
  * vector (m=8, k=16 ⇒ 4 bytes/vector vs 256 float bytes, 64×).
  *
  * Two fused codegen'd expressions, the [[IvfFns]]/[[LshFns]] treatment
  * applied to PQ (a composable per-(subspace, centroid) expression tree
  * would inline m·k literal sub-arrays and walk interpreted HOFs per row):
  *
  *   - [[PqFns.pqEncode]] `(array<float|double>) -> array<int>`: per
  *     subspace the argmin-L2 codebook entry, all m codes streamed in one
  *     primitive loop over a flat codebook matrix reference object;
  *   - [[PqFns.pqAdc]] `(array<int>, array<double>) -> double`:
  *     asymmetric-distance lookup — Σ_s lut[s·k + code_s] — against a
  *     per-query lookup-table column (or a codebook-constant literal, e.g.
  *     squared reconstruction norms). Parameter-free: k derives from
  *     |lut| / |codes|.
  *
  * Determinism contract (what makes PQ results reproducible across runs,
  * partitionings, and engines): distances/sums accumulate STRICTLY
  * left-to-right in double; L2 ties keep the SMALLEST codebook index;
  * degenerate embeddings (null array, null element, wrong length) encode
  * as all-zero codes — the [[LshFns.lshCodes]] collapse rule, so a corrupt
  * vector lands in a deterministic bucket instead of poisoning the plan
  * with nulls.
  */
object PqFns {

  /** Static encode worker shared by interpreted eval and generated code.
    * `mat` is the flat m×k×dsub codebook matrix: entry (s, j, d) at
    * `s*k*dsub + j*dsub + d`.
    */
  def encode(emb: ArrayData, isDouble: Boolean, mat: Array[Double],
             m: Int, k: Int, dsub: Int): ArrayData = {
    val dim = m * dsub
    val codes = new Array[Int](m)
    if (emb == null || emb.numElements() != dim) return new GenericArrayData(codes)
    val e = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      if (emb.isNullAt(d)) return new GenericArrayData(codes)
      e(d) = if (isDouble) emb.getDouble(d) else emb.getFloat(d).toDouble
      d += 1
    }
    var s = 0
    while (s < m) {
      val eOff = s * dsub
      var bestJ = 0
      var bestDist = Double.PositiveInfinity
      var j = 0
      while (j < k) {
        val cOff = (s * k + j) * dsub
        var acc = 0.0
        var t = 0
        while (t < dsub) {
          val diff = e(eOff + t) - mat(cOff + t)
          acc += diff * diff
          t += 1
        }
        // strict win only: equal distances keep the earlier (smaller) code
        if (acc < bestDist) { bestJ = j; bestDist = acc }
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** Static ADC worker: Σ_s lut[s·k + code_s]; null (boxed) on any
    * malformed input — |lut| not a positive multiple of |codes|, null
    * elements, or a code outside [0, k).
    */
  def adc(codes: ArrayData, lut: ArrayData): java.lang.Double = {
    if (codes == null || lut == null) return null
    val m = codes.numElements()
    val n = lut.numElements()
    if (m == 0 || n == 0 || n % m != 0) return null
    val k = n / m
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      if (c < 0 || c >= k) return null
      val idx = s * k + c
      if (lut.isNullAt(idx)) return null
      acc += lut.getDouble(idx)
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def pqEncode(embedding: Column, books: Seq[Seq[Seq[Float]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(embedding), books))

  def pqAdc(codes: Column, lut: Column): Column =
    Bridge.column(PqAdc(Bridge.expression(codes), Bridge.expression(lut)))
}

/** `pq_encode(array<float|double>) -> array<int>` — see [[PqFns]]. `books`
  * is m subspaces × k centroids × dsub dims (all rectangular); Seq fields
  * keep expression equality structural for Catalyst CSE.
  */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Float]]])
    extends UnaryExpression {

  private def isDoubleArr: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
        if books.nonEmpty && books.head.nonEmpty &&
          books.forall(_.length == books.head.length) &&
          books.forall(_.forall(_.length == books.head.head.length)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires an array<float|double> argument and a rectangular " +
        s"non-empty codebook set; got ${other.catalogString}, m=${books.length}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "pq_encode"

  @transient private lazy val m: Int = books.length
  @transient private lazy val k: Int = books.head.length
  @transient private lazy val dsub: Int = books.head.head.length
  @transient private lazy val mat: Array[Double] = {
    val out = new Array[Double](m * k * dsub)
    var i = 0
    books.foreach(_.foreach(_.foreach { x => out(i) = x.toDouble; i += 1 }))
    out
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    PqFns.encode(v.asInstanceOf[ArrayData], isDoubleArr, mat, m, k, dsub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("pqMat", mat, "double[]")
    val c = child.genCode(ctx)
    val childVal = ctx.freshName("pqEmb")
    val block =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData $childVal =
          ${c.isNull} ? null : ${c.value};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.PqFns.encode($childVal, $isDoubleArr, $matRef, $m, $k, $dsub);
      """
    ev.copy(code = block, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_adc(array<int>, array<double>) -> double` — see [[PqFns]]. Null on
  * null/malformed inputs (a null score ranks last through [[graft.llm
  * .Similarity]]'s rankers, like a zero-vector cosine).
  */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (array<int>, array<double>); got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    val res = PqFns.adc(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (res == null) null else res.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val res = ctx.freshName("pqAdcRes")
    val block =
      code"""
        ${l.code}
        ${r.code}
        java.lang.Double $res = graft.functions.PqFns.adc(
          ${l.isNull} ? null : ${l.value},
          ${r.isNull} ? null : ${r.value});
        boolean ${ev.isNull} = ($res == null);
        double ${ev.value} = ${ev.isNull} ? 0.0 : $res.doubleValue();
      """
    ev.copy(code = block)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
