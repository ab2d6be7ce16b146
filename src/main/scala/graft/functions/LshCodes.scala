package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Fused LSH bucket codes: ALL `nTables` sign-hyperplane codes for one
  * embedding in ONE codegen'd pass.
  *
  * The composable formulation — per (table, bit) a `vec_dot(embedding,
  * typedlit(plane))` wrapped in `when(_ >= 0, 1 << i)` and summed — builds
  * `nTables × nBits` separate dot sub-trees each carrying a `dim`-element
  * literal. At the scale defaults (8×8) that is tolerable; at the graded
  * multi-probe point (96×12 = 1152 planes, ~74k literal leaves) Catalyst
  * analysis + codegen of the giant tree dominates the runtime (the s07
  * def spent ~10 s mostly planning). This expression holds the plane
  * family as ONE flat double[] reference object and streams every code in
  * a tight primitive loop.
  *
  * Bit parity with the formulation it replaces (and with the driver-side
  * probe loop in `Similarity.queryProbeBuckets`): the plane family is the
  * same splitmix-style (plane, dim) mix; products accumulate STRICTLY
  * left-to-right in double exactly like [[VecMath.dot]]; and the
  * degenerate cases collapse identically — a null embedding, a null
  * element, or a length ≠ `dim` made every `when(null >= 0)` bit 0, so
  * here they yield the all-zero code array (never null).
  */
object LshFns {

  /** Deterministic pseudo-random hyperplane components (no RNG state — a
    * splitmix-style integer mix keyed by (plane, dim), uniform in
    * [-0.5,0.5]; sign projections only need symmetry, not gaussianity).
    * The single source of truth for the plane family — the corpus bucket
    * expression here and the driver-side multi-probe margin loop both
    * read it, which is what keeps probe codes bit-exact to stored codes.
    */
  def planeComponent(plane: Int, d: Int): Double =
    (planeM(plane, d).toDouble / 1000003.0) - 0.5

  /** The integer residue behind [[planeComponent]]: planeComponent(p,d) =
    * planeM(p,d)/1000003 − 0.5. SQL oracle twins inline THESE integers
    * (≤ 7 digits each) instead of 17-digit double literals and rebuild the
    * component as `CAST(m AS DOUBLE)/1000003.0 - 0.5` — cast, divide and
    * subtract are the same IEEE-754 double ops in DuckDB and the JVM, so
    * the reconstructed plane family is bit-identical to the one the
    * [[LshCodes]] expression projects with (which is what lets an LSH
    * def's bucket-dependent OUTPUT through the hash gate).
    */
  def planeM(plane: Int, d: Int): Long = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    java.lang.Math.floorMod(z, 1000003L)
  }

  /** Flat row-major [(table*nBits + bit) * dim + d] plane family. Cached:
    * the family is deterministic in (nPlanes, dim), shared across all
    * expression instances and the driver-side probe loop.
    */
  private val planeCache = new ConcurrentHashMap[(Int, Int), Array[Double]]()

  def planes(nPlanes: Int, dim: Int): Array[Double] =
    planeCache.computeIfAbsent((nPlanes, dim), { key =>
      val (np, dm) = key
      val out = new Array[Double](np * dm)
      var p = 0
      while (p < np) {
        var d = 0
        while (d < dm) { out(p * dm + d) = planeComponent(p, d); d += 1 }
        p += 1
      }
      out
    })

  /** Static worker shared by interpreted eval and generated code: the
    * `nTables` bucket codes of one embedding. `emb` may be null — the
    * degenerate inputs (null array, null element, length ≠ dim) all
    * produce the all-zero code array, matching the `when(null >= 0)`
    * collapse of the expression-tree formulation.
    */
  def codes(emb: ArrayData, isDouble: Boolean, planes: Array[Double],
            nTables: Int, nBits: Int, dim: Int): ArrayData = {
    val out = new Array[Int](nTables)
    if (emb == null || emb.numElements() != dim) return new GenericArrayData(out)
    val e = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      if (emb.isNullAt(d)) return new GenericArrayData(out)
      e(d) = if (isDouble) emb.getDouble(d) else emb.getFloat(d).toDouble
      d += 1
    }
    var t = 0
    while (t < nTables) {
      var code = 0
      var i = 0
      while (i < nBits) {
        val off = (t * nBits + i) * dim
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += e(j) * planes(off + j); j += 1 }
        if (acc >= 0) code |= 1 << i
        i += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }

  def lshCodes(embedding: Column, nTables: Int, nBits: Int, dim: Int): Column =
    Bridge.column(LshCodes(Bridge.expression(embedding), nTables, nBits, dim))
}

/** `lsh_codes(array<float|double>) -> array<int>` of length `nTables` —
  * see [[LshFns]]. Never null: degenerate inputs code to all zeros, like
  * the formulation this replaces.
  */
case class LshCodes(child: Expression, nTables: Int, nBits: Int, dim: Int)
    extends UnaryExpression {

  private def isDoubleArr: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
        if nTables > 0 && nBits > 0 && nBits < 32 && dim > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_codes requires an array<float|double> argument and " +
        s"0 < nBits < 32, nTables > 0, dim > 0; got ${other.catalogString}, " +
        s"nTables=$nTables, nBits=$nBits, dim=$dim")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_codes"

  @transient private lazy val planeFamily: Array[Double] =
    LshFns.planes(nTables * nBits, dim)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    LshFns.codes(v.asInstanceOf[ArrayData], isDoubleArr, planeFamily,
      nTables, nBits, dim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planeFamily, "double[]")
    val c = child.genCode(ctx)
    val childVal = ctx.freshName("lshEmb")
    val code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData $childVal =
          ${c.isNull} ? null : ${c.value};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.LshFns.codes($childVal, $isDoubleArr, $planesRef,
            $nTables, $nBits, $dim);
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshCodes =
    copy(child = newChild)
}
