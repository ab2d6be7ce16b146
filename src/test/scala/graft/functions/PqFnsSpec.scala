package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Determinism and correctness of the fused PQ kernels: [[PqFns.pqEncode]]
  * against a plain-Scala argmin-L2 reference (same strict left-to-right
  * accumulation, smallest-index ties, degenerate collapse to all-zero
  * codes) and [[PqFns.pqAdc]] against a direct lookup sum with null on
  * every malformed-input class.
  */
class PqFnsSpec extends SparkSpec {

  import spark.implicits._

  private val M = 4
  private val K = 8
  private val Dsub = 4
  private val Dim = M * Dsub

  /** Deterministic codebooks spanning signs/magnitudes. */
  private val books: Seq[Seq[Seq[Float]]] =
    (0 until M).map(s => (0 until K).map(j => (0 until Dsub).map(d =>
      (LshFns.planeComponent(s * 131 + j * 17 + 3, d) * 2.0).toFloat)))

  private def refEncode(v: Seq[Float]): Seq[Int] =
    (0 until M).map { s =>
      var bestJ = 0
      var bestDist = Double.PositiveInfinity
      for (j <- 0 until K) {
        var acc = 0.0
        for (t <- 0 until Dsub) {
          val diff = v(s * Dsub + t).toDouble - books(s)(j)(t).toDouble
          acc += diff * diff
        }
        if (acc < bestDist) { bestJ = j; bestDist = acc }
      }
      bestJ
    }

  private def vecs(n: Int): Seq[(Long, Seq[Float])] =
    (0L until n.toLong).map { id =>
      (id, (0 until Dim).map(d =>
        (LshFns.planeComponent(id.toInt * 37 + 11, d) * 3.0).toFloat))
    }

  test("pq_encode matches the scalar argmin-L2 reference on 300 vectors") {
    val data = vecs(300)
    val out = data.toDF("vec_id", "embedding")
      .select(col("vec_id"), PqFns.pqEncode(col("embedding"), books).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    data.foreach { case (id, v) =>
      assert(out(id) == refEncode(v), s"vec $id")
    }
  }

  test("pq_encode accepts double arrays and agrees with the float path") {
    val data = vecs(50)
    val f = data.toDF("vec_id", "embedding")
      .select(PqFns.pqEncode(col("embedding"), books).as("codes"))
      .collect().map(_.getSeq[Int](0)).toSeq
    val d = data.map { case (id, v) => (id, v.map(_.toDouble)) }
      .toDF("vec_id", "embedding")
      .select(PqFns.pqEncode(col("embedding"), books).as("codes"))
      .collect().map(_.getSeq[Int](0)).toSeq
    assert(f == d)
  }

  test("pq_encode degenerate inputs collapse to all-zero codes") {
    val rows = Seq(
      (1L, null.asInstanceOf[Seq[Float]]),        // null array
      (2L, Seq(1f, 2f)),                          // wrong length
      (3L, Seq.fill(Dim)(0f))                     // legit zero vector (NOT degenerate)
    ).toDF("vec_id", "embedding")
    val out = rows.select(col("vec_id"), PqFns.pqEncode(col("embedding"), books).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(out(1L) == Seq.fill(M)(0))
    assert(out(2L) == Seq.fill(M)(0))
    assert(out(3L) == refEncode(Seq.fill(Dim)(0f)), "zero vector encodes normally")
  }

  test("pq_encode ties break to the smallest codebook index") {
    // duplicate entry 0 as entry 1 in every subspace → distances tie exactly
    val dupBooks = books.map(b => Seq(b(0), b(0)) ++ b.drop(2))
    val v = vecs(20)
    val out = v.toDF("vec_id", "embedding")
      .select(PqFns.pqEncode(col("embedding"), dupBooks).as("codes"))
      .collect().map(_.getSeq[Int](0))
    assert(out.forall(codes => codes.forall(_ != 1)),
      "index 1 duplicates index 0 and must never win the tie")
  }

  test("pq_adc sums lut entries at the coded offsets") {
    val lut = (0 until M * K).map(_.toDouble * 1.5)
    val rows = Seq((1L, Seq(0, 3, 7, 2))).toDF("vec_id", "codes")
      .select(PqFns.pqAdc(col("codes"), typedlit(lut)).as("score"))
      .collect()
    val expected = lut(0 * K + 0) + lut(1 * K + 3) + lut(2 * K + 7) + lut(3 * K + 2)
    assert(rows.head.getDouble(0) == expected)
  }

  test("pq_adc returns null on malformed inputs") {
    val lut = (0 until M * K).map(_.toDouble)
    def score(codes: Seq[Integer], lutSeq: Seq[Double]) =
      Seq(Tuple1(codes)).toDF("codes")
        .select(PqFns.pqAdc(col("codes"), typedlit(lutSeq)).as("s"))
        .collect().head.isNullAt(0)
    assert(score(null, lut), "null codes")
    assert(score(Seq[Integer](0, 1, 2), lut), "|lut| not a multiple of |codes|")
    assert(score(Seq[Integer](0, 1, 2, K), lut), "code out of range")
    assert(score(Seq[Integer](0, 1, null, 2), lut), "null code element")
    assert(score(Seq[Integer](0, 1, 2, 3), Seq.empty[Double]), "empty lut")
    assert(!score(Seq[Integer](0, 1, 2, 3), lut), "well-formed input is non-null")
  }

  test("pq_encode/pq_adc agree between codegen and interpreted eval") {
    val data = vecs(100).toDF("vec_id", "embedding")
    val lut = (0 until M * K).map(i => LshFns.planeComponent(991, i % 64) * 10.0)
    val proj = data.select(col("vec_id"),
      PqFns.pqAdc(PqFns.pqEncode(col("embedding"), books), typedlit(lut)).as("s"))
    val whole = proj.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val interpreted = withConf("spark.sql.codegen.wholeStage", "false") {
      withConf("spark.sql.codegen.factoryMode", "NO_CODEGEN") {
        proj.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      }
    }
    assert(whole == interpreted)
  }
}
