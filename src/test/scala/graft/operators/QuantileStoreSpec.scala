package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The quantile-histogram store's contract: hand-computed interpolation on
  * a known tiny histogram (the formula itself, not just engine agreement),
  * incremental appends ≡ one-shot build exactly (additive merge), and the
  * store view staying bucket-sized (the 100 TB point: the serve reads
  * |keys|·|buckets| rows, never the event log). The cross-engine replay of
  * the identical arithmetic is hash-pinned by e27's DuckDB oracle.
  */
class QuantileStoreSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("graft-qstore-spec")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def serveMap(path: String): Map[(String, Int), (Long, Double)] =
    QuantileStore.serve(spark, path, Seq(25, 50, 75, 90)).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap

  test("interpolated percentiles match the hand-computed rank formula") {
    // key a: values 1.00, 2.00, 3.00, 4.00 → n=4; position q(n−1)/100:
    //   p25 → 0.75  → 1.00 + 0.75·1.00 = 1.75
    //   p50 → 1.50  → 2.50
    //   p90 → 2.70  → 3.70
    // key b: single value → every percentile is it.
    val df = Seq(
      ("a", 1.00), ("a", 2.00), ("a", 3.00), ("a", 4.00), ("b", 5.00)
    ).toDF("k", "value")
    val p = tmp()
    QuantileStore.write(df, "k", "value", p)
    val got = serveMap(p)
    assert(got(("a", 25)) == ((4L, 1.75)))
    assert(got(("a", 50)) == ((4L, 2.50)))
    assert(got(("a", 75)) == ((4L, 3.25)))
    assert(got(("a", 90)) == ((4L, 3.70)))
    assert(got(("b", 25)) == ((1L, 5.00)))
    assert(got(("b", 90)) == ((1L, 5.00)))
  }

  test("three appends serve exactly what a one-shot build serves") {
    val df = (1 to 500).map(i => (s"t${i % 3}", (i % 97) * 0.37)).toDF("k", "value")
    val inc = tmp()
    QuantileStore.write(df.filter($"value" < 10), "k", "value", inc)
    QuantileStore.append(df.filter($"value" >= 10 && $"value" < 20), "k", "value", inc)
    QuantileStore.append(df.filter($"value" >= 20), "k", "value", inc)
    val full = tmp()
    QuantileStore.write(df, "k", "value", full)
    assert(serveMap(inc) == serveMap(full),
      "additive histogram merge must make incremental ≡ from-scratch")
  }

  test("seeded property: quantilesOf matches a naive sort-based reference on random data") {
    val rnd = new java.util.Random(421L)
    for (round <- 1 to 8) {
      val n = 1 + rnd.nextInt(400)
      val vals = Seq.fill(n)((rnd.nextGaussian() * 50 + rnd.nextInt(3) * 100) match {
        case v => math.rint(v * 100) / 100.0 // arbitrary doubles are fine too; keep a mix
      }) ++ Seq.fill(rnd.nextInt(5))(rnd.nextDouble() * 1e-3 - 5e-4)
      val df = vals.map(("k", _)).toDF("k", "value")
      val p = tmp()
      QuantileStore.write(df, "k", "value", p)
      val got = QuantileStore.serve(spark, p, Seq(10, 25, 50, 75, 90, 100))
        .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
      // naive reference over the SAME quantization: sort cents, integer
      // rank split, interpolate
      val cents = vals.map(v => math.floor(v * 100).toLong).sorted
      val m = cents.length
      for (pct <- Seq(10, 25, 50, 75, 90, 100)) {
        val pos = pct.toLong * (m - 1)
        val rlo = (pos / 100).toInt
        val rhi = math.min(rlo + 1, m - 1)
        val frac = (pos % 100).toDouble / 100.0
        val want = (cents(rlo).toDouble + frac * (cents(rhi) - cents(rlo)).toDouble) / 100.0
        assert(got(pct) == want,
          s"round $round pct $pct: got ${got(pct)}, naive $want (n=$m)")
      }
    }
  }

  test("the store view is bucket-sized, not event-sized") {
    val df = (1 to 2000).map(i => ("k", (i % 50) * 0.5)).toDF("k", "value")
    val p = tmp()
    QuantileStore.write(df, "k", "value", p)
    val viewRows = CountStore.read(spark, p).count()
    assert(viewRows == 50,
      s"2000 events over 50 distinct cent-buckets must serve from 50 rows, got $viewRows")
  }
}
