package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (Seq.fill(50)("a") ++ Seq.fill(20)("b") ++
    Seq.fill(5)("c") ++ Seq("d")).toDF("k")

  test("one-sided error: estimates never undercount, exact at ample width") {
    val exact = corpus.groupBy("k").agg(count(lit(1)).as("exact"))
    def errs(width: Int) = CountMin
      .estimate(CountMin.build(corpus, "k", width = width), corpus, "k")
      .join(exact, Seq("k"))
      .select((col("est") - col("exact")).as("over")).as[Long].collect()
    // 4 keys in 1024 cells: no collisions, exact recovery
    assert(errs(1024).forall(_ == 0L))
    // 4 keys in 2 cells: collisions guaranteed, but NEVER an undercount
    val tight = errs(2)
    assert(tight.forall(_ >= 0L))
    assert(tight.exists(_ > 0L), "width 2 must actually collide")
  }

  test("merge is exactly additive: sketch(a ++ b) == merge(sketch(a), sketch(b))") {
    val a = corpus.filter(col("k") =!= "b")
    val b = corpus.filter(col("k") === "b")
    val whole = CountMin.build(corpus, "k").select("j", "bucket", "cnt")
      .orderBy("j", "bucket").as[(Int, Long, Long)].collect().toSeq
    val merged = CountMin.merge(CountMin.build(a, "k"), CountMin.build(b, "k"))
      .select("j", "bucket", "cnt")
      .orderBy("j", "bucket").as[(Int, Long, Long)].collect().toSeq
    assert(whole === merged)
  }

  test("unseen key estimates 0 when its cells are empty") {
    val sk = CountMin.build(Seq("x").toDF("k"), "k", width = 1024)
    val est = CountMin.estimate(sk, Seq("zzz-unseen").toDF("k"), "k")
      .select("est").as[Long].head()
    assert(est === 0L)
  }

  test("build shuffles the cell grid, not the corpus: sketch is cell-bounded") {
    val sk = CountMin.build(corpus, "k", depth = 4, width = 8)
    assert(sk.count() <= 4 * 8)
  }

  test("geometry rides with the sketch: estimate uses the BUILD geometry") {
    // a sketch built at width 8 must be probed at width 8 even though the
    // old parameter-passed default was 1024 — with carried geometry the
    // estimates stay exact-or-over, never under
    val sk = CountMin.build(corpus, "k", depth = 4, width = 8)
    val exact = corpus.groupBy("k").agg(count(lit(1)).as("exact"))
    val overs = CountMin.estimate(sk, corpus, "k").join(exact, Seq("k"))
      .select((col("est") - col("exact")).as("over")).as[Long].collect()
    assert(overs.forall(_ >= 0L))
  }

  test("mixed-geometry merge fails fast at estimate time") {
    val merged = CountMin.merge(
      CountMin.build(corpus, "k", depth = 4, width = 8),
      CountMin.build(corpus, "k", depth = 4, width = 16))
    val ex = intercept[Exception] {
      CountMin.estimate(merged, corpus, "k").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("mixed (depth,width)")), ex.getMessage)
  }
}
