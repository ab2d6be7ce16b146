package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior tests for the round-7 scale work: the ANN final ranking routed
  * through the salted TopKPerGroup operator (VERDICT r6 #4) — identical
  * rankings under a forced high-fanout plan, and the forced plan actually
  * salts (no single-task-per-query window).
  */
class Round7OpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def scoredCandidates() = {
    val q = embs.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = embs.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("q_emb"), col("c_emb")).as("cos"))
  }

  test("rankTopK: forced salted two-phase ranking is row-identical to the collapsed form") {
    val scored = scoredCandidates()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val collapsed = rows(Similarity.rankTopK(scored, "cos", 10))
    val salted = rows(Similarity.rankTopK(scored, "cos", 10, targetPartitionRows = 1L))
    assert(collapsed.nonEmpty)
    assert(salted == collapsed, "salted ranking diverged from the single-window ranking")
  }

  test("rankTopK: the forced plan salts the per-query window (no query-cardinality task funnel)") {
    val forced = Similarity.rankTopK(scoredCandidates(), "cos", 10, targetPartitionRows = 1L)
    val windowPartitionWidths = forced.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.length
    }
    // phase 1 partitions by (query_id, salt); phase 2's window sees only
    // the <= queries x fanout x k survivors
    assert(windowPartitionWidths.contains(2),
      s"no salted window in forced plan (partition widths: $windowPartitionWidths)")
  }

  // ------------------------------------------------ skew-join gate def (r6 #7)

  test("t15's plan shows the salted scatter: big side exchanges on (grp_id, __salt)") {
    val df = graft.SparkEntry.defs.find(_.name == "t15_skew_salted_join").get
      .run(spark, "/root/testdata/sf0.001")
    // the join must key on (grp_id, __salt) — the hot key spread over the
    // salt sub-keys — and the executed plan's exchange must scatter on both
    val sparkPlan = df.queryExecution.sparkPlan.toString
    assert(sparkPlan.linesIterator.exists(l =>
      l.contains("ShuffledHashJoin") && l.contains("grp_id") && l.contains("__salt")),
      s"join not keyed on (grp_id, __salt):\n$sparkPlan")
    val executed = df.queryExecution.executedPlan.toString
    val exchangeLines = executed.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchangeLines.exists(l => l.contains("grp_id") && l.contains("__salt")),
      s"no (grp_id, __salt) exchange — the salted scatter is missing:\n$executed")
    assert(df.count() == 5, "one row per dim group")
  }

  test("SkewJoin: saltCols restricts the hash inputs; MapType salt columns are rejected eagerly") {
    val big = spark.range(100).select((col("id") % 3).as("k"), col("id").as("p"),
      map(lit("a"), col("id")).as("m"))
    val small = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("k", "v")
    // default salts over ALL columns → MapType must be rejected with a clear error
    val err = intercept[IllegalArgumentException] {
      graft.operators.SkewJoin.salted(big, small, "k")
    }
    assert(err.getMessage.contains("MapType") && err.getMessage.contains("m"))
    // nested maps (array<map>, struct fields) are caught too (ADVICE r7)
    val nested = spark.range(10).select((col("id") % 3).as("k"),
      array(map(lit("a"), col("id"))).as("am"))
    val errNested = intercept[IllegalArgumentException] {
      graft.operators.SkewJoin.salted(nested, small, "k")
    }
    assert(errNested.getMessage.contains("am"))
    // naming hashable salt columns works and preserves the join result
    val salted = graft.operators.SkewJoin.salted(big, small, "k", saltCols = Seq("k", "p"))
      .select("k", "p", "v")
    val plain = big.drop("m").join(small, "k").select("k", "p", "v")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  // ------------------------------------------------- real image decode (r6 #6)

  /** Deterministic synthetic PNG fixture: pixels from a pure (x, y) function,
    * JDK-encoded — hermetic, no external image files.
    */
  private def pngAsset(id: Long, w: Int, h: Int)(rgb: (Int, Int) => Int): Asset = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val b = out.toByteArray
    Asset(id, "image/png", b.length, b)
  }

  test("image decode is real: dimensions and per-channel means read from PNG pixels") {
    val solid = pngAsset(1L, 40, 20)((_, _) => (10 << 16) | (200 << 8) | 30)
    val f = Multimodal.extractFeatures(Seq(solid).toDS()).collect().head
    assert(f.width == 40 && f.height == 20, "decoded dimensions travel as metadata")
    assert(f.features.length == 19, s"image features are [r,g,b]/255 ++ hist16: ${f.features.length}")
    assert(f.features(0) == 10.0 / 255 && f.features(1) == 200.0 / 255 && f.features(2) == 30.0 / 255,
      s"decoded channel means: ${f.features.take(3).mkString(",")}")
    assert(f.features.forall(v => v >= 0.0 && v <= 1.0), "every feature component in [0,1]")
    assert(math.abs(f.features.drop(3).sum - 1.0) < 1e-9, "luminance histogram normalized")
  }

  test("image resize is a real bilinear downscale: w/f x h/f PNG, color preserved") {
    val solid = pngAsset(2L, 64, 32)((_, _) => (100 << 16) | (150 << 8) | 200)
    val resized = Multimodal.resize(Seq(solid).toDS(), factor = 4).collect().head
    assert(resized.mime == "image/png" && resized.n_bytes == resized.payload.length)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized.payload))
    assert(img.getWidth == 16 && img.getHeight == 8,
      s"got ${img.getWidth}x${img.getHeight}")
    val p = img.getRGB(8, 4)
    assert(((p >> 16) & 0xFF) == 100 && ((p >> 8) & 0xFF) == 150 && (p & 0xFF) == 200,
      f"interior pixel drifted: 0x$p%06x")
  }

  test("corrupt image payloads degrade to the opaque-byte path instead of failing the task") {
    val junk = Asset(3L, "image/png", 4, Array[Byte](1, 2, 3, 4))
    val f = Multimodal.extractFeatures(Seq(junk).toDS()).collect().head
    assert(f.features.length == 16, "byte-histogram fallback for undecodable bytes")
    assert(f.width == 0 && f.height == 0, "no decoded dimensions for undecodable bytes")
    val r = Multimodal.resize(Seq(junk).toDS(), factor = 2).collect().head
    assert(r.n_bytes == 2, "block-average fallback for undecodable bytes")
  }

  test("bruteForceTopK output is unchanged by the TopKPerGroup routing (vs direct window SQL shape)") {
    // the s01 oracle covers cross-engine exactness; this guards the Spark
    // side against ranking drift at any fanout the stats estimator picks
    val topk = Similarity.bruteForceTopK(embs, col("vec_id") % 100 === 0, 10)
    val perQuery = topk.groupBy("query_id").agg(count("*").as("n"), max("rank").as("mx"))
      .collect()
    assert(perQuery.nonEmpty)
    perQuery.foreach { r =>
      assert(r.getLong(1) == 10L && r.getInt(2) == 10, s"bad rank set for ${r.getLong(0)}")
    }
  }
}
