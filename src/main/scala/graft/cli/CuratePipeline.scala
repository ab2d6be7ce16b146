package graft.cli

import graft.GraftSession
import graft.llm.Curation

/** Training-corpus curation entry point:
  *
  *   runMain graft.cli.CuratePipeline --input <documents.parquet>
  *     --output <dir> [--min-quality 0.53] [--lang en] [--threshold 0.8]
  *     [--benchmark <parquet>] [--split true] [--source-cap <tokens>]
  *     [--epochs src0=2.5,src1=0.5] [--default-epochs 1.0] [--order true]
  *
  * Reads a documents table, applies the curation composition (near-dup
  * removal + quality floor + language filter — see [[graft.llm.Curation]]),
  * writes the curated corpus as parquet, and prints one JSON stats line.
  * With `--benchmark`, contaminated docs (shingle overlap with the
  * benchmark set) are dropped first; with `--split true`, the output
  * carries the deterministic train/val/test label and is partitioned by it
  * (one subdirectory per split — the layout a trainer consumes).
  *
  * Mixture stages (each deterministic, each optional, applied in recipe
  * order): `--source-cap` thins sources over a whitespace-token budget
  * ([[graft.llm.Sampling.sourceCapSample]]); `--epochs` materializes
  * per-source epoch factors as document copies with a `copy_idx` column
  * ([[graft.llm.Sampling.epochUpsample]] — copies inherit their document's
  * split, so repetition can never leak a test doc into train); `--order
  * true` appends the dense salted-hash training `position`
  * ([[graft.llm.Sampling.trainingOrder]] over (doc_id, copy_idx)).
  */
object CuratePipeline {

  /** The full curation recipe as one testable composition (main parses
    * flags, calls this, writes, prints stats). Stage order is the recipe
    * order: decontaminate → curate → source-cap → split → epoch-upsample →
    * training-order.
    */
  def recipe(docs: org.apache.spark.sql.DataFrame,
             minQuality: Double, lang: Option[String], threshold: Double,
             benchmark: Option[org.apache.spark.sql.DataFrame] = None,
             split: Boolean = false, sourceCap: Option[Long] = None,
             epochs: Map[String, Double] = Map.empty,
             defaultEpochs: Double = 1.0,
             order: Boolean = false): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.lit
    val decontaminated = benchmark match {
      case Some(b) => graft.llm.Dedup.decontaminate(docs, b)
      case None => docs
    }
    Curation.curate(decontaminated, minQuality, lang, threshold)
      .transform(df =>
        // the curation projection drops source; the mixture stages key on
        // it, so re-attach the input's source by doc_id when they're active
        if ((sourceCap.isDefined || epochs.nonEmpty || defaultEpochs != 1.0)
            && !df.columns.contains("source"))
          df.join(docs.select("doc_id", "source"), Seq("doc_id"))
        else df)
      .transform(df => sourceCap match {
        case Some(cap) => df.join(
          graft.llm.Sampling.sourceCapSample(df, cap).select("doc_id"),
          Seq("doc_id"), "left_semi")
        case None => df
      })
      .transform(df => if (split) graft.llm.Sampling.trainValTestSplit(df, "doc_id") else df)
      .transform(df =>
        if (epochs.nonEmpty || defaultEpochs != 1.0)
          df.join(
            graft.llm.Sampling.epochUpsample(df, epochs, defaultEpochs)
              .select("doc_id", "copy_idx"),
            Seq("doc_id"))
        else df.withColumn("copy_idx", lit(1L)))
      .transform(df =>
        if (order)
          df.join(
            graft.llm.Sampling.trainingOrder(df, idCols = Seq("doc_id", "copy_idx"))
              .select("doc_id", "copy_idx", "position"),
            Seq("doc_id", "copy_idx"))
        else df)
  }

  def main(argv: Array[String]): Unit = {
    val opts = argv.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val input = opts.getOrElse("--input",
      sys.error("--input <documents parquet> is required"))
    val output = opts.getOrElse("--output", sys.error("--output <dir> is required"))
    val minQuality = opts.getOrElse("--min-quality", "0.53").toDouble
    val lang = opts.get("--lang").orElse(Some("en")).filter(_ != "any")
    val threshold = opts.getOrElse("--threshold", "0.8").toDouble
    val benchmark = opts.get("--benchmark")
    val split = opts.get("--split").exists(_.toBoolean)
    val sourceCap = opts.get("--source-cap").map(_.toLong)
    val epochs: Map[String, Double] = opts.get("--epochs").map(
      _.split(",").map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> v.toDouble
      }.toMap).getOrElse(Map.empty)
    val defaultEpochs = opts.getOrElse("--default-epochs", "1.0").toDouble
    val order = opts.get("--order").exists(_.toBoolean)

    val spark = GraftSession.getOrCreate()
    try {
      val docs = spark.read.parquet(input)
      val nIn = docs.count()
      val curated = recipe(docs, minQuality, lang, threshold,
        benchmark.map(spark.read.parquet(_)), split, sourceCap,
        epochs, defaultEpochs, order)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nOut = curated.count()
      val nDocsOut = curated.select("doc_id").distinct().count()
      val writer = curated.write.mode("overwrite")
      (if (split) writer.partitionBy("split") else writer).parquet(output)
      println(
        s"""{"input_docs":$nIn,"curated_docs":$nDocsOut,"output_rows":$nOut,""" +
          s""""dropped":${nIn - nDocsOut},""" +
          s""""min_quality":$minQuality,"lang":"${lang.getOrElse("any")}",""" +
          s""""threshold":$threshold,"decontaminated":${benchmark.isDefined},""" +
          s""""source_cap":${sourceCap.getOrElse(-1L)},"epochs":${epochs.size},""" +
          s""""ordered":$order,"split":$split}""")
    } finally spark.stop()
  }
}
