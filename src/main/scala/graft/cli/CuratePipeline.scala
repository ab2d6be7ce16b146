package graft.cli

import graft.GraftSession
import graft.llm.Curation

/** Training-corpus curation entry point:
  *
  *   runMain graft.cli.CuratePipeline --input <documents.parquet>
  *     --output <dir> [--min-quality 0.53] [--lang en] [--threshold 0.8]
  *     [--benchmark <parquet>] [--split true]
  *
  * Reads a documents table, applies the curation composition (near-dup
  * removal + quality floor + language filter — see [[graft.llm.Curation]]),
  * writes the curated corpus as parquet, and prints one JSON stats line.
  * With `--benchmark`, contaminated docs (shingle overlap with the
  * benchmark set) are dropped first; with `--split true`, the output
  * carries the deterministic train/val/test label and is partitioned by it
  * (one subdirectory per split — the layout a trainer consumes).
  */
object CuratePipeline {

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

    val spark = GraftSession.getOrCreate()
    try {
      val docs = spark.read.parquet(input)
      val nIn = docs.count()
      val decontaminated = benchmark match {
        case Some(b) => graft.llm.Dedup.decontaminate(docs, spark.read.parquet(b))
        case None => docs
      }
      val curated = Curation.curate(decontaminated, minQuality, lang, threshold)
        .transform(df => if (split) graft.llm.Sampling.trainValTestSplit(df, "doc_id") else df)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nOut = curated.count()
      val writer = curated.write.mode("overwrite")
      (if (split) writer.partitionBy("split") else writer).parquet(output)
      println(
        s"""{"input_docs":$nIn,"curated_docs":$nOut,"dropped":${nIn - nOut},""" +
          s""""min_quality":$minQuality,"lang":"${lang.getOrElse("any")}",""" +
          s""""threshold":$threshold,"decontaminated":${benchmark.isDefined},"split":$split}""")
    } finally spark.stop()
  }
}
