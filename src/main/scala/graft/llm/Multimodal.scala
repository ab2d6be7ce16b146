package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A multimodal asset row: opaque payload + typed metadata. */
final case class Asset(asset_id: Long, mime: String, n_bytes: Int, payload: Array[Byte])

/** Extracted features for one asset. */
final case class AssetFeatures(
    asset_id: Long, mime: String, n_bytes: Int,
    checksum: String, features: Array[Double])

/** Multimodal-column plumbing: image/audio/video are opaque `binary` columns
  * with typed metadata, processed by per-partition batch functions.
  *
  * The actual media DECODE is stubbed (no image/audio libraries in this
  * container): `decodeStub` derives a deterministic 16-bin byte histogram in
  * place of pixel/sample decoding. Everything around it — the schema, the
  * typed Dataset boundary, the per-partition batching, the feature-vector
  * shape feeding [[Similarity]] — is the real production plumbing; swapping
  * `decodeStub` for a JNI/javacv decoder changes no other line.
  */
object Multimodal {

  /** Synthesize an asset table from the documents table (text bytes stand in
    * for media payloads; deterministic, so tests and benchmarks are stable).
    */
  def syntheticAssets(documents: DataFrame): Dataset[Asset] = {
    import documents.sparkSession.implicits._
    documents.select(
      col("doc_id").as("asset_id"),
      concat(lit("application/x-fake-"), col("lang")).as("mime"),
      length(col("text")).cast("int").as("n_bytes"),
      col("text").cast("binary").as("payload"))
      .as[Asset]
  }

  /** STUB decoder — stands in for image decode / audio PCM extraction.
    * Deterministic: 16-bin normalized byte-value histogram.
    */
  private[llm] def decodeStub(payload: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    payload.foreach(b => bins((b & 0xFF) >> 4) += 1.0)
    val n = math.max(payload.length, 1).toDouble
    bins.map(_ / n)
  }

  /** Feature extraction: one pass per partition (the shape a vectorized /
    * batched decoder needs — amortized per-partition setup, no per-row
    * driver involvement). Output features feed the ANN path unchanged.
    */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition decoder setup would go here (codec contexts, buffers)
      it.map { a =>
        val feats = decodeStub(a.payload)
        val checksum = java.security.MessageDigest.getInstance("MD5")
          .digest(a.payload).map("%02x".format(_)).mkString
        AssetFeatures(a.asset_id, a.mime, a.n_bytes, checksum, feats)
      }
    }
  }

  /** Resize stand-in — the image-downscale/audio-resample slot: block-average
    * the payload by `factor` (each output byte is the mean of `factor` input
    * bytes), emitting a proportionally smaller payload with metadata updated
    * to match. Deterministic, per-partition batched like [[extractFeatures]];
    * a real image resize swaps the block-average for the codec call and
    * changes no schema.
    */
  def resize(assets: Dataset[Asset], factor: Int = 4): Dataset[Asset] = {
    require(factor > 0)
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val out = a.payload.grouped(factor)
          .map(block => (block.map(_ & 0xFF).sum / block.length).toByte)
          .toArray
        Asset(a.asset_id, a.mime, out.length, out)
      }
    }
  }

  /** Frame-sampling stand-in: split the payload into fixed-size chunks and
    * fingerprint every k-th chunk — the access pattern of video keyframe
    * sampling, expressed on the opaque payload.
    */
  def sampleChunks(assets: Dataset[Asset], chunkBytes: Int = 64, every: Int = 4): DataFrame = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      a.payload.grouped(chunkBytes).zipWithIndex
        .filter(_._2 % every == 0)
        .map { case (chunk, idx) =>
          (a.asset_id, idx, chunk.length,
            java.util.Arrays.hashCode(chunk))
        }
    }.toDF("asset_id", "chunk_idx", "chunk_len", "chunk_hash")
  }
}
