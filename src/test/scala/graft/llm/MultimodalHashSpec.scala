package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The perceptual image-dedup tier's semantics (the m02 def is rows-only —
  * DuckDB cannot decode PNGs, so these specs are its correctness gate):
  * dHash robustness to the transforms that defeat byte dedup, the planted
  * fixture's bit-exactness, banded recall at the Hamming radius, and
  * separation of unrelated content.
  */
class MultimodalHashSpec extends SparkSpec {

  import spark.implicits._

  private def decode(png: Array[Byte]) = Multimodal.decodeImage(png).get

  test("imageFromHashBits round-trips: dHash(image(bits)) == bits") {
    for (bits <- Seq(0L, -1L, 0x9E3779B97F4A7C15L, 42L * 0x9E3779B97F4A7C15L)) {
      assert(Multimodal.dHash(decode(Multimodal.imageFromHashBits(bits))) == bits,
        s"round-trip failed for $bits%016x")
    }
  }

  test("dHash survives brightness shift and pixel-doubling; md5 does not") {
    val bits = 7L * 0x9E3779B97F4A7C15L
    val base = Multimodal.imageFromHashBits(bits)
    val bright = Multimodal.imageFromHashBits(bits, brightness = 5)
    assert(!java.util.Arrays.equals(base, bright), "payload bytes must differ")
    assert(Multimodal.dHash(decode(base)) == Multimodal.dHash(decode(bright)),
      "uniform brightness must not move the hash")
    // block-double every pixel (a 2x upscale): area averages are unchanged
    val img = decode(base)
    val up = new java.awt.image.BufferedImage(
      18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 18) up.setRGB(x, y, img.getRGB(x / 2, y / 2))
    assert(Multimodal.dHash(up) == bits, "2x upscale must not move the hash")
  }

  test("near-dup pairs: planted twins recovered with exact hamming, no strays") {
    val assets = Multimodal.syntheticImageAssets(
      spark.range(0, 200).select(col("id").as("doc_id")).as[Long])
    val pairs = Multimodal.imageNearDupPairs(assets, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // every 25th id: brightness twin at +1e6 (hamming 0); every 50th id
    // additionally a one-bit variant at +2e6 (hamming 1 to base AND twin)
    val expected = (0L until 200L).flatMap { id =>
      val t1 = if (id % 25 == 0) Seq((id, id + 1000000L, 0)) else Seq.empty
      val t2 = if (id % 50 == 0)
        Seq((id, id + 2000000L, 1), (id + 1000000L, id + 2000000L, 1))
      else Seq.empty
      t1 ++ t2
    }.toSet
    assert(pairs == expected,
      s"missing ${expected -- pairs}, strays ${pairs -- expected}")
  }

  test("banded recall holds exactly at the radius: hamming==maxHamming found, +1 not") {
    val bits = 3L * 0x9E3779B97F4A7C15L
    // flip 3 bits in three DIFFERENT bands and 4 bits across all four bands
    val h3 = bits ^ (1L << 2) ^ (1L << 20) ^ (1L << 40)
    val h4 = bits ^ (1L << 2) ^ (1L << 20) ^ (1L << 40) ^ (1L << 60)
    val assets = Seq(
      Asset(1L, "image/png", 0, Multimodal.imageFromHashBits(bits)),
      Asset(2L, "image/png", 0, Multimodal.imageFromHashBits(h3)),
      Asset(3L, "image/png", 0, Multimodal.imageFromHashBits(h4))).toDS()
    val pairs = Multimodal.imageNearDupPairs(assets, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 2L, 3)), "a radius-3 pair must be recovered")
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 3L),
      "a radius-4 pair must be filtered at maxHamming=3")
  }

  test("undecodable and non-image payloads degrade row-locally") {
    val assets = Seq(
      Asset(1L, "image/png", 3, Array[Byte](1, 2, 3)),        // corrupt
      Asset(2L, "text/plain", 5, "hello".getBytes("UTF-8")),  // not an image
      Asset(3L, "image/png", 0, Multimodal.imageFromHashBits(99L))).toDS()
    val h = Multimodal.imageHashes(assets).orderBy("asset_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(h.toSeq == Seq((1L, false), (2L, false), (3L, true)))
    assert(Multimodal.imageNearDupPairs(assets).isEmpty)
  }

  // ------------------------------------------------- audio tier (m03 gate)

  private def decodedSamples(wav: Array[Byte]): Array[Double] =
    Multimodal.decodeAudio(wav).get._3

  test("wavFromHashBits round-trips: audioHash(wav(bits)) == bits") {
    for (bits <- Seq(0L, -1L, 0x9E3779B97F4A7C15L, 42L * 0x9E3779B97F4A7C15L)) {
      assert(Multimodal.audioHash(decodedSamples(Multimodal.wavFromHashBits(bits))) == bits,
        f"round-trip failed for $bits%016x")
    }
  }

  test("audioHash survives gain scaling; md5 does not") {
    val bits = 11L * 0x9E3779B97F4A7C15L
    val base = Multimodal.wavFromHashBits(bits)
    val gained = Multimodal.wavFromHashBits(bits, gain = 0.8)
    assert(!java.util.Arrays.equals(base, gained), "payload bytes must differ")
    assert(Multimodal.audioHash(decodedSamples(gained)) == bits,
      "uniform gain must not move the hash")
  }

  test("one flipped walk step moves exactly one hash bit") {
    val bits = 5L * 0x9E3779B97F4A7C15L
    for (i <- Seq(0, 13, 63)) {
      val h = Multimodal.audioHash(
        decodedSamples(Multimodal.wavFromHashBits(bits ^ (1L << i))))
      assert(java.lang.Long.bitCount(h ^ bits) == 1 && ((h >> i) & 1L) != ((bits >> i) & 1L),
        s"perturbing step $i must flip exactly hash bit $i")
    }
  }

  test("audio near-dup pairs: planted twins recovered with exact hamming, no strays") {
    val assets = Multimodal.syntheticAudioAssets(
      spark.range(0, 200).select(col("id").as("doc_id")).as[Long])
    val pairs = Multimodal.audioNearDupPairs(assets, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = (0L until 200L).flatMap { id =>
      val t1 = if (id % 25 == 0) Seq((id, id + 1000000L, 0)) else Seq.empty
      val t2 = if (id % 50 == 0)
        Seq((id, id + 2000000L, 1), (id + 1000000L, id + 2000000L, 1))
      else Seq.empty
      t1 ++ t2
    }.toSet
    assert(pairs == expected,
      s"missing ${expected -- pairs}, strays ${pairs -- expected}")
  }

  test("undecodable and non-audio payloads degrade row-locally") {
    val assets = Seq(
      Asset(1L, "audio/wav", 3, Array[Byte](1, 2, 3)),        // corrupt
      Asset(2L, "text/plain", 5, "hello".getBytes("UTF-8")),  // not audio
      Asset(3L, "audio/wav", 0, Multimodal.wavFromHashBits(99L))).toDS()
    val h = Multimodal.audioHashes(assets).orderBy("asset_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(h.toSeq == Seq((1L, false), (2L, false), (3L, true)))
    assert(Multimodal.audioNearDupPairs(assets).isEmpty)
  }
}
