package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A multimodal asset row: opaque payload + typed metadata. */
final case class Asset(asset_id: Long, mime: String, n_bytes: Int, payload: Array[Byte])

/** Extracted features for one asset. `width`/`height` are decoded image
  * dimensions (0 when the payload is not a decodable image) — kept as
  * METADATA, not feature components, so the feature vector stays
  * scale-homogeneous (every component in [0, 1]).
  */
final case class AssetFeatures(
    asset_id: Long, mime: String, n_bytes: Int, checksum: String,
    width: Int, height: Int, features: Array[Double])

/** Decoded-audio metadata + signal statistics for one asset; signal fields
  * are zero with `decoded = false` when the payload is not decodable audio.
  */
final case class AudioFeatures(
    asset_id: Long, mime: String, decoded: Boolean, sample_rate: Double,
    channels: Int, n_samples: Long, duration_s: Double,
    rms: Double, peak: Double, zero_cross_rate: Double)

/** Multimodal-column plumbing: image/audio/video are opaque `binary` columns
  * with typed metadata, processed by per-partition batch functions.
  *
  * IMAGE payloads (`image/...` mimes) decode FOR REAL via `javax.imageio`
  * (PNG/JPEG/BMP/GIF readers ship with the JDK — no external native libs),
  * inside the same per-partition batch the stub always used: feature
  * extraction reads pixels (dimensions, per-channel means, a 16-bin
  * luminance histogram) and resize is a true bilinear downscale re-encoded
  * as PNG. AUDIO payloads (`audio/...` mimes) decode FOR REAL via
  * `javax.sound.sampled` (WAV/AIFF/AU integer-PCM readers ship with the
  * JDK): feature extraction reads samples (RMS, peak, zero-crossing rate,
  * magnitude histogram). Payloads neither can decode (compressed codecs,
  * video containers) keep the deterministic byte-histogram / block-average
  * stand-ins — the slot a JNI/javacv decoder would fill, changing no
  * schema or partitioning.
  */
object Multimodal {

  /** Synthesize an asset table from the documents table (text bytes stand in
    * for media payloads; deterministic, so tests and benchmarks are stable).
    */
  /** Exact BINARY dedup — d01's keep-first semantics over OPAQUE asset
    * payloads (the crawl-stage zero for images/audio/video, where no
    * text normalization applies: identical bytes ⇒ identical asset):
    * one narrow map computes the md5 checksum per payload, the groupBy
    * shuffles 16-byte digests — payload bytes NEVER reach an exchange,
    * which at 100 TB of media is the entire point. Returns
    * (rep_id = smallest asset id, checksum, n_copies) per distinct
    * payload.
    */
  def exactBinaryDedup(assets: DataFrame, idCol: String = "asset_id",
                       payloadCol: String = "payload"): DataFrame =
    assets.select(col(idCol), md5(col(payloadCol)).as("checksum"))
      .groupBy("checksum")
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_copies"))
      .select("rep_id", "checksum", "n_copies")

  def syntheticAssets(documents: DataFrame): Dataset[Asset] = {
    import documents.sparkSession.implicits._
    documents.select(
      col("doc_id").as("asset_id"),
      concat(lit("application/x-fake-"), col("lang")).as("mime"),
      length(col("text")).cast("int").as("n_bytes"),
      col("text").cast("binary").as("payload"))
      .as[Asset]
  }

  /** REAL image decode: `javax.imageio.ImageIO.read` over the payload
    * bytes. None when no installed reader recognizes the format (or the
    * bytes are corrupt) — callers fall back to the opaque-byte path, so a
    * poisoned payload degrades instead of failing the task.
    */
  private[llm] def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException | _: RuntimeException => None }

  /** Pixel-level features of a decoded image: (width, height,
    * [mean_r, mean_g, mean_b] / 255 ++ 16-bin normalized luminance
    * histogram) — 19 feature values, ALL in [0, 1], so cosine between two
    * image rows is not dominated by raw pixel-count magnitudes; dimensions
    * travel as metadata fields instead (ADVICE r7). One pass over the
    * raster, deterministic for a given image.
    */
  private[llm] def imageFeatures(
      img: java.awt.image.BufferedImage): (Int, Int, Array[Double]) = {
    val w = img.getWidth
    val h = img.getHeight
    var r = 0.0; var g = 0.0; var b = 0.0
    val lum = new Array[Double](16)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val pr = (p >> 16) & 0xFF; val pg = (p >> 8) & 0xFF; val pb = p & 0xFF
        r += pr; g += pg; b += pb
        lum(((pr * 299 + pg * 587 + pb * 114) / 1000) >> 4) += 1.0
        x += 1
      }
      y += 1
    }
    val n = math.max(1.0, w.toDouble * h)
    (w, h, Array(r / n / 255.0, g / n / 255.0, b / n / 255.0) ++ lum.map(_ / n))
  }

  /** REAL audio decode via `javax.sound.sampled` (WAV/AIFF/AU integer-PCM
    * readers ship with the JDK — no external native libs): payload bytes →
    * (sample rate, channel count, channel-averaged mono samples normalized
    * to [-1, 1]). None when no installed reader recognizes the container or
    * the encoding is not integer PCM — callers fall back to the opaque-byte
    * path, so a poisoned payload degrades instead of failing the task.
    */
  private[llm] def decodeAudio(payload: Array[Byte]): Option[(Float, Int, Array[Double])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val signed =
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned =
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        val bits = fmt.getSampleSizeInBits
        if ((!signed && !unsigned) || bits % 8 != 0 || bits > 32) None
        else {
          val bytes = in.readAllBytes()
          val ch = fmt.getChannels
          val bps = bits / 8
          val frame = ch * bps
          val n = bytes.length / frame
          val mono = new Array[Double](n)
          val big = fmt.isBigEndian
          val full = (1L << (bits - 1)).toDouble
          var i = 0
          while (i < n) {
            var s = 0.0
            var c = 0
            while (c < ch) {
              val off = i * frame + c * bps
              var v = 0L
              var k = 0
              while (k < bps) {
                v |= (bytes(off + (if (big) bps - 1 - k else k)) & 0xFFL) << (8 * k)
                k += 1
              }
              val centered =
                if (signed) { val sh = 64 - bits; (v << sh) >> sh }
                else v - (1L << (bits - 1))
              s += centered / full
              c += 1
            }
            mono(i) = s / ch
            i += 1
          }
          Some((fmt.getSampleRate, ch, mono))
        }
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException | _: RuntimeException => None
    }

  /** Sample-level features of decoded audio, ALL in [0, 1] like the image
    * vector: [rms, peak, zero-crossing rate] ++ 16-bin normalized
    * magnitude histogram — 19 values, one sequential pass (per-row
    * deterministic regardless of partitioning).
    */
  private[llm] def audioVector(samples: Array[Double]): Array[Double] = {
    val n = samples.length
    val hist = new Array[Double](16)
    var sq = 0.0; var peak = 0.0; var zc = 0
    var i = 0
    while (i < n) {
      val v = samples(i)
      val m = math.abs(v)
      sq += v * v
      if (m > peak) peak = m
      hist(math.min(15, (m * 16).toInt)) += 1.0
      if (i > 0 && (v > 0) != (samples(i - 1) > 0)) zc += 1
      i += 1
    }
    val nn = math.max(1, n).toDouble
    Array(math.sqrt(sq / nn), peak, if (n > 1) zc.toDouble / (n - 1) else 0.0) ++
      hist.map(_ / nn)
  }

  /** Opaque-byte stand-in for payloads the JDK cannot decode (compressed
    * audio codecs, video containers): deterministic 16-bin normalized
    * byte-value histogram.
    */
  private[llm] def decodeStub(payload: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    payload.foreach(b => bins((b & 0xFF) >> 4) += 1.0)
    val n = math.max(payload.length, 1).toDouble
    bins.map(_ / n)
  }

  /** Feature extraction: one pass per partition (the shape a vectorized /
    * batched decoder needs — amortized per-partition setup, no per-row
    * driver involvement). `image/...` payloads decode for real (19 pixel
    * features, all in [0, 1]); everything else takes the 16-bin
    * byte-histogram path. Features feed the ANN path WITHIN a modality —
    * the per-modality vector widths differ by design, and `vec_dot`'s
    * length contract returns null for a cross-modality pair rather than a
    * meaningless score (compare images to images, audio to audio).
    */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition decoder setup: ImageIO scans for plugin readers once
      // per JVM; disk caching off keeps decode purely in-memory per batch
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val (w, h, feats) =
          if (a.mime.startsWith("image/"))
            decodeImage(a.payload).map(imageFeatures)
              .getOrElse((0, 0, decodeStub(a.payload)))
          else if (a.mime.startsWith("audio/"))
            decodeAudio(a.payload)
              .map { case (_, _, samples) => (0, 0, audioVector(samples)) }
              .getOrElse((0, 0, decodeStub(a.payload)))
          else (0, 0, decodeStub(a.payload))
        val checksum = java.security.MessageDigest.getInstance("MD5")
          .digest(a.payload).map("%02x".format(_)).mkString
        AssetFeatures(a.asset_id, a.mime, a.n_bytes, checksum, w, h, feats)
      }
    }
  }

  /** 64-bit perceptual DIFFERENCE hash (dHash) of a decoded image: the
    * raster area-averages onto a 9×8 luminance grid, and bit (y·8+x) is
    * set when grid(y)(x) > grid(y)(x+1) — the hash encodes the SIGN of
    * horizontal gradients, so it survives resizing, re-encoding, and
    * uniform brightness shifts (the transforms that defeat byte-level
    * dedup on images) while Hamming distance grows with real content
    * change. Deterministic for a given raster.
    */
  private[llm] def dHash(img: java.awt.image.BufferedImage): Long = {
    val gw = 9; val gh = 8
    val w = img.getWidth; val h = img.getHeight
    val sum = Array.ofDim[Double](gh, gw)
    val cnt = Array.ofDim[Long](gh, gw)
    var y = 0
    while (y < h) {
      val gy = math.min(gh - 1, y * gh / h)
      var x = 0
      while (x < w) {
        val gx = math.min(gw - 1, x * gw / w)
        val p = img.getRGB(x, y)
        val lum = (((p >> 16) & 0xFF) * 299 + ((p >> 8) & 0xFF) * 587 +
          (p & 0xFF) * 114) / 1000.0
        sum(gy)(gx) += lum
        cnt(gy)(gx) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw - 1) {
        val a = if (cnt(gy)(gx) == 0) 0.0 else sum(gy)(gx) / cnt(gy)(gx)
        val b = if (cnt(gy)(gx + 1) == 0) 0.0 else sum(gy)(gx + 1) / cnt(gy)(gx + 1)
        if (a > b) bits |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** A 9×8 grayscale PNG whose [[dHash]] is EXACTLY `bits`: row y's pixel
    * luminances are constructed right-to-left so that
    * lum(x) > lum(x+1) ⇔ bit (y·8+x) — the deterministic fixture the
    * image-dedup gate def and specs build planted corpora from. A uniform
    * `brightness` shift changes every BYTE of the payload (md5 differs)
    * but no gradient sign, so the hash is unchanged — the exact
    * robustness property perceptual dedup exists for.
    */
  private[llm] def imageFromHashBits(bits: Long, brightness: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      val p = new Array[Int](9)
      p(8) = 128 + brightness
      var x = 7
      while (x >= 0) {
        p(x) = p(x + 1) + (if (((bits >>> (y * 8 + x)) & 1L) == 1L) 10 else -10)
        x -= 1
      }
      var i = 0
      while (i < 9) {
        val v = math.max(0, math.min(255, p(i)))
        img.setRGB(i, y, (v << 16) | (v << 8) | v)
        i += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic synthetic IMAGE corpus for the perceptual-dedup gate:
    * each id renders the PNG of its golden-ratio bit mix (unrelated ids
    * sit ~32 Hamming bits apart — no accidental near-dups), every
    * `twinEvery`-th id also emits a brightness-shifted twin (byte-distinct,
    * hash-IDENTICAL) at `id + twinOffset`, and every `2·twinEvery`-th a
    * one-bit-perturbed variant (Hamming 1) at `id + 2·twinOffset`.
    */
  def syntheticImageAssets(ids: Dataset[Long], twinEvery: Int = 25,
                           twinOffset: Long = 1000000L): Dataset[Asset] = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { id =>
        val bits = id * 0x9E3779B97F4A7C15L
        def asset(aid: Long, png: Array[Byte]) =
          Asset(aid, "image/png", png.length, png)
        val base = Seq(asset(id, imageFromHashBits(bits)))
        val bright =
          if (id % twinEvery == 0)
            Seq(asset(id + twinOffset, imageFromHashBits(bits, brightness = 5)))
          else Seq.empty
        val perturbed =
          if (id % (2L * twinEvery) == 0)
            Seq(asset(id + 2 * twinOffset,
              imageFromHashBits(bits ^ (1L << (id % 64).toInt))))
          else Seq.empty
        base ++ bright ++ perturbed
      }
    }
  }

  /** Per-asset perceptual hashes: (asset_id, mime, decoded, phash) —
    * per-partition batched like [[extractFeatures]]; payloads ImageIO
    * cannot decode surface `decoded = false` with a null hash (row-local
    * degradation, a poisoned payload never fails the task).
    */
  def imageHashes(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val ph =
          if (a.mime.startsWith("image/")) decodeImage(a.payload).map(dHash)
          else None
        (a.asset_id, a.mime, ph.isDefined, ph.map(java.lang.Long.valueOf).orNull)
      }
    }.toDF("asset_id", "mime", "decoded", "phash")
  }

  /** Image NEAR-DUP pairs by banded Hamming buckets over the dHash — the
    * SimHash recipe applied to the image tier: the 64-bit hash splits into
    * `maxHamming + 1` bands, so any pair within the Hamming radius shares
    * at least one untouched band (pigeonhole — recall 1.0 by
    * construction); candidates come from the band equi-join and the exact
    * popcount filter removes the rest. Never all-pairs: only hash-banded
    * collisions meet, the same scale posture as the text LSH path.
    * Output: (asset_a, asset_b, hamming) for decoded pairs with
    * hamming ≤ `maxHamming`, each pair once.
    */
  def imageNearDupPairs(assets: Dataset[Asset], maxHamming: Int = 3): DataFrame =
    bandedHammingPairs(
      imageHashes(assets).filter(col("decoded")).select("asset_id", "phash"),
      "phash", maxHamming)

  /** Banded-Hamming near-dup pairs over ANY 64-bit perceptual hash column
    * (the image and audio dedup tiers share this machinery): the hash
    * splits into `maxHamming + 1` bands, so any pair within the Hamming
    * radius shares at least one untouched band (pigeonhole — recall 1.0 by
    * construction); candidates come from the band equi-join and the exact
    * popcount filter removes the rest. Never all-pairs.
    */
  private[llm] def bandedHammingPairs(hashes: DataFrame, hashCol: String,
                                      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32,
      s"maxHamming $maxHamming outside [0, 32)")
    val bands = maxHamming + 1
    val width = 64 / bands
    val banded = hashes.select(
      col("asset_id"), col(hashCol).as("h"),
      explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("band_val",
        // the last band absorbs the 64 mod bands leftover bits; the DSL
        // shiftrightunsigned only takes a literal shift, so the per-row
        // form goes through expr
        when(col("band") === bands - 1,
          expr(s"shiftrightunsigned(h, ${(bands - 1) * width})"))
          .otherwise(expr(s"shiftrightunsigned(h, band * $width)")
            .bitwiseAND(lit((1L << width) - 1))))
    val a = banded.select(col("asset_id").as("asset_a"), col("h").as("h_a"),
      col("band"), col("band_val"))
    val b = banded.select(col("asset_id").as("asset_b"), col("h").as("h_b"),
      col("band"), col("band_val"))
    a.join(b, Seq("band", "band_val"))
      .filter(col("asset_a") < col("asset_b"))
      .select(col("asset_a"), col("asset_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** 64-bit energy-delta sign hash of a decoded audio signal — the audio
    * analogue of [[dHash]]: 65 equal sample blocks, bit i set iff block
    * i+1's mean absolute amplitude strictly exceeds block i's. Invariant
    * to positive gain (uniform scaling preserves every strict comparison)
    * and to lossless re-encode; NOT meant to survive time shifts (that is
    * chromaprint territory, the same contract dHash has with crops).
    * Clips shorter than 65 samples hash over zero-padded empty blocks.
    */
  private[llm] def audioHash(samples: Array[Double]): Long = {
    val B = 65
    val n = samples.length
    val e = new Array[Double](B)
    var b = 0
    while (b < B) {
      val lo = (b.toLong * n / B).toInt
      val hi = ((b + 1).toLong * n / B).toInt
      var s = 0.0
      var i = lo
      while (i < hi) { s += math.abs(samples(i)); i += 1 }
      e(b) = if (hi > lo) s / (hi - lo) else 0.0
      b += 1
    }
    var h = 0L
    var i = 0
    while (i < 64) {
      if (e(i + 1) > e(i)) h |= (1L << i)
      i += 1
    }
    h
  }

  /** Per-asset audio perceptual hashes: (asset_id, mime, decoded, ahash) —
    * real JDK WAV/AIFF/AU decode, row-local degradation like
    * [[imageHashes]].
    */
  def audioHashes(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val ah =
          if (a.mime.startsWith("audio/"))
            decodeAudio(a.payload).map(d => audioHash(d._3))
          else None
        (a.asset_id, a.mime, ah.isDefined, ah.map(java.lang.Long.valueOf).orNull)
      }
    }.toDF("asset_id", "mime", "decoded", "ahash")
  }

  /** Audio NEAR-DUP pairs: [[audioHash]] through the shared banded-Hamming
    * candidate machinery — the audio tier of perceptual dedup, same scale
    * posture as [[imageNearDupPairs]].
    */
  def audioNearDupPairs(assets: Dataset[Asset], maxHamming: Int = 3): DataFrame =
    bandedHammingPairs(
      audioHashes(assets).filter(col("decoded")).select("asset_id", "ahash"),
      "ahash", maxHamming)

  /** Deterministic WAV whose [[audioHash]] equals `bits`: a 65-block
    * alternating-sign wave whose block amplitude steps up for a 1 bit and
    * down for a 0 (±0.004 per step — orders of magnitude above PCM16
    * quantization, and the walk stays inside (0.24, 0.76) so any
    * gain ≤ 1.3 leaves it unclipped). Flipping step i moves blocks i+1..64
    * by the same offset, so exactly delta i changes sign — a one-bit
    * perturbation tool for planted-twin corpora, like
    * [[imageFromHashBits]].
    */
  private[llm] def wavFromHashBits(bits: Long, gain: Double = 1.0,
                                   blockLen: Int = 64): Array[Byte] = {
    require(gain > 0.0 && gain <= 1.3, s"gain $gain outside (0, 1.3]")
    val B = 65
    val amps = new Array[Double](B)
    amps(0) = 0.5
    var i = 0
    while (i < 64) {
      amps(i + 1) = amps(i) + (if (((bits >> i) & 1L) == 1L) 0.004 else -0.004)
      i += 1
    }
    val samples = new Array[Double](B * blockLen)
    var b = 0
    while (b < B) {
      var j = 0
      while (j < blockLen) {
        samples(b * blockLen + j) =
          amps(b) * gain * (if (j % 2 == 0) 1.0 else -1.0)
        j += 1
      }
      b += 1
    }
    encodeWavPcm16(samples, 8000f)
  }

  /** Deterministic planted AUDIO corpus (the [[syntheticImageAssets]]
    * twin): one WAV per id with a pseudorandom hash; every `twinEvery`-th
    * id gets a GAIN-SCALED copy (byte-different, hash-identical — Hamming
    * 0) at `id + twinOffset`, every 2·`twinEvery`-th a one-bit-perturbed
    * variant (Hamming 1) at `id + 2·twinOffset`.
    */
  def syntheticAudioAssets(ids: Dataset[Long], twinEvery: Int = 25,
                           twinOffset: Long = 1000000L): Dataset[Asset] = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      it.flatMap { id =>
        val bits = id * 0x9E3779B97F4A7C15L
        def asset(aid: Long, wav: Array[Byte]) =
          Asset(aid, "audio/wav", wav.length, wav)
        val base = Seq(asset(id, wavFromHashBits(bits)))
        val gained =
          if (id % twinEvery == 0)
            Seq(asset(id + twinOffset, wavFromHashBits(bits, gain = 0.8)))
          else Seq.empty
        val perturbed =
          if (id % (2L * twinEvery) == 0)
            Seq(asset(id + 2 * twinOffset,
              wavFromHashBits(bits ^ (1L << (id % 64).toInt))))
          else Seq.empty
        base ++ gained ++ perturbed
      }
    }
  }

  /** Resize: for `image/...` payloads a REAL bilinear downscale to
    * (w/factor, h/factor), re-encoded as PNG (deterministic: PNG is
    * lossless and the JDK encoder is stable for a given raster). The
    * output NORMALIZES mime and colorspace: every decodable image comes
    * back `image/png`, RGB for opaque sources and ARGB when the source
    * raster carries an alpha channel (PNG supports it — the r7 form
    * composited transparency onto undefined black, lossy beyond the
    * documented downscale, ADVICE r7). For opaque payloads, the
    * block-average byte stand-in (each output byte is the mean of
    * `factor` input bytes) — the audio-resample slot. Per-partition
    * batched like [[extractFeatures]].
    */
  def resize(assets: Dataset[Asset], factor: Int = 4): Dataset[Asset] = {
    require(factor > 0)
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val imgOut: Option[Asset] =
          if (a.mime.startsWith("image/")) decodeImage(a.payload).map { img =>
            val w = math.max(1, img.getWidth / factor)
            val h = math.max(1, img.getHeight / factor)
            val scaled = new java.awt.image.BufferedImage(
              w, h,
              if (img.getColorModel.hasAlpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
              else java.awt.image.BufferedImage.TYPE_INT_RGB)
            val gfx = scaled.createGraphics()
            try {
              gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              gfx.drawImage(img, 0, 0, w, h, null)
            } finally gfx.dispose()
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(scaled, "png", out)
            val bytes = out.toByteArray
            Asset(a.asset_id, "image/png", bytes.length, bytes)
          } else None
        imgOut.getOrElse {
          val out = a.payload.grouped(factor)
            .map(block => (block.map(_ & 0xFF).sum / block.length).toByte)
            .toArray
          Asset(a.asset_id, a.mime, out.length, out)
        }
      }
    }
  }

  /** Audio metadata + signal statistics per asset — the audio analogue of
    * the pixel-feature pass: `audio/...` payloads decode FOR REAL (JDK
    * WAV/AIFF/AU readers), everything else (and undecodable audio) reports
    * zeroed signal fields with `decoded = false` so a poisoned payload
    * degrades row-local. Per-partition batched like [[extractFeatures]].
    */
  def audioFeatures(assets: Dataset[Asset]): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val dec =
          if (a.mime.startsWith("audio/")) decodeAudio(a.payload) else None
        dec match {
          case Some((rate, ch, samples)) =>
            val v = audioVector(samples)
            AudioFeatures(a.asset_id, a.mime, decoded = true, rate.toDouble, ch,
              samples.length.toLong,
              if (rate > 0) samples.length.toDouble / rate else 0.0,
              v(0), v(1), v(2))
          case None =>
            AudioFeatures(a.asset_id, a.mime, decoded = false, 0.0, 0, 0L, 0.0, 0.0, 0.0, 0.0)
        }
      }
    }
  }

  /** Deterministic 16-bit little-endian mono WAV bytes from [-1, 1]
    * samples — the synthetic-payload generator for tests and benchmarks
    * (real container, real JDK encoder, byte-stable for given samples).
    */
  def encodeWavPcm16(samples: Array[Double], sampleRate: Float): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val v = math.max(-1.0, math.min(1.0, samples(i)))
      val s = math.round(v * 32767.0).toInt.toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
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

  // ------------------------------------------------------------------ video

  /** The deterministic fake video container the frame-sampling tier runs
    * on (no video codec ships with the JDK, so — per the multimodal
    * contract — the DECODE is a stand-in while the Spark-side plumbing is
    * real): magic "GVID", big-endian u16 width/height, u8 fps, u32 frame
    * count, then frame-count raster frames of width×height grayscale
    * bytes. A payload that fails ANY structural check (magic, bounds,
    * exact length) decodes to None and degrades row-locally, like the
    * image/audio decoders.
    */
  private[llm] def decodeVideo(payload: Array[Byte])
      : Option[(Int, Int, Int, Array[Array[Byte]])] = {
    try {
      val b = java.nio.ByteBuffer.wrap(payload)
      if (b.remaining() < 13) return None
      val magic = new Array[Byte](4); b.get(magic)
      if (!java.util.Arrays.equals(magic, "GVID".getBytes("US-ASCII"))) return None
      val w = b.getShort & 0xFFFF
      val h = b.getShort & 0xFFFF
      val fps = b.get() & 0xFF
      val n = b.getInt
      if (w <= 0 || h <= 0 || fps <= 0 || n <= 0 || n > 100000) return None
      val frameLen = w * h
      if (b.remaining() != n * frameLen) return None
      val frames = Array.fill(n) { val f = new Array[Byte](frameLen); b.get(f); f }
      Some((w, h, fps, frames))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private[llm] def videoBytes(w: Int, h: Int, fps: Int,
                              frames: Array[Array[Byte]]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(13 + frames.length * w * h)
    out.put("GVID".getBytes("US-ASCII"))
    out.putShort(w.toShort).putShort(h.toShort).put(fps.toByte)
    out.putInt(frames.length)
    frames.foreach(out.put)
    out.array()
  }

  /** Deterministic synthetic video corpus: 8×8 grayscale at 10 fps,
    * 12 + 3·(id mod 5) frames, pixel values a pure integer mix of
    * (id, frame, x, y); every 50th asset is TRUNCATED mid-frame — the
    * corrupt row the sampler must degrade around, not die on.
    */
  def syntheticVideoAssets(ids: Dataset[Long]): Dataset[Asset] = {
    import ids.sparkSession.implicits._
    ids.map { id =>
      val w = 8; val h = 8; val fps = 10
      val n = 12 + (id % 5).toInt * 3
      val frames = Array.tabulate(n) { f =>
        Array.tabulate(w * h) { i =>
          val x = i % w; val y = i / w
          (((id * 31 + f * 131 + x * 17 + y * 7) % 251) & 0xFF).toByte
        }
      }
      val full = videoBytes(w, h, fps, frames)
      val payload = if (id % 50 == 0) full.take(full.length - w * h / 2) else full
      Asset(id, "video/x-gvid", payload.length, payload)
    }
  }

  /** FRAME SAMPLING — the video analogue of chunking: every `everyK`-th
    * frame of each asset decodes to (frame_idx, ts_ms, mean_lum,
    * frame_hash), where ts_ms = idx·1000/fps (integer — exact), mean_lum
    * is the integer pixel sum (exactness over prettiness: the double
    * division is one op at the consumer's discretion), and frame_hash is
    * the 64-bit horizontal-gradient sign hash (the dHash recipe on the
    * raw raster — twin frames match at Hamming 0 and feed the SAME
    * banded-Hamming dedup machinery as images/audio).
    *
    * Scale shape: one mapPartitions pass (the per-partition batch shape a
    * real codec needs — mapPartitions is justified here exactly as for
    * image/audio: binary decode has no Catalyst expression), output rows
    * are sample-sized (|frames|/everyK per asset), corrupt containers
    * yield zero rows row-locally. The sampler never shuffles; ordering
    * and grouping are the consumer's.
    */
  def sampleFrames(assets: Dataset[Asset], everyK: Int = 4): DataFrame = {
    require(everyK >= 1, s"sampleFrames: everyK $everyK must be >= 1")
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      decodeVideo(a.payload) match {
        case None => Iterator.empty
        case Some((w, h, fps, frames)) =>
          frames.iterator.zipWithIndex
            .filter { case (_, idx) => idx % everyK == 0 }
            .map { case (frame, idx) =>
              var lum = 0L
              var hash = 0L
              var bit = 0
              var i = 0
              while (i < frame.length) {
                lum += (frame(i) & 0xFF)
                // horizontal gradient sign, first 64 in-row adjacent pairs
                if (bit < 64 && (i % w) < w - 1) {
                  if ((frame(i) & 0xFF) > (frame(i + 1) & 0xFF))
                    hash |= (1L << bit)
                  bit += 1
                }
                i += 1
              }
              (a.asset_id, idx, idx.toLong * 1000L / fps, w, h, lum, hash)
            }
      }
    }.toDF("asset_id", "frame_idx", "ts_ms", "width", "height", "lum_sum", "frame_hash")
  }
}
