package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride through the
  * engine as opaque `binary` columns with typed metadata. The Spark
  * side — schema, partition-preserving batch transforms, feature
  * vectors — is real and tested. Two codecs are real too, both pure
  * JDK (no extra dependency): PNG/JPEG decode through
  * `javax.imageio` (features, resize, aHash) and WAV/PCM decode
  * through `javax.sound.sampled` (magnitude-histogram features).
  * Everything else (compressed audio, video — codecs genuinely
  * absent from this container) falls back to a deterministic
  * byte-level stand-in, clearly marked at each seam.
  */
object MultiModal {

  // ImageIO's default stream cache is DISK-backed: every encode or
  // decode creates and deletes a temp file, which at corpus scale
  // turns a per-row CPU pass into per-row filesystem churn (measured
  // 3× on the p56 battery entry). All payloads here ride in-memory
  // byte arrays — keep the streams in memory too. (JVM-global flag,
  // evaluated once per executor JVM at class load.)
  javax.imageio.ImageIO.setUseCache(false)

  /** PNG (\x89PNG) or JPEG (\xFF\xD8) magic — the two formats
    * `javax.imageio` ships decoders for on every JDK. Checked before
    * attempting a decode so arbitrary binary payloads skip straight
    * to the byte-level fallback without paying for a reader probe. */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length > 4 &&
      (((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8))

  private def decodeImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    if (!looksLikeImage(bytes)) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }

  /** RIFF/WAVE magic — the container `javax.sound.sampled` ships a
    * decoder for on every JDK (PCM only; compressed audio codecs are
    * genuinely absent from this container and stay on the byte
    * fallback). */
  private def looksLikeWav(b: Array[Byte]): Boolean =
    b.length > 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Decode a WAV payload to signed 16-bit samples (first channel),
    * or null when the payload isn't decodable PCM. All-integer.
    *
    * The canonical RIFF/PCM16 layout parses on a direct chunk walk —
    * AudioSystem's per-call provider scan is ~half the corpus-side
    * decode cost at 100k payloads/s rates, so the common container
    * spelling takes the hand parser and only non-canonical payloads
    * (float PCM, odd chunk layouts, extensible fmt) fall back to the
    * JDK decoder. Both paths yield bit-identical samples for the
    * layouts both can read. */
  private def decodeWavSamples(bytes: Array[Byte]): Array[Int] =
    if (!looksLikeWav(bytes)) null
    else {
      val fast = decodeCanonicalRiffPcm16(bytes)
      if (fast != null) fast else decodeWavSamplesJdk(bytes)
    }

  /** Direct chunk walk of a RIFF/WAVE container: find `fmt ` (must be
    * plain PCM, 16-bit) and `data`, return first-channel LE samples.
    * Returns null — meaning "use the JDK fallback" — on any layout
    * this parser doesn't cover. */
  private def decodeCanonicalRiffPcm16(b: Array[Byte]): Array[Int] = {
    def u16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int) = (b(o) & 0xff).toLong | ((b(o + 1) & 0xff).toLong << 8) |
      ((b(o + 2) & 0xff).toLong << 16) | ((b(o + 3) & 0xff).toLong << 24)
    var fmtOk = false
    var channels = 0
    var dataOff = -1
    var dataLen = 0L
    var o = 12
    while (o + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
      val id = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = u32(o + 4)
      if (id == "fmt " && len >= 16 && o + 8 + 16 <= b.length) {
        val audioFormat = u16(o + 8)
        channels = u16(o + 10)
        val bits = u16(o + 22)
        fmtOk = audioFormat == 1 && bits == 16 && channels >= 1
        if (!fmtOk) return null // compressed/float/odd → JDK fallback
      } else if (id == "data") {
        dataOff = o + 8
        dataLen = len
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      o += 8 + len.toInt + (len.toInt & 1)
      if (len > Int.MaxValue - 16) return null
    }
    if (!fmtOk || dataOff < 0) return null
    val frame = channels * 2
    val avail = math.min(dataLen, (b.length - dataOff).toLong)
    val n = (avail / frame).toInt
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val p = dataOff + i * frame
      out(i) = (b(p + 1) << 8) | (b(p) & 0xff) // first channel, LE
      i += 1
    }
    out
  }

  private def decodeWavSamplesJdk(bytes: Array[Byte]): Array[Int] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = in.getFormat
        if (fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) null
        else {
          val raw = in.readAllBytes()
          val frame = fmt.getFrameSize // bytes per frame, all channels
          val n = raw.length / frame
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            val o = i * frame
            // first channel, respecting container endianness
            out(i) =
              if (fmt.isBigEndian) (raw(o) << 8) | (raw(o + 1) & 0xff)
              else (raw(o + 1) << 8) | (raw(o) & 0xff)
            i += 1
          }
          out
        }
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }

  /** Canonical media schema: content + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Wrap a text corpus as synthetic media rows (UTF-8 bytes as the
    * opaque payload) — exercises the binary-column path end to end. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      lit("image/stub").as("media_type"),
      encode(col(textCol), "UTF-8").as("content"),
      (pmod(col(idCol), lit(640)) + 32).cast("int").as("width"),
      (pmod(col(idCol), lit(480)) + 32).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))

  /** Feature row: pixel-luminance histogram for real images, byte
    * histogram for other payloads (see [[MultiModal.decodeBytes]]). */
  case class MediaFeatures(media_id: Long, media_type: String,
      byte_len: Long, mean_byte: Double, entropy_bucket: Int,
      feature: Array[Double])

  /** Feature extraction for one payload. PNG/JPEG bytes decode for
    * real (`javax.imageio`) into an 8-bin LUMINANCE histogram over
    * the pixels — deterministic, resolution-independent semantics a
    * downstream near-dup or quality filter can use. Anything else
    * (text-as-bytes fixtures, audio/video this container has no
    * codecs for) falls back to the deterministic 8-bin BYTE histogram
    * so the pipeline shape stays testable end to end. */
  private def decodeBytes(bytes: Array[Byte]): Array[Double] = {
    val img = decodeImage(bytes)
    val hist = new Array[Double](8)
    if (img != null) {
      val w = img.getWidth
      val h = img.getHeight
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          // integer Rec.601 luma, binned to 8 buckets of 32
          val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          hist(luma >> 5) += 1.0
          x += 1
        }
        y += 1
      }
      val n = w.toDouble * h
      var j = 0
      while (j < 8) { hist(j) /= n; j += 1 }
    } else {
      val samples = decodeWavSamples(bytes)
      if (samples != null && samples.length > 0) {
        // real PCM decode: 8-bin histogram of |sample| magnitude
        // (16-bit → buckets of 4096) — the audio twin of the luma
        // histogram, all-integer and sample-rate independent
        var i = 0
        while (i < samples.length) {
          val mag = math.min(math.abs(samples(i)), 32767)
          hist(mag >> 12) += 1.0
          i += 1
        }
        var j = 0
        while (j < 8) { hist(j) /= samples.length; j += 1 }
      } else {
        var i = 0
        while (i < bytes.length) {
          hist((bytes(i) & 0xff) >> 5) += 1.0
          i += 1
        }
        if (bytes.length > 0) {
          var j = 0
          while (j < 8) { hist(j) /= bytes.length; j += 1 }
        }
      }
    }
    hist
  }

  /** Resized media row (stub): new payload + updated dimensions. */
  case class ResizedMedia(media_id: Long, media_type: String,
      content: Array[Byte], width: Int, height: Int)

  /** Downscale by an integer `stride`. PNG/JPEG payloads decode,
    * nearest-neighbor downsample (output pixel (x,y) = input pixel
    * (x·stride, y·stride) — deterministic, no resample kernel
    * ambiguity) and re-encode as PNG, with the metadata dimensions
    * taken from the actual decoded image. Non-image payloads keep the
    * deterministic byte-stride stand-in. The Spark plumbing is shared
    * and real either way: a narrow per-row transform over the binary
    * column — no shuffle, streams at scan speed, metadata columns
    * updated alongside the payload. */
  def resize(media: DataFrame, stride: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media_type", "content", "width", "height")
      .as[(Long, String, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        // per-partition codec init seam (imageio readers are cached
        // per-JVM; a heavier codec would initialize here once)
        rows.map { case (id, mt, bytes, w, h) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          val img = decodeImage(b)
          if (img != null) {
            val ow = math.max(1, img.getWidth / stride)
            val oh = math.max(1, img.getHeight / stride)
            val out = new java.awt.image.BufferedImage(ow, oh,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < oh) {
              var x = 0
              while (x < ow) {
                out.setRGB(x, y, img.getRGB(x * stride, y * stride))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            ResizedMedia(id, "image/png", bos.toByteArray, ow, oh)
          } else {
            val out = new Array[Byte]((b.length + stride - 1) / stride)
            var i = 0
            while (i < out.length) { out(i) = b(i * stride); i += 1 }
            ResizedMedia(id, mt, out, math.max(1, w / stride),
              math.max(1, h / stride))
          }
        }
      }
  }

  /** One sampled frame of a media payload. */
  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB FRAME SAMPLER — treats the payload as `frameSize`-byte
    * frames and emits every `everyN`-th one. Real video decode slots
    * into the same seam (flatMap: one input row → 0..n frame rows,
    * still narrow — the explode happens inside the partition, and
    * downstream per-frame feature extraction parallelizes on the
    * emitted rows). */
  def sampleFrames(media: DataFrame, frameSize: Int,
      everyN: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content")
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        val nFrames = b.length / frameSize
        (0 until nFrames).filter(_ % everyN == 0).map { f =>
          Frame(id, f, java.util.Arrays.copyOfRange(b,
            f * frameSize, (f + 1) * frameSize))
        }
      }
  }

  /** Distributed feature extraction over binary content. One decoder
    * "session" per partition (the expensive-init pattern real codecs
    * need); rows stream through without materializing the partition. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media_type", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init would happen here
        rows.map { case (id, mt, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          val feat = decodeBytes(b)
          val mean =
            if (b.isEmpty) 0.0
            else b.map(x => (x & 0xff).toDouble).sum / b.length
          MediaFeatures(id, mt, b.length.toLong, mean,
            entropy_bucket = (feat.count(_ > 0.125) min 7), feature = feat)
        }
      }
  }

  /** One media row's 64-bit average-hash; None when the payload isn't
    * a decodable PNG/JPEG. */
  case class MediaHash(media_id: Long, ahash: Option[Long])

  /** 64-bit aHash of one image: sample an 8×8 nearest-neighbor grid
    * of Rec.601 integer lumas, bit i set iff grid cell i is strictly
    * brighter than the integer mean. All-integer math — bit-stable
    * across JVMs and platforms (no resample kernel, no float). */
  private def aHashOf(bytes: Array[Byte]): Option[Long] = {
    val img = decodeImage(bytes)
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val g = new Array[Int](64)
      var i = 0
      var sum = 0
      while (i < 64) {
        val x = math.min((i % 8) * w / 8, w - 1)
        val y = math.min((i / 8) * h / 8, h - 1)
        val rgb = img.getRGB(x, y)
        g(i) = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        sum += g(i)
        i += 1
      }
      val mean = sum / 64
      var bits = 0L
      i = 0
      while (i < 64) { if (g(i) > mean) bits |= (1L << i); i += 1 }
      Some(bits)
    }
  }

  /** Perceptual fingerprints for an image corpus: the aHash of every
    * decodable payload (narrow per-row pass over the binary column,
    * streams at scan speed). Undecodable payloads yield a NULL hash
    * so downstream dedup can skip them without dropping the row. */
  def imageAHash(media: DataFrame): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          MediaHash(id,
            aHashOf(if (bytes == null) Array.empty[Byte] else bytes))
        }
      }
  }

  /** Perceptual image near-dup: band each 64-bit aHash into 4×16-bit
    * LSH slices (the [[Dedup.simhashBandCandidates]] machinery, so
    * candidate pairs are bucket-local — |bucket|², never n²), then
    * verify candidates with the exact hamming distance. Catches
    * re-encodes, minor crops and brightness-preserving edits — the
    * image-side twin of text SimHash dedup. Any pair within hamming
    * `maxDist` of each other on the 64-bit hash survives; threshold 6
    * ≈ "same image up to small edits" in the aHash literature. */
  def aHashNearDup(media: DataFrame, maxDist: Int = 6): DataFrame = {
    val fp = imageAHash(media).toDF()
      .filter(col("ahash").isNotNull)
      .select(col("media_id"), col("ahash").as("simhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = Dedup.simhashBandCandidates(fp, "media_id",
      bands = 4, bitsPerBand = 16)
    val a = fp.select(col("media_id").as("a_id"), col("simhash").as("ha"))
    val b = fp.select(col("media_id").as("b_id"), col("simhash").as("hb"))
    cand.join(a, Seq("a_id")).join(b, Seq("b_id"))
      .withColumn("hamming",
        expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** 64-bit energy-delta fingerprint of one WAV payload — the classic
    * acoustic-fingerprint shape (Haitsma-Kalker family reduced to its
    * sign bits): split the samples into 65 equal windows, sum |s| per
    * window (integer energies), bit i set iff energy(i+1) >
    * energy(i). Amplitude-scale SENSITIVE only through ties (the
    * comparison survives any monotone volume change that preserves
    * energy ordering), time-alignment sensitive like every
    * fixed-window fingerprint. All-integer, bit-stable across JVMs. */
  private def energyHashOf(bytes: Array[Byte]): Option[Long] = {
    val s = decodeWavSamples(bytes)
    if (s == null || s.length < 65) None
    else {
      val e = new Array[Long](65)
      var i = 0
      while (i < s.length) {
        // window index via integer math; last partial window folds in.
        // Long multiply: i * 65 overflows Int past ~33M frames (~12
        // minutes at 44.1 kHz mono) and a legitimate long recording
        // would crash the task with a negative index.
        e(math.min((i.toLong * 65 / s.length).toInt, 64)) +=
          math.abs(s(i).toLong)
        i += 1
      }
      var bits = 0L
      i = 0
      while (i < 64) { if (e(i + 1) > e(i)) bits |= (1L << i); i += 1 }
      Some(bits)
    }
  }

  /** Acoustic fingerprints for an audio corpus: energy-delta hash of
    * every decodable WAV payload (narrow per-row pass); NULL for
    * undecodable payloads, mirroring [[imageAHash]]. */
  def audioEnergyHash(media: DataFrame): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          MediaHash(id,
            energyHashOf(if (bytes == null) Array.empty[Byte] else bytes))
        }
      }
  }

  /** splitmix-style integer scramble — deterministic pixel/sample
    * material for the synthetic media corpora below; pure integer
    * math, bit-stable across JVMs and partitionings. */
  private def mix(k: Long, a: Int, b: Int): Int = {
    var h = k * 0x9E3779B97F4A7C15L + a * 0xC2B2AE3D27D4EB4FL +
      b * 0x165667B19E3779F9L
    h ^= (h >>> 31); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 29)
    (h & 0x7fffffffL).toInt
  }

  private def pngOf(k: Long, brightnessShift: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        // gray in [0,191] + shift ≤ 8 — never clips, so a uniform
        // brightness shift moves every 8×8 luma AND the integer mean
        // by exactly the same amount: aHash is invariant by
        // construction (hamming 0 between base and twin)
        val g = mix(k, x, y) % 192 + brightnessShift
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavOf(k: Long, volume: Int): Array[Byte] = {
    // 256 samples in ±4000·volume — doubling stays far from Short
    // overflow, and |2s| = 2|s| exactly, so window-energy ORDER (all
    // the fingerprint reads) is preserved: hamming 0 by construction.
    // The container is written directly in the canonical RIFF/WAVE
    // PCM16 layout (the same bytes AudioSystem.write emits for this
    // format) — the JDK writer's per-call stream/provider overhead
    // was ~40% of the corpus encode cost at 100k payloads.
    val samples = Array.tabulate(256)(t =>
      ((mix(k, t, 17) % 8000 - 4000) * volume).toShort)
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)            // PCM
      .putShort(1)            // mono
      .putInt(8000)           // sample rate
      .putInt(8000 * 2)       // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Deterministic synthetic image corpus derived from an id column —
    * battery plumbing for [[aHashNearDup]] when the corpus has no
    * media column (TESTDATA's tables carry none): each source id k
    * yields TWO real 16×16 PNG payloads, media_id 2k (base) and 2k+1
    * (a uniform-brightness re-encode of the same content), so
    * (2k, 2k+1) are planted perceptual near-dup pairs while distinct
    * k's hash-derived pixels make cross-pairs far in hamming space.
    * Encoding runs executor-side in mapPartitions (JDK-only ImageIO),
    * narrow and deterministic under any partitioning. */
  def syntheticImageCorpus(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    // The id list is 8 bytes/row — spread it across the cluster
    // BEFORE the flatMap so payload encoding parallelizes even when
    // the source arrives as one small file (the exchange carries ids,
    // never images).
    ids.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .flatMap { k =>
        Seq((2 * k, "image/png", pngOf(k, 0)),
          (2 * k + 1, "image/png", pngOf(k, 8)))
      }
      .toDF("media_id", "media_type", "content")
  }

  /** Audio twin of [[syntheticImageCorpus]]: real RIFF/WAV PCM
    * payloads, media_id 2k (base) and 2k+1 (the same recording at 2×
    * volume) — planted [[audioNearDup]] pairs. */
  def syntheticAudioCorpus(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .flatMap { k =>
        Seq((2 * k, "audio/wav", wavOf(k, 1)),
          (2 * k + 1, "audio/wav", wavOf(k, 2)))
      }
      .toDF("media_id", "media_type", "content")
  }

  /** Acoustic near-dup: the audio twin of [[aHashNearDup]] — the same
    * banded-LSH + exact-hamming machinery over the energy-delta
    * fingerprint. Catches re-encodes and volume changes of the same
    * recording; |bucket|² pair space, never n². */
  def audioNearDup(media: DataFrame, maxDist: Int = 6): DataFrame = {
    val fp = audioEnergyHash(media).toDF()
      .filter(col("ahash").isNotNull)
      .select(col("media_id"), col("ahash").as("simhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = Dedup.simhashBandCandidates(fp, "media_id",
      bands = 4, bitsPerBand = 16)
    val a = fp.select(col("media_id").as("a_id"), col("simhash").as("ha"))
    val b = fp.select(col("media_id").as("b_id"), col("simhash").as("hb"))
    cand.join(a, Seq("a_id")).join(b, Seq("b_id"))
      .withColumn("hamming",
        expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }
}
