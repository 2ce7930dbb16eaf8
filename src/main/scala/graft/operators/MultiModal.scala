package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride through the
  * engine as opaque `binary` columns with typed metadata. The Spark
  * side — schema, partition-preserving batch transforms, feature
  * vectors — is real and tested; the codec itself is a deterministic
  * STUB (this container has no image/audio libraries), clearly
  * marked, with the exact seam a real decoder would plug into.
  */
object MultiModal {

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

  /** Feature row produced by the (stub) decoder. */
  case class MediaFeatures(media_id: Long, media_type: String,
      byte_len: Long, mean_byte: Double, entropy_bucket: Int,
      feature: Array[Double])

  /** STUB DECODER — deterministic fake standing in for
    * image/audio decode + feature extraction. A real implementation
    * would replace `decodeBytes` with (e.g.) JPEG decode + model
    * inference; the mapPartitions plumbing — batch iteration, one
    * codec init per partition, narrow no-shuffle execution — is the
    * part that matters for Spark and is real. */
  private def decodeBytes(bytes: Array[Byte]): Array[Double] = {
    // ??? <- real codec goes here; deterministic 8-bin byte histogram
    // stands in so tests have stable expectations.
    val hist = new Array[Double](8)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 5) += 1.0
      i += 1
    }
    if (bytes.length > 0) { var j = 0; while (j < 8) { hist(j) /= bytes.length; j += 1 } }
    hist
  }

  /** Resized media row (stub): new payload + updated dimensions. */
  case class ResizedMedia(media_id: Long, media_type: String,
      content: Array[Byte], width: Int, height: Int)

  /** STUB RESIZE — a real implementation would decode, scale, and
    * re-encode; the deterministic stand-in keeps every `stride`-th
    * byte. The Spark plumbing is the real part: a narrow per-row
    * transform over the binary column — no shuffle, streams at scan
    * speed, metadata columns updated alongside the payload. */
  def resize(media: DataFrame, stride: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media_type", "content", "width", "height")
      .as[(Long, String, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        // per-partition codec init would happen here
        rows.map { case (id, mt, bytes, w, h) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          val out = new Array[Byte]((b.length + stride - 1) / stride)
          var i = 0
          while (i < out.length) { out(i) = b(i * stride); i += 1 }
          ResizedMedia(id, mt, out, math.max(1, w / stride),
            math.max(1, h / stride))
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
}
