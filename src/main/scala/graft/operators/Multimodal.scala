package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` payloads plus
  * typed metadata, with decode / feature-extract stages.
  *
  * The real decode step needs image/audio codecs that aren't in this
  * container, so `decodeStub` derives deterministic fake dimensions from
  * the payload hash — clearly marked; swap `decodeStub` for a codec call
  * in production. What IS real and tested here is the Spark-side
  * plumbing a 100 TB media pipeline needs: the schema shape (binary +
  * metadata struct), a typed `mapPartitions` decode boundary (one codec
  * init per partition, not per row — the pattern a JNI/FFI decoder
  * requires), and batch-friendly partitioning.
  */
object Multimodal {

  /** Canonical multimodal record: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("mime_type", StringType, nullable = true),
    StructField("byte_len", LongType, nullable = true),
    StructField("content_hash", StringType, nullable = true)))

  /** Wrap a text corpus as a fake media table (documents stand in for
    * binary payloads; the pipeline shape is identical). */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime_type"),
      octet_length(col(textCol)).cast("long").as("byte_len"),
      md5(col(textCol)).as("content_hash"))

  final case class DecodedMedia(
      media_id: Long, byte_len: Long, content_hash: String,
      width: Int, height: Int, n_frames: Int)

  /** STUB decode (???-equivalent): deterministic fake dimensions derived
    * from the first bytes of the payload hash. Replace the body with a
    * real codec; the mapPartitions boundary (per-partition init, batch
    * iteration) is the production shape. */
  def decodeStub(media: DataFrame)(implicit spark: SparkSession): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select("media_id", "content", "byte_len", "content_hash")
      .as[(Long, Array[Byte], Long, String)]
      .mapPartitions { rows =>
        // Per-partition "codec init" happens here in a real decoder.
        rows.map { case (id, content, len, hash) =>
          val h0 = if (content.nonEmpty) content(0) & 0xff else 0
          val h1 = if (content.length > 1) content(1) & 0xff else 0
          DecodedMedia(id, len, hash,
            width = 32 + (h0 * 7 + h1) % 224,
            height = 32 + (h1 * 5 + h0) % 224,
            n_frames = 1 + (len % 16).toInt)
        }
      }
  }

  /** Frame sampling stub: every `stride`-th frame index of a decoded
    * clip — the explode pattern a video pipeline uses (1 row per frame). */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded.select(
      col("media_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
