package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` payloads plus
  * typed metadata, with decode / feature-extract stages.
  *
  * The decode step is REAL: `javax.imageio` ships with the JDK (PNG,
  * GIF, BMP, JPEG readers), so [[decodeMedia]] runs an actual codec —
  * header-level metadata extraction (dimensions, frame count) through
  * the reader API, which never materializes pixel buffers and is the
  * production shape for corpus-wide media profiling; swap
  * `reader.getWidth(0)` for `reader.read(0)` where a pipeline stage
  * needs pixels. The Spark-side plumbing a 100 TB media pipeline needs
  * is the point: the schema shape (binary + metadata struct), a typed
  * `mapPartitions` decode boundary (one codec init per partition, not
  * per row — the pattern a JNI/FFI decoder requires), and
  * batch-friendly partitioning.
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

  /** Synthesize a REAL image payload per document: dimensions derived
    * deterministically from the doc (width from text length, height
    * from id), pixels from a cheap (x, y, id) hash, encoded as PNG by
    * the JDK's own ImageIO writer inside the same typed mapPartitions
    * boundary the decoder uses. This gives the decode path genuine
    * codec work over the standard test tables — the container ships no
    * external media files — while staying deterministic per document. */
  def asImageTable(docs: DataFrame, idCol: String, textCol: String)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    // Par.wide: the PNG encode below is the most per-row-expensive stage
    // in the whole suite and sits directly on the unsplittable test scan
    // — serial without this (guide §2.5; no-op on splittable input)
    Par.wide(docs.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
        rows.map { case (id, text) =>
          val w = 8 + (text.length % 56)
          val h = 8 + (id % 56).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, (x * 31 + y * 17 + id.toInt * 7) & 0xffffff)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("media_id", "content")
      .select(col("media_id"), col("content"),
        lit("image/png").as("mime_type"),
        octet_length(col("content")).cast("long").as("byte_len"),
        md5(col("content")).as("content_hash"))
  }

  final case class DecodedMedia(
      media_id: Long, byte_len: Long, content_hash: String,
      width: Int, height: Int, n_frames: Int)

  /** REAL decode via the JDK's ImageIO reader API: per-partition codec
    * init (`setUseCache(false)` once per task — where a JNI decoder
    * would load its library), then header-level metadata per payload —
    * width/height of frame 0 and the true frame count (animated GIFs
    * report every frame) WITHOUT materializing pixel buffers.
    * Undecodable payloads (no registered reader / corrupt stream)
    * degrade to (-1, -1, 0) rows instead of failing the task — a media
    * crawl always contains garbage, and dropping it silently would
    * skew downstream stats. */
  def decodeMedia(media: DataFrame)(implicit spark: SparkSession): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select("media_id", "content", "byte_len", "content_hash")
      .as[(Long, Array[Byte], Long, String)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
        rows.map { case (id, content, len, hash) =>
          var reader: javax.imageio.ImageReader = null
          var iis: javax.imageio.stream.ImageInputStream = null
          try {
            iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(
                if (content == null) Array.emptyByteArray else content))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) DecodedMedia(id, len, hash, -1, -1, 0)
            else {
              reader = readers.next()
              reader.setInput(iis)
              DecodedMedia(id, len, hash,
                reader.getWidth(0), reader.getHeight(0),
                reader.getNumImages(true))
            }
          } catch {
            // NonFatal, not just IOException: codecs throw
            // IllegalArgument/IndexOutOfBounds/NegativeArraySize on
            // malformed-but-recognized payloads (hostile headers), and
            // a media crawl must degrade per-row, not fail the task
            case scala.util.control.NonFatal(_) =>
              DecodedMedia(id, len, hash, -1, -1, 0)
          } finally {
            if (reader != null) reader.dispose()
            if (iis != null) iis.close()
          }
        }
      }
  }

  /** Frame sampling: every `stride`-th frame index of a decoded clip —
    * the explode pattern a video pipeline uses (1 row per frame).
    * Undecodable media (n_frames 0) contribute no rows. */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded.filter(col("n_frames") > 0).select(
      col("media_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
