package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Multimodal

/** Multimodal-column surface: binary payload + metadata plumbing.
  * The byte-level metadata is oracle-checked (octet_length/md5 are
  * engine-agnostic); the typed mapPartitions decode path is rows-only +
  * unit-tested (its fake dimensions come from JVM-side byte access).
  */
object MultimodalQueries {

  // ---------------------------------------------------------------- m01
  // Binary metadata extraction over the media table shape.
  val m01BinaryMeta: Q = Q(
    "m01_binary_meta",
    """SELECT doc_id AS media_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  md5(text) AS content_hash
      |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
    Multimodal.asMediaTable(t(s, d, "documents"), "doc_id", "text")
      .select("media_id", "byte_len", "content_hash")
      .orderBy("media_id")
  }

  // ---------------------------------------------------------------- m02
  // REAL codec round-trip: deterministic PNG payloads synthesized from
  // each document (ImageIO writer), then decoded back through the
  // ImageIO READER api — header-level width/height/frame-count, no
  // pixel buffers. Rows-only: binary codec output has no SQL oracle,
  // but the known-dimension round-trip is spec-asserted
  // (MultimodalSpec), and the registered output exposes the decoded
  // dims so the driver's row check sees real codec results.
  val m02ImageDecode: Q = Q.rowsOnly("m02_image_decode") { (s, d) =>
    implicit val spark: org.apache.spark.sql.SparkSession = s
    val media = Multimodal.asImageTable(t(s, d, "documents"), "doc_id", "text")
    // NOT persisted ahead of the orderBy: the t-family sortShared fix
    // (cache the narrow projection so the range exchange's sampling pass
    // doesn't re-run the expensive child) A/B'd 1.12× SLOWER here (r15)
    // — the object-serialization boundary of the typed decode makes the
    // cache write cost more than the JIT-warm second codec pass saves at
    // bench scale. Recorded so the shape isn't re-tried blind.
    Multimodal.decodeMedia(media).toDF()
      .select(col("media_id"), col("width"), col("height"), col("n_frames"),
        (col("width") * col("height")).as("n_pixels"))
      .orderBy("media_id")
  }

  // ---------------------------------------------------------------- m03
  // Modality routing stats: assign each payload a pseudo-modality from a
  // content-stable hash bucket (standing in for mime sniffing, which the
  // env's codec-free container can't do) and aggregate the byte-size
  // profile per modality — the numbers a multimodal pipeline uses to
  // pick per-modality batch shapes and executor memory. Average in
  // integer bytes with explicit half-up division (the q29 lesson:
  // ROUND on a double quotient diverges at .5 boundaries).
  val m03ModalityStats: Q = Q(
    "m03_modality_stats",
    """WITH m AS (
      |  SELECT doc_id, octet_length(encode(text)) AS b,
      |    CASE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 3)
      |      WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality
      |  FROM documents)
      |SELECT modality, COUNT(*) AS n,
      |  CAST(SUM(b) AS BIGINT) AS total_bytes,
      |  CAST((2 * SUM(b) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS avg_bytes,
      |  CAST(MAX(b) AS BIGINT) AS max_bytes
      |FROM m GROUP BY modality ORDER BY modality""".stripMargin) { (s, d) =>
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 3
    t(s, d, "documents")
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("b"),
        when(bucket === 0, "image").when(bucket === 1, "audio")
          .otherwise("video").as("modality"))
      .groupBy("modality")
      .agg(count(lit(1)).as("n"), sum("b").as("s"), max("b").as("max_bytes"))
      .withColumn("total_bytes", col("s"))
      .withColumn("avg_bytes", graft.functions.ColFns.halfUpDiv("s", "n"))
      .select("modality", "n", "total_bytes", "avg_bytes", "max_bytes")
      .orderBy("modality")
  }

  val all: Seq[Q] = Seq(m01BinaryMeta, m02ImageDecode, m03ModalityStats)
}
