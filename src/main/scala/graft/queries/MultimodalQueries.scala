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
  // Typed decode boundary (stubbed codec) + frame-sample explode →
  // per-mime rollup. Rows-only: fake dims come from JVM byte access.
  val m02DecodeStub: Q = Q.rowsOnly("m02_decode_stub") { (s, d) =>
    implicit val spark: org.apache.spark.sql.SparkSession = s
    val media = Multimodal.asMediaTable(t(s, d, "documents"), "doc_id", "text")
    val decoded = Multimodal.decodeStub(media).toDF()
    Multimodal.sampleFrames(decoded, stride = 4)
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_sampled_frames"))
      .orderBy("media_id")
  }

  val all: Seq[Q] = Seq(m01BinaryMeta, m02DecodeStub)
}
