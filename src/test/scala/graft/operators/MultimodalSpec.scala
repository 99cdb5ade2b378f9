package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq((1L, "hello world"), (2L, "spark")).toDF("doc_id", "text")

  test("asMediaTable carries byte length and content hash") {
    val m = Multimodal.asMediaTable(docs, "doc_id", "text")
      .select("media_id", "byte_len").as[(Long, Long)].collect().toMap
    assert(m(1L) === 11L)
    assert(m(2L) === 5L)
  }

  /** A real PNG with the given dimensions, encoded by the JDK. */
  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeMedia reads REAL dimensions from known-size fixtures") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val media = Seq(
      (1L, png(17, 9)),    // decodable: exact dims must come back
      (2L, png(160, 2)),
      (3L, "not an image".getBytes("UTF-8")) // garbage: degrades, no throw
    ).toDF("media_id", "content")
      .selectExpr("media_id", "content", "'image/png' AS mime_type",
        "CAST(octet_length(content) AS LONG) AS byte_len",
        "md5(content) AS content_hash")
    val out = Multimodal.decodeMedia(media).collect()
      .map(m => m.media_id -> ((m.width, m.height, m.n_frames))).toMap
    assert(out(1L) === ((17, 9, 1)))
    assert(out(2L) === ((160, 2, 1)))
    assert(out(3L) === ((-1, -1, 0)))
  }

  test("asImageTable → decodeMedia round-trips the encoded dimensions") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val media = Multimodal.asImageTable(docs, "doc_id", "text")
    // payloads are genuine PNGs (magic bytes)
    val first = media.orderBy("media_id").head()
    val bytes = first.getAs[Array[Byte]]("content")
    assert(bytes.take(4).map(_ & 0xff).toSeq === Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt))
    val out = Multimodal.decodeMedia(media).collect()
      .map(m => m.media_id -> ((m.width, m.height))).toMap
    // width = 8 + len(text) % 56, height = 8 + id % 56 — real decode of
    // a real encode must return exactly these
    assert(out(1L) === ((8 + 11, 8 + 1)))
    assert(out(2L) === ((8 + 5, 8 + 2)))
  }

  test("decode is deterministic across runs") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    def run() = Multimodal.decodeMedia(
      Multimodal.asImageTable(docs, "doc_id", "text"))
      .collect().sortBy(_.media_id).map(m => (m.media_id, m.width, m.height)).toSeq
    assert(run() === run())
  }

  test("sampleFrames strides over decoded frames and skips undecodable media") {
    val decoded = Seq(
      (1L, 7),  // 7 frames, stride 2 → indices 0,2,4,6
      (2L, 1),  // single frame → index 0
      (3L, 0)   // undecodable → no rows
    ).toDF("media_id", "n_frames")
    val frames = Multimodal.sampleFrames(decoded, stride = 2)
      .as[(Long, Int)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(frames(1L) === Seq(0, 2, 4, 6))
    assert(frames(2L) === Seq(0))
    assert(!frames.contains(3L))
  }
}
