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

  test("decodeStub is deterministic and within dimension bounds") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val d1 = Multimodal.decodeStub(Multimodal.asMediaTable(docs, "doc_id", "text")).collect()
    val d2 = Multimodal.decodeStub(Multimodal.asMediaTable(docs, "doc_id", "text")).collect()
    assert(d1.sortBy(_.media_id).toSeq === d2.sortBy(_.media_id).toSeq)
    assert(d1.forall(m => m.width >= 32 && m.width < 256 && m.n_frames >= 1))
  }

  test("sampleFrames strides over decoded frames") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val decoded = Multimodal.decodeStub(Multimodal.asMediaTable(docs, "doc_id", "text")).toDF()
    val frames = Multimodal.sampleFrames(decoded, stride = 2)
    val perDoc = frames.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    val nFrames = decoded.select("media_id", "n_frames").as[(Long, Int)].collect().toMap
    perDoc.foreach { case (id, n) =>
      assert(n === (nFrames(id) + 1) / 2)
    }
  }
}
