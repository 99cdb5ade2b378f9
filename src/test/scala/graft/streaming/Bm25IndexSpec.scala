package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Versioned
import graft.queries.TextQueries

/** The streaming-maintained BM25 index must serve EXACTLY what the
  * self-contained t16 query computes over the same corpus, fold each
  * micro-batch exactly once across restarts, and keep both index
  * tables batch-consistent. */
class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  private def docStream(src: String) =
    spark.readStream
      .schema(Tables.t(spark, sfDir, "documents").schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(src)

  test("served ranking equals the self-contained BM25 across restarts") {
    val src = Files.createTempDirectory("graft-bm25-src").toString
    val postings = Files.createTempDirectory("graft-bm25-p").toString + "/t"
    val dlen = Files.createTempDirectory("graft-bm25-l").toString + "/t"
    val ck = Files.createTempDirectory("graft-bm25-ck").toString
    val docs = Tables.t(spark, sfDir, "documents")
    docs.repartition(6).write.mode("overwrite").parquet(src)

    Streams.bm25IndexSink(docStream(src), postings, dlen, ck, "bm25")
      .awaitTermination()

    // multiple micro-batches landed, one version each, in lockstep
    assert(Versioned.versions(postings).size >= 2, "want >1 micro-batch")
    assert(Versioned.versions(postings).size ===
      Versioned.versions(dlen).size, "index tables must move in lockstep")

    val served = TextQueries.bm25Score(spark,
        Versioned.read(spark, postings), Versioned.read(spark, dlen), 5)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val direct = TextQueries.bm25TopK(spark, docs, 5)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(served === direct,
      "index-served BM25 diverged from the self-contained ranking")

    // restart with no new data: every batch recognized, nothing refolds
    val vP = Versioned.versions(postings)
    Streams.bm25IndexSink(docStream(src), postings, dlen, ck, "bm25")
      .awaitTermination()
    assert(Versioned.versions(postings) === vP, "replay must no-op")
    val reserved = TextQueries.bm25Score(spark,
        Versioned.read(spark, postings), Versioned.read(spark, dlen), 5)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(reserved === direct)
  }

  test("postings prune by term at the manifest after zorder") {
    val src = Files.createTempDirectory("graft-bm25z-src").toString
    val postings = Files.createTempDirectory("graft-bm25z-p").toString + "/t"
    val dlen = Files.createTempDirectory("graft-bm25z-l").toString + "/t"
    val ck = Files.createTempDirectory("graft-bm25z-ck").toString
    Tables.t(spark, sfDir, "documents")
      .repartition(6).write.mode("overwrite").parquet(src)
    Streams.bm25IndexSink(docStream(src), postings, dlen, ck, "bm25z")
      .awaitTermination()
    // doc-sliced postings files all span the term alphabet; a term-
    // clustered rewrite makes the manifest term stats selective
    val v = Versioned.latestVersion(postings).get
    val before = Versioned.candidateFilesForBounds(postings, v,
      Seq(Versioned.ColumnBound("term", Some("join"), Some("join")))).size
    assert(before === Versioned.files(postings, v).size,
      "pre-zorder: every file spans the term range")
    // term is the leading SORT key here (single-column zorder = sort)
    val v2 = Versioned.zorder(spark, postings, Seq("term"), nOut = 6)
    val after = Versioned.candidateFilesForBounds(postings, v2,
      Seq(Versioned.ColumnBound("term", Some("join"), Some("join")))).size
    assert(after < Versioned.files(postings, v2).size,
      s"term-clustered postings must prune query-term scans ($after files)")
  }
}
