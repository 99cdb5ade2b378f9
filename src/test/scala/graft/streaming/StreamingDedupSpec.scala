package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.operators.Dedup

/** Streaming–batch parity for the flagship LLM-dedup path: the
  * incremental MinHash+LSH stream must converge to EXACTLY the batch
  * pipeline's pairs once the corpus is drained (the ST6 batch-equality
  * proof applied to the dedup surface). */
class StreamingDedupSpec extends SparkSpec {

  test("streaming minhash LSH pairs ≡ batch pairs after draining the corpus") {
    val docs = Tables.t(spark, sfDir, "documents").select("doc_id", "text")
    val src = Files.createTempDirectory("graft-lshs-src").toString
    docs.repartition(3).write.mode("overwrite").parquet(src)
    val state = Files.createTempDirectory("graft-lshs-state").toString + "/state"
    val pairsDir = Files.createTempDirectory("graft-lshs-pairs").toString + "/pairs"
    val ck = Files.createTempDirectory("graft-lshs-ck").toString

    // one file per micro-batch → the corpus genuinely arrives
    // incrementally (new docs must pair against accumulated state)
    val stream = spark.readStream.schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = Streams.minhashLshStream(stream, "doc_id", "text", 0.5,
      state, pairsDir, ck)
    q.awaitTermination()

    // the corpus really was processed across multiple micro-batches
    val lastBatch = scala.io.Source.fromFile(state + ".lastbatch").mkString.trim.toLong
    assert(lastBatch >= 2, s"expected ≥3 micro-batches, saw ${lastBatch + 1}")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("i"), col("j"), round(col("jaccard"), 4))
        .collect().map(_.toSeq).toSet
    val streamedDf = Streams.lshStreamPairs(spark, pairsDir)
    val streamed = canon(streamedDf)
    val batch = canon(Dedup.minhashLshPairs(docs, "doc_id", "text", 0.5))
    assert(streamed === batch)
    assert(streamed.nonEmpty, "corpus has planted near-dups; empty = vacuous")
    // exactly-once emission: no pair appears twice across batches
    assert(streamedDf.count() === streamedDf.distinct().count())
  }
}
