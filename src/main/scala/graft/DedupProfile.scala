package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage-by-stage timing of the dedup pipelines (perf investigation
  * tool). Usage: runMain graft.DedupProfile [sfDir]
  */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    val docs = Tables.t(spark, sfDir, "documents")
    docs.count() // warm

    val shingled = Dedup.shingleSets(docs, "doc_id", "text")
    time("shingleSets")(shingled.count())
    val ex = shingled.select(col("doc_id"), explode(col("sh")).as("s"))
    time("explode")(ex.count())
    time("selfjoin+group") {
      ex.select(col("doc_id").as("i"), col("s"))
        .join(ex.select(col("doc_id").as("j"), col("s")), "s")
        .filter(col("i") < col("j"))
        .groupBy("i", "j").agg(count(lit(1)).as("common")).count()
    }
    time("full d02")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5).count())
    val signed = Dedup.withSignature(shingled)
    time("signature")(signed.count())
    val buckets = Dedup.lshBuckets(signed, "doc_id", 4, 4)
    time("buckets")(buckets.count())
    val cand = Dedup.lshCandidates(buckets, "doc_id")
    time("candidates")(cand.count())
    time("full d03")(Dedup.minhashLshPairs(docs, "doc_id", "text", 0.5).count())
    spark.stop()
  }
}
