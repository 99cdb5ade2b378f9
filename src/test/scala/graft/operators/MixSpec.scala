package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixture tests for corpus-assembly operators: sequence packing math
  * (hand-folded expectations) and shard-assignment determinism.
  */
class MixSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: hand-computed bins, boundary spans, cross-bucket offsets") {
    // token counts 3,2,4,1; seqLen 4; buckets split 1 | 2,3 | 4 so the
    // prefix offsets MUST flow across buckets to be right.
    val docs = Seq(
      (1L, "a b c"), (2L, "d e"), (3L, "f g h i"), (4L, "j")
    ).toDF("doc_id", "text")
    val packed = Mix.packSequences(docs, "doc_id",
        size(split(col("text"), " ")), 4, expr("doc_id div 2"))
      .select("doc_id", "n", "prev_cum", "seq_id", "spans")
      .as[(Long, Long, Long, Long, Int)].collect().sortBy(_._1)
    assert(packed === Array(
      (1L, 3L, 0L, 0L, 0),  // tokens 0-2, inside seq 0
      (2L, 2L, 3L, 0L, 1),  // tokens 3-4, starts seq 0, spills into 1
      (3L, 4L, 5L, 1L, 1),  // tokens 5-8, starts seq 1, spills into 2
      (4L, 1L, 9L, 2L, 0))) // token 9, inside seq 2
  }

  test("chunkTokens: hand-computed windows, stride overlap, ragged tail") {
    val docs = Seq((7L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (8L, "solo"))
      .toDF("doc_id", "text")
    val chunks = Mix.chunkTokens(docs, "doc_id", "text", window = 4, stride = 3)
      .select("doc_id", "chunk_idx", "start_token", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()
      .sortBy(c => (c._1, c._2))
    assert(chunks === Array(
      (7L, 0L, 0L, 4L, "t0 t1 t2 t3"),
      (7L, 1L, 3L, 4L, "t3 t4 t5 t6"),   // 1-token overlap with chunk 0
      (7L, 2L, 6L, 4L, "t6 t7 t8 t9"),
      (7L, 3L, 9L, 1L, "t9"),            // ragged tail, shorter than window
      (8L, 0L, 0L, 1L, "solo")))
    // every adjacent chunk pair overlaps by exactly window - stride tokens
    val doc7 = chunks.filter(_._1 == 7L)
    doc7.sliding(2).foreach {
      case Array(a, b) => assert(b._3 - a._3 === 3L)
      case _ =>
    }
  }

  test("packSequences bucket granularity cannot change the result") {
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val tok = size(split(col("text"), " "))
    def run(bucket: String) =
      Mix.packSequences(docs, "doc_id", tok, 512, expr(bucket))
        .select("doc_id", "seq_id", "spans")
        .collect().map(_.toSeq).toSet
    assert(run("doc_id div 100") === run("doc_id div 7"))
  }

  test("packSequences rejects a non-monotone bucket instead of mispacking") {
    val docs = Seq((1L, "a b"), (2L, "c d"), (3L, "e f"), (4L, "g h"))
      .toDF("doc_id", "text")
    val tok = size(split(col("text"), " "))
    // doc_id % 2 interleaves buckets across the id order — the offsets
    // fold would assign bucket 0's total BEFORE bucket 1's docs even
    // though doc 2 (bucket 0) sits between docs 1 and 3 (bucket 1)
    val ex = intercept[IllegalArgumentException] {
      Mix.packSequences(docs, "doc_id", tok, 4, expr("doc_id % 2")).collect()
    }
    assert(ex.getMessage.contains("monotone"))
  }

  test("packSequences rejects a null bucket instead of NPEing") {
    val docs = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val tok = size(split(col("text"), " "))
    val ex = intercept[IllegalArgumentException] {
      Mix.packSequences(docs, "doc_id", tok, 4,
        when(col("doc_id") === 2, lit(null)).otherwise(lit(0))).collect()
    }
    assert(ex.getMessage.contains("NULL"))
  }

  test("shardOf is stable, in-range, and independent of hashBucket") {
    val ids = (0L until 1000L).toDF("id")
    val s = ids.select(Mix.shardOf(col("id"), 8).as("s"),
      Mix.hashBucket(col("id")).as("b")).collect()
    assert(s.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 8))
    // disjoint hash slices: shard must not be a function of the sample
    // bucket (a correlated pair would bias per-shard sample rates)
    val byShard = s.groupBy(_.getLong(0)).view.mapValues(
      _.map(_.getLong(1)).toSet.size)
    assert(byShard.values.forall(_ > 50),
      "each shard should see a wide spread of sample buckets")
  }

  test("weightedSample: exact k, repartition-invariant, and biased " +
      "toward heavy weights in proportion") {
    // two weight classes: ids 0..999 weight 1, ids 1000..1999 weight 9.
    // E-S inclusion ∝ weight, so a 200-draw should land ~90% heavy.
    val rows = (0L until 2000L)
      .map(i => (i, if (i < 1000) 1.0 else 9.0)).toDF("id", "w")
    val a = Mix.weightedSample(rows.coalesce(1), "id", col("w"), 200)
      .collect().map(_.getLong(0)).toSeq
    val b = Mix.weightedSample(rows.repartition(17), "id", col("w"), 200)
      .collect().map(_.getLong(0)).toSeq
    assert(a.size === 200)
    assert(a.sorted === b.sorted,
      "the md5 draw must not depend on partitioning")
    val heavy = a.count(_ >= 1000L)
    // E[heavy] = 200·0.9 = 180; allow a generous deterministic band
    assert(heavy > 150 && heavy < 200,
      s"9:1 weights should dominate the sample (heavy=$heavy/200)")
  }
}
