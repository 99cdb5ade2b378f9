package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixtures for the BPE pair-counting kernel. */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("charPairs enumerates adjacent character pairs in order") {
    val pairs = Seq("spark").toDF("w")
      .select(Tokenizer.charPairs(col("w")).as("p"))
      .as[Seq[String]].head()
    assert(pairs === Seq("sp", "pa", "ar", "rk"))
  }

  test("pairCounts: hand-counted corpus frequencies, deterministic order") {
    // "abab" → ab,ba,ab; "ab" → ab; "x" → filtered (1 char); "ba" → ba
    val docs = Seq((1L, "abab ab x"), (2L, "ba")).toDF("doc_id", "text")
    val got = Tokenizer.pairCounts(docs, "text", 10)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("ab", 3L), ("ba", 2L)))
  }

  test("pairCounts topK cuts on the (cnt DESC, pair ASC) total order") {
    val docs = Seq((1L, "aa bb cc")).toDF("doc_id", "text")
    // all three pairs have cnt 1 → alphabetical order decides the cut
    val got = Tokenizer.pairCounts(docs, "text", 2)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("aa", 1L), ("bb", 1L)))
  }
}
