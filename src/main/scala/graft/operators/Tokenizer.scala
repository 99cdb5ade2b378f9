package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed tokenizer-training kernels (BASELINE north star — the
  * vocabulary-building step of an LLM data pipeline).
  *
  * BPE training is an iterative loop: count adjacent symbol pairs across
  * the corpus, merge the most frequent pair, re-count. The counting pass
  * is the distributed kernel — at 100 TB it is the entire cost (one
  * narrow projection + one hash aggregation per iteration, map-side
  * combined), while the argmax merge choice is one row. [[pairCounts]]
  * implements that kernel over raw words at the character level: the
  * counts it produces for the FIRST iteration are exactly the classic
  * BPE statistics before any merge is applied.
  *
  * Scale: explode(words) → explode(char pairs) is a pure per-row
  * expression chain (no shuffle), and the groupBy on the pair key is a
  * partial-aggregated hash agg whose key space is bounded by the
  * alphabet² (tiny), so the shuffle carries at most |alphabet|² rows per
  * map partition regardless of corpus size.
  */
object Tokenizer {

  /** Adjacent character pairs within a word: ["sp","pa","ar","rk"] for
    * "spark". Words shorter than 2 chars contribute nothing (callers
    * must filter them first — `sequence(1, 0)` would generate a
    * DESCENDING range, the classic Spark footgun). */
  def charPairs(word: Column): Column =
    transform(sequence(lit(1), length(word) - 1), i => word.substr(i, lit(2)))

  /** Corpus-wide adjacent-pair frequencies over whitespace words — one
    * BPE count iteration. Returns (pair, cnt) for the `topK` most
    * frequent pairs, ordered (cnt DESC, pair ASC) so the output — and
    * the merge the caller would pick — is fully deterministic. */
  def pairCounts(docs: DataFrame, textCol: String, topK: Int): DataFrame =
    docs
      .select(explode(graft.functions.TextFns.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(charPairs(col("w"))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(topK)
}
