package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline surface (BASELINE
  * north star: language-ID, quality scoring, token counting, document
  * fingerprinting, shingling for dedup).
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (split / higher-order transform / filter / md5) — no UDFs — so the
  * operators stay inside Catalyst and scale linearly with no driver-side
  * work. Tokenization is deliberately trivial (single-space split) so the
  * DuckDB oracles can reproduce it exactly.
  */
object TextFns {

  /** Whitespace tokens (single-space split — oracle: string_split(t,' ')). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word k-shingles ("w1 w2 w3") — the dedup unit. 0-based
    * element indexing here == DuckDB's 1-based `t[i]` over range(1,n-1). */
  def shingles(text: Column, k: Int = 3): Column = {
    val tok = tokens(text)
    // Guard: sequence(0, n-k) with n<k would flip into a descending range.
    when(size(tok) >= k,
      array_distinct(
        transform(sequence(lit(0), size(tok) - k),
          i => concat_ws(" ", (0 until k).map(o => element_at(tok, i + o + 1)): _*))))
      .otherwise(array())
  }

  /** Count of tokens that appear in a fixed marker list. */
  def markerHits(tok: Column, markers: Seq[String]): Column =
    size(filter(tok, x => x.isin(markers.map(lit): _*)))

  /** Canonical content fingerprint: md5 over the sorted distinct token
    * set — robust to word order, the classic key-collapse fingerprint. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Ratio of characters outside [a-z0-9 ] (punctuation-ish), 4 dp. */
  def punctRatio(text: Column): Column =
    round((length(text) - length(regexp_replace(text, "[a-z0-9 ]", ""))).cast("double")
      / nullif(length(text), lit(0)), 4)

  /** Language marker lists (stopword heuristic). Ordered by language code
    * so the argmax tie-break is deterministic and oracle-reproducible. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "fr" -> Seq("le", "les", "des", "une", "est"))
}
