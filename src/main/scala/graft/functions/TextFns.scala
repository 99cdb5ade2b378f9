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

  /** Distinct word k-shingles ("w1 w2 w3") — the dedup unit. Computed by
    * the native WordShingles expression (one token-array pass; the
    * composed transform/element_at/array_distinct form cost ~0.9 ms per
    * doc and dominated the dedup bench). Set-equal to DuckDB's
    * `list_distinct(list_transform(range(1, n-1), i -> t[i]||' '||...))`. */
  def shingles(text: Column, k: Int = 3): Column =
    graft.functions.expressions.WordShingles.word_shingles(tokens(text), k)

  /** Count of tokens that appear in a fixed marker list. */
  def markerHits(tok: Column, markers: Seq[String]): Column =
    size(filter(tok, x => x.isin(markers.map(lit): _*)))

  /** Canonical content fingerprint: md5 over the sorted distinct token
    * set — robust to word order, the classic key-collapse fingerprint. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Ratio of characters outside [a-z0-9 ] (punctuation-ish), 4 dp.
    * regexp_replace removes the in-class chars, so the remaining length
    * IS the out-of-class count. */
  def punctRatio(text: Column): Column =
    round(length(regexp_replace(text, "[a-z0-9 ]", "")).cast("double")
      / nullif(length(text), lit(0)), 4)

  /** PII patterns — kept inside the Java-regex ∩ RE2 common subset (no
    * lookaround) so a DuckDB oracle interprets them identically. */
  val EmailRe = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
  val Ipv4Re = """\b\d{1,3}(\.\d{1,3}){3}\b"""
  val PhoneRe = """\b\d{3}-\d{3}-\d{4}\b"""

  /** Matches of one PII pattern in `text`, as a bigint count. */
  def piiCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("bigint")

  /** Full redaction, fixed order email → IPv4 → phone (the order is part
    * of the semantics: any oracle must chain identically). */
  def piiRedact(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      EmailRe, "[EMAIL]"), Ipv4Re, "[IP]"), PhoneRe, "[PHONE]")

  /** Language marker lists (stopword heuristic). Ordered by language code
    * so the argmax tie-break is deterministic and oracle-reproducible. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "fr" -> Seq("le", "les", "des", "une", "est"))
}
