package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Document deduplication operators (BASELINE north star — exact,
  * MinHash+LSH, SimHash, n-gram Jaccard).
  *
  * Scale design (100 TB): every step is a narrow column expression or a
  * shuffle keyed on high-cardinality values (shingle, LSH bucket), never a
  * cross join. MinHash signatures are computed with per-row array
  * expressions (`array_min(transform(...))`) — zero shuffle, one pass over
  * the corpus — and candidate generation joins only within LSH buckets, so
  * the pair space is bounded by bucket occupancy rather than n².
  */
object Dedup {

  /** Exact-duplicate groups keyed on content hash. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(idCol).as("keeper_doc_id"))

  /** (id, sh: array<string>) — distinct k-shingle set per document. */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame =
    docs.select(col(idCol), TextFns.shingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)

  /** One minhash: lexicographic min of seed-salted md5 over the shingle
    * set. A salted-md5 min is a valid min-wise hash family and — unlike
    * engine-native hash functions — is reproducible in any engine, so the
    * DuckDB oracle can replay it exactly. */
  private def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, x => md5(concat_ws("|", lit(seed), x))))

  /** Adds mh_0..mh_{n-1} signature columns in one projection (no shuffle). */
  def withSignature(shingled: DataFrame, numHashes: Int = 16): DataFrame =
    shingled.select(
      (shingled.columns.map(col) ++
        (0 until numHashes).map(i => minhash(col("sh"), i).as(s"mh_$i"))): _*)

  /** (id, band, sig): one LSH bucket key per band — md5 over the band's
    * minhash slice. Docs sharing any (band, sig) are candidates. */
  def lshBuckets(signed: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val slice = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh_$i"))
      struct(lit(b).as("band"), md5(concat_ws("|", slice: _*)).as("sig"))
    }
    signed.select(col(idCol), explode(array(bandStructs: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Distinct candidate pairs (i < j) from shared LSH buckets. */
  def lshCandidates(buckets: DataFrame, idCol: String): DataFrame = {
    val a = buckets.select(col("band"), col("sig"), col(idCol).as("i"))
    val b = buckets.select(col("band"), col("sig"), col(idCol).as("j"))
    a.join(b, Seq("band", "sig")).filter(col("i") < col("j"))
      .select("i", "j").distinct()
  }

  /** Exact Jaccard over the distinct shingle sets for given (i, j) pairs. */
  def jaccardFor(pairs: DataFrame, shingled: DataFrame, idCol: String): DataFrame = {
    val si = shingled.select(col(idCol).as("i"), col("sh").as("sh_i"))
    val sj = shingled.select(col(idCol).as("j"), col("sh").as("sh_j"))
    pairs.join(si, "i").join(sj, "j")
      .select(col("i"), col("j"),
        (size(array_intersect(col("sh_i"), col("sh_j"))) * lit(1.0) /
          (size(col("sh_i")) + size(col("sh_j"))
            - size(array_intersect(col("sh_i"), col("sh_j"))))).as("jaccard"))
  }

  /** Full MinHash+LSH near-dup pipeline: shingle → sign → band → bucket
    * join → exact-Jaccard verification at `threshold`. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val shingled = shingleSets(docs, idCol, textCol)
    val signed = withSignature(shingled, numHashes)
    val cand = lshCandidates(lshBuckets(signed, idCol, bands, numHashes / bands), idCol)
    jaccardFor(cand, shingled, idCol).filter(col("jaccard") >= threshold)
  }

  /** All-pairs n-gram Jaccard via a shingle-inverted-index join: only
    * pairs sharing ≥1 shingle are materialized (shuffle keyed on shingle,
    * not a cross join). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 3): DataFrame = {
    val shingled = shingleSets(docs, idCol, textCol, k)
    val ex = shingled.select(col(idCol), explode(col("sh")).as("s"))
    val cand = ex.select(col(idCol).as("i"), col("s"))
      .join(ex.select(col(idCol).as("j"), col("s")), "s")
      .filter(col("i") < col("j"))
      .select("i", "j").distinct()
    jaccardFor(cand, shingled, idCol).filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash from token xxhash64 bits (engine-native hashing — not
    * oracle-reproducible, verified by unit test + rows-only check). */
  def simhash64(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = array_distinct(TextFns.tokens(col(textCol)))
    // For each bit b: +1 if bit set else -1, summed over tokens; sign → bit.
    val bits = (0 until 64).map { b =>
      val contrib = aggregate(tok, lit(0L),
        (acc, x) => acc + when(shiftright(xxhash64(x), b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(contrib > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    docs.select(col(idCol), bits.reduce(_ bitwiseOR _).as("simhash"))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
