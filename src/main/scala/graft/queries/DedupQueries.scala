package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Dedup

/** Deduplication surface over `documents` (BASELINE north star).
  *
  * The shingle / minhash construction is salted-md5-based precisely so the
  * DuckDB oracle can replay it: engine-native hash functions (xxhash64)
  * are faster but not reproducible outside Spark — those power the
  * rows-only SimHash entry instead.
  */
object DedupQueries {

  /** Shared DuckDB CTE: doc_id + distinct 3-shingle set (1-based list
    * indexing; mirrors TextFns.shingles exactly). */
  private[queries] val SHINGLES_CTE =
    """tok AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(t) - 1),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |  WHERE len(t) >= 3)""".stripMargin

  /** Shared DuckDB tail: exact jaccard for candidate pairs in `cand(i,j)`. */
  private val JACCARD_TAIL =
    """ex AS (SELECT doc_id, unnest(sh) AS s FROM tok),
      |common AS (
      |  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
      |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |sz AS (SELECT doc_id, len(sh) AS n FROM tok),
      |jac AS (
      |  SELECT common.i, common.j, c * 1.0 / (x.n + y.n - c) AS jaccard
      |  FROM common JOIN sz x ON x.doc_id = common.i
      |              JOIN sz y ON y.doc_id = common.j)""".stripMargin

  // ---------------------------------------------------------------- d01
  // Exact dedup: content-hash groups with survivor selection.
  val d01ExactDedup: Q = Q(
    "d01_exact_dedup",
    """SELECT md5(text) AS content_hash, COUNT(*) AS n_docs,
      |  MIN(doc_id) AS keeper_doc_id
      |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin) { (s, d) =>
    Dedup.exactGroups(t(s, d, "documents"), "doc_id", "text")
      .orderBy("content_hash")
  }

  // ---------------------------------------------------------------- d02
  // N-gram Jaccard near-dup at threshold 0.5, via the df-ADAPTIVE plan:
  // one aggregate over the shingle inverted index measures the direct
  // join's candidate volume Σ df(df−1)/2 AND its hot-shingle share,
  // then picks the physical form — the AllPairs/PPJoin prefix filter
  // only when the volume is past 50M rows AND concentrated in stop
  // shingles (df > 100) it can actually strip; the direct index join
  // otherwise (this corpus: volume 1.3M, max df 25 — direct, measured
  // 3× faster than prefix here; at sf10 volume 266M with ZERO hot
  // share — still direct, because the prefix plan's verification
  // fan-out would shuffle ~70× the direct join's rows). Both branches
  // are output-identical (spec-proven), so ONE oracle covers
  // whichever plan physics selects.
  val d02NgramJaccard: Q = Q(
    "d02_ngram_jaccard",
    s"""WITH $SHINGLES_CTE,
       |$JACCARD_TAIL
       |SELECT i, j, ROUND(jaccard, 4) AS jaccard
       |FROM jac WHERE jaccard >= 0.5 ORDER BY i, j""".stripMargin) { (s, d) =>
    Dedup.ngramJaccardPairsAdaptive(t(s, d, "documents"), "doc_id", "text", 0.5)
      .select(col("i"), col("j"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("i", "j")
  }

  // ---------------------------------------------------------------- d03
  // MinHash+LSH near-dup: 16 double-hashed minhashes (one md5 per
  // shingle; h_i = h1 + i·h2 from two 40-bit digest halves — exact in
  // both engines' 64-bit ints), 4 bands × 4 rows, bucket-join
  // candidates, exact-jaccard verification at 0.5. With ≥0.5-similar
  // pairs the 4×4 scheme's detection probability is 1-(1-s⁴)⁴ ≈ 0.98 at
  // s=0.8 — and the planted dups sit ≥0.8.
  /** Shared DuckDB CTE chain ending in `lshpairs(i, j, jaccard)`: the
    * full MinHash+LSH pipeline (bucket candidates, exact-jaccard
    * verified at 0.5). d03 exposes it directly; d06/d07/d08 build on it
    * — the SUB-LINEAR candidate stage is what those downstream steps
    * consume at scale, and because the oracle replays the identical LSH
    * construction, any pair the scheme misses is missed by BOTH engines
    * (parity holds at every SF). */
  private val LSH_PAIR_CTES =
    s"""$SHINGLES_CTE,
       |exm AS (SELECT doc_id, unnest(sh) AS s FROM tok),
       |mh AS (
       |  SELECT doc_id, seed,
       |    MIN(('0x' || substr(md5(s), 1, 10))::BIGINT
       |        + seed * ('0x' || substr(md5(s), 11, 10))::BIGINT) AS m
       |  FROM exm CROSS JOIN (SELECT unnest(range(0, 16)) AS seed) seeds
       |  GROUP BY 1, 2),
       |bands AS (
       |  SELECT doc_id, seed // 4 AS band,
       |    md5(string_agg(CAST(m AS VARCHAR), '|' ORDER BY seed)) AS sig
       |  FROM mh GROUP BY 1, 2),
       |bstats AS (
       |  SELECT band, sig, COUNT(*) AS occ, MIN(doc_id) AS mn
       |  FROM bands GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT i, j FROM (
       |    SELECT a.doc_id AS i, b.doc_id AS j
       |    FROM bands a
       |    JOIN bands b ON a.band = b.band AND a.sig = b.sig
       |      AND a.doc_id < b.doc_id
       |    JOIN bstats s ON s.band = a.band AND s.sig = a.sig
       |    WHERE s.occ <= 256
       |    UNION ALL
       |    SELECT s.mn AS i, b.doc_id AS j
       |    FROM bands b
       |    JOIN bstats s ON s.band = b.band AND s.sig = b.sig
       |    WHERE s.occ > 256 AND b.doc_id <> s.mn)),
       |$JACCARD_TAIL,
       |lshpairs AS (
       |  SELECT cand.i AS i, cand.j AS j, jaccard
       |  FROM cand JOIN jac ON jac.i = cand.i AND jac.j = cand.j
       |  WHERE jaccard >= 0.5)""".stripMargin

  val d03MinhashLsh: Q = Q(
    "d03_minhash_lsh",
    s"""WITH $LSH_PAIR_CTES
       |SELECT i, j, ROUND(jaccard, 4) AS jaccard
       |FROM lshpairs ORDER BY 1, 2""".stripMargin) { (s, d) =>
    Dedup.minhashLshPairs(t(s, d, "documents"), "doc_id", "text", 0.5)
      .select(col("i"), col("j"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("i", "j")
  }

  // ---------------------------------------------------------------- d04
  // SimHash near-dup (rows-only: engine-native xxhash64 bits aren't
  // reproducible in DuckDB; semantics unit-tested in DedupSpec).
  val d04Simhash: Q = Q.rowsOnly("d04_simhash_pairs") { (s, d) =>
    val sh = Dedup.simhash64(t(s, d, "documents"), "doc_id", "text")
    // Block on the high 16 bits so the self-join is keyed, not a cross
    // join (near-identical docs share the prefix with high probability).
    Dedup.simhashPairs(sh, "doc_id", shiftBits = 48, maxHamming = 3)
      .orderBy("i", "j")
  }

  // ---------------------------------------------------------------- d05
  // Oracle-reproducible SimHash: 60-bit signatures from md5-derived token
  // hashes (SimHashBits), blocked on the top 16 bits, Hamming ≤ 3.
  // DuckDB replays the whole construction — per-bit majority vote AND
  // the block occ/star occupancy cap included — so this one
  // hash-matches at any scale (even where the cap binds), complementing
  // the faster engine-native d04.
  val d05SimhashMd5: Q = Q(
    "d05_simhash_md5",
    """WITH tok AS (
      |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
      |  FROM documents),
      |ex AS (
      |  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
      |  FROM (SELECT doc_id, unnest(ts) AS s FROM tok)),
      |bits AS (
      |  SELECT doc_id, b.b AS b,
      |    SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS w
      |  FROM ex CROSS JOIN (SELECT unnest(range(0, 60)) AS b) b
      |  GROUP BY 1, 2),
      |sh AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
      |         AS BIGINT) AS simhash
      |  FROM bits GROUP BY 1),
      |blk AS (SELECT doc_id, simhash, simhash >> 44 AS blk FROM sh),
      |bstats AS (
      |  SELECT blk, COUNT(*) AS occ, MIN(doc_id) AS mn FROM blk GROUP BY 1),
      |mnsig AS (
      |  SELECT s.blk, s.occ, s.mn, b.simhash AS msig
      |  FROM bstats s JOIN blk b ON b.blk = s.blk AND b.doc_id = s.mn),
      |cand AS (
      |  SELECT a.doc_id AS i, b.doc_id AS j, a.simhash AS ha, b.simhash AS hb
      |  FROM blk a
      |  JOIN blk b ON a.blk = b.blk AND a.doc_id < b.doc_id
      |  JOIN bstats s ON s.blk = a.blk
      |  WHERE s.occ <= 256
      |  UNION ALL
      |  SELECT m.mn AS i, b.doc_id AS j, m.msig AS ha, b.simhash AS hb
      |  FROM blk b JOIN mnsig m ON m.blk = b.blk
      |  WHERE m.occ > 256 AND b.doc_id <> m.mn)
      |SELECT i, j, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
      |FROM cand WHERE bit_count(xor(ha, hb)) <= 3
      |ORDER BY i, j""".stripMargin) { (s, d) =>
    val sh = Dedup.simhashMd5(t(s, d, "documents"), "doc_id", "text")
    Dedup.simhashPairs(sh, "doc_id", shiftBits = 44, maxHamming = 3)
      .orderBy("i", "j")
  }

  /** Shared DuckDB CTE chain: LSH near-dup pairs → undirected edges →
    * transitive closure by recursive CTE → per-node min reachable id =
    * cluster representative. The recursion replays exactly what the
    * Spark min-label propagation converges to, so hashes match; pairs
    * come from the SUB-LINEAR LSH stage (the one that survives at
    * corpus scale), not the quadratic exact index. */
  private[queries] val CLUSTER_CTES =
    s"""$LSH_PAIR_CTES,
       |pairs AS (SELECT i, j FROM lshpairs),
       |nodes AS (SELECT i AS id FROM pairs UNION SELECT j AS id FROM pairs),
       |edges AS (SELECT i AS a, j AS b FROM pairs
       |          UNION ALL SELECT j AS a, i AS b FROM pairs),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.b AS id, r.lbl FROM reach r JOIN edges e ON e.a = r.id),
       |cc AS (SELECT id, MIN(lbl) AS cluster_rep FROM reach GROUP BY id)""".stripMargin

  /** The LSH near-dup pair stage d06/d07/d08 all consume — catalog
    * entries derive it INLINE (each query self-contained for the oracle
    * gate); the bench materializes it once as its own timed entry and
    * feeds the parquet to the three consumers ([[d06Body]] etc.), so
    * the suite pays the pipeline once instead of three times without
    * ever timing a cache hit. */
  def lshPairs(s: SparkSession, d: String): DataFrame =
    Dedup.minhashLshPairs(t(s, d, "documents"), "doc_id", "text", 0.5)

  /** d06 body over an explicit pair source. */
  def d06Body(pairs: DataFrame): DataFrame =
    Dedup.dupClusters(pairs.select("i", "j")).orderBy("doc_id")

  /** d07 body over an explicit pair source. */
  def d07Body(s: SparkSession, d: String, pairs: DataFrame): DataFrame = {
    val docs = t(s, d, "documents")
    // connectedComponents directly: the summary needs only non-rep
    // membership, not the cluster sizes d06 reports
    val drops = Dedup.connectedComponents(pairs.select("i", "j"))
      .filter(col("id") =!= col("lbl"))
      .select(col("id").as("doc_id"), lit(1L).as("dropped"))
    docs.join(drops, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(col("dropped")).as("n_dropped"),
        (count(lit(1)) - count(col("dropped"))).as("n_kept"))
      .orderBy("source")
  }

  /** d08 body over an explicit pair source. */
  def d08Body(s: SparkSession, d: String, pairs: DataFrame): DataFrame = {
    val docs = t(s, d, "documents")
    val lev = levenshtein(col("ta"), col("tb"))
    pairs.select("i", "j")
      .join(docs.select(col("doc_id").as("i"), col("text").as("ta")), "i")
      .join(docs.select(col("doc_id").as("j"), col("text").as("tb")), "j")
      .select(col("i"), col("j"),
        lev.cast("bigint").as("edit_dist"),
        round(lit(1.0) - lev * lit(1.0)
          / greatest(length(col("ta")), length(col("tb"))), 4).as("edit_sim"))
      .orderBy("i", "j")
  }

  // ---------------------------------------------------------------- d06
  // Near-dup clusters: connected components over the LSH-verified
  // ≥0.5-Jaccard pair graph (pairs → clusters → keeper, the step that
  // turns pair lists into actionable dedup decisions). Spark runs
  // min-label propagation to a fixpoint; DuckDB replays it as a
  // recursive transitive closure over the same LSH pairs.
  val d06DupClusters: Q = Q(
    "d06_dup_clusters",
    s"""WITH RECURSIVE $CLUSTER_CTES,
       |szs AS (SELECT cluster_rep, COUNT(*) AS cluster_size
       |        FROM cc GROUP BY 1)
       |SELECT cc.id AS doc_id, cc.cluster_rep, szs.cluster_size
       |FROM cc JOIN szs USING (cluster_rep) ORDER BY doc_id""".stripMargin) { (s, d) =>
    d06Body(lshPairs(s, d))
  }

  // ---------------------------------------------------------------- d07
  // Dedup applied: per-source corpus summary after dropping every
  // cluster member that is not its cluster's representative — the
  // "what did dedup cost me" mart a corpus owner reads.
  val d07DedupApply: Q = Q(
    "d07_dedup_apply",
    s"""WITH RECURSIVE $CLUSTER_CTES,
       |drops AS (SELECT id AS doc_id FROM cc WHERE id <> cluster_rep)
       |SELECT source,
       |  COUNT(*) AS n_docs,
       |  COUNT(drops.doc_id) AS n_dropped,
       |  COUNT(*) - COUNT(drops.doc_id) AS n_kept
       |FROM documents LEFT JOIN drops ON documents.doc_id = drops.doc_id
       |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    d07Body(s, d, lshPairs(s, d))
  }

  // ---------------------------------------------------------------- d08
  // Edit-distance verification: levenshtein over the LSH near-dup
  // candidate pairs (never all-pairs — O(len²) per comparison is
  // affordable only AFTER a sub-linear candidate stage; this is the
  // fuzzy-match verifier layered on the same pair graph d06 clusters).
  // Both engines implement the standard unit-cost edit distance.
  val d08EditDistance: Q = Q(
    "d08_edit_distance",
    s"""WITH $LSH_PAIR_CTES
       |SELECT lshpairs.i AS i, lshpairs.j AS j,
       |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
       |  ROUND(1.0 - levenshtein(a.text, b.text) * 1.0
       |    / GREATEST(length(a.text), length(b.text)), 4) AS edit_sim
       |FROM lshpairs
       |JOIN documents a ON a.doc_id = lshpairs.i
       |JOIN documents b ON b.doc_id = lshpairs.j
       |ORDER BY i, j""".stripMargin) { (s, d) =>
    d08Body(s, d, lshPairs(s, d))
  }

  // ---------------------------------------------------------------- d09
  // Cross-document SHARED SUBSTRING SPANS — the Lee et al. 2022
  // ("Deduplicating Training Data Makes Language Models Better")
  // primitive, winnowed instead of suffix-array'd so it stays Spark-shaped:
  // one scan computes positioned winnowing fingerprints (t07's exact hash
  // stream + the leftmost-of-min position rule), one keyed join on fp
  // aligns documents, and spans fall out of grouping matches by position
  // offset (pi − pj constant along a shared substring) and merging runs
  // with gaps ≤ window+stride. Sub-linear in pair space: candidates exist
  // only where fingerprints collide; boilerplate fingerprints (> 64
  // occurrences) are dropped before pairing — the same occupancy-cap move
  // as LSH buckets, bounding any single fp's pair fan-out at 64²/2.
  // At 100 TB this is scan + keyed join + bounded window; no all-pairs
  // stage anywhere. DuckDB replays the hash stream (HUGEINT polynomial),
  // the winnowing argmin-position selection, the cap, and the span
  // segmentation verbatim.
  val d09SubstringSpans: Q = Q(
    "d09_substring_spans",
    s"""WITH pos AS (
       |  SELECT doc_id, text, len(text) - 15 AS nw,
       |    unnest(range(1, len(text) - 14)) AS i
       |  FROM documents WHERE len(text) >= 16),
       |win AS (
       |  SELECT doc_id, i, nw,
       |    CAST(list_sum(list_transform(range(0, 16),
       |      j -> ord(substr(text, CAST(i + j AS INT), 1))::HUGEINT
       |           * (${TextQueries.FP_POWS})[j + 1]))
       |      % ${TextQueries.FP_M} AS BIGINT) AS h
       |  FROM pos),
       |runs AS (
       |  SELECT doc_id, i AS rs, nw,
       |    MIN(h) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS mn
       |  FROM win),
       |sel AS (
       |  SELECT DISTINCT r.doc_id, r.mn AS fp, MIN(w.i) - 1 AS p
       |  FROM runs r JOIN win w
       |    ON w.doc_id = r.doc_id AND w.h = r.mn
       |   AND w.i BETWEEN r.rs AND r.rs + 7
       |  WHERE r.rs <= GREATEST(r.nw - 8, 0) + 1
       |  GROUP BY r.doc_id, r.rs, r.mn),
       |hot AS (SELECT fp FROM sel GROUP BY fp HAVING COUNT(*) > 64),
       |cool AS (SELECT * FROM sel WHERE fp NOT IN (SELECT fp FROM hot)),
       |m AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j, a.p AS pi, a.p - b.p AS off
       |  FROM cool a JOIN cool b ON a.fp = b.fp AND a.doc_id < b.doc_id),
       |seg AS (
       |  SELECT i, j, off, pi,
       |    CASE WHEN LAG(pi) OVER w IS NULL
       |           OR pi - LAG(pi) OVER w > 24 THEN 1 ELSE 0 END AS brk
       |  FROM m WINDOW w AS (PARTITION BY i, j, off ORDER BY pi)),
       |sid AS (
       |  SELECT i, j, off, pi,
       |    SUM(brk) OVER (PARTITION BY i, j, off ORDER BY pi
       |      ROWS UNBOUNDED PRECEDING) AS span_id
       |  FROM seg),
       |spans AS (
       |  SELECT i, j, CAST(MIN(pi) AS BIGINT) AS start_i,
       |    CAST(MIN(pi) - off AS BIGINT) AS start_j,
       |    CAST(MAX(pi) + 16 - MIN(pi) AS BIGINT) AS span_len,
       |    COUNT(*) AS n_fps
       |  FROM sid GROUP BY i, j, off, span_id HAVING COUNT(*) >= 3)
       |SELECT i, j, start_i, start_j, span_len, n_fps
       |FROM spans ORDER BY i, j, start_i, start_j""".stripMargin) { (s, d) =>
    Dedup.substringSpans(t(s, d, "documents"))
      .orderBy("i", "j", "start_i", "start_j")
  }

  val all: Seq[Q] = Seq(d01ExactDedup, d02NgramJaccard, d03MinhashLsh,
    d04Simhash, d05SimhashMd5, d06DupClusters, d07DedupApply,
    d08EditDistance, d09SubstringSpans)
}
