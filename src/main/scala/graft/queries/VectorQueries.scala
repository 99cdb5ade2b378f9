package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Similarity

/** Similarity-search surface over `embeddings` (array<float>, 64 dims).
  *
  * Oracle parity for float math: both engines cast to double first, fold
  * the list sequentially left-to-right (Spark `aggregate`, DuckDB
  * `list_sum`), apply the identical cosine formula, and round to 6 dp.
  */
object VectorQueries {

  /** DuckDB CTE: vectors as double lists + precomputed squared norm. */
  private val VEC_CTE =
    """v AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, label, e,
      |    list_sum(list_transform(e, x -> x * x)) AS nn
      |  FROM v)""".stripMargin

  private val COS =
    "list_sum(list_transform(range(1, 65), k -> a.e[k] * b.e[k])) / (sqrt(a.nn) * sqrt(b.nn))"

  // ---------------------------------------------------------------- v01
  // Brute-force cosine top-k: 10 query vectors (vec_id < 10) against the
  // full corpus; the correctness baseline every ANN variant is judged by.
  val v01BruteForceTopK: Q = Q(
    "v01_ann_bruteforce_topk",
    s"""WITH $VEC_CTE,
       |scored AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    ROUND($COS, 6) AS cos_sim
       |  FROM n a JOIN n b ON b.vec_id <> a.vec_id
       |  WHERE a.vec_id < 10),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY cos_sim DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos_sim, rank
       |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    val emb = t(s, d, "embeddings")
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), 10)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
      .orderBy("query_id", "rank")
  }

  // ---------------------------------------------------------------- v02
  // Embedding-cosine near-dup pairs above 0.4 (the corpus has no planted
  // ≥0.95 dups; 0.4 exercises the operator with real output). Brute-force
  // pair space — the LSH-bucketed scale path is v03.
  val v02NearDupPairs: Q = Q(
    "v02_embedding_neardup",
    s"""WITH $VEC_CTE
       |SELECT a.vec_id AS i, b.vec_id AS j, ROUND($COS, 6) AS cos_sim
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE $COS >= 0.4 ORDER BY i, j""".stripMargin) { (s, d) =>
    Similarity.nearDupPairs(t(s, d, "embeddings"), 0.4)
      .orderBy("i", "j")
  }

  // ---------------------------------------------------------------- v03
  // Sign-LSH-bucketed ANN, oracle-verified end to end: the deterministic
  // trig-hash hyperplanes are inlined into the SQL as correctly-rounded
  // double literals (Double.toString round-trips exactly through a
  // string cast), so DuckDB reproduces bucket assignment, candidate
  // generation, scoring, and ranking bit-for-bit.
  private val LSH_BITS = 4
  private val LSH_TABLES = 4

  private def planesSql: String =
    (0 until LSH_TABLES).flatMap { tbl =>
      (0 until LSH_BITS).map { bit =>
        val ws = Similarity
          .planeWeightValues(tbl * LSH_BITS + bit, dims = 64)
          .map(w => s"'$w'::DOUBLE").mkString(", ")
        s"($tbl, $bit, [$ws])"
      }
    }.mkString(",\n    ")

  val v03LshTopK: Q = Q(
    "v03_ann_lsh_topk",
    s"""WITH $VEC_CTE,
       |planes(tbl, bit, w) AS (VALUES
       |    $planesSql),
       |sig AS (
       |  SELECT n.vec_id, p.tbl,
       |    CAST(SUM(CASE WHEN list_sum(list_transform(range(1, 65),
       |            k -> n.e[k] * p.w[k])) > 0
       |        THEN (CAST(1 AS BIGINT) << p.bit) ELSE 0 END) AS BIGINT) AS bkt
       |  FROM n CROSS JOIN planes p GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM sig q JOIN sig c ON q.tbl = c.tbl AND q.bkt = c.bkt
       |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id, ROUND($COS, 6) AS cos_sim
       |  FROM cand
       |  JOIN n a ON a.vec_id = cand.query_id
       |  JOIN n b ON b.vec_id = cand.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY cos_sim DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos_sim, rank
       |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    val emb = t(s, d, "embeddings")
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), 10,
        nBits = LSH_BITS, nTables = LSH_TABLES)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
      .orderBy("query_id", "rank")
  }

  // ---------------------------------------------------------------- v04
  // IVF ANN (rows-only: the Lloyd-refined Voronoi partition isn't worth
  // replicating in SQL; recall vs v01 is asserted in SimilaritySpec).
  val v04IvfTopK: Q = Q.rowsOnly("v04_ann_ivf_topk") { (s, d) =>
    val emb = t(s, d, "embeddings")
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), 10)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
      .orderBy("query_id", "rank")
  }

  val all: Seq[Q] = Seq(v01BruteForceTopK, v02NearDupPairs, v03LshTopK, v04IvfTopK)
}
