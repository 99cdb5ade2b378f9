package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Scale design: the baseline is brute-force cosine top-k — a broadcast of
  * the (small) query set against a full corpus scan, no shuffle until the
  * final per-query top-k (TakeOrdered-style). The scale path is sign-LSH
  * bucketing (random-hyperplane bits from deterministic per-dimension
  * weights): corpus and queries hash to buckets, the join is keyed on
  * bucket, and only bucket-mates are scored — the classic ANN trade of
  * recall for a bounded pair space.
  */
object Similarity {

  /** Arrays cast to double once; all math in double for determinism. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential left-to-right dot product — bit-reproducible in any
    * engine that folds the list in order (DuckDB list_sum does). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def norm2(a: Column): Column = aggregate(transform(a, x => x * x), lit(0.0), _ + _)

  /** cosine(a, b) = dot / (sqrt(|a|²) * sqrt(|b|²)) — formula written
    * exactly as the oracle SQL writes it. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Brute-force top-k: broadcast the query set, score every corpus row,
    * keep k per query with a deterministic tie-break. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("cv"))
    val q = queries.select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim) —
    * engine-independent (pure math on literals). */
  private def weight(plane: Int, dim: Column): Column =
    sin(dim * lit(12.9898 + plane) + lit(78.233 * (plane + 1))) * lit(43758.5453) % lit(1.0)

  /** Projection of v onto deterministic hyperplane `p` using a
    * per-element weight derived from the element index. */
  private def projected(v: Column, p: Int, dims: Int): Column = {
    val terms = (0 until dims).map(i => element_at(v, i + 1) * weight(p, lit(i)))
    terms.reduce(_ + _)
  }

  /** ANN via multi-table sign-LSH: `nTables` independent hash tables of
    * `nBits` hyperplane-sign bits each; a corpus row is a candidate for a
    * query if they share a bucket in ANY table (the standard recall
    * amplification — one table's recall on near-random data is ~1/2^nBits).
    * Each row emits nTables (table, bucket) keys; the join is keyed on
    * them, so the scored pair space is Σ bucket-occupancy, never n². */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nBits: Int = 8, nTables: Int = 4, dims: Int = 64): DataFrame = {
    def buckets(v: Column): Column = array((0 until nTables).map { t =>
      struct(
        lit(t).as("tbl"),
        (0 until nBits).map { b =>
          val plane = t * nBits + b
          when(projected(v, plane, dims) > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
        }.reduce(_ bitwiseOR _).as("bkt"))
    }: _*)
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      asDouble(col("embedding")).as("cv"))
      .withColumn("tb", explode(buckets(col("cv"))))
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
      .withColumn("tb", explode(buckets(col("qv"))))
    val scored = c.join(broadcast(q), Seq("tb"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("cos_sim"))
      .distinct() // a pair sharing buckets in several tables scores once
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** All near-dup pairs with cosine ≥ threshold. Brute force over the
    * pair space — correct baseline; LSH restricts candidates at scale. */
  def nearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = vectors.select(col("vec_id").as("i"), asDouble(col("embedding")).as("va"))
    val b = vectors.select(col("vec_id").as("j"), asDouble(col("embedding")).as("vb"))
    a.join(b, col("i") < col("j"))
      .select(col("i"), col("j"), round(cosine(col("va"), col("vb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
