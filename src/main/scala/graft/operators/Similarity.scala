package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.DotProduct.dot_product

/** Similarity search over embedding columns (`array<float>`).
  *
  * Scale design: the baseline is brute-force cosine top-k — a broadcast of
  * the (small) query set against a full corpus scan, no shuffle until the
  * final per-query top-k. The scale path is multi-table sign-LSH
  * bucketing: corpus and queries hash to buckets, the join is keyed on
  * (table, bucket), and only bucket-mates are scored — the classic ANN
  * trade of recall for a bounded pair space.
  *
  * All inner products run through the codegen'd DotProduct expression
  * (graft.functions.expressions) — the composed
  * aggregate(zip_with(...)) form was 20× slower at bench scale — and
  * norms are computed once per vector, not once per pair.
  */
object Similarity {

  /** Arrays cast to double once; all math in double for determinism. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential left-to-right dot product (codegen'd native expression;
    * same fold order as DuckDB list_sum ⇒ bit-identical oracle parity). */
  def dot(a: Column, b: Column): Column = dot_product(a, b)

  def norm2(a: Column): Column = dot_product(a, a)

  /** cosine(a, b) = dot / (sqrt(|a|²) * sqrt(|b|²)) — formula written
    * exactly as the oracle SQL writes it. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** (id, v, nrm): vectors with the norm precomputed once — every
    * pairwise stage reuses it instead of recomputing per pair. */
  private def withNorm(vectors: DataFrame, idAlias: String): DataFrame =
    vectors.select(col("vec_id").as(idAlias), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(norm2(col("v"))))

  /** Per-query top-k finisher via the bounded [[graft.functions.expressions.TopKPairs]]
    * aggregate (score DESC, neighbor_id ASC — identical ordering to the
    * `row_number()` window form it replaces, spec-asserted equal).
    *
    * The window form is the 100 TB trap: PARTITION BY query_id has ~|queries|
    * distinct keys, so EVERY scored candidate row shuffles into that many
    * reducer partitions before one row is dropped. The aggregate plans as
    * ObjectHashAggregate with a partial (map-side) pass — each map task
    * emits at most k rows per query, so the shuffle is k·|queries| rows per
    * map partition regardless of corpus size. */
  private def topKPerQuery(scored: DataFrame, k: Int, scoreCol: String): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.expressions.TopKPairs
        .topk_pairs(col(scoreCol), col("neighbor_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        col("p.score").as(scoreCol), (col("pos") + 1).as("rank"))

  /** Brute-force top-k: broadcast the query set, score every corpus row,
    * keep k per query with a deterministic tie-break. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = withNorm(corpus, "neighbor_id")
      .withColumnRenamed("v", "cv").withColumnRenamed("nrm", "cn")
    val q = withNorm(queries, "query_id")
      .withColumnRenamed("v", "qv").withColumnRenamed("nrm", "qn")
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos_sim"))
    topKPerQuery(scored, k, "cos_sim")
  }

  /** Int8 scalar quantization: per-vector scale 127/max|x|, component
    * floor(x·scale) ∈ [-128, 127]. floor of a double product is the SAME
    * IEEE op in any engine (unlike round/cast, whose half-way and
    * truncation rules differ — the q29/m03 lesson), so the oracle
    * replays quantization exactly. The 100 TB point: int8 vectors are 4×
    * smaller than float32 — 4× more corpus per executor-memory byte and
    * per shuffle byte — while integer dot products stay exact, so
    * ranking is fully deterministic. Zero vectors are dropped (no scale
    * exists; engines disagree on inf·0).
    */
  def quantized(vectors: DataFrame, idAlias: String): DataFrame = {
    val e = asDouble(col("embedding"))
    vectors
      .select(col("vec_id").as(idAlias), e.as("e"))
      .withColumn("mx", array_max(transform(col("e"), x => abs(x))))
      .filter(col("mx") > 0)
      .withColumn("qv",
        transform(col("e"), x => floor(x * (lit(127.0) / col("mx"))).cast("long")))
      .withColumn("qn", aggregate(col("qv"), lit(0L), (acc, x) => acc + x * x))
      .drop("e", "mx")
  }

  /** Brute-force top-k over int8-quantized vectors: exact integer dot
    * products, double only at the final normalize — the quantized analog
    * of [[bruteForceTopK]] (recall vs the float baseline is spec-checked). */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = quantized(corpus, "neighbor_id")
      .withColumnRenamed("qv", "cqv").withColumnRenamed("qn", "cqn")
    val q = quantized(queries, "query_id")
      .withColumnRenamed("qv", "qqv").withColumnRenamed("qn", "qqn")
    val idot = aggregate(zip_with(col("qqv"), col("cqv"), _ * _), lit(0L), _ + _)
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(idot / (sqrt(col("qqn")) * sqrt(col("cqn"))), 6).as("qcos_sim"))
    topKPerQuery(scored, k, "qcos_sim")
  }

  /** Deterministic pseudo-random hyperplane weights (trig hash). Public
    * as raw values so the DuckDB oracle can inline the IDENTICAL doubles
    * as literals — the whole LSH construction then replays outside
    * Spark. */
  def planeWeightValues(plane: Int, dims: Int): Seq[Double] =
    (0 until dims).map { d =>
      val x = math.sin(d * (12.9898 + plane) + 78.233 * (plane + 1)) * 43758.5453
      x - math.floor(x) - 0.5 // uniform-ish in [-0.5, 0.5)
    }

  /** The weights as an array literal per plane (computed driver-side — a
    * trig call per element inside the plan exploded the expression tree). */
  private def planeWeights(plane: Int, dims: Int): Column =
    array(planeWeightValues(plane, dims).map(lit): _*)

  /** One (tbl, bkt) struct per hash table for vector `v`: `nBits`
    * hyperplane-sign bits per table, planes deterministic from the trig
    * hash (shared by [[lshTopK]] and [[nearDupPairsLsh]]; the oracle
    * inlines the identical plane values as double literals).
    *
    * `planeStride` decouples the plane FAMILY from the bit COUNT: plane
    * index is `tbl * planeStride + bit`, so for a fixed stride the
    * planes used at any `nBits ≤ planeStride` are a PREFIX of one fixed
    * per-table family. That is what lets a corpus-size-adaptive bit
    * count ([[adaptiveLshBits]]) stay oracle-replayable: the SQL side
    * inlines the full stride-sized family once and filters
    * `bit < chosen_bits`, instead of needing a different literal set
    * per candidate geometry. Default stride = nBits preserves the
    * fixed-geometry family ([[lshTopK]]'s v03 planes are unchanged). */
  private def bucketStructs(v: Column, nBits: Int, nTables: Int,
      dims: Int, planeStride: Int = -1): Column = {
    val stride = if (planeStride > 0) planeStride else nBits
    require(nBits <= stride, s"nBits=$nBits exceeds planeStride=$stride")
    array((0 until nTables).map { t =>
      struct(
        lit(t).as("tbl"),
        (0 until nBits).map { b =>
          val proj = dot_product(v, planeWeights(t * stride + b, dims))
          when(proj > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
        }.reduce(_ bitwiseOR _).as("bkt"))
    }: _*)
  }

  /** Corpus-size-adaptive sign-LSH bit count: the smallest `b` in
    * [[AdaptiveMinBits]], [[AdaptiveMaxBits]]] with
    * `n ≤ AdaptiveTargetOcc · 2^b` — i.e. expected bucket occupancy
    * held at ~[[AdaptiveTargetOcc]] regardless of corpus size. Integer
    * arithmetic only (no floating log), so a SQL CASE ladder over the
    * same power-of-two thresholds reproduces the choice EXACTLY — the
    * DuckDB oracle replays it from COUNT(*).
    *
    * Why this exists: a pinned geometry fails the 100× question in one
    * direction or the other. 8 bits at 200k vectors crams ~780 members
    * per bucket and the per-bucket pair space goes quadratic (measured:
    * DNF past this box's spill disk), while the same corpus at 13 bits
    * — exactly what this rule picks — verifies 471,898 pairs in 136 s
    * (bench/scaleproof_sf10.json, round 13). Occupancy ∝ n/2^bits, so
    * bits ∝ log₂(n) is the unique shape that keeps the candidate
    * volume linear in n. */
  def adaptiveLshBits(n: Long): Int = {
    var b = AdaptiveMinBits
    while (b < AdaptiveMaxBits && n > (AdaptiveTargetOcc.toLong << b)) b += 1
    b
  }

  /** Target expected bucket occupancy for [[adaptiveLshBits]] (~32: big
    * enough that true near-dups co-bucket across 16 tables with ≥99.5%
    * recall, small enough that Σocc² stays linear in n). */
  val AdaptiveTargetOcc = 32
  /** Bit-count clamp: 4 bits ⇒ rule only binds above 512 vectors (tiny
    * corpora are cheap either way); 20 bits ⇒ one fixed 20-plane family
    * per table covers every corpus to 33.5M vectors per partition of
    * work — past that, occupancy grows but the cap ([[DefaultMaxBucket]])
    * still bounds the worst bucket. */
  val AdaptiveMinBits = 4
  val AdaptiveMaxBits = 20

  /** Default corpus-side bucket-occupancy cap for the LSH paths: healthy
    * sign-LSH buckets at the registered configs measure ≤ 205 members at
    * sf0.1, so 4096 never binds on real data while bounding the
    * degenerate corpus (all-zero / boilerplate embeddings collapsing
    * into one bucket, which would otherwise re-create the brute-force
    * scan the bucketing exists to avoid). */
  val DefaultMaxBucket = 4096

  /** Keep at most `maxBucket` rows per (tbl, bkt), chosen
    * deterministically (lowest `idCol` first) so a degenerate bucket
    * degrades to a bounded, reproducible candidate set rather than a
    * quadratic blowup. One window pass over the bucket key. */
  private def capBuckets(exploded: DataFrame, idCol: String,
      maxBucket: Int): DataFrame = {
    val w = Window.partitionBy(col("tb")).orderBy(col(idCol))
    exploded.withColumn("__pos", row_number().over(w))
      .filter(col("__pos") <= maxBucket).drop("__pos")
  }

  /** ANN via multi-table sign-LSH: `nTables` independent hash tables of
    * `nBits` hyperplane-sign bits each; a corpus row is a candidate for a
    * query if they share a bucket in ANY table (the standard recall
    * amplification — one table's recall on near-random data is ~1/2^nBits).
    * Each row emits nTables (table, bucket) keys; the join is keyed on
    * them, so the scored pair space is Σ bucket-occupancy, never n² —
    * and a single degenerate bucket is bounded at `maxBucket` members
    * (the deterministic cap trades recall INSIDE a pathological bucket
    * for a hard upper bound on scored pairs; it never binds on healthy
    * data, sitting 20× above the measured max occupancy). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nBits: Int = 8, nTables: Int = 4, dims: Int = 64,
      maxBucket: Int = DefaultMaxBucket, planeStride: Int = -1): DataFrame = {
    // NOT widened: see nearDupPairsLsh — Par.wide ahead of the
    // projection A/B'd 1.53×/1.74× slower on v03/v06 (r15)
    val c = capBuckets(
      withNorm(corpus, "neighbor_id")
        .withColumnRenamed("v", "cv").withColumnRenamed("nrm", "cn")
        .withColumn("tb", explode(
          bucketStructs(col("cv"), nBits, nTables, dims, planeStride))),
      "neighbor_id", maxBucket)
    val q = withNorm(queries, "query_id")
      .withColumnRenamed("v", "qv").withColumnRenamed("nrm", "qn")
      .withColumn("tb", explode(
        bucketStructs(col("qv"), nBits, nTables, dims, planeStride)))
    val scored = c.join(broadcast(q), Seq("tb"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos_sim"))
      .distinct() // a pair sharing buckets in several tables scores once
    topKPerQuery(scored, k, "cos_sim")
  }

  /** [[lshTopK]] with the bit count derived from the CORPUS size by
    * [[adaptiveLshBits]] — the registered (v03/v06) form. Same
    * geometry-sizing argument as [[nearDupPairsLshAdaptive]]: a pinned
    * bit count either saturates the occupancy cap at large n (candidate
    * recall collapses to the cap's deterministic subset) or over-prunes
    * small corpora; holding expected occupancy at ~[[AdaptiveTargetOcc]]
    * keeps cost-per-query constant at any scale. */
  def lshTopKAdaptive(corpus: DataFrame, queries: DataFrame, k: Int,
      nTables: Int = 4, dims: Int = 64,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val bits = adaptiveLshBits(corpus.count())
    lshTopK(corpus, queries, k, bits, nTables, dims, maxBucket,
      planeStride = AdaptiveMaxBits)
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nCentroids`
    * Voronoi cells, probe only the `nProbe` cells nearest each query.
    *
    * Centroids: deterministic seeding from the lowest vec_ids + ONE
    * Lloyd refinement step, all as DataFrame ops (assignment is a
    * broadcast cross-join against the tiny centroid set — nCentroids
    * rows — and the element-wise mean runs through posexplode/groupBy;
    * no driver-side collect anywhere). At 100 TB: same plan, with
    * centroids trained on a sample; scoring touches ~nProbe/nCentroids
    * of the corpus instead of all of it. */
  /** Train the IVF INDEX once and freeze it: returns
    * (centroids(cid, cv, cn), cells(neighbor_id, cv2, cn2, cid)) — the
    * production train/serve split (store both as parquet, serve many
    * query batches through [[ivfTopKServe]] / [[ivfPqTopKServe]] /
    * [[ivfPqResidualServe]] without retraining). */
  def ivfIndex(corpus: DataFrame, nCentroids: Int = 16): (DataFrame, DataFrame) = {
    // persisted: the normed corpus feeds the seed, both assignment
    // passes, and the cell index — four evaluations without it
    // (CacheScope-tracked; wrap consumption in withScope to release)
    val c = graft.CacheScope.persist(withNorm(corpus, "vid"))
    // Seed centroids: the nCentroids lowest ids (deterministic).
    val seed = c.orderBy("vid").limit(nCentroids)
      .select(col("vid").as("cid"), col("v").as("cv"), col("nrm").as("cn"))

    // Argmax cell per vector via max_by on the (sim, −cid) key — the
    // identical tie rule as the oracle's ROW_NUMBER (sim DESC, cid ASC),
    // deterministic because cid is unique within a vid group. The
    // aggregate form matters at scale: the crossJoin emits all of a
    // vector's nCentroids scored rows inside one map partition, so the
    // partial (map-side) max_by collapses them to ONE row per vector
    // before the shuffle — where the previous row_number() window
    // shuffled every (vector × centroid) row to sort it.
    def assign(vectors: DataFrame, centroids: DataFrame): DataFrame =
      vectors.crossJoin(broadcast(centroids))
        .withColumn("sim", dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
        .groupBy("vid")
        .agg(max_by(struct(col("v"), col("nrm"), col("cid")),
          struct(col("sim"), negate(col("cid")))).as("b"))
        .select(col("vid"), col("b.v").as("v"), col("b.nrm").as("nrm"),
          col("b.cid").as("cid"))

    // One Lloyd step: element-wise mean of each cell's members. The mean
    // sums DECIMAL-cast components (a raw double sum varies in the last
    // bits with partition order, which can flip a near-boundary cell
    // assignment and make the whole query's output differ between RUNS),
    // then divides in DOUBLE — one deterministic IEEE op that any engine
    // reproduces, unlike decimal division whose result scale is
    // engine-specific.
    val assigned0 = assign(c, seed)
    val refined = assigned0
      .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cid", "pos")
      .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
        .cast("double") / count(lit(1))).as("m"))
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cid"), transform(col("pm"), p => p.getField("m")).as("cv"))
      .withColumn("cn", sqrt(norm2(col("cv"))))
      // persisted: nCentroids rows, but its lineage is the whole Lloyd
      // step — both the cell index and the query probes consume it
      .transform(df => graft.CacheScope.persist(df))

    val cells = assign(c, refined)
      .select(col("vid").as("neighbor_id"), col("v").as("cv2"),
        col("nrm").as("cn2"), col("cid"))
    (refined, cells)
  }

  /** Probe a frozen IVF index: each query's `nProbe` nearest centroids.
    * Returns (query_id, qv, qn, cid). */
  def ivfProbe(queries: DataFrame, centroids: DataFrame,
      nProbe: Int = 4): DataFrame = {
    val q = withNorm(queries, "query_id")
      .withColumnRenamed("v", "qv").withColumnRenamed("nrm", "qn")
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val wp = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cid"))
    probes.withColumn("rnk", row_number().over(wp))
      .filter(col("rnk") <= nProbe)
      .select("query_id", "qv", "qn", "cid")
  }

  /** IVF routing, shared by [[ivfTopK]] (exact in-cell scoring),
    * [[ivfPqTopK]] (ADC in-cell scoring) and [[ivfPqResidualTopK]]
    * (residual ADC): returns (cells(neighbor_id, cv2, cn2, cid),
    * probed(query_id, qv, qn, cid), refined(cid, cv, cn)). */
  private[operators] def ivfRouting(corpus: DataFrame, queries: DataFrame,
      nCentroids: Int, nProbe: Int): (DataFrame, DataFrame, DataFrame) = {
    val (refined, cells) = ivfIndex(corpus, nCentroids)
    (cells, ivfProbe(queries, refined, nProbe), refined)
  }

  /** Exact in-cell scoring over a FROZEN IVF index — the serve path of
    * [[ivfTopK]]. */
  def ivfTopKServe(centroids: DataFrame, cells: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int = 4): DataFrame = {
    val probed = ivfProbe(queries, centroids, nProbe)
    val scored = probed.join(cells, "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv2")) / (col("qn") * col("cn2")), 6).as("cos_sim"))
    topKPerQuery(scored, k, "cos_sim")
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val (refined, cells) = ivfIndex(corpus, nCentroids)
    ivfTopKServe(refined, cells, queries, k, nProbe)
  }

  /** Filtered vector search: top-k restricted to candidates in
    * `allowedIds` (first column = neighbor id) — the metadata-predicate +
    * similarity composition every retrieval/curation stack needs ("nearest
    * English docs", "neighbors not in my shard"). Pre-filter semantics:
    * the predicate lands on the CELL INDEX via a keyed semi-join BEFORE
    * any dot product runs, so cost scales with the filtered occupancy of
    * the probed cells, not the corpus — and the IVF index itself stays
    * shared across predicates (one index at 100 TB, per-query filters at
    * serve time; the alternative — an index per predicate — doesn't
    * scale). The allowed set stays distributed: a semi-join, never a
    * collected id list, so data-sized predicates (e.g. "ids that survived
    * dedup") cost one keyed shuffle.
    *
    * Ref behavior: the reference serves label-scoped similarity from its
    * warehouse marts (reference `shared/` query surface); this is the
    * index-native form. */
  def ivfTopKFiltered(corpus: DataFrame, queries: DataFrame,
      allowedIds: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val (refined, cells) = ivfIndex(corpus, nCentroids)
    val allowed = allowedIds
      .select(col(allowedIds.columns.head).as("neighbor_id")).distinct()
    ivfTopKServe(refined, cells.join(allowed, Seq("neighbor_id"), "left_semi"),
      queries, k, nProbe)
  }

  /** IVF-PQ — the canonical production ANN architecture: IVF routing
    * restricts each query to its `nProbe` nearest Voronoi cells, and
    * scoring inside those cells is the PQ asymmetric distance over the
    * frozen codebook — so a query touches ~nProbe/nCentroids of the
    * corpus AND never reads a full vector while scoring (8 codes per
    * candidate + a per-query lookup table). The two halves are exactly
    * [[ivfTopK]]'s routing and [[pqTopK]]'s ADC, both independently
    * oracle-proven; the composition is one keyed join between them. */
  /** ADC scoring over FROZEN IVF + PQ structures — the serve path of
    * [[ivfPqTopK]]: centroids/cells/codebook/codes come pre-trained (in
    * memory or read back from parquet), only the query-side probing,
    * lookup tables, and the candidate ADC run per call. */
  def ivfPqTopKServe(centroids: DataFrame, cells: DataFrame,
      codebook: DataFrame, codes: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int = 4,
      m: Int = 8, dims: Int = 64): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val sub = dims / m
    val probed = ivfProbe(queries, centroids, nProbe)
    val cand = probed.select("query_id", "cid")
      .join(cells.select("neighbor_id", "cid"), "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
    val nCodes = codes.withColumnRenamed("vec_id", "neighbor_id")
    val tables = subvectors(unitVectors(queries, "query_id"), Seq("query_id"), "qv", m, sub)
      .join(broadcast(codebook), Seq("j"))
      .select(col("query_id"), col("j"), col("c"),
        sqDist(col("qv"), col("cw")).as("dd"))
    val scored = cand.join(nCodes, "neighbor_id")
      .join(tables, Seq("query_id", "j", "c"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("dd").cast(DecimalType(38, 18))).cast("double").as("ad"))
      .select(col("query_id"), col("neighbor_id"), negate(col("ad")).as("nad"))
    topKPerQuery(scored, k, "nad")
      .select(col("query_id"), col("neighbor_id"),
        round(negate(col("nad")), 6).as("approx_d2"), col("rank"))
  }

  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4,
      m: Int = 8, ksub: Int = 16, dims: Int = 64): DataFrame = {
    val (refined, cells) = ivfIndex(corpus, nCentroids)
    val codebook = graft.CacheScope.persist(pqCodebook(corpus, m, ksub, dims))
    val codes = pqEncode(corpus, codebook, m, dims)
    ivfPqTopKServe(refined, cells, codebook, codes, queries, k, nProbe, m, dims)
  }

  /** RESIDUAL IVF-PQ — the canonical composition from Jégou et al.,
    * "Product Quantization for Nearest Neighbor Search" (TPAMI 2011,
    * §IV.A): identical IVF routing and ADC mechanics to [[ivfPqTopK]],
    * but PQ quantizes each unit vector's RESIDUAL from its cell's
    * anchor (the mean of the cell's unit members) instead of the vector
    * itself. Residuals
    * concentrate in a far smaller ball than raw vectors (the centroid
    * already explains the coarse position), so the same m × ksub code
    * budget spends its resolution on fine structure — materially better
    * recall at IDENTICAL storage, shuffle, and scoring cost
    * (recall ≥ the non-residual form is spec-asserted). The geometry
    * stays exact per cell: query and candidate share the cell anchor c,
    * so ‖(q̂−c) − (x̂−c)‖² = ‖q̂ − x̂‖² and ADC still estimates the
    * unit-space L2² (= 2 − 2·cos). The one structural change is that a
    * query's lookup table is per PROBED CELL, not global — nProbe small
    * tables per query instead of one, still broadcast-joined.
    *
    * 100 TB posture unchanged from v09: candidates travel as id pairs,
    * scoring reads 8 codes per candidate, the codebook/centroids are
    * broadcast, and the top-k finisher is the bounded aggregate. */
  /** Residual ANCHOR per cell of a frozen IVF index: the DECIMAL-mean
    * of the cell's UNIT members — the L2-optimal anchor in the space
    * being quantized (the routing centroid lives in raw space;
    * re-deriving the anchor in unit space is what makes residual balls
    * genuinely smaller). Any per-cell anchor keeps ADC exact — q and x
    * share it — so the choice only moves quantization error, and the
    * mean minimizes it. Returns (cid, cu). */
  def residualAnchors(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    cells.filter(col("cn2") > 0)
      .select(col("cid"),
        posexplode(transform(col("cv2"), x => x / col("cn2")))
          .as(Seq("pos", "x")))
      .groupBy("cid", "pos")
      .agg((sum(col("x").cast(DecimalType(38, 18))).cast("double")
        / count(lit(1))).as("m"))
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cid"), transform(col("pm"), p => p.getField("m")).as("cu"))
      .transform(df => graft.CacheScope.persist(df))
  }

  /** Residual PQ model over a frozen IVF index: codebook trained on and
    * codes assigned to each member's residual (unit member − its cell's
    * anchor). Returns (codebook(j, c, cw), codes(vec_id, j, c)). */
  def residualPqModel(cells: DataFrame, anchors: DataFrame,
      m: Int = 8, ksub: Int = 16, dims: Int = 64): (DataFrame, DataFrame) = {
    val sub = dims / m
    val res = cells.join(broadcast(anchors), "cid")
      .filter(col("cn2") > 0)
      .select(col("neighbor_id").as("vec_id"),
        zip_with(transform(col("cv2"), x => x / col("cn2")), col("cu"),
          (x, c) => x - c).as("vn"))
    val rsub = graft.CacheScope.persist(
      subvectors(res, Seq("vec_id"), "sv", m, sub))
    val codebook = graft.CacheScope.persist(codebookFromSubv(rsub, ksub))
    (codebook, encodeSubv(rsub, codebook))
  }

  /** Cell-keyed residual ADC over FROZEN structures — the serve path of
    * [[ivfPqResidualTopK]]. */
  def ivfPqResidualServe(centroids: DataFrame, cells: DataFrame,
      anchors: DataFrame, codebook: DataFrame, codes: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int = 4,
      m: Int = 8, dims: Int = 64): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val sub = dims / m
    val probed = ivfProbe(queries, centroids, nProbe)
    // candidates carry their CELL: the residual score is cell-relative
    val cand = probed.select("query_id", "cid")
      .join(cells.select("neighbor_id", "cid"), "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "cid")
    val nCodes = codes.withColumnRenamed("vec_id", "neighbor_id")
    // per-(query, probed cell) residual lookup tables
    val qres = probed.join(broadcast(anchors), "cid")
      .filter(col("qn") > 0)
      .select(col("query_id"), col("cid"),
        zip_with(transform(col("qv"), x => x / col("qn")), col("cu"),
          (x, c) => x - c).as("vn"))
    val tables = subvectors(qres, Seq("query_id", "cid"), "qv", m, sub)
      .join(broadcast(codebook), Seq("j"))
      .select(col("query_id"), col("cid"), col("j"), col("c"),
        sqDist(col("qv"), col("cw")).as("dd"))
    val scored = cand.join(nCodes, "neighbor_id")
      .join(tables, Seq("query_id", "cid", "j", "c"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("dd").cast(DecimalType(38, 18))).cast("double").as("ad"))
      .select(col("query_id"), col("neighbor_id"), negate(col("ad")).as("nad"))
    topKPerQuery(scored, k, "nad")
      .select(col("query_id"), col("neighbor_id"),
        round(negate(col("nad")), 6).as("approx_d2"), col("rank"))
  }

  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4,
      m: Int = 8, ksub: Int = 16, dims: Int = 64): DataFrame = {
    val (refined, cells) = ivfIndex(corpus, nCentroids)
    val anchors = residualAnchors(cells)
    val (codebook, codes) = residualPqModel(cells, anchors, m, ksub, dims)
    ivfPqResidualServe(refined, cells, anchors, codebook, codes,
      queries, k, nProbe, m, dims)
  }

  /** Product-quantization ANN (the memory-bound scale path): split each
    * UNIT-NORMALIZED vector into `m` subvectors, learn `ksub` codewords
    * per subspace (deterministic seeding from the lowest vec_ids + one
    * Lloyd step — the ivfTopK discipline), store each vector as m small
    * codes, and answer queries by asymmetric distance: per query, one
    * (m × ksub) lookup table of exact subspace distances, then the
    * approximate distance of a corpus vector is the DECIMAL-summed
    * table entries its codes select. On unit vectors L2² = 2 − 2·cos,
    * so ascending distance IS descending cosine.
    *
    * Why this matters at 100 TB: the scored representation is m
    * small-int codes per vector (64 floats → 8 codes = 32× less state
    * through memory and shuffle), and scoring never touches the
    * original vectors — the classic IVF-PQ memory trade. Every step is
    * engine-replayable: seeding is id-ordered, means are DECIMAL-summed,
    * code assignment breaks distance ties toward the lower code, and
    * the ADC sum is DECIMAL — the DuckDB oracle replays codebook
    * training, encoding, and ranking end-to-end. */
  private def unitVectors(df: DataFrame, idAlias: String): DataFrame =
    df.select(col("vec_id").as(idAlias), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(norm2(col("v"))))
      .filter(col("nrm") > 0) // zero vectors have no direction
      .select(col(idAlias), transform(col("v"), x => x / col("nrm")).as("vn"))

  private def subvectors(df: DataFrame, idCols: Seq[String], out: String,
      m: Int, sub: Int): DataFrame = {
    val js = (0 until m).map(j =>
      struct(lit(j).as("j"), slice(col("vn"), j * sub + 1, sub).as(out)))
    df.select((idCols.map(col) :+ explode(array(js: _*)).as("s")): _*)
      .select((idCols.map(col) ++
        Seq(col("s.j").as("j"), col(s"s.$out").as(out))): _*)
  }

  private def sqDist(a: Column, b: Column): Column = {
    val diff = zip_with(a, b, (x, y) => x - y)
    dot(diff, diff)
  }

  /** PQ codebook: (j, c, cw) — `ksub` codewords per subspace, id-seeded
    * + one DECIMAL-mean Lloyd step (see [[pqTopK]]). Train once on a
    * corpus (or sample), then FREEZE it: [[pqEncode]] and the streaming
    * encoder consume it unchanged, so codes stay comparable over time. */
  def pqCodebook(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
      dims: Int = 64): DataFrame = {
    val sub = dims / m
    require(m * sub == dims, s"dims=$dims must split into m=$m subspaces")
    codebookFromSubv(graft.CacheScope.persist(
      subvectors(unitVectors(corpus, "vec_id"), Seq("vec_id"), "sv", m, sub)),
      ksub)
  }

  /** Codebook training over an already-split (vec_id, j, sv) frame —
    * shared by [[pqCodebook]] (unit-vector subspaces) and
    * [[ivfPqResidualTopK]] (residual subspaces). Id-seeded, one
    * DECIMAL-mean Lloyd step; persist the input, it is read twice. */
  private def codebookFromSubv(subv: DataFrame, ksub: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val wSeed = Window.partitionBy("j").orderBy("vec_id")
    val seed = subv.withColumn("c", row_number().over(wSeed) - 1)
      .filter(col("c") < ksub)
      .select(col("j"), col("c"), col("sv").as("cw"))
    val assigned = encodeSubv(subv, seed)
    assigned.join(subv, Seq("vec_id", "j"))
      .select(col("j"), col("c"), posexplode(col("sv")).as(Seq("pos", "x")))
      .groupBy("j", "c", "pos")
      .agg((sum(col("x").cast(DecimalType(38, 18))).cast("double")
        / count(lit(1))).as("mc"))
      .groupBy("j", "c")
      .agg(array_sort(collect_list(struct(col("pos"), col("mc")))).as("pm"))
      .select(col("j"), col("c"),
        transform(col("pm"), p => p.getField("mc")).as("cw"))
  }

  /** Nearest-codeword assignment of an already-split (vec_id, j, sv)
    * frame against a codebook — distance ties toward the lower code. */
  private def encodeSubv(subv: DataFrame, codebook: DataFrame): DataFrame =
    subv.join(broadcast(codebook), Seq("j"))
      .withColumn("dd", sqDist(col("sv"), col("cw")))
      .groupBy("vec_id", "j")
      .agg(min_by(col("c"), struct(col("dd"), col("c"))).as("c"))

  /** Encode vectors against a FROZEN codebook: (vec_id, j, c) — nearest
    * codeword per subspace, distance ties toward the lower code. Pure
    * broadcast-join + aggregate: the incremental half of PQ (new
    * vectors encode against the trained codebook without retraining —
    * spec: streaming encode ≡ batch encode). */
  def pqEncode(vectors: DataFrame, codebook: DataFrame,
      m: Int = 8, dims: Int = 64): DataFrame = {
    val sub = dims / m
    encodeSubv(
      subvectors(unitVectors(vectors, "vec_id"), Seq("vec_id"), "sv", m, sub),
      codebook)
  }

  /** ADC scoring over a FROZEN codebook + code set — the serve path of
    * [[pqTopK]] (train once with [[pqCodebook]] + [[pqEncode]], store,
    * serve many query batches). */
  def pqTopKServe(codebook: DataFrame, codes: DataFrame,
      queries: DataFrame, k: Int, m: Int = 8, dims: Int = 64): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val sub = dims / m
    // per-query subspace distance tables against the frozen codebook
    val tables = subvectors(unitVectors(queries, "query_id"), Seq("query_id"), "qv", m, sub)
      .join(broadcast(codebook), Seq("j"))
      .select(col("query_id"), col("j"), col("c"),
        sqDist(col("qv"), col("cw")).as("dd"))

    // ADC: a corpus vector's approximate distance = Σ over subspaces of
    // the table entry its code selects (DECIMAL sum — order-independent)
    val scored = codes.join(tables, Seq("j", "c"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("dd").cast(DecimalType(38, 18))).cast("double").as("ad"))
      .select(col("query_id"), col("neighbor_id"), negate(col("ad")).as("nad"))
    topKPerQuery(scored, k, "nad")
      .select(col("query_id"), col("neighbor_id"),
        round(negate(col("nad")), 6).as("approx_d2"), col("rank"))
  }

  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, ksub: Int = 16, dims: Int = 64): DataFrame = {
    val refined = graft.CacheScope.persist(pqCodebook(corpus, m, ksub, dims))
    pqTopKServe(refined, pqEncode(corpus, refined, m, dims), queries, k, m, dims)
  }

  /** Embedding-space outlier detection: distance of every vector to its
    * LABEL's centroid, z-scored within the label — the vector-quality
    * audit that catches corrupt or mislabeled embeddings before they
    * poison ANN buckets and near-dup clusters.
    *
    * Scale: the centroid is the IVF Lloyd-step shape (posexplode →
    * per-(label, dim) DECIMAL-summed mean — order-independent and
    * engine-reproducible), the join back is keyed on label, and the
    * per-label stats are one more keyed aggregate; nothing is ever
    * collected. Distances fold sequentially through the codegen'd
    * DotProduct so the oracle's list_sum replays them bit-for-bit;
    * dist rounds to 6 dp and z to 4 dp BEFORE the outlier cut, making
    * the flag engine-exact. Returns (vec_id, label, dist, z,
    * is_outlier = z > zThresh). */
  def centroidOutliers(vectors: DataFrame, zThresh: Double = 2.5): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val v = graft.CacheScope.persist(
      vectors.select(col("vec_id"), col("label"),
        asDouble(col("embedding")).as("e")))
    val cent = v
      .select(col("label"), posexplode(col("e")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg((sum(col("x").cast(DecimalType(38, 18))).cast("double")
        / count(lit(1))).as("m"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label"), transform(col("pm"), p => p.getField("m")).as("c"))
    val diff = zip_with(col("e"), col("c"), (a, b) => a - b)
    val dists = v.join(broadcast(cent), "label")
      .select(col("vec_id"), col("label"),
        round(sqrt(dot(diff, diff)), 6).as("dist"))
    val stats = dists.groupBy("label")
      .agg((sum(col("dist").cast(DecimalType(38, 18))).cast("double")
        / count(lit(1))).as("mu"),
        (sum((col("dist") * col("dist")).cast(DecimalType(38, 18))).cast("double")
          / count(lit(1))).as("msq"))
    val z = round((col("dist") - col("mu"))
      / sqrt(greatest(col("msq") - col("mu") * col("mu"), lit(1e-12))), 4)
    dists.join(broadcast(stats), "label")
      .select(col("vec_id"), col("label"), col("dist"),
        z.as("z"), (z > zThresh).as("is_outlier"))
  }

  /** All near-dup pairs with cosine ≥ threshold. Brute force over the
    * pair space — correct baseline; LSH restricts candidates at scale.
    *
    * The threshold lives INSIDE the join condition, written cheap-first:
    * the nested-loop join evaluates conjuncts in order, so `i < j` skips
    * half the n² pair space before any dot product runs, and the raw
    * cosine (no round) keeps BigDecimal allocation out of the per-pair
    * hot path — a pushed-down `round(...) ≥ t` predicate measured 2.7×
    * slower at bench scale. Survivors (few) are rounded in the project.
    */
  def nearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = withNorm(vectors, "i")
      .withColumnRenamed("v", "va").withColumnRenamed("nrm", "na")
    val b = withNorm(vectors, "j")
      .withColumnRenamed("v", "vb").withColumnRenamed("nrm", "nb")
    val rawCos = dot(col("va"), col("vb")) / (col("na") * col("nb"))
    a.join(b, col("i") < col("j") && rawCos >= threshold)
      .select(col("i"), col("j"), round(rawCos, 6).as("cos_sim"))
  }

  /** Embedding near-dup pairs via sign-LSH bucketing + exact verify —
    * the CORPUS-SCALE form of [[nearDupPairs]] and the registered
    * catalog entry: candidates are (i < j) pairs sharing any (table,
    * bucket) key, then the exact cosine filter keeps only true
    * ≥ `threshold` pairs. The pair space is Σ bucket-occupancy² across
    * tables (13.8× below n² at the registered 8-bit × 16-table config
    * on the test corpus) instead of the theta-join's n²; candidates are
    * (i, j) ids only — vectors join back in AFTER the distinct, so the
    * shuffle never carries a 64-double array per candidate row.
    *
    * Recall is the standard sign-LSH curve: ≥ 99.5% for true near-dups
    * (cos ≥ 0.9) at 8 × 16, falling to ~37% at the 0.4 exercise
    * threshold — every surviving pair is EXACT (verified), only
    * completeness degrades, and the oracle replays the identical bucket
    * construction so any pair the scheme misses is missed by both
    * engines. [[nearDupPairs]] remains the spec-side ground truth
    * (bucketed output is asserted ⊆ brute force, with full recall on
    * planted high-similarity fixtures). */
  def nearDupPairsLsh(vectors: DataFrame, threshold: Double,
      nBits: Int = 8, nTables: Int = 16, dims: Int = 64,
      maxBucket: Int = DefaultMaxBucket, planeStride: Int = -1): DataFrame = {
    // NOT widened: Par.wide ahead of the hyperplane projection A/B'd
    // 1.57× SLOWER here even with the signature persist (r15, reps=3,
    // interleaved) — at bench scale the 32-task launch + round-robin
    // exchange costs more than the serial projection; at cluster scale
    // the guard no-ops it anyway. Same negative as round 14's blanket
    // measurement; do not re-try blind.
    // The normed corpus `v` feeds the signature materialization and
    // both exact-verify legs; persisting it A/B'd 1.002 (pure neutral,
    // r15) and at scale it would cache full vector arrays — a
    // corpus-sized MEMORY_AND_DISK footprint against a cheap columnar
    // scan+dot recompute — so it stays unpersisted.
    val v = withNorm(vectors, "vid")
    val sigRaw = capBuckets(
      v.select(col("vid"),
        explode(bucketStructs(col("v"), nBits, nTables, dims, planeStride))
          .as("tb")),
      "vid", maxBucket)
    // persisted: BOTH candidate-join legs read the signatures — without
    // this the projection pass over the corpus runs twice (guide §1.2:
    // don't compute things twice)
    val sig = if (vectors.sparkSession.conf
        .get("spark.graft.sig.persist", "true").toBoolean)
      graft.CacheScope.persist(sigRaw) else sigRaw
    val cand = sig.select(col("tb"), col("vid").as("i"))
      .join(sig.select(col("tb"), col("vid").as("j")), Seq("tb"))
      .filter(col("i") < col("j"))
      .select("i", "j").distinct()
    val a = v.select(col("vid").as("i"), col("v").as("va"), col("nrm").as("na"))
    val b = v.select(col("vid").as("j"), col("v").as("vb"), col("nrm").as("nb"))
    val rawCos = dot(col("va"), col("vb")) / (col("na") * col("nb"))
    cand.join(a, "i").join(b, "j")
      .filter(rawCos >= threshold)
      .select(col("i"), col("j"), round(rawCos, 6).as("cos_sim"))
  }

  /** [[nearDupPairsLsh]] with the bit count derived from the corpus by
    * [[adaptiveLshBits]] — the registered (v02) form. The one driver
    * action is the `count()` that sizes the geometry; at production
    * scale that number comes from table statistics (the versioned
    * catalog's ANALYZE row counts) — a parquet count() is itself
    * footer-metadata-only, no data read. Planes come from the fixed
    * [[AdaptiveMaxBits]]-stride family so the oracle replays the same
    * rule with one inlined literal set. */
  def nearDupPairsLshAdaptive(vectors: DataFrame, threshold: Double,
      nTables: Int = 16, dims: Int = 64,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val bits = adaptiveLshBits(vectors.count())
    nearDupPairsLsh(vectors, threshold, bits, nTables, dims, maxBucket,
      planeStride = AdaptiveMaxBits)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by embedding clusters — the published LLM-curation
    * technique. K-means cells come from the deterministic [[ivfIndex]]
    * Lloyd step; near-dup pairs are found ONLY within a cell (the
    * paper's complexity lever: nCentroids scales with the corpus —
    * ~50k clusters on LAION — so cell size, and with it the per-cell
    * quadratic, stays bounded); per duplicate relation the KEPT member
    * is the one FARTHEST from its cell centroid (the paper's
    * keep-lowest-centroid-similarity rule: the most atypical exemplar
    * carries the most information), ties by lower id.
    *
    * The keep rule is a declarative TOURNAMENT — a vector is dropped
    * iff some cell-mate with better keep-rank (lower rounded
    * centroid-cosine, then lower id) is its ≥ `threshold` neighbor —
    * so there is no iterative component labeling, just one cell-keyed
    * self-join and an anti-join. Returns the kept rows
    * (vid, cid, cent_sim). */
  def semDedup(vectors: DataFrame, threshold: Double,
      nCentroids: Int = 16): DataFrame = {
    val (refined, cells) = ivfIndex(vectors, nCentroids)
    // persisted (r15): `members` feeds BOTH legs of the cell-keyed
    // tournament self-join AND the final anti-join probe — un-persisted,
    // the cell-assignment crossJoin (nCentroids dots per vector) and the
    // centroid-similarity projection evaluate once per consumer
    val members0 = cells.join(broadcast(refined), "cid")
      .select(col("neighbor_id").as("vid"), col("cv2").as("v"),
        col("cn2").as("nrm"), col("cid"),
        round(dot(col("cv2"), col("cv")) / (col("cn2") * col("cn")), 6)
          .as("cent_sim"))
    val members = if (vectors.sparkSession.conf
        .get("spark.graft.v11.persist", "true").toBoolean)
      graft.CacheScope.persist(members0) else members0
    val a = members.select(col("cid"), col("vid").as("i"), col("v").as("vi"),
      col("nrm").as("ni"), col("cent_sim").as("ci"))
    val b = members.select(col("cid"), col("vid").as("j"), col("v").as("vj"),
      col("nrm").as("nj"), col("cent_sim").as("cj"))
    val rawCos = dot(col("vi"), col("vj")) / (col("ni") * col("nj"))
    val dominated = a.join(b, "cid")
      .filter(col("i") =!= col("j"))
      .filter(col("cj") < col("ci") ||
        (col("cj") === col("ci") && col("j") < col("i")))
      .filter(rawCos >= threshold)
      .select(col("i").as("vid")).distinct()
    members.join(dominated, Seq("vid"), "left_anti")
      .select("vid", "cid", "cent_sim")
  }
}
