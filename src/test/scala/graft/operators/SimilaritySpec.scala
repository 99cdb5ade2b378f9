package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(2.0f, 0.0f, 0.0f)),   // same direction as 0
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal
    (3L, Array(-1.0f, 0.0f, 0.0f))   // opposite
  ).toDF("vec_id", "embedding")

  test("cosine: parallel=1, orthogonal=0, opposite=-1") {
    val df = vecs.as("a").crossJoin(vecs.as("b"))
      .select($"a.vec_id".as("i"), $"b.vec_id".as("j"),
        round(Similarity.cosine(
          Similarity.asDouble($"a.embedding"),
          Similarity.asDouble($"b.embedding")), 6).as("c"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(df((0L, 1L)) === 1.0)
    assert(df((0L, 2L)) === 0.0)
    assert(df((0L, 3L)) === -1.0)
  }

  test("bruteForceTopK ranks the co-directional vector first") {
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), 3)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    assert(top.head._2 === 1L)          // neighbor 1 (cos 1.0) first
    assert(top.last._2 === 3L)          // opposite vector last
  }

  test("ivfTopK achieves reasonable recall vs brute force on real embeddings") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, 10, nCentroids = 8, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall > 0.3, s"IVF recall $recall too low — cell probing broken?")
  }

  test("ivfTopKFiltered: every neighbor satisfies the predicate") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 5)
    val allowedSet = emb.filter($"label" < 3).select("vec_id")
      .as[Long].collect().toSet
    val got = Similarity.ivfTopKFiltered(emb, queries,
        emb.filter($"label" < 3).select("vec_id"), 10)
      .select("neighbor_id").as[Long].collect()
    assert(got.nonEmpty)
    got.foreach(id => assert(allowedSet.contains(id),
      s"neighbor $id violates the label predicate"))
  }

  test("ivfTopKFiltered with allow-everything equals plain ivfTopK") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 5)
    val plain = Similarity.ivfTopK(emb, queries, 10)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val filt = Similarity.ivfTopKFiltered(emb, queries,
        emb.select("vec_id"), 10)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(filt === plain)
  }

  test("ivfTopKFiltered recall vs the filtered brute-force ground truth") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 5)
    val allowed = emb.filter($"label" < 5)
    // ground truth: exact top-10 over the ALREADY-filtered corpus
    val exact = Similarity.bruteForceTopK(allowed, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val filt = Similarity.ivfTopKFiltered(emb, queries,
        allowed.select("vec_id"), 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect filt).size.toDouble / exact.size
    assert(recall > 0.3, s"filtered recall $recall too low")
  }

  test("lshTopK achieves reasonable recall vs brute force on real embeddings") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, queries, 10, nBits = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.2, s"LSH recall $recall too low — bucketing broken?")
  }

  test("lshTopKAdaptive: corpus-sized geometry keeps sane recall and is " +
      "exactly the explicit-bits form") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val adaptive = hits(Similarity.lshTopKAdaptive(emb, queries, 10))
    val recall = (exact intersect adaptive).size.toDouble / exact.size
    assert(recall > 0.2, s"adaptive LSH recall $recall — sizing broken?")
    val explicitBits = hits(Similarity.lshTopK(emb, queries, 10,
      nBits = Similarity.adaptiveLshBits(emb.count()),
      planeStride = Similarity.AdaptiveMaxBits))
    assert(adaptive === explicitBits)
  }

  test("pqTopK: ADC ranking recalls a real fraction of the exact top-10") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // one pipeline run serves both the pair-set and distance assertions
    val rows = Similarity.pqTopK(emb, queries, 10)
      .select("query_id", "neighbor_id", "approx_d2")
      .as[(Long, Long, Double)].collect()
    val pq = rows.map(r => (r._1, r._2)).toSet
    val recall = (exact intersect pq).size.toDouble / exact.size
    // 8×16 PQ on adversarially random 64-dim vectors is the worst case
    // for quantization — clustered real embeddings recall far higher
    assert(recall > 0.15, s"PQ recall $recall — codebook/ADC broken?")
    assert(rows.forall(r => r._3 >= 0 && !r._3.isNaN))
  }

  test("ivfPqTopK: every hit lies in a probed cell; recall stays sane") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 5)
    val ivfpq = Similarity.ivfPqTopK(emb, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // cell restriction is the operator's defining property: a returned
    // neighbor MUST live in one of its query's probed Voronoi cells —
    // a routing bug that scored the whole corpus would pass a pure
    // recall check but fail this
    val (cells, probed, _) = Similarity.ivfRouting(emb, queries,
      nCentroids = 16, nProbe = 4)
    val allowed = probed.select("query_id", "cid")
      .join(cells.select("neighbor_id", "cid"), "cid")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivfpq.subsetOf(allowed), "IVF-PQ returned a non-probed-cell hit")
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivfpq).size.toDouble / exact.size
    assert(recall > 0.1, s"IVF-PQ recall $recall — routing or ADC broken?")
  }

  test("frozen-index serve paths ≡ the self-contained operators (parquet round-trip)") {
    // The bench's shared ANN model stage (and any production deployment)
    // trains once, writes the index to parquet, and serves from the
    // frozen copy — these must be output-IDENTICAL to the train-inline
    // operators (training is deterministic; parquet round-trips doubles
    // exactly), or the bench would be timing a different computation.
    val emb = Tables.t(spark, sfDir, "embeddings")
    val q = emb.filter($"vec_id" < 10)
    val root = java.nio.file.Files.createTempDirectory("graft-ann-ix").toString
    val (centroids, cells) = Similarity.ivfIndex(emb)
    centroids.write.parquet(s"$root/centroids")
    cells.write.parquet(s"$root/cells")
    val cb = Similarity.pqCodebook(emb)
    cb.write.parquet(s"$root/cb")
    Similarity.pqEncode(emb, cb).write.parquet(s"$root/codes")
    val cellsBack = spark.read.parquet(s"$root/cells")
    val anchors = Similarity.residualAnchors(cellsBack)
    anchors.write.parquet(s"$root/anchors")
    val (rcb, rcodes) = Similarity.residualPqModel(cellsBack, anchors)
    rcb.write.parquet(s"$root/rcb")
    rcodes.write.parquet(s"$root/rcodes")
    spark.catalog.clearCache() // serve must not lean on training caches
    def rp(n: String) = spark.read.parquet(s"$root/$n")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(Similarity.ivfTopKServe(rp("centroids"), rp("cells"), q, 10)) ===
      rows(Similarity.ivfTopK(emb, q, 10)))
    assert(rows(Similarity.pqTopKServe(rp("cb"), rp("codes"), q, 10)) ===
      rows(Similarity.pqTopK(emb, q, 10)))
    assert(rows(Similarity.ivfPqTopKServe(rp("centroids"), rp("cells"),
        rp("cb"), rp("codes"), q, 10)) ===
      rows(Similarity.ivfPqTopK(emb, q, 10)))
    assert(rows(Similarity.ivfPqResidualServe(rp("centroids"), rp("cells"),
        rp("anchors"), rp("rcb"), rp("rcodes"), q, 10)) ===
      rows(Similarity.ivfPqResidualTopK(emb, q, 10)))
  }

  test("residual IVF-PQ: recall ≥ plain IVF-PQ at identical config") {
    // Jégou §IV.A: quantizing residuals spends the same code budget on
    // a smaller ball — recall must not regress vs the global-codebook
    // form (same routing, same candidates, only the quantization target
    // changes).
    val emb = Tables.t(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame) = {
      val hits = df.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      (exact intersect hits).size.toDouble / exact.size
    }
    val plain = recallOf(Similarity.ivfPqTopK(emb, queries, 10))
    val residual = recallOf(Similarity.ivfPqResidualTopK(emb, queries, 10))
    assert(residual >= plain,
      s"residual recall $residual regressed below plain IVF-PQ $plain")
  }

  test("centroidOutliers flags a planted far vector, passes the cluster") {
    // a tight cluster near (1, 0, 0, ...) plus one vector far away
    val dims = 8
    val cluster = (0L until 20L).map { i =>
      (i, 0, Array.tabulate(dims)(d => if (d == 0) 1.0f else 0.001f * i))
    }
    val outlier = Seq((99L, 0, Array.tabulate(dims)(_ => -5.0f)))
    val emb = (cluster ++ outlier).toDF("vec_id", "label", "embedding")
    val got = Similarity.centroidOutliers(emb)
      .select("vec_id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(got(99L), "planted far vector must flag")
    assert((0L until 20L).forall(i => !got(i)), "cluster members must pass")
    assert(got.size === 21)
  }

  test("quantizedTopK: int8 ranking closely tracks the float baseline") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val quant = Similarity.quantizedTopK(emb, queries, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    // int8 keeps ~2 decimal digits of cosine precision — recall should
    // be near-perfect, far above the LSH/IVF approximation bands
    assert(recall > 0.7, s"quantized recall $recall — quantization broken?")
  }

  test("nearDupPairsLsh: verified subset of brute force, full recall on planted dups") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    // plant exact duplicates of two corpus vectors under fresh ids —
    // cos = 1.0 pairs that identical bucket signatures MUST surface
    val dups = emb.filter($"vec_id".isin(0L, 1L))
      .select(($"vec_id" + 100000L).as("vec_id"), $"label", $"embedding")
    val corpus = emb.unionByName(dups)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("i", "j").as[(Long, Long)].collect().toSet
    val brute = pairSet(Similarity.nearDupPairs(corpus, 0.4))
    val lsh = pairSet(Similarity.nearDupPairsLsh(corpus, 0.4))
    assert(lsh.nonEmpty)
    assert(lsh.subsetOf(brute),
      "bucketed candidates produced a pair exact cosine rejects")
    assert(lsh.contains((0L, 100000L)) && lsh.contains((1L, 100001L)),
      "planted exact duplicates must be found (identical buckets)")
  }

  test("adaptiveLshBits: integer rule pinned at its power-of-two boundaries") {
    // smallest b in [4, 20] with n ≤ 32·2^b — exactly the thresholds the
    // oracle's CASE ladder replays; pin both sides of each boundary
    assert(Similarity.adaptiveLshBits(1L) === 4)
    assert(Similarity.adaptiveLshBits(512L) === 4)     // 32·2^4
    assert(Similarity.adaptiveLshBits(513L) === 5)
    assert(Similarity.adaptiveLshBits(2000L) === 6)    // sf0.1 corpus
    assert(Similarity.adaptiveLshBits(2048L) === 6)    // 32·2^6
    assert(Similarity.adaptiveLshBits(2049L) === 7)
    assert(Similarity.adaptiveLshBits(20000L) === 10)  // sf1 corpus
    assert(Similarity.adaptiveLshBits(200000L) === 13) // sf10: the shape
      // measured at 471,898 pairs / 136 s where pinned 8 bits DNF'd
    assert(Similarity.adaptiveLshBits(262144L) === 13) // 32·2^13
    assert(Similarity.adaptiveLshBits(262145L) === 14)
    assert(Similarity.adaptiveLshBits(1_000_000_000L) === 20) // clamp
  }

  test("nearDupPairsLshAdaptive: verified subset, planted dups found at the sized geometry") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val dups = emb.filter($"vec_id".isin(0L, 1L))
      .select(($"vec_id" + 100000L).as("vec_id"), $"label", $"embedding")
    val corpus = emb.unionByName(dups)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("i", "j").as[(Long, Long)].collect().toSet
    val brute = pairSet(Similarity.nearDupPairs(corpus, 0.4))
    val lsh = pairSet(Similarity.nearDupPairsLshAdaptive(corpus, 0.4))
    assert(lsh.nonEmpty)
    assert(lsh.subsetOf(brute),
      "adaptive bucketing produced a pair exact cosine rejects")
    assert(lsh.contains((0L, 100000L)) && lsh.contains((1L, 100001L)),
      "planted exact duplicates must be found at the adaptive geometry")
    // the adaptive result IS nearDupPairsLsh at the rule's bit count over
    // the stride-decoupled plane family — pin the delegation
    val explicit = pairSet(Similarity.nearDupPairsLsh(corpus, 0.4,
      nBits = Similarity.adaptiveLshBits(corpus.count()),
      planeStride = Similarity.AdaptiveMaxBits))
    assert(lsh === explicit)
  }

  test("bucket cap bounds a degenerate corpus deterministically") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    // 300 copies of one vector: every table collapses to a single
    // bucket, so the uncapped pair space is 300·299/2 = 44 850; with
    // maxBucket = 8 only the 8 lowest ids per bucket survive → the
    // scored pairs are exactly the 28 among ids 0–7.
    val one = emb.filter($"vec_id" === 0L).select("embedding")
    val degenerate = spark.range(300).crossJoin(one)
      .select($"id".as("vec_id"), lit("x").as("label"), $"embedding")
    val capped = Similarity.nearDupPairsLsh(degenerate, 0.9, maxBucket = 8)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(capped === (for (i <- 0L until 8L; j <- i + 1 until 8L)
      yield (i, j)).toSet)
    // lshTopK under the same degeneracy: bounded candidates, still top-k
    val topk = Similarity.lshTopK(degenerate,
      degenerate.filter($"vec_id" === 0L), 5, nBits = 4, maxBucket = 8)
    assert(topk.count() === 5L)
  }

  test("the default LSH cap is invisible on healthy corpora") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    def pairSet(cap: Int) =
      Similarity.nearDupPairsLsh(emb, 0.4, maxBucket = cap)
        .select("i", "j").as[(Long, Long)].collect().toSet
    // measured max sign-LSH bucket occupancy is ≤ 205 at sf0.1 — a
    // 512 cap and the 4096 default must agree
    assert(pairSet(512) === pairSet(Similarity.DefaultMaxBucket))
  }

  test("quantized components stay within int8 range with exact norms") {
    val q = Similarity.quantized(Tables.t(spark, sfDir, "embeddings"), "id")
    val bad = q.filter(org.apache.spark.sql.functions.exists(
      $"qv", x => x < -128 || x > 127)).count()
    assert(bad === 0L)
    val mismatch = q.filter($"qn" =!=
      org.apache.spark.sql.functions.aggregate($"qv",
        org.apache.spark.sql.functions.lit(0L), (a, x) => a + x * x)).count()
    assert(mismatch === 0L)
  }
}
