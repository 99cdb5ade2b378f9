package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFns

/** Golden-fixture tests for the dedup operators (planted duplicates with
  * known relationships — the dbt-unit-test style the reference uses). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
  private val nearDup = "the quick brown fox jumps over the lazy dog near the old river bank tonight"
  private val distinct1 = "completely different words about spark query engines and columnar storage formats here"

  private lazy val docs = Seq(
    (0L, base), (1L, base), (2L, nearDup), (3L, distinct1)
  ).toDF("doc_id", "text")

  test("exactGroups collapses identical texts and keeps the min id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(g.length === 3)
    val dupGroup = g.find(_.getAs[Long]("n_docs") == 2).get
    assert(dupGroup.getAs[Long]("keeper_doc_id") === 0L)
  }

  test("shingles produce n-k+1 distinct trigrams in order") {
    val sh = Seq(("x", "a b c d e")).toDF("id", "text")
      .select(TextFns.shingles(col("text")).as("sh"))
      .head().getSeq[String](0)
    assert(sh === Seq("a b c", "b c d", "c d e"))
  }

  test("prefix-filtered jaccard equals the brute inverted-index output on real docs") {
    val real = graft.Tables.t(spark, sfDir, "documents")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("i"), col("j"), round(col("jaccard"), 6))
        .collect().map(_.toSeq).toSet
    val brute = canon(Dedup.ngramJaccardPairs(real, "doc_id", "text", 0.5))
    val pref = canon(Dedup.ngramJaccardPairsPrefix(real, "doc_id", "text", 0.5))
    assert(pref === brute)
    assert(brute.nonEmpty) // corpus has planted near-dups; empty = vacuous
  }

  test("prefix filter is lossless at a threshold where t*n hits integers") {
    // 10-shingle docs at t=0.7: ceil(0.7*10)=7 sits exactly on an integer
    // boundary — the epsilon in the prefix bound must not shorten it.
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"  // 10 shingles
    val b = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 zz"   // 8 shared
    val two = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
    val brute = Dedup.ngramJaccardPairs(two, "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pref = Dedup.ngramJaccardPairsPrefix(two, "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pref === brute)
  }

  test("minhashLshPairs finds near-dups and identical pairs, not distinct docs") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), "identical pair missed")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)), "near-dup pair missed")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "distinct doc matched")
  }

  test("ngramJaccardPairs agrees with minhashLsh on this fixture") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH produced a pair exact jaccard rejects")
    assert(exact === lsh)
  }

  test("connectedComponents: chain merges transitively, components stay apart") {
    // 1-2-3-4 is a path (diameter 3 — forces multiple propagation rounds);
    // 10-11 is a separate component; 99 appears in no pair → not emitted.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("i", "j")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("dupClusters sizes and reps are deterministic") {
    val pairs = Seq((5L, 3L), (3L, 8L), (20L, 21L)).toDF("i", "j")
    val cl = Dedup.dupClusters(pairs)
      .as[(Long, Long, Long)].collect().toSet
    assert(cl === Set((3L, 3L, 3L), (5L, 3L, 3L), (8L, 3L, 3L),
      (20L, 20L, 2L), (21L, 20L, 2L)))
  }

  test("adaptive jaccard: both branches and the auto-pick agree on real docs") {
    val real = graft.Tables.t(spark, sfDir, "documents")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("i"), col("j"), round(col("jaccard"), 6))
        .collect().map(_.toSeq).toSet
    val direct = canon(Dedup.ngramJaccardPairs(real, "doc_id", "text", 0.5))
    val auto = canon(Dedup.ngramJaccardPairsAdaptive(real, "doc_id", "text", 0.5))
    // maxDirectPairs = 0 + hotFraction = 0 forces the prefix branch
    // regardless of stats (both prefix conditions trivially hold)
    val forcedPrefix = canon(Dedup.ngramJaccardPairsAdaptive(
      real, "doc_id", "text", 0.5, maxDirectPairs = 0L,
      hotFraction = 0.0))
    // sampled decision stats: whichever plan the estimate picks, the
    // output is identical by construction
    val sampled = canon(Dedup.ngramJaccardPairsAdaptive(
      real, "doc_id", "text", 0.5, statsSampleRate = 0.25))
    assert(auto === direct)
    assert(forcedPrefix === direct)
    assert(sampled === direct)
    assert(direct.nonEmpty)
  }

  test("the adaptive decision separates hot-shingle blowup from plain corpus size") {
    // boilerplate corpus: every doc opens with the same header, so ONE
    // shingle carries df = 300 — the df² blowup the prefix plan strips.
    // Hot volume (df > 100) must dominate the total.
    val boiler = spark.range(300).select(col("id").as("doc_id"),
      concat(lit("common header shingle text "), col("id").cast("string"),
        lit(" tail"), col("id").cast("string")).as("text"))
    val (v, h) = Dedup.directJoinCandidateVolumes(boiler, "doc_id", "text")
    assert(v >= 300L * 299 / 2)
    assert(h >= (0.5 * v).toLong,
      s"boilerplate volume must register as hot: total=$v hot=$h")
    // the real corpus: volume spread over medium-df shingles (max df
    // 25 at sf0.1) — zero hot share, so the direct join stays the
    // plan at ANY corpus size (prefix would strip nothing while its
    // verification fans out; measured at sf10)
    val real = graft.Tables.t(spark, sfDir, "documents")
    val (v2, h2) = Dedup.directJoinCandidateVolumes(real, "doc_id", "text")
    assert(v2 > 0L && h2 === 0L,
      s"the test corpus has no hot shingles: total=$v2 hot=$h2")
  }

  test("hot-share boundary: the 100/0.5 constants flip the plan exactly at " +
      "half the volume hot") {
    // 3-word docs carry exactly ONE shingle each, so document frequency
    // is the block size: a 101-doc block is hot (df > hotDfCap = 100,
    // volume 101·100/2 = 5050), a 100-doc block sits ON the cap (NOT
    // hot, 4950) — total 10 000 with hot share .505, one 15-doc block
    // (105 pairs) away from .49975
    def block(tag: String, n: Long, from: Long) =
      spark.range(from, from + n).select(col("id").as("doc_id"),
        concat(lit(s"${tag}a ${tag}b ${tag}c")).as("text"))
    val hot = block("hot", 101, 0)
    val cold = block("cold", 100, 1000)
    val atBoundary = hot.unionByName(cold)
    val justBelow = atBoundary.unionByName(block("dim", 15, 2000))
    assert(Dedup.directJoinCandidateVolumes(atBoundary, "doc_id", "text")
      === ((10000L, 5050L)))
    def prefix(docs: org.apache.spark.sql.DataFrame,
        maxDirect: Long = 1000L) =
      Dedup.ngramPlanChoosesPrefix(docs, "doc_id", "text", k = 3,
        maxDirectPairs = maxDirect, statsSampleRate = 1.0,
        hotDfCap = 100, hotFraction = 0.5)
    assert(prefix(atBoundary),
      "hot share .505 ≥ .5 with volume over the gate must pick prefix")
    assert(!prefix(justBelow),
      "hot share .49975 < .5 must pick direct however big the volume")
    // the volume gate is strict: at volume == maxDirectPairs the direct
    // join's absolute intermediate is still small — direct
    assert(!prefix(atBoundary, maxDirect = 10000L))
    // df exactly AT hotDfCap is cold: shrink the hot block by one doc
    // and the hot volume vanishes entirely
    assert(Dedup.directJoinCandidateVolumes(
      block("hot", 100, 0).unionByName(cold), "doc_id", "text")._2 === 0L)
    // the choice is physics only — both branches agree on the boundary
    // corpus (every block is an identical-text clique, jaccard 1.0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("i"), col("j"), round(col("jaccard"), 6))
        .collect().map(_.toSeq).toSet
    val direct = canon(Dedup.ngramJaccardPairs(
      atBoundary, "doc_id", "text", 0.9))
    val pre = canon(Dedup.ngramJaccardPairsPrefix(
      atBoundary, "doc_id", "text", 0.9))
    assert(direct === pre)
    assert(direct.size === 10000)
  }

  test("lshCandidates: oversized buckets degrade to a bounded star, clusters unchanged") {
    // 200 identical docs: every band's bucket holds all 200, so the
    // uncapped clique is 200·199/2 = 19 900 pairs; with the cap the
    // bucket emits a 199-pair star instead — linear, and every member
    // still reaches the same connected component.
    val many = spark.range(200)
      .select(col("id").as("doc_id"), lit(base).as("text"))
    val capped = Dedup.minhashLshPairs(many, "doc_id", "text", 0.5,
      maxBucket = 16)
    assert(capped.count() === 199L)
    val clusters = Dedup.dupClusters(capped.select("i", "j"))
      .as[(Long, Long, Long)].collect()
    assert(clusters.length === 200)
    assert(clusters.forall { case (_, rep, size) => rep == 0L && size == 200L })
    // Uncapped ground truth: identical component structure.
    val full = Dedup.minhashLshPairs(many, "doc_id", "text", 0.5)
    assert(full.count() === 19900L)
    val fullClusters = Dedup.dupClusters(full.select("i", "j"))
      .as[(Long, Long, Long)].collect().toSet
    assert(fullClusters === clusters.toSet)
  }

  test("the default bucket cap is invisible on healthy corpora") {
    val real = graft.Tables.t(spark, sfDir, "documents")
    def pairs(cap: Int) =
      Dedup.minhashLshPairs(real, "doc_id", "text", 0.5, maxBucket = cap)
        .select("i", "j").as[(Long, Long)].collect().toSet
    // measured max bucket occupancy on test data is 17 — a 64 cap and
    // the 256 default must produce identical pairs
    assert(pairs(64) === pairs(Dedup.DefaultMaxBucket))
  }

  test("connectedComponents signals non-convergence instead of silently splitting") {
    // a diameter-4 path cannot converge in one round
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("i", "j")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(path, maxIter = 1, strict = true).collect()
    }
    // non-strict still returns (with a WARN) — and a sufficient budget
    // converges to a single component either way
    val ok = Dedup.connectedComponents(path, maxIter = 8)
      .as[(Long, Long)].collect().toMap
    assert(ok.values.toSet === Set(1L))
  }

  test("simhashPairs: oversized blocks degrade to a bounded star, clusters unchanged") {
    // 50 identical docs all collapse to ONE simhash, hence one block:
    // the uncapped clique is 50·49/2 = 1 225 pairs; with the cap bound
    // the block emits a 49-pair star through the block-min doc instead —
    // linear — and every star edge has hamming 0 so it survives the
    // Hamming filter and the cluster stays a single connected component.
    val many = spark.range(50)
      .select(col("id").as("doc_id"), lit(base).as("text"))
    val sh = Dedup.simhashMd5(many, "doc_id", "text")
    val capped = Dedup.simhashPairs(sh, "doc_id", shiftBits = 44,
      maxHamming = 3, maxBlock = 8)
    val rows = capped.as[(Long, Long, Long)].collect()
    assert(rows.length === 49)
    assert(rows.forall { case (i, j, h) => i == 0L && j > 0L && h == 0L })
    val clusters = Dedup.dupClusters(capped.select("i", "j"))
      .as[(Long, Long, Long)].collect()
    assert(clusters.length === 50)
    assert(clusters.forall { case (_, rep, size) => rep == 0L && size == 50L })
    // Uncapped ground truth: identical component structure.
    val full = Dedup.simhashPairs(sh, "doc_id", shiftBits = 44, maxHamming = 3)
    assert(full.count() === 1225L)
    val fullClusters = Dedup.dupClusters(full.select("i", "j"))
      .as[(Long, Long, Long)].collect().toSet
    assert(fullClusters === clusters.toSet)
  }

  test("the default simhash block cap is invisible on healthy corpora") {
    val real = graft.Tables.t(spark, sfDir, "documents")
    val sh = Dedup.simhashMd5(real, "doc_id", "text")
    def pairs(cap: Int) =
      Dedup.simhashPairs(sh, "doc_id", shiftBits = 44, maxHamming = 3,
        maxBlock = cap)
        .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs(64) === pairs(Dedup.DefaultMaxBucket))
  }

  test("simhash: identical texts hash equal; unrelated texts are far") {
    val sh = Dedup.simhash64(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sh(0L) === sh(1L))
    val hamming02 = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    val hamming03 = java.lang.Long.bitCount(sh(0L) ^ sh(3L))
    assert(hamming02 < hamming03, "near-dup should be closer than distinct doc")
  }
}
