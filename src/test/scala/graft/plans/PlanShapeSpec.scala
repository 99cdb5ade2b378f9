package graft.plans

import graft.{SparkSpec, SparkEntry}

/** Plan-shape regression guards: each scale-critical query's physical
  * plan must keep the property that makes it scale. A refactor that
  * silently turns a broadcast join into a sort-merge, un-pushes a scan
  * filter, or re-plans top-k as a global sort passes every value-level
  * test — only the plan text catches it. (PLANS.md holds the curated
  * excerpts these assertions pin down.)
  */
class PlanShapeSpec extends SparkSpec {

  private def explain(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q01: filters and pruned columns reach the parquet scan") {
    val p = explain("q01_pricing_summary")
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate"), p.take(500))
    assert(!p.contains("l_comment"), "scan reads columns the query never uses")
  }

  test("q03: dimension joins broadcast (no shuffle join on the fact side)") {
    val p = explain("q03_join_agg")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin"), "dimension join fell back to SMJ")
  }

  test("q07: top-k plans TakeOrderedAndProject, not a global sort") {
    val p = explain("q07_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("s11: the weighted sample is a top-k heap merge, never a global sort") {
    val p = explain("s11_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
    // no Exchange may move corpus rows before the k-row selection: the
    // only exchange allowed is the trivial one under the 200-row result
    assert(!p.contains("Exchange hashpartitioning"), p.take(800))
  }

  test("x29: both OHLC rank windows and the bar aggregate share ONE " +
      "keyed exchange") {
    val p = explain("x29_ohlc_resample")
    // FormattedMode headers are bare "(n) Exchange"; the partitioning
    // kind lives in the Arguments detail line
    assert("Arguments: hashpartitioning".r.findAllIn(p).size === 1,
      "the windows and the aggregate must reuse one partitioning:\n" +
        p.take(1200))
  }

  test("x34: block-EWMA broadcasts the carry and adds no extra keyed " +
      "exchange beyond the upstream aggregate's") {
    val p = explain("x34_ewma_long")
    assert(p.contains("BroadcastHashJoin"),
      "the block-grain carry side must broadcast:\n" + p.take(1200))
    // the (key, block) windows must REUSE the key hash partitioning —
    // probe side: agg partial/final + anchor window = 2 keyed
    // exchanges; the persisted frame is shared, so no more may appear
    // outside the broadcast subtree
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  test("q23: rollup is ONE Expand + one partial/final aggregation") {
    val p = explain("q23_rollup")
    assert(p.contains("Expand"), p.take(500))
    // FormattedMode prints each node in the tree AND a "(n) Scan parquet"
    // detail header — count the headers.
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size === 1,
      "rollup should scan the fact table exactly once")
  }

  test("s01: sample is scan+filter only - no shuffle before the result sort") {
    val p = explain("s01_stratified_sample")
    assert(!p.contains("HashAggregate"), "sampling must not aggregate")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema:")).mkString
    assert(readSchema.nonEmpty && !readSchema.contains("text,") &&
      !readSchema.contains("text:"), s"text not pruned: $readSchema")
  }

  test("d02: dedup join is keyed (no cartesian/nested-loop pair space)") {
    val p = explain("d02_ngram_jaccard")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "inverted-index join degenerated to an unkeyed product")
  }

  test("x02: as-of join plans exactly one data shuffle for the window") {
    val p = explain("x02_asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "as-of join must stay union-sort-backfill, not a join product")
  }

  test("q35: multi-distinct plans Expand, not repeated scans") {
    val p = explain("q35_multi_distinct")
    assert(p.contains("Expand"), p.take(500))
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size === 1,
      "multi-distinct should scan events exactly once")
  }

  test("q36: ranking suite runs in ONE partitioned Window node") {
    val p = explain("q36_rank_suite")
    assert("""\(\d+\) Window""".r.findAllIn(p).size === 1,
      "rank/dense_rank/percent_rank/ntile share one window spec — " +
        "multiple Window nodes mean the specs diverged")
    assert(p.contains("hashpartitioning(event_type"),
      "window partition key lost — frame would collapse to one partition")
  }

  test("d06: cluster propagation joins stay keyed") {
    val df = graft.queries.DedupQueries.d06DupClusters.fn(spark, sfDir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "connected-components join degenerated to an unkeyed product")
  }

  test("v02: the registered near-dup plan is bucket-keyed, not a pair product") {
    val p = explain("v02_embedding_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "v02 must run the LSH-bucketed plan — the theta-join is spec-side only")
  }

  test("t16: BM25 broadcasts the query-term set and finishes map-side") {
    val p = explain("t16_bm25")
    assert(p.contains("BroadcastHashJoin"),
      "query-term semi-join must broadcast — a shuffle here moves the corpus")
    assert(p.contains("ObjectHashAggregate"),
      "topk_pairs finisher must plan as ObjectHashAggregate (map-side k-heap)")
  }

  test("x21: heavy hitters sketches map-side and recounts only candidates") {
    val p = explain("x21_heavy_hitters")
    assert(p.contains("ObjectHashAggregate"),
      "mg_sketch must plan as ObjectHashAggregate with a partial stage")
    assert(p.contains("BroadcastHashJoin"),
      "candidate recount must broadcast the ≤ k-1 candidate set")
  }

  test("no query plans an accidental CartesianProduct") {
    // v01 intentionally uses BroadcastNestedLoopJoin (brute-force
    // baseline); a CartesianProduct anywhere is always a bug.
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val p = explain(name)
      assert(!p.contains("CartesianProduct"), s"$name plans CartesianProduct")
    }
  }
}
