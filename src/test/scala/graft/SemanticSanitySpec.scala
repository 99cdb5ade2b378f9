package graft

import org.apache.spark.sql.functions._

import graft.queries._

/** Independent recomputation checks. The DuckDB oracle proves
  * Spark ≡ DuckDB, but when both sides share a formula it cannot prove
  * the formula means what it claims (the inverted punct-ratio bug
  * survived the parity gate exactly this way). Each test here recomputes
  * a query's value through a DIFFERENT path — plain Scala arithmetic on
  * raw rows — so a shared misconception trips an assertion.
  */
class SemanticSanitySpec extends SparkSpec {

  test("t01: avg_token_len for one doc matches hand computation on the raw text") {
    val raw = Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") === 0).head().getAs[String]("text")
    val toks = raw.split(" ")
    val expected = BigDecimal(raw.replace(" ", "").length.toDouble / toks.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextQueries.t01TokenStats.fn(spark, sfDir)
      .filter(col("doc_id") === 0).head().getAs[Double]("avg_token_len")
    assert(got === expected)
  }

  test("t02: punct ratio of pure-alnum text is ~0, not ~1") {
    val ratios = TextQueries.t02QualityScore.fn(spark, sfDir)
      .agg(max("punct_ratio")).head().getDouble(0)
    // the corpus is lowercase words + spaces only
    assert(ratios <= 0.05, s"punct_ratio inverted again? max=$ratios")
  }

  test("q10: percentages sum to 100 (±rounding)") {
    val total = CoreQueries.q10PctOfTotal.fn(spark, sfDir)
      .agg(sum("pct")).head().getDouble(0)
    assert(math.abs(total - 100.0) < 0.1)
  }

  test("p03: value shares sum to 100 (±rounding)") {
    val total = PipelineQueries.p03UserStats.fn(spark, sfDir)
      .agg(sum("value_share_pct")).head().getDouble(0)
    assert(math.abs(total - 100.0) < 0.5)
  }

  test("q19: days_observed × avg_events ≈ total_events per hour") {
    val bad = CoreQueries.q19TwoLevelAgg.fn(spark, sfDir)
      .filter(abs(col("days_observed") * col("avg_events") - col("total_events"))
        > col("days_observed") * 0.051) // 0.1-rounding slack per day
      .count()
    assert(bad === 0)
  }

  test("x03: one order's ship delay matches hand computation") {
    val row = Tables.t(spark, sfDir, "lineitem")
      .join(Tables.t(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select("o_orderdate", "l_shipdate").head()
    // ms-precision parquet timestamps surface as TIMESTAMP_NTZ → LocalDateTime.
    val a = row.getAs[java.time.LocalDateTime](0).toEpochSecond(java.time.ZoneOffset.UTC)
    val b = row.getAs[java.time.LocalDateTime](1).toEpochSecond(java.time.ZoneOffset.UTC)
    val handMinutes = (b - a) / 60 // floor for positive deltas
    val viaEngine = Tables.t(spark, sfDir, "lineitem")
      .join(Tables.t(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(graft.functions.ColFns.durationMinutes(
        col("o_orderdate"), col("l_shipdate")).as("m"))
      .head().getAs[Long]("m")
    assert(viaEngine === handMinutes)
  }
}
