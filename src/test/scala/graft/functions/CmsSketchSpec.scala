package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.CmsSketch.{cms_estimate, cms_sketch}

/** The count-min sketch must be deterministic under any partitioning
  * (element-wise merge), one-sided (estimate >= exact count, always),
  * and within the standard collision bound on realistic data. */
class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 256

  // zipf-ish: key k appears ~1000/k times
  private def corpus = (1 to 50).flatMap(k =>
    Seq.fill(1000 / k)(s"key-$k")).toDF("k")

  test("partitioning-independent: 1, 7, and 32 partitions agree exactly") {
    val sketches = Seq(1, 7, 32).map { p =>
      corpus.repartition(p)
        .agg(cms_sketch(col("k"), depth, width)).as[Seq[Long]].head()
    }
    assert(sketches.distinct.size === 1,
      "merge order changed the sketch — not deterministic")
    assert(sketches.head.size === depth * width)
    assert(sketches.head.sum === corpus.count() * depth)
  }

  test("estimates are one-sided and within the collision bound") {
    val sk = corpus.agg(cms_sketch(col("k"), depth, width).as("cms"))
    val n = corpus.count()
    val got = corpus.distinct()
      .crossJoin(broadcast(sk))
      .select(col("k"), cms_estimate(col("cms"), col("k"), depth, width)
        .as("est"))
      .as[(String, Long)].collect().toMap
    val exact = corpus.groupBy("k").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, ex) =>
      val est = got(k)
      assert(est >= ex, s"$k: estimate $est under-counts exact $ex")
      assert(est - ex <= 2L * n / width,
        s"$k: error ${est - ex} above the 2n/w bound (${2L * n / width})")
    }
  }

  test("null keys are skipped, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("k")
    val sk = df.agg(cms_sketch(col("k"), depth, width).as("cms"))
    val est = df.filter(col("k").isNotNull).distinct()
      .crossJoin(broadcast(sk))
      .select(cms_estimate(col("cms"), col("k"), depth, width))
      .as[Long].head()
    assert(est === 2L)
  }

  test("cms_sketch is callable from SQL and matches the Column API") {
    graft.GraftExtensions.registerFunctions(spark)
    corpus.createOrReplaceTempView("cms_in")
    val sqlSketch = spark.sql(
      s"SELECT cms_sketch(k, $depth, $width) FROM cms_in")
      .as[Seq[Long]].head()
    val colSketch = corpus.agg(cms_sketch(col("k"), depth, width))
      .as[Seq[Long]].head()
    assert(sqlSketch === colSketch)
  }
}
