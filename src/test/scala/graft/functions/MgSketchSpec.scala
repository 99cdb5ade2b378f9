package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.MgSketch.mg_sketch

/** Misra-Gries guarantees that must hold under ANY partitioning/merge
  * order: no item with frequency > n/k is ever dropped (candidate
  * superset), surviving counters sit in [true - n/k, true], and when
  * distinct keys fit in the k-1 counters the summary is exact. */
class MgSketchSpec extends SparkSpec {
  import spark.implicits._

  private val k = 10

  // zipf-ish: key-1 dominates, long tail of singletons blows past k-1
  private def corpus = ((1 to 40).flatMap(i =>
    Seq.fill(800 / i)(s"key-$i")) ++ (1 to 500).map(i => s"tail-$i"))
    .toDF("v")

  private def summary(partitions: Int): Map[String, Long] =
    corpus.repartition(partitions)
      .agg(mg_sketch(col("v"), k).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est"))
      .as[(String, Long)].collect().toMap

  private lazy val exact: Map[String, Long] =
    corpus.groupBy("v").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap

  private lazy val n: Long = exact.values.sum

  test("heavy items survive with bounded counters, for any partitioning") {
    for (p <- Seq(1, 7, 32)) {
      val got = summary(p)
      assert(got.size <= k - 1, s"p=$p: ${got.size} counters exceed k-1")
      exact.filter { case (_, c) => c * k > n }.foreach { case (item, ex) =>
        assert(got.contains(item),
          s"p=$p: heavy item $item (cnt $ex > n/k ${n / k}) missing — " +
            "false negative breaks the MG contract")
      }
      got.foreach { case (item, est) =>
        val ex = exact(item)
        assert(est <= ex, s"p=$p: $item estimate $est over-counts $ex")
        assert(ex - est <= n / k,
          s"p=$p: $item error ${ex - est} above n/k = ${n / k}")
      }
    }
  }

  test("exact when distinct keys fit the counters, for any partitioning") {
    val small = (1 to 5).flatMap(i => Seq.fill(i * 3)(s"s-$i")).toDF("v")
    val ex = small.groupBy("v").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    for (p <- Seq(1, 4)) {
      val got = small.repartition(p)
        .agg(mg_sketch(col("v"), k).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item"), col("e.est"))
        .as[(String, Long)].collect().toMap
      assert(got === ex, s"p=$p: no-eviction summary must equal exact counts")
    }
  }

  test("result array is sorted est desc, item asc") {
    val rows = corpus
      .agg(mg_sketch(col("v"), k).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est"))
      .as[(String, Long)].collect().toSeq
    val resorted = rows.sortBy { case (item, est) => (-est, item) }
    assert(rows === resorted, "presentation order must be deterministic")
  }

  test("nulls are skipped; is registered as a SQL function") {
    // function registration is additive (no plan rules), safe on the
    // shared extension-free session
    graft.GraftExtensions.registerFunctions(spark)
    Seq(Some("a"), None, Some("a"), Some("b"))
      .toDF("v").createOrReplaceTempView("mg_in")
    val out = spark.sql(
      "SELECT mg_sketch(v, 5) AS sk FROM mg_in")
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out === Map("a" -> 2L, "b" -> 1L))
  }
}
