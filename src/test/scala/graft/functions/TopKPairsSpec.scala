package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.functions.expressions.TopKPairs.topk_pairs

/** The bounded top-k aggregate must be output-identical to the
  * `row_number()` window form it replaces in the ANN finishers, while
  * planning as a partial (map-side combining) ObjectHashAggregate —
  * the whole point is that the shuffle carries k rows per (group, map
  * partition) instead of every scored row.
  */
class TopKPairsSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(scored: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  private def aggTopK(scored: org.apache.spark.sql.DataFrame, k: Int) =
    scored.groupBy("query_id")
      .agg(topk_pairs(col("cos_sim"), col("neighbor_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        col("p.score").as("cos_sim"), (col("pos") + 1).as("rank"))

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id", "cos_sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet

  test("equals the row_number window form on real scored pairs") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val q = emb.filter($"vec_id" < 7).select($"vec_id".as("query_id"),
      graft.operators.Similarity.asDouble($"embedding").as("qv"))
    val c = emb.select($"vec_id".as("neighbor_id"),
      graft.operators.Similarity.asDouble($"embedding").as("cv"))
    val scored = c.join(broadcast(q), $"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id",
        round(graft.operators.Similarity.cosine($"qv", $"cv"), 6).as("cos_sim"))
    assert(asSet(aggTopK(scored, 10)) === asSet(windowTopK(scored, 10)))
  }

  test("duplicate (score, id) pairs rank with multiplicity, like the window") {
    // non-key ids: the same pair appears several times; row_number gives
    // each occurrence its own rank, so the top-k must too (a set-based
    // buffer would collapse them and pull worse pairs into the k)
    val scored = Seq(
      (1L, 5L, 0.9), (1L, 5L, 0.9), (1L, 5L, 0.9),
      (1L, 2L, 0.8), (1L, 2L, 0.8), (1L, 9L, 0.7), (1L, 1L, 0.6)
    ).toDF("query_id", "neighbor_id", "cos_sim").repartition(4)
    for (k <- Seq(2, 4, 6, 7)) {
      val agg = aggTopK(scored, k)
        .select("query_id", "neighbor_id", "cos_sim")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
      val win = windowTopK(scored, k)
        .select("query_id", "neighbor_id", "cos_sim")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
      assert(agg === win, s"k=$k")
    }
  }

  test("ties on score break toward the lower id, matching the window") {
    val scored = Seq(
      (1L, 10L, 0.5), (1L, 3L, 0.5), (1L, 7L, 0.5), (1L, 2L, 0.9),
      (2L, 1L, 0.1)).toDF("query_id", "neighbor_id", "cos_sim")
    assert(asSet(aggTopK(scored, 2)) === asSet(windowTopK(scored, 2)))
    val top = aggTopK(scored, 2).orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(top.toSeq === Seq((1L, 2L, 0.9, 1), (1L, 3L, 0.5, 2), (2L, 1L, 0.1, 1)))
  }

  test("groups smaller than k emit all rows; null scores are ignored") {
    val scored = Seq(
      (1L, Some(5L), Some(0.4)), (1L, Some(6L), None), (1L, None, Some(0.7)))
      .toDF("query_id", "neighbor_id", "cos_sim")
    val out = aggTopK(scored, 10).as[(Long, Long, Double, Int)].collect()
    assert(out.toSeq === Seq((1L, 5L, 0.4, 1)))
  }

  test("plans as a partial ObjectHashAggregate (map-side combine before the shuffle)") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val scored = emb.select(($"vec_id" % 3).as("query_id"),
      $"vec_id".as("neighbor_id"), ($"vec_id" * 0.001).as("cos_sim"))
    val df = aggTopK(scored, 5)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate in:\n$plan")
    assert(plan.contains("partial_topk_pairs"),
      s"expected a partial (map-side) topk_pairs pass in:\n$plan")
  }

}
