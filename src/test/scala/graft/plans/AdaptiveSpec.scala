package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry}

/** Adaptive-execution guards for the suite's largest shuffles: local
  * numbers only predict cluster behavior if AQE actually re-plans them
  * — post-shuffle coalescing keeps tiny partitions from dominating task
  * overhead, and skew-join splitting keeps one hot key from serializing
  * a stage. These tests EXECUTE the plans (AQE decisions don't exist
  * before runtime) and assert the adaptive features fired.
  */
class AdaptiveSpec extends SparkSpec {

  /** Run `df` to completion and return the final adaptive plan text.
    * collect(), not a sink write: a write spawns a NEW QueryExecution,
    * leaving this Dataset's adaptive plan unexecuted (isFinalPlan=false
    * with no AQE decisions in it). */
  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), "plan did not finalize:\n" + p.take(400))
    p
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("d02: AQE coalesces the inverted-index join's post-shuffle partitions") {
    // over-provisioned shuffle partitions (the cluster default) on a
    // small input: AQE must fold the near-empty partitions back
    // together, or every stage pays 32 tasks of overhead for KBs of data
    withConf("spark.sql.shuffle.partitions" -> "32") {
      val p = executedPlan(SparkEntry.queries("d02_ngram_jaccard")(spark, sfDir))
      assert(p.contains("AQEShuffleRead"), p.take(800))
      assert(p.contains("coalesced"),
        "AQE left the over-provisioned shuffle uncoalesced:\n" + p.take(800))
    }
  }

  test("q14: AQE coalesces the surrogate-key sort's shuffle") {
    withConf("spark.sql.shuffle.partitions" -> "32") {
      val p = executedPlan(SparkEntry.queries("q14_surrogate_key")(spark, sfDir))
      assert(p.contains("AQEShuffleRead") && p.contains("coalesced"),
        p.take(800))
    }
  }

  test("a hot key triggers AQE skew-join splitting (thresholds scaled to test data)") {
    import spark.implicits._
    // 50k rows on ONE key vs 50 rows spread over 50 keys: the hot
    // partition is ~1000× the median. Thresholds are scaled down in the
    // same ratio a cluster config scales to its partition sizes.
    val left = spark.range(50000).select(lit(0L).as("k"), $"id".as("v"))
      .union(spark.range(50).select(($"id" % 50 + 1).as("k"), $"id".as("v")))
    val right = spark.range(51).select($"id".as("k"), ($"id" * 10).as("w"))
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.shuffle.partitions" -> "8") {
      val joined = left.join(right, "k")
      val p = executedPlan(joined)
      assert(p.contains("skew=true"),
        "AQE did not split the skewed partition:\n" + p.take(1200))
    }
  }

  test("the salted-join alternative bounds skew without AQE") {
    import spark.implicits._
    // Where AQE isn't available (non-join skew, or pre-AQE engines),
    // Skew.saltedJoin splits the hot key deterministically: with salt
    // factor 8, no single (key, salt) group exceeds ~1/8 of the hot key.
    val facts = spark.range(8000).select(lit(7L).as("k"), $"id".as("v"))
    val dim = Seq((7L, "hot")).toDF("k", "name")
    val out = graft.operators.Skew.saltedJoin(facts, dim, "k", 8, Seq("v"))
    assert(out.count() === 8000L)
    val groups = facts.withColumn("_salt",
        graft.operators.Skew.salt(8, col("v")))
      .groupBy("k", "_salt").count().select("count").as[Long].collect()
    assert(groups.length === 8 && groups.max < 8000 / 8 * 2,
      s"salting failed to spread the hot key: ${groups.mkString(",")}")
  }
}
