package graft

import org.apache.spark.sql.functions._

/** Lifecycle tests for [[CacheScope]] — the cleanup hook for
  * operator-internal persists (dedup inverted index, CC labels, IVF
  * centroids), which otherwise accumulate in the session cache. */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  test("withScope releases every operator-internal cache at exit") {
    spark.catalog.clearCache()
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("i", "j")
    CacheScope.withScope {
      val cc = graft.operators.Dedup.connectedComponents(pairs)
      assert(cc.count() === 5)
      assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
        "CC's label cache should be live inside the scope")
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "scope exit must unpersist every registered frame")
  }

  test("scopes release frames from all dedup/similarity operators") {
    spark.catalog.clearCache()
    val docs = Seq((0L, "a b c d e f g"), (1L, "a b c d e f g"),
      (2L, "x y z w v u t")).toDF("doc_id", "text")
    CacheScope.withScope {
      graft.operators.Dedup
        .minhashLshPairs(docs, "doc_id", "text", 0.5).count()
      graft.operators.Dedup.simhashPairs(
        graft.operators.Dedup.simhash64(docs, "doc_id", "text"),
        "doc_id", shiftBits = 48, maxHamming = 3).count()
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("window operators and query internals release at scope exit") {
    spark.catalog.clearCache()
    val rows = (1 to 100).map(i => (i.toLong, (i % 7).toLong, i * 1.0))
      .toDF("id", "g", "v")
    CacheScope.withScope {
      // globalRank persists its bucketed frame; withGlobalShare its
      // group-grain input — both must register with the scope
      graft.operators.ScalableWindow.globalRank(rows,
        col("g"), Seq(col("v"), col("id")), "rank").count()
      graft.operators.ScalableWindow.withGlobalShare(
        rows.groupBy("g").agg(sum("v").as("t")), sum(col("t")), "share",
        (df, tot) => col("t") / tot).count()
      graft.operators.ScalableWindow.runningTotal(rows,
        "id", "v", col("g"), "rt", "delta").count()
      assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
        "operator caches should be live inside the scope")
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "scope exit must release the window operators' internals")
  }

  test("outside a scope the caller owns the lifecycle (plain persist)") {
    spark.catalog.clearCache()
    val df = CacheScope.persist(Seq(1, 2, 3).toDF("x"))
    df.count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    df.unpersist(false)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("nested scopes release only their own frames") {
    spark.catalog.clearCache()
    CacheScope.withScope {
      val outer = CacheScope.persist(Seq(1).toDF("x"))
      outer.count()
      CacheScope.withScope {
        val inner = CacheScope.persist(Seq(2).toDF("y"))
        inner.count()
      }
      // inner released, outer still cached
      assert(spark.sparkContext.getPersistentRDDs.size === 1)
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
