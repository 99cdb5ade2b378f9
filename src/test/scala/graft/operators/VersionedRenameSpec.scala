package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RENAME COLUMN via column mapping: one metadata commit at any table
  * size, values preserved across the rename (never null-filled, never
  * resurrected from the wrong column), stats pruning intact (stats are
  * keyed by the immutable physical name), DML works against the new
  * logical name, and OPTIMIZE canonicalizes the mapping away. */
class VersionedRenameSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-vren-$tag").toString + "/t"

  test("rename is metadata-only and preserves values; stats keep pruning") {
    val root = freshRoot("basic")
    // two files with disjoint id ranges so pruning is observable
    Versioned.commit(spark, root,
      (1 to 50).map(i => (i.toLong, i * 10.0)).toDF("id", "score")
        .coalesce(1), statsCols = Seq("id", "score"))
    Versioned.commit(spark, root,
      (100 to 150).map(i => (i.toLong, i * 10.0)).toDF("id", "score")
        .coalesce(1), statsCols = Seq("id", "score"))
    val filesBefore = Versioned.files(root, 2)
    Versioned.sql(spark,
      s"ALTER TABLE `$root` RENAME COLUMN score TO points")
    // zero data movement
    assert(Versioned.files(root, 3) === filesBefore)
    val got = Versioned.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "points"))
    // THE core guarantee: values survive the rename
    assert(got.agg(sum("points")).as[Double].head() ===
      (1 to 50).map(_ * 10.0).sum + (100 to 150).map(_ * 10.0).sum)
    // time travel shows the old logical name
    assert(Versioned.readVersion(spark, root, 2).columns.toSeq ===
      Seq("id", "score"))
    // stats recorded under the PHYSICAL name before the rename still
    // prune probes phrased in the new logical name
    val pruned = Versioned.candidateFiles(root, 3, "points", 100.0, 200.0)
    assert(pruned.size === 1,
      s"expected the rename to keep stats pruning, got $pruned")
  }

  test("writes after a rename store physically; DML and feed work") {
    val root = freshRoot("dml")
    Versioned.commit(spark, root,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "score"),
      statsCols = Seq("id"))
    Versioned.renameColumn(spark, root, "score", "points")
    // appends take the NEW logical name and land under the physical one
    Versioned.commit(spark, root, Seq((3L, 30.0)).toDF("id", "points"))
    assert(Versioned.read(spark, root).agg(sum("points"))
      .as[Double].head() === 60.0)
    // SQL UPDATE/DELETE against the renamed column (cdf so the feed
    // below can replay the row-level changes)
    Versioned.sql(spark,
      s"UPDATE `$root` SET points = points + 1.0 WHERE id = 1", cdf = true)
    Versioned.sql(spark, s"DELETE FROM `$root` WHERE points > 25.0",
      cdf = true)
    assert(Versioned.read(spark, root).orderBy("id")
      .select("points").as[Double].collect().toSeq === Seq(11.0, 20.0))
    // a feed window CROSSING the rename fails loudly (Delta blocks CDC
    // across column-mapping changes — mixed eras cannot share one
    // physical schema); each side of the change reads fine
    val ef = intercept[IllegalArgumentException] {
      Versioned.changeFeed(spark, root, 0).collect()
    }
    assert(ef.getMessage.contains("column-mapping change"))
    val pre = Versioned.changeFeed(spark, root, 0, untilVersion = Some(1))
    assert(pre.columns.contains("score"))
    assert(pre.filter(col("_change_type") === "insert").count() === 2)
    val post = Versioned.changeFeed(spark, root, 2)
    assert(post.columns.contains("points"))
    assert(post.filter(col("_change_type") === "insert").count() === 1)
    assert(post.filter(col("_change_type") === "update_postimage")
      .count() === 1)
  }

  test("physical-name collision gates; compact canonicalizes") {
    val root = freshRoot("gate")
    Versioned.commit(spark, root,
      Seq((1L, 10.0)).toDF("id", "score"), statsCols = Seq("id"))
    Versioned.renameColumn(spark, root, "score", "points")
    // adding a column named like the live physical name would make two
    // logical columns share one parquet column — rejected
    val e = intercept[IllegalArgumentException] {
      Versioned.sql(spark, s"ALTER TABLE `$root` ADD COLUMNS (score DOUBLE)")
    }
    assert(e.getMessage.contains("physical storage name"))
    // full rewrite re-lands rows under logical names and clears the
    // mapping — the name is free again, and null-fills (no stale 10.0)
    Versioned.compact(spark, root, targetFiles = 1)
    Versioned.sql(spark, s"ALTER TABLE `$root` ADD COLUMNS (score DOUBLE)")
    val got = Versioned.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "points", "score"))
    assert(got.filter(col("score").isNotNull).count() === 0)
    assert(got.agg(sum("points")).as[Double].head() === 10.0)
  }

  test("drop of a renamed column tombstones its PHYSICAL name") {
    val root = freshRoot("dropren")
    Versioned.commit(spark, root,
      Seq((1L, 10.0)).toDF("id", "score"), statsCols = Seq("id"))
    Versioned.renameColumn(spark, root, "score", "points")
    Versioned.dropColumns(spark, root, Seq("points"))
    assert(Versioned.read(spark, root).columns.toSeq === Seq("id"))
    // the files physically carry "score" — re-adding THAT name is the
    // resurrection hazard, not the dropped logical name
    val e = intercept[IllegalArgumentException] {
      Versioned.addColumns(spark, root, Seq(
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType)))
    }
    assert(e.getMessage.contains("predate the drop"))
    // the logical name is physically unused — safe immediately
    Versioned.addColumns(spark, root, Seq(
      org.apache.spark.sql.types.StructField("points",
        org.apache.spark.sql.types.DoubleType)))
    assert(Versioned.read(spark, root)
      .filter(col("points").isNotNull).count() === 0)
  }

  test("filters on a renamed column still reach the parquet scan") {
    val root = freshRoot("push")
    Versioned.commit(spark, root,
      (1 to 60).map(i => (i.toLong, i * 1.0)).toDF("id", "score")
        .repartitionByRange(3, col("id")), statsCols = Seq("id", "score"))
    Versioned.renameColumn(spark, root, "score", "points")
    // manifest-level: bounds phrased in the NEW logical name prune via
    // the PHYSICAL-keyed stats
    val pruned = Versioned.candidateFilesForBounds(root, 2,
      Seq(Versioned.ColumnBound("points", Some(25.0), Some(30.0))))
    assert(pruned.size === 1, s"expected 1 candidate, got $pruned")
    // parquet-level: a logical-name filter above the mapping's alias
    // projection must still push down to the PHYSICAL column in the
    // scan — the alias is transparent to Catalyst's pushdown
    val df = Versioned.read(spark, root)
      .filter(col("points") >= 25.0 && col("points") <= 30.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("score"),
      s"expected a physical-name pushed filter, got:\n${plan.take(800)}")
    assert(df.select("id").as[Long].collect().sorted === (25L to 30L).toArray)
    // end-to-end through the registered source
    val got = spark.read.format(graft.sources.VersionedSource.Name)
      .option("path", root).load()
      .filter(col("points") === 42.0)
    assert(got.select("id").as[Long].collect().toSeq === Seq(42L))
  }

  test("feed windows crossing a canonicalizing compact fail loudly") {
    val root = freshRoot("era")
    Versioned.commit(spark, root, Seq((1L, 10.0)).toDF("id", "score"),
      statsCols = Seq("id"))
    Versioned.renameColumn(spark, root, "score", "points")
    // this append's file physically stores "score" (the mapping era)
    Versioned.commit(spark, root, Seq((2L, 20.0)).toDF("id", "points"))
    // the compact rewrites live rows under "points" and CLEARS the
    // mapping — the v3 file's era mapping no longer matches the head
    Versioned.compact(spark, root, targetFiles = 1)
    // a window holding the v3 file but ending at the cleared mapping
    // would null-fill points if read naively — it must throw instead
    val e = intercept[IllegalArgumentException] {
      Versioned.changesSince(spark, root, 2, skipCompactions = true)
        .collect()
    }
    assert(e.getMessage.contains("column-mapping change"))
    // the mapping-stable sub-window replays the REAL values
    val sub = Versioned.changesSince(spark, root, 2,
      untilVersion = Some(3))
    assert(sub.select("points").as[Double].collect().toSeq === Seq(20.0))
  }

  test("rename back to the physical name retires the mapping") {
    val root = freshRoot("back")
    Versioned.commit(spark, root,
      Seq((1L, 10.0)).toDF("id", "score"), statsCols = Seq("id"))
    Versioned.renameColumn(spark, root, "score", "points")
    Versioned.renameColumn(spark, root, "points", "score")
    assert(Versioned.read(spark, root).columns.toSeq === Seq("id", "score"))
    assert(Versioned.read(spark, root).agg(sum("score"))
      .as[Double].head() === 10.0)
    // identity restored: ADD COLUMNS of an unrelated name still works
    // and a fresh logical rename starts a clean mapping
    Versioned.sql(spark, s"ALTER TABLE `$root` ADD COLUMNS (tag STRING)")
    assert(Versioned.read(spark, root).columns.toSeq ===
      Seq("id", "score", "tag"))
  }

  test("rename guards: partition, constraint, collision, missing") {
    val root = freshRoot("guards")
    Versioned.commit(spark, root,
      Seq((1L, "a", 5.0)).toDF("id", "part", "v"),
      partitionBy = Seq("part"))
    intercept[IllegalArgumentException] {
      Versioned.renameColumn(spark, root, "part", "region")
    }
    Versioned.addConstraint(spark, root, "pos", "v > 0")
    val ec = intercept[IllegalArgumentException] {
      Versioned.renameColumn(spark, root, "v", "value")
    }
    assert(ec.getMessage.contains("drop the constraint first"))
    intercept[IllegalArgumentException] {
      Versioned.renameColumn(spark, root, "v", "ID") // collides (ci)
    }
    intercept[IllegalArgumentException] {
      Versioned.renameColumn(spark, root, "nope", "x")
    }
  }

  test("restore and clone carry the mapping; mergeUpsert prunes on it") {
    val root = freshRoot("carry")
    Versioned.commit(spark, root,
      (1 to 40).map(i => (i.toLong, i * 1.0)).toDF("id", "score")
        .repartitionByRange(2, col("id")), statsCols = Seq("id"))
    Versioned.renameColumn(spark, root, "score", "points")
    // the keys-frame probe still stats-prunes under the mapping (the
    // translated lookup path candidateFilesForKeys takes), and the
    // upsert itself lands correctly
    val cand = Versioned.candidateFilesForKeys(spark, root, 2,
      Seq(1L).toDF("id"), Seq("id"))
    assert(cand.size === 1,
      s"expected the keyed probe to prune to one file, got $cand")
    Versioned.mergeUpsert(spark, root,
      Seq((1L, 99.0)).toDF("id", "points"), "id")
    assert(Versioned.read(spark, root).filter(col("id") === 1)
      .select("points").as[Double].head() === 99.0)
    // clone: shared files read through the carried mapping
    val dst = freshRoot("carryc")
    Versioned.cloneShallow(spark, root, dst)
    assert(Versioned.read(spark, dst).agg(sum("points")).as[Double].head()
      === (2 to 40).map(_ * 1.0).sum + 99.0)
    // restore to the pre-rename version reinstates the old name
    Versioned.restore(root, 1)
    assert(Versioned.read(spark, root).columns.toSeq === Seq("id", "score"))
  }
}
