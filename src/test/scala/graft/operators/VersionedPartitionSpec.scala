package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partitioned versioned tables: hive-layout writes whose partition
  * columns stay IN the data files, per-file single-tuple invariant
  * recorded as min==max stats (partition pruning IS stats pruning),
  * and dynamic partition overwrite that replaces exactly the touched
  * partitions — carrying everything else by reference. */
class VersionedPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-vpart").toString + "/t"

  private def days(d: Int*) =
    d.flatMap(day => (1 to 10).map(i =>
      (day.toLong * 100 + i, s"d$day", s"2024-01-0$day")))
      .toDF("id", "tag", "day")

  test("partitioned commit: per-partition files, exact read-back") {
    val root = freshRoot()
    Versioned.commit(spark, root, days(1, 2, 3),
      statsCols = Seq("id"), partitionBy = Seq("day"))
    val back = Versioned.read(spark, root)
    // partition columns live in the data: full schema, exact rows
    assert(back.columns.toSeq === Seq("id", "tag", "day"))
    assert(back.count() === 30)
    assert(back.as[(Long, String, String)].collect().sortBy(_._1).toSeq
      === days(1, 2, 3).as[(Long, String, String)].collect()
        .sortBy(_._1).toSeq)
    // every live file holds exactly one day (min==max stats)
    val parts = Versioned.partitions(spark, root)
      .orderBy("day").collect()
    assert(parts.map(_.getString(0)).toSeq ===
      Seq("2024-01-01", "2024-01-02", "2024-01-03"))
    assert(parts.map(_.getLong(2)).sum === 30) // num_rows rollup
  }

  test("partition pruning is stats pruning: one day, one partition") {
    val root = freshRoot()
    Versioned.commit(spark, root, days(1, 2, 3),
      statsCols = Seq("id"), partitionBy = Seq("day"))
    val v = Versioned.latestVersion(root).get
    val all = Versioned.files(root, v)
    val hit = Versioned.candidateFiles(root, v, "day",
      "2024-01-02", "2024-01-02")
    assert(hit.nonEmpty && hit.size < all.size)
    val rows = Versioned.readVersionFiles(spark, root, v, hit)
      .filter($"day" === "2024-01-02")
    assert(rows.count() === 10)
  }

  test("overwritePartitions replaces exactly the touched partitions") {
    val root = freshRoot()
    Versioned.commit(spark, root, days(1, 2, 3),
      statsCols = Seq("id"), partitionBy = Seq("day"))
    val v1 = Versioned.latestVersion(root).get
    // re-run day 2 with DIFFERENT rows (a backfill)
    val day2 = (1 to 4).map(i => (9000L + i, "redo", "2024-01-02"))
      .toDF("id", "tag", "day")
    val v2 = Versioned.overwritePartitions(spark, root, day2,
      statsCols = Seq("id"))
    assert(v2 === v1 + 1)
    val t = Versioned.read(spark, root)
    assert(t.count() === 24) // 10 + 4 + 10
    assert(t.filter($"day" === "2024-01-02").count() === 4)
    assert(t.filter($"day" === "2024-01-02" && $"tag" === "redo")
      .count() === 4)
    // untouched partitions carried BY REFERENCE: identical paths
    val before = Versioned.files(root, v1).toSet
    val after = Versioned.files(root, v2).toSet
    val carried = before.intersect(after)
    assert(carried.nonEmpty)
    // day-2 v1 files are gone from v2; none of v2's new files in v1
    assert(Versioned.candidateFiles(root, v1, "day",
      "2024-01-02", "2024-01-02").toSet.intersect(after).isEmpty)
    // time travel still shows the original day 2
    assert(Versioned.readVersion(spark, root, v1)
      .filter($"day" === "2024-01-02").count() === 10)
    // the old snapshot's partitions listing is versioned too
    assert(Versioned.partitions(spark, root, Some(v1))
      .agg(sum("num_rows")).head().getLong(0) === 30)
  }

  test("appends inherit the layout; explicit mismatch is rejected") {
    val root = freshRoot()
    Versioned.commit(spark, root, days(1),
      statsCols = Seq("id"), partitionBy = Seq("day"))
    // plain append inherits: new files still per-partition
    Versioned.commit(spark, root, days(4), statsCols = Seq("id"))
    assert(Versioned.partitions(spark, root).count() === 2)
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(spark, root, days(5),
        statsCols = Seq("id"), partitionBy = Seq("tag"))
    }
    assert(e.getMessage.contains("cannot re-partition"))
    // overwrite MAY re-layout (rows and layout replaced together)
    Versioned.commit(spark, root, days(7), mode = "overwrite",
      statsCols = Seq("id"), partitionBy = Seq("tag"))
    assert(Versioned.partitions(spark, root).columns.head === "tag")
  }

  test("null partition values are rejected") {
    val root = freshRoot()
    val withNull = Seq((1L, "a", "2024-01-01"), (2L, "b", null))
      .toDF("id", "tag", "day")
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(spark, root, withNull,
        statsCols = Seq("id"), partitionBy = Seq("day"))
    }
    assert(e.getMessage.contains("non-null"))
  }

  test("merge and compact preserve the per-file tuple invariant") {
    val root = freshRoot()
    Versioned.commit(spark, root, days(1, 2),
      statsCols = Seq("id"), partitionBy = Seq("day"))
    Versioned.mergeUpsert(spark, root,
      Seq((101L, "upd", "2024-01-01")).toDF("id", "tag", "day"), "id",
      statsCols = Seq("id"))
    val v = Versioned.latestVersion(root).get
    // after the merge rewrite, a partition overwrite of day 2 must
    // still carry day 1's (rewritten) files by reference — which is
    // only possible if the merge kept files single-tuple
    val day2 = Seq((888L, "redo", "2024-01-02")).toDF("id", "tag", "day")
    val v2 = Versioned.overwritePartitions(spark, root, day2,
      statsCols = Seq("id"))
    val carried = Versioned.files(root, v).toSet
      .intersect(Versioned.files(root, v2).toSet)
    assert(carried.nonEmpty)
    val t = Versioned.read(spark, root)
    assert(t.filter($"day" === "2024-01-01").count() === 10)
    assert(t.filter($"tag" === "upd").count() === 1)
    assert(t.filter($"day" === "2024-01-02").count() === 1)
    // compact keeps layout: still one tuple per file afterwards
    Versioned.compact(spark, root, targetFiles = 1,
      statsCols = Seq("id"))
    assert(Versioned.partitions(spark, root).count() === 2)
    assert(Versioned.read(spark, root).count() === 11)
  }

  test("change feeds refuse a partition overwrite; skip skips it") {
    val root = freshRoot()
    Versioned.commit(spark, root, days(1, 2),
      statsCols = Seq("id"), partitionBy = Seq("day"))
    Versioned.overwritePartitions(spark, root,
      Seq((7L, "x", "2024-01-01")).toDF("id", "tag", "day"))
    val e = intercept[IllegalArgumentException] {
      Versioned.changesSince(spark, root, 1L).count()
    }
    assert(e.getMessage.contains("overwrite-partitions"))
    intercept[IllegalArgumentException] {
      Versioned.changeFeed(spark, root, 1L).count()
    }
    // skipChangeCommits: lossy skip, same contract as merge/delete
    assert(Versioned.changesSince(spark, root, 1L,
      skipChangeCommits = true).count() === 0)
  }

  test("vacuum reclaims replaced partition files under nested layout") {
    val root = freshRoot()
    Versioned.commit(spark, root, days(1, 2),
      statsCols = Seq("id"), partitionBy = Seq("day"))
    Versioned.overwritePartitions(spark, root,
      Seq((7L, "x", "2024-01-01")).toDF("id", "tag", "day"))
    val deleted = Versioned.vacuum(root, keepVersions = 1, minAgeMs = 0)
    assert(deleted > 0) // day 1's replaced file went, despite nesting
    assert(Versioned.read(spark, root).count() === 11)
    assert(Versioned.versions(root) === Seq(2L))
  }

  test("restore reinstates the restored version's layout") {
    val root = freshRoot()
    Versioned.commit(spark, root, days(1),
      statsCols = Seq("id"), partitionBy = Seq("day"))
    val v1 = Versioned.latestVersion(root).get
    Versioned.commit(spark, root, days(9), mode = "overwrite",
      statsCols = Seq("id"), partitionBy = Seq("tag"))
    val v3 = Versioned.restore(root, v1)
    assert(Versioned.partitions(spark, root, Some(v3))
      .columns.head === "day")
    assert(Versioned.read(spark, root).count() === 10)
  }
}
