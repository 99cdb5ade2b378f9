package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The versioned table must give exact time travel, atomic optimistic
  * commits (one winner per version), stats-pruned reads that stay
  * row-exact, compaction that preserves rows AND history, and a vacuum
  * that deletes only unreferenced files. */
class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-versioned").toString + "/t"

  private def batch(ids: Range, tag: String) =
    ids.map(i => (i.toLong, tag, i * 1.5)).toDF("id", "tag", "score")

  test("append commits build versions; time travel reproduces snapshots") {
    val root = freshRoot()
    assert(Versioned.versions(root).isEmpty)
    val v1 = Versioned.commit(spark, root, batch(1 to 100, "a"))
    val v2 = Versioned.commit(spark, root, batch(101 to 150, "b"))
    val v3 = Versioned.commit(spark, root, batch(151 to 160, "c"))
    assert(Seq(v1, v2, v3) === Seq(1L, 2L, 3L))
    assert(Versioned.versions(root) === Seq(1L, 2L, 3L))
    assert(Versioned.read(spark, root).count() === 160)
    assert(Versioned.readVersion(spark, root, 1).count() === 100)
    assert(Versioned.readVersion(spark, root, 2)
      .select("tag").distinct().as[String].collect().toSet === Set("a", "b"))
    // snapshot 1 is EXACTLY batch 1, not "first 100 of current"
    assert(Versioned.readVersion(spark, root, 1)
      .agg(sum("id")).as[Long].head() === (1 to 100).map(_.toLong).sum)
  }

  test("overwrite replaces the live set; history stays readable") {
    val root = freshRoot()
    Versioned.commit(spark, root, batch(1 to 50, "old"))
    Versioned.commit(spark, root, batch(1 to 10, "new"), mode = "overwrite")
    assert(Versioned.read(spark, root).count() === 10)
    assert(Versioned.read(spark, root)
      .select("tag").distinct().as[String].head() === "new")
    assert(Versioned.readVersion(spark, root, 1).count() === 50)
  }

  test("optimistic concurrency: exactly one winner per version") {
    val root = freshRoot()
    Versioned.commit(spark, root, batch(1 to 10, "base"))
    // writer A read the table at v1 and commits
    Versioned.commit(spark, root, batch(11 to 20, "A"),
      expectedVersion = Some(1L))
    // writer B ALSO read at v1 — its compare-and-swap must fail
    val e = intercept[Versioned.VersionConflictException] {
      Versioned.commit(spark, root, batch(21 to 30, "B"),
        expectedVersion = Some(1L))
    }
    assert(e.getMessage.contains("version"))
    // B retries against the current snapshot and succeeds
    Versioned.commit(spark, root, batch(21 to 30, "B"))
    assert(Versioned.read(spark, root).count() === 30)
  }

  test("stats pruning skips non-overlapping files and stays row-exact") {
    val root = freshRoot()
    // three disjoint id ranges, one commit each, single-file batches
    Versioned.commit(spark, root, batch(1 to 1000, "a").coalesce(1),
      statsCols = Seq("id", "tag"))
    Versioned.commit(spark, root, batch(1001 to 2000, "b").coalesce(1),
      statsCols = Seq("id", "tag"))
    Versioned.commit(spark, root, batch(2001 to 3000, "c").coalesce(1),
      statsCols = Seq("id", "tag"))
    val v = Versioned.latestVersion(root).get
    val candidates = Versioned.candidateFiles(root, v, "id", 1200, 1300)
    assert(candidates.size === 1, s"expected 1 candidate file: $candidates")
    val pruned = Versioned.readPruned(spark, root, "id", 1200, 1300)
    val full = Versioned.read(spark, root)
      .filter(col("id") >= 1200 && col("id") <= 1300)
    assert(pruned.as[(Long, String, Double)].collect().sorted.toSeq ===
      full.as[(Long, String, Double)].collect().sorted.toSeq)
    // string stats prune too
    val tagHits = Versioned.candidateFiles(root, v, "tag", "b", "b")
    assert(tagHits.size === 1)
  }

  test("null-count stats prune IS NULL deletes to files that have nulls") {
    val root = freshRoot()
    // file 1: no nulls; file 2: some null tags; file 3: ALL-null tags
    // (an all-null file records NO min/max — null counts must cover it)
    Versioned.commit(spark, root, batch(1 to 100, "a").coalesce(1),
      statsCols = Seq("id", "tag"))
    Versioned.commit(spark, root,
      (101 to 200).map(i => (i.toLong,
        if (i % 2 == 0) null else "b", i * 1.5)).toDF("id", "tag", "score")
        .coalesce(1), statsCols = Seq("id", "tag"))
    Versioned.commit(spark, root,
      (201 to 210).map(i => (i.toLong, null.asInstanceOf[String], i * 1.5))
        .toDF("id", "tag", "score").coalesce(1), statsCols = Seq("id", "tag"))
    val noNullFile = Versioned.files(root, 1).head
    val v = Versioned.delete(spark, root, col("tag").isNull)
    assert(Versioned.files(root, v).contains(noNullFile),
      "a file with zero recorded nulls must carry by reference under " +
        "an IS NULL delete")
    val got = Versioned.read(spark, root)
    assert(got.count() === 150, "100 + 50 non-null survivors")
    assert(got.filter(col("tag").isNull).count() === 0)
    // IS NOT NULL cannot match the all-null file: a delete keeping
    // only null rows must not rewrite... (inverse check via count)
    assert(got.filter(col("id") > 200).count() === 0,
      "the all-null file's rows are gone")
  }

  test("compact shrinks the file count, keeps rows and history") {
    val root = freshRoot()
    (1 to 5).foreach(i =>
      Versioned.commit(spark, root,
        batch(i * 100 until (i + 1) * 100, s"b$i").repartition(4),
        statsCols = Seq("id")))
    val before = Versioned.read(spark, root)
    val beforeRows = before.as[(Long, String, Double)].collect().sorted.toSeq
    val cv = Versioned.compact(spark, root, targetFiles = 1,
      statsCols = Seq("id"))
    assert(cv === 6L)
    val after = Versioned.read(spark, root)
    assert(after.rdd.getNumPartitions <= 2)
    assert(after.as[(Long, String, Double)].collect().sorted.toSeq ===
      beforeRows)
    // pre-compaction version still time-travels
    assert(Versioned.readVersion(spark, root, 3).count() === 300)
  }

  test("copy-on-write merge rewrites only key-overlapping files") {
    val root = freshRoot()
    Versioned.commit(spark, root, batch(1 to 1000, "a").coalesce(1),
      statsCols = Seq("id"))
    Versioned.commit(spark, root, batch(1001 to 2000, "b").coalesce(1),
      statsCols = Seq("id"))
    Versioned.commit(spark, root, batch(2001 to 3000, "c").coalesce(1),
      statsCols = Seq("id"))
    val preMergeFiles = Versioned.candidateFiles(root, 3L, "id",
      Long.MinValue, Long.MaxValue).toSet
    // updates hit file 2's range (plus one brand-new key = pure insert)
    val updates = Seq((1500L, "UPDATED", -1.0), (9999L, "INSERTED", -2.0))
      .toDF("id", "tag", "score")
    val v = Versioned.mergeUpsert(spark, root, updates, "id",
      statsCols = Seq("id"))
    assert(v === 4L)
    val postFiles = Versioned.candidateFiles(root, 4L, "id",
      Long.MinValue, Long.MaxValue).toSet
    // files 1 and 3 carried BY REFERENCE: same relative paths survive
    val carried = preMergeFiles.intersect(postFiles)
    assert(carried.size === 2, s"expected 2 untouched files: $carried")
    // rows: update applied, insert present, everything else intact
    val after = Versioned.read(spark, root)
    assert(after.count() === 3001)
    assert(after.filter(col("id") === 1500).select("tag")
      .as[String].head() === "UPDATED")
    assert(after.filter(col("id") === 9999).count() === 1)
    assert(after.filter(col("tag") === "b").count() === 999)
    // time travel: the pre-merge snapshot is untouched
    assert(Versioned.readVersion(spark, root, 3)
      .filter(col("id") === 1500).select("tag").as[String].head() === "b")
    // idempotency: re-merging the same batch changes no row values
    Versioned.mergeUpsert(spark, root, updates, "id", statsCols = Seq("id"))
    val again = Versioned.read(spark, root)
    assert(again.count() === 3001)
    assert(again.filter(col("tag").isin("UPDATED", "INSERTED")).count() === 2)
    // CAS guard: merging against a stale snapshot version fails
    intercept[Versioned.VersionConflictException] {
      Versioned.mergeUpsert(spark, root, updates, "id",
        expectedVersion = Some(3L))
    }
  }

  test("copy-on-write delete rewrites only files the predicate may touch") {
    val root = freshRoot()
    Versioned.commit(spark, root, batch(1 to 1000, "a").coalesce(1),
      statsCols = Seq("id", "tag"))
    Versioned.commit(spark, root, batch(1001 to 2000, "b").coalesce(1),
      statsCols = Seq("id", "tag"))
    Versioned.commit(spark, root, batch(2001 to 3000, "c").coalesce(1),
      statsCols = Seq("id", "tag"))
    val before = Versioned.files(root, 3L).toSet
    // range predicate inside file 2 only
    val v = Versioned.delete(spark, root,
      col("id") >= 1200 && col("id") <= 1300, statsCols = Seq("id", "tag"))
    assert(v === 4L)
    val after = Versioned.files(root, 4L).toSet
    assert(before.intersect(after).size === 2,
      s"files 1 and 3 must carry by reference: ${before.intersect(after)}")
    val snap = Versioned.read(spark, root)
    assert(snap.count() === 3000 - 101)
    assert(snap.filter(col("id").between(1200, 1300)).count() === 0)
    // time travel: pre-delete snapshot intact
    assert(Versioned.readVersion(spark, root, 3).count() === 3000)
    // OR over two disjoint ranges touches two files, carries one
    val v2 = Versioned.delete(spark, root,
      (col("id") === 1L) || (col("id") === 2500L), statsCols = Seq("id"))
    assert(v2 === 5L)
    assert(Versioned.read(spark, root).count() === 3000 - 101 - 2)
    assert(after.intersect(Versioned.files(root, 5L).toSet).size === 1)
    // string-stats predicate: IN over tags prunes to the matching file
    val v3 = Versioned.delete(spark, root,
      col("tag").isin("c", "zzz") && col("id") > 2990L,
      statsCols = Seq("id", "tag"))
    assert(Versioned.read(spark, root)
      .filter(col("id") > 2990L).count() === 0)
    // provably-unmatchable predicate is a published no-op
    val versionsBefore = Versioned.versions(root)
    val same = Versioned.delete(spark, root, col("id") === 999999L)
    assert(same === v3 && Versioned.versions(root) === versionsBefore)
    // CAS guard
    intercept[Versioned.VersionConflictException] {
      Versioned.delete(spark, root, col("id") === 5L,
        expectedVersion = Some(1L))
    }
  }

  test("delete keeps NULL-predicate rows (SQL DELETE semantics)") {
    val root = freshRoot()
    val withNulls = Seq((Some(1L), "a"), (None, "n"), (Some(2L), "a"))
      .toDF("id", "tag")
    Versioned.commit(spark, root, withNulls, statsCols = Seq("id"))
    Versioned.delete(spark, root, col("id") === 1L)
    val rows = Versioned.read(spark, root)
      .select("tag").as[String].collect().sorted.toSeq
    assert(rows === Seq("a", "n"), "null-id row must survive the delete")
  }

  test("vacuum deletes only unreferenced files; retained versions intact") {
    val root = freshRoot()
    Versioned.commit(spark, root, batch(1 to 100, "a").coalesce(1))
    Versioned.commit(spark, root, batch(1 to 40, "b").coalesce(1),
      mode = "overwrite")
    Versioned.commit(spark, root, batch(41 to 60, "c").coalesce(1))
    // minAgeMs=0: the table is quiescent here; the default retention
    // exists to protect in-flight commits from a concurrent vacuum
    val deleted = Versioned.vacuum(root, keepVersions = 2, minAgeMs = 0L)
    assert(deleted === 1, "only batch-a's file is unreferenced by v2/v3")
    assert(Versioned.versions(root) === Seq(2L, 3L))
    assert(Versioned.read(spark, root).count() === 60)
    assert(Versioned.readVersion(spark, root, 2).count() === 40)
    intercept[IllegalArgumentException] {
      Versioned.readVersion(spark, root, 1)
    }
  }

  test("restore is zero-copy rollback; history describes the log") {
    val root = freshRoot()
    Versioned.commit(spark, root, batch(1 to 10, "a"), statsCols = Seq("id"))
    Versioned.commit(spark, root, batch(11 to 20, "a"), statsCols = Seq("id"))
    Versioned.delete(spark, root, col("id") <= 5, statsCols = Seq("id"))
    assert(Versioned.read(spark, root).count() === 15)
    val dataFilesBefore = {
      val d = new java.io.File(root, "data")
      d.listFiles().flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    }
    val v = Versioned.restore(root, 2) // back to pre-delete
    assert(v === 4L)
    assert(Versioned.read(spark, root).as[(Long, String, Double)]
      .collect().toSet ===
      batch(1 to 20, "a").as[(Long, String, Double)].collect().toSet)
    // zero-copy: not one new data file was written for the rollback
    val dataFilesAfter = {
      val d = new java.io.File(root, "data")
      d.listFiles().flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    }
    assert(dataFilesAfter === dataFilesBefore)
    // the rolled-back state stays time-travelable
    assert(Versioned.readVersion(spark, root, 3).count() === 15)

    val h = Versioned.history(spark, root)
      .select("version", "action", "num_rows")
      .as[(Long, String, Long)].collect().toSeq
    assert(h === Seq((1L, "append", 10L), (2L, "append", 20L),
      (3L, "delete", 15L), (4L, "restore", 20L)))

    // and vacuum keeps the restored head's files
    Versioned.vacuum(root, keepVersions = 1, minAgeMs = 0L)
    assert(Versioned.read(spark, root).count() === 20)
  }
}
