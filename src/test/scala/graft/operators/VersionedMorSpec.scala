package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Merge-on-read deletes: the commit is metadata-only (zero data files
  * written), reads exclude exactly the predicate's rows with SQL
  * DELETE null semantics, later appends are never retro-deleted,
  * compact materializes and clears, copy-on-write verbs refuse while
  * pending, the change feed replays the delete lazily and identically
  * to the copy-on-write form, and restore/pruned/source reads all
  * respect pending deletes. */
class VersionedMorSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-mor").toString + "/t"

  private def dataFiles(root: String): Int = {
    val d = new java.io.File(root, "data")
    if (!d.isDirectory) 0
    else d.listFiles().flatMap(_.listFiles())
      .count(_.getName.endsWith(".parquet"))
  }

  test("metadata-only delete: zero files written, rows excluded, nulls kept") {
    val root = freshRoot()
    Versioned.commit(spark, root,
      Seq((1L, "a"), (7L, "a"), (14L, "a")).toDF("id", "tag")
        .union(Seq((null.asInstanceOf[java.lang.Long], "n")).toDF("id", "tag")
          .as[(Option[Long], String)].toDF("id", "tag")),
      statsCols = Seq("id"))
    val before = dataFiles(root)
    val v = Versioned.deleteDeferred(spark, root, col("id") % 7 === 0)
    assert(v === 2L)
    assert(dataFiles(root) === before, "merge-on-read delete wrote data")
    val got = Versioned.read(spark, root).select("id", "tag")
      .as[(Option[Long], String)].collect().toSet
    // 7 and 14 deleted; null-id row KEPT (SQL DELETE semantics)
    assert(got === Set((Some(1L), "a"), (None, "n")))
    // time travel to v1 still shows everything
    assert(Versioned.readVersion(spark, root, 1).count() === 4)
    // provable no-op: on a fully stats-covered table, a predicate no
    // file can match publishes no new version (the null-id file above
    // has no id stats, so THERE the engine must conservatively keep it)
    val root2 = freshRoot()
    Versioned.commit(spark, root2, Seq((1L, "a")).toDF("id", "tag"),
      statsCols = Seq("id"))
    assert(Versioned.deleteDeferred(spark, root2, col("id") > 1000L) === 1L)
  }

  test("appends after a pending delete are never retro-deleted") {
    val root = freshRoot()
    Versioned.commit(spark, root, Seq((7L, "old")).toDF("id", "tag"),
      statsCols = Seq("id"))
    Versioned.deleteDeferred(spark, root, col("id") === 7L)
    // a NEW row with the same key appends after the delete: it lives
    Versioned.commit(spark, root, Seq((7L, "new")).toDF("id", "tag"),
      statsCols = Seq("id"))
    assert(Versioned.read(spark, root).as[(Long, String)].collect().toSet ===
      Set((7L, "new")))
    // and the pending delete carried across the append commit
    val pending = Versioned.history(spark, root)
      .filter(col("version") === 3).select("num_pending_deletes")
      .as[Long].head()
    assert(pending === 1L)
  }

  test("compact materializes; copy-on-write verbs refuse while pending") {
    val root = freshRoot()
    Versioned.commit(spark, root,
      (1 to 10).map(i => (i.toLong, "a")).toDF("id", "tag"),
      statsCols = Seq("id"))
    Versioned.deleteDeferred(spark, root, col("id") <= 3L)
    val m1 = intercept[IllegalArgumentException] {
      Versioned.mergeUpsert(spark, root, Seq((5L, "b")).toDF("id", "tag"), "id")
    }
    assert(m1.getMessage.contains("pending"))
    val m2 = intercept[IllegalArgumentException] {
      Versioned.delete(spark, root, col("id") === 5L)
    }
    assert(m2.getMessage.contains("pending"))
    Versioned.compact(spark, root, targetFiles = 1, statsCols = Seq("id"))
    assert(Versioned.read(spark, root).count() === 7)
    assert(Versioned.history(spark, root).filter(col("version") === 3)
      .select("num_pending_deletes").as[Long].head() === 0L)
    // materialized: copy-on-write works again
    Versioned.mergeUpsert(spark, root, Seq((5L, "b")).toDF("id", "tag"), "id",
      statsCols = Seq("id"))
    assert(Versioned.read(spark, root).filter(col("id") === 5L)
      .select("tag").as[String].head() === "b")
  }

  test("change feed replays the delete lazily, identical to copy-on-write") {
    def build(root: String, mor: Boolean): Unit = {
      Versioned.commit(spark, root,
        (1 to 10).map(i => (i.toLong, s"r$i")).toDF("id", "tag"),
        statsCols = Seq("id"))
      if (mor) Versioned.deleteDeferred(spark, root, col("id") % 3 === 0)
      else Versioned.delete(spark, root, col("id") % 3 === 0,
        statsCols = Seq("id"), cdf = true)
    }
    val a = freshRoot(); build(a, mor = true)
    val b = freshRoot(); build(b, mor = false)
    def feed(root: String) = Versioned.changeFeed(spark, root, 0L)
      .select("_commit_version", "_change_type", "id", "tag")
      .as[(Long, String, Long, String)].collect().toSet
    assert(feed(a) === feed(b), "lazy MOR envelopes diverge from CoW")
    assert(feed(a).count(_._2 == "delete") === 3)
  }

  test("optimize packs only small files and folds in their pending deletes") {
    val root = freshRoot()
    // one "big" file (1000 rows) + two tiny ones
    Versioned.commit(spark, root,
      (1L to 1000L).map(i => (i, s"r$i")).toDF("id", "tag").coalesce(1),
      statsCols = Seq("id"))
    Versioned.commit(spark, root,
      Seq((2001L, "s"), (2002L, "s")).toDF("id", "tag").coalesce(1),
      statsCols = Seq("id"))
    Versioned.commit(spark, root,
      Seq((2005L, "s")).toDF("id", "tag").coalesce(1),
      statsCols = Seq("id"))
    // stats scope: one pred only touches the big file, one only small
    Versioned.deleteDeferred(spark, root, col("id") === 5L)
    Versioned.deleteDeferred(spark, root, col("id") === 2005L)
    val files3 = Versioned.files(root, 3)
    val bigPath = files3.head // v1's single file listed first
    val bigBytes = new java.io.File(root, bigPath).length()
    // threshold at the big file's size: big carried, tiny ones packed
    val v = Versioned.optimize(spark, root, targetBytes = bigBytes,
      statsCols = Seq("id"))
    val after = Versioned.files(root, v)
    assert(after.contains(bigPath), "big file was rewritten, not carried")
    assert(after.size === 2, s"expected big + one packed file: $after")
    // the small-file pred materialized; the big-file pred stays pending
    assert(Versioned.history(spark, root).filter(col("version") === v)
      .select("num_pending_deletes").as[Long].head() === 1L)
    // and rows are exactly the MOR-filtered set: 1000 - {5} + 3 - {2005}
    assert(Versioned.read(spark, root).count() === 1001L)
    assert(Versioned.read(spark, root)
      .filter(col("id").isin(5L, 2005L)).count() === 0L)
    // optimizing again with nothing to pack is a no-op version-wise
    assert(Versioned.optimize(spark, root, targetBytes = 1L) === v)
  }

  test("pruned, source, and restored reads respect pending deletes") {
    val root = freshRoot()
    Seq(1L to 10L, 11L to 20L).foreach { r =>
      Versioned.commit(spark, root,
        r.map(i => (i, s"r$i")).toDF("id", "tag").coalesce(1),
        statsCols = Seq("id"))
    }
    Versioned.deleteDeferred(spark, root, col("id") === 15L)
    // stats-scoped: only the second file carries the predicate
    assert(Versioned.readPruned(spark, root, "id", 11L, 20L)
      .count() === 9)
    assert(Versioned.readPruned(spark, root, "id", 1L, 10L)
      .count() === 10)
    val viaSource = spark.read.format(graft.sources.VersionedSource.Name)
      .option("path", root).load()
    assert(viaSource.count() === 19)
    assert(viaSource.filter(col("id") === 15L).count() === 0)
    // restore to the pending-delete version carries the pending delete
    Versioned.commit(spark, root, Seq((100L, "x")).toDF("id", "tag"),
      statsCols = Seq("id"))
    Versioned.restore(root, 3)
    assert(Versioned.read(spark, root).count() === 19)
  }
}
