package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Change feed + incremental table-to-table pipeline over the versioned
  * table: the feed must return exactly the appended rows per version
  * window, refuse (or knowingly skip) non-append commits, and the
  * incremental runner must be exactly-once under re-runs and replays —
  * the destination always equals the per-row transform of the full
  * source, no matter how the runs interleave with the appends. */
class VersionedCdfSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-cdf").toString + "/t"

  private def batch(ids: Range, tag: String) =
    ids.map(i => (i.toLong, tag, i * 1.5)).toDF("id", "tag", "score")

  test("changesSince returns exactly the rows each append introduced") {
    val root = freshRoot()
    Versioned.commit(spark, root, batch(1 to 100, "a"))
    Versioned.commit(spark, root, batch(101 to 150, "b"))
    Versioned.commit(spark, root, batch(151 to 160, "c"))
    assert(Versioned.changesSince(spark, root, 0L).count() === 160)
    val d12 = Versioned.changesSince(spark, root, 1L)
    assert(d12.count() === 60)
    assert(d12.select("tag").distinct().as[String].collect().toSet ===
      Set("b", "c"))
    val d23 = Versioned.changesSince(spark, root, 2L, Some(3L))
    assert(d23.agg(sum("id")).as[Long].head() ===
      (151 to 160).map(_.toLong).sum)
    // caught up → empty with the table's schema
    val none = Versioned.changesSince(spark, root, 3L)
    assert(none.count() === 0 && none.columns.toSeq ===
      Seq("id", "tag", "score"))
  }

  test("non-append commits fail the feed unless skipChangeCommits") {
    val root = freshRoot()
    Versioned.commit(spark, root, batch(1 to 100, "a"))
    Versioned.compact(spark, root, targetFiles = 1)
    Versioned.commit(spark, root, batch(101 to 120, "b"))
    val e = intercept[IllegalArgumentException] {
      Versioned.changesSince(spark, root, 1L)
    }
    assert(e.getMessage.contains("compact"))
    // skipping the compaction is lossless: only the append's rows flow
    val skipped = Versioned.changesSince(spark, root, 1L,
      skipChangeCommits = true)
    assert(skipped.select("tag").distinct().as[String].collect().toSeq ===
      Seq("b"))
    assert(skipped.count() === 20)
  }

  test("incremental runs land each source version exactly once") {
    val (src, dst) = (freshRoot(), freshRoot())
    val xform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.filter(col("id") % 2 === 0)
        .select(col("id"), upper(col("tag")).as("tag"))

    Versioned.commit(spark, src, batch(1 to 100, "a"))
    assert(Versioned.incrementalRun(spark, src, dst, "p1", xform) ===
      Some(1L))
    // caught up → no-op, no new destination version
    assert(Versioned.incrementalRun(spark, src, dst, "p1", xform) === None)
    assert(Versioned.latestVersion(dst) === Some(1L))

    // two more source appends, ONE run consumes both versions
    Versioned.commit(spark, src, batch(101 to 150, "b"))
    Versioned.commit(spark, src, batch(151 to 160, "c"))
    assert(Versioned.incrementalRun(spark, src, dst, "p1", xform) ===
      Some(3L))

    // destination ≡ per-row transform of the FULL source
    val expect = xform(Versioned.read(spark, src))
      .as[(Long, String)].collect().sorted.toSeq
    val got = Versioned.read(spark, dst)
      .as[(Long, String)].collect().sorted.toSeq
    assert(got === expect)

    // crash-replay: a zombie re-commit of an already-consumed window is
    // recognized by the manifest txn guard and dropped
    assert(!Versioned.commitIfNew(spark, dst,
      xform(Versioned.changesSince(spark, src, 1L, Some(3L))),
      "p1", batchId = 3L))
    assert(Versioned.read(spark, dst)
      .as[(Long, String)].collect().sorted.toSeq === expect)

    // an independent pipeline id has its own watermark
    assert(Versioned.incrementalRun(spark, src, dst, "p2",
      df => df.filter(col("tag") === "c").select(col("id"),
        col("tag"))) === Some(3L))
    assert(Versioned.read(spark, dst).count() === expect.size + 10)
  }
}
