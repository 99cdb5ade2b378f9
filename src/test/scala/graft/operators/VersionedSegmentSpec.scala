package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Segmented manifest log: commits must carry unchanged file-list
  * segments BY REFERENCE so metadata write-amplification is O(changed
  * files + segment count), never O(table files) — the property that
  * keeps a long-lived million-file table's commit cost flat. Reads,
  * time travel, restore, and vacuum must be byte-identical to the
  * inline-manifest behavior.
  */
class VersionedSegmentSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-vseg").toString + "/t"

  private def rows(ids: Range, tag: String) =
    ids.map(i => (i.toLong, tag)).toDF("id", "tag")

  private def manifestText(root: String, v: Long): String =
    Files.readString(
      new java.io.File(root, f"_graft_log/v$v%012d.json").toPath)

  private def segmentRefs(root: String, v: Long): Seq[String] =
    "seg-[0-9a-f-]+\\.json".r.findAllIn(manifestText(root, v)).toSeq

  private def segmentFiles(root: String): Seq[String] = {
    val d = new java.io.File(root, "_graft_log/segments")
    if (!d.isDirectory) Nil else d.listFiles().map(_.getName).toSeq
  }

  /** Run `body` with tiny segment thresholds so a handful of commits
    * exercises the rolling spill; always restores the defaults. */
  private def withTinySegments[T](body: => T): T = {
    val keys = Seq("graft.versioned.segmentSpill",
      "graft.versioned.segmentMaxEntries")
    val saved = keys.map(k => k -> sys.props.get(k))
    sys.props("graft.versioned.segmentSpill") = "4"
    sys.props("graft.versioned.segmentMaxEntries") = "8"
    try body
    finally saved.foreach {
      case (k, Some(v)) => sys.props(k) = v
      case (k, None) => sys.props.remove(k)
    }
  }

  test("appends spill to segments and carry them by reference; " +
      "manifest size stays flat while the table grows") {
    withTinySegments {
      val root = freshRoot()
      (1 to 14).foreach { i =>
        Versioned.commit(spark, root,
          rows(i * 100 until i * 100 + 10, s"b$i").coalesce(1),
          statsCols = Seq("id"))
      }
      // every row of every batch is live
      val got = Versioned.read(spark, root)
      assert(got.count() === 140)
      assert(got.select("tag").distinct().count() === 14)
      // the latest manifest references segments and inlines few entries
      val latest = Versioned.latestVersion(root).get
      assert(segmentRefs(root, latest).nonEmpty,
        "14 single-file appends past spill=4 must have spilled")
      val inlineEntries =
        "\"path\"".r.findAllIn(manifestText(root, latest)).size
      assert(inlineEntries <= 4,
        s"inline entries must stay under the spill threshold, got $inlineEntries")
      // consecutive manifests SHARE segment files (carry by reference):
      // the previous version references a subset of the same segments
      val shared = segmentRefs(root, latest)
        .intersect(segmentRefs(root, latest - 1))
      assert(shared.nonEmpty,
        "an append must carry the parent's untouched segments by reference")
      // commit metadata cost is flat: the newest manifest is not larger
      // than an early one by more than a segment-roll's worth
      val early = manifestText(root, 6).length
      val late = manifestText(root, latest).length
      assert(late <= early * 3,
        s"manifest bytes must not grow with table size ($early -> $late)")
      // time travel across the segmented history is exact
      assert(Versioned.readVersion(spark, root, 3).count() === 30)
      assert(Versioned.readVersion(spark, root, 10).count() === 100)
    }
  }

  test("a delete rewrites only the touched segment's metadata; " +
      "untouched segments carry") {
    withTinySegments {
      val root = freshRoot()
      (1 to 12).foreach { i =>
        // stats on `tag` so the delete below prunes to ONE candidate
        // file — without them every file is (correctly) a rewrite
        // candidate and no segment could carry
        Versioned.commit(spark, root,
          rows(i * 100 until i * 100 + 10, s"b$i").coalesce(1),
          statsCols = Seq("id", "tag"))
      }
      val before = Versioned.latestVersion(root).get
      val segsBefore = segmentRefs(root, before)
      // copy-on-write delete of one batch's rows: exactly one data file
      // is rewritten, so at most one segment loses an entry
      val v = Versioned.delete(spark, root, col("tag") === "b3")
      val got = Versioned.read(spark, root)
      assert(got.count() === 110)
      assert(got.filter(col("tag") === "b3").count() === 0)
      val carried = segmentRefs(root, v).intersect(segsBefore)
      assert(carried.nonEmpty,
        "segments not containing the deleted file must carry by reference")
      // pre-delete snapshot still resolves through its own segments
      assert(Versioned.readVersion(spark, root, before).count() === 120)
    }
  }

  test("restore re-references the restored version's segments " +
      "without rewriting them") {
    withTinySegments {
      val root = freshRoot()
      (1 to 10).foreach { i =>
        Versioned.commit(spark, root,
          rows(i * 100 until i * 100 + 10, s"b$i").coalesce(1))
      }
      val target = 6L
      val targetSegs = segmentRefs(root, target)
      assert(targetSegs.nonEmpty)
      val nSegFiles = segmentFiles(root).size
      val v = Versioned.restore(root, target)
      assert(segmentRefs(root, v).toSet === targetSegs.toSet,
        "restore must reference the restored segments, not re-spill")
      assert(segmentFiles(root).size === nSegFiles,
        "a metadata-only restore writes no new segment file")
      assert(Versioned.read(spark, root).count() === 60)
    }
  }

  test("vacuum keeps segments any retained manifest references and " +
      "sweeps orphans; reads survive") {
    withTinySegments {
      val root = freshRoot()
      (1 to 12).foreach { i =>
        Versioned.commit(spark, root,
          rows(i * 100 until i * 100 + 10, s"b$i").coalesce(1))
      }
      // overwrite: the previous segments become history-only
      Versioned.commit(spark, root, rows(0 until 10, "fresh").coalesce(1),
        mode = "overwrite")
      Versioned.commit(spark, root, rows(10 until 20, "fresh2").coalesce(1))
      assert(segmentFiles(root).nonEmpty)
      Versioned.vacuum(root, keepVersions = 2, minAgeMs = 0)
      val latest = Versioned.latestVersion(root).get
      val keptRefs = (segmentRefs(root, latest) ++
        segmentRefs(root, latest - 1)).map(_.split("/").last).toSet
      assert(segmentFiles(root).forall(keptRefs.contains),
        "only referenced segments survive vacuum")
      assert(Versioned.read(spark, root).count() === 20)
      assert(Versioned.readVersion(spark, root, latest - 1).count() === 10)
    }
  }

  test("8 concurrent appenders all land under OCC retry with segment " +
      "carry in play; the final state is a serial history") {
    withTinySegments {
      val root = freshRoot()
      // seed past the spill threshold so every contended commit runs
      // the carry logic (and losers orphan freshly written segments,
      // which vacuum's age sweep owns)
      (1 to 6).foreach { i =>
        Versioned.commit(spark, root,
          rows(i * 1000 until i * 1000 + 5, s"seed$i").coalesce(1))
      }
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val futs = (1 to 8).map { w =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long = Versioned.commit(spark, root,
              rows(w * 100 until w * 100 + 10, s"w$w").coalesce(1))
          })
        }
        val published = futs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
        assert(published.toSet.size === 8,
          "each retried writer must publish its own distinct version")
      } finally pool.shutdown()
      val got = Versioned.read(spark, root)
      assert(got.count() === 110, "6×5 seed rows + 8×10 writer rows")
      (1 to 8).foreach { w =>
        assert(got.filter(col("tag") === s"w$w").count() === 10,
          s"writer $w's batch must be fully present after OCC retries")
      }
      // serial history: versions are dense 1..14 and each append adds
      // exactly its own rows
      assert(Versioned.latestVersion(root).get === 14L)
      assert(Versioned.readVersion(spark, root, 6).count() === 30)
    }
  }

  test("default thresholds: small tables stay fully inline (no segment " +
      "files), and behavior is unchanged") {
    val root = freshRoot()
    (1 to 5).foreach { i =>
      Versioned.commit(spark, root,
        rows(i * 100 until i * 100 + 10, s"b$i").coalesce(1))
    }
    assert(segmentFiles(root).isEmpty,
      "5 files is under the default spill threshold — no segments")
    assert(Versioned.read(spark, root).count() === 50)
  }
}
