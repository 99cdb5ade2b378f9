package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The put-if-absent contract both commit backends must satisfy, plus
  * the DETERMINISTIC race the conditional-put mock exists for: a
  * competing publish injected INSIDE the store's critical window must
  * make the enclosing commit lose its CAS cleanly (and the OCC retry
  * then land it at the next version) — the exact interleaving an
  * S3-class backend resolves with a conditional write, exercised
  * without threads or luck. */
class CommitCoordinatorSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-coord-$tag").toString + "/t"

  private def withCoordinator[T](c: CommitCoordinator)(body: => T): T = {
    val prev = Versioned.coordinator
    Versioned.coordinator = c
    try body finally Versioned.coordinator = prev
  }

  test("both backends: exactly one of two raw puts wins, loser mutates nothing") {
    for (c <- Seq[CommitCoordinator](PosixLinkCoordinator,
        new ConditionalPutCoordinator())) {
      val dir = Files.createTempDirectory("graft-put").toFile
      val target = new java.io.File(dir, "v1.json")
      assert(c.putIfAbsent(target, "winner"))
      assert(!c.putIfAbsent(target, "loser"),
        s"${c.getClass.getSimpleName}: second put must lose")
      assert(Files.readString(target.toPath) === "winner",
        s"${c.getClass.getSimpleName}: loser must not clobber the winner")
      // no temp litter left behind
      assert(dir.listFiles().map(_.getName).toSeq === Seq("v1.json"))
    }
  }

  test("injected race inside the conditional-put window: CAS loses cleanly") {
    val root = freshRoot("race")
    // seed under the default coordinator
    Versioned.commit(spark, root, Seq((0L, "seed")).toDF("id", "tag"),
      statsCols = Seq("id"))
    // the hook fires INSIDE the critical window of the NEXT publish and
    // lands a competing manifest first (reentrant on the same thread);
    // one-shot so the inner publish and the retry proceed normally
    var armed = true
    val coord = new ConditionalPutCoordinator(raceHook = { _ =>
      if (armed) {
        armed = false
        Versioned.commit(spark, root,
          Seq((100L, "sniper")).toDF("id", "tag"), statsCols = Seq("id"))
      }
    })
    withCoordinator(coord) {
      // fail-fast form: the pinned commit must observe the injected
      // winner and surface a clean conflict, nothing half-published
      val e = intercept[Versioned.VersionConflictException] {
        Versioned.commit(spark, root,
          Seq((1L, "pinned")).toDF("id", "tag"),
          statsCols = Seq("id"), expectedVersion = Some(1L))
      }
      assert(e.getMessage.contains("concurrent writer"))
      assert(Versioned.read(spark, root).count() === 2) // seed + sniper
      // retry form: an unpinned commit rides the OCC loop — loses the
      // injected race once, then lands at the NEXT version
      armed = true
      val v = Versioned.commit(spark, root,
        Seq((2L, "retried")).toDF("id", "tag"), statsCols = Seq("id"))
      assert(v === 4L, "loser must land AFTER the second sniper")
      assert(Versioned.versions(root) === (1L to 4L), "versions stay dense")
      val tags = Versioned.read(spark, root)
        .select("tag").as[String].collect().toSet
      assert(tags === Set("seed", "sniper", "retried"))
    }
  }

  test("a canonicalizing compact racing an append invalidates the " +
      "staged batch (column mapping)") {
    val root = freshRoot("mapr")
    Versioned.commit(spark, root, Seq((1L, 10.0)).toDF("id", "score"),
      statsCols = Seq("id"))
    // v2: rename → active mapping {points → score}; appends now stage
    // their parquet under the PHYSICAL name "score"
    Versioned.renameColumn(spark, root, "score", "points")
    // the sniper is a COMPACT: it rewrites the rows under logical
    // names and clears the mapping. If the appender's retry reused its
    // staged batch (written physical "score"), the new manifest
    // (mapping empty) would read that file's points as NULL — silent
    // data loss. The staged-batch key includes the mapping precisely
    // to force the rewrite.
    var armed = true
    val coord = new ConditionalPutCoordinator(raceHook = { _ =>
      if (armed) { armed = false; Versioned.compact(spark, root) }
    })
    withCoordinator(coord) {
      val v = Versioned.commit(spark, root,
        Seq((2L, 20.0)).toDF("id", "points"), statsCols = Seq("id"))
      assert(v === 4L, "append must land AFTER the sniping compact")
    }
    val got = Versioned.read(spark, root)
    assert(got.filter(col("points").isNull).count() === 0,
      "a stale staged batch would surface the appended row as NULL")
    assert(got.orderBy("id").select("points").as[Double].collect().toSeq
      === Seq(10.0, 20.0))
  }

  test("crash between data staging and CAS, both backends: nothing " +
      "counts as a commit, retry is clean, vacuum sweeps the orphans") {
    for (inner <- Seq[CommitCoordinator](PosixLinkCoordinator,
        new ConditionalPutCoordinator())) {
      val root = freshRoot("crash")
      withCoordinator(inner) {
        Versioned.commit(spark, root, Seq((1L, "a")).toDF("id", "tag"),
          statsCols = Seq("id"))
      }
      // deterministic kill in the exact window: the data batch is
      // fully staged (writeBatch ran), the manifest CAS has not
      def countData = {
        val d = new java.io.File(root, "data")
        if (!d.isDirectory) 0
        else d.listFiles().flatMap(f =>
          if (f.isDirectory) f.listFiles() else Array(f))
          .count(_.getName.endsWith(".parquet"))
      }
      val staged = countData
      var armed = true
      val killer = new CommitCoordinator {
        override def putIfAbsent(t: java.io.File, c: String): Boolean =
          if (armed) { armed = false
            throw new RuntimeException("injected crash before CAS")
          } else inner.putIfAbsent(t, c)
      }
      withCoordinator(killer) {
        intercept[RuntimeException] {
          Versioned.commit(spark, root, Seq((2L, "b")).toDF("id", "tag"),
            statsCols = Seq("id"))
        }
        // the crashed attempt left staged files but NO commit
        assert(Versioned.versions(root) === Seq(1L),
          s"${inner.getClass.getSimpleName}: a crashed attempt must " +
            "never count as a commit")
        assert(countData > staged, "the crash window must leave " +
          "staged data to prove the sweep below does something")
        assert(Versioned.read(spark, root).count() === 1)
        // retry publishes cleanly, exactly once
        Versioned.commit(spark, root, Seq((2L, "b")).toDF("id", "tag"),
          statsCols = Seq("id"))
      }
      assert(Versioned.read(spark, root).orderBy("id")
        .select("id").as[Long].collect().toSeq === Seq(1L, 2L))
      // the coordinator's OWN crash window (temp staged, link/move
      // not reached) leaves a hidden tmp beside the manifests
      val logDir = new java.io.File(root, "_graft_log")
      Files.write(new java.io.File(logDir,
        ".v000000000003-crashed.tmp").toPath, "junk".getBytes("UTF-8"))
      assert(Versioned.versions(root) === Seq(1L, 2L),
        "a tmp sibling must never be parsed as a version")
      // vacuum's age sweep collects BOTH orphan classes; live state
      // and manifests survive
      val before = countData
      Versioned.vacuum(root, keepVersions = 10, minAgeMs = 0L)
      assert(countData < before, "orphaned staged files must age out")
      assert(!logDir.listFiles().exists(_.getName.endsWith(".tmp")),
        "orphaned coordinator temps must age out")
      assert(Versioned.versions(root) === Seq(1L, 2L))
      assert(Versioned.read(spark, root).count() === 2)
    }
  }

  test("injected race on the multi-table pin: transact retries to a sane set") {
    val (a, coord) = (freshRoot("mta"), freshRoot("mtc"))
    Versioned.commit(spark, a, Seq((1L, "x")).toDF("id", "tag"))
    var armed = true
    val cp = new ConditionalPutCoordinator(raceHook = { f =>
      // only snipe the COORDINATOR pin publish, once
      if (armed && f.getName.startsWith("p")) {
        armed = false
        MultiTable.publish(coord, Seq("other" -> 7L))
      }
    })
    withCoordinator(cp) {
      MultiTable.transact(coord) { _ => Seq(a -> 1L) }
      // both the sniped pin and the retried transaction are visible,
      // merged in coordinator-log order
      assert(MultiTable.pins(coord) === Map("other" -> 7L, a -> 1L))
      assert(MultiTable.versions(coord) === Seq(1L, 2L))
    }
  }
}
