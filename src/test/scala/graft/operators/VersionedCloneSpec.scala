package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Shallow clone must reference the source snapshot zero-copy, evolve
  * independently under every write verb, never let the clone's vacuum
  * touch source data, and sever the source dependency on compact. */
class VersionedCloneSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(pfx: String): String =
    Files.createTempDirectory(pfx).toString + "/t"

  private def rows(ids: Range, tag: String) =
    ids.map(i => (i.toLong, tag)).toDF("id", "tag")

  private def dataFileCount(root: String): Int = {
    def walk(f: java.io.File): Int =
      if (!f.exists()) 0
      else if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(root, "data"))
  }

  test("clone reads the source snapshot without copying a byte; " +
      "writes diverge both ways") {
    val src = freshRoot("graft-clone-src")
    val dst = freshRoot("graft-clone-dst")
    Versioned.commit(spark, src, rows(1 to 100, "a").coalesce(1),
      statsCols = Seq("id"))
    Versioned.commit(spark, src, rows(101 to 200, "b").coalesce(1),
      statsCols = Seq("id"))
    Versioned.cloneShallow(spark, src, dst)
    assert(dataFileCount(dst) === 0, "shallow clone copies no data")
    assert(Versioned.read(spark, dst).count() === 200)
    // clone-side append: lands under the CLONE root, invisible to src
    Versioned.commit(spark, dst, rows(201 to 210, "clone-only").coalesce(1))
    assert(Versioned.read(spark, dst).count() === 210)
    assert(Versioned.read(spark, src).count() === 200)
    assert(dataFileCount(dst) === 1)
    // source-side append after the clone: invisible to the clone
    Versioned.commit(spark, src, rows(301 to 310, "src-only").coalesce(1))
    assert(Versioned.read(spark, dst).count() === 210)
  }

  test("clone of an older version is the time-travel branch point") {
    val src = freshRoot("graft-clone-src")
    val dst = freshRoot("graft-clone-dst")
    Versioned.commit(spark, src, rows(1 to 50, "v1").coalesce(1))
    Versioned.commit(spark, src, rows(51 to 100, "v2").coalesce(1))
    Versioned.cloneShallow(spark, src, dst, asOfVersion = Some(1L))
    assert(Versioned.read(spark, dst).count() === 50)
    assert(Versioned.read(spark, dst)
      .filter(col("tag") === "v2").count() === 0)
  }

  test("copy-on-write delete on the clone rewrites into the clone's " +
      "root and leaves the source intact") {
    val src = freshRoot("graft-clone-src")
    val dst = freshRoot("graft-clone-dst")
    Versioned.commit(spark, src, rows(1 to 100, "a").coalesce(1),
      statsCols = Seq("id"))
    Versioned.cloneShallow(spark, src, dst)
    Versioned.delete(spark, dst, col("id") <= 40)
    assert(Versioned.read(spark, dst).count() === 60)
    assert(Versioned.read(spark, src).count() === 100, "source untouched")
    assert(dataFileCount(dst) === 1,
      "the surviving rows re-land under the clone root")
    // deletion vectors work on cloned (foreign) files too
    val dst2 = freshRoot("graft-clone-dst2")
    Versioned.cloneShallow(spark, src, dst2)
    Versioned.deleteRows(spark, dst2, col("id") % 10 === 0)
    assert(Versioned.read(spark, dst2).count() === 90)
    assert(dataFileCount(dst2) === 0, "DV delete stays zero-copy")
    assert(Versioned.read(spark, src).count() === 100)
  }

  test("compact severs the source dependency; the clone's vacuum " +
      "never sweeps source files") {
    val src = freshRoot("graft-clone-src")
    val dst = freshRoot("graft-clone-dst")
    Versioned.commit(spark, src, rows(1 to 100, "a").coalesce(1))
    Versioned.cloneShallow(spark, src, dst)
    Versioned.commit(spark, dst, rows(101 to 110, "x").coalesce(1))
    val srcFilesBefore = dataFileCount(src)
    // vacuum on the clone: must not touch foreign (source) data even
    // though early clone manifests are dropped
    Versioned.compact(spark, dst)
    Versioned.vacuum(dst, keepVersions = 1, minAgeMs = 0)
    assert(dataFileCount(src) === srcFilesBefore,
      "clone vacuum must never delete source files")
    assert(Versioned.read(spark, dst).count() === 110)
    // severed: no manifest entry references the source root anymore
    val latest = Versioned.latestVersion(dst).get
    val srcAbs = new java.io.File(src).getAbsolutePath
    assert(!Versioned.files(dst, latest).exists(_.startsWith(srcAbs)),
      "compact must re-land every row under the clone's own root")
    // now even deleting the entire source leaves the clone whole
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(src))
    assert(Versioned.read(spark, dst).count() === 110)
  }

  test("clone refuses a non-empty destination") {
    val src = freshRoot("graft-clone-src")
    val dst = freshRoot("graft-clone-dst")
    Versioned.commit(spark, src, rows(1 to 10, "a").coalesce(1))
    Versioned.commit(spark, dst, rows(1 to 10, "b").coalesce(1))
    val e = intercept[IllegalArgumentException] {
      Versioned.cloneShallow(spark, src, dst)
    }
    assert(e.getMessage.contains("already has a manifest log"))
  }
}
