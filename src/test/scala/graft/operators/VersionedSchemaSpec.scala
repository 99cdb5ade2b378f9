package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Schema enforcement and evolution on the versioned table: new columns
  * are rejected by default and admitted with mergeSchema=true; old
  * files read the new column as null; snapshots keep their OWN schema
  * (time travel predates later columns); incoming frames may omit
  * columns; type changes always fail; stats pruning and the change feed
  * keep working across mixed-schema files. */
class VersionedSchemaSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-schema").toString + "/t"

  test("enforcement: a new column is rejected without mergeSchema") {
    val root = freshRoot()
    Versioned.commit(spark, root, Seq((1L, "a")).toDF("id", "tag"))
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(spark, root,
        Seq((2L, "b", 9.9)).toDF("id", "tag", "score"))
    }
    assert(e.getMessage.contains("mergeSchema"))
    assert(Versioned.read(spark, root).columns.toSeq === Seq("id", "tag"))
  }

  test("evolution: mergeSchema adds the column; old rows read null") {
    val root = freshRoot()
    Versioned.commit(spark, root, Seq((1L, "a")).toDF("id", "tag"),
      statsCols = Seq("id"))
    Versioned.commit(spark, root,
      Seq((2L, "b", 9.9)).toDF("id", "tag", "score"),
      statsCols = Seq("id"), mergeSchema = true)
    val snap = Versioned.read(spark, root)
    assert(snap.columns.toSeq === Seq("id", "tag", "score"))
    assert(snap.as[(Long, String, Option[Double])].collect().sorted.toSeq ===
      Seq((1L, "a", None), (2L, "b", Some(9.9))))
    // time travel: version 1 does NOT have the later column
    assert(Versioned.readVersion(spark, root, 1).columns.toSeq ===
      Seq("id", "tag"))
    // stats-pruned reads carry the evolved schema too
    val pruned = Versioned.readPruned(spark, root, "id", 1, 1)
    assert(pruned.columns.toSeq === Seq("id", "tag", "score"))
    assert(pruned.as[(Long, String, Option[Double])].head() ===
      ((1L, "a", None)))
  }

  test("incoming frames may omit existing columns (read as null)") {
    val root = freshRoot()
    Versioned.commit(spark, root, Seq((1L, "a")).toDF("id", "tag"))
    Versioned.commit(spark, root, Seq(Tuple1(2L)).toDF("id"))
    val snap = Versioned.read(spark, root)
    assert(snap.columns.toSeq === Seq("id", "tag"))
    assert(snap.as[(Long, Option[String])].collect().sorted.toSeq ===
      Seq((1L, Some("a")), (2L, None)))
  }

  test("type changes are always rejected; overwrite re-types") {
    val root = freshRoot()
    Versioned.commit(spark, root, Seq((1L, "a")).toDF("id", "tag"))
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(spark, root, Seq(("one", "b")).toDF("id", "tag"),
        mergeSchema = true)
    }
    assert(e.getMessage.contains("type change"))
    // overwrite replaces rows AND schema
    Versioned.commit(spark, root, Seq(("one", "b")).toDF("id", "tag"),
      mode = "overwrite")
    assert(Versioned.read(spark, root).as[(String, String)].head() ===
      (("one", "b")))
  }

  test("change feed and delete operate under the evolved schema") {
    val root = freshRoot()
    Versioned.commit(spark, root, Seq((1L, "a")).toDF("id", "tag"),
      statsCols = Seq("id"))
    Versioned.commit(spark, root,
      Seq((2L, "b", 9.9)).toDF("id", "tag", "score"),
      statsCols = Seq("id"), mergeSchema = true)
    val feed = Versioned.changesSince(spark, root, 0L)
    assert(feed.columns.toSeq === Seq("id", "tag", "score"))
    assert(feed.count() === 2)
    // delete touching only the pre-evolution file: result keeps the
    // evolved schema and the surviving row
    Versioned.delete(spark, root, col("id") === 1L, statsCols = Seq("id"))
    val snap = Versioned.read(spark, root)
    assert(snap.columns.toSeq === Seq("id", "tag", "score"))
    assert(snap.as[(Long, String, Option[Double])].collect().toSeq ===
      Seq((2L, "b", Some(9.9))))
  }
}
