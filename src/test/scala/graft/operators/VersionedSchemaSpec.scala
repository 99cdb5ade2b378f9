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

  test("merge enforces the table schema even when no file is touched") {
    val root = freshRoot()
    Versioned.commit(spark, root, Seq((1L, "a")).toDF("id", "tag"),
      statsCols = Seq("id"))
    // new column in updates → rejected, same as commit enforcement
    val e1 = intercept[IllegalArgumentException] {
      Versioned.mergeUpsert(spark, root,
        Seq((2L, "b", 1.0)).toDF("id", "tag", "w"), "id",
        statsCols = Seq("id"))
    }
    assert(e1.getMessage.contains("schema enforcement"))
    // type change → rejected
    val e2 = intercept[IllegalArgumentException] {
      Versioned.mergeUpsert(spark, root, Seq((2L, 5L)).toDF("id", "tag"),
        "id", statsCols = Seq("id"))
    }
    assert(e2.getMessage.contains("type change"))
    // pure-insert merge (keys outside every file's stats) keeps the
    // TABLE schema — the regression: it used to publish updates' schema
    Versioned.mergeUpsert(spark, root, Seq((100L, "z")).toDF("id", "tag"),
      "id", statsCols = Seq("id"))
    assert(Versioned.read(spark, root).columns.toSeq === Seq("id", "tag"))
    assert(Versioned.read(spark, root).count() === 2)
    // updates may omit columns: they null-fill (with cdf on, whose
    // envelope union used to crash on ragged schemas)
    Versioned.mergeUpsert(spark, root, Seq(Tuple1(1L)).toDF("id"), "id",
      statsCols = Seq("id"), cdf = true)
    val row1 = Versioned.read(spark, root).filter(col("id") === 1L)
      .as[(Long, Option[String])].head()
    assert(row1 === ((1L, None)))
    val env = Versioned.changeFeed(spark, root, 2L)
      .select("_change_type").as[String].collect().sorted
    assert(env.toSeq === Seq("update_postimage", "update_preimage"))
  }

  test("an empty change-feed window keeps the window's pinned schema") {
    val root = freshRoot()
    Versioned.commit(spark, root, Seq((1L, "a")).toDF("id", "tag"),
      statsCols = Seq("id"))
    Versioned.commit(spark, root,
      Seq((2L, "b", 9.9)).toDF("id", "tag", "score"),
      statsCols = Seq("id"), mergeSchema = true)
    // window (1, 1] is empty and pinned BEFORE the evolution: its
    // schema must be version 1's, not the newest manifest's
    val empty = Versioned.changeFeed(spark, root, 1L, Some(1L))
    assert(empty.count() === 0L)
    assert(empty.columns.toSeq ===
      Seq("id", "tag", "_change_type", "_commit_version"))
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
