package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** ALTER COLUMN … TYPE widening: one metadata commit, old files read
  * back exactly under the wider type (the parquet reader up-converts
  * the narrower physical type — the property the whole feature rides
  * on), stats keep pruning, feeds replay across it, and everything
  * lossy is rejected loudly. */
class VersionedWidenSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-vwide-$tag").toString + "/t"

  test("widen int->long and float->double is metadata-only and exact") {
    val root = freshRoot("basic")
    Versioned.commit(spark, root,
      Seq((1, 1.5f), (2, 2.5f)).toDF("id", "w"), statsCols = Seq("id"))
    val filesBefore = Versioned.files(root, 1)
    Versioned.sql(spark, s"ALTER TABLE `$root` ALTER COLUMN id TYPE BIGINT")
    Versioned.sql(spark, s"ALTER TABLE `$root` ALTER COLUMN w TYPE DOUBLE")
    assert(Versioned.files(root, 3) === filesBefore, "zero data movement")
    val got = Versioned.read(spark, root).orderBy("id")
    assert(got.schema("id").dataType === LongType)
    assert(got.schema("w").dataType === DoubleType)
    // THE core guarantee: pre-widening rows read back exactly
    assert(got.as[(Long, Double)].collect().toSeq ===
      Seq((1L, 1.5), (2L, 2.5)))
    // time travel shows the old type
    assert(Versioned.readVersion(spark, root, 1)
      .schema("id").dataType === IntegerType)
    // appends carry the wide type natively; both eras read in ONE scan
    Versioned.commit(spark, root,
      Seq((3_000_000_000L, 3.5)).toDF("id", "w"))
    assert(Versioned.read(spark, root).agg(max("id")).as[Long].head() ===
      3_000_000_000L)
    // the feed replays the pre-widening append under the wide type
    val feed = Versioned.changeFeed(spark, root, 0)
    assert(feed.schema("id").dataType === LongType)
    assert(feed.filter(col("_change_type") === "insert").count() === 3)
  }

  test("old integer stats keep pruning after the widening") {
    val root = freshRoot("stats")
    Versioned.commit(spark, root,
      (1 to 60).map(i => (i, s"r$i")).toDF("id", "tag")
        .repartitionByRange(3, col("id")), statsCols = Seq("id"))
    Versioned.widenColumn(spark, root, "id", LongType)
    val pruned = Versioned.candidateFiles(root, 2, "id", 25L, 30L)
    assert(pruned.size === 1, s"expected 1 candidate, got $pruned")
    // and a DML predicate typed long against the int-era stats
    Versioned.sql(spark, s"DELETE FROM `$root` WHERE id > 55")
    assert(Versioned.read(spark, root).count() === 55)
  }

  test("lossy or nonsensical changes are rejected loudly") {
    val root = freshRoot("bad")
    Versioned.commit(spark, root,
      Seq((1L, 1.0, "a")).toDF("id", "v", "s"))
    // narrowing
    intercept[IllegalArgumentException] {
      Versioned.widenColumn(spark, root, "id", IntegerType)
    }
    // precision-losing
    intercept[IllegalArgumentException] {
      Versioned.widenColumn(spark, root, "id", DoubleType)
    }
    // cross-kind
    intercept[IllegalArgumentException] {
      Versioned.widenColumn(spark, root, "s", LongType)
    }
    // unknown column
    intercept[IllegalArgumentException] {
      Versioned.widenColumn(spark, root, "nope", LongType)
    }
  }

  test("widening composes with column mapping") {
    val root = freshRoot("map")
    Versioned.commit(spark, root,
      Seq((1, 10)).toDF("id", "score"), statsCols = Seq("id"))
    Versioned.renameColumn(spark, root, "score", "points")
    Versioned.sql(spark,
      s"ALTER TABLE `$root` ALTER COLUMN points TYPE BIGINT")
    Versioned.commit(spark, root, Seq((2, 20L)).toDF("id", "points"))
    assert(Versioned.read(spark, root).orderBy("id")
      .select("points").as[Long].collect().toSeq === Seq(10L, 20L))
  }
}
