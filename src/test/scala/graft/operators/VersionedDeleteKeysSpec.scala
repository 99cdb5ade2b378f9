package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Keys-frame copy-on-write delete (the Delta MERGE-source shape):
  * rows whose column appears in a DISTRIBUTED keys DataFrame vanish,
  * for ANY of several (column, keys) sets (OR semantics); null keys
  * and null-column rows never match; files no set can hit are carried
  * by reference; CDF envelopes cover every removed row exactly once;
  * and the whole path works at a key volume that would be hostile to
  * a collected `isin` literal. */
class VersionedDeleteKeysSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-vdk").toString + "/t"

  test("single-set delete: exact rows, nulls kept, pruned carry") {
    val root = freshRoot()
    // two files with DISJOINT id ranges so pruning is observable
    Versioned.commit(spark, root,
      (1 to 100).map(i => (i.toLong, s"a$i")).toDF("id", "tag").coalesce(1),
      statsCols = Seq("id"))
    Versioned.commit(spark, root,
      ((201 to 300).map(i => (Some(i.toLong): Option[Long], s"b$i")) :+
        ((None: Option[Long], "null-id")))
        .toDF("id", "tag").coalesce(1),
      statsCols = Seq("id"))
    val beforeFiles = Versioned.files(root, 2).toSet
    // keys hit only the FIRST file's range (plus nulls, which must not match)
    val keys = ((5L to 20L).map(java.lang.Long.valueOf) :+
      null.asInstanceOf[java.lang.Long]).toDF("id")
    val v = Versioned.deleteKeys(spark, root, Seq("id" -> keys))
    val got = Versioned.read(spark, root)
    assert(got.count() === 185) // 201 rows - 16 deleted
    assert(got.filter(col("id").between(5, 20)).count() === 0)
    assert(got.filter(col("id").isNull).count() === 1, "null-id row kept")
    // the second file is provably key-free: carried by reference
    val afterFiles = Versioned.files(root, v).toSet
    assert(beforeFiles.intersect(afterFiles).nonEmpty,
      "the un-hit file must carry by reference, not rewrite")
  }

  test("multi-set OR delete with CDF: every removed row enveloped once") {
    val root = freshRoot()
    Versioned.commit(spark, root,
      (1 to 50).map(i => (i.toLong, i % 5L, s"r$i")).toDF("a", "b", "tag"),
      statsCols = Seq("a", "b"))
    val ka = Seq(1L, 2L, 3L).toDF("a")
    val kb = Seq(0L).toDF("b") // b=0 ⇒ a ∈ {5,10,…,50}, overlaps nothing in ka
    val v = Versioned.deleteKeys(spark, root,
      Seq("a" -> ka, "b" -> kb), cdf = true)
    val got = Versioned.read(spark, root)
    assert(got.count() === 37) // 50 - 3 (a-set) - 10 (b-set)
    assert(got.filter(col("a").isin(1L, 2L, 3L) || col("b") === 0L)
      .count() === 0)
    val feed = Versioned.changeFeed(spark, root, v - 1, Some(v))
    assert(feed.filter(col("_change_type") === "delete").count() === 13,
      "each removed row exactly one delete envelope")
    // provably-no-key delete publishes nothing
    val far = Seq(9999L).toDF("a")
    assert(Versioned.deleteKeys(spark, root, Seq("a" -> far)) === v)
  }

  test("a 10^5-key set deletes exactly, no driver literal") {
    val root = freshRoot()
    Versioned.commit(spark, root,
      (1 to 200000).map(i => (i.toLong, i % 3L)).toDF("id", "grp")
        .repartition(4),
      statsCols = Seq("id"))
    // 100k keys as a FRAME (an isin literal of this size would blow up
    // expression codegen long before memory)
    val keys = spark.range(1, 200001, 2).toDF("id") // odd ids: 100k keys
    Versioned.deleteKeys(spark, root, Seq("id" -> keys))
    val got = Versioned.read(spark, root)
    assert(got.count() === 100000)
    assert(got.filter(col("id") % 2 === 1).count() === 0,
      "every odd id deleted")
  }
}
