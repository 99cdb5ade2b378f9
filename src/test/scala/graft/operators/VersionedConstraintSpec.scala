package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** replaceWhere must swap a predicate-scoped region in ONE atomic
  * commit (carrying provably-unaffected files by reference) and fence
  * replacement rows to the region; CHECK constraints must validate
  * existing data at add time, abort violating writes inside the write
  * job, pass NULL (SQL CHECK semantics), survive overwrite/restore and
  * ride into clones, and lift on drop. */
class VersionedConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-vcon").toString + "/t"

  private def rows(ids: Range, tag: String) =
    ids.map(i => (i.toLong, tag)).toDF("id", "tag")

  test("replaceWhere: one-commit region swap, unaffected files carried") {
    val root = freshRoot()
    Versioned.commit(spark, root, rows(1 to 50, "keep").coalesce(1),
      statsCols = Seq("id", "tag"))
    Versioned.commit(spark, root, rows(51 to 100, "swap").coalesce(1),
      statsCols = Seq("id", "tag"))
    val before = Versioned.latestVersion(root).get
    val keepFile = Versioned.files(root, 1).head
    val v = Versioned.replaceWhere(spark, root, col("tag") === "swap",
      rows(900 to 909, "swap").coalesce(1), statsCols = Seq("id", "tag"))
    assert(v === before + 1, "exactly ONE commit for the whole swap")
    val got = Versioned.read(spark, root)
    assert(got.count() === 60)
    assert(got.filter(col("id").between(51, 100)).count() === 0,
      "old region rows replaced")
    assert(got.filter(col("id") >= 900).count() === 10)
    assert(Versioned.files(root, v).contains(keepFile),
      "the provably-unaffected file must carry by reference")
    // pre-swap snapshot intact
    assert(Versioned.readVersion(spark, root, before).count() === 100)
  }

  test("replaceWhere fences replacement rows to the predicate region") {
    val root = freshRoot()
    Versioned.commit(spark, root, rows(1 to 20, "a").coalesce(1),
      statsCols = Seq("tag"))
    val e = intercept[Throwable] {
      Versioned.replaceWhere(spark, root, col("tag") === "a",
        rows(100 to 104, "OUTSIDE").coalesce(1))
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("replaceWhere") ||
        Option(e.getCause).exists(_.getMessage.contains("replaceWhere"))),
      s"out-of-region replacement must fail loudly, got: ${e.getMessage}")
    // nothing published: the table is unchanged
    assert(Versioned.read(spark, root).count() === 20)
    assert(Versioned.latestVersion(root).get === 1L)
  }

  test("CHECK constraint: violating write aborts in the write job; " +
      "conforming writes and NULLs pass") {
    val root = freshRoot()
    Versioned.commit(spark, root, rows(1 to 10, "a").coalesce(1))
    Versioned.addConstraint(spark, root, "pos_id", "id > 0")
    assert(Versioned.constraintsOf(root) === Map("pos_id" -> "id > 0"))
    // conforming append works
    Versioned.commit(spark, root, rows(11 to 20, "b").coalesce(1))
    assert(Versioned.read(spark, root).count() === 20)
    // violating append aborts and publishes nothing
    val before = Versioned.latestVersion(root).get
    val e = intercept[Throwable] {
      Versioned.commit(spark, root,
        Seq((-5L, "bad")).toDF("id", "tag").coalesce(1))
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("pos_id")),
      s"abort must name the constraint, got: ${messages(e)}")
    assert(Versioned.latestVersion(root).get === before,
      "a failed write must not publish a version")
    assert(Versioned.read(spark, root).count() === 20)
    // NULL predicate result passes (SQL CHECK semantics)
    Versioned.commit(spark, root,
      Seq((null.asInstanceOf[java.lang.Long], "nul")).toDF("id", "tag")
        .select(col("id").cast("long"), col("tag")).coalesce(1))
    assert(Versioned.read(spark, root).count() === 21)
  }

  test("addConstraint validates EXISTING rows and refuses on violation") {
    val root = freshRoot()
    Versioned.commit(spark, root, rows(1 to 10, "a").coalesce(1))
    val e = intercept[IllegalArgumentException] {
      Versioned.addConstraint(spark, root, "big", "id > 5")
    }
    assert(e.getMessage.contains("5 existing row(s)"))
    assert(Versioned.constraintsOf(root).isEmpty)
  }

  test("constraints survive overwrite and restore, ride into clones, " +
      "and lift on drop") {
    val root = freshRoot()
    Versioned.commit(spark, root, rows(1 to 10, "a").coalesce(1))
    Versioned.addConstraint(spark, root, "pos_id", "id > 0")
    // overwrite keeps the table property
    Versioned.commit(spark, root, rows(21 to 30, "b").coalesce(1),
      mode = "overwrite")
    intercept[Throwable] {
      Versioned.commit(spark, root,
        Seq((0L, "bad")).toDF("id", "tag").coalesce(1))
    }
    // clone inherits enforcement
    val dst = freshRoot()
    Versioned.cloneShallow(spark, root, dst)
    assert(Versioned.constraintsOf(dst) === Map("pos_id" -> "id > 0"))
    intercept[Throwable] {
      Versioned.commit(spark, dst,
        Seq((0L, "bad")).toDF("id", "tag").coalesce(1))
    }
    // restore keeps the restored version's constraints
    val vDrop = Versioned.dropConstraint(root, "pos_id")
    Versioned.commit(spark, root, Seq((0L, "ok-now")).toDF("id", "tag")
      .coalesce(1))
    Versioned.restore(root, vDrop - 1)
    assert(Versioned.constraintsOf(root) === Map("pos_id" -> "id > 0"),
      "restore reinstates the restored version's constraints")
  }
}
