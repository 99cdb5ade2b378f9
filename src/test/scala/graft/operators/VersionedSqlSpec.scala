package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SQL DML against versioned tables (VersionedSql): every statement
  * must dispatch onto the library verb with identical semantics —
  * UPDATE evaluates right-hand sides against the pre-update row and
  * carries provably-unaffected files by reference; MERGE covers the
  * upsert / keyed-purge / dedup-append forms; constraint DDL
  * round-trips; and metadata-only commits no longer wedge the change
  * feed. */
class VersionedSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-vsql-$tag").toString + "/t"

  test("UPDATE: RHS sees the pre-update row, pruned carry, null-pred keeps") {
    val root = freshRoot("upd")
    // two files with disjoint id ranges so pruning is observable
    Versioned.commit(spark, root,
      (1 to 50).map(i => (i.toLong, i.toLong, i * 10.0)).toDF("id", "a", "b")
        .coalesce(1),
      statsCols = Seq("id"))
    Versioned.commit(spark, root,
      ((100 to 120).map(i => (Some(i.toLong): Option[Long], i.toLong, i * 10.0)) :+
        ((None: Option[Long], 0L, 0.0)))
        .toDF("id", "a", "b").coalesce(1),
      statsCols = Seq("id"))
    val before = Versioned.files(root, 2).toSet

    // swap semantics: SET a = b, b = a must use the OLD row for both
    val v = Versioned.sql(spark,
      s"UPDATE `$root` SET a = CAST(b AS BIGINT), b = CAST(a AS DOUBLE) " +
        "WHERE id <= 10").select("version").as[Long].head()
    val got = Versioned.read(spark, root)
    assert(got.filter(col("id") <= 10).count() === 10)
    (1 to 10).foreach { i =>
      val r = got.filter(col("id") === i).select("a", "b")
        .as[(Long, Double)].head()
      assert(r === ((i * 10L, i.toDouble)),
        s"id=$i must swap to (a=${i * 10}, b=$i), got $r")
    }
    // untouched rows identical; the null-id row survives (NULL pred)
    assert(got.filter(col("id") === 100).select("a").as[Long].head() === 100L)
    assert(got.filter(col("id").isNull).count() === 1)
    // the second file is provably out of range: carried by reference
    val after = Versioned.files(root, v).toSet
    assert(before.intersect(after).nonEmpty,
      "the un-hit file must carry by reference, not rewrite")
    // a provably-no-match update publishes nothing
    assert(Versioned.updateRows(spark, root,
      Seq("a" -> lit(0L)), col("id") === 99999L) === v)
  }

  test("UPDATE with cdf records pre/postimage pairs; changeFeed replays") {
    val root = freshRoot("cdf")
    Versioned.commit(spark, root,
      (1 to 20).map(i => (i.toLong, i * 1.0)).toDF("id", "v"),
      statsCols = Seq("id"))
    Versioned.sql(spark,
      s"UPDATE `$root` SET v = v + 100.0 WHERE id <= 5", cdf = true)
    val feed = Versioned.changeFeed(spark, root, 1)
    assert(feed.filter(col("_change_type") === "update_preimage")
      .count() === 5)
    assert(feed.filter(col("_change_type") === "update_postimage")
      .count() === 5)
    assert(feed.filter(col("_change_type") === "update_postimage")
      .agg(sum("v")).as[Double].head() === (1 to 5).map(_ + 100.0).sum)
    // an UPDATE without cdf cannot feed changeFeed — loudly
    Versioned.updateRows(spark, root, Seq("v" -> lit(0.0)), col("id") === 9L)
    val e = intercept[IllegalArgumentException] {
      Versioned.changeFeed(spark, root, 2).count()
    }
    assert(e.getMessage.contains("update"))
  }

  test("UPDATE rejects unknown columns and keeps the declared type") {
    val root = freshRoot("ty")
    Versioned.commit(spark, root,
      Seq((1L, 5)).toDF("id", "n"))
    val e = intercept[IllegalArgumentException] {
      Versioned.sql(spark, s"UPDATE `$root` SET nope = 1")
    }
    assert(e.getMessage.contains("nope"))
    // assigned value casts to the column's declared type (int stays int)
    Versioned.sql(spark, s"UPDATE `$root` SET n = 7.9 WHERE id = 1")
    val f = Versioned.read(spark, root).schema("n")
    assert(f.dataType === org.apache.spark.sql.types.IntegerType)
  }

  test("DELETE FROM dispatches to the pruned copy-on-write delete") {
    val root = freshRoot("del")
    Versioned.commit(spark, root,
      (1 to 30).map(i => (i.toLong, s"r$i")).toDF("id", "tag"),
      statsCols = Seq("id"))
    Versioned.sql(spark, s"DELETE FROM `$root` WHERE id % 3 = 0")
    val got = Versioned.read(spark, root)
    assert(got.count() === 20)
    assert(got.filter(col("id") % 3 === 0).count() === 0)
  }

  test("MERGE upsert form ≡ mergeUpsert; source may be a TVF") {
    val root = freshRoot("mrg")
    Versioned.commit(spark, root,
      (1 to 10).map(i => (i.toLong, s"v1-$i")).toDF("id", "payload"),
      statsCols = Seq("id"))
    Seq((5L, "v2-5"), (11L, "v2-11")).toDF("id", "payload")
      .createOrReplaceTempView("vsql_merge_src")
    Versioned.sql(spark,
      s"""MERGE INTO `$root` t USING vsql_merge_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = Versioned.read(spark, root)
    assert(got.count() === 11)
    assert(got.filter(col("id") === 5).select("payload")
      .as[String].head() === "v2-5")
    assert(got.filter(col("id") === 11).count() === 1)

    // keyed purge
    Seq(1L, 2L).toDF("id").createOrReplaceTempView("vsql_purge_src")
    Versioned.sql(spark,
      s"MERGE INTO `$root` t USING vsql_purge_src s ON t.id = s.id " +
        "WHEN MATCHED THEN DELETE")
    assert(Versioned.read(spark, root).count() === 9)

    // dedup append: only genuinely-new keys land
    Seq((5L, "dup"), (20L, "new")).toDF("id", "payload")
      .createOrReplaceTempView("vsql_ins_src")
    Versioned.sql(spark,
      s"MERGE INTO `$root` t USING vsql_ins_src s ON t.id = s.id " +
        "WHEN NOT MATCHED THEN INSERT *")
    val after = Versioned.read(spark, root)
    assert(after.count() === 10)
    assert(after.filter(col("id") === 5).select("payload")
      .as[String].head() === "v2-5", "matched key must NOT re-insert")
    assert(after.filter(col("id") === 20).count() === 1)

    // column-level SET routes through the general merge verb
    Versioned.sql(spark,
      s"MERGE INTO `$root` t USING vsql_ins_src s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET payload = 'x'")
    val seen = Versioned.read(spark, root)
    assert(seen.filter(col("id") === 5).select("payload")
      .as[String].head() === "x")
    assert(seen.filter(col("id") === 20).select("payload")
      .as[String].head() === "x")
    assert(seen.count() === 10, "column-level SET must not insert")
  }

  test("constraint DDL round-trips and the feed skips metadata commits") {
    val root = freshRoot("ddl")
    Versioned.commit(spark, root,
      (1 to 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v"),
      statsCols = Seq("id"))
    Versioned.sql(spark,
      s"ALTER TABLE `$root` ADD CONSTRAINT pos CHECK (v > 0)")
    assert(Versioned.constraintsOf(root) === Map("pos" -> "v > 0"))
    // a violating append aborts
    intercept[Exception] {
      Versioned.commit(spark, root, Seq((99L, -1.0)).toDF("id", "v"))
    }
    // append across the constraint commit: the feeds must SKIP the
    // metadata-only version, not throw (the wedge ADVICE flagged)
    Versioned.commit(spark, root, Seq((11L, 1.0)).toDF("id", "v"))
    val feed = Versioned.changeFeed(spark, root, 1)
    assert(feed.count() === 1, "only the post-constraint append emits")
    assert(Versioned.changesSince(spark, root, 1).count() === 1)
    Versioned.sql(spark, s"ALTER TABLE `$root` DROP CONSTRAINT pos")
    assert(Versioned.constraintsOf(root).isEmpty)
    // DROP IF EXISTS on a missing constraint is a no-op, not an error
    val v0 = Versioned.latestVersion(root).get
    Versioned.sql(spark,
      s"ALTER TABLE `$root` DROP CONSTRAINT IF EXISTS nope")
    assert(Versioned.latestVersion(root).get === v0)
  }

  test("a clone's v1 feeds as inserts instead of wedging the feed") {
    val src = freshRoot("cls")
    val dst = freshRoot("cld")
    Versioned.commit(spark, src,
      (1 to 15).map(i => (i.toLong, s"r$i")).toDF("id", "tag"),
      statsCols = Seq("id"))
    Versioned.cloneShallow(spark, src, dst)
    val feed = Versioned.changeFeed(spark, dst, 0)
    assert(feed.filter(col("_change_type") === "insert").count() === 15,
      "the clone's v1 is its full content as insert envelopes")
    assert(Versioned.changesSince(spark, dst, 0).count() === 15)
  }

  test("alias-qualified UPDATE/DELETE predicates resolve") {
    val root = freshRoot("ali")
    Versioned.commit(spark, root,
      (1 to 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v"))
    Versioned.sql(spark,
      s"UPDATE `$root` t SET v = t.v + 1.0 WHERE t.id <= 3")
    assert(Versioned.read(spark, root).filter(col("id") <= 3)
      .agg(sum("v")).as[Double].head() === (1 + 2 + 3 + 3.0))
    Versioned.sql(spark, s"DELETE FROM `$root` t WHERE t.id > 8")
    assert(Versioned.read(spark, root).count() === 8)
  }

  test("INSERT INTO appends; INSERT OVERWRITE replaces") {
    val root = freshRoot("ins")
    Versioned.commit(spark, root, Seq((1L, "a")).toDF("id", "s"))
    Versioned.sql(spark,
      s"INSERT INTO `$root` SELECT 2L AS id, 'b' AS s")
    assert(Versioned.read(spark, root).count() === 2)
    Versioned.sql(spark,
      s"INSERT OVERWRITE `$root` SELECT 9L AS id, 'z' AS s")
    val got = Versioned.read(spark, root).as[(Long, String)].collect().toSeq
    assert(got === Seq((9L, "z")))
    // history keeps all three versions time-travelable
    assert(Versioned.versions(root) === Seq(1L, 2L, 3L))
  }

  test("OPTIMIZE and VACUUM maintenance verbs dispatch") {
    val root = freshRoot("opt")
    (1 to 4).foreach { i =>
      Versioned.commit(spark, root,
        Seq((i.toLong, i * 2.0)).toDF("id", "v").coalesce(1),
        statsCols = Seq("id"))
    }
    val v = Versioned.sql(spark, s"OPTIMIZE `$root` INTO 1 FILES")
      .select("version").as[Long].head()
    assert(Versioned.files(root, v).size === 1, "bin-packed to one file")
    assert(Versioned.read(spark, root).count() === 4)
    // ZORDER form records stats for the clustered columns
    Versioned.sql(spark, s"OPTIMIZE `$root` ZORDER BY (id, v)")
    assert(Versioned.read(spark, root).count() === 4)
    Versioned.sql(spark, s"VACUUM `$root` RETAIN 2 VERSIONS")
    assert(Versioned.versions(root).size === 2, "only two versions retained")
    assert(Versioned.read(spark, root).count() === 4)
  }

  test("ADD COLUMNS is metadata-only; RESTORE and CLONE verbs dispatch") {
    val root = freshRoot("sch")
    Versioned.commit(spark, root, Seq((1L, "a")).toDF("id", "s"),
      statsCols = Seq("id"))
    val filesBefore = Versioned.files(root, 1)
    Versioned.sql(spark,
      s"ALTER TABLE `$root` ADD COLUMNS (score DOUBLE, note STRING)")
    // zero data movement: the parent's files carry by reference
    assert(Versioned.files(root, 2) === filesBefore)
    val got = Versioned.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "s", "score", "note"))
    assert(got.filter(col("score").isNull && col("note").isNull)
      .count() === 1, "existing rows null-fill the new columns")
    // appends may now carry the new columns; time travel shows the
    // OLD schema at the old version; the feed skips the schema commit
    Versioned.commit(spark, root,
      Seq((2L, "b", 1.5, "n")).toDF("id", "s", "score", "note"))
    assert(Versioned.read(spark, root).count() === 2)
    assert(!Versioned.readVersion(spark, root, 1).columns.contains("score"))
    assert(Versioned.changeFeed(spark, root, 1).count() === 1,
      "only the post-schema append emits")
    // duplicate add fails loudly
    val e = intercept[IllegalArgumentException] {
      Versioned.sql(spark, s"ALTER TABLE `$root` ADD COLUMNS (SCORE INT)")
    }
    assert(e.getMessage.contains("already exist"))
    // RESTORE via SQL reinstates the pre-schema state (schema included)
    Versioned.sql(spark, s"RESTORE `$root` TO VERSION 1")
    assert(Versioned.read(spark, root).columns.toSeq === Seq("id", "s"))
    // CLONE via SQL branches the post-append version
    val dst = freshRoot("schc")
    Versioned.sql(spark, s"CLONE `$root` TO `$dst` VERSION 3")
    assert(Versioned.read(spark, dst).count() === 2)
    assert(Versioned.read(spark, dst).columns.toSeq ===
      Seq("id", "s", "score", "note"))
  }

  test("DROP COLUMNS is metadata-only; re-add gated until rewrite") {
    val root = freshRoot("drop")
    Versioned.commit(spark, root,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "s", "score"),
      statsCols = Seq("id"))
    val filesBefore = Versioned.files(root, 1)
    Versioned.sql(spark, s"ALTER TABLE `$root` DROP COLUMN score")
    // zero data movement: the parent's files carry by reference
    assert(Versioned.files(root, 2) === filesBefore)
    assert(Versioned.read(spark, root).columns.toSeq === Seq("id", "s"))
    // time travel still shows (and reads) the dropped column
    assert(Versioned.readVersion(spark, root, 1)
      .select("score").as[Double].collect().sorted === Array(10.0, 20.0))
    // appends under the narrowed schema work; the feed skips the
    // schema commit instead of wedging
    Versioned.commit(spark, root, Seq((3L, "c")).toDF("id", "s"))
    assert(Versioned.changeFeed(spark, root, 1).count() === 1)
    // re-ADD of the dropped name is REJECTED while a pre-drop file is
    // live: parquet name resolution would resurrect the stale 10.0/20.0
    val e = intercept[IllegalArgumentException] {
      Versioned.sql(spark, s"ALTER TABLE `$root` ADD COLUMNS (score DOUBLE)")
    }
    assert(e.getMessage.contains("predate the drop"))
    // a DIFFERENT name is fine
    Versioned.sql(spark, s"ALTER TABLE `$root` ADD COLUMNS (rank INT)")
    // full rewrite retires the pre-drop files → tombstone auto-clears
    // → re-add succeeds and existing rows are NULL, never stale values
    Versioned.compact(spark, root, targetFiles = 1)
    Versioned.sql(spark, s"ALTER TABLE `$root` ADD COLUMNS (score DOUBLE)")
    val got = Versioned.read(spark, root)
    assert(got.columns.toSeq === Seq("id", "s", "rank", "score"))
    assert(got.filter(col("score").isNotNull).count() === 0,
      "re-added column must null-fill, not resurrect pre-drop values")
  }

  test("compact clears a tombstone even after vacuum dropped the drop-" +
      "version manifest") {
    val root = freshRoot("tombvac")
    Versioned.commit(spark, root, Seq((1L, 1.0)).toDF("id", "score"),
      statsCols = Seq("id"))
    Versioned.dropColumns(spark, root, Seq("score"))
    Versioned.commit(spark, root, Seq((2L)).toDF("id"))
    Versioned.commit(spark, root, Seq((3L)).toDF("id"))
    // retain only the last two versions: the drop-version manifest
    // (v1, the tombstone's hazard anchor) is gone
    Versioned.vacuum(root, keepVersions = 2, minAgeMs = 0L)
    // the lazy gate can no longer prove safety — loud, with the cure
    val e = intercept[IllegalArgumentException] {
      Versioned.addColumns(spark, root, Seq(
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType)))
    }
    assert(e.getMessage.contains("no longer retained"))
    // the cure: a full rewrite provably retires every pre-drop file,
    // so the tombstone force-clears without needing that manifest
    Versioned.compact(spark, root, targetFiles = 1)
    Versioned.addColumns(spark, root, Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType)))
    val got = Versioned.read(spark, root)
    assert(got.count() === 3)
    assert(got.filter(col("score").isNotNull).count() === 0)
  }

  test("DROP COLUMNS rejects partition and constraint-referenced columns") {
    val root = freshRoot("dropg")
    Versioned.commit(spark, root,
      Seq((1L, "a", 5.0), (2L, "b", 6.0)).toDF("id", "part", "v"),
      partitionBy = Seq("part"))
    val ep = intercept[IllegalArgumentException] {
      Versioned.sql(spark, s"ALTER TABLE `$root` DROP COLUMN part")
    }
    assert(ep.getMessage.contains("partition column"))
    Versioned.sql(spark,
      s"ALTER TABLE `$root` ADD CONSTRAINT pos CHECK (v > 0)")
    val ec = intercept[IllegalArgumentException] {
      Versioned.sql(spark, s"ALTER TABLE `$root` DROP COLUMN v")
    }
    assert(ec.getMessage.contains("drop the constraint first"))
    // dropping the constraint unblocks the column drop
    Versioned.sql(spark, s"ALTER TABLE `$root` DROP CONSTRAINT pos")
    Versioned.sql(spark, s"ALTER TABLE `$root` DROP COLUMN v")
    assert(Versioned.read(spark, root).columns.toSeq === Seq("id", "part"))
  }

  test("INSERT INTO VALUES binds positionally; column lists rename") {
    val root = freshRoot("insv")
    Versioned.sql(spark, s"CREATE TABLE `$root` (id BIGINT, tag STRING)")
    // bare VALUES: inline-table default names bind to the table order
    Versioned.sql(spark, s"INSERT INTO `$root` VALUES (1, 'a'), (2, 'b')")
    // explicit column list, reordered: names win over position; the
    // INT literal up-casts to the declared BIGINT implicitly
    Versioned.sql(spark, s"INSERT INTO `$root` (tag, id) VALUES ('c', 3)")
    assert(Versioned.read(spark, root).orderBy("id")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // partial positional insert fails loudly, naming the cure
    val e = intercept[IllegalArgumentException] {
      Versioned.sql(spark, s"INSERT INTO `$root` VALUES (4)")
    }
    assert(e.getMessage.contains("name the"))
    // a differently-CASED column list resolves (canonicalized to the
    // declared casing, Spark's default case-insensitive resolution)
    Versioned.sql(spark, s"INSERT INTO `$root` (ID, TAG) VALUES (4, 'd')")
    // bare INSERT ... SELECT binds POSITIONALLY (the ANSI contract):
    // the source's names don't matter, order does
    Versioned.sql(spark,
      s"INSERT INTO `$root` SELECT CAST(5 AS BIGINT) AS x, 'e' AS y")
    assert(Versioned.read(spark, root).orderBy("id")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
  }

  test("subset INSERT passes a CHECK on the omitted column (NULL passes)") {
    val root = freshRoot("insc")
    Versioned.sql(spark, s"CREATE TABLE `$root` (a BIGINT, b BIGINT)")
    Versioned.commit(spark, root, Seq((1L, 5L)).toDF("a", "b"))
    Versioned.sql(spark, s"ALTER TABLE `$root` ADD CONSTRAINT pos CHECK (b > 0)")
    // SQL semantics: the omitted b inserts NULL, and NULL passes CHECK
    Versioned.sql(spark, s"INSERT INTO `$root` (a) VALUES (2)")
    val got = Versioned.read(spark, root).orderBy("a")
    assert(got.as[(Long, Option[Long])].collect().toSeq ===
      Seq((1L, Some(5L)), (2L, None)))
    // a PRESENT violating value still aborts
    val e = intercept[Exception] {
      Versioned.sql(spark, s"INSERT INTO `$root` (a, b) VALUES (3, -1)")
    }
    assert(e.getMessage.contains("pos") || e.toString.contains("CHECK"))
  }

  test("CREATE TABLE / CTAS / TRUNCATE dispatch; graft_schema shows " +
      "evolution") {
    val root = freshRoot("ct")
    Versioned.sql(spark,
      s"CREATE TABLE `$root` (id BIGINT, part STRING, v DOUBLE) " +
        "PARTITIONED BY (part)")
    // the empty table reads as zero rows of exactly the declared shape
    val empty = Versioned.read(spark, root)
    assert(empty.columns.toSeq === Seq("id", "part", "v"))
    assert(empty.count() === 0)
    // duplicate CREATE fails; IF NOT EXISTS is a noop
    intercept[IllegalArgumentException] {
      Versioned.sql(spark, s"CREATE TABLE `$root` (x INT)")
    }
    Versioned.sql(spark, s"CREATE TABLE IF NOT EXISTS `$root` (x INT)")
    assert(Versioned.read(spark, root).columns.toSeq ===
      Seq("id", "part", "v"))
    // the first append inherits the declared partition layout
    Versioned.commit(spark, root,
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "part", "v"))
    assert(Versioned.read(spark, root).count() === 2)
    // TRUNCATE: metadata-only, schema + layout survive, rows gone
    Versioned.sql(spark, s"TRUNCATE TABLE `$root`")
    assert(Versioned.read(spark, root).count() === 0)
    assert(Versioned.read(spark, root).columns.toSeq ===
      Seq("id", "part", "v"))
    Versioned.commit(spark, root, Seq((3L, "c", 3.0)).toDF("id", "part", "v"))
    assert(Versioned.read(spark, root).count() === 1)
    // CTAS from a view
    val dst = freshRoot("ctas")
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "w")
      .createOrReplaceTempView("vsql_ctas_src")
    Versioned.sql(spark,
      s"CREATE TABLE `$dst` AS SELECT * FROM vsql_ctas_src")
    assert(Versioned.read(spark, dst).orderBy("k").as[(Long, Double)]
      .collect().toSeq === Seq((1L, 10.0), (2L, 20.0)))
    // graft_schema: the evolution history is pure SQL, physical names
    // included
    graft.GraftExtensions.registerFunctions(spark)
    Versioned.sql(spark, s"ALTER TABLE `$dst` RENAME COLUMN w TO weight")
    val hist = spark.sql(
      s"SELECT version, column, physical_name FROM graft_schema('$dst')")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(hist.contains((1L, "w", "w")))
    assert(hist.contains((2L, "weight", "w")),
      "the renamed column must surface its physical storage name")
  }

  test("fall-through: a plain read statement runs with the TVFs live") {
    val root = freshRoot("ro")
    Versioned.commit(spark, root, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val got = Versioned.sql(spark,
      s"SELECT count(*) AS n FROM graft_table('$root')")
    assert(got.as[Long].head() === 2L)
  }

  test("bare OPTIMIZE is the incremental bin-pack; TARGET n BYTES " +
      "carries at-target files by reference") {
    val root = freshRoot("binpack")
    // one "big" file (10k rows) + four tiny ones
    Versioned.commit(spark, root,
      (1 to 10000).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
        .coalesce(1), statsCols = Seq("id"))
    val bigPath = Versioned.files(root, 1).head
    (1 to 4).foreach { i =>
      Versioned.commit(spark, root,
        Seq((100000L + i, i.toDouble)).toDF("id", "v").coalesce(1))
    }
    // TARGET n BYTES: the big file stays BY REFERENCE (path unchanged
    // in the new manifest) — O(small-file debt), never a full rewrite
    val tgt = 20000L // tiny files ~1 KB, the 10k-row file is well past
    val v = Versioned.sql(spark, s"OPTIMIZE `$root` TARGET $tgt BYTES")
      .select("version").as[Long].head()
    val after = Versioned.files(root, v)
    assert(after.contains(bigPath),
      "the at-target file must carry by reference, not rewrite")
    assert(after.size === 2, s"4 smalls pack into one output, got $after")
    assert(Versioned.read(spark, root).count() === 10004)
    // bare OPTIMIZE now dispatches to the same incremental pack: on an
    // already-packed table (nothing under the 128 MB default target
    // except one file... every file here is "small" but only the pack
    // set matters) — a table with ONE live small file is a no-op,
    // where the old compact(1) dispatch always published a rewrite
    val root2 = freshRoot("binpack2")
    Versioned.commit(spark, root2,
      Seq((1L, 1.0)).toDF("id", "v").coalesce(1))
    val v2 = Versioned.sql(spark, s"OPTIMIZE `$root2`")
      .select("version").as[Long].head()
    assert(v2 === 1L,
      "bare OPTIMIZE on a single-file table must be the incremental " +
        "no-op, not compact(1)'s full rewrite")
    // explicit INTO n FILES stays the full rewrite
    val v3 = Versioned.sql(spark, s"OPTIMIZE `$root` INTO 1 FILES")
      .select("version").as[Long].head()
    assert(Versioned.files(root, v3).size === 1)
    // TARGET sizes the incremental pack only — combined with ZORDER
    // it would be silently ignored, so it is rejected loudly
    val e = intercept[IllegalArgumentException] {
      Versioned.sql(spark,
        s"OPTIMIZE `$root` TARGET 1000 BYTES ZORDER BY (id)")
    }
    assert(e.getMessage.contains("INTO n FILES"))
  }

  test("INSERT OVERWRITE preserves the declared partition layout") {
    val root = freshRoot("inso")
    Versioned.commit(spark, root,
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "part", "v"),
      partitionBy = Seq("part"))
    assert(Versioned.partitionByOf(root) === Seq("part"))
    Seq((9L, "a", 9.0), (10L, "c", 10.0)).toDF("id", "part", "v")
      .createOrReplaceTempView("vsql_inso_src")
    Versioned.sql(spark,
      s"INSERT OVERWRITE `$root` SELECT * FROM vsql_inso_src")
    // the layout survived the full replacement (Spark/Delta contract)
    assert(Versioned.partitionByOf(root) === Seq("part"),
      "INSERT OVERWRITE must not strip the hive layout")
    // and partition-scoped verbs still work on the new snapshot
    Versioned.overwritePartitions(spark, root,
      Seq((99L, "c", 99.0)).toDF("id", "part", "v"))
    val got = Versioned.read(spark, root).orderBy("id")
      .select("id", "part").as[(Long, String)].collect().toSeq
    assert(got === Seq((9L, "a"), (99L, "c")))
  }

  test("UPDATE assignment targets resolve case-insensitively") {
    val root = freshRoot("updcase")
    Versioned.commit(spark, root,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "acctbal"))
    Versioned.sql(spark,
      s"UPDATE `$root` SET ACCTBAL = ACCTBAL + 5.0 WHERE ID = 1")
    assert(Versioned.read(spark, root).orderBy("id")
      .select("acctbal").as[Double].collect().toSeq === Seq(15.0, 20.0))
    // duplicate targets differing only by case still fail loudly
    val e = intercept[IllegalArgumentException] {
      Versioned.updateRows(spark, root,
        Seq("acctbal" -> lit(0.0), "ACCTBAL" -> lit(1.0)), lit(true))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("general MERGE: composite keys, conditional clauses, " +
      "column-level SET, NOT MATCHED BY SOURCE") {
    val root = freshRoot("gmerge")
    // target keyed on (k1, k2)
    Versioned.commit(spark, root,
      Seq((1L, "a", 10.0, "old"), (1L, "b", 2.0, "old"),
        (2L, "a", 30.0, "old"), (3L, "a", 1.0, "old"))
        .toDF("k1", "k2", "v", "tag"),
      statsCols = Seq("k1"))
    Seq((1L, "a", 100.0), (1L, "b", 200.0), (9L, "z", 5.0),
      (9L, "y", 50.0))
      .toDF("k1", "k2", "nv").createOrReplaceTempView("gmerge_src")
    Versioned.sql(spark,
      s"""MERGE INTO `$root` t USING gmerge_src s
         |ON t.k1 = s.k1 AND t.k2 = s.k2
         |WHEN MATCHED AND s.nv > 150.0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.nv + t.v, tag = 'upd'
         |WHEN NOT MATCHED AND s.nv > 10.0 THEN
         |  INSERT (k1, k2, v, tag) VALUES (s.k1, s.k2, s.nv, 'ins')
         |WHEN NOT MATCHED BY SOURCE AND t.v < 5.0 THEN
         |  UPDATE SET tag = 'stale'""".stripMargin)
    val got = Versioned.read(spark, root)
      .orderBy("k1", "k2")
      .as[(Long, String, Double, String)].collect().toSeq
    assert(got === Seq(
      (1L, "a", 110.0, "upd"),   // matched, second clause (nv <= 150)
      // (1,b) deleted: matched, first clause nv=200 > 150
      (2L, "a", 30.0, "old"),    // not matched by source, v >= 5 → keep
      (3L, "a", 1.0, "stale"),   // not matched by source, v < 5
      (9L, "y", 50.0, "ins")))   // insert (9,z nv=5 fails the guard)
  }

  test("general MERGE: ambiguous duplicate source keys fail loudly; " +
      "unknown SET targets fail loudly") {
    val root = freshRoot("gmergeamb")
    Versioned.commit(spark, root,
      Seq((1L, 10.0)).toDF("k", "v"))
    Seq((1L, 1.0), (1L, 2.0)).toDF("k", "nv")
      .createOrReplaceTempView("gmergeamb_src")
    val e = intercept[IllegalArgumentException] {
      Versioned.sql(spark,
        s"""MERGE INTO `$root` t USING gmergeamb_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    }
    assert(e.getMessage.contains("multiple source rows"))
    // duplicates that match no target row are fine for insert-only
    Seq((7L, 1.0), (7L, 2.0)).toDF("k", "nv")
      .createOrReplaceTempView("gmergeamb_src2")
    Versioned.sql(spark,
      s"""MERGE INTO `$root` t USING gmergeamb_src2 s ON t.k = s.k
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)""".stripMargin)
    assert(Versioned.read(spark, root).count() === 3)
    // duplicates that DO match a target row are ALSO fine for
    // insert-only (Delta's contract) — and must never duplicate the
    // matched target row through the rewrite join
    val beforeFiles = Versioned.files(root,
      Versioned.latestVersion(root).get).toSet
    Seq((1L, 5.0), (1L, 6.0), (8L, 8.0)).toDF("k", "nv")
      .createOrReplaceTempView("gmergeamb_src3")
    val v3 = Versioned.sql(spark,
      s"""MERGE INTO `$root` t USING gmergeamb_src3 s ON t.k = s.k
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)"""
        .stripMargin).select("version").as[Long].head()
    val got3 = Versioned.read(spark, root)
    assert(got3.filter($"k" === 1L).count() === 1,
      "insert-only merge must NEVER duplicate a matched target row")
    assert(got3.filter($"k" === 8L).count() === 1)
    // and it never rewrites: every pre-merge file carried by reference
    assert(beforeFiles.subsetOf(Versioned.files(root, v3).toSet),
      "insert-only merge must carry every file by reference")
    // a BY SOURCE clause makes duplicate-matching sources ambiguous
    // again — the guard must fire there too, not just for WHEN MATCHED
    val e3 = intercept[IllegalArgumentException] {
      Versioned.merge(spark, root,
        Seq((1L, 1.0), (1L, 2.0)).toDF("k", "nv"), Seq("k" -> "k"),
        notMatchedBySource = Seq(Versioned.BySourceDelete(None)))
    }
    assert(e3.getMessage.contains("multiple source rows"))
    val e2 = intercept[IllegalArgumentException] {
      Versioned.merge(spark, root,
        Seq((1L, 1.0)).toDF("k", "nv"), Seq("k" -> "k"),
        matched = Seq(Versioned.MatchedUpdate(None,
          Some(Seq("nope" -> lit(1.0))))))
    }
    assert(e2.getMessage.contains("unknown target column"))
  }

  test("general MERGE prunes files by source keys and records CDF") {
    val root = freshRoot("gmergeprune")
    // two files with disjoint k ranges
    Versioned.commit(spark, root,
      (1 to 50).map(i => (i.toLong, i * 1.0)).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"))
    Versioned.commit(spark, root,
      (1000 to 1050).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
        .coalesce(1), statsCols = Seq("k"))
    val before = Versioned.files(root, 2).toSet
    Seq((10L, 99.0), (20L, -1.0)).toDF("k", "nv")
      .createOrReplaceTempView("gmergeprune_src")
    val v = Versioned.sql(spark,
      s"""MERGE INTO `$root` t USING gmergeprune_src s ON t.k = s.k
         |WHEN MATCHED AND s.nv < 0.0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin,
      cdf = true).select("version").as[Long].head()
    val after = Versioned.files(root, v).toSet
    // the 1000-range file provably holds no source key → carried
    assert((before intersect after).nonEmpty,
      s"high-range file must carry by reference: $before vs $after")
    assert(Versioned.read(spark, root).count() === 100) // 101 - 1 delete
    assert(Versioned.read(spark, root).filter($"k" === 10L)
      .select("v").as[Double].head() === 99.0)
    // CDF envelopes: one pre+post pair for the update, one delete
    val feed = Versioned.changeFeed(spark, root, v - 1, Some(v))
    val types = feed.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(types === Map("update_preimage" -> 1L,
      "update_postimage" -> 1L, "delete" -> 1L))
  }

  test("MERGE schema evolution under autoMerge: new source columns " +
      "land; default stays schema-enforcing") {
    val root = freshRoot("gmevo")
    Versioned.commit(spark, root, Seq((1L, "a"), (2L, "b")).toDF("id", "tag"),
      statsCols = Seq("id"))
    Seq((2L, "B", 0.5), (3L, "c", 0.9)).toDF("id", "tag", "score")
      .createOrReplaceTempView("gmevo_src")
    val upsert =
      s"""MERGE INTO `$root` t USING gmevo_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    // enforcement by default: a new source column is rejected loudly
    intercept[Exception] { Versioned.sql(spark, upsert) }
    spark.conf.set("spark.graft.merge.autoMerge", "true")
    try {
      Versioned.sql(spark, upsert)
      val got = Versioned.read(spark, root).orderBy("id")
        .as[(Long, String, Option[Double])].collect().toSeq
      assert(got === Seq((1L, "a", None), (2L, "B", Some(0.5)),
        (3L, "c", Some(0.9))),
        "matched rows take the new column, untouched rows null-fill")
      // the evolution is a real schema change: plain appends may now
      // carry the column
      Versioned.commit(spark, root,
        Seq((4L, "d", 1.5)).toDF("id", "tag", "score"))
      assert(Versioned.read(spark, root).count() === 4)
    } finally spark.conf.unset("spark.graft.merge.autoMerge")
  }

  test("general MERGE that provably touches nothing is a no-op version") {
    val root = freshRoot("gmnoop")
    Versioned.commit(spark, root, Seq((1L, 1.0)).toDF("k", "v"),
      statsCols = Seq("k"))
    // every source key is outside every file's stats range and there
    // is no insert clause: no file reads, no new version
    val v = Versioned.merge(spark, root,
      Seq((99L, 9.0)).toDF("k", "nv"), Seq("k" -> "k"),
      matched = Seq(Versioned.MatchedUpdate(None,
        Some(Seq("v" -> lit(0.0))))))
    assert(v === 1L)
    assert(Versioned.versions(root) === Seq(1L))
  }

  test("DELETE WHERE id IN (subquery) routes to the keys-frame-pruned " +
      "verb and carries unaffected files by reference") {
    val root = freshRoot("delin")
    // two files with disjoint id ranges, stats on id
    Versioned.commit(spark, root,
      (1 to 50).map(i => (i.toLong, i * 1.0)).toDF("id", "v").coalesce(1),
      statsCols = Seq("id"))
    Versioned.commit(spark, root,
      (1000 to 1050).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
        .coalesce(1), statsCols = Seq("id"))
    val before = Versioned.files(root, 2).toSet
    Seq(10L, 20L, 10L).toDF("id").createOrReplaceTempView("delin_src")
    val v = Versioned.sql(spark,
      s"DELETE FROM `$root` WHERE id IN " +
        "(SELECT id FROM delin_src WHERE id < 15)")
      .select("version").as[Long].head()
    assert(Versioned.read(spark, root).count() === 100) // only id=10 went
    assert(Versioned.read(spark, root).filter($"id" === 10L).count() === 0)
    // the 1000-range file provably holds no subquery key → carried
    assert((before intersect Versioned.files(root, v).toSet).nonEmpty,
      "high-range file must carry by reference")
  }

  test("DELETE and UPDATE with IN (subquery) plus residual conjuncts") {
    val root = freshRoot("dmlin")
    Versioned.commit(spark, root,
      Seq((1L, 5, 10.0), (2L, 5, 20.0), (3L, 50, 30.0), (4L, 5, 40.0))
        .toDF("id", "nat", "bal"), statsCols = Seq("id"))
    Seq(1L, 3L, 4L).toDF("k").createOrReplaceTempView("dmlin_src")
    // residual rides the WHEN MATCHED guard: only id=4 (nat<10, in set)
    Versioned.sql(spark,
      s"DELETE FROM `$root` WHERE id IN (SELECT k FROM dmlin_src) " +
        "AND bal > 35.0")
    assert(Versioned.read(spark, root).orderBy("id")
      .select("id").as[Long].collect().toSeq === Seq(1L, 2L, 3L))
    // UPDATE: in set AND nat < 10 → only id=1; RHS over pre-update row
    Versioned.sql(spark,
      s"UPDATE `$root` SET bal = bal + 100.0 " +
        "WHERE id IN (SELECT k FROM dmlin_src) AND nat < 10")
    assert(Versioned.read(spark, root).orderBy("id")
      .select("bal").as[Double].collect().toSeq === Seq(110.0, 20.0, 30.0))
    // subqueries outside the supported shape fail loudly
    val e = intercept[IllegalArgumentException] {
      Versioned.sql(spark,
        s"DELETE FROM `$root` WHERE id NOT IN (SELECT k FROM dmlin_src)")
    }
    assert(e.getMessage.contains("top-level AND-ed"))
  }

  test("correlated EXISTS / NOT EXISTS and multi-column IN route to " +
      "the keys-frame verbs") {
    val root = freshRoot("exin")
    Versioned.commit(spark, root,
      Seq((1L, 5, 10.0), (2L, 5, 20.0), (3L, 50, 30.0), (4L, 5, 40.0))
        .toDF("id", "nat", "bal"), statsCols = Seq("id"))
    Seq((1L, 1.0), (3L, 99.0), (9L, 1.0)).toDF("k", "w")
      .createOrReplaceTempView("exin_src")
    // EXISTS with an inner residual: only subquery rows with w > 50
    // correlate → k=3 → exactly id 3 deletes
    Versioned.sql(spark,
      s"DELETE FROM `$root` t WHERE EXISTS " +
        "(SELECT 1 FROM exin_src s WHERE s.k = t.id AND s.w > 50.0)")
    assert(Versioned.read(spark, root).orderBy("id")
      .select("id").as[Long].collect().toSeq === Seq(1L, 2L, 4L))
    // NOT EXISTS + outer residual rides merge's NOT MATCHED BY
    // SOURCE: rows with NO subquery match AND nat < 10 update; the
    // matched row (id=1) must stay untouched
    Versioned.sql(spark,
      s"UPDATE `$root` t SET bal = bal + 100.0 WHERE NOT EXISTS " +
        "(SELECT 1 FROM exin_src s WHERE s.k = t.id) AND nat < 10")
    assert(Versioned.read(spark, root).orderBy("id")
      .select("bal").as[Double].collect().toSeq ===
      Seq(10.0, 120.0, 140.0))
    // NOT EXISTS DELETE: anti-join semantics — only the matched row
    // survives
    Versioned.sql(spark,
      s"DELETE FROM `$root` t WHERE NOT EXISTS " +
        "(SELECT 1 FROM exin_src s WHERE s.k = t.id)")
    assert(Versioned.read(spark, root).select("id").as[Long]
      .collect().toSeq === Seq(1L))
    // multi-column IN: composite keys through the general merge
    val root2 = freshRoot("exin2")
    Versioned.commit(spark, root2,
      Seq((1L, "a", 1.0), (1L, "b", 2.0), (2L, "a", 3.0))
        .toDF("k1", "k2", "v"), statsCols = Seq("k1"))
    Seq((1L, "b"), (2L, "a")).toDF("k1", "k2")
      .createOrReplaceTempView("exin_src2")
    Versioned.sql(spark,
      s"DELETE FROM `$root2` WHERE (k1, k2) IN " +
        "(SELECT k1, k2 FROM exin_src2)")
    assert(Versioned.read(spark, root2).select("v").as[Double]
      .collect().toSeq === Seq(1.0))
    // NOT IN keeps its loud rejection, pointing at NOT EXISTS
    val e = intercept[IllegalArgumentException] {
      Versioned.sql(spark,
        s"DELETE FROM `$root2` WHERE k1 NOT IN (SELECT k1 FROM exin_src2)")
    }
    assert(e.getMessage.contains("NOT EXISTS"))
  }

  test("CTAS IF NOT EXISTS honors a lost creation race") {
    val root = freshRoot("ctasrace")
    Seq((1L, "w")).toDF("id", "s").createOrReplaceTempView("vsql_race_src")
    // deterministic race: inside the CTAS publish's critical window a
    // competing writer lands v1 first (reentrant — java monitors), so
    // the CTAS's pinned expectedVersion=0 commit loses the CAS; IF NOT
    // EXISTS must then return the winner's version, not throw
    val prev = Versioned.coordinator
    var fired = false
    Versioned.coordinator = new ConditionalPutCoordinator(raceHook = { _ =>
      if (!fired) {
        fired = true
        Versioned.commit(spark, root, Seq((42L, "winner")).toDF("id", "s"))
      }
    })
    try {
      val v = Versioned.sql(spark,
        s"CREATE TABLE IF NOT EXISTS `$root` AS SELECT * FROM vsql_race_src")
        .select("version").as[Long].head()
      assert(v === 1L, "the loser must return the winner's version")
      assert(Versioned.read(spark, root).select("s").as[String]
        .collect().toSeq === Seq("winner"),
        "IF NOT EXISTS keeps the winner's table")
    } finally Versioned.coordinator = prev
    // without IF NOT EXISTS the same race surfaces as a loud conflict
    val root2 = freshRoot("ctasrace2")
    var fired2 = false
    Versioned.coordinator = new ConditionalPutCoordinator(raceHook = { _ =>
      if (!fired2) {
        fired2 = true
        Versioned.commit(spark, root2, Seq((42L, "winner")).toDF("id", "s"))
      }
    })
    try intercept[Versioned.VersionConflictException] {
      Versioned.sql(spark,
        s"CREATE TABLE `$root2` AS SELECT * FROM vsql_race_src")
    } finally Versioned.coordinator = prev
  }

  test("MERGE rejects duplicate assignment targets within one clause") {
    val root = freshRoot("dupset")
    Versioned.commit(spark, root,
      (1 to 5).map(i => (i.toLong, s"p$i")).toDF("id", "payload"),
      statsCols = Seq("id"))
    Seq((1L, "x")).toDF("id", "payload")
      .createOrReplaceTempView("vsql_dup_src")
    // duplicate SET targets (case-insensitive) must error like Delta,
    // never silently resolve to one of the two values
    val e = intercept[IllegalArgumentException] {
      Versioned.sql(spark,
        s"MERGE INTO `$root` t USING vsql_dup_src s ON t.id = s.id " +
          "WHEN MATCHED THEN UPDATE SET payload = 'a', PAYLOAD = 'b'")
    }
    assert(e.getMessage.toLowerCase.contains("duplicate"))
    // the direct API mirrors the guard
    val e2 = intercept[IllegalArgumentException] {
      Versioned.merge(spark, root, Seq((1L, "x")).toDF("id", "payload"),
        keys = Seq("id" -> "id"),
        matched = Seq(Versioned.MatchedUpdate(None,
          Some(Seq("payload" -> lit("a"), "payload" -> lit("b"))))))
    }
    assert(e2.getMessage.toLowerCase.contains("duplicate"))
    // nothing published
    assert(Versioned.latestVersion(root) === Some(1L))
  }

  test("maintenance verbs reject a bare single-part table reference") {
    // `VACUUM mytable` must not silently operate on ./mytable — the
    // contract requires a backquoted path or a catalog name
    val e = intercept[IllegalArgumentException] {
      Versioned.sql(spark, "VACUUM mytable RETAIN 5 VERSIONS")
    }
    assert(e.getMessage.contains("backquoted"))
    val e2 = intercept[IllegalArgumentException] {
      Versioned.sql(spark, "OPTIMIZE mytable")
    }
    assert(e2.getMessage.contains("backquoted"))
  }
}
