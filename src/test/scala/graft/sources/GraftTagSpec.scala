package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.{Versioned, VersionedSql}

/** Tags — durable NAMES for versions (Iceberg's tags): minted by
  * `ALTER TABLE … CREATE TAG`, read via `VERSION AS OF 'name'`,
  * retention-pinned through VACUUM until dropped. */
class GraftTagSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-tag-wh").toString
    spark.conf.set("spark.sql.catalog.grafttg",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grafttg.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grafttg.ns")
    w
  }

  private def sql(s: String) = { warehouse; spark.sql(s) }

  test("CREATE TAG / VERSION AS OF 'name' / DROP TAG round-trip") {
    sql("CREATE TABLE grafttg.ns.t (id BIGINT)")
    val root = s"$warehouse/ns/t"
    sql("INSERT INTO grafttg.ns.t VALUES (1), (2)")
    VersionedSql(spark, "ALTER TABLE grafttg.ns.t CREATE TAG release-v1")
    sql("INSERT INTO grafttg.ns.t VALUES (3)")
    // the tag reads the snapshot it named, not HEAD
    assert(sql("SELECT id FROM grafttg.ns.t VERSION AS OF 'release-v1'")
      .as[Long].collect().toSet === Set(1L, 2L))
    assert(sql("SELECT count(*) FROM grafttg.ns.t").as[Long].head() === 3L)
    // explicit version form
    VersionedSql(spark,
      "ALTER TABLE grafttg.ns.t CREATE TAG empty AS OF VERSION 1")
    assert(sql("SELECT * FROM grafttg.ns.t VERSION AS OF 'empty'")
      .count() === 0L)
    // duplicates refuse; unknown tags name what exists
    val dup = intercept[Exception] { VersionedSql(spark,
      "ALTER TABLE grafttg.ns.t CREATE TAG release-v1") }
    assert(dup.getMessage.contains("already exists"))
    val miss = intercept[Exception] {
      sql("SELECT * FROM grafttg.ns.t VERSION AS OF 'nope'").collect() }
    assert(miss.getMessage.contains("release-v1"),
      s"the miss must name available tags: ${miss.getMessage}")
    VersionedSql(spark, "ALTER TABLE grafttg.ns.t DROP TAG empty")
    assert(Versioned.tagsOf(root).keySet === Set("release-v1"))
    val dropMiss = intercept[Exception] { VersionedSql(spark,
      "ALTER TABLE grafttg.ns.t DROP TAG empty") }
    assert(dropMiss.getMessage.contains("no tag"))
  }

  test("VACUUM retains a tagged version's manifest and files; " +
      "DROP TAG releases the pin") {
    sql("CREATE TABLE grafttg.ns.vac (id BIGINT, pad STRING)")
    val root = s"$warehouse/ns/vac"
    sql("INSERT INTO grafttg.ns.vac SELECT id, md5(CAST(id AS STRING)) " +
      "FROM range(100)")
    VersionedSql(spark, "ALTER TABLE grafttg.ns.vac CREATE TAG keepme")
    val taggedV = Versioned.tagsOf(root)("keepme")
    // bury the tag under newer versions, each overwriting the data
    (1 to 4).foreach { i =>
      sql(s"INSERT OVERWRITE grafttg.ns.vac SELECT id + ${i * 1000}, " +
        "md5(CAST(id AS STRING)) FROM range(10)")
    }
    Versioned.vacuum(root, keepVersions = 2, minAgeMs = 0L)
    // untagged old versions dropped …
    val left = Versioned.versions(root)
    assert(!left.contains(2L) || taggedV == 2L)
    // … but the tagged snapshot still reads EXACTLY
    assert(left.contains(taggedV), s"tagged v$taggedV must survive: $left")
    assert(sql("SELECT count(*) FROM grafttg.ns.vac " +
      "VERSION AS OF 'keepme'").as[Long].head() === 100L)
    assert(sql("SELECT sum(id) FROM grafttg.ns.vac VERSION AS OF 'keepme'")
      .as[Long].head() === (0L until 100L).sum)
    // drop the tag: the pin releases and vacuum reclaims
    VersionedSql(spark, "ALTER TABLE grafttg.ns.vac DROP TAG keepme")
    Versioned.vacuum(root, keepVersions = 2, minAgeMs = 0L)
    assert(!Versioned.versions(root).contains(taggedV),
      "an untagged old version ages out on the next vacuum")
  }

  test("graft_table TVF accepts a tag name as the version argument") {
    sql("CREATE TABLE grafttg.ns.tvf (id BIGINT)")
    sql("INSERT INTO grafttg.ns.tvf VALUES (7)")
    VersionedSql(spark, "ALTER TABLE grafttg.ns.tvf CREATE TAG pin")
    sql("INSERT INTO grafttg.ns.tvf VALUES (8)")
    graft.GraftExtensions.registerFunctions(spark)
    assert(sql("SELECT id FROM graft_table('grafttg.ns.tvf', 'pin')")
      .as[Long].collect().toSeq === Seq(7L))
    assert(sql("SELECT id FROM graft_table('grafttg.ns.tvf', 2)")
      .as[Long].collect().toSeq === Seq(7L))
  }

  test("metadata tables: .history, .files (pinnable), .tags") {
    sql("CREATE TABLE grafttg.ns.meta (id BIGINT)")
    sql("INSERT INTO grafttg.ns.meta VALUES (1), (2)")
    sql("INSERT INTO grafttg.ns.meta VALUES (3)")
    VersionedSql(spark, "ALTER TABLE grafttg.ns.meta CREATE TAG gold")
    // history: one row per retained version, queryable SQL
    val hist = sql("SELECT version, action FROM grafttg.ns.meta.history " +
      "ORDER BY version").as[(Long, String)].collect().toSeq
    assert(hist.map(_._1) === Seq(1L, 2L, 3L, 4L))
    assert(hist.last._2 === "tag")
    // files: the snapshot inventory — pinnable with VERSION AS OF
    val nowFiles = sql("SELECT count(*) FROM grafttg.ns.meta.files")
      .as[Long].head()
    assert(nowFiles >= 2)
    assert(sql("SELECT count(*) FROM grafttg.ns.meta.files " +
      "VERSION AS OF 1").as[Long].head() === 0L,
      "the empty CREATE snapshot has no files")
    assert(sql("SELECT sum(rows) FROM grafttg.ns.meta.files")
      .as[Long].head() === 3L)
    // tags: the tag map as a relation
    assert(sql("SELECT tag, version FROM grafttg.ns.meta.tags")
      .as[(String, Long)].collect().toSeq === Seq(("gold", 3L)))
    // pins on log-spanning relations refuse loudly
    val e = intercept[Exception] {
      sql("SELECT * FROM grafttg.ns.meta.history VERSION AS OF 2")
        .collect() }
    assert(e.getMessage.contains("not meaningful"))
  }

  test("tags survive data-replacing verbs and restore; clones start " +
      "tagless (version numbers don't transfer across logs)") {
    sql("CREATE TABLE grafttg.ns.sur (id BIGINT)")
    val root = s"$warehouse/ns/sur"
    sql("INSERT INTO grafttg.ns.sur VALUES (1)")
    Versioned.createTag(root, "t1")
    sql("INSERT OVERWRITE grafttg.ns.sur VALUES (9)")
    assert(Versioned.tagsOf(root).contains("t1"),
      "an overwrite replaces live data, not history — tags survive")
    Versioned.restore(root, 2L)
    assert(Versioned.tagsOf(root).contains("t1"))
    val dst = Files.createTempDirectory("graft-tag-clone").toString + "/c"
    Versioned.cloneShallow(spark, root, dst)
    assert(Versioned.tagsOf(dst).isEmpty,
      "a clone's log starts at v1 — source version numbers would " +
        "resolve to the WRONG snapshots there")
  }
}
