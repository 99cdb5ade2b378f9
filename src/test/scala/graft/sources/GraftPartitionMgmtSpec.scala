package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.operators.Versioned

/** Partition management (`SupportsPartitionManagement`): SHOW
  * PARTITIONS lists tuples metadata-only from the manifest;
  * DROP/TRUNCATE PARTITION retire a tuple's files whole in one atomic
  * commit; ADD PARTITION refuses (partitions exist while rows do). */
class GraftPartitionMgmtSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-pmgmt-wh").toString
    spark.conf.set("spark.sql.catalog.graftpm",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftpm.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftpm.p")
    w
  }

  private def sql(s: String): DataFrame = { warehouse; spark.sql(s) }

  private lazy val ready: Unit = {
    sql("CREATE TABLE graftpm.p.t (id BIGINT, day STRING, nk INT) " +
      "PARTITIONED BY (day, nk)")
    (0 until 60).map(i => (i.toLong, s"d${i % 3}", i % 2))
      .toDF("id", "day", "nk").createOrReplaceTempView("pm_src")
    sql("INSERT INTO graftpm.p.t SELECT * FROM pm_src")
    ()
  }

  test("SHOW PARTITIONS lists the distinct tuples from the manifest " +
      "and supports a sub-tuple filter") {
    ready
    val all = sql("SHOW PARTITIONS graftpm.p.t")
      .collect().map(_.getString(0)).sorted
    assert(all.toSeq === (for (d <- 0 until 3; n <- 0 until 2)
      yield s"day=d$d/nk=$n").sorted)
    val filtered = sql(
      "SHOW PARTITIONS graftpm.p.t PARTITION (day = 'd1')")
      .collect().map(_.getString(0)).sorted
    assert(filtered.toSeq === Seq("day=d1/nk=0", "day=d1/nk=1"))
  }

  test("DROP PARTITION retires exactly the tuple's files — one " +
      "metadata commit, untouched partitions carry by identity") {
    ready
    val root = s"$warehouse/p/t"
    val v0 = Versioned.latestVersion(root).get
    val before = Versioned.files(root, v0).toSet
    sql("ALTER TABLE graftpm.p.t DROP PARTITION (day = 'd1', nk = 1)")
    val v1 = Versioned.latestVersion(root).get
    assert(v1 === v0 + 1)
    val after = Versioned.files(root, v1).toSet
    // no new files written; survivors are a strict subset by identity
    assert(after.subsetOf(before))
    assert(sql("SELECT count(*) AS n FROM graftpm.p.t " +
      "WHERE day = 'd1' AND nk = 1").as[Long].head() === 0L)
    assert(sql("SELECT count(*) AS n FROM graftpm.p.t").as[Long].head()
      === 50L)
    // time travel still reads the dropped partition
    assert(sql(s"SELECT count(*) AS n FROM graftpm.p.t VERSION AS OF $v0 " +
      "WHERE day = 'd1' AND nk = 1").as[Long].head() === 10L)
    // SHOW PARTITIONS reflects the drop
    assert(!sql("SHOW PARTITIONS graftpm.p.t").collect()
      .map(_.getString(0)).contains("day=d1/nk=1"))
  }

  test("TRUNCATE PARTITION empties the tuple; dropping a missing " +
      "partition refuses without IF EXISTS and no-ops with it") {
    ready
    sql("TRUNCATE TABLE graftpm.p.t PARTITION (day = 'd2', nk = 0)")
    assert(sql("SELECT count(*) AS n FROM graftpm.p.t " +
      "WHERE day = 'd2' AND nk = 0").as[Long].head() === 0L)
    intercept[Exception] {
      sql("ALTER TABLE graftpm.p.t DROP PARTITION (day = 'zz', nk = 7)")
    }
    // IF EXISTS: silent no-op, version unchanged
    val root = s"$warehouse/p/t"
    val v = Versioned.latestVersion(root).get
    sql("ALTER TABLE graftpm.p.t DROP IF EXISTS PARTITION " +
      "(day = 'zz', nk = 7)")
    assert(Versioned.latestVersion(root).get === v)
  }

  test("ADD PARTITION refuses loudly; an unpartitioned table has no " +
      "partition surface") {
    ready
    intercept[Exception] {
      sql("ALTER TABLE graftpm.p.t ADD PARTITION (day = 'd9', nk = 9)")
    }
    sql("CREATE TABLE graftpm.p.flat (id BIGINT)")
    intercept[Exception] {
      sql("SHOW PARTITIONS graftpm.p.flat")
    }
  }
}
