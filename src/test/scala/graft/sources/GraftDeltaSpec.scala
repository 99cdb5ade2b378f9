package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Versioned

/** Delta-based (merge-on-read) bare-SQL row-level operations —
  * `SupportsDelta`: a small mutation in a large table publishes
  * deletion-vector positions + tiny insert files while every existing
  * data file carries by IDENTITY. */
class GraftDeltaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-delta-wh").toString
    spark.conf.set("spark.sql.catalog.graftd",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftd.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftd.d")
    w
  }

  private def sql(s: String) = { warehouse; spark.sql(s) }

  private def inMor[A](f: => A): A = {
    spark.conf.set("spark.graft.rowlevel.mode", "mor")
    try f finally spark.conf.unset("spark.graft.rowlevel.mode")
  }

  test("a 1-row bare-SQL UPDATE under mor publishes only DV metadata " +
      "and a tiny file — every data file carries by identity") {
    sql("CREATE TABLE graftd.d.upd (id BIGINT, v DOUBLE)")
    val root = s"$warehouse/d/upd"
    (0 until 3).foreach { k =>
      Versioned.commit(spark, root,
        (k * 1000 until (k + 1) * 1000).map(i => (i.toLong, i * 1.0))
          .toDF("id", "v").coalesce(1), statsCols = Seq("id"))
    }
    val before = Versioned.files(root, Versioned.latestVersion(root).get)
    assert(before.size === 3)
    inMor { sql("UPDATE graftd.d.upd SET v = -1.0 WHERE id = 1500") }
    val v = Versioned.latestVersion(root).get
    val after = Versioned.files(root, v)
    // ALL pre-existing files carried by identity; exactly one tiny
    // postimage file appended
    assert(before.toSet.subsetOf(after.toSet),
      s"delta must carry every data file: before=$before after=$after")
    assert(after.size === before.size + 1)
    // results: the updated row moved, everything else intact
    assert(sql("SELECT v FROM graftd.d.upd WHERE id = 1500")
      .as[Double].head() === -1.0)
    assert(sql("SELECT count(*) AS n FROM graftd.d.upd")
      .as[Long].head() === 3000L)
    assert(sql("SELECT sum(v) AS s FROM graftd.d.upd").as[Double].head()
      === (0 until 3000).map(_ * 1.0).sum - 1500.0 - 1.0)
    // time travel reads the pre-update snapshot
    assert(sql(s"SELECT v FROM graftd.d.upd VERSION AS OF ${v - 1} " +
      "WHERE id = 1500").as[Double].head() === 1500.0)
    // history records the delta verb
    val m = Versioned.history(spark, root).filter(col("version") === v)
      .select("action").as[String].head()
    assert(m === "write-delta")
  }

  test("bare-SQL DELETE under mor: positions only, zero data files " +
      "written; the change feed replays delete envelopes") {
    sql("CREATE TABLE graftd.d.del (id BIGINT, v DOUBLE)")
    val root = s"$warehouse/d/del"
    Versioned.commit(spark, root,
      (0 until 100).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
        .coalesce(2), statsCols = Seq("id"))
    val before = Versioned.files(root, Versioned.latestVersion(root).get)
    inMor { sql("DELETE FROM graftd.d.del WHERE id % 10 = 3") }
    val v = Versioned.latestVersion(root).get
    assert(Versioned.files(root, v).toSet === before.toSet,
      "a pure delete appends no files")
    assert(sql("SELECT count(*) AS n FROM graftd.d.del")
      .as[Long].head() === 90L)
    assert(sql("SELECT count(*) AS n FROM graftd.d.del WHERE id % 10 = 3")
      .as[Long].head() === 0L)
    // CDF: the delta commit replays as delete envelopes, lazily
    val feed = Versioned.changeFeed(spark, root, v - 1, Some(v))
    assert(feed.filter(col("_change_type") === "delete").count() === 10L)
    assert(feed.filter(col("_change_type") === "insert").count() === 0L)
  }

  test("bare-SQL MERGE under mor: matched update, matched delete, not-" +
      "matched insert; CDF replays delete+insert envelopes") {
    sql("CREATE TABLE graftd.d.mrg (id BIGINT, v STRING)")
    val root = s"$warehouse/d/mrg"
    sql("INSERT INTO graftd.d.mrg VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val before = Versioned.files(root, Versioned.latestVersion(root).get)
    Seq((2L, "b2"), (3L, "DEL"), (9L, "new")).toDF("id", "nv")
      .createOrReplaceTempView("gd_src")
    inMor {
      sql("""MERGE INTO graftd.d.mrg t USING gd_src s ON t.id = s.id
            |WHEN MATCHED AND s.nv = 'DEL' THEN DELETE
            |WHEN MATCHED THEN UPDATE SET v = s.nv
            |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)"""
        .stripMargin)
    }
    assert(sql("SELECT id, v FROM graftd.d.mrg ORDER BY id")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b2"), (9L, "new")))
    val v = Versioned.latestVersion(root).get
    assert(before.toSet.subsetOf(Versioned.files(root, v).toSet))
    val feed = Versioned.changeFeed(spark, root, v - 1, Some(v))
    // update = delete+insert under the DV convention; plus the pure
    // delete (id 3) and the pure insert (id 9)
    assert(feed.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().toSet === Set(2L, 3L))
    assert(feed.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().toSet === Set(2L, 9L))
  }

  test("auto mode composes with the DV verbs: pending vectors route " +
      "bare SQL onto the delta path, which matches LIVE rows only") {
    sql("CREATE TABLE graftd.d.auto (id BIGINT, v DOUBLE)")
    val root = s"$warehouse/d/auto"
    sql("INSERT INTO graftd.d.auto VALUES " +
      (0 until 50).map(i => s"($i, $i.0)").mkString(", "))
    // a DV verb leaves pending vectors (delete evens)
    Versioned.deleteRows(spark, root, col("id") % 2 === 0)
    assert(sql("SELECT count(*) AS n FROM graftd.d.auto")
      .as[Long].head() === 25L)
    // NO conf set: auto must route onto the delta path (CoW would
    // refuse) and must match only live rows — id=2 is dv-deleted and
    // must NOT resurrect as an update postimage
    sql("UPDATE graftd.d.auto SET v = 100.0 WHERE id <= 3")
    assert(sql("SELECT id, v FROM graftd.d.auto WHERE id <= 4 ORDER BY id")
      .as[(Long, Double)].collect().toSeq ===
      Seq((1L, 100.0), (3L, 100.0)))
    assert(sql("SELECT count(*) AS n FROM graftd.d.auto")
      .as[Long].head() === 25L)
    // a second delta op on top of the first (vectors now two deep)
    sql("DELETE FROM graftd.d.auto WHERE v = 100.0")
    assert(sql("SELECT count(*) AS n FROM graftd.d.auto")
      .as[Long].head() === 23L)
    // compact materializes everything; results stable
    Versioned.compact(spark, root)
    assert(sql("SELECT count(*) AS n FROM graftd.d.auto")
      .as[Long].head() === 23L)
    assert(sql("SELECT count(*) AS n FROM graftd.d.auto WHERE v = 100.0")
      .as[Long].head() === 0L)
  }

  test("a WIDE delta delete spills positions to an executor-written " +
      "sidecar — the manifest carries references, not positions") {
    sql("CREATE TABLE graftd.d.wide (id BIGINT, v DOUBLE)")
    val root = s"$warehouse/d/wide"
    Versioned.commit(spark, root,
      (0 until 20000).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
        .coalesce(1))
    val before = Versioned.files(root, Versioned.latestVersion(root).get)
    inMor { sql("DELETE FROM graftd.d.wide WHERE id % 2 = 0") }
    assert(sql("SELECT count(*) AS n FROM graftd.d.wide")
      .as[Long].head() === 10000L)
    assert(Versioned.files(root,
      Versioned.latestVersion(root).get).toSet === before.toSet)
    // the sidecar exists on disk under dv/ and the inline manifest
    // position lists stayed empty (10k positions never crossed the
    // driver)
    val dvDir = new java.io.File(root, "dv")
    assert(dvDir.isDirectory && dvDir.listFiles().nonEmpty,
      "wide delete must write position sidecars")
    // and reads agree after a further 1-row op (sidecar + inline mix)
    sql("UPDATE graftd.d.wide SET v = -5.0 WHERE id = 7")
    assert(sql("SELECT v FROM graftd.d.wide WHERE id = 7")
      .as[Double].head() === -5.0)
    assert(sql("SELECT count(*) AS n FROM graftd.d.wide")
      .as[Long].head() === 10000L)
  }

  test("partitioned tables: delta inserts keep the one-tuple-per-file " +
      "invariant and partition verbs still work") {
    sql("CREATE TABLE graftd.d.part (id BIGINT, day STRING, v DOUBLE) " +
      "PARTITIONED BY (day)")
    val root = s"$warehouse/d/part"
    sql("INSERT INTO graftd.d.part VALUES " +
      "(1,'d1',1.0), (2,'d1',2.0), (3,'d2',3.0)")
    val before = Versioned.files(root, Versioned.latestVersion(root).get)
    Seq((3L, "d2", 30.0), (4L, "d3", 4.0)).toDF("id", "day", "nv")
      .createOrReplaceTempView("gdp_src")
    inMor {
      sql("""MERGE INTO graftd.d.part t USING gdp_src s
            |ON t.id = s.id AND t.day = s.day
            |WHEN MATCHED THEN UPDATE SET v = s.nv
            |WHEN NOT MATCHED THEN INSERT (id, day, v)
            |VALUES (s.id, s.day, s.nv)""".stripMargin)
    }
    assert(sql("SELECT id, day, v FROM graftd.d.part ORDER BY id")
      .as[(Long, String, Double)].collect().toSeq ===
      Seq((1L, "d1", 1.0), (2L, "d1", 2.0), (3L, "d2", 30.0),
        (4L, "d3", 4.0)))
    assert(before.toSet.subsetOf(Versioned.files(root,
      Versioned.latestVersion(root).get).toSet))
    // the appended postimage/insert files hold ONE tuple each →
    // after a compact materializes the vectors, partition overwrite
    // still prunes by tuple (pending DVs refuse it, by contract)
    Versioned.compact(spark, root,
      targetFiles = 3, statsCols = Seq("day"))
    Versioned.overwritePartitions(spark, root,
      Seq((9L, "d3", 0.0)).toDF("id", "day", "v"))
    assert(sql("SELECT id FROM graftd.d.part WHERE day = 'd3'")
      .as[Long].collect().toSet === Set(9L))
    assert(sql("SELECT count(*) AS n FROM graftd.d.part WHERE day = 'd1'")
      .as[Long].head() === 2L)
  }

  test("CHECK constraints bind on delta inserts; a violating UPDATE " +
      "publishes nothing") {
    sql("CREATE TABLE graftd.d.chk (id BIGINT, v DOUBLE)")
    val root = s"$warehouse/d/chk"
    sql("INSERT INTO graftd.d.chk VALUES (1, 1.0), (2, 2.0)")
    Versioned.addConstraint(spark, root, "v_pos", "v >= 0")
    val v = Versioned.latestVersion(root).get
    val e = intercept[Exception] {
      inMor { sql("UPDATE graftd.d.chk SET v = -9.0 WHERE id = 1") }
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("v_pos"), msgs)
    assert(Versioned.latestVersion(root) === Some(v))
    assert(sql("SELECT v FROM graftd.d.chk WHERE id = 1")
      .as[Double].head() === 1.0)
  }

  test("column-mapped tables: delta ops read physical and stage " +
      "postimages under the mapping") {
    sql("CREATE TABLE graftd.d.map (id BIGINT, amount DOUBLE)")
    val root = s"$warehouse/d/map"
    sql("INSERT INTO graftd.d.map VALUES (1, 10.0), (2, 20.0)")
    sql("ALTER TABLE graftd.d.map RENAME COLUMN amount TO bal")
    inMor { sql("UPDATE graftd.d.map SET bal = bal + 1.0 WHERE id = 2") }
    assert(sql("SELECT id, bal FROM graftd.d.map ORDER BY id")
      .as[(Long, Double)].collect().toSeq ===
      Seq((1L, 10.0), (2L, 21.0)))
    assert(Versioned.read(spark, root).orderBy("id")
      .as[(Long, Double)].collect().toSeq ===
      Seq((1L, 10.0), (2L, 21.0)))
  }

  test("a concurrent commit aborts the delta publish loudly; nothing " +
      "half-applies and the retry lands") {
    sql("CREATE TABLE graftd.d.race (id BIGINT, v DOUBLE)")
    val root = s"$warehouse/d/race"
    sql("INSERT INTO graftd.d.race VALUES (1, 1.0), (2, 2.0)")
    val prev = Versioned.coordinator
    var fired = false
    Versioned.coordinator =
      new graft.operators.ConditionalPutCoordinator(raceHook = { _ =>
        if (!fired) { fired = true
          Versioned.commit(spark, root, Seq((9L, 9.0)).toDF("id", "v"))
        }
      })
    try {
      val e = intercept[Exception] {
        inMor { sql("UPDATE graftd.d.race SET v = 0.0 WHERE id = 1") }
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msgs.contains("moved to version") ||
        msgs.contains("concurrent"), msgs)
    } finally Versioned.coordinator = prev
    assert(sql("SELECT id, v FROM graftd.d.race ORDER BY id")
      .as[(Long, Double)].collect().toSeq ===
      Seq((1L, 1.0), (2L, 2.0), (9L, 9.0)))
    inMor { sql("UPDATE graftd.d.race SET v = 0.0 WHERE id = 1") }
    assert(sql("SELECT v FROM graftd.d.race WHERE id = 1")
      .as[Double].head() === 0.0)
  }

  test("plain reads may project _pos and _file on a DV-pending table " +
      "— live rows only, positions file-absolute") {
    sql("CREATE TABLE graftd.d.pos (id BIGINT, v DOUBLE)")
    val root = s"$warehouse/d/pos"
    // ONE file so positions are deterministic 0..2
    Versioned.commit(spark, root,
      Seq((0L, 0.0), (1L, 1.0), (2L, 2.0)).toDF("id", "v").coalesce(1))
    val all = sql("SELECT id, _pos FROM graftd.d.pos ORDER BY _pos")
      .as[(Long, Long)].collect().toSeq
    assert(all.map(_._2) === Seq(0L, 1L, 2L))
    inMor { sql("DELETE FROM graftd.d.pos WHERE id = 1") }
    // the DV-aware read skips position 1 but keeps absolute indexes
    val live = sql("SELECT id, _pos, _file FROM graftd.d.pos ORDER BY _pos")
      .as[(Long, Long, String)].collect().toSeq
    assert(live.map(t => (t._1, t._2)) === Seq((0L, 0L), (2L, 2L)))
    assert(live.map(_._3).distinct.size === 1)
  }

  private def withConf[A](kv: (String, String)*)(f: => A): A = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("the DV-pending steady state keeps the VECTORIZED scan " +
      "(BatchScan…ColumnarToRow, live-row mapping); _pos is vectorized " +
      "and byte-identical to row-grain, across row groups AND splits") {
    sql("CREATE TABLE graftd.d.vec (id BIGINT, v DOUBLE)")
    val root = s"$warehouse/d/vec"
    // ONE data file with MANY row groups (tiny parquet block size) —
    // position arithmetic must hold across row-group boundaries
    withConf("spark.hadoop.parquet.block.size" -> "65536") {
      Versioned.commit(spark, root,
        (0 until 60000).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
          .coalesce(1))
    }
    // a WIDE mor delete (spills position sidecars) → DV-pending state
    inMor { sql("DELETE FROM graftd.d.vec WHERE id % 7 = 3") }
    // the DV-pending snapshot keeps the columnar plan — MoR's steady
    // state between compactions must not fall back to row-grain
    // (exchange-free query: AQE doesn't wrap it, the plan is direct)
    val phys = sql("SELECT id, v FROM graftd.d.vec WHERE v > 100.0")
      .queryExecution.executedPlan.toString
    assert(phys.contains("BatchScan"), phys)
    assert(phys.contains("ColumnarToRow"),
      s"a DV-pending read must stay vectorized:\n$phys")
    val (s, n) = sql("SELECT sum(v) AS s, count(*) AS n FROM graftd.d.vec")
      .as[(Double, Long)].head()
    val liveIds = (0 until 60000).filterNot(_ % 7 == 3)
    assert(n === liveIds.size.toLong)
    assert(math.abs(s - liveIds.map(_.toDouble).sum) < 1e-3)
    // _pos projections stay columnar too (the MoR matching-scan shape)
    def posRead(): Seq[(Long, Long)] =
      sql("SELECT id, _pos FROM graftd.d.vec WHERE id % 1000 < 3 " +
        "ORDER BY id").as[(Long, Long)].collect().toSeq
    val posPlanned = sql("SELECT id, _pos, _file FROM graftd.d.vec")
    val posPhys = posPlanned.queryExecution.executedPlan.toString
    assert(posPhys.contains("ColumnarToRow"),
      s"_pos must serve from the vectorized reader:\n$posPhys")
    val vectorizedPos = posRead()
    assert(vectorizedPos.nonEmpty)
    // positions are file-absolute: id i sits at row i in the one file,
    // deleted ids absent
    vectorizedPos.foreach { case (id, pos) =>
      assert(pos === id, s"file-absolute position expected for id $id")
      assert(id % 7 != 3, s"deleted id $id resurrected")
    }
    // row-grain reference: byte-identical positions
    val rowGrainPos = withConf(
      "spark.sql.parquet.enableVectorizedReader" -> "false") { posRead() }
    assert(vectorizedPos === rowGrainPos)
    // byte-range SPLITS keep positions file-absolute (the row-index
    // generator computes from row-group offsets, not split-local rows)
    val splitPos = withConf(
      "spark.sql.files.maxPartitionBytes" -> "65536",
      "spark.sql.files.openCostInBytes" -> "0") { posRead() }
    assert(splitPos === vectorizedPos)
  }
}
