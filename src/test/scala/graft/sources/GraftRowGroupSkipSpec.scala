package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Versioned

/** Parquet pushdown INSIDE the native scan's reader: pushed filters
  * (translated to physical names, typed per file at the task) make the
  * vectorized reader skip row groups by footer stats — the standard
  * scan's intra-file skipping, on top of the manifest's file-grain
  * prune. Results never depend on it (Spark re-applies every filter
  * above the scan), and positions stay file-absolute because the
  * vectorized path takes them from the skipping-aware row-index
  * generator. */
class GraftRowGroupSkipSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-rgskip-wh").toString
    spark.conf.set("spark.sql.catalog.graftrg",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftrg.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftrg.s")
    w
  }

  private def sql(s: String) = { warehouse; spark.sql(s) }

  private def withConf[A](kv: (String, String)*)(f: => A): A = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // one SORTED single-file table with many small row groups — the
  // shape where footer stats make point lookups skip almost everything
  private lazy val root: String = {
    sql("CREATE TABLE graftrg.s.t (id BIGINT, v DOUBLE)")
    val r = s"$warehouse/s/t"
    withConf("spark.hadoop.parquet.block.size" -> "65536") {
      Versioned.commit(spark, r,
        (0 until 60000).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
          .coalesce(1))
    }
    r
  }

  test("a point filter reads ONE row group of a many-group file " +
      "(reader-level skipping), and the answer is unchanged") {
    val v = Versioned.latestVersion(root).get
    val fileRows = 60000L
    // reader-level truth: rows MATERIALIZED by the vectorized reader
    // under the pushed predicate, counted beneath Spark's re-filter
    def materialized(pred: Option[org.apache.spark.sql.sources.Filter])
        : Long = {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType)))
      val base = org.apache.spark.sql.GraftParquetIO
        .taskReadConf(spark, schema)
      val pd = org.apache.spark.sql.GraftParquetIO
        .filterPushdown(spark, pred.toSeq)
      val path = new java.io.File(root,
        Versioned.files(root, v).head).getPath
      val conf = org.apache.spark.sql.GraftParquetIO
        .rowGroupFilterConf(base.value, path, pd)
      val r = org.apache.spark.sql.GraftParquetIO.openColumnarReader(
        conf, path, 0L, Long.MaxValue, 4096, None)
      try {
        var n = 0L
        while (r.nextBatch()) n += r.resultBatch().numRows()
        n
      } finally r.close()
    }
    assert(materialized(None) === fileRows)
    val skipped = materialized(
      Some(org.apache.spark.sql.sources.EqualTo("id", 123L)))
    // sequential longs delta-encode to almost nothing, so the 64 KB
    // block target still yields few (large-row-count) groups — the
    // point lookup must materialize at most ONE of them
    assert(skipped <= fileRows / 2,
      s"footer stats must skip row groups, materialized $skipped")
    assert(skipped > 0L)
    // end-to-end: identical answers with the reader pushdown on/off
    val q = "SELECT id, v FROM graftrg.s.t WHERE id IN (123, 40123)"
    val on = sql(q).as[(Long, Double)].collect().toSet
    val off = withConf("spark.sql.parquet.filterPushdown" -> "false") {
      sql(q).as[(Long, Double)].collect().toSet
    }
    assert(on === off)
    assert(on === Set((123L, 123.0), (40123L, 40123.0)))
  }

  test("row-group skipping composes with deletion vectors and _pos: " +
      "positions stay FILE-ABSOLUTE when earlier groups are skipped") {
    root
    spark.conf.set("spark.graft.rowlevel.mode", "mor")
    try sql("DELETE FROM graftrg.s.t WHERE id = 40124")
    finally spark.conf.unset("spark.graft.rowlevel.mode")
    // the filter lands mid-file: groups before id≈40k skip, yet _pos
    // must still equal the row's absolute index (== id here)
    val got = sql("SELECT id, _pos FROM graftrg.s.t " +
      "WHERE id >= 40120 AND id <= 40130 ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(got.map(_._1) === (40120L to 40130L).filterNot(_ == 40124L))
    got.foreach { case (id, pos) =>
      assert(pos === id, s"position must be file-absolute for id $id")
    }
    // and the same read with reader pushdown OFF agrees byte-for-byte
    val off = withConf("spark.sql.parquet.filterPushdown" -> "false") {
      sql("SELECT id, _pos FROM graftrg.s.t " +
        "WHERE id >= 40120 AND id <= 40130 ORDER BY id")
        .as[(Long, Long)].collect().toSeq
    }
    assert(off === got)
  }

  test("column mapping: a filter on a RENAMED column still skips " +
      "(physical-name translation), and older files lacking a column " +
      "simply don't translate") {
    sql("CREATE TABLE graftrg.s.ren (id BIGINT, amount DOUBLE)")
    val r = s"$warehouse/s/ren"
    withConf("spark.hadoop.parquet.block.size" -> "65536") {
      Versioned.commit(spark, r,
        (0 until 30000).map(i => (i.toLong, i * 2.0))
          .toDF("id", "amount").coalesce(1))
    }
    sql("ALTER TABLE graftrg.s.ren RENAME COLUMN amount TO bal")
    // schema evolution: a new column only the NEXT file carries
    sql("ALTER TABLE graftrg.s.ren ADD COLUMNS (tag STRING)")
    sql("INSERT INTO graftrg.s.ren VALUES (99999, 1.0, 'x')")
    val q = "SELECT id, bal FROM graftrg.s.ren " +
      "WHERE bal = 246.0 AND tag IS NULL"
    val on = sql(q).as[(Long, Double)].collect().toSeq
    val off = withConf("spark.sql.parquet.filterPushdown" -> "false") {
      sql(q).as[(Long, Double)].collect().toSeq
    }
    assert(on === off)
    assert(on === Seq((123L, 246.0)))
  }
}
