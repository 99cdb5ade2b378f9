package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order clustering: the Morton math on fixtures, and the property
  * that justifies its existence — measured multi-column file skipping
  * from parquet footer stats, against a single-key sort baseline.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: hand-computed Morton codes") {
    // (x=0b11, y=0b01, 2 bits) → bit layout y1 x1 y0 x0 = 0b0111 = 7
    val got = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y")), 2).as("z"))
      .as[Long].head()
    assert(got === 7L)
    // single column degenerates to the identity
    val id = Seq((5L, 0L)).toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x")), 3).as("z")).as[Long].head()
    assert(id === 5L)
  }

  test("rank scales to [0, 2^bits) with null/degenerate guards") {
    val df = Seq[(java.lang.Long, Int)]((0L, 0), (50L, 1), (100L, 2), (null, 3))
      .toDF("v", "i")
    val got = df.select(col("i"),
        ZOrder.rank(col("v"), lit(0L), lit(100L), 8).as("r"))
      .as[(Int, Long)].collect().toMap
    assert(got(0) === 0L)
    assert(got(1) === 127L)          // floor(0.5 * 255)
    assert(got(2) === 255L)
    assert(got(3) === 0L)            // null → rank 0
    // degenerate range: everything at 0, no division by zero
    val deg = df.filter(col("v").isNotNull)
      .select(ZOrder.rank(col("v"), lit(7L), lit(7L), 8).as("r"))
      .as[Long].collect()
    assert(deg.forall(_ === 0L))
  }

  test("cluster tolerates an all-null column (degenerate rank, no crash)") {
    val df = spark.range(100).select(col("id").as("x"),
      lit(null).cast("long").as("y"))
    val out = ZOrder.cluster(df, Seq("x", "y"), nOut = 2)
    assert(out.count() === 100)
  }

  test("z-ordered compaction skips files on BOTH columns; single-key sort only on one") {
    // two independent uniform dimensions — the multi-filter workload
    val n = 40000L
    val data = spark.range(n).select(
      (col("id") % 200).as("x"),
      ((col("id") * 7919 + 13) % 200).as("y"),
      col("id").as("payload"))

    def overlapping(path: String, column: String, lo: Long, hi: Long): Int =
      ZOrder.fileRanges(spark, path, column)
        .count { case (_, mn, mx) => mn <= hi && mx >= lo }

    def writeSmallFiles(path: String): Unit =
      data.repartition(16).write.mode("overwrite").parquet(path)

    val zPath = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    writeSmallFiles(zPath)
    assert(ZOrder.compact(spark, zPath, Seq("x", "y"), targetBytes = 64 * 1024))
    val zFiles = ZOrder.fileRanges(spark, zPath, "x").size
    assert(zFiles >= 4, s"need several output files to measure skipping, got $zFiles")

    val sPath = java.nio.file.Files.createTempDirectory("sorted").toString + "/t"
    writeSmallFiles(sPath)
    assert(Mutation.compact(spark, sPath, targetBytes = 64 * 1024,
      clusterBy = Some("x")))
    val sFiles = ZOrder.fileRanges(spark, sPath, "x").size

    // content identical to the source under both layouts
    val want = data.as[(Long, Long, Long)].collect().toSet
    assert(spark.read.parquet(zPath).as[(Long, Long, Long)].collect().toSet === want)
    assert(spark.read.parquet(sPath).as[(Long, Long, Long)].collect().toSet === want)

    // a narrow y-filter: x-sorted layout cannot skip anything (every
    // file spans the full y domain); z-order must skip a real fraction
    val zHit = overlapping(zPath, "y", 0, 24)
    val sHit = overlapping(sPath, "y", 0, 24)
    assert(sHit === sFiles, s"x-sort unexpectedly skipped y files ($sHit/$sFiles)")
    assert(zHit < zFiles, s"z-order skipped nothing on y ($zHit/$zFiles)")
    assert(zHit.toDouble / zFiles <= 0.75,
      s"z-order y-skip too weak: $zHit/$zFiles files overlap y∈[0,24]")
    // and x stays prunable too (partial ranges, not destroyed)
    val zx = overlapping(zPath, "x", 0, 24)
    assert(zx < zFiles, s"z-order lost x prunability ($zx/$zFiles)")
  }
}
