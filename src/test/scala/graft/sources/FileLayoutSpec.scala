package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.Tables

class FileLayoutSpec extends SparkSpec {

  test("writeTargetSized caps file sizes via maxRecordsPerFile") {
    val dir = Files.createTempDirectory("graft-layout").resolve("t").toString
    val li = Tables.t(spark, sfDir, "lineitem")
    // Tiny target forces multiple files even at sf0.001.
    FileLayout.writeTargetSized(li, dir, targetBytes = 64 * 1024)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1, "expected the target size to split the write")
    // Round trip intact.
    assert(spark.read.parquet(dir).count() === li.count())
  }

  test("lake defaults set zstd + 128MB read splits") {
    FileLayout.applyLakeDefaults(spark)
    assert(spark.conf.get("spark.sql.parquet.compression.codec") === "zstd")
    assert(spark.conf.get("spark.sql.files.maxPartitionBytes").toLong === 128L * 1024 * 1024)
  }
}
