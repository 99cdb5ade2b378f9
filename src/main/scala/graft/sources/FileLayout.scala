package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-layout discipline (reference: zstd parquet, 128 MB target files
  * — `05-run-all.sql:36-43`). Small-file proliferation is the lake
  * killer at 100 TB: listing, footer reads, and task scheduling all
  * scale with file count, so writes target a fixed file size.
  */
object FileLayout {

  /** Session configs matching the reference's table properties. */
  def applyLakeDefaults(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.parquet.compression.codec", "zstd")
    // Reader side: pack small files into ≤128 MB splits.
    spark.conf.set("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
  }

  /** Write with a bounded file count derived from a target file size:
    * rows-per-file = targetBytes / avgRowBytes (estimated from a sample
    * of the plan's output), enforced via maxRecordsPerFile so a skewed
    * partition still splits. */
  def writeTargetSized(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      targetBytes: Long = 128L * 1024 * 1024, sampleRows: Int = 1000): Unit = {
    val sample = df.limit(sampleRows)
    val sampled = sample.count()
    val avgRow = if (sampled == 0) 256L
      else math.max(16L,
        sample.queryExecution.optimizedPlan.stats.sizeInBytes.toLong / math.max(1L, sampled))
    val rowsPerFile = math.max(1000L, targetBytes / avgRow)
    val w = df.write.option("maxRecordsPerFile", rowsPerFile)
      .mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}
