package graft

import org.apache.spark.sql.SparkSession

/** SQL entry point: runs one SQL statement against the engine with the
  * test tables registered as views and GraftExtensions active (so
  * dot_product / simhash64 work from SQL).
  *
  * Usage: runMain graft.SqlRunner <sfDir> "<sql>"
  */
object SqlRunner {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, sql) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.registerAll(spark, sfDir)
    spark.sql(sql).show(50, truncate = false)
    spark.stop()
  }
}
