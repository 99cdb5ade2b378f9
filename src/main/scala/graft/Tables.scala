package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Schemas are fixed parquet (see FIXTURES.md / SURVEY §1.3 — the reference
  * declares schemas explicitly and never infers from JSON at runtime;
  * parquet carries its own schema so a read here is already "declared").
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from a scale-factor directory.
    *
    * `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark's reader
    * rejects; read it as a raw long (legacy conf) and truncate to
    * microsecond precision — exactly what DuckDB does on read (its parquet
    * reader surfaces the column as µs TIMESTAMP), so oracle parity holds.
    * Integer `div` keeps the arithmetic exact (ns epoch values exceed
    * double's 2^53 integer range).
    */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view (for spark.sql-expressed queries). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
}
