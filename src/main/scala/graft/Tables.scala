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
    * `events.ts` has shipped in two generations of the driver's testdata:
    * INT64 TIMESTAMP(NANOS) (which Spark's reader rejects — read raw via
    * the legacy conf and integer-truncate ns→µs, matching DuckDB's µs
    * surfacing; `div` because ns epochs exceed double's 2^53) and plain
    * µs TIMESTAMP (isAdjustedToUTC=false → TIMESTAMP_NTZ in Spark 4).
    * Adapt on the observed type; both paths end in session-zone
    * TimestampType with identical µs values, so every downstream query
    * and oracle is generation-independent.
    */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ =>
          df.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view (for spark.sql-expressed queries). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
}
