package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV seed loading with declared column types (reference S12: dbt seeds
  * are 4 small lookup CSVs with explicit types in dbt_project.yml —
  * schemas are always declared, never inferred).
  */
object Seeds {

  def loadCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Event-type lookup seed (the analog of payment_type_lookup.csv). */
  val eventTypeLookupSchema: StructType = StructType.fromDDL(
    "event_type STRING, type_name STRING, is_billable BOOLEAN")

  def eventTypeLookup(spark: SparkSession): DataFrame = {
    val local = new java.io.File("seeds/event_type_lookup.csv")
    val path = if (local.exists()) local.getAbsolutePath
      else "/root/repo/seeds/event_type_lookup.csv"
    loadCsv(spark, path, eventTypeLookupSchema)
  }
}
