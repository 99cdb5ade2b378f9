package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Debezium-style CDC envelope processing (reference S14/ST10: raw WAL
  * JSON lands in Bronze; downstream takes `payload.after`, filters by
  * op-code, and applies deletes).
  *
  * Works identically on batch and streaming frames — the envelope parse
  * is a stateless projection.
  */
object Cdc {

  /** Parse raw envelope JSON into (op, ts_ms, before, after) columns. */
  def parseEnvelope(raw: DataFrame, jsonCol: String, rowSchema: StructType): DataFrame = {
    val payload = new StructType()
      .add("op", StringType)
      .add("ts_ms", org.apache.spark.sql.types.LongType)
      .add("before", rowSchema)
      .add("after", rowSchema)
    val envelope = new StructType().add("payload", payload)
    raw.withColumn("_env", from_json(col(jsonCol), envelope))
      .select(
        col("_env.payload.op").as("op"),
        col("_env.payload.ts_ms").as("ts_ms"),
        col("_env.payload.before").as("before"),
        col("_env.payload.after").as("after"))
  }

  /** Current-state projection: creates/updates surface `after.*`, deletes
    * drop the row (reference takes payload.after with op-code filter). */
  def currentRows(envelopes: DataFrame): DataFrame =
    envelopes.filter(col("op").isin("c", "u", "r"))
      .select(col("after.*"))

  /** Apply a CDC batch onto a keyed snapshot: last envelope per key wins
    * (by ts_ms), deletes remove. */
  def applyBatch(envelopes: DataFrame, key: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Key from `after` for creates/updates, from `before` for deletes —
    // guarded with isNotNull on the struct itself (a struct of null
    // FIELDS is non-null, so coalesce over the two structs would never
    // fall through to `before`).
    val keyed = envelopes.withColumn("_k",
      when(col("after").isNotNull, struct(key.map(k => col(s"after.$k")): _*))
        .otherwise(struct(key.map(k => col(s"before.$k")): _*)))
    val w = Window.partitionBy("_k").orderBy(col("ts_ms").desc)
    keyed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("op") =!= "d")
      .select(col("after.*"))
  }
}
