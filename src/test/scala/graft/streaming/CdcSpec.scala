package graft.streaming

import org.apache.spark.sql.types.StructType

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val rowSchema = StructType.fromDDL("id BIGINT, zone STRING")

  private def env(op: String, tsMs: Long, before: String, after: String) =
    s"""{"payload":{"op":"$op","ts_ms":$tsMs,"before":$before,"after":$after}}"""

  private lazy val envelopes = Seq(
    env("c", 1000, "null", """{"id":1,"zone":"NYC"}"""),
    env("u", 2000, """{"id":1,"zone":"NYC"}""", """{"id":1,"zone":"Brooklyn"}"""),
    env("c", 1500, "null", """{"id":2,"zone":"LA"}"""),
    env("d", 3000, """{"id":2,"zone":"LA"}""", "null")
  ).toDF("raw")

  test("parseEnvelope surfaces op/ts_ms/before/after") {
    val parsed = Cdc.parseEnvelope(envelopes, "raw", rowSchema)
    assert(parsed.columns.toSeq === Seq("op", "ts_ms", "before", "after"))
    assert(parsed.filter($"op" === "u").head().getAs[org.apache.spark.sql.Row]("after")
      .getAs[String]("zone") === "Brooklyn")
  }

  test("applyBatch: last change per key wins, deletes drop the row") {
    val parsed = Cdc.parseEnvelope(envelopes, "raw", rowSchema)
    val state = Cdc.applyBatch(parsed, Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(state === Map(1L -> "Brooklyn")) // id 2 deleted at ts 3000
  }

  test("currentRows filters creates/updates/reads only") {
    val parsed = Cdc.parseEnvelope(envelopes, "raw", rowSchema)
    assert(Cdc.currentRows(parsed).count() === 3)
  }
}
