package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions must register on a FRESH session (functions are bound
  * at session build), so this suite builds its own instead of SparkSpec's. */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate would return another suite's session and silently skip
    // withExtensions — force a fresh session (shares the SparkContext).
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("dot_product is callable from SQL") {
    val v = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(v === 32.0)
  }

  test("simhash_bits is callable from SQL and matches the Column API") {
    val sqlV = spark.sql(
      "SELECT simhash_bits(array(123456789L, 987654321L), 60) AS h")
      .head().getLong(0)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val colV = Seq(Seq(123456789L, 987654321L)).toDF("h")
      .select(graft.functions.expressions.SimHashBits.simhash_bits(col("h"), 60))
      .head().getLong(0)
    assert(sqlV === colV)
  }

  test("rolling_fingerprint is callable from SQL and matches the Column API") {
    val text = "the quick brown fox jumps over the lazy dog"
    val sqlV = spark.sql(
      s"SELECT rolling_fingerprint('$text', 16, 8) AS f")
      .head().getSeq[Long](0)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val colV = Seq(text).toDF("t")
      .select(graft.functions.expressions.RollingFingerprint
        .rolling_fingerprint(col("t"), 16, 8))
      .head().getSeq[Long](0)
    assert(sqlV === colV && sqlV.nonEmpty)
  }

  test("simhash64 is callable from SQL and matches the Column API") {
    val sqlV = spark.sql("SELECT simhash64(array('spark', 'engine')) AS h")
      .head().getLong(0)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val colV = Seq(Seq("spark", "engine")).toDF("t")
      .select(graft.functions.expressions.SimHash64.simhash64(col("t")))
      .head().getLong(0)
    assert(sqlV === colV)
  }
}
