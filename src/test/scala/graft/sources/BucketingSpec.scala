package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Proves the co-location claim at the plan level: a join between two
  * tables bucketed on the join key runs WITHOUT a shuffle exchange,
  * while the same join on plain tables needs two. */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    // Fresh session: warehouse dir + broadcast threshold are bound at
    // session build and getOrCreate would reuse another suite's session.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bucketing-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("join on bucketed tables elides the shuffle; plain tables shuffle") {
    import spark.implicits._
    val users = (1L to 1000L).map(i => (i, s"u$i")).toDF("user_id", "name")
    val orders = (1L to 5000L).map(i => (i % 1000 + 1, i * 1.5)).toDF("user_id", "amount")

    Bucketing.writeBucketed(users, "users_b", "user_id", 4)
    Bucketing.writeBucketed(orders, "orders_b", "user_id", 4)
    users.write.mode("overwrite").saveAsTable("users_p")
    orders.write.mode("overwrite").saveAsTable("orders_p")

    val bucketed = Bucketing.colocatedJoin(spark, "users_b", "orders_b", "user_id")
    val plain = Bucketing.colocatedJoin(spark, "users_p", "orders_p", "user_id")

    assert(Bucketing.isShuffleFree(bucketed),
      s"bucketed join should not shuffle:\n${bucketed.queryExecution.executedPlan}")
    assert(!Bucketing.isShuffleFree(plain),
      "plain join should require a shuffle exchange")
    // Same results either way.
    assert(bucketed.count() === plain.count())
  }
}
