package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.ModelGraph._

class ModelGraphSpec extends SparkSpec {
  import spark.implicits._

  private def src = Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "k")

  test("executes nodes in dependency order across materializations") {
    val dir = Files.createTempDirectory("graft-graph").toString
    val nodes = Seq(
      Node("agg", Seq("staged"),
        f => f("staged").groupBy("k").agg(count(lit(1)).as("n")),
        Table(s"$dir/agg")),
      Node("staged", Seq("raw"), f => f("raw").filter($"id" > 1)))
    val out = ModelGraph.run(spark, nodes, Map("raw" -> src))
    assert(out("agg").as[(String, Long)].collect().toMap === Map("a" -> 1L, "b" -> 1L))
    assert(new java.io.File(s"$dir/agg").exists())
  }

  test("external export compacts to one file only under the size gate") {
    val dir = Files.createTempDirectory("graft-graph").toString
    def files(p: String) = new java.io.File(p).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val big = spark.range(1000).repartition(8).toDF()
    // under the gate: single-file contract holds
    ModelGraph.run(spark,
      Seq(Node("e1", Seq("raw"), f => f("raw"), External(s"$dir/one"))),
      Map("raw" -> big))
    assert(files(s"$dir/one") === 1)
    assert(spark.read.parquet(s"$dir/one").count() === 1000L)
    // over the gate: the write keeps its parallel layout — a big mart
    // must not funnel through one task for the single-file nicety
    ModelGraph.run(spark,
      Seq(Node("e2", Seq("raw"), f => f("raw"),
        External(s"$dir/many", maxSingleFileRows = 10))),
      Map("raw" -> big))
    assert(files(s"$dir/many") > 1)
    assert(spark.read.parquet(s"$dir/many").count() === 1000L)
  }

  test("rejects cycles and unknown dependencies") {
    intercept[IllegalArgumentException] {
      ModelGraph.topoOrder(Seq(
        Node("a", Seq("b"), f => f("b")),
        Node("b", Seq("a"), f => f("a"))), Set("raw"))
    }
    intercept[IllegalArgumentException] {
      ModelGraph.topoOrder(Seq(Node("a", Seq("missing"), f => f("missing"))), Set("raw"))
    }
  }
}
