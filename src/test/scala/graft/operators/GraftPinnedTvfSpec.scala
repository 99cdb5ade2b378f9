package graft.operators

import java.nio.file.Files
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The coordinated-read SQL surface: `graft_pinned` must resolve
  * through the coordinator's PIN SET (never "latest"), and a
  * multi-table join anchored to one coordinator version must never
  * observe a torn cross-table pair, no matter how transactions race —
  * pin files are immutable, so an anchored read cannot straddle a
  * pin-set swap. */
class GraftPinnedTvfSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft-pintvf-$tag").toString + "/t"

  test("graft_pinned reads the PIN, not latest; graft_pins lists the set") {
    graft.GraftExtensions.registerFunctions(spark)
    val (a, coord) = (fresh("a"), fresh("c"))
    MultiTable.transact(coord) { _ =>
      Seq(a -> Versioned.commit(spark, a,
        (1 to 10).map(i => (i.toLong, "pinned")).toDF("id", "tag")))
    }
    // an UNPINNED later version must stay invisible to the TVF
    Versioned.commit(spark, a,
      (11 to 20).map(i => (i.toLong, "orphan")).toDF("id", "tag"))
    val got = spark.sql(
      s"SELECT tag, count(*) AS n FROM graft_pinned('$coord', '$a') " +
        "GROUP BY tag").as[(String, Long)].collect().toMap
    assert(got === Map("pinned" -> 10L))
    val pins = spark.sql(s"SELECT * FROM graft_pins('$coord')")
      .as[(Long, String, Long)].collect().toSeq
    assert(pins === Seq((1L, a, 1L)))
  }

  test("anchored multi-table joins never tear under racing transactions") {
    graft.GraftExtensions.registerFunctions(spark)
    val (a, b, coord) = (fresh("ra"), fresh("rb"), fresh("rc"))
    def gen(root: String, g: Long) =
      Versioned.commit(spark, root,
        (1 to 5).map(i => (i.toLong, g)).toDF("id", "gen"),
        mode = "overwrite")
    MultiTable.transact(coord) { _ => Seq(a -> gen(a, 0), b -> gen(b, 0)) }

    val pool = Executors.newFixedThreadPool(1)
    try {
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      val writer = Future {
        (1 to 6).foreach { g =>
          MultiTable.transact(coord) { _ =>
            Seq(a -> gen(a, g), b -> gen(b, g))
          }
        }
      }
      // reader: anchor BOTH reads to one coordinator version fetched
      // once — the invariant is that a and b always show the SAME
      // generation, however the writer interleaves
      (1 to 10).foreach { _ =>
        val cv = spark.sql(
          s"SELECT max(coord_version) FROM graft_pins('$coord')")
          .as[Long].head()
        val gens = spark.sql(
          s"""SELECT DISTINCT x.gen AS ga, y.gen AS gb
             |FROM graft_pinned('$coord', '$a', $cv) x
             |JOIN graft_pinned('$coord', '$b', $cv) y ON x.id = y.id"""
            .stripMargin).as[(Long, Long)].collect().toSeq
        assert(gens.size === 1, s"torn read: $gens")
        assert(gens.head._1 === gens.head._2,
          s"a and b must show one generation, got $gens")
      }
      Await.result(writer, 3.minutes)
    } finally pool.shutdown()
    // after the dust settles: both at the final generation
    val fin = spark.sql(
      s"""SELECT DISTINCT x.gen, y.gen
         |FROM graft_pinned('$coord', '$a') x
         |JOIN graft_pinned('$coord', '$b') y ON x.id = y.id"""
        .stripMargin).as[(Long, Long)].collect().toSeq
    assert(fin === Seq((6L, 6L)))
  }
}
