package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** TIMESTAMP AS OF must resolve to the version current at the asked
  * instant (last at-or-before, in version order), fail loudly before
  * the first retained version, ride the manifest's recorded publish
  * instant, and be reachable through the registered data source. */
class VersionedTimeTravelSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-vtt").toString + "/t"

  test("timestamp resolves per publish instant; pre-history fails") {
    val root = freshRoot()
    val t0 = System.currentTimeMillis() - 1
    Versioned.commit(spark, root,
      (1 to 10).map(i => (i.toLong, "v1")).toDF("id", "tag"))
    Thread.sleep(15)
    val betweenCommits = System.currentTimeMillis()
    Thread.sleep(15)
    Versioned.commit(spark, root,
      (11 to 30).map(i => (i.toLong, "v2")).toDF("id", "tag"))

    assert(Versioned.versionAsOfTimestamp(root, betweenCommits) === 1L)
    assert(Versioned.readTimestampAsOf(spark, root, betweenCommits)
      .count() === 10)
    assert(Versioned.versionAsOfTimestamp(root,
      System.currentTimeMillis()) === 2L)
    assert(Versioned.readTimestampAsOf(spark, root,
      System.currentTimeMillis()).count() === 30)
    val e = intercept[IllegalArgumentException] {
      Versioned.versionAsOfTimestamp(root, t0 - 1000000)
    }
    assert(e.getMessage.contains("predates"))
    // history surfaces the publish instants, nondecreasing
    val hist = Versioned.history(spark, root)
      .select("timestamp_millis").as[Long].collect().toSeq
    assert(hist.size === 2 && hist === hist.sorted && hist.head > t0)
  }

  test("the registered source honors timestampAsOf; both options refuse") {
    val root = freshRoot()
    Versioned.commit(spark, root,
      (1 to 5).map(i => (i.toLong, "a")).toDF("id", "tag"))
    Thread.sleep(15)
    val mid = System.currentTimeMillis()
    Thread.sleep(15)
    Versioned.commit(spark, root,
      (6 to 9).map(i => (i.toLong, "b")).toDF("id", "tag"))

    val pinned = spark.read.format(graft.sources.VersionedSource.Name)
      .option("path", root).option("timestampAsOf", mid.toString).load()
    assert(pinned.count() === 5)
    val e = intercept[IllegalArgumentException] {
      spark.read.format(graft.sources.VersionedSource.Name)
        .option("path", root)
        .option("timestampAsOf", mid.toString)
        .option("versionAsOf", "1").load()
    }
    assert(e.getMessage.contains("not both"))
  }
}
