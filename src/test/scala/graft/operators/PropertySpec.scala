package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.streaming.Sessionize

/** Property-based invariants over randomized inputs (ScalaCheck
  * generators sampled with fixed seeds — the scalatest bridge isn't on
  * the offline classpath) — structural guarantees that must hold for
  * ANY data, not just fixtures. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic samples from a generator (seeded, reproducible). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val wordGen = Gen.oneOf("spark", "query", "engine", "fast", "data",
    "row", "column", "join", "scan", "merge")
  private val docGen = Gen.chooseNum(3, 24)
    .flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))
  private val corpusGen = Gen.chooseNum(2, 12)
    .flatMap(n => Gen.listOfN(n, docGen))

  test("property: LSH near-dup pairs are always a subset of exact jaccard pairs") {
    samples(corpusGen, 5).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
        .select("i", "j").as[(Long, Long)].collect().toSet
      val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.5)
        .select("i", "j").as[(Long, Long)].collect().toSet
      assert(lsh.subsetOf(exact))
    }
  }

  test("property: sessionization partitions events exactly (Σ n_events = |events|)") {
    val eventsGen = for {
      n <- Gen.chooseNum(1, 50)
      rows <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 5L)
        off <- Gen.chooseNum(0L, 86000L)
      } yield (u, new java.sql.Timestamp(1704067200000L + off * 1000), 1.0))
    } yield rows
    samples(eventsGen, 5).foreach { rows =>
      val df = rows.toDF("user_id", "ts", "value")
      val sessions = Sessionize.sessionsBatch(df, gapMinutes = 30)
      val total = sessions.agg(org.apache.spark.sql.functions.sum("n_events"))
        .head().getLong(0)
      assert(total === rows.size.toLong)
    }
  }

  test("property: mergeUpsert is idempotent for any batch") {
    val batchGen = Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1L, 8L).map(k => (k, s"v$k"))))
    samples(batchGen, 5).foreach { rows =>
      val path = java.nio.file.Files.createTempDirectory("graft-prop")
        .resolve("t").toString
      val batch = rows.toDF("id", "v").dropDuplicates("id")
      Mutation.mergeUpsert(spark, path, batch, Seq("id"))
      val c1 = spark.read.parquet(path).count()
      Mutation.mergeUpsert(spark, path, batch, Seq("id"))
      val c2 = spark.read.parquet(path).count()
      assert(c1 === c2)
      assert(c1 === batch.count())
    }
  }
}
