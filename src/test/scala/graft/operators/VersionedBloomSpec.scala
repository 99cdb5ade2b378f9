package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.BloomFilter

/** Per-file manifest Bloom filters must prune point lookups that range
  * stats cannot (fully overlapping key ranges), while NEVER producing a
  * false negative — pruned reads stay row-exact for every present and
  * absent key, through both the operator API and the registered data
  * source. */
class VersionedBloomSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-vbloom").toString + "/t"

  // two batches with FULLY overlapping id ranges: odds then evens —
  // min/max stats are useless here, only the bloom can tell them apart
  private def oddEvenTable(): String = {
    val root = freshRoot()
    val odds = (1 to 2000 by 2).map(i => (i.toLong, s"odd-$i"))
      .toDF("id", "payload").coalesce(1)
    val evens = (2 to 2000 by 2).map(i => (i.toLong, s"even-$i"))
      .toDF("id", "payload").coalesce(1)
    Versioned.commit(spark, root, odds,
      statsCols = Seq("id"), bloomCols = Seq("id"))
    Versioned.commit(spark, root, evens,
      statsCols = Seq("id"), bloomCols = Seq("id"))
    root
  }

  test("bloom prunes files whose key range overlaps but key is absent") {
    val root = oddEvenTable()
    val v = Versioned.latestVersion(root).get
    assert(Versioned.candidateFiles(root, v, "id", 1L, 2000L).size === 2,
      "both files cover the full range — range pruning alone keeps both")
    // point lookups: the file NOT holding the parity must usually go
    val prunedCounts = (2 to 100 by 2).map { k =>
      Versioned.candidateFiles(root, v, "id", k.toLong, k.toLong).size
    }
    assert(prunedCounts.forall(_ >= 1), "a held key must keep its file")
    assert(prunedCounts.count(_ == 1) >= 45,
      s"bloom should prune the odd file for nearly all even keys; " +
        s"sizes were ${prunedCounts.groupBy(identity).view.mapValues(_.size).toMap}")
  }

  test("no false negatives: every present key reads back, pruned") {
    val root = oddEvenTable()
    (1 to 50).foreach { k =>
      val got = Versioned.readPruned(spark, root, "id", k.toLong, k.toLong)
        .select("payload").as[String].collect().toSeq
      val expect = if (k % 2 == 1) Seq(s"odd-$k") else Seq(s"even-$k")
      assert(got === expect, s"key $k must read back exactly")
    }
    // absent keys (outside the domain) return nothing — often with
    // ZERO files scanned (both blooms answer definitely-absent)
    val v = Versioned.latestVersion(root).get
    val absent = (3001L to 3020L)
    absent.foreach { k =>
      assert(Versioned.readPruned(spark, root, "id", k, k).count() === 0)
    }
    assert(absent.map(k =>
      Versioned.candidateFiles(root, v, "id", k, k).size).sum === 0,
      "absent keys outside min/max prune by range alone")
  }

  test("registered data source point query bloom-prunes and stays exact") {
    val root = oddEvenTable()
    val df = spark.read.format(graft.sources.VersionedSource.Name)
      .option("path", root).load()
    df.createOrReplaceTempView("vbloom")
    val row = spark.sql("SELECT payload FROM vbloom WHERE id = 42")
      .as[String].collect().toSeq
    assert(row === Seq("even-42"))
    // the scan uses the same candidateFilesForBounds the assert does
    val v = Versioned.latestVersion(root).get
    assert(Versioned.candidateFilesForBounds(root, v,
      Seq(Versioned.ColumnBound("id", Some(42L), Some(42L)))).size === 1,
      "the DSv2 EqualTo pushdown path must see the bloom-pruned set")
  }

  test("driver-side probe is bit-identical to the SQL probe") {
    val bits = 1 << 12
    val hashes = 3
    val keys = (1 to 500).map(i => s"key-$i")
    val words = keys.toDF("k")
      .agg(BloomFilter.bloom_build(col("k"), bits, hashes))
      .as[Seq[Long]].head().toIndexedSeq
    val probes = (1 to 500).map(i => s"key-$i") ++
      (1 to 500).map(i => s"other-$i")
    val sqlAnswers = probes.toDF("k")
      .withColumn("words", typedLit(words))
      .select(col("k"), BloomFilter.bloom_might_contain(
        col("words"), col("k"), bits, hashes).as("hit"))
      .as[(String, Boolean)].collect().toMap
    probes.foreach { p =>
      assert(BloomFilter.mightContain(words, p, bits, hashes)
        === sqlAnswers(p), s"driver and SQL probes disagree on $p")
    }
    keys.foreach(p =>
      assert(BloomFilter.mightContain(words, p, bits, hashes),
        s"present key $p must always hit"))
  }

  test("IN-list point lookups prune per value through the data source") {
    val root = oddEvenTable()
    val v = Versioned.latestVersion(root).get
    // all-even IN list: the odd file should fall to the blooms
    assert(Versioned.candidateFilesForBounds(root, v,
      Seq(Versioned.inBound("id", Seq(2L, 44L, 666L)))).size === 1,
      "every IN value is even — blooms must drop the odd file")
    // mixed parity keeps both; out-of-range values prune by stats alone
    assert(Versioned.candidateFilesForBounds(root, v,
      Seq(Versioned.inBound("id", Seq(2L, 3L)))).size === 2)
    assert(Versioned.candidateFilesForBounds(root, v,
      Seq(Versioned.inBound("id", Seq(5000L, 6000L)))).isEmpty)
    // end-to-end through the registered source: rows exact
    val df = spark.read.format(graft.sources.VersionedSource.Name)
      .option("path", root).load()
    df.createOrReplaceTempView("vbloom_in")
    val got = spark.sql(
      "SELECT payload FROM vbloom_in WHERE id IN (2, 44, 666) ORDER BY payload")
      .as[String].collect().toSeq
    assert(got === Seq("even-2", "even-44", "even-666"))
  }

  test("a 10^4-value IN prunes like the 64-value path, rows exact") {
    val root = oddEvenTable()
    val v = Versioned.latestVersion(root).get
    // 10^4 values, ALL even (in-domain evens + out-of-range evens):
    // pre-round-6 this list was past the pushdown cap and pruned
    // NOTHING; the compiled probe must drop the odd file via blooms
    // exactly like the 3-value list does
    val bigEven: Seq[Long] =
      (2L to 2000L by 2) ++ (100000L until 109000L by 1).map(_ * 2 + 100000)
    assert(bigEven.size > 9000)
    val t0 = System.nanoTime()
    val cand = Versioned.candidateFilesForBounds(root, v,
      Seq(Versioned.inBound("id", bigEven)))
    val planMs = (System.nanoTime() - t0) / 1e6
    assert(cand.size === 1,
      s"10^4-value all-even IN must bloom-prune the odd file, got $cand")
    assert(planMs < 2000.0,
      s"compiled IN probe must not stall planning (took $planMs ms)")
    // out-of-range-only big list prunes everything by range windows
    assert(Versioned.candidateFilesForBounds(root, v,
      Seq(Versioned.inBound("id", (500000L to 510000L).toSeq))).isEmpty)
    // end-to-end through the registered source with the big IN: the
    // pushed filter survives (no 64-value cap) and rows are exact
    val df = spark.read.format(graft.sources.VersionedSource.Name)
      .option("path", root).load()
    val got = df.filter(col("id").isin(bigEven: _*))
      .select("payload").as[String].collect().sorted
    assert(got.length === 1000, s"all 1000 in-domain evens, got ${got.length}")
    assert(got.forall(_.startsWith("even-")))
    // and a big STRING IN probes string blooms the same way
    val sroot = freshRoot()
    Versioned.commit(spark, sroot,
      (1 to 500).map(i => (s"odd-$i", i)).toDF("k", "n").coalesce(1),
      statsCols = Seq("k"), bloomCols = Seq("k"))
    Versioned.commit(spark, sroot,
      (1 to 500).map(i => (s"even-$i", i)).toDF("k", "n").coalesce(1),
      statsCols = Seq("k"), bloomCols = Seq("k"))
    val sv = Versioned.latestVersion(sroot).get
    val bigStr = (1 to 5000).map(i => s"even-$i") // only 500 exist
    assert(Versioned.candidateFilesForBounds(sroot, sv,
      Seq(Versioned.inBound("k", bigStr))).size === 1,
      "string blooms must drop the odd file for an all-even string IN")
  }

  test("optimize re-blooms packed files when asked; lookups stay exact") {
    val root = freshRoot()
    // keys ≡ 0 and ≡ 1 (mod 3) in two small bloomed commits; keys ≡ 2
    // are IN-RANGE but absent — after packing, only the rebuilt bloom
    // can prune those point probes (range covers everything)
    val zeros = (0 to 3000 by 3).map(i => (i.toLong, s"z-$i"))
      .toDF("id", "payload").coalesce(1)
    val ones = (1 to 3000 by 3).map(i => (i.toLong, s"o-$i"))
      .toDF("id", "payload").coalesce(1)
    Versioned.commit(spark, root, zeros,
      statsCols = Seq("id"), bloomCols = Seq("id"))
    Versioned.commit(spark, root, ones,
      statsCols = Seq("id"), bloomCols = Seq("id"))
    val v = Versioned.optimize(spark, root, targetBytes = 1L << 30,
      statsCols = Seq("id"), bloomCols = Seq("id"))
    assert(Versioned.files(root, v).size === 1, "packed into one file")
    val absentPruned = (2 to 300 by 3).count { k =>
      Versioned.candidateFiles(root, v, "id", k.toLong, k.toLong).isEmpty
    }
    assert(absentPruned >= 90,
      s"rebuilt bloom should prune nearly all in-range absent keys, got $absentPruned/100")
    (0 to 30).foreach { k =>
      val n = Versioned.readPruned(spark, root, "id", k.toLong, k.toLong).count()
      assert(n === (if (k % 3 == 2) 0L else 1L), s"key $k row count")
    }
  }

  test("cross-typed probes never consult the bloom (false-negative guard)") {
    // a DOUBLE column renders "42.0" at build time; a long-valued probe
    // would hash "42" — the type-witness check must skip the bloom and
    // keep the file rather than wrongly prune it
    val root = freshRoot()
    val df = (1 to 100).map(i => (i.toDouble, s"d-$i")).toDF("dv", "payload")
      .coalesce(1)
    Versioned.commit(spark, root, df,
      statsCols = Seq("dv"), bloomCols = Seq("dv"))
    val v = Versioned.latestVersion(root).get
    assert(Versioned.candidateFiles(root, v, "dv", 42L, 42L).size === 1,
      "double-column point probe must keep the file (bloom skipped)")
    assert(Versioned.readPruned(spark, root, "dv", 42.0, 42.0).count() === 1)
  }

  test("blooms survive compaction-free verbs and absent blooms stay safe") {
    val root = freshRoot()
    // one bloomed commit, one un-bloomed append: mixed manifests must
    // keep un-bloomed files for any point probe
    Versioned.commit(spark, root,
      (1 to 100).map(i => (i.toLong, "a")).toDF("id", "tag").coalesce(1),
      statsCols = Seq("id"), bloomCols = Seq("id"))
    Versioned.commit(spark, root,
      (1 to 100).map(i => (i.toLong, "b")).toDF("id", "tag").coalesce(1),
      statsCols = Seq("id"))
    val v = Versioned.latestVersion(root).get
    assert(Versioned.candidateFiles(root, v, "id", 7L, 7L).size === 2,
      "un-bloomed file is conservatively kept")
    assert(Versioned.readPruned(spark, root, "id", 7L, 7L).count() === 2)
  }
}
