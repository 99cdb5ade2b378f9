package graft.operators

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** COPY INTO — idempotent batch file ingestion: the ledger (ingested
  * file identities) publishes in the SAME atomic manifest CAS as the
  * data, so re-runs are no-ops, incremental files ingest alone, and
  * every crash window retries cleanly with zero duplicate rows. */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def freshDirs(tag: String): (String, File) = {
    val base = Files.createTempDirectory(s"graft-copy-$tag").toString
    (s"$base/table", new File(s"$base/landing"))
  }

  private def land(dir: File, name: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("id", "s").coalesce(1).write.mode("overwrite")
      .parquet(new File(dir, name).getPath)

  test("same COPY twice is one version; a new file ingests alone") {
    val (root, src) = freshDirs("idem")
    land(src, "a.parquet", Seq((1L, "x"), (2L, "y")))
    val v1 = Versioned.copyInto(spark, root, src.getPath)
    assert(v1 === 1L)
    assert(Versioned.read(spark, root).count() === 2)
    // unchanged directory → NO-OP: same version, no new manifest
    assert(Versioned.copyInto(spark, root, src.getPath) === v1)
    assert(Versioned.versions(root) === Seq(1L))
    // one appended file → exactly its rows land, once
    land(src, "b.parquet", Seq((3L, "z")))
    val v2 = Versioned.copyInto(spark, root, src.getPath)
    assert(v2 === 2L)
    assert(Versioned.read(spark, root).orderBy("id")
      .select("id").as[Long].collect().toSeq === Seq(1L, 2L, 3L))
    // and the re-run of THAT is a no-op too
    assert(Versioned.copyInto(spark, root, src.getPath) === v2)
  }

  test("crash between ledger write and publish retries cleanly") {
    val (root, src) = freshDirs("crash")
    land(src, "a.parquet", Seq((1L, "x"), (2L, "y")))
    Versioned.copyIntoCrashHook =
      () => throw new RuntimeException("injected crash")
    try {
      intercept[RuntimeException] {
        Versioned.copyInto(spark, root, src.getPath)
      }
    } finally Versioned.copyIntoCrashHook = () => ()
    // nothing published: no version, so nothing counts as ingested
    assert(Versioned.versions(root).isEmpty)
    // the retry ingests everything exactly once (the orphaned ledger
    // from the crashed attempt is unreferenced debris, never read)
    val v = Versioned.copyInto(spark, root, src.getPath)
    assert(v === 1L)
    assert(Versioned.read(spark, root).count() === 2)
    assert(Versioned.copyInto(spark, root, src.getPath) === v)
  }

  test("ingestion memory survives unrelated commits AND vacuum " +
      "retention; force re-ingests; unreferenced ledgers sweep") {
    val (root, src) = freshDirs("vac")
    land(src, "a.parquet", Seq((1L, "x"), (2L, "y")))
    Versioned.copyInto(spark, root, src.getPath)
    // bury the copy commit under unrelated appends, then vacuum past it
    (1 to 4).foreach { i =>
      Versioned.commit(spark, root, Seq((100L + i, "z")).toDF("id", "s"))
    }
    Versioned.vacuum(root, keepVersions = 2, minAgeMs = 0L)
    assert(Versioned.versions(root) === Seq(4L, 5L))
    // the ledger reference INHERITED into the retained head — the
    // re-run is still a no-op (no silent re-ingest after maintenance)
    assert(Versioned.copyInto(spark, root, src.getPath) === 5L)
    assert(Versioned.read(spark, root).filter($"id" <= 2L).count() === 2)
    // the current ledger file survived the sweep; a planted orphan goes
    val copyDir = new java.io.File(root, "_graft_log/copy")
    val before = copyDir.listFiles().length
    java.nio.file.Files.write(
      new java.io.File(copyDir, "ledger-orphan.txt").toPath,
      "junk".getBytes("UTF-8"))
    Versioned.vacuum(root, keepVersions = 2, minAgeMs = 0L)
    assert(copyDir.listFiles().length === before,
      "referenced ledger must survive; orphan must sweep")
    assert(Versioned.copyInto(spark, root, src.getPath) ===
      Versioned.latestVersion(root).get)
    // force ignores the ledger: everything re-ingests deliberately
    Versioned.copyInto(spark, root, src.getPath, force = true)
    assert(Versioned.read(spark, root).filter($"id" <= 2L).count() === 4)
  }

  test("concurrent copies over one directory serialize: exactly one " +
      "ingests") {
    val (root, src) = freshDirs("occ")
    land(src, "a.parquet", Seq((1L, "x"), (2L, "y")))
    // the sniper runs a full competing COPY INTO inside the loser's
    // crash window (after its ledger staging, before its commit) —
    // the loser's pinned commit conflicts, retries, and finds the
    // winner already ingested everything
    var armed = true
    Versioned.copyIntoCrashHook = () => {
      if (armed) { armed = false
        Versioned.copyInto(spark, root, src.getPath)
      }
    }
    try {
      val v = Versioned.copyInto(spark, root, src.getPath)
      assert(v === 1L, "loser must settle on the winner's version")
    } finally Versioned.copyIntoCrashHook = () => ()
    assert(Versioned.versions(root) === Seq(1L))
    assert(Versioned.read(spark, root).count() === 2,
      "a lost race must never double-ingest")
  }

  test("a file rewritten in place re-ingests; SQL verb + CSV options") {
    val (root, src) = freshDirs("sql")
    src.mkdirs()
    Files.write(new File(src, "a.csv").toPath,
      "id,s\n1,x\n2,y\n".getBytes("UTF-8"))
    Versioned.sql(spark,
      s"COPY INTO `$root` FROM '${src.getPath}' FILEFORMAT = CSV " +
        "FORMAT_OPTIONS ('header' = 'true', 'inferSchema' = 'true')")
    assert(Versioned.read(spark, root).count() === 2)
    // rewrite the same file with MORE rows (length changes → new
    // identity → the whole file re-ingests, the Delta contract)
    Files.write(new File(src, "a.csv").toPath,
      "id,s\n1,x\n2,y\n3,z\n4,w\n".getBytes("UTF-8"))
    Versioned.sql(spark,
      s"COPY INTO `$root` FROM '${src.getPath}' FILEFORMAT = CSV " +
        "FORMAT_OPTIONS ('header' = 'true', 'inferSchema' = 'true')")
    assert(Versioned.read(spark, root).count() === 6)
    // `_`/`.`-prefixed names are never listed
    Files.write(new File(src, "_SUCCESS").toPath, Array.empty[Byte])
    Files.write(new File(src, ".hidden.csv").toPath,
      "id,s\n9,q\n".getBytes("UTF-8"))
    val verb = Versioned.sql(spark,
      s"COPY INTO `$root` FROM '${src.getPath}' FILEFORMAT = CSV " +
        "FORMAT_OPTIONS ('header' = 'true', 'inferSchema' = 'true')")
      .select("verb").as[String].head()
    assert(verb === "copy")
    assert(Versioned.read(spark, root).count() === 6)
  }

  test("a 100k-identity ledger probes via per-shard blooms — " +
      "incremental copies never materialize the cumulative set") {
    val (root, src) = freshDirs("scale")
    land(src, "a.parquet", Seq((1L, "x")))
    Versioned.copyInto(spark, root, src.getPath)
    // a synthetic 100k-file generation: the exact shard+index layout a
    // real ingest of 100k files would leave
    val synthetic = (1 to 100000).map(i =>
      s"/synthetic/landing/f$i.parquet|${i * 100L}|${1700000000000L + i}")
    Versioned.plantCopyLedger(spark, root, synthetic)
    val probe = Versioned.copyLedgerProbe(root)
    assert(probe.size === 2, "one real + one planted generation")
    val bigShard = probe.map(_._1).find(_.contains("planted")).get
    // pick a landing file name whose identity the big shard's bloom
    // provably MISSES (deterministic: blooms are content-hashed; the
    // retry only guards the ~1% false-positive case)
    val bigMight = probe.find(_._1 == bigShard).get._2
    def firstPart(d: File): File =
      d.listFiles().filter(_.getName.endsWith(".parquet")).head
    val name = (1 to 50).map(i => s"b$i.parquet").find { n =>
      land(src, n, Seq((2L, "y")))
      val f = firstPart(new File(src, n))
      val miss = !bigMight(
        s"${f.getAbsolutePath}|${f.length()}|${f.lastModified()}")
      if (!miss) { // rare bloom fp: discard this candidate file
        def rm(f: File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(new File(src, n))
      }
      miss
    }.get
    assert(name.nonEmpty)
    val loads = scala.collection.mutable.Buffer.empty[String]
    Versioned.copyShardLoadHook = loads += _
    val v = try Versioned.copyInto(spark, root, src.getPath)
      finally Versioned.copyShardLoadHook = _ => ()
    // only the fresh file's rows landed…
    assert(Versioned.read(spark, root).count() === 2)
    // …and the 100k shard was NEVER loaded: the bloom answered for it
    assert(!loads.contains(bigShard),
      s"the 100k shard must not load for a miss-probe; loaded=$loads")
    // a re-run over the unchanged directory is a no-op and loads only
    // the (tiny) shards the two live files actually live in
    loads.clear()
    Versioned.copyShardLoadHook = loads += _
    try assert(Versioned.copyInto(spark, root, src.getPath) === v)
    finally Versioned.copyShardLoadHook = _ => ()
    assert(loads.toSet.size === loads.size, "each shard loads at most once")
  }

  test("generations compact past the shard threshold; idempotency " +
      "carries through compaction") {
    val (root, src) = freshDirs("compact")
    // drive many generations quickly with tiny single-file copies
    (1 to 66).foreach { i =>
      land(src, f"g$i%03d.parquet", Seq((i.toLong, s"r$i")))
      Versioned.copyInto(spark, root, src.getPath)
    }
    val probe = Versioned.copyLedgerProbe(root)
    assert(probe.size <= 65,
      s"shards must compact past the threshold, got ${probe.size}")
    // everything ingested exactly once, before and after compaction
    assert(Versioned.read(spark, root).count() === 66)
    assert(Versioned.copyInto(spark, root, src.getPath) ===
      Versioned.latestVersion(root).get)
    assert(Versioned.read(spark, root).count() === 66)
  }

  test("option values may contain ',' and ')'; COPY_OPTIONS force; " +
      "typo'd options fail loudly") {
    val (root, src) = freshDirs("opts")
    src.mkdirs()
    // a comma SEPARATOR — the canonical quoted-comma option value
    java.nio.file.Files.write(new java.io.File(src, "a.csv").toPath,
      "id,s\n1,x\n2,(y)\n".getBytes("UTF-8"))
    Versioned.sql(spark,
      s"COPY INTO `$root` FROM '${src.getPath}' FILEFORMAT = CSV " +
        "FORMAT_OPTIONS ('header' = 'true', 'inferSchema' = 'true', " +
        "'sep' = ',', 'comment' = ')')")
    assert(Versioned.read(spark, root).count() === 2)
    // COPY_OPTIONS force re-ingests through SQL
    Versioned.sql(spark,
      s"COPY INTO `$root` FROM '${src.getPath}' FILEFORMAT = CSV " +
        "FORMAT_OPTIONS ('header' = 'true', 'inferSchema' = 'true', " +
        "'sep' = ',') COPY_OPTIONS ('force' = 'true')")
    assert(Versioned.read(spark, root).count() === 4)
    // malformed pairs and unknown copy options never silently drop
    val e = intercept[IllegalArgumentException] {
      Versioned.sql(spark,
        s"COPY INTO `$root` FROM '${src.getPath}' FILEFORMAT = CSV " +
          "FORMAT_OPTIONS (header = true)")
    }
    assert(e.getMessage.contains("FORMAT_OPTIONS"))
    val e2 = intercept[IllegalArgumentException] {
      Versioned.sql(spark,
        s"COPY INTO `$root` FROM '${src.getPath}' FILEFORMAT = CSV " +
          "COPY_OPTIONS ('nope' = 'true')")
    }
    assert(e2.getMessage.contains("unknown COPY_OPTIONS"))
  }
}
