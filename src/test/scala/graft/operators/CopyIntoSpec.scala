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
}
