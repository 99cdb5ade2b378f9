package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.functions.expressions.CmsSketch.cms_sketch
import graft.operators.Versioned

/** The streaming CMS materialized view must be BIT-IDENTICAL to the
  * batch sketch over the same rows (deterministic hashing + additive
  * merge), survive a checkpointed restart without double-folding, and
  * expose its per-batch history through time travel. */
class SketchMvSpec extends SparkSpec {
  import spark.implicits._

  test("streamed sketch equals the batch sketch bit-for-bit") {
    val src = Files.createTempDirectory("graft-cmsmv-src").toString
    val root = Files.createTempDirectory("graft-cmsmv").toString + "/t"
    val ck = Files.createTempDirectory("graft-cmsmv-ck").toString
    Tables.t(spark, sfDir, "events").repartition(8)
      .write.mode("overwrite").parquet(src)

    Streams.cmsMv(Streams.fileSource(spark, src), root, ck,
      "cms-app", "user_id", depth = 4, width = 256).awaitTermination()

    val streamed = Versioned.read(spark, root).as[Seq[Long]].head()
    val batch = spark.read.parquet(src).filter(col("user_id").isNotNull)
      .agg(cms_sketch(col("user_id").cast("string"), 4, 256))
      .as[Seq[Long]].head()
    assert(streamed === batch, "streamed CMS diverged from the batch sketch")

    // 8 files / maxFilesPerTrigger=4 → 2 micro-batches → 2 versions;
    // the earlier version is a strictly smaller prefix of the stream
    val vs = Versioned.versions(root)
    assert(vs.size === 2)
    val early = Versioned.readVersion(spark, root, vs.head).as[Seq[Long]].head()
    assert(early.sum < streamed.sum && early.sum > 0)

    // restart with no new data: guard recognizes the batches, no refold
    Streams.cmsMv(Streams.fileSource(spark, src), root, ck,
      "cms-app", "user_id", depth = 4, width = 256).awaitTermination()
    assert(Versioned.read(spark, root).as[Seq[Long]].head() === batch)
  }
}
