package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The incrementally-maintained join MV must equal the full recompute
  * after every refresh — including the both-sides-moved step whose
  * ΔA⋈ΔB cross term a naive delta-join drops — publish watermarks
  * atomically with the data, no-op when nothing moved, and refuse
  * non-append source changes. */
class JoinMvSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft-joinmv-$tag").toString + "/t"

  private def facts(ids: Range): DataFrame =
    ids.map(i => (i.toLong, i % 7L, i * 2.0)).toDF("fact_id", "k", "v")

  private def dims(ks: Range): DataFrame =
    ks.map(k => (k.toLong, s"dim-$k")).toDF("k", "name")

  private def recompute(aRoot: String, bRoot: String): Set[(Long, Long, Double, String)] =
    Versioned.read(spark, aRoot).join(Versioned.read(spark, bRoot), Seq("k"))
      .select("k", "fact_id", "v", "name")
      .as[(Long, Long, Double, String)].collect().toSet

  private def mvRows(mvRoot: String): Set[(Long, Long, Double, String)] =
    Versioned.read(spark, mvRoot)
      .select("k", "fact_id", "v", "name")
      .as[(Long, Long, Double, String)].collect().toSet

  test("initial build, then one-side and both-side deltas all match recompute") {
    val (a, b, mv) = (freshRoot("a"), freshRoot("b"), freshRoot("mv"))
    Versioned.commit(spark, a, facts(1 to 100))
    Versioned.commit(spark, b, dims(0 to 4)) // keys 5, 6 dangle for now
    JoinMv.refresh(spark, a, b, mv, Seq("k"))
    assert(mvRows(mv) === recompute(a, b), "initial build")

    // fact-side append only
    Versioned.commit(spark, a, facts(101 to 180))
    JoinMv.refresh(spark, a, b, mv, Seq("k"))
    assert(mvRows(mv) === recompute(a, b), "fact delta")

    // dim-side append only: key 5 arrives late — old facts must join it
    Versioned.commit(spark, b, dims(5 to 5))
    JoinMv.refresh(spark, a, b, mv, Seq("k"))
    assert(mvRows(mv) === recompute(a, b), "dim delta back-joins old facts")

    // BOTH sides move in one refresh window: the ΔA⋈ΔB cross term
    // (new facts with k=6 joining the new dim 6) must appear exactly once
    Versioned.commit(spark, a, facts(181 to 260))
    Versioned.commit(spark, b, dims(6 to 6))
    JoinMv.refresh(spark, a, b, mv, Seq("k"))
    assert(mvRows(mv) === recompute(a, b), "both-sides delta incl. cross term")
  }

  test("a source compaction in the window is skipped losslessly") {
    val (a, b, mv) = (freshRoot("a8"), freshRoot("b8"), freshRoot("mv8"))
    Versioned.commit(spark, a, facts(1 to 50))
    Versioned.commit(spark, b, dims(0 to 6))
    JoinMv.refresh(spark, a, b, mv, Seq("k"))
    // OPTIMIZE on the fact table, then more appends — the MV must fold
    // only the appends and not re-emit (or lose) compacted rows
    Versioned.compact(spark, a, targetFiles = 1)
    Versioned.commit(spark, a, facts(51 to 90))
    JoinMv.refresh(spark, a, b, mv, Seq("k"))
    assert(mvRows(mv) === recompute(a, b),
      "compaction inside the refresh window must be transparent")
  }

  test("refresh is incremental: no-op version when nothing moved") {
    val (a, b, mv) = (freshRoot("a2"), freshRoot("b2"), freshRoot("mv2"))
    Versioned.commit(spark, a, facts(1 to 50))
    Versioned.commit(spark, b, dims(0 to 6))
    val v1 = JoinMv.refresh(spark, a, b, mv, Seq("k"))
    val v2 = JoinMv.refresh(spark, a, b, mv, Seq("k"))
    assert(v1 === v2, "idle refresh must not publish a new version")
    assert(JoinMv.watermarks(mv) === Some((1L, 1L)))
  }

  test("watermarks publish atomically with the fold and advance per refresh") {
    val (a, b, mv) = (freshRoot("a3"), freshRoot("b3"), freshRoot("mv3"))
    Versioned.commit(spark, a, facts(1 to 10))
    Versioned.commit(spark, b, dims(0 to 6))
    JoinMv.refresh(spark, a, b, mv, Seq("k"))
    Versioned.commit(spark, a, facts(11 to 20))
    Versioned.commit(spark, a, facts(21 to 30))
    JoinMv.refresh(spark, a, b, mv, Seq("k"))
    assert(JoinMv.watermarks(mv) === Some((3L, 1L)),
      "watermarks must record the exact versions folded")
    // the delta commit carries ONLY the new facts' join rows
    val lastVersion = Versioned.latestVersion(mv).get
    val deltaRows = Versioned.readVersion(spark, mv, lastVersion).count() -
      Versioned.readVersion(spark, mv, lastVersion - 1).count()
    assert(deltaRows === 20, s"refresh appended $deltaRows rows, want 20")
  }

  test("stream-driven maintenance converges to recompute across restarts") {
    val (a, b, mv) = (freshRoot("a5"), freshRoot("b5"), freshRoot("mv5"))
    val ckpt = Files.createTempDirectory("graft-joinmv-ckpt").toString
    Versioned.commit(spark, a, facts(1 to 60))
    Versioned.commit(spark, b, dims(0 to 4))
    val q1 = JoinMv.stream(spark, a, b, mv, Seq("k"), ckpt)
    q1.awaitTermination()
    assert(mvRows(mv) === recompute(a, b), "first drain builds the MV")

    // more commits on both sides, then a RESTART from the checkpoint:
    // new versions admit as new micro-batches, replays no-op
    Versioned.commit(spark, a, facts(61 to 120))
    Versioned.commit(spark, b, dims(5 to 6))
    val q2 = JoinMv.stream(spark, a, b, mv, Seq("k"), ckpt)
    q2.awaitTermination()
    assert(mvRows(mv) === recompute(a, b), "restart folds only the delta")
    assert(JoinMv.watermarks(mv) === Some((2L, 2L)))
  }

  test("CDC refresh maintains the MV under inserts, updates, and deletes") {
    val (a, b, mv) = (freshRoot("a6"), freshRoot("b6"), freshRoot("mv6"))
    Versioned.commit(spark, a, facts(1 to 100), statsCols = Seq("fact_id"))
    Versioned.commit(spark, b, dims(0 to 6), statsCols = Seq("k"))
    JoinMv.refreshCdc(spark, a, b, mv, Seq("k"), "fact_id", "k")
    assert(mvRows(mv) === recompute(a, b), "initial build")

    // inserts on A
    Versioned.commit(spark, a, facts(101 to 140))
    JoinMv.refreshCdc(spark, a, b, mv, Seq("k"), "fact_id", "k")
    assert(mvRows(mv) === recompute(a, b), "insert window")

    // dim UPDATE: rename k=3 — every MV row with k=3 must repoint
    Versioned.mergeUpsert(spark, b,
      Seq((3L, "dim-3-renamed")).toDF("k", "name"), "k", cdf = true)
    JoinMv.refreshCdc(spark, a, b, mv, Seq("k"), "fact_id", "k")
    assert(mvRows(mv) === recompute(a, b), "dim update propagates")
    assert(mvRows(mv).exists(_._4 == "dim-3-renamed"))

    // fact DELETE: drop fact_ids 1..30 — their MV rows must vanish
    Versioned.delete(spark, a, col("fact_id") <= 30, cdf = true)
    JoinMv.refreshCdc(spark, a, b, mv, Seq("k"), "fact_id", "k")
    assert(mvRows(mv) === recompute(a, b), "fact delete window")

    // MIXED single window: append A + update B + delete A
    Versioned.commit(spark, a, facts(141 to 170))
    Versioned.mergeUpsert(spark, b,
      Seq((5L, "dim-5-v2")).toDF("k", "name"), "k", cdf = true)
    Versioned.delete(spark, a,
      col("fact_id").between(50, 60), cdf = true)
    JoinMv.refreshCdc(spark, a, b, mv, Seq("k"), "fact_id", "k")
    assert(mvRows(mv) === recompute(a, b), "mixed insert/update/delete window")

    // idle: watermarks current, no new version
    val v = Versioned.latestVersion(mv).get
    assert(JoinMv.refreshCdc(spark, a, b, mv, Seq("k"), "fact_id", "k") === v)
  }

  test("CDC refresh recovers from a crash between delete and append") {
    val (a, b, mv) = (freshRoot("a9"), freshRoot("b9"), freshRoot("mv9"))
    Versioned.commit(spark, a, facts(1 to 60), statsCols = Seq("fact_id"))
    Versioned.commit(spark, b, dims(0 to 6), statsCols = Seq("k"))
    JoinMv.refreshCdc(spark, a, b, mv, Seq("k"), "fact_id", "k")

    // window: delete some facts, update a dim
    Versioned.delete(spark, a, col("fact_id") <= 15, cdf = true)
    Versioned.mergeUpsert(spark, b,
      Seq((4L, "dim-4-v2")).toDF("k", "name"), "k", cdf = true)

    // simulate the crash: the MV delete landed (the exact id-set a
    // refresh would compute) but the append + watermark never did
    Versioned.delete(spark, mv,
      col("fact_id").isin((1L to 15L): _*) || col("k") === 4L)
    assert(JoinMv.watermarks(mv) === Some((1L, 1L)),
      "watermarks must still be pre-crash")

    // the retry re-runs the (now no-op) delete and folds exactly once
    JoinMv.refreshCdc(spark, a, b, mv, Seq("k"), "fact_id", "k")
    assert(mvRows(mv) === recompute(a, b),
      "post-crash refresh must converge without double-folding")
    assert(JoinMv.watermarks(mv) === Some((2L, 2L)))
  }

  test("CDC stream driver folds deletes and updates continuously") {
    val (a, b, mv) = (freshRoot("a7"), freshRoot("b7"), freshRoot("mv7"))
    val ckpt = Files.createTempDirectory("graft-joinmv-cdc-ckpt").toString
    Versioned.commit(spark, a, facts(1 to 80), statsCols = Seq("fact_id"))
    Versioned.commit(spark, b, dims(0 to 6), statsCols = Seq("k"))
    JoinMv.streamCdc(spark, a, b, mv, Seq("k"), "fact_id", "k", ckpt)
      .awaitTermination()
    assert(mvRows(mv) === recompute(a, b), "initial drain")

    Versioned.delete(spark, a, col("fact_id") <= 20, cdf = true)
    Versioned.mergeUpsert(spark, b,
      Seq((2L, "dim-2-v2")).toDF("k", "name"), "k", cdf = true)
    JoinMv.streamCdc(spark, a, b, mv, Seq("k"), "fact_id", "k", ckpt)
      .awaitTermination()
    assert(mvRows(mv) === recompute(a, b),
      "restarted stream folds the delete + update window")
    assert(mvRows(mv).exists(_._4 == "dim-2-v2"))
    assert(!mvRows(mv).exists(_._2 <= 20))
  }

  test("MVs chain: a CDC join MV is itself a valid CDC source") {
    val (a, b, c) = (freshRoot("a10"), freshRoot("b10"), freshRoot("c10"))
    val (mv1, mv2) = (freshRoot("mv10a"), freshRoot("mv10b"))
    Versioned.commit(spark, a, facts(1 to 60), statsCols = Seq("fact_id"))
    Versioned.commit(spark, b, dims(0 to 6), statsCols = Seq("k"))
    // third table keyed by the fact id: per-fact annotations
    val notes = (1 to 60).map(i => (i.toLong, s"note-$i")).toDF("fact_id", "note")
    Versioned.commit(spark, c, notes, statsCols = Seq("fact_id"))

    // MV1 = A ⋈ B; MV2 = MV1 ⋈ C (initialized after MV1's build)
    JoinMv.refreshCdc(spark, a, b, mv1, Seq("k"), "fact_id", "k")
    JoinMv.refreshCdc(spark, mv1, c, mv2, Seq("fact_id"), "fact_id", "fact_id")

    def recompute3: Set[(Long, String, String)] =
      Versioned.read(spark, a).join(Versioned.read(spark, b), Seq("k"))
        .join(Versioned.read(spark, c), Seq("fact_id"))
        .select("fact_id", "name", "note")
        .as[(Long, String, String)].collect().toSet
    def mv2Rows: Set[(Long, String, String)] =
      Versioned.read(spark, mv2).select("fact_id", "name", "note")
        .as[(Long, String, String)].collect().toSet
    assert(mv2Rows === recompute3, "chained initial build")

    // mutate the BASE tables; refresh MV1 (its maintenance emits
    // cdf-backed deletes + appends), then MV2 folds MV1's feed
    Versioned.delete(spark, a, col("fact_id") <= 10, cdf = true)
    Versioned.mergeUpsert(spark, b,
      Seq((3L, "dim-3-new")).toDF("k", "name"), "k", cdf = true)
    JoinMv.refreshCdc(spark, a, b, mv1, Seq("k"), "fact_id", "k")
    JoinMv.refreshCdc(spark, mv1, c, mv2, Seq("fact_id"), "fact_id", "fact_id")
    assert(mv2Rows === recompute3,
      "downstream MV must fold the upstream MV's own maintenance")
    assert(mv2Rows.exists(_._2 == "dim-3-new"))
    assert(!mv2Rows.exists(_._1 <= 10))
  }

  test("CDC refresh survives a 10^5-key change window (keys stay frames)") {
    val (a, b, mv) = (freshRoot("a11"), freshRoot("b11"), freshRoot("mv11"))
    Versioned.commit(spark, a,
      (1 to 150000).map(i => (i.toLong, i % 7L, i * 2.0))
        .toDF("fact_id", "k", "v").repartition(4),
      statsCols = Seq("fact_id"))
    Versioned.commit(spark, b, dims(0 to 6), statsCols = Seq("k"))
    JoinMv.refreshCdc(spark, a, b, mv, Seq("k"), "fact_id", "k")

    // a backfill-sized window: delete 100k facts in one commit — the
    // round-5 implementation would have collected the ids and built a
    // 10^5-literal isin predicate; the keys-frame path must fold it
    Versioned.delete(spark, a, col("fact_id") <= 100000, cdf = true)
    JoinMv.refreshCdc(spark, a, b, mv, Seq("k"), "fact_id", "k")
    assert(Versioned.read(spark, mv).count() === 50000)
    assert(mvRows(mv) === recompute(a, b), "100k-key window folds exactly")
  }

  test("CDC refresh: a dim-only window scans a strict subset of fact files") {
    val (a, b, mv) = (freshRoot("a13"), freshRoot("b13"), freshRoot("mv13"))
    // three fact files with DISJOINT join-key ranges so the re-insert
    // leg's stats pruning is observable: [0,9], [10,19], [20,29]
    for (lo <- Seq(0, 10, 20))
      Versioned.commit(spark, a,
        (1 to 50).map(i => ((lo * 1000 + i).toLong, (lo + i % 10).toLong, i * 1.0))
          .toDF("fact_id", "k", "v").coalesce(1),
        statsCols = Seq("fact_id", "k"))
    Versioned.commit(spark, b,
      (0 to 29).map(k => (k.toLong, s"dim-$k")).toDF("k", "name"),
      statsCols = Seq("k"))
    JoinMv.refreshCdc(spark, a, b, mv, Seq("k"), "fact_id", "k")
    assert(mvRows(mv) === recompute(a, b), "initial build")

    // dim-ONLY window: rename k=5 — only the first fact file's key
    // range can hold joining rows; the other two must not be read
    Versioned.mergeUpsert(spark, b,
      Seq((5L, "dim-5-renamed")).toDF("k", "name"), "k", cdf = true)
    val events = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
    Versioned.onKeyPrune = (root, _, kept, total) =>
      events.synchronized { events += ((root, kept, total)) }
    try JoinMv.refreshCdc(spark, a, b, mv, Seq("k"), "fact_id", "k")
    finally Versioned.onKeyPrune = (_, _, _, _) => ()

    val aScans = events.synchronized(events.filter(_._1 == a).toList)
    assert(aScans.nonEmpty,
      "the fact-side re-insert read must go through keys-frame pruning")
    assert(aScans.forall { case (_, kept, total) =>
      total === 3 && kept < total },
      s"dim-only window must scan a STRICT subset of fact files: $aScans")
    assert(aScans.exists(_._2 === 1),
      s"only the [0,9] fact file overlaps k=5, got $aScans")
    assert(mvRows(mv).exists(_._4 == "dim-5-renamed"))
    assert(mvRows(mv) === recompute(a, b), "pruned refresh stays exact")
  }

  test("append-only refresh: a dim-only append probes a strict subset " +
      "of fact files") {
    val (a, b, mv) = (freshRoot("a14"), freshRoot("b14"), freshRoot("mv14"))
    // three fact files with disjoint join-key ranges (as in the CDC case)
    for (lo <- Seq(0, 10, 20))
      Versioned.commit(spark, a,
        (1 to 50).map(i => ((lo * 1000 + i).toLong, (lo + i % 10).toLong, i * 1.0))
          .toDF("fact_id", "k", "v").coalesce(1),
        statsCols = Seq("fact_id", "k"))
    Versioned.commit(spark, b,
      (0 to 29).map(k => (k.toLong, s"dim-$k")).toDF("k", "name"),
      statsCols = Seq("k"))
    JoinMv.refresh(spark, a, b, mv, Seq("k"))
    assert(mvRows(mv) === recompute(a, b), "initial build")

    // dim-only APPEND: a late dim row for k=15 — only the second fact
    // file's range can hold back-joining facts
    Versioned.commit(spark, b, Seq((15L, "dim-15-late")).toDF("k", "name"))
    val events = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
    Versioned.onKeyPrune = (root, _, kept, total) =>
      events.synchronized { events += ((root, kept, total)) }
    try JoinMv.refresh(spark, a, b, mv, Seq("k"))
    finally Versioned.onKeyPrune = (_, _, _, _) => ()
    val aScans = events.synchronized(events.filter(_._1 == a).toList)
    assert(aScans.nonEmpty && aScans.forall { case (_, kept, total) =>
      total === 3 && kept < total },
      s"dim-only append must probe a strict subset of fact files: $aScans")
    assert(mvRows(mv) === recompute(a, b), "pruned refresh stays exact")
  }

  test("a null row id in the change window fails loudly, not silently") {
    val (a, b, mv) = (freshRoot("a12"), freshRoot("b12"), freshRoot("mv12"))
    Versioned.commit(spark, a,
      (1 to 20).map(i => (Option(i.toLong), i % 7L, i * 2.0))
        .toDF("fact_id", "k", "v"),
      statsCols = Seq("k"))
    Versioned.commit(spark, b, dims(0 to 6), statsCols = Seq("k"))
    JoinMv.refreshCdc(spark, a, b, mv, Seq("k"), "fact_id", "k")
    // a null-id fact arrives — the documented precondition is violated;
    // such a row can never be re-matched, so the refresh must throw
    Versioned.commit(spark, a,
      Seq((None: Option[Long], 1L, 0.0)).toDF("fact_id", "k", "v"))
    val e = intercept[IllegalArgumentException] {
      JoinMv.refreshCdc(spark, a, b, mv, Seq("k"), "fact_id", "k")
    }
    assert(e.getMessage.contains("null fact_id"),
      s"error must name the null id, got: ${e.getMessage}")
  }

  test("non-append source changes are refused, not silently folded") {
    val (a, b, mv) = (freshRoot("a4"), freshRoot("b4"), freshRoot("mv4"))
    Versioned.commit(spark, a, facts(1 to 50))
    Versioned.commit(spark, b, dims(0 to 6))
    JoinMv.refresh(spark, a, b, mv, Seq("k"))
    Versioned.commit(spark, a, facts(1 to 10), mode = "overwrite")
    val e = intercept[IllegalArgumentException] {
      JoinMv.refresh(spark, a, b, mv, Seq("k"))
    }
    assert(e.getMessage.contains("append-only"),
      s"error must name the append-only contract, got: ${e.getMessage}")
  }
}
