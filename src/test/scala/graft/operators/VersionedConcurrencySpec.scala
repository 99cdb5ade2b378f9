package graft.operators

import java.nio.file.Files
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Optimistic concurrency under REAL thread contention: every DML verb
  * pins the snapshot it read as its publish parent and re-runs on a
  * version conflict, so concurrent writers serialize with no lost
  * updates — the Delta WriteSerializable contract. These tests race
  * actual threads (not simulated interleavings): each run exercises
  * some real subset of the race windows, and the invariants asserted
  * (dense versions, exact final state) must hold under ALL of them.
  *
  * The whole suite runs against BOTH commit coordinators (the POSIX
  * hard-link CAS and the object-store conditional-put mock) — the OCC
  * story must be a property of the protocol, not of one backend's
  * atomic primitive.
  */
abstract class VersionedConcurrencySpecBase(
    coordName: String,
    mkCoordinator: () => CommitCoordinator) extends SparkSpec {
  import spark.implicits._

  override protected def withFixture(test: NoArgTest) = {
    val prev = Versioned.coordinator
    Versioned.coordinator = mkCoordinator()
    try super.withFixture(test)
    finally Versioned.coordinator = prev
  }

  private def freshRoot(): String =
    Files.createTempDirectory("graft-vconc").toString + "/t"

  private def withPool[T](n: Int)(body: ExecutionContext => T): T = {
    val pool = Executors.newFixedThreadPool(n)
    try body(ExecutionContext.fromExecutorService(pool))
    finally pool.shutdown()
  }

  test("concurrent appends all land exactly once, versions dense") {
    val root = freshRoot()
    Versioned.commit(spark, root, Seq((0L, "seed")).toDF("id", "tag"),
      statsCols = Seq("id"))
    val got = withPool(8) { implicit ec =>
      Await.result(Future.sequence((1 to 8).map(i => Future {
        Versioned.commit(spark, root,
          Seq((i.toLong, s"w$i")).toDF("id", "tag"), statsCols = Seq("id"))
      })), 3.minutes)
    }
    // every writer got its own version; nobody overwrote anybody
    assert(got.sorted === (2L to 9L))
    assert(Versioned.versions(root) === (1L to 9L))
    assert(Versioned.read(spark, root).count() === 9)
    assert(Versioned.read(spark, root).agg(sum("id")).as[Long].head() ===
      (0 to 8).sum.toLong)
  }

  test("concurrent merges on disjoint keys lose no update") {
    val root = freshRoot()
    // four files with disjoint id ranges so stats-pruning partitions
    // them cleanly; each worker updates inside one range + inserts
    (0 until 4).foreach { g =>
      Versioned.commit(spark, root,
        (g * 100 until g * 100 + 10).map(i => (i.toLong, "old"))
          .toDF("id", "tag"), statsCols = Seq("id"))
    }
    withPool(4) { implicit ec =>
      Await.result(Future.sequence((0 until 4).map(g => Future {
        Versioned.mergeUpsert(spark, root,
          Seq((g * 100L, s"upd$g"), (g * 100L + 50L, s"ins$g"))
            .toDF("id", "tag"), "id", statsCols = Seq("id"))
      })), 3.minutes)
    }
    val t = Versioned.read(spark, root)
    assert(t.count() === 44) // 40 original + 4 inserts
    assert(t.filter($"tag".startsWith("upd")).count() === 4)
    assert(t.filter($"tag".startsWith("ins")).count() === 4)
    assert(t.filter($"tag" === "old").count() === 36)
    assert(Versioned.latestVersion(root) === Some(8L)) // 4 seeds + 4 merges
  }

  test("same-key merges serialize: the later version wins") {
    val root = freshRoot()
    Versioned.commit(spark, root, Seq((1L, "seed")).toDF("id", "tag"),
      statsCols = Seq("id"))
    val byTag = withPool(2) { implicit ec =>
      Await.result(Future.sequence(Seq("a", "b").map(tag => Future {
        tag -> Versioned.mergeUpsert(spark, root,
          Seq((1L, tag)).toDF("id", "tag"), "id", statsCols = Seq("id"))
      })), 3.minutes)
    }.toMap
    // both committed (no lost merge), at distinct versions
    assert(byTag.values.toSet.size === 2)
    assert(Versioned.latestVersion(root) === Some(3L))
    // last-write-wins = whichever merge published the LATER version
    val winner = byTag.maxBy(_._2)._1
    assert(Versioned.read(spark, root).select("tag").as[String].head()
      === winner)
    // and time travel shows the loser's state at its own version
    val loser = byTag.minBy(_._2)
    assert(Versioned.readVersion(spark, root, loser._2)
      .select("tag").as[String].head() === loser._1)
  }

  test("a concurrent append is never lost to compaction") {
    val root = freshRoot()
    Versioned.commit(spark, root, Seq((0L, "seed")).toDF("id", "tag"),
      statsCols = Seq("id"))
    withPool(2) { implicit ec =>
      val appender = Future {
        (1 to 6).foreach { i =>
          Versioned.commit(spark, root,
            Seq((i.toLong, s"a$i")).toDF("id", "tag"),
            statsCols = Seq("id"))
        }
      }
      val compactor = Future {
        (1 to 3).foreach(_ => Versioned.compact(spark, root))
      }
      Await.result(Future.sequence(Seq(appender, compactor)), 3.minutes)
    }
    // the invariant that used to break: compact read snapshot V, then
    // published against whatever was latest — silently dropping an
    // append that landed in between; with pinned parents every append
    // survives every compaction
    assert(Versioned.read(spark, root).count() === 7)
    assert(Versioned.read(spark, root).agg(sum("id")).as[Long].head()
      === (0 to 6).sum.toLong)
    val actions = Versioned.history(spark, root)
      .select("action").as[String].collect()
    assert(actions.count(_ == "compact") === 3)
    assert(actions.count(_ == "append") === 7)
  }

  test("pinned expectedVersion fails fast instead of retrying") {
    val root = freshRoot()
    val v1 = Versioned.commit(spark, root,
      Seq((1L, "a")).toDF("id", "tag"), statsCols = Seq("id"))
    Versioned.commit(spark, root, Seq((2L, "b")).toDF("id", "tag"),
      statsCols = Seq("id")) // moves the table past v1
    intercept[Versioned.VersionConflictException] {
      Versioned.mergeUpsert(spark, root,
        Seq((1L, "stale")).toDF("id", "tag"), "id",
        statsCols = Seq("id"), expectedVersion = Some(v1))
    }
    intercept[Versioned.VersionConflictException] {
      Versioned.commit(spark, root, Seq((3L, "c")).toDF("id", "tag"),
        statsCols = Seq("id"), expectedVersion = Some(v1))
    }
    // nothing landed: the table is exactly the two committed batches
    assert(Versioned.read(spark, root).count() === 2)
    assert(Versioned.latestVersion(root) === Some(2L))
  }
}

class VersionedConcurrencySpec extends VersionedConcurrencySpecBase(
  "posix-link", () => PosixLinkCoordinator)

class VersionedConcurrencyCondPutSpec extends VersionedConcurrencySpecBase(
  "conditional-put", () => new ConditionalPutCoordinator())
