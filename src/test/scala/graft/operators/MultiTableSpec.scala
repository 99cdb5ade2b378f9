package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The coordinator manifest must give multi-table transactions their
  * one guarantee: a coordinated reader NEVER observes a torn
  * cross-table state — a crash between two table commits (or between
  * the commits and the pin publish) leaves every table readable at
  * the old pinned pair; the pin-set swap is one atomic link; racing
  * transactions serialize on the coordinator CAS; and the join-MV
  * chain stays source-consistent when driven through it. Runs against
  * BOTH commit coordinators (POSIX link + conditional-put mock). */
abstract class MultiTableSpecBase(
    coordName: String,
    mkCoordinator: () => CommitCoordinator) extends SparkSpec {
  import spark.implicits._

  override protected def withFixture(test: NoArgTest) = {
    val prev = Versioned.coordinator
    Versioned.coordinator = mkCoordinator()
    try super.withFixture(test)
    finally Versioned.coordinator = prev
  }

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft-mt-$tag").toString + "/t"

  private def facts(ids: Range) =
    ids.map(i => (i.toLong, i % 5L, i * 1.0)).toDF("fact_id", "k", "v")
  private def dims(ks: Range) =
    ks.map(k => (k.toLong, s"dim-$k")).toDF("k", "name")

  test("transact pins both tables in one atomic step") {
    val (a, b, coord) = (fresh("a"), fresh("b"), fresh("c"))
    val v1 = MultiTable.transact(coord) { _ =>
      Seq(a -> Versioned.commit(spark, a, facts(1 to 50)),
        b -> Versioned.commit(spark, b, dims(0 to 4)))
    }
    assert(v1 === 1L)
    assert(MultiTable.pins(coord) === Map(a -> 1L, b -> 1L))
    assert(MultiTable.read(spark, coord, a).count() === 50)
    assert(MultiTable.read(spark, coord, b).count() === 5)
  }

  test("a crash between table commits leaves the OLD pair readable") {
    val (a, b, coord) = (fresh("a2"), fresh("b2"), fresh("c2"))
    MultiTable.transact(coord) { _ =>
      Seq(a -> Versioned.commit(spark, a, facts(1 to 30)),
        b -> Versioned.commit(spark, b, dims(0 to 4)))
    }
    // the crashing transaction: table A commits, then the process
    // dies before B commits (and before any pin publish)
    intercept[RuntimeException] {
      MultiTable.transact(coord) { _ =>
        Versioned.commit(spark, a, facts(31 to 60))
        throw new RuntimeException("crash between the two table commits")
      }
    }
    // table A's own log HAS advanced (the orphan snapshot is durable)…
    assert(Versioned.latestVersion(a) === Some(2L))
    // …but the coordinated view is the old CONSISTENT pair: A at v1
    // with B at v1 — never A-new with B-old
    assert(MultiTable.pins(coord) === Map(a -> 1L, b -> 1L))
    assert(MultiTable.read(spark, coord, a).count() === 30)
    assert(MultiTable.read(spark, coord, b).count() === 5)
    // the retry completes the transaction; both flip together
    MultiTable.transact(coord) { _ =>
      Seq(a -> Versioned.latestVersion(a).get, // idempotent re-pin
        b -> Versioned.commit(spark, b, dims(5 to 6)))
    }
    assert(MultiTable.pins(coord) === Map(a -> 2L, b -> 2L))
    assert(MultiTable.read(spark, coord, a).count() === 60)
    assert(MultiTable.read(spark, coord, b).count() === 7)
  }

  test("unpinned later versions stay invisible to coordinated readers") {
    val (a, coord) = (fresh("a3"), fresh("c3"))
    MultiTable.transact(coord) { _ =>
      Seq(a -> Versioned.commit(spark, a, facts(1 to 10)))
    }
    // a NON-coordinated writer advances the table
    Versioned.commit(spark, a, facts(11 to 99))
    assert(Versioned.read(spark, a).count() === 99, "raw read sees latest")
    assert(MultiTable.read(spark, coord, a).count() === 10,
      "coordinated read stays at the pin")
  }

  test("racing transactions serialize on the coordinator CAS") {
    val (a, coord) = (fresh("a4"), fresh("c4"))
    MultiTable.transact(coord) { _ =>
      Seq(a -> Versioned.commit(spark, a, facts(1 to 10)))
    }
    // loser: pins against stale expected version → conflict, no publish
    val e = intercept[Versioned.VersionConflictException] {
      MultiTable.publish(coord, Seq(a -> 1L), expectedVersion = Some(0L))
    }
    assert(e.getMessage.contains("expected 0"))
    // transact retries the SAME body against the winner's pins
    var attempts = 0
    MultiTable.transact(coord) { seen =>
      attempts += 1
      if (attempts == 1) // simulate an interleaved winner on attempt 1
        MultiTable.publish(coord, Seq(a -> 1L))
      Seq(a -> Versioned.commit(spark, a, facts(11 to 20)))
    }
    assert(attempts === 2, "the CAS loser must re-run its body")
    assert(MultiTable.pins(coord)(a) === Versioned.latestVersion(a).get)
  }

  test("the join-MV chain through the coordinator is source-consistent") {
    val (a, b, mv, coord) = (fresh("a5"), fresh("b5"), fresh("mv5"), fresh("c5"))
    Versioned.commit(spark, a, facts(1 to 40), statsCols = Seq("fact_id"))
    Versioned.commit(spark, b, dims(0 to 4), statsCols = Seq("k"))
    def refreshPinned(): Long = MultiTable.transact(coord) { _ =>
      val mvV = JoinMv.refreshCdc(spark, a, b, mv, Seq("k"), "fact_id", "k")
      Seq(a -> Versioned.latestVersion(a).get,
        b -> Versioned.latestVersion(b).get,
        mv -> mvV)
    }
    refreshPinned()
    def coordConsistent(): Unit = {
      val joined = MultiTable.read(spark, coord, a)
        .join(MultiTable.read(spark, coord, b), Seq("k"))
        .select("fact_id").as[Long].collect().toSet
      val mvIds = MultiTable.read(spark, coord, mv)
        .select("fact_id").as[Long].collect().toSet
      assert(mvIds === joined,
        "pinned MV must equal the join of the PINNED sources")
    }
    coordConsistent()

    // sources move: until the next pinned refresh, coordinated readers
    // keep the old-but-consistent trio (raw readers see fresh sources
    // and a stale MV — exactly the torn state the coordinator hides)
    Versioned.delete(spark, a, col("fact_id") <= 10, cdf = true)
    Versioned.commit(spark, a, facts(41 to 55))
    coordConsistent()
    // the pinned refresh flips all three together
    refreshPinned()
    coordConsistent()
    assert(MultiTable.read(spark, coord, mv)
      .filter(col("fact_id") <= 10).count() === 0)
  }
}

class MultiTableSpec extends MultiTableSpecBase(
  "posix-link", () => PosixLinkCoordinator)

class MultiTableCondPutSpec extends MultiTableSpecBase(
  "conditional-put", () => new ConditionalPutCoordinator())
