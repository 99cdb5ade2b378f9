package graft.operators

import java.io.File
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-table transactions for [[Versioned]] tables: a COORDINATOR
  * manifest that atomically pins a consistent `(table → version)` set
  * across any number of tables, CAS-published with the same
  * create-exclusive hard-link every table commit uses.
  *
  * The consistency model (the one Iceberg catalog-level transactions
  * and Delta commit coordinators implement): each participating table
  * keeps its OWN log and commits normally — what makes the group
  * transactional is that COORDINATED READERS resolve versions through
  * the coordinator's pin set, never through "latest". The transaction
  * protocol is then two phases with no fragile window:
  *
  *  1. commit each table (its own CAS; data becomes durable but is
  *     NOT yet visible to coordinated readers — an unpinned version
  *     is just an orphan snapshot);
  *  2. publish ONE coordinator version pinning all the new
  *     (table, version) pairs.
  *
  * A crash anywhere before step 2 leaves the coordinator at the old
  * pin set: every coordinated reader still sees the OLD versions of
  * ALL tables — mutually consistent, nothing half-applied. The
  * orphaned table versions are harmless (and get re-pinned or
  * vacuumed later). The coordinator publish itself is one atomic
  * link: after it, readers see the NEW versions of all tables. There
  * is no state in which a reader can observe table A new and table B
  * old through the coordinator.
  *
  * Concurrency: `transact` retries on coordinator CAS conflicts
  * (re-reading the winner's pins); a caller holding `expectedVersion`
  * gets fail-fast semantics. Cross-transaction serialization is the
  * coordinator log order.
  *
  * Vacuum contract: a pinned version must stay retained — run
  * `Versioned.vacuum` on participants with `keepVersions` covering
  * the pin (or consult [[pins]] first). The coordinator's own log is
  * tiny (one small JSON per transaction) and append-only.
  *
  * Reference analog: the consistency dbt's full-DAG rebuild gets by
  * rebuilding everything in one run (nyc_taxi_dbt/models) — here as
  * an O(1) atomic pin-set swap instead of a rebuild.
  */
object MultiTable {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def logDir(root: String) = new File(root, "_graft_coord")
  private def pinFile(root: String, v: Long) =
    new File(logDir(root), f"p$v%012d.json")

  /** All published coordinator versions, ascending. */
  def versions(coordRoot: String): Seq[Long] = {
    val d = logDir(coordRoot)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq
      .filter(f => f.getName.matches("p\\d{12}\\.json"))
      .map(_.getName.drop(1).dropRight(5).toLong).sorted
  }

  def latestVersion(coordRoot: String): Option[Long] =
    versions(coordRoot).lastOption

  /** The pin set of coordinator version `v` (latest when None): every
    * coordinated table's pinned manifest version. */
  def pins(coordRoot: String,
      version: Option[Long] = None): Map[String, Long] =
    version.orElse(latestVersion(coordRoot)) match {
      case None => Map.empty
      case Some(v) =>
        val node = mapper.readTree(
          Files.readString(pinFile(coordRoot, v).toPath))
        node.get("pins").properties().asScala
          .map(e => e.getKey -> e.getValue.asLong()).toMap
    }

  /** Atomically publish `newPins` MERGED over the current pin set
    * (tables not mentioned keep their pins). Put-if-absent CAS via
    * [[Versioned.coordinator]] (hard link locally, conditional put on
    * object stores): exactly one of two racing publishers wins a
    * version; the loser gets [[Versioned.VersionConflictException]].
    *
    * @param expectedVersion manual CAS: fail if the coordinator moved
    *                        past this version (None = publish after
    *                        whatever is latest, still atomic)
    * @return the published coordinator version
    */
  def publish(coordRoot: String, newPins: Seq[(String, Long)],
      expectedVersion: Option[Long] = None): Long = {
    require(newPins.nonEmpty, "publish needs at least one pin")
    logDir(coordRoot).mkdirs()
    val latest = latestVersion(coordRoot)
    expectedVersion.foreach { ev =>
      if (!latest.contains(ev) && !(ev == 0L && latest.isEmpty))
        throw new Versioned.VersionConflictException(
          s"coordinator at $coordRoot is at version ${latest.getOrElse(0L)}, " +
            s"expected $ev")
    }
    val merged = pins(coordRoot, latest) ++ newPins.toMap
    val next = latest.getOrElse(0L) + 1
    val json = mapper.writerWithDefaultPrettyPrinter().writeValueAsString(
      Map[String, Any]("version" -> next,
        "pins" -> merged.map { case (k, v) =>
          k -> java.lang.Long.valueOf(v)
        }.asJava).asJava)
    // same pluggable put-if-absent primitive as every table commit
    if (Versioned.coordinator.putIfAbsent(pinFile(coordRoot, next), json))
      next
    else throw new Versioned.VersionConflictException(
      s"concurrent coordinator publish of p$next at $coordRoot; retry")
  }

  /** Run a multi-table transaction: `body` commits each participating
    * table (their own CAS verbs) and returns the (tableRoot, version)
    * pins; this then publishes them as ONE coordinator version. A
    * coordinator CAS conflict re-runs `body` against the winner's pin
    * set (the [[Versioned]] OCC-retry contract lifted one level).
    *
    * `body` receives the CURRENT pin set so it can read consistent
    * inputs and decide idempotently (e.g. skip if its work is already
    * pinned). A throw (or crash) inside `body` publishes nothing:
    * coordinated readers keep the old consistent pin set.
    */
  def transact(coordRoot: String, maxRetries: Int = 20)(
      body: Map[String, Long] => Seq[(String, Long)]): Long = {
    var attempt = 0
    while (true) {
      val base = latestVersion(coordRoot)
      val newPins = body(pins(coordRoot, base))
      try return publish(coordRoot, newPins,
        expectedVersion = Some(base.getOrElse(0L)))
      catch {
        case e: Versioned.VersionConflictException =>
          if (attempt >= maxRetries) throw e
          attempt += 1
      }
    }
    sys.error("unreachable")
  }

  /** Coordinated read: `tableRoot` AT its pinned version — never
    * "latest", so concurrent transactions can commit (but not yet
    * pin) new table versions without a coordinated reader ever seeing
    * a torn cross-table state.
    *
    * Each call resolves ONE immutable pin file atomically. For a
    * MULTI-table read that must be consistent ACROSS tables under
    * racing transactions, anchor every read to one explicit
    * `coordVersion` (fetch it once via [[latestVersion]] / the
    * `graft_pins` TVF): pin files are immutable, so version-anchored
    * reads can never straddle a pin-set swap. */
  def read(spark: SparkSession, coordRoot: String, tableRoot: String,
      coordVersion: Option[Long] = None): DataFrame = {
    val p = pins(coordRoot, coordVersion)
    val v = p.getOrElse(tableRoot, throw new IllegalArgumentException(
      s"$tableRoot is not pinned by the coordinator at $coordRoot" +
        coordVersion.fold("")(cv => s" (version $cv)") +
        s" (pinned: ${p.keys.mkString(", ")})"))
    Versioned.readVersion(spark, tableRoot, v)
  }
}
