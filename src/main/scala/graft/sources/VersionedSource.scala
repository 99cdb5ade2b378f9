package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftShims, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Sink, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.operators.Versioned

/** `spark.read`/`readStream.format("graft-versioned")` over a
  * [[Versioned]] manifest-log table — the lakehouse-connector surface
  * (reference: `pipelines/02-kafka-spark-iceberg/spark/jobs/
  * silver_transform.py:118-136` reads Iceberg tables through the
  * DataFrame reader the same way).
  *
  * Batch:
  * {{{
  *   spark.read.format("graft-versioned").option("path", root)
  *     .option("versionAsOf", 3)            // optional time travel
  *     .load().filter($"k" between (10, 20))
  * }}}
  * The relation prunes FILES from pushed filters against commit-time
  * manifest stats before Spark ever lists them (conjunctive
  * equality/range bounds → [[Versioned.candidateFilesForBounds]]), then
  * re-applies the full predicates so stats gaps can't change results.
  * It also reports `sizeInBytes` from the manifest, so a small
  * versioned dimension auto-broadcasts on metadata instead of a guess.
  *
  * Streaming (the "table as a stream" lakehouse pattern):
  * {{{
  *   spark.readStream.format("graft-versioned").option("path", root)
  *     .option("startingVersion", 0)        // default 0: full history
  *     .option("maxVersionsPerTrigger", 1)  // optional admission cap
  *     .load()                              // table cols + _change_type
  * }}}                                      //            + _commit_version
  * Offsets are manifest versions — already atomic, totally ordered, and
  * checkpoint-serializable — so a micro-batch is exactly the change
  * feed of `(start, end]` and replays are version-exact. Merge/delete
  * versions must have been committed with `cdf = true` (enforced by
  * [[Versioned.changeFeed]]).
  *
  * V1 `Source` on purpose: `getBatch` returns a DataFrame, so the feed
  * rides Catalyst's whole parquet scan stack (pushdown, vectorized
  * read, arbitrary schemas) instead of a hand-rolled row reader.
  */
class VersionedSource extends RelationProvider
    with CreatableRelationProvider
    with StreamSourceProvider with StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = VersionedSource.Name

  /** `df.write.format("graft-versioned")` — the batch write path a
    * Delta switcher expects. SaveMode maps onto the commit verbs:
    * Append appends a version, Overwrite replaces the snapshot,
    * ErrorIfExists (the `save()` default) refuses a non-empty table,
    * Ignore is a no-op on one. Options: `statsCols`/`bloomCols`
    * (comma-separated — data-skipping stats for later reads),
    * `partitionBy` (hive-layout table partitioning; the V1 writer
    * path rejects `.partitionBy(...)` for relation providers, so it
    * rides an option), `mergeSchema`. Every write is one atomic CAS
    * manifest commit with OCC retry — concurrent writers serialize,
    * none is lost. */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val opts = VersionedSource.normalize(parameters)
    val root = VersionedSource.path(opts)
    val exists = Versioned.latestVersion(root).isDefined
    def csv(k: String): Seq[String] =
      opts.get(k).map(_.split(",").map(_.trim).toSeq.filter(_.nonEmpty))
        .getOrElse(Nil)
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalArgumentException(
          s"versioned table at $root already exists (SaveMode.ErrorIfExists" +
            " is save()'s default — use .mode(\"append\") or" +
            " .mode(\"overwrite\"))")
      case SaveMode.Ignore if exists => // no-op, like INSERT IF NOT EXISTS
      case m =>
        Versioned.commit(sqlContext.sparkSession, root, data,
          mode = if (m == SaveMode.Overwrite) "overwrite" else "append",
          statsCols = csv("statscols"),
          partitionBy = csv("partitionby"),
          bloomCols = csv("bloomcols"),
          mergeSchema = opts.get("mergeschema").exists(_.toBoolean))
    }
    createRelation(sqlContext, parameters)
  }

  // ------------------------------------------------------------ batch
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val opts = VersionedSource.normalize(parameters)
    val root = VersionedSource.path(opts)
    // timestampAsOf (epoch millis or "yyyy-MM-dd HH:mm:ss" UTC)
    // resolves to a pinned version at planning time — the Delta
    // TIMESTAMP AS OF surface; exclusive with versionAsOf
    val byTs = opts.get("timestampasof").map { s =>
      val millis = s.toLongOption.getOrElse(
        java.time.LocalDateTime.parse(s.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
      graft.operators.Versioned.versionAsOfTimestamp(root, millis)
    }
    require(byTs.isEmpty || !opts.contains("versionasof"),
      "set versionAsOf OR timestampAsOf, not both")
    new VersionedRelation(sqlContext, root,
      byTs.orElse(opts.get("versionasof").map(_.toLong)))
  }

  // -------------------------------------------------------- streaming
  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val opts = VersionedSource.normalize(parameters)
    val root = VersionedSource.path(opts)
    (s"${VersionedSource.Name}:$root",
      VersionedSource.feedSchema(sqlContext.sparkSession, root))
  }

  override def createSource(sqlContext: SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source = {
    val opts = VersionedSource.normalize(parameters)
    new VersionedFeedSource(sqlContext.sparkSession,
      VersionedSource.path(opts),
      opts.get("startingversion").map(_.toLong).getOrElse(0L),
      opts.get("maxversionspertrigger").map(_.toLong))
  }

  /** `writeStream.format("graft-versioned")` — exactly-once commits via
    * the in-manifest (appId, batchId) guard. Append mode appends;
    * Complete mode overwrites (each trigger replaces the snapshot — the
    * aggregate-MV shape). The replay-guard identity defaults to the
    * checkpoint location, which is exactly the stream identity a
    * restart reuses; `.option("appId", …)` overrides it. */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val opts = VersionedSource.normalize(parameters)
    require(partitionColumns.isEmpty,
      s"${VersionedSource.Name} sink does not support partitionBy")
    val mode =
      if (outputMode == OutputMode.Append()) "append"
      else if (outputMode == OutputMode.Complete()) "overwrite"
      else throw new IllegalArgumentException(
        s"${VersionedSource.Name} sink supports Append and Complete, " +
          s"got $outputMode")
    val appId = opts.get("appid").orElse(opts.get("checkpointlocation"))
      .getOrElse(throw new IllegalArgumentException(
        s"""${VersionedSource.Name} sink needs a replay-guard identity: set
           |.option("checkpointLocation", …) or .option("appId", …)"""
          .stripMargin))
    new VersionedTableSink(sqlContext.sparkSession,
      VersionedSource.path(opts), appId, mode,
      opts.get("statscols").map(_.split(",").map(_.trim).toSeq
        .filter(_.nonEmpty)).getOrElse(Nil),
      opts.get("mergeschema").exists(_.toBoolean))
  }
}

object VersionedSource {
  val Name = "graft-versioned"

  private def normalize(parameters: Map[String, String]): Map[String, String] =
    parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }

  private def path(opts: Map[String, String]): String = {
    val raw = opts.getOrElse("path", throw new IllegalArgumentException(
      s"""$Name needs .option("path", <table root>)"""))
    // the catalog's V1 streaming fallback hands the table LOCATION as a
    // `file:` URI string (`new Path(v1Table.location).toString`) — the
    // engine addresses local roots as plain paths, so unwrap it
    if (raw.startsWith("file:"))
      try new java.io.File(new java.net.URI(raw)).getPath
      catch { case _: Exception => raw.stripPrefix("file:") }
    else raw
  }

  /** Stream schema = the table's schema at `version` (latest when
    * `None`) + the CDC envelope. */
  def feedSchema(spark: SparkSession, root: String,
      version: Option[Long] = None): StructType =
    Versioned.tableSchema(spark, root, version)
      .add("_change_type", StringType, nullable = true)
      .add("_commit_version", LongType, nullable = true)

  /** Pushed conjunctive filters → inclusive per-column intervals for
    * manifest-stats pruning. Only shapes that IMPLY a bound survive
    * (`Or` never does; a strict `>` is safely widened to `>=`); values
    * the stats comparator can't type are skipped. Package-visible so
    * the spec asserts the translation on raw `Filter` trees. */
  private[sources] def bounds(filters: Seq[Filter]): Seq[Versioned.ColumnBound] = {
    def ok(v: Any): Boolean = v match {
      case null => false
      case _: Number | _: String | _: java.sql.Date | _: java.sql.Timestamp |
           _: java.time.LocalDate | _: java.time.Instant => true
      case _ => false
    }
    def leaves(f: Filter): Seq[Filter] = f match {
      case And(l, r) => leaves(l) ++ leaves(r)
      case other => Seq(other)
    }
    filters.flatMap(leaves).collect {
      case EqualTo(a, v) if ok(v) => Versioned.ColumnBound(a, Some(v), Some(v))
      case GreaterThan(a, v) if ok(v) => Versioned.ColumnBound(a, Some(v), None)
      case GreaterThanOrEqual(a, v) if ok(v) =>
        Versioned.ColumnBound(a, Some(v), None)
      case LessThan(a, v) if ok(v) => Versioned.ColumnBound(a, None, Some(v))
      case LessThanOrEqual(a, v) if ok(v) =>
        Versioned.ColumnBound(a, None, Some(v))
      // IN-list: prunes like a union of point lookups. No practical
      // cap — past 8 values the bound compiles to sorted arrays with
      // binary-search range windows and ONCE-per-value memoized bloom
      // positions (Versioned.compileInProbe), so a 10⁴-value IN costs
      // O(V log V) planning, not per-(value × file) hashing; past 10⁵
      // values bloom probing drops out and range windows still prune.
      // The 2²⁰ guard only bounds planner memory on adversarial lists.
      case In(a, vs) if vs.nonEmpty && vs.length <= (1 << 20) &&
          vs.forall(ok) =>
        Versioned.inBound(a, vs.toIndexedSeq)
      // null-count stats: IS NULL skips files with zero recorded
      // nulls; IS NOT NULL skips all-null files (Spark pushes an
      // IsNotNull alongside almost every comparison, so this engages
      // on ordinary filters for free)
      case org.apache.spark.sql.sources.IsNull(a) =>
        Versioned.nullBound(a, isNull = true)
      case org.apache.spark.sql.sources.IsNotNull(a) =>
        Versioned.nullBound(a, isNull = false)
    }
  }

  /** EXACT `Filter` → `Column` translation — every node must
    * translate, or None. Needed where the predicate defines what gets
    * DELETED/replaced: the advisory [[toColumn]] may widen a partial
    * `And`, which is safe for scans and catastrophic for deletes. */
  private[sources] def exactColumn(f: Filter): Option[Column] = f match {
    case And(l, r) =>
      for { a <- exactColumn(l); b <- exactColumn(r) } yield a && b
    case Or(l, r) =>
      for { a <- exactColumn(l); b <- exactColumn(r) } yield a || b
    case Not(c) => exactColumn(c).map(!_)
    case leaf => toColumn(leaf)
  }

  /** Source `Filter` → `Column`, where expressible — re-applied inside
    * the scan so parquet row-group pruning sees the predicates too.
    * A partially-translatable `And` keeps the translatable side (still
    * a superset); a partially-translatable `Or`/`Not` is dropped. */
  private[sources] def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case Not(c) => toColumn(c).map(!_)
    case And(l, r) => (toColumn(l), toColumn(r)) match {
      case (Some(a), Some(b)) => Some(a && b)
      case (a, b) => a.orElse(b)
    }
    case Or(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a || b
    case _ => None
  }
}

/** Batch relation over one pinned version of the table. */
final class VersionedRelation(override val sqlContext: SQLContext,
    root: String, versionAsOf: Option[Long])
    extends BaseRelation with PrunedFilteredScan {

  private val spark = sqlContext.sparkSession
  private val version: Long = versionAsOf
    .orElse(Versioned.latestVersion(root))
    .getOrElse(throw new IllegalArgumentException(s"no versions at $root"))

  override val schema: StructType =
    Versioned.tableSchema(spark, root, Some(version))

  // commit-time truth, not an estimate: Σ live file bytes from the
  // manifest — this is what lets Catalyst broadcast a small versioned
  // dimension without AQE having to discover the size at runtime
  override def sizeInBytes: Long = Versioned.tableBytes(root, version)

  // every filter is re-applied by Spark above the scan: stats pruning
  // (files) and the translated in-scan predicates (row groups) are
  // both strictly advisory, so stats gaps can never change results
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  // the scan below already produces InternalRows from the native
  // parquet exec; declaring needConversion=false skips the per-row
  // external↔internal round-trip the V1 default would add (the
  // documented BaseRelation contract for exactly this case)
  override def needConversion: Boolean = false

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val pruned = Versioned.candidateFilesForBounds(root, version,
      VersionedSource.bounds(filters.toIndexedSeq))
    val base = Versioned.readVersionFiles(spark, root, version, pruned)
    val filtered = filters.toIndexedSeq.flatMap(VersionedSource.toColumn)
      .foldLeft(base)(_ filter _)
    filtered.select(requiredColumns.toIndexedSeq.map(col): _*)
      .queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }

  override def toString: String =
    s"VersionedRelation($root, v$version)"
}

/** Version offset: the manifest version the batch read UP TO
  * (inclusive) — the table's own commit log is the stream's WAL. */
final case class VersionOffset(v: Long) extends OffsetV1 {
  override def json(): String = v.toString
}

/** Sub-version offset for file/byte-grain admission control
  * (`maxFilesPerTrigger`/`maxBytesPerTrigger`, the Delta-source
  * shape): versions BEFORE `v` are fully consumed, and of version
  * `v`'s insert files (manifest order) the first `idx` are consumed —
  * so a backfill commit drains across several bounded micro-batches
  * with exactly-once restart. Only ever minted for PURE-INSERT
  * versions ([[graft.operators.Versioned.feedAdmissionUnits]]). */
final case class VersionFileOffset(v: Long, idx: Long) extends OffsetV1 {
  require(idx >= 0, s"partial offset needs idx >= 0, got $idx")
  override def json(): String = s"$v:$idx"
}

/** The V1 streaming source over [[Versioned.changeFeed]]. A micro-batch
  * `(start, end]` is the exact row-level change feed of those versions;
  * `maxVersionsPerTrigger` caps how many versions one trigger admits. */
final class VersionedFeedSource(spark: SparkSession, root: String,
    startingVersion: Long, maxVersionsPerTrigger: Option[Long])
    extends Source {

  override val schema: StructType = VersionedSource.feedSchema(spark, root)

  // the highest version already handed to the engine (planned or
  // recovered); the engine re-calls getBatch for the last batch on
  // restart BEFORE polling getOffset again — the documented V1
  // contract Kafka's source relies on — so this re-syncs past the
  // checkpoint and a rate-limited restart can never re-admit or skip
  @volatile private var lastPlanned: Long = startingVersion

  private def ver(o: OffsetV1): Long = o.json().toLong

  override def getOffset: Option[OffsetV1] = {
    val latest = Versioned.latestVersion(root).getOrElse(return None)
    val target = maxVersionsPerTrigger
      .map(n => math.min(latest, lastPlanned + math.max(1L, n)))
      .getOrElse(latest)
    if (target > lastPlanned) lastPlanned = target
    if (lastPlanned > startingVersion) Some(VersionOffset(lastPlanned))
    else None
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(ver).getOrElse(startingVersion)
    val to = ver(end)
    lastPlanned = math.max(lastPlanned, to) // restart re-sync
    // schema is pinned at stream start. HISTORY older than the pin is
    // fine — versions from before a column existed null-fill into the
    // pinned schema, exactly like time travel. But once a version
    // EVOLVES PAST the pin (a column or type the pinned schema doesn't
    // have), the run must FAIL (a restart re-pins), never silently
    // drop or mistype drifted columns — the lakehouse-source contract.
    // Shapes are (name, type) pairs: nullability flags legitimately
    // drift between manifests (joins/unions relax them).
    def shape(s: StructType) = s.fields.toSeq.map(f => (f.name, f.dataType.sql))
    val pinned = shape(schema).toSet
    val now = VersionedSource.feedSchema(spark, root, Some(to))
    if (!shape(now).forall(pinned.contains)) throw new IllegalStateException(
      s"schema of versioned table at $root changed by version $to " +
        s"(stream started on ${schema.simpleString}, table is now " +
        s"${now.simpleString}); restart the streaming query to pick " +
        "up the new schema")
    val feed = Versioned.alignTo(
      Versioned.changeFeed(spark, root, from, Some(to)), schema)
    GraftShims.internalCreateDataFrame(spark,
      feed.queryExecution.toRdd, schema, isStreaming = true)
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"VersionedFeedSource($root, from=$startingVersion)"
}

/** The V1 streaming sink: every micro-batch is one atomic manifest
  * commit with the (appId, batchId) replay guard riding IN it
  * ([[Versioned.commitIfNew]]) — a replayed batch is recognized from
  * the table's own log and skipped, so the sink is exactly-once with
  * no side ledger that could diverge from the data under a crash. */
final class VersionedTableSink(spark: SparkSession, root: String,
    appId: String, mode: String, statsCols: Seq[String],
    mergeSchema: Boolean) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incremental frame arrives isStreaming=true and can't be
    // written directly; re-wrap its physical plan as a batch frame
    // (the standard V1 sink hop — toRdd executes lazily, once)
    val batch = GraftShims.internalCreateDataFrame(spark,
      data.queryExecution.toRdd, data.schema, isStreaming = false)
    Versioned.commitIfNew(spark, root, batch, appId, batchId,
      statsCols = statsCols, mode = mode, mergeSchema = mergeSchema)
  }

  override def name(): String = s"${VersionedSource.Name}:$root"

  override def toString: String =
    s"VersionedTableSink($root, $mode, appId=$appId)"
}
