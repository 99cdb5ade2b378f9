package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.operators.Versioned

/** The NATIVE DSv2 micro-batch stream over a catalog table — what
  * `spark.readStream.table("cat.ns.t")` plans through the
  * `MICRO_BATCH_READ` capability (no V1 fallback node anywhere).
  * Offsets are manifest versions (atomic, totally ordered,
  * checkpoint-serializable); a micro-batch `(start, end]` is planned
  * PARTITION-GRAIN straight from the manifests:
  *
  *  - bare `readStream.table(t)` serves table-schema ROWS — the rows
  *    each append commit introduced ([[Versioned.changesSince]]
  *    semantics, Delta's streaming-read default). A commit that
  *    REMOVES rows fails loudly (rows can't represent it) unless
  *    `skipChangeCommits=true` (Delta's option, lossy) — or unless
  *    the query projects the envelope, below;
  *  - projecting the `_change_type` / `_commit_version` METADATA
  *    columns upgrades the stream to the full row-level change feed
  *    ([[Versioned.changeFeed]] semantics): inserts from new files,
  *    CoW merge/delete/update from their cdf files, positional and
  *    predicate merge-on-read deletes replayed lazily from the
  *    manifest + immutable sidecars — byte-equal to the batch feed.
  *
  * Reader options ride the catalog path: `startingVersion` (default
  * 0 = full history), `maxVersionsPerTrigger` (admission control),
  * `skipChangeCommits`. Insert envelopes — the hot path — read
  * through Spark's VECTORIZED parquet reader with the envelope
  * constants riding the partition-value mechanism; replay pieces
  * (cdf / predicate / positional) are row-grain with driver-bound
  * predicate expressions and per-file position sets, all O(changed
  * data), never a snapshot re-read. */
final class GraftMicroBatchStream(spark: SparkSession, root: String,
    required: StructType, tableSchema: StructType,
    options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def opt(k: String): Option[String] = Option(options.get(k))
  private val startingVersion = opt("startingversion")
    .orElse(opt("startingVersion")).map(_.toLong).getOrElse(0L)
  private val maxVersions = opt("maxversionspertrigger")
    .orElse(opt("maxVersionsPerTrigger")).map(_.toLong)
  private val skipChangeCommits = opt("skipchangecommits")
    .orElse(opt("skipChangeCommits")).exists(_.toBoolean)

  // the projection contract: data columns first, then any of the
  // envelope metadata columns (_change_type, _commit_version)
  private val envNames = Set("_change_type", "_commit_version")
  private val dataCount = required.fieldNames.count(n => !envNames(n))
  require(required.fieldNames.zipWithIndex.forall { case (n, i) =>
    envNames(n) == (i >= dataCount) },
    s"envelope metadata columns must trail the data columns, got " +
      required.fieldNames.mkString(", "))
  private val tail: Seq[String] =
    required.fieldNames.drop(dataCount).toIndexedSeq
  private val wantsEnvelope = tail.contains("_change_type")
  private val dataSchema = StructType(required.fields.take(dataCount))
  // streaming scans are not column-pruned today; if a future engine
  // prunes, predicate binding below would silently mis-resolve — pin it
  require(dataSchema.fieldNames.sameElements(tableSchema.fieldNames),
    "the streaming scan expects the full table schema projection, got " +
      dataSchema.fieldNames.mkString(", "))

  private def ver(o: Offset): Long = o.json().toLong

  override def initialOffset(): Offset = VersionOffset(startingVersion)

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  // Trigger.AvailableNow: the run's END is fixed ONCE at prepare time
  // (versions landing mid-drain wait for the next run), while
  // maxVersionsPerTrigger still paces the individual batches — the
  // Kafka source's admission shape
  @volatile private var availableTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Versioned.latestVersion(root)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = ver(start)
    val latestNow = Versioned.latestVersion(root).getOrElse(return start)
    val bound = availableTarget
      .map(t => math.min(t, latestNow)).getOrElse(latestNow)
    val target = maxVersions
      .map(n => math.min(bound, from + math.max(1L, n)))
      .getOrElse(bound)
    if (target > from) VersionOffset(target) else start
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val from = ver(start); val to = ver(end)
    if (to <= from) return Array.empty
    // schema pinned at stream start: history older than the pin
    // null-fills; a table that EVOLVED PAST the pin fails the run (a
    // restart re-pins) — the lakehouse-source contract
    def shape(s: StructType) = s.fields.toSeq.map(f => (f.name, f.dataType.sql))
    val pinned = shape(tableSchema).toSet
    val now = Versioned.tableSchema(spark, root, Some(to))
    if (!shape(now).forall(pinned.contains)) throw new IllegalStateException(
      s"schema of versioned table at $root changed by version $to " +
        s"(stream pinned ${tableSchema.simpleString}, table is now " +
        s"${now.simpleString}); restart the streaming query to pick " +
        "up the new schema")
    val (pieces, _, physNames) = Versioned.feedWindowPlan(root, from, to,
      appendsOnly = !wantsEnvelope, skipChangeCommits)
    val rootAbs = new java.io.File(root).getAbsolutePath
    def abs(rel: String) = {
      val f = new java.io.File(rel)
      if (f.isAbsolute) f.getPath else new java.io.File(rootAbs, rel).getPath
    }
    val maxPart = spark.sessionState.conf.filesMaxPartitionBytes
    val parts = Seq.newBuilder[InputPartition]
    pieces.foreach {
      case Versioned.FeedInsert(v, fs) =>
        // pack insert files into bounded partitions (the hot path —
        // a backfill window is the whole table)
        var cur = Seq.newBuilder[GraftFeedChunk]; var bytes = 0L
        var empty = true
        fs.foreach { case (rel, b) =>
          if (!empty && bytes + b > maxPart) {
            parts += GraftFeedPartition(cur.result())
            cur = Seq.newBuilder[GraftFeedChunk]; bytes = 0L; empty = true
          }
          cur += GraftFeedChunk(abs(rel), rel, v, kind = 0)
          bytes += b; empty = false
        }
        if (!empty) parts += GraftFeedPartition(cur.result())
      case Versioned.FeedCdf(v, fs) =>
        parts ++= fs.map(f =>
          GraftFeedPartition(Seq(GraftFeedChunk(abs(f), f, v, kind = 1))))
      case Versioned.FeedMorDelete(v, fs, pred, parentPreds) =>
        parts ++= fs.map(f => GraftFeedPartition(Seq(GraftFeedChunk(
          abs(f), f, v, kind = 2, matchPred = pred,
          keepNotPreds = parentPreds.getOrElse(f, Nil)))))
      case Versioned.FeedDvDelete(v, perFile) =>
        parts ++= perFile.map { case (f, inline, sidecars) =>
          GraftFeedPartition(Seq(GraftFeedChunk(abs(f), f, v, kind = 3,
            positions = inline, sidecars = sidecars.map(abs))))
        }
    }
    val out = parts.result().toArray
    // Spark refuses mixed row/columnar partitions within one scan:
    // the factory goes columnar only when THIS window is pure inserts
    lastWindowAllInserts = out.forall(
      _.asInstanceOf[GraftFeedPartition].chunks.forall(_.kind == 0))
    out
  }

  // set by planInputPartitions (driver-side, paired with the factory
  // creation that follows it in both batch and micro-batch execution)
  @volatile private var lastWindowAllInserts = true

  override def createReaderFactory(): PartitionReaderFactory = {
    val physNames = Versioned.plannedMeta(root).physNames
    def phys(n: String): String = physNames.getOrElse(n, n)
    val physData = StructType(dataSchema.fields.map(f =>
      f.copy(name = phys(f.name))))
    // cdf files store LOGICAL names (they are commit artifacts of the
    // DataFrame verbs) — requested logical + the in-file change type
    val cdfRequested = StructType(dataSchema.fields :+
      StructField("_change_type", StringType, nullable = true))
    // predicate binding happens DRIVER-side against the logical
    // schema; bound expressions ship to tasks like any task closure
    val vectorized = lastWindowAllInserts &&
      spark.sessionState.conf.parquetVectorizedReaderEnabled &&
        org.apache.spark.sql.GraftParquetIO.isVectorizable(spark, physData)
    new GraftFeedReaderFactory(
      org.apache.spark.sql.GraftParquetIO.taskReadConf(spark, physData),
      org.apache.spark.sql.GraftParquetIO.taskReadConf(spark, cdfRequested),
      org.apache.spark.sql.GraftParquetIO.taskReadConf(spark,
        GraftParquetReaderFactory.DvSchema),
      tail, dataSchema.fields.map(_.dataType).toIndexedSeq,
      bindPredicates(), vectorized,
      org.apache.spark.sql.GraftParquetIO.columnarBatchSize(spark))
  }

  /** Bind every predicate SQL any mor-delete piece in ANY window could
    * reference… bound lazily per factory: predicates come per chunk as
    * SQL text; the factory binds on first use per executor — but
    * expression binding needs the analyzer (driver-only). So bind
    * DRIVER-side: collect the texts from the manifests in the pinned
    * table's RETAINED history once per factory creation (bounded by
    * pending-predicate count, typically zero or a handful). */
  private def bindPredicates(): Map[String, Expression] = {
    val texts = Versioned.pendingMorPredicates(root)
    texts.map(t => t -> org.apache.spark.sql.GraftParquetIO
      .boundPredicate(spark, dataSchema, t, nullVerdict = false)).toMap
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftMicroBatchStream($root, from=$startingVersion)"
}

/** One feed chunk: a whole file plus its envelope recipe.
  * kind 0 = insert (constants: 'insert', version);
  * kind 1 = cdf file (change type IN the file, version constant);
  * kind 2 = predicate-delete replay (rows surviving `keepNotPreds`
  *          and matching `matchPred` emit as deletes);
  * kind 3 = positional-delete replay (rows AT `positions` ∪ sidecar
  *          positions emit as deletes). */
private[sources] final case class GraftFeedChunk(path: String,
    relPath: String, version: Long, kind: Int,
    matchPred: String = "", keepNotPreds: Seq[String] = Nil,
    positions: Seq[Long] = Nil, sidecars: Seq[String] = Nil)

private[sources] final case class GraftFeedPartition(
    chunks: Seq[GraftFeedChunk]) extends InputPartition

private[sources] final class GraftFeedReaderFactory(
    dataConf: SerializableConfiguration,
    cdfConf: SerializableConfiguration,
    dvConf: SerializableConfiguration,
    tail: Seq[String],
    dataTypes: IndexedSeq[org.apache.spark.sql.types.DataType],
    boundPreds: Map[String, Expression],
    vectorized: Boolean, capacity: Int) extends PartitionReaderFactory {

  import org.apache.spark.sql.vectorized.ColumnarBatch

  // only pure-insert partitions take the columnar path (their envelope
  // is constants, served by the reader's partition-value mechanism)
  override def supportColumnarReads(p: InputPartition): Boolean =
    vectorized &&
      p.asInstanceOf[GraftFeedPartition].chunks.forall(_.kind == 0)

  private def constTail(version: Long): Option[(StructType, InternalRow)] =
    if (tail.isEmpty) None
    else Some((
      StructType(tail.map {
        case "_change_type" =>
          StructField("_change_type", StringType, nullable = true)
        case n => StructField(n, LongType, nullable = true)
      }),
      new GenericInternalRow(tail.map {
        case "_change_type" => UTF8String.fromString("insert"): Any
        case _ => version: Any
      }.toArray)))

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val p = partition.asInstanceOf[GraftFeedPartition]
    new PartitionReader[ColumnarBatch] {
      private val it = p.chunks.iterator
      private var reader: org.apache.spark.sql.execution.datasources
        .parquet.VectorizedParquetRecordReader = _
      @scala.annotation.tailrec
      override def next(): Boolean = {
        if (reader != null) {
          if (reader.nextBatch()) return true
          reader.close(); reader = null
        }
        if (!it.hasNext) false
        else {
          val c = it.next()
          reader = org.apache.spark.sql.GraftParquetIO.openColumnarReader(
            dataConf.value, c.path, 0L, Long.MaxValue, capacity,
            constTail(c.version))
          next()
        }
      }
      override def get(): ColumnarBatch = reader.resultBatch()
      override def close(): Unit = if (reader != null) reader.close()
    }
  }

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftFeedPartition]
    new PartitionReader[InternalRow] {
      private val it = p.chunks.iterator
      private var reader: org.apache.parquet.hadoop.ParquetReader[InternalRow] = _
      private var chunk: GraftFeedChunk = _
      private val joined = new JoinedRow
      private var tailRow: GenericInternalRow = _
      private var keep: Seq[Expression] = Nil
      private var matchP: Expression = _
      private var bits: java.util.BitSet = _
      private var pos = -1L
      private var row: InternalRow = _
      // kind 1 reads data+_change_type from the file; required order is
      // data…, then `tail` — reassemble via a reusable output row
      private var cdfOut: GenericInternalRow = _

      private def sidecarBits(c: GraftFeedChunk): java.util.BitSet = {
        val b = new java.util.BitSet()
        c.positions.foreach(p => b.set(p.toInt))
        val target = UTF8String.fromString(c.relPath)
        c.sidecars.foreach { sc =>
          val r = org.apache.spark.sql.GraftParquetIO
            .openRowReader(dvConf.value, sc)
          try {
            var x = r.read()
            while (x != null) {
              if (x.getUTF8String(0) == target) b.set(x.getLong(1).toInt)
              x = r.read()
            }
          } finally r.close()
        }
        b
      }

      @scala.annotation.tailrec
      override def next(): Boolean = {
        if (reader != null) {
          row = reader.read()
          // per-kind row admission
          while (row != null && !admit(row)) row = reader.read()
          if (row != null) return true
          reader.close(); reader = null
        }
        if (!it.hasNext) false
        else {
          chunk = it.next()
          val conf = if (chunk.kind == 1) cdfConf else dataConf
          reader = org.apache.spark.sql.GraftParquetIO
            .openRowReader(conf.value, chunk.path)
          pos = -1L
          keep = chunk.keepNotPreds.map(t => boundPreds.getOrElse(t,
            throw new IllegalStateException(s"unbound mor predicate: $t")))
          matchP =
            if (chunk.kind == 2) boundPreds.getOrElse(chunk.matchPred,
              throw new IllegalStateException(
                s"unbound mor predicate: ${chunk.matchPred}"))
            else null
          bits = if (chunk.kind == 3) sidecarBits(chunk) else null
          if (tail.nonEmpty) {
            tailRow = new GenericInternalRow(tail.length)
            tail.zipWithIndex.foreach {
              case ("_change_type", i) => tailRow.update(i,
                UTF8String.fromString(
                  if (chunk.kind == 0) "insert" else "delete"))
              case (_, i) => tailRow.update(i, chunk.version)
            }
          }
          if (chunk.kind == 1) cdfOut = new GenericInternalRow(
            dataTypes.length + tail.length)
          next()
        }
      }

      private def admit(r: InternalRow): Boolean = chunk.kind match {
        case 0 => true
        case 1 => true
        case 2 =>
          // survives every parent predicate (not already deleted) AND
          // matches this delete's predicate
          keep.forall(_.eval(r) == false) && matchP.eval(r) == true
        case 3 => pos += 1; bits.get(pos.toInt)
        case k => throw new IllegalStateException(s"unknown kind $k")
      }

      override def get(): InternalRow = chunk.kind match {
        case 1 =>
          // file row = data… , _change_type; output = data…, tail
          val n = dataTypes.length
          var i = 0
          while (i < n) {
            cdfOut.update(i,
              if (row.isNullAt(i)) null else row.get(i, dataTypes(i)))
            i += 1
          }
          tail.zipWithIndex.foreach {
            case ("_change_type", j) =>
              cdfOut.update(n + j,
                if (row.isNullAt(n)) null else row.getUTF8String(n))
            case (_, j) => cdfOut.update(n + j, chunk.version)
          }
          cdfOut
        case _ => if (tail.nonEmpty) joined(row, tailRow) else row
      }

      override def close(): Unit = if (reader != null) reader.close()
    }
  }
}

/** The `.changes` CHANGE-FEED metadata table (`cat.ns.t.changes` —
  * Iceberg's `db.table.changes` convention): the table's row-level
  * change feed as a first-class relation. Schema = table columns +
  * `_change_type` + `_commit_version` (fixed — no option-dependent
  * schema, which is what makes this surface possible in pure DSv2
  * where `readStream.table` cannot negotiate projections).
  *
  *  - `spark.readStream.table("cat.ns.t.changes")` — the NATIVE
  *    micro-batch change feed: every commit kind replays
  *    partition-grain from the manifest (see
  *    [[GraftMicroBatchStream]]); options `startingVersion`,
  *    `maxVersionsPerTrigger`.
  *  - `spark.read.table("cat.ns.t.changes")` — the batch window
  *    `(startingVersion, endingVersion]` (defaults: full history),
  *    row-equal to [[Versioned.changeFeed]].
  */
final class GraftFeedTable(spark: SparkSession, fullName: String,
    root: String)
    extends org.apache.spark.sql.connector.catalog.Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {

  import org.apache.spark.sql.connector.catalog.TableCapability

  override def name(): String = fullName

  override lazy val schema: StructType =
    VersionedSource.feedSchema(spark, root)

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    new org.apache.spark.sql.connector.read.ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new GraftFeedScan(spark, root, schema, options)
    }

  override def toString: String = s"GraftFeedTable($fullName)"
}

/** Scan of the `.changes` table: batch = one planned window,
  * streaming = the native micro-batch stream (envelope mode). */
final class GraftFeedScan(spark: SparkSession, root: String,
    feedSchema: StructType, options: CaseInsensitiveStringMap)
    extends org.apache.spark.sql.connector.read.Scan
    with org.apache.spark.sql.connector.read.Batch {

  private def opt(k: String): Option[String] =
    Option(options.get(k))

  override def readSchema(): StructType = feedSchema

  override def toBatch: org.apache.spark.sql.connector.read.Batch = this

  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new GraftMicroBatchStream(spark, root, feedSchema,
      StructType(feedSchema.fields.dropRight(2)), options)

  // batch: plan the (startingVersion, endingVersion] window through
  // the same partition-grain feed planner the stream uses
  private lazy val stream = new GraftMicroBatchStream(spark, root,
    feedSchema, StructType(feedSchema.fields.dropRight(2)), options)

  override def planInputPartitions(): Array[InputPartition] = {
    val from = opt("startingversion").map(_.toLong).getOrElse(0L)
    val to = opt("endingversion").map(_.toLong)
      .orElse(Versioned.latestVersion(root)).getOrElse(0L)
    stream.planInputPartitions(VersionOffset(from), VersionOffset(to))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    stream.createReaderFactory()

  override def description(): String = s"GraftFeedScan($root)"
}
