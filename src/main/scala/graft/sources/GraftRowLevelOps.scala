package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

import graft.operators.Versioned

/** Group-based (copy-on-write) DSv2 row-level operations: plain
  * `spark.sql("MERGE INTO cat.ns.t …")` / UPDATE / DELETE plan through
  * Spark's own `RewriteMergeIntoTable` / `RewriteUpdateTable` /
  * `RewriteDeleteFromTable` analyzer rules with no dispatcher anywhere.
  *
  * The contract (Iceberg's copy-on-write shape): the operation's SCAN
  * records exactly which files it planned (manifest-stats pruned by
  * whatever filters Spark pushed); the WRITE stages the replacement
  * rows through the executor-write core and the commit swaps exactly
  * the recorded files for the staged ones — every untouched live file
  * carries by reference. The table version is pinned at analysis; a
  * concurrent commit fails the publish loudly (the replacement rows
  * were computed from the pinned snapshot — Delta's concurrent-
  * modification abort).
  *
  * Scale posture, honestly: Spark's group-based rewrite puts no
  * statically-prunable predicate above the target relation for UPDATE/
  * MERGE (the candidate-set derivation lives in runtime group
  * filtering, which needs a native DSv2 batch scan), so those two
  * verbs through BARE SQL rewrite every file the static pushdown
  * can't exclude. DELETE avoids this entirely: [[GraftTable]] also
  * implements `SupportsDelete`, so Spark's
  * `OptimizeMetadataOnlyDeleteFromTable` converts any DELETE whose
  * condition translates exactly into [[Versioned.delete]] — the
  * file-pruned verb. For pruned UPDATE/MERGE at scale, the
  * [[graft.operators.VersionedSql]] dispatcher remains the fast path
  * (keys-frame pruning); bare SQL is the compatibility surface. */
final class GraftRowLevelOperation(spark: SparkSession, root: String,
    pinned: Long, cmd: RowLevelOperation.Command,
    tableSchema: StructType) extends RowLevelOperation {

  // relative paths of the files the scan planned — what commit swaps
  @volatile private var scanned: Option[Seq[String]] = None

  private[sources] def recordScanned(files: Seq[String]): Unit =
    scanned = Some(files)

  override def command(): RowLevelOperation.Command = cmd

  /** Row provenance for the rewrite: Spark's group-based plan routes
    * rows through `DataAndMetadataWritingSparkTask` (which projects
    * the data row back out of the `__row_operation`-tagged join row)
    * only when the operation asks for metadata — `_file` is also the
    * natural group key for a future file-grain runtime filter. */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("_file"))

  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : ScanBuilder =
    new GraftRowLevelScanBuilder(spark, root, pinned, tableSchema, this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GraftReplaceFilesWrite(spark, root, pinned, info.schema,
            () => scanned.getOrElse(throw new IllegalStateException(
              "row-level write ran before its scan planned files")),
            cmd.toString.toLowerCase(java.util.Locale.ROOT))
        override def toString: String = s"GraftRowLevelWrite($root)"
      }
    }

  override def description(): String =
    s"GraftRowLevelOperation($cmd, $root, v$pinned)"
}

/** The row-level scan builder. Unlike plain catalog reads (which ride
  * the V1 bridge), the row-level rewrite plans a genuine DSv2
  * `BatchScanExec` — so this path has its own native parquet batch
  * scan: one input partition per manifest file, task-side row readers
  * through Spark's own parquet materializer, manifest-stats pruning
  * from the pushed filters, and RUNTIME group filtering on the
  * partition columns (Spark's `RowLevelOperationRuntimeGroupFiltering`
  * derives the matching groups and narrows the scan — and with it the
  * replaced file set — at execution time). */
final class GraftRowLevelScanBuilder(spark: SparkSession, root: String,
    version: Long, tableSchema: StructType, op: GraftRowLevelOperation)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = tableSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // advisory: all re-applied above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftRowLevelScan(spark, root, version, required,
      pushed.toIndexedSeq, op.recordScanned)
}

/** Native DSv2 batch scan over one pinned version. Serves the `_file`
  * provenance metadata column (one input partition per manifest file);
  * used by row-level operations (which record their planned file set
  * through `onScanned`) AND by any regular catalog read that asks for
  * `_file` — including Spark's runtime-group-filter subquery, which
  * deliberately scans through the ORIGINAL table's builder ("a regular
  * batch scan") and must see the same `_file` domain the row-level
  * scan prunes by. `filter` (runtime group filtering) re-prunes the
  * file list by partition-column IN/EQ stats bounds and by `_file`
  * identity, re-recording the scanned set — the write then swaps only
  * the files that could hold matching groups. */
final class GraftRowLevelScan(spark: SparkSession, root: String,
    version: Long, required: StructType,
    pushed: Seq[Filter], onScanned: Seq[String] => Unit)
    extends Scan with org.apache.spark.sql.connector.read.Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  import org.apache.spark.sql.connector.expressions.{Expressions, Literal => V2Literal, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}

  // this scan reads manifest files RAW — pending merge-on-read state
  // (predicate deletes, deletion vectors) would silently resurrect
  // deleted rows, so refuse loudly up front: both for a row-level
  // operation (whose publish would refuse anyway — this fails at plan
  // time instead) and for a plain `SELECT _file, …` read
  require(!Versioned.pendingMorState(root, version),
    s"table at $root has pending merge-on-read state (predicate " +
      "deletes or deletion vectors); compact to materialize it before " +
      "a raw-file scan (row-level operation or a read projecting the " +
      "_file provenance column) — a raw scan would resurrect deleted rows")

  private val planned = Versioned.plannedMeta(root)
  private def phys(n: String): String = planned.physNames.getOrElse(n, n)

  @volatile private var files: Seq[String] =
    Versioned.candidateFilesForBounds(root, version,
      VersionedSource.bounds(pushed))
  onScanned(files)

  override def readSchema(): StructType = required

  override def toBatch: org.apache.spark.sql.connector.read.Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val rootAbs = new java.io.File(root).getAbsolutePath
    files.map(rel => GraftFilePartition(
      new java.io.File(rootAbs, rel).getPath, rel): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // `_file` (the provenance metadata column) is served by the reader
    // itself, not parquet; Spark appends metadata output after data
    // output, so it can only sit last
    val fileIdx = required.fieldNames.indexOf("_file")
    require(fileIdx < 0 || fileIdx == required.length - 1,
      s"_file must be the trailing column, got ${required.fieldNames
        .mkString(", ")}")
    val dataFields = required.fields.filterNot(_.name == "_file")
    // request the PHYSICAL projection of the data columns — files
    // under column mapping store physical names; row positions stay
    // the logical order the query expects
    val physRequested = StructType(dataFields.map(f =>
      f.copy(name = phys(f.name))))
    new GraftParquetReaderFactory(
      org.apache.spark.sql.GraftParquetIO.taskReadConf(spark,
        physRequested), withFileColumn = fileIdx >= 0)
  }

  // ---- runtime group filtering: ONE grain for every table shape —
  // `_file` itself (Iceberg's copy-on-write group). The matching-rows
  // plan reads a scan that serves _file per row, so the runtime
  // predicate names the EXACT files holding matches and the scan
  // narrows to precisely the touched set (one matching pass, the same
  // economics as the dispatcher's keys-frame probe, then a
  // file-identity prune). This must be a SINGLE attribute: Spark ships
  // a multi-attribute group filter as a struct-IN, which has no V2
  // predicate translation — it never reaches the scan at all (verified
  // empirically: a (day, src)-partitioned MERGE with partition-column
  // grains rewrote every file). File identity is also strictly finer
  // than any partition-tuple grain, so partitioned tables prune at
  // least as well as before — a MERGE touching one (day, src) pair
  // carries every other partition's files by identity.
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("_file"))

  override def filter(predicates: Array[V2Predicate]): Unit = {
    // an empty matching set arrives as ALWAYS_FALSE or a value-less IN
    // — no group matches: scan (and therefore replace) NOTHING
    val none = predicates.exists(p => p.name() == "ALWAYS_FALSE" ||
      (p.name() == "IN" && p.children().length == 1))
    val bounds = predicates.toSeq.flatMap(runtimeBound)
    if (none) files = Nil
    else {
      val (fileBounds, statBounds) = bounds.partition(_.col == "_file")
      if (statBounds.nonEmpty) {
        val narrowed = Versioned.candidateFilesForBounds(root, version,
          VersionedSource.bounds(pushed) ++ statBounds).toSet
        files = files.filter(narrowed)
      }
      // _file prunes by identity, not stats: keep exactly the named files
      fileBounds.foreach { b =>
        val keep = b.values.getOrElse(Nil).map(_.toString).toSet
        files = files.filter(keep)
      }
    }
    if (none || bounds.nonEmpty) onScanned(files)
  }

  /** Runtime V2 predicate → a conservative stats bound. Only shapes
    * that IMPLY a bound translate (IN/EQ on one column with literal
    * values of a stats-comparable type); anything else is skipped —
    * pruning is advisory, skipping is always safe. */
  private def runtimeBound(p: V2Predicate): Option[Versioned.ColumnBound] = {
    def ext(v: Any): Option[Any] = v match {
      case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
      case n: java.lang.Integer => Some(n.longValue())
      case n: java.lang.Long => Some(n)
      case n: java.lang.Short => Some(n.longValue())
      case n: java.lang.Float => Some(n.doubleValue())
      case n: java.lang.Double => Some(n)
      case _ => None // dates/timestamps arrive internal: skip, safe
    }
    p.name() match {
      case "IN" | "=" => p.children().toSeq match {
        case Seq(f: NamedReference, rest @ _*)
            if rest.nonEmpty && rest.forall(_.isInstanceOf[V2Literal[_]]) =>
          val col = f.fieldNames().mkString(".")
          val vals = rest.map(l =>
            ext(l.asInstanceOf[V2Literal[_]].value))
          if (vals.forall(_.isDefined))
            Some(Versioned.inBound(col, vals.flatten.toIndexedSeq))
          else None
        case _ => None
      }
      case _ => None
    }
  }

  override def description(): String =
    s"GraftRowLevelScan($root, v$version, ${files.size} files)"
}

private[sources] final case class GraftFilePartition(path: String,
    relPath: String)
    extends org.apache.spark.sql.connector.read.InputPartition

private[sources] final class GraftParquetReaderFactory(
    conf: org.apache.spark.util.SerializableConfiguration,
    withFileColumn: Boolean)
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {

  override def createReader(
      partition: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] = {
    val p = partition.asInstanceOf[GraftFilePartition]
    new org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] {
      private val reader =
        org.apache.spark.sql.GraftParquetIO.openRowReader(conf.value, p.path)
      // `_file` rides a JoinedRow tail — one shared single-field row,
      // zero per-row allocation
      private val joined =
        new org.apache.spark.sql.catalyst.expressions.JoinedRow
      private val fileRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](org.apache.spark.unsafe.types.UTF8String
            .fromString(p.relPath)))
      private var row: org.apache.spark.sql.catalyst.InternalRow = _
      override def next(): Boolean = { row = reader.read(); row != null }
      override def get(): org.apache.spark.sql.catalyst.InternalRow =
        if (withFileColumn) joined(row, fileRow) else row
      override def close(): Unit = reader.close()
    }
  }
}

/** The replacement write: executor-staged files in, one CAS commit
  * swapping the scanned set for the staged set. */
private[graft] final class GraftReplaceFilesWrite(spark: SparkSession,
    root: String, pinned: Long, schema: StructType,
    scanned: () => Seq[String], action: String) extends BatchWrite {

  private val planned = Versioned.plannedMeta(root)
  private val spec = GraftWriteCore.jobSpec(spark, root, schema,
    statsCols = Nil, planned, partitioned = true)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(spec)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    Versioned.publishStagedReplace(root, scanned(),
      GraftWriteCore.entriesOf(messages), schema, pinned, planned,
      action); ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftWriteCore.cleanup(root, messages)

  override def toString: String = s"GraftReplaceFilesWrite($root)"
}
