package graft.sources

import java.io.File

import scala.collection.mutable

import org.apache.parquet.hadoop.{ParquetWriter => PqWriter}
import org.apache.spark.sql.{GraftParquetIO, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.util.SerializableConfiguration

import graft.operators.Versioned

/** The DSv2 executor-write core: tasks stream `InternalRow`s straight
  * into parquet files under the table's staging layout and report each
  * file's manifest entry (footer stats included) as the commit
  * message; the driver then publishes METADATA ONLY — one atomic CAS
  * manifest commit, never a second pass over the data. This is the
  * Iceberg/Delta write architecture, and what lets the catalog table
  * serve `writeStream.toTable` (exactly-once epochs) and dynamic
  * `INSERT OVERWRITE` natively at any scale: write cost is carried by
  * the executors, commit cost is O(files written).
  *
  * Invariants carried over from the driver write path ([[Versioned]]
  * `writeBatch`): CHECK constraints are evaluated per row IN the task
  * (bound expressions, resolved at plan time); partitioned tables
  * split rows per partition tuple so every staged file provably holds
  * ONE tuple (recorded as min==max footer stats — partition pruning
  * stays stats pruning); column mapping aliases logical→physical at
  * the parquet schema. Task retries/speculation may orphan a loser
  * attempt's files — never referenced (the commit coordinator admits
  * one attempt's message) and swept by VACUUM, the same economics as
  * a lost OCC race. Bloom-column indexing is NOT available on this
  * path (it needs a post-write aggregation pass); use `statsCols`.
  */
private[graft] object GraftWriteCore {

  /** Everything a task needs to write and account one batch. */
  case class JobSpec(
      root: String,
      batchRel: String,
      statsPhys: Seq[String],
      // (row index, datatype) of each partition column, physical order
      partIdx: Seq[(Int, DataType)],
      codec: String,
      conf: SerializableConfiguration,
      // constraint name -> bound predicate (coalesce(cond, true))
      checks: Seq[(String, Expression)],
      // HIDDEN partition transforms: bound derivation expression per
      // materialized column — the task evaluates each per row, splits
      // files by the derived tuple, and APPENDS the values to the
      // written row (the conf's schema already carries the hidden
      // fields), so footer min==max stats exist like any partition col
      partTx: Seq[(String, Expression, DataType)] = Nil)

  /** Driver-side spec construction for a write of `schema` (the
    * logical write schema) into the table at `root` under plan-time
    * `planned` properties. `partitioned=false` for modes that replace
    * the layout (Complete-mode overwrite). */
  def jobSpec(spark: SparkSession, root: String, schema: StructType,
      statsCols: Seq[String], planned: Versioned.PlannedTableMeta,
      partitioned: Boolean): JobSpec = {
    def phys(n: String): String = planned.physNames.getOrElse(n, n)
    val partCols = if (partitioned) planned.partitionBy else Nil
    val txByHidden = planned.transforms.map(t => t.hidden -> t).toMap
    val partIdx = partCols.filterNot(txByHidden.contains).map { pc =>
      val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(pc))
      require(i >= 0, s"the write omits partition column '$pc' — a " +
        "partitioned table needs every partition value on every row")
      (i, schema.fields(i).dataType)
    }
    // hidden partition transforms derive IN the task from the logical
    // write schema; references to a missing source fail loudly here
    // a delete-only delta write plans with an EMPTY row schema — its
    // tasks never insert, so the derivation is unreachable and skips;
    // a real insert schema missing the source still fails loudly
    val partTx = partCols.flatMap(txByHidden.get).flatMap { t =>
      if (schema.isEmpty) None
      else {
        val srcType = t.srcTypeIn(schema)
        Some((t.hidden,
          GraftParquetIO.boundExpr(spark, schema, t.sql(srcType)),
          t.dataType(srcType)))
      }
    }
    statsCols.foreach { sc =>
      require(schema.fieldNames.exists(_.equalsIgnoreCase(sc)),
        s"statsCols column '$sc' is not in the write schema " +
          schema.fieldNames.mkString(", "))
    }
    // files land under PHYSICAL names (same positions, renamed fields);
    // hidden transform columns append at the END (never mapped — their
    // name IS physical); stats are keyed physical — immutable across
    // renames
    val physSchema = StructType(schema.fields.map(f =>
      f.copy(name = phys(f.name))) ++
      partTx.map { case (hidden, _, dt) =>
        org.apache.spark.sql.types.StructField(hidden, dt,
          nullable = false) })
    val checks = planned.constraints.toSeq.sortBy(_._1).map {
      case (name, cond) =>
        name -> GraftParquetIO.boundCheck(spark, schema, cond)
    }
    JobSpec(new File(root).getAbsolutePath,
      s"data/${java.util.UUID.randomUUID().toString}",
      (statsCols.map(phys) ++ partCols.map(phys)).distinct,
      partIdx, GraftParquetIO.parquetCodec(spark),
      GraftParquetIO.taskWriteConf(spark, physSchema), checks, partTx)
  }

  def entriesOf(messages: Array[WriterCommitMessage]): Seq[Versioned.FileEntry] =
    messages.toSeq.collect {
      case GraftWriteMessage(entries) => entries
    }.flatten

  /** Best-effort removal of an aborted attempt's staged files (vacuum
    * would sweep them anyway — this just keeps failures tidy). */
  def cleanup(root: String, messages: Array[WriterCommitMessage]): Unit =
    entriesOf(messages.filter(_ != null)).foreach { e =>
      new File(root, e.path).delete(); ()
    }
}

/** One staged file set from one task attempt. */
private[graft] final case class GraftWriteMessage(
    entries: Seq[Versioned.FileEntry]) extends WriterCommitMessage

private[graft] final class GraftWriterFactory(spec: GraftWriteCore.JobSpec)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new GraftTaskWriter(spec, s"$partitionId-$taskId")
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftTaskWriter(spec, s"$epochId-$partitionId-$taskId")
}

/** Executor-side writer: one open parquet writer per partition tuple
  * seen by this task (one total for unpartitioned tables), constraint
  * checks per row, footer-stats manifest entries on commit. */
private[graft] final class GraftTaskWriter(spec: GraftWriteCore.JobSpec,
    suffix: String) extends DataWriter[InternalRow] {

  private val dir = new File(spec.root, spec.batchRel)
  private val writers =
    mutable.HashMap.empty[Seq[Any], PqWriter[InternalRow]]
  private val files = mutable.Buffer.empty[File]
  private var n = 0
  private lazy val hconf = spec.conf.value

  // the row-level rewrite hands carried rows as (metadata, data) pairs
  // (`DataAndMetadataWritingSparkTask`); provenance metadata (_file)
  // is bookkeeping this copy-on-write writer doesn't need — data only
  override def write(metadata: InternalRow, row: InternalRow): Unit =
    write(row)

  // reusable append machinery for hidden partition transforms: the
  // parquet writer consumes the row synchronously inside write(), so
  // one JoinedRow + value buffer serves every row of the task
  private val txValues = new Array[Any](spec.partTx.size)
  private val txRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(txValues)
  private val joined =
    new org.apache.spark.sql.catalyst.expressions.JoinedRow()

  override def write(row: InternalRow): Unit = {
    spec.checks.foreach { case (name, pred) =>
      if (pred.eval(row) == false) throw new IllegalArgumentException(
        s"CHECK constraint '$name' violated by an incoming row")
    }
    val idKey: Seq[Any] = spec.partIdx.map { case (i, dt) =>
      val v = row.get(i, dt)
      if (v == null) throw new IllegalArgumentException(
        "null value in a partition column — partitioned tables " +
          "require non-null partition values")
      InternalRow.copyValue(v) // rows are reused; pin the key bytes
    }
    if (spec.partTx.isEmpty) {
      writers.getOrElseUpdate(idKey, open()).write(row)
    } else {
      var i = 0
      spec.partTx.foreach { case (hidden, expr, _) =>
        val v = expr.eval(row)
        if (v == null) throw new IllegalArgumentException(
          s"a row derives NULL for partition transform column " +
            s"'$hidden' — partition transform sources must be non-null")
        txValues(i) = v; i += 1
      }
      val key: Seq[Any] = idKey ++ txValues.map(InternalRow.copyValue)
      writers.getOrElseUpdate(key, open()).write(joined(row, txRow))
    }
  }

  private def open(): PqWriter[InternalRow] = {
    dir.mkdirs()
    val f = new File(dir, f"part-$suffix-$n%05d.parquet"); n += 1
    files += f
    GraftParquetIO.openRowWriter(hconf, f.getPath, spec.codec)
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_.close())
    writers.clear()
    GraftWriteMessage(files.toSeq.map(f =>
      Versioned.fileEntryWithConf(spec.root, f, spec.statsPhys, hconf)))
  }

  override def abort(): Unit = {
    writers.values.foreach(w => try w.close() catch { case _: Exception => () })
    writers.clear()
    files.foreach(_.delete())
  }

  override def close(): Unit =
    writers.values.foreach(w => try w.close() catch { case _: Exception => () })
}

/** Native streaming write for the catalog table: every epoch is one
  * atomic manifest commit carrying the (queryId, epochId) replay guard
  * — exactly-once across restarts with no side ledger. Append mode
  * appends; Complete mode overwrites the snapshot per epoch (the
  * aggregate-MV shape). An epoch with no data publishes nothing in
  * append mode (a replayed empty epoch is naturally idempotent). */
private[graft] final class GraftStreamingWrite(spark: SparkSession,
    root: String, queryId: String, schema: StructType, mode: String,
    statsCols: Seq[String], mergeSchema: Boolean) extends StreamingWrite {

  private val planned = Versioned.plannedMeta(root)
  // Complete-mode (overwrite) publishes CANONICALIZE the column
  // mapping to identity (publishStagedIfNew mode=overwrite), so the
  // staged files must land under LOGICAL names — otherwise a
  // column-mapped table's renamed columns would silently read all-null
  // after the epoch (the files would store stale physical names the
  // canonicalized manifest no longer maps). Append keeps the mapping.
  private val spec = GraftWriteCore.jobSpec(spark, root, schema,
    statsCols,
    if (mode == "overwrite") planned.copy(physNames = Map.empty)
    else planned,
    partitioned = mode == "append")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftWriterFactory(spec)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val entries = GraftWriteCore.entriesOf(messages)
    if (entries.nonEmpty || mode == "overwrite") {
      Versioned.publishStagedIfNew(root, entries, schema, queryId,
        epochId, mode, mergeSchema, planned); ()
    }
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    GraftWriteCore.cleanup(root, messages)

  override def toString: String = s"GraftStreamingWrite($root, $mode)"
}

/** Native dynamic partition overwrite (`INSERT OVERWRITE` under
  * `partitionOverwriteMode=dynamic`, `writeTo.overwritePartitions()`):
  * replaces exactly the partition tuples present in the written data,
  * carries every other live file by reference. */
private[graft] final class GraftDynamicOverwriteWrite(spark: SparkSession,
    root: String, schema: StructType) extends BatchWrite {

  private val planned = Versioned.plannedMeta(root)
  // dynamic overwrite of an UNPARTITIONED table degenerates to a full
  // overwrite, whose publish canonicalizes the column mapping to
  // identity — stage those files under LOGICAL names (same hazard as
  // Complete-mode streaming: stale physical names would read all-null)
  private val spec = GraftWriteCore.jobSpec(spark, root, schema,
    statsCols = Nil,
    if (planned.partitionBy.isEmpty) planned.copy(physNames = Map.empty)
    else planned,
    partitioned = true)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(spec)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    Versioned.publishStagedDynamicOverwrite(root,
      GraftWriteCore.entriesOf(messages), schema, planned); ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftWriteCore.cleanup(root, messages)

  override def toString: String = s"GraftDynamicOverwrite($root)"
}
