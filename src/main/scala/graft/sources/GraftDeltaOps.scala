package graft.sources

import java.io.File

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.operators.Versioned

/** DELTA-BASED (merge-on-read) DSv2 row-level operations
  * (`SupportsDelta` — Iceberg's position-delta architecture, Delta's
  * deletion-vector economics): plain `spark.sql("MERGE/UPDATE/DELETE
  * …")` against a catalog table publishes O(mutation) metadata —
  * deleted row POSITIONS (merged into the table's deletion vectors)
  * plus staged files for inserted/updated rows — while every existing
  * data file carries by identity. The complement of the group-based
  * copy-on-write operation ([[GraftRowLevelOperation]]): a 1-row
  * UPDATE in a 1 GB file writes one tiny file and one position,
  * not a 1 GB rewrite.
  *
  * Row identity is `(_file, _pos)` — the same (file, row_index) key
  * the deletion-vector verbs ([[Versioned.deleteRows]]) and readers
  * already speak, so delta commits COMPOSE with them: pending vectors
  * anti-filter the matching scan (only live rows match) and the
  * publish merges new positions in. The change feed replays a delta
  * commit lazily from the manifest (deletes from the fresh positions,
  * inserts from the new files) — an UPDATE appears as delete+insert
  * envelopes, the deletion-vector CDC convention.
  *
  * Mode selection (`spark.graft.rowlevel.mode`): `cow` forces the
  * group-based rewrite, `mor` forces this delta path, and `auto` (the
  * default) picks copy-on-write for a clean table — Spark's
  * RowLevelOperationInfo carries no predicate, so a Delta-style
  * touched-rows cost estimate is structurally unavailable at this
  * decision point — and the delta path whenever the table already has
  * pending deletion vectors (where copy-on-write would refuse).
  * The matching scan serving `_pos` is COLUMNAR: the vectorized
  * reader's row-index mechanism fills file-absolute positions per
  * batch, and pending vectors apply as a zero-copy live-row mapping
  * ([[GraftSelectedVector]]) — so both the mutation's matching pass
  * and the table's steady-state reads keep `BatchScan…ColumnarToRow`
  * between compactions (the Delta/Iceberg DV read architecture). */
final class GraftDeltaOperation(spark: SparkSession, root: String,
    pinned: Long, cmd: RowLevelOperation.Command,
    tableSchema: StructType) extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column("_file"), Expressions.column("_pos"))

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty // rowId alone carries the provenance this write needs

  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : ScanBuilder =
    new GraftDeltaScanBuilder(spark, root, pinned, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new GraftDeltaBatchWrite(spark, root, pinned, info.schema,
            cmd.toString.toLowerCase(java.util.Locale.ROOT))
        override def toString: String = s"GraftDeltaWrite($root)"
      }
    }

  override def description(): String =
    s"GraftDeltaOperation($cmd, $root, v$pinned)"
}

/** One task's delta: inserted file entries plus deleted positions —
  * inline per file when narrow, spilled to a position sidecar the
  * task wrote when wide. Each sidecar reports the exact data files it
  * covers WITH per-file row counts (the writer knows its own deleted
  * map), so the publish attaches each sidecar reference ONLY to those
  * files — DV application and change-feed replay then scan O(relevant
  * sidecars) per file — and records the exact deleted cardinality in
  * the manifest, keeping LIMIT caps and metadata COUNT(*) armed on
  * the DV-pending snapshot without reading any sidecar back. */
private[sources] final case class GraftDeltaMessage(
    entries: Seq[Versioned.FileEntry],
    deletes: Seq[(String, Seq[Long])],
    sidecars: Seq[(String, Seq[(String, Long)])]) extends WriterCommitMessage

/** The delta batch write: tasks stage insert files through the shared
  * executor-write core and collect deleted positions; the driver
  * publishes ONE manifest — merged deletion vectors + appended entries
  * — via the pinned-version CAS. */
private[graft] final class GraftDeltaBatchWrite(spark: SparkSession,
    root: String, pinned: Long, schema: StructType, command: String)
    extends DeltaBatchWrite {

  private val planned = Versioned.plannedMeta(root)
  private val spec = GraftWriteCore.jobSpec(spark, root, schema,
    statsCols = Nil, planned, partitioned = true)
  // position sidecars land beside the deletion-vector verbs' own
  // (root/dv/<uuid>/) and share their manifest-reference lifecycle
  private val dvRel = s"dv/${java.util.UUID.randomUUID().toString}"
  private val dvConf = org.apache.spark.sql.GraftParquetIO
    .taskWriteConf(spark, GraftParquetReaderFactory.DvSchema)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory =
    new GraftDeltaWriterFactory(spec, dvConf, dvRel)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.toSeq.collect { case m: GraftDeltaMessage => m }
    val deletes = msgs.flatMap(_.deletes)
      .groupBy(_._1).view.mapValues(_.flatMap(_._2).sorted)
      .toSeq.map { case (f, ps) => (f, ps: Seq[Long]) }.sortBy(_._1)
    Versioned.publishStagedDelta(root, deletes,
      msgs.flatMap(_.sidecars).sortBy(_._1), msgs.flatMap(_.entries),
      schema, pinned, planned, command)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.toSeq.filter(_ != null).foreach {
      case GraftDeltaMessage(entries, _, sidecars) =>
        entries.foreach(e => { new File(root, e.path).delete(); () })
        sidecars.foreach { case (s, _) => new File(root, s).delete(); () }
      case _ => ()
    }

  override def toString: String = s"GraftDeltaBatchWrite($root)"
}

private[sources] final class GraftDeltaWriterFactory(
    spec: GraftWriteCore.JobSpec, dvConf: SerializableConfiguration,
    dvRel: String) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(spec, dvConf, dvRel, s"$partitionId-$taskId")
}

/** Executor-side delta writer. Inserts ride the shared
  * [[GraftTaskWriter]] (CHECK constraints per row, one staged file per
  * partition tuple, footer-stats entries); deletes accumulate as
  * (file → positions) and spill to a position sidecar parquet past
  * `inlineThreshold` — a GDPR-wide UPDATE never ships its positions
  * through the driver. `update` = delete + insert (the deletion-vector
  * representation of an in-place change). */
private[sources] final class GraftDeltaWriter(
    spec: GraftWriteCore.JobSpec,
    dvConf: SerializableConfiguration, dvRel: String, suffix: String,
    inlineThreshold: Int = 4096) extends DeltaWriter[InternalRow] {

  private val inserts = new GraftTaskWriter(spec, suffix)
  private val deleted = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[Long]]
  private var nDeleted = 0L

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    val file = id.getUTF8String(0).toString
    val pos = id.getLong(1)
    deleted.getOrElseUpdate(file, mutable.ArrayBuffer.empty) += pos
    nDeleted += 1
  }

  override def update(metadata: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    delete(metadata, id)
    insert(row)
  }

  override def insert(row: InternalRow): Unit = inserts.write(row)

  override def commit(): WriterCommitMessage = {
    val insertMsg = inserts.commit() match {
      case GraftWriteMessage(entries) => entries
    }
    if (nDeleted <= inlineThreshold)
      GraftDeltaMessage(insertMsg,
        deleted.toSeq.map { case (f, ps) => (f, ps.toSeq.sorted) }, Nil)
    else {
      // wide delete: write this task's positions as ONE sorted sidecar;
      // the touched-file records go out with EMPTY inline lists so the
      // publish attaches the sidecar reference to each
      val dir = new File(spec.root, dvRel); dir.mkdirs()
      val f = new File(dir, s"pos-$suffix.parquet")
      val w = org.apache.spark.sql.GraftParquetIO.openRowWriter(
        dvConf.value, f.getPath, spec.codec)
      try {
        deleted.toSeq.sortBy(_._1).foreach { case (file, ps) =>
          val u = org.apache.spark.unsafe.types.UTF8String.fromString(file)
          ps.toSeq.sorted.foreach { p =>
            w.write(new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(Array[Any](u, p)))
          }
        }
      } finally w.close()
      GraftDeltaMessage(insertMsg,
        deleted.keys.toSeq.sorted.map(f => (f, Seq.empty[Long])),
        Seq((s"$dvRel/${f.getName}", deleted.toSeq.sortBy(_._1)
          .map { case (file, ps) => (file, ps.size.toLong) })))
    }
  }

  override def abort(): Unit = inserts.abort()

  override def close(): Unit = inserts.close()
}
