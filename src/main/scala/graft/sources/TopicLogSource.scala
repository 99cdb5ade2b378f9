package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the [[TopicLog]] layout — the complete
  * custom-source machinery a Kafka integration exercises, minus only
  * the broker RPC (absent jars): `TableProvider` → `Table` →
  * `ScanBuilder` → batch `Scan` AND `MicroBatchStream` with
  * per-partition offset ranges, JSON-serialized checkpoint offsets,
  * admission control (`maxOffsetsPerTrigger`-style rate limiting), and
  * `Trigger.AvailableNow` support.
  *
  * Usage:
  * {{{
  *   spark.readStream.format(TopicLogSource.Name)   // streaming
  *     .option("path", dir).load()
  *   spark.read.format(TopicLogSource.Name)         // batch backfill
  *     .option("path", dir).load()
  * }}}
  *
  * Planning reads only segment file NAMES (offset ranges are encoded in
  * them — the Kafka index trick); one `InputPartition` per topic
  * partition per micro-batch preserves per-partition order, exactly as
  * the Kafka source maps topic partitions to Spark partitions. Offsets
  * are `{"<partition>": endExclusive}` JSON in the checkpoint — restart
  * resumes from the committed batch, giving end-to-end exactly-once
  * with any idempotent sink (spec-verified restart).
  */
class TopicLogSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = TopicLogSource.Name

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TopicLogSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TopicLogTable(properties.get("path"))
}

object TopicLogSource {
  val Name = "graft-topic"

  val Schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true)))
}

final class TopicLogTable(dir: String) extends Table with SupportsRead {
  require(dir != null, s"${TopicLogSource.Name} needs .option(\"path\", <topic dir>)")

  override def name(): String = s"${TopicLogSource.Name}:$dir"
  override def schema(): StructType = TopicLogSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxPerTrigger = Option(options.get("maxoffsetspertrigger")).map(_.toLong)
    new ScanBuilder {
      override def build(): Scan = new TopicLogScan(dir, maxPerTrigger)
    }
  }
}

final class TopicLogScan(dir: String, maxPerTrigger: Option[Long]) extends Scan {
  override def readSchema(): StructType = TopicLogSource.Schema
  override def description(): String = s"TopicLogScan($dir)"

  /** Batch backfill: everything currently in the log. */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      TopicLog.partitions(dir).map { p =>
        TopicLogInputPartition(dir, p, 0L, TopicLog.endOffset(dir, p))
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new TopicLogReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new TopicLogMicroBatchStream(dir, maxPerTrigger)
}

/** Checkpoint offset: per-partition end (exclusive), JSON `{"0":12,…}`. */
final case class TopicLogOffset(ends: Map[Int, Long]) extends Offset {
  override def json(): String =
    ends.toSeq.sortBy(_._1)
      .map { case (p, e) => s""""$p":$e""" }.mkString("{", ",", "}")
}

object TopicLogOffset {
  def fromJson(json: String): TopicLogOffset = TopicLogOffset(
    """"(\d+)"\s*:\s*(\d+)""".r.findAllMatchIn(json)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

final class TopicLogMicroBatchStream(dir: String, maxPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // Fixed at prepareForTriggerAvailableNow: AvailableNow must drain to
  // the log's state at query START and then stop, even if appends race.
  @volatile private var availableNowTarget: Option[TopicLogOffset] = None

  private def scanLatest(): TopicLogOffset = TopicLogOffset(
    TopicLog.partitions(dir).map(p => p -> TopicLog.endOffset(dir, p)).toMap)

  override def initialOffset(): Offset =
    TopicLogOffset(TopicLog.partitions(dir).map(_ -> 0L).toMap)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(scanLatest())

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = availableNowTarget.getOrElse(scanLatest())
    val from = start.asInstanceOf[TopicLogOffset].ends
    limit match {
      case rows: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        // spread the row budget evenly over partitions with backlog —
        // the same admission shape kafka's maxOffsetsPerTrigger uses
        val backlog = target.ends.filter { case (p, e) => e > from.getOrElse(p, 0L) }
        if (backlog.isEmpty) target
        else {
          val perPart = math.max(1L, rows.maxRows() / backlog.size)
          TopicLogOffset(target.ends.map { case (p, e) =>
            p -> math.min(e, from.getOrElse(p, 0L) + perPart)
          })
        }
      case _ => target
    }
  }

  override def reportLatestOffset(): Offset = scanLatest()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TopicLogOffset].ends
    val e = end.asInstanceOf[TopicLogOffset].ends
    e.keys.toSeq.sorted.flatMap { p =>
      val from = s.getOrElse(p, 0L)
      val to = e(p)
      if (to > from) Some(TopicLogInputPartition(dir, p, from, to)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TopicLogReaderFactory

  override def deserializeOffset(json: String): Offset = TopicLogOffset.fromJson(json)

  override def commit(end: Offset): Unit = () // segments are immutable; nothing to ack
  override def stop(): Unit = ()
}

/** One topic partition's [from, to) offset slice. */
final case class TopicLogInputPartition(dir: String, partition: Int,
    from: Long, to: Long) extends InputPartition

final class TopicLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TopicLogInputPartition]
    new TopicLogPartitionReader(p)
  }
}

/** Streams the segment files overlapping [from, to), skipping rows
  * outside the range — a restart mid-segment re-reads only the file,
  * never re-emits rows the committed offset already covered. */
final class TopicLogPartitionReader(p: TopicLogInputPartition)
    extends PartitionReader[InternalRow] {

  private val files = TopicLog.segments(p.dir, p.partition)
    .filter { case (s, e, _) => e > p.from && s < p.to }
    .iterator
  private var reader: java.io.BufferedReader = null
  private var current: InternalRow = null

  override def next(): Boolean = {
    current = null
    while (current == null) {
      if (reader == null) {
        if (!files.hasNext) return false
        reader = new java.io.BufferedReader(new java.io.InputStreamReader(
          new java.io.FileInputStream(files.next()._3), "UTF-8"))
      }
      val line = reader.readLine()
      if (line == null) { reader.close(); reader = null }
      else {
        val f = line.split('\t')
        val off = f(0).toLong
        if (off >= p.from && off < p.to) {
          current = InternalRow(
            p.partition, off,
            Option(TopicLog.unesc(f(1))).map(UTF8String.fromString).orNull,
            Option(TopicLog.unesc(f(2))).map(UTF8String.fromString).orNull,
            f(3).toLong)
        }
      }
    }
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = if (reader != null) { reader.close(); reader = null }
}
