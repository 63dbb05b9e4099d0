package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.FlowSchema

/** Custom DataSourceV2 micro-batch source — the R1 UDP-listener parity
  * point (SURVEY §2.1, `state.FlowRoutine` at `main.go:250`). Spark has no
  * UDP source; this is the (c)-path custom source that plays its role:
  * a deterministic generator of raw decoded flows (the goflow `FlowMessage`
  * projection shape: byte-array addresses, `FlowSchema.rawSchema`) with the
  * reference's ingest knobs mapped onto Spark's source contract:
  *
  *   - `maxRowsPerBatch` → `SupportsAdmissionControl.getDefaultReadLimit`:
  *     the reference's count cap (`-batchsize`, `main.go:36`). Combined
  *     with a `ProcessingTime` trigger this gives the count-or-time
  *     micro-batch policy of `main.go:114-152` (R4);
  *   - `numPartitions` → parallel generation, the `-workers` decode pool
  *     (`main.go:35`);
  *   - `totalRows` → bounded stream for drain tests
  *     (`SupportsTriggerAvailableNow`).
  *
  * Usage: `spark.readStream.format("graft.sources.FlowGenSource")
  * .option("totalRows", 10000).option("maxRowsPerBatch", 1000).load()`.
  * Content is a pure function of the row index — re-running a batch after
  * failure regenerates identical rows, so the source is exactly-replayable
  * (stronger than the reference's at-most-once UDP).
  */
class FlowGenSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "flowgen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FlowSchema.rawSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new FlowGenTable
}

object FlowGenSource {
  /** splitmix64 — deterministic per-row entropy. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Raw flow row i in `FlowSchema.rawSchema` field order. */
  def row(i: Long): InternalRow = {
    val h = mix(i)
    def b(shift: Int): Byte = ((h >>> shift) & 0xff).toByte
    val vals: Array[Any] = Array(
      (i % 4 + 1).toInt,                       // type
      1700000000L + i / 100,                   // time_received
      i,                                       // sequence_num
      1000L,                                   // sampling_rate
      (i % 2).toInt,                           // flow_direction
      Array[Byte](10, 0, 0, (i % 4).toByte),   // sampler_address
      1700000000L + i / 100 - 10,              // time_flow_start
      1700000000L + i / 100,                   // time_flow_end
      100L + (h & 0xffff),                     // bytes
      1L + (i % 64),                           // packets
      Array[Byte](10, b(0), b(8), b(16)),      // src_addr
      Array[Byte](-64, -88, b(24), b(32)),     // dst_addr (192.168.x.y)
      2048,                                    // etype
      (if (i % 10 < 6) 6 else if (i % 10 < 9) 17 else 1), // proto
      (1024 + (h >>> 40) % 60000).toInt,       // src_port
      (if (i % 3 == 0) 443 else if (i % 3 == 1) 80 else 53), // dst_port
      0,                                       // forwarding_status
      (h & 0x3f).toInt,                        // tcp_flags
      0, 0,                                    // icmp_type, icmp_code
      h & 0xffffffffL,                         // fragment_id
      0)                                       // fragment_offset
    new GenericInternalRow(vals)
  }
}

final class FlowGenTable extends Table with SupportsRead {
  override def name(): String = "flowgen"
  override def schema(): StructType = FlowSchema.rawSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = FlowSchema.rawSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new FlowGenStream(
            options.getLong("totalRows", 10000L),
            options.getLong("maxRowsPerBatch", 1000L),
            options.getInt("numPartitions", 4))
      }
    }
}

/** Offset = count of rows emitted so far (the natural offset of an
  * append-only generator, like the reference's sequence numbers).
  */
final case class FlowGenOffset(count: Long) extends Offset {
  override def json(): String = count.toString
}

final class FlowGenStream(totalRows: Long, maxRowsPerBatch: Long, numParts: Int)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = FlowGenOffset(0L)
  override def deserializeOffset(json: String): Offset = FlowGenOffset(json.toLong)

  // R4 count cap: a micro-batch admits at most maxRowsPerBatch rows
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxRowsPerBatch)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[FlowGenOffset].count
    val cap = limit match {
      case m: ReadMaxRows => m.maxRows()
      case _ => maxRowsPerBatch
    }
    FlowGenOffset(math.min(totalRows, s + cap))
  }

  override def reportLatestOffset(): Offset = FlowGenOffset(totalRows)
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FlowGenOffset].count
    val e = end.asInstanceOf[FlowGenOffset].count
    val n = math.max(1, math.min(numParts, (e - s).toInt))
    (0 until n).map { p =>
      FlowGenPartition(s + (e - s) * p / n, s + (e - s) * (p + 1) / n)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val fp = partition.asInstanceOf[FlowGenPartition]
      new PartitionReader[InternalRow] {
        private var i = fp.from - 1
        override def next(): Boolean = { i += 1; i < fp.until }
        override def get(): InternalRow = FlowGenSource.row(i)
        override def close(): Unit = ()
      }
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class FlowGenPartition(from: Long, until: Long) extends InputPartition
