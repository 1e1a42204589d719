package graft.sources

import graft.core.Rng
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic EVENT source with BOTH a batch and a
  * micro-batch streaming path over one deterministic generator:
  *
  *   spark.read.format("graft.sources.EventStreamSource")
  *     .option("maxRows", 10000).load()                 // batch
  *   spark.readStream.format("graft.sources.EventStreamSource")
  *     .option("rowsPerBatch", 500).option("maxRows", 10000).load()
  *
  * The streaming offset IS the row id: each trigger advances the
  * available offset by `rowsPerBatch` until `maxRows`, every range
  * [start, end) splits into contiguous per-partition sub-ranges, and
  * the row at id i is a pure function of (i, seed) via the engine's
  * cross-engine RNG (`Rng.uniformJvm`). Restart from a checkpoint
  * therefore replays EXACTLY the unfinished ranges and nothing else —
  * the source-side half of exactly-once — and the batch read of the
  * same options equals the union of all micro-batches, row for row
  * (asserted in StreamingSourceSpec; the batch path is additionally
  * DuckDB-oracled by `s16_event_source`, which replays the generator
  * arithmetic in SQL).
  */
class EventStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventStreamSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new EventStreamTable
}

object EventStreamSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val BaseUs = 1704067200000000L // 2024-01-01 00:00:00 UTC in µs
  val StepUs = 977000L
  private val Types = Array("view", "click", "purchase", "share", "like")

  /** The single source of truth for row `id` under `seed` — pure,
    * replayed identically by the batch path, every stream partition,
    * and the DuckDB oracle. */
  def row(id: Long, seed: Long, users: Long): (Long, Long, String, Double) = {
    val u1 = Rng.uniformJvm(id, seed + 11L)
    val u2 = Rng.uniformJvm(id, seed + 23L)
    val u3 = Rng.uniformJvm(id, seed + 37L)
    // user_id draws its OWN uniform: reusing u1 here would make the
    // user a deterministic function of the ts jitter, collapsing the
    // synthetic stream's dimensionality for downstream joins/groupBys
    val u4 = Rng.uniformJvm(id, seed + 53L)
    val tsUs = BaseUs + id * StepUs + math.floor(u1 * StepUs).toLong
    val user = math.floor(u4 * users).toLong
    val tpe = Types(math.floor(u2 * Types.length).toInt)
    val value = math.floor(u3 * 50000.0 + 0.5) / 100.0
    (tsUs, user, tpe, value)
  }
}

private class EventStreamTable extends Table with SupportsRead {
  override def name(): String = "graft_event_stream"
  override def schema(): StructType = EventStreamSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EventScan(
      options.getLong("maxRows", 10000L),
      options.getLong("rowsPerBatch", 1000L),
      options.getLong("partitions", 4L).toInt,
      options.getLong("seed", 1L),
      options.getLong("users", 100L))
}

private case class EventOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

private class EventScan(maxRows: Long, rowsPerBatch: Long, partitions: Int,
    seed: Long, users: Long) extends ScanBuilder with Scan with Batch {

  override def build(): Scan = this
  override def readSchema(): StructType = EventStreamSource.schema
  override def toBatch: Batch = this

  private def ranges(start: Long, end: Long): Array[InputPartition] = {
    val count = math.max(0L, end - start)
    val p = math.max(1, math.min(partitions.toLong, math.max(count, 1L))).toInt
    Array.tabulate(p) { k =>
      EventRange(start + k * count / p, start + (k + 1) * count / p,
        seed, users)
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    ranges(0L, maxRows)
  override def createReaderFactory(): PartitionReaderFactory =
    new EventReaderFactory

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream {
      // the admission clock. Two invariants keep restarts exactly-once:
      //  - latestOffset() is IDEMPOTENT until the current end has been
      //    planned (Spark may consult it more than once per trigger —
      //    a side-effecting advance would skip or re-cover ranges);
      //  - deserializeOffset() (the restart/WAL-replay path) ratchets
      //    both marks, so a recovered stream never re-admits ranges
      //    below a checkpointed position under fresh batch ids.
      private var available = 0L
      private var planned = 0L
      override def initialOffset(): Offset = EventOffset(0L)
      override def latestOffset(): Offset = {
        if (planned >= available)
          available = math.min(maxRows, available + rowsPerBatch)
        EventOffset(available)
      }
      override def deserializeOffset(json: String): Offset = {
        val v = json.toLong
        available = math.max(available, v)
        planned = math.max(planned, v)
        EventOffset(v)
      }
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
        val e = end.asInstanceOf[EventOffset].v
        planned = math.max(planned, e)
        ranges(start.asInstanceOf[EventOffset].v, e)
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new EventReaderFactory
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
    }
}

private case class EventRange(start: Long, end: Long, seed: Long, users: Long)
    extends InputPartition

private class EventReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val r = p.asInstanceOf[EventRange]
      private var cur = r.start - 1
      override def next(): Boolean = { cur += 1; cur < r.end }
      override def get(): InternalRow = {
        val (tsUs, user, tpe, value) =
          EventStreamSource.row(cur, r.seed, r.users)
        InternalRow(cur, tsUs, user, UTF8String.fromString(tpe), value)
      }
      override def close(): Unit = ()
    }
}
