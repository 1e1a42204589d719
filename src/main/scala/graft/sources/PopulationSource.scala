package graft.sources

import graft.core.Rng
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 synthetic-population source — the S3 generator
  * (sampling/Population) exposed as a first-class Spark table:
  *
  *   spark.read.format("graft.sources.PopulationSource")
  *     .option("n", 300000).option("partitions", 32).option("seed", 1)
  *     .load()
  *
  * Each InputPartition owns a contiguous id range, so generation is
  * embarrassingly parallel with NO shuffle and NO driver data — the
  * planner sees a real Batch with `partitions` splits and schedules
  * them like any scan. Rows derive from the engine's deterministic
  * cross-engine RNG keyed on the row id (`Rng.uniformJvm`, the plain-
  * JVM twin of the Catalyst/DuckDB stream), so the SAME population is
  * produced at any parallelism, on any cluster size, on every read —
  * asserted against the expression-based generator in SourcesSpec
  * (uniforms bitwise; Box–Muller normals to 1 ulp, the Math.cos/log
  * intrinsic-vs-interpreted bound).
  *
  * Columns: id, u ~ U(0,1), z ~ N(0,1) (Box–Muller over two salted
  * uniforms — the same construction Population.generate uses).
  */
class PopulationSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PopulationSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new PopulationTable
}

object PopulationSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("u", DoubleType, nullable = false),
    StructField("z", DoubleType, nullable = false)))

  /** One generated row, shared by every reader — the single source of
    * truth for the value stream. */
  def row(id: Long, seed: Long): (Double, Double) = {
    val u = Rng.uniformJvm(id, seed)
    val u2 = Rng.uniformJvm(id, seed + 1000003L)
    val z = math.sqrt(-2.0 * math.log(u)) * math.cos(2.0 * math.Pi * u2)
    (u, z)
  }
}

private class PopulationTable extends Table with SupportsRead {
  override def name(): String = "graft_population"
  override def schema(): StructType = PopulationSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PopulationScan(
      options.getLong("n", 1000L),
      options.getLong("partitions", 4L).toInt,
      options.getLong("seed", 1L))
}

private class PopulationScan(n: Long, partitions: Int, seed: Long)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = PopulationSource.schema
  override def toBatch: Batch = this

  // contiguous id ranges [1, n]: split k gets ids (k·n/p, (k+1)·n/p]
  override def planInputPartitions(): Array[InputPartition] =
    Array.tabulate(partitions) { k =>
      PopulationPartition(
        1L + k * n / partitions, 1L + (k + 1) * n / partitions, seed)
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new PopulationReaderFactory
}

private case class PopulationPartition(start: Long, end: Long, seed: Long)
    extends InputPartition

private class PopulationReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val pp = p.asInstanceOf[PopulationPartition]
      private var cur = pp.start - 1
      override def next(): Boolean = { cur += 1; cur < pp.end }
      override def get(): InternalRow = {
        val (u, z) = PopulationSource.row(cur, pp.seed)
        InternalRow(cur, u, z)
      }
      override def close(): Unit = ()
    }
}
