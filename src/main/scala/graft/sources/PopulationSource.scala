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

/** Scan with the THREE pushdowns a generated source can honor:
  *
  *  - id-range filters (`id <=/</>=/>/= k`) clamp the generated range
  *    itself, so `WHERE id <= 1000` over a billion-row population
  *    GENERATES 1000 rows instead of filtering a billion — the
  *    source-level analogue of partition pruning;
  *  - column pruning drops the Box–Muller computation entirely when
  *    `z` is not requested (two transcendental calls per row saved —
  *    visible in the scan's readSchema, like a parquet ReadSchema);
  *  - aggregate pushdown for ungrouped COUNT(*)/COUNT(id)/MIN(id)/
  *    MAX(id): over a contiguous generated range these are CLOSED
  *    FORM — count = hi−lo+1, min = lo, max = hi — so `count(*)` over
  *    a billion-row population answers from arithmetic, generating
  *    nothing. Spark only attempts the push when every filter was
  *    consumed (the id clamps), so the answers are post-filter exact.
  *    The same single answer row serves complete pushdown and, were
  *    Spark to fall back to partial mode, is a valid partial (its
  *    final SUM/MIN/MAX over one row is the identity).
  *
  * Non-id filters are left to Spark (`pushedFilters` returns only what
  * the source fully honors, so Spark re-applies the rest — the
  * standard residual-filter contract — and their presence blocks the
  * aggregate push entirely).
  */
private class PopulationScan(n: Long, partitions: Int, seed: Long)
    extends ScanBuilder with Scan with Batch
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate._
  import org.apache.spark.sql.sources._

  private var lo = 1L
  private var hi = n // inclusive range [lo, hi]
  private var pushed: Array[Filter] = Array.empty
  private var cols: StructType = PopulationSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("id", _: Number) => true
      case GreaterThan("id", _: Number) => true
      case GreaterThanOrEqual("id", _: Number) => true
      case LessThan("id", _: Number) => true
      case LessThanOrEqual("id", _: Number) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("id", v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue)
      case GreaterThan("id", v: Number) => lo = math.max(lo, v.longValue + 1)
      case GreaterThanOrEqual("id", v: Number) => lo = math.max(lo, v.longValue)
      case LessThan("id", v: Number) => hi = math.min(hi, v.longValue - 1)
      case LessThanOrEqual("id", v: Number) => hi = math.min(hi, v.longValue)
      case _ => ()
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source column order regardless of projection order
    cols = StructType(PopulationSource.schema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))

  // pushed aggregate specs, in Spark's requested output order
  private var aggs: Option[Seq[String]] = None

  private def translate(aggregation: Aggregation): Option[Seq[String]] = {
    def isId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
        case _ => false
      }
    if (aggregation.groupByExpressions.nonEmpty) None
    else {
      val specs = aggregation.aggregateExpressions.toSeq.map {
        case _: CountStar => Some("count")
        // ids are unique and non-null, so COUNT(id) — even DISTINCT —
        // equals the range count
        case c: Count if isId(c.column) => Some("count")
        case m: Min if isId(m.column) => Some("min")
        case m: Max if isId(m.column) => Some("max")
        case _ => None
      }
      if (specs.nonEmpty && specs.forall(_.isDefined)) Some(specs.map(_.get))
      else None
    }
  }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    translate(aggregation).isDefined

  override def pushAggregation(aggregation: Aggregation): Boolean =
    translate(aggregation) match {
      case Some(s) => aggs = Some(s); true
      case None => false
    }

  override def build(): Scan = this
  override def readSchema(): StructType = aggs match {
    case Some(s) => StructType(s.zipWithIndex.map { case (a, i) =>
      // count over any range is non-null; min/max are null on an
      // empty (over-clamped) range, as SQL requires
      StructField(s"agg_$i", LongType, nullable = a != "count")
    })
    case None => cols
  }
  override def toBatch: Batch = this
  override def description(): String = aggs match {
    case Some(s) => s"graft_population PushedAggregates: [${s.mkString(", ")}]"
    case None => "graft_population"
  }

  // contiguous id ranges over the CLAMPED [lo, hi] — or, with pushed
  // aggregates, ONE closed-form answer row and no generation at all
  override def planInputPartitions(): Array[InputPartition] = aggs match {
    case Some(s) =>
      Array(PopulationAggPartition(math.max(0L, hi - lo + 1), lo, hi, s))
    case None =>
      val count = math.max(0L, hi - lo + 1)
      val p = math.max(1, math.min(partitions.toLong, count)).toInt
      Array.tabulate(p) { k =>
        PopulationPartition(
          lo + k * count / p, lo + (k + 1) * count / p, seed,
          cols.fieldNames.toIndexedSeq)
      }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PopulationReaderFactory
}

private case class PopulationAggPartition(count: Long, lo: Long, hi: Long,
    specs: Seq[String]) extends InputPartition

private case class PopulationPartition(start: Long, end: Long, seed: Long,
    cols: IndexedSeq[String]) extends InputPartition

private class PopulationReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case agg: PopulationAggPartition => new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = { val r = !emitted; emitted = true; r }
        override def get(): InternalRow = InternalRow(agg.specs.map {
          case "count" => agg.count
          case "min" => if (agg.count > 0) agg.lo else null
          case "max" => if (agg.count > 0) agg.hi else null
        }: _*)
        override def close(): Unit = ()
      }
      case _ => rowReader(p)
    }

  private def rowReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val pp = p.asInstanceOf[PopulationPartition]
      private var cur = pp.start - 1
      // explicit Any return type: without it Scala's weak conformance
      // unifies the Long|Double branches to Double, silently widening
      // the id and corrupting the row layout
      private def value(name: String): Any = name match {
        case "id" => cur
        case "u" => Rng.uniformJvm(cur, pp.seed)
        case "z" => PopulationSource.row(cur, pp.seed)._2
      }
      override def next(): Boolean = { cur += 1; cur < pp.end }
      override def get(): InternalRow =
        InternalRow(pp.cols.map(value): _*)
      override def close(): Unit = ()
    }
}
