package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated test tables (TESTDATA.md) and
  * shared session conventions.
  *
  * All engine queries take an `sfDir` (e.g. /root/testdata/sf0.01) and
  * read one parquet per table. Column pruning / predicate pushdown into
  * the parquet scan is left entirely to Catalyst — callers `select`/
  * `filter` declaratively and the scan narrows automatically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.ts has shipped both as TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    * parquet across testdata generations, so branch on the *scanned* type
    * rather than assuming one physical layout:
    *  - nanos: Spark rejects it by default → read as long
    *    (nanosAsLong) and truncate to microseconds, exactly what DuckDB's
    *    microsecond TIMESTAMP does on the same file. ns → µs must be
    *    INTEGRAL division: `/` promotes the ~1.7e18 nanos to double,
    *    which cannot represent it exactly (53-bit mantissa) and lands
    *    ±1 µs off DuckDB's exact epoch_us truncation.
    *  - micros: already a Timestamp/TimestampNTZ column — pass through. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // physical nanos, surfaced as long by nanosAsLong
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // normalize to TimestampType so every downstream query sees one
        // ts type regardless of testdata generation; session TZ is pinned
        // UTC, so the NTZ→instant cast is value-preserving
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
