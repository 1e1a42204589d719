package graft.sources

import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Whitespace-delimited seed-table source (SURVEY.md S1) — the
  * reference's `read.table("seed.txt")` (calib_simu_noninf0315.R:14-19):
  * header line `"seed1" "seed2"`, then 10,000 rows of double pairs used
  * to key reproducible Monte-Carlo replicates.
  *
  * Implemented on Spark's CSV reader: single-space delimiter, header on,
  * R-style quoted header names stripped via schema override.
  */
object SeedTable {

  val schema: StructType = StructType(Seq(
    StructField("seed1", DoubleType), StructField("seed2", DoubleType)))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("delimiter", " ")
      .option("quote", "\"")
      .schema(schema)
      .csv(path)

  /** Write in the same R-compatible format. */
  def write(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true")
      .option("delimiter", " ")
      .csv(path)
}
