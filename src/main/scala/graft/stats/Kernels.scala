package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kernel functions as pluggable `Column => Column` builders
  * (SURVEY.md §2.9) — codegen-friendly expressions, never UDFs.
  * Mirrors the reference's `krnfun`/`get(krn)` dispatch
  * (simu_fun.R:129-131) and the triangular variant
  * (taylor_deviate.R:72).
  */
object Kernels {

  /** Gaussian density kernel K(u) = exp(-u²/2)/√(2π). */
  def gaussian(u: Column): Column =
    exp(-u * u / lit(2.0)) / lit(math.sqrt(2.0 * math.Pi))

  /** Triangular kernel K(u) = max(0, 1-|u|) — compact support. */
  def triangular(u: Column): Column =
    greatest(lit(0.0), lit(1.0) - abs(u))

  /** Epanechnikov K(u) = 0.75(1-u²)·1{|u|≤1}. */
  def epanechnikov(u: Column): Column =
    when(abs(u) <= 1.0, lit(0.75) * (lit(1.0) - u * u)).otherwise(0.0)

  def byName(name: String): Column => Column = name match {
    case "dnorm" | "gaussian" => gaussian
    case "triang" | "triangular" => triangular
    case "epanechnikov" => epanechnikov
    case other => throw new IllegalArgumentException(s"unknown kernel: $other")
  }

  /** Silverman's rule-of-thumb bandwidth, R's `bw.nrd0`
    * (simu_fun.R:54,129-130): 0.9·min(sd, IQR/1.34)·n^(-1/5).
    * Exact percentiles (single reduce) — fine at driver-solve scale; at
    * 100 TB swap `percentile` for `approx_percentile` with documented
    * tolerance (SURVEY.md §7.4.4).
    */
  def bwNrd0(df: DataFrame, x: Column): Double = {
    val r = df.agg(
      stddev_samp(x).cast("double").as("sd"),
      expr(s"percentile(${colName(x, df)}, 0.75) - percentile(${colName(x, df)}, 0.25)")
        .cast("double").as("iqr"),
      count(x).cast("double").as("n")).head()
    val sd = r.getDouble(0); val iqr = r.getDouble(1); val n = r.getDouble(2)
    val spread = math.min(sd, iqr / 1.34)
    val s = if (spread > 0) spread else if (sd > 0) sd else 1.0
    0.9 * s * math.pow(n, -0.2)
  }

  private def colName(c: Column, df: DataFrame): String = {
    val n = c.toString
    require(df.columns.contains(n), s"bwNrd0 needs a plain column, got $n")
    n
  }
}
