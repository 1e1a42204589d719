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
    * The quartiles ride the radix rank search (three bounded scans) —
    * EXACT at any scale, unlike the builtin `percentile` aggregate
    * whose single value-count map over a continuous column is
    * data-sized state through one reducer.
    */
  def bwNrd0(df: DataFrame, x: Column): Double = {
    val r = df.agg(
      stddev_samp(x).cast("double").as("sd"),
      count(x).cast("double").as("n")).head()
    val sd = r.getDouble(0); val n = r.getDouble(1)
    val qs = graft.stats.WeightedQuantile.interpolatedQuantilesGlobal(
      df, x.cast("double"), lit(1L), Seq(0.25, 0.75))
    val iqr = qs(1) - qs(0)
    val spread = math.min(sd, iqr / 1.34)
    val s = if (spread > 0) spread else if (sd > 0) sd else 1.0
    0.9 * s * math.pow(n, -0.2)
  }
}
