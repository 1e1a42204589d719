package graft.stats

import graft.core.Windows
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distribution-free two-sample tests over distributed data.
  *
  * Companions to the reference's estimator battery (`jk_fun.R:79-170`
  * compares methods; these compare *samples*): the log-rank test for
  * survival curves and the two-sample Kolmogorov-Smirnov statistic for
  * plain distributions. Both collapse to a distinct-value step table
  * first (cardinality-bounded), then run suffix/prefix scans on the
  * collapsed table — the same O3/O4 shape as the hazard chain, never a
  * global window over raw rows.
  */
object RankTests {

  /** Classic (unweighted) two-group log-rank test with the
    * hypergeometric variance. `grp` must evaluate to 1 for the first
    * group and 0 for the second. Returns one row:
    * (o1, e1) observed/expected group-1 events, v the variance, chisq
    * the test statistic (O-E)^2/V.
    */
  def logRank(df: DataFrame, t: Column, d: Column, grp: Column): DataFrame = {
    val perTime = df
      .select(t.cast("double").as("t"), d.cast("double").as("d"),
        grp.cast("int").as("g"))
      .groupBy(col("t"))
      .agg(
        sum(when(col("g") === 1, col("d")).otherwise(0.0)).as("d1"),
        sum(col("d")).as("dt"),
        sum(when(col("g") === 1, 1.0).otherwise(0.0)).as("c1"),
        count(lit(1)).cast("double").as("ct"))
    val risk = Windows.suffixSum(perTime, col("t"),
      Seq((col("c1"), "n1"), (col("ct"), "nt")))
    risk.filter(col("dt") > 0)
      .agg(
        sum(col("d1")).as("o1"),
        sum(col("dt") * col("n1") / col("nt")).as("e1"),
        sum(when(col("nt") > 1,
          col("dt") * (col("n1") / col("nt")) * (lit(1.0) - col("n1") / col("nt"))
            * (col("nt") - col("dt")) / (col("nt") - 1)).otherwise(0.0)).as("v"))
      .select(col("o1"), col("e1"), col("v"),
        (pow(col("o1") - col("e1"), 2) / col("v")).as("chisq"))
  }

  /** Mann-Whitney U rank-sum test with midrank ties and the
    * tie-corrected normal approximation. Midranks are exact halves of
    * integers (cum-before + (count+1)/2), so the rank sum is exact in
    * doubles and engine-deterministic; only the final variance/z are
    * genuine floats. Collapses to the distinct-value table first —
    * the scan is value-cardinality-bounded.
    */
  def mannWhitney(df: DataFrame, value: Column, isA: Column): DataFrame = {
    val base = df.select(value.cast("double").as("v"),
      when(isA, 1.0).otherwise(0.0).as("ga"))
    val perV = base.groupBy(col("v"))
      .agg(sum(col("ga")).as("ca"), sum(lit(1.0) - col("ga")).as("cb"))
      .withColumn("c", col("ca") + col("cb"))
    val cum = Windows.scan(perV, Seq(col("v")), Seq((col("c"), "cumc")))
      .withColumn("midrank",
        col("cumc") - col("c") + (col("c") + 1) / 2)
    cum.agg(
        sum(col("ca") * col("midrank")).as("r1"),
        sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
        sum(col("c") * col("c") * col("c") - col("c")).as("ties"))
      .withColumn("n", col("na") + col("nb"))
      .withColumn("u", col("r1") - col("na") * (col("na") + 1) / 2)
      .withColumn("varu",
        col("na") * col("nb") / 12 * ((col("n") + 1)
          - col("ties") / (col("n") * (col("n") - 1))))
      .select(col("u"),
        ((col("u") - col("na") * col("nb") / 2) / sqrt(col("varu"))).as("z"),
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"))
  }

  /** Pearson chi-square test of independence on the r×c contingency
    * table of two categorical columns: statistic, degrees of freedom,
    * and n. One hash aggregate to the cell table (dimension-sized);
    * margins join back via broadcast.
    */
  def chiSquare(df: DataFrame, rowVar: Column, colVar: Column): DataFrame = {
    val cells = df.select(rowVar.cast("string").as("r"),
        colVar.cast("string").as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).cast("double").as("o"))
    val rowTot = cells.groupBy(col("r")).agg(sum(col("o")).as("rt"))
    val colTot = cells.groupBy(col("c")).agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("r")).cast("double").as("nr"),
      countDistinct(col("c")).cast("double").as("nc"))
    // Σ(o−e)²/e over ALL r×c cells = Σ o²/e − n, and empty cells add 0
    // to Σ o²/e — so the observed-cell table alone yields the full
    // statistic without densifying the cross product
    cells.join(broadcast(rowTot), "r").join(broadcast(colTot), "c")
      .crossJoin(broadcast(tot))
      .withColumn("e", col("rt") * col("ct") / col("n"))
      .agg(
        (sum(col("o") * col("o") / col("e")) - max(col("n"))).as("chi2"),
        max((col("nr") - 1) * (col("nc") - 1)).cast("long").as("dof"),
        max(col("n")).cast("long").as("n"))
  }

  /** Two-sample Kolmogorov-Smirnov statistic
    * D = max over v of |F_A(v) - F_B(v)| with ECDFs evaluated at every
    * distinct value; also returns the smallest location attaining the
    * max. Every ECDF difference is the same IEEE expression on the same
    * exact integer counts on any engine, so the argmax (ties broken by
    * smallest v) is deterministic across engines.
    */
  def ksTwoSample(df: DataFrame, value: Column, isA: Column): DataFrame = {
    val base = df.select(value.cast("double").as("v"),
      when(isA, 1.0).otherwise(0.0).as("ga"))
    val perV = base.groupBy(col("v"))
      .agg(sum(col("ga")).as("ca"), sum(lit(1.0) - col("ga")).as("cb"))
    val cum = Windows.scan(perV, Seq(col("v")),
      Seq((col("ca"), "cuma"), (col("cb"), "cumb")))
    val tot = base.agg(sum(col("ga")).as("na"),
      sum(lit(1.0) - col("ga")).as("nb"))
    cum.crossJoin(broadcast(tot))
      .withColumn("dv", abs(col("cuma") / col("na") - col("cumb") / col("nb")))
      .orderBy(col("dv").desc, col("v"))
      .limit(1)
      .select(col("dv").as("ks_d"), col("v").as("ks_at"),
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"))
  }
}
