package graft.weights

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Survey-weight diagnostics: the health checks an analyst runs on any
  * pseudo-weight vector before trusting estimates built from it.
  *
  * The reference constructs IPSW/KW/calibrated weights
  * (`simu_fun.R:48,168-211`, `jk_fun.R:51-63`) but never summarizes
  * them; every applied survey pipeline does, via Kish's design effect
  * deff = n * sum(w^2) / (sum w)^2, the effective sample size
  * ess = (sum w)^2 / sum(w^2) = n / deff, the coefficient of variation
  * of weights, the max/min weight ratio, and the Gini coefficient of
  * the weight distribution (weight concentration).
  *
  * Scale shape: one hash aggregate per group for every moment metric;
  * Gini needs within-group ranks, via the identity
  * G = 2 * sum(i * w_(i)) / (n * sum w) - (n + 1) / n with w sorted
  * ascending. Group cardinality is typically TINY (market segments),
  * so a `Window.partitionBy(group)` rank would funnel a
  * groups-th of the data through each task — the ranks ride the
  * two-phase grouped scan instead (range-partitioned local ranks +
  * boundary-table offsets, [[graft.core.Windows.groupedScan]]). Ranks
  * within tied weights are interchangeable (equal values multiply the
  * same w), so the result is order-deterministic on both paths.
  */
object Diagnostics {

  /** One row per group: (n, deff, ess, cv_w, gini, w_ratio). */
  def weightDiagnostics(df: DataFrame, w: Column, group: Column,
      groupName: String): DataFrame = {
    val base = df.select(group.as(groupName), w.cast("double").as("w"))
    val rk = graft.core.Windows.groupedScan(base,
      Seq(col(groupName)), Seq(col("w")),
      Seq((lit(1.0), "i")))
    rk.groupBy(col(groupName))
      .agg(
        count(lit(1)).as("n"),
        sum(col("w")).as("sw"),
        sum(col("w") * col("w")).as("sw2"),
        sum(col("i") * col("w")).as("siw"),
        min(col("w")).as("wmin"),
        max(col("w")).as("wmax"))
      .withColumn("nd", col("n").cast("double"))
      // sample variance from explicit moments so an oracle can replay
      // the identical algebra (library stddev accumulators differ in
      // low-order bits across engines)
      .withColumn("sd", sqrt(
        (col("sw2") - col("sw") * col("sw") / col("nd")) / (col("nd") - 1)))
      .select(
        col(groupName),
        col("n"),
        (col("nd") * col("sw2") / (col("sw") * col("sw"))).as("deff"),
        (col("sw") * col("sw") / col("sw2")).as("ess"),
        (col("sd") / (col("sw") / col("nd"))).as("cv_w"),
        (lit(2.0) * col("siw") / (col("nd") * col("sw"))
          - (col("nd") + 1) / col("nd")).as("gini"),
        (col("wmax") / col("wmin")).as("w_ratio"))
  }
}
