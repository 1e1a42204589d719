package graft.weights

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Raking / iterative proportional fitting — the multiplicative
  * sibling of the reference's calibration family (GREG adjusts
  * additively via the normal equations, post-stratification adjusts one
  * margin exactly; raking alternates post-stratification across SEVERAL
  * margins until all match — the classic survey weighting loop).
  *
  * Each sweep, for each margin dimension: N̂_h = Σ_{i∈h} w_i per cell,
  * factor f_h = N_h / N̂_h, w ← w·f_h. Every step is one dimension-sized
  * groupBy + a broadcast join against cell targets — nothing wider than
  * the margin tables ever shuffles, so the loop is margin-count ×
  * sweep-count small aggregates over the (cached) sample: the same
  * O(iterations) job shape as the IRLS/NR fits and just as 100-TB-safe.
  *
  * Pinned `sweeps` makes the fixed point replayable by a DuckDB oracle
  * (`m18_raking`); IPF is a contraction on the log-weights, so engine
  * ulp differences decay across sweeps rather than amplifying.
  */
object Raking {

  /** @param df      sample rows
    * @param weight  design-weight column
    * @param margins (cell column, targets frame) per dimension; each
    *                targets frame is (cell, target) dimension-sized
    * @param sweeps  full passes over all margins
    * @return df + `rake_wt` (adjusted weight)
    */
  def rake(df: DataFrame, weight: Column,
      margins: Seq[(Column, DataFrame)], sweeps: Int): DataFrame = {
    val dims = margins.zipWithIndex
    var cur = df.withColumn("rake_wt", weight.cast("double"))
    dims.foreach { case ((cell, _), i) => cur = cur.withColumn(s"__rk$i", cell) }
    // each step derives `cur` twice (margin aggregate + the join back),
    // so the unpinned plan doubles per step; pin each sweep — persist +
    // leaf view — and release the previous one (the CC loop discipline).
    // The FINAL sweep's cache is left in place: releasing it would make
    // the caller's first action replay every sweep.
    var pinned: DataFrame = null
    for (k <- 1 to sweeps) {
      for (((_, targets), i) <- dims) {
        val hat = cur.groupBy(col(s"__rk$i"))
          .agg(sum(col("rake_wt")).as("__hat"))
        // LEFT join + factor 1.0 for cells absent (or null) in the
        // targets frame: an inner join here would silently delete every
        // sample row of an uncovered margin cell, changing the weighted
        // population with no signal
        val f = hat.join(targets.select(
            col(targets.columns.head).as(s"__rk$i"),
            col(targets.columns(1)).cast("double").as("__target")),
            Seq(s"__rk$i"), "left")
          .select(col(s"__rk$i"),
            coalesce(col("__target") / col("__hat"), lit(1.0)).as("__f"))
        cur = cur.join(broadcast(f), Seq(s"__rk$i"), "left")
          .withColumn("rake_wt",
            col("rake_wt") * coalesce(col("__f"), lit(1.0)))
          .drop("__f")
      }
      // pin every second sweep (and the last): the plan quadruples per
      // unpinned sweep, so a 2-sweep gap stays tiny while halving the
      // materialization passes; the eager count is what makes releasing
      // the previous pin safe (the new cache no longer needs it)
      if (k % 2 == 0 || k == sweeps) {
        val cache = cur.persist()
        cache.count()
        if (pinned != null) pinned.unpersist(blocking = false)
        pinned = cache
        cur = org.apache.spark.sql.GraftSqlBridge.flattenPlan(cache)
      }
    }
    dims.foldLeft(cur) { case (d, (_, i)) => d.drop(s"__rk$i") }
  }
}
