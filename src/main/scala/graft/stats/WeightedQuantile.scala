package graft.stats

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Exact design-weighted quantiles — the survey-estimation twin of the
  * unweighted exact percentile (reference wt.quantile usage class):
  * Q_p = min { x : Σ_{x_i ≤ x} w_i ≥ p · Σ w_i }, the left-continuous
  * weighted quantile function.
  *
  * Determinism discipline: weights enter as BIGINTs and the quantile
  * levels as exact rationals (num/den), so every comparison is integer
  * arithmetic — no floating cumsum, no tie-order sensitivity (ties in
  * x are pre-aggregated, making the running weight per distinct x
  * well-defined regardless of partition order).
  *
  * 100 TB shape: one hash aggregate to (group, x) granularity, one
  * window over distinct values per group (far smaller than the input),
  * one final aggregate. No collect, no sort of the raw fact table.
  */
object WeightedQuantile {

  /** Per-group exact weighted quantiles at levels `ps` (given as exact
    * rationals `(num, den)`, e.g. (1,4), (1,2), (3,4)). Returns one row
    * per group: (grp, w_total, q_num_den...) with one column per level
    * named q_<num>_<den>. */
  def weightedQuantiles(df: DataFrame, group: Column, x: Column,
      weight: Column, ps: Seq[(Int, Int)]): DataFrame = {
    val byX = df.select(group.as("grp"), x.as("x"),
        weight.cast("long").as("w"))
      .groupBy(col("grp"), col("x")).agg(sum(col("w")).as("wv"))
    val cum = byX.withColumn("cw",
      sum(col("wv")).over(Window.partitionBy(col("grp")).orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = byX.groupBy(col("grp")).agg(sum(col("wv")).as("tot"))
    val qCols = ps.map { case (num, den) =>
      min(when(col("cw") * den >= col("tot") * num, col("x")))
        .as(s"q_${num}_$den")
    }
    cum.join(tot, Seq("grp"))
      .groupBy(col("grp"))
      .agg(max(col("tot")).as("w_total"), qCols: _*)
  }
}
