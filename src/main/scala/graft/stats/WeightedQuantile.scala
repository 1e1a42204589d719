package graft.stats

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
  * 100 TB shape: one hash aggregate to (group, x) granularity, then a
  * grouped two-phase scan over the distinct-value table (full
  * parallelism even with a handful of groups — no one-task-per-group
  * window), one final aggregate. No collect, no sort of the raw fact
  * table. Cumulative weights transit as doubles (exact below 2^53;
  * beyond that the scan would need a decimal accumulator).
  */
object WeightedQuantile {

  /** Per-group exact weighted quantiles at levels `ps` (given as exact
    * rationals `(num, den)`, e.g. (1,4), (1,2), (3,4)). Returns one row
    * per group: (grp, w_total, q_num_den...) with one column per level
    * named q_<num>_<den>. */
  def weightedQuantiles(df: DataFrame, group: Column, x: Column,
      weight: Column, ps: Seq[(Int, Int)],
      sizeHint: graft.core.Windows.SizeHint =
        graft.core.Windows.SizeHint.Auto,
      release: Option[scala.collection.mutable.Buffer[DataFrame]] = None)
      : DataFrame = {
    val byX = df.select(group.as("grp"), x.as("x"),
        weight.cast("long").as("w"))
      .groupBy(col("grp"), col("x")).agg(sum(col("w")).as("wv"))
    // grouped two-phase scan: a plain Window.partitionBy(grp) would
    // funnel each group through one task (3 return flags = 3 tasks for
    // the whole distinct-value table). Sums ride in doubles (exact to
    // 2^53 — far beyond any BIGINT design-weight total here) and come
    // back to BIGINT for the integer threshold comparisons. Callers
    // whose distinct-value table scales with the data pass Large and
    // skip the probe.
    val scratch = scala.collection.mutable.Buffer.empty[DataFrame]
    val cum = graft.core.Windows.groupedScan(byX, Seq(col("grp")),
        Seq(col("x")), Seq(col("wv") -> "cw"),
        sizeHint = sizeHint,
        release = Some(scratch))
      .withColumn("cw", col("cw").cast("long"))
    // the group total IS the group's max cumulative weight, so it comes
    // from the scan output (whose upstream the scan already persisted) —
    // no second evaluation of the distinct-value aggregate
    val tot = cum.groupBy(col("grp")).agg(max(col("cw")).as("tot"))
    val qCols = ps.map { case (num, den) =>
      min(when(col("cw") * den >= col("tot") * num, col("x")))
        .as(s"q_${num}_$den")
    }
    // The scan's internal persist must stay alive until the CALLER's
    // action (it pins the concrete range partitioning the offsets were
    // computed against) — so no eager materialization here: the plan
    // returns lazy, and the scratch is handed to the caller's `release`
    // buffer to unpersist after its action (absent a buffer it is freed
    // by the session's next clearCache; Verify/Bench clear per query).
    release.foreach(_ ++= scratch)
    cum.join(broadcast(tot), Seq("grp"))
      .groupBy(col("grp"))
      .agg(max(col("tot")).as("w_total"), qCols: _*)
  }
}
