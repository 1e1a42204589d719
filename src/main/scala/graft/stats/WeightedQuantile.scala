package graft.stats

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Exact design-weighted quantiles — the survey-estimation twin of the
  * unweighted exact percentile (reference wt.quantile usage class):
  * Q_p = min { x : Σ_{x_i ≤ x} w_i ≥ p · Σ w_i }, the left-continuous
  * weighted quantile function.
  *
  * Determinism discipline: weights enter as BIGINTs, quantile levels as
  * exact rationals (num/den), and every cumulative sum and threshold
  * comparison is 64-bit integer arithmetic — no floating cumsum, no
  * tie-order sensitivity (ties in x pre-aggregate to distinct-value
  * granularity, making the running weight per distinct x well-defined
  * regardless of partition order).
  *
  * Algorithm: a sample-free radix search instead of an ordered scan.
  * The bucket key `shiftright(sortable_bits(double(x)), s)` is a
  * weakly-monotone, VALUE-deterministic partition of the x line
  * (graft.functions.SortableBits — exact IEEE bit layout, no range
  * sampling), so the plan is safe under arbitrary recomputation: there
  * is no `repartitionByRange` whose boundaries could re-sample
  * differently between two reads of the same subtree, hence no
  * correctness-critical persist and no cache-discipline contract with
  * the caller (the round-7 hazard this design removes).
  *
  *   1. 16-bit radix histogram per group (one map-side-partial hash
  *      agg over the facts) → per-bucket weight, cumulated over the
  *      ≤ 65 536-row-per-group histogram (a bounded window, never a
  *      data-sized one). The bucket where the running weight first
  *      crosses p·W must contain Q_p.
  *   2. Refine: re-histogram ONLY the candidate bucket's rows at
  *      32-bit prefix granularity (broadcast of one (group, level)
  *      candidate row each), carrying the exclusive prefix weight.
  *   3. Resolve: exact per-distinct-x cumsum inside the final bucket
  *      (≤ 2^32 of sortable-bit space; for real data a handful of
  *      distinct values) ordered by the ORIGINAL x, pick
  *      min x with (offset + cum)·den ≥ W·num.
  *
  * 100 TB shape: three passes over the facts, each a codegen'd scan +
  * partial hash aggregate (passes 2–3 broadcast-pruned to candidate
  * buckets); the only windows run over histogram tables bounded by
  * construction (groups × 65 536, levels × 65 536, in-bucket distinct
  * values). No collect, no sort of the fact table, no cache. Totals
  * must fit a signed 64-bit integer after multiplying by the level
  * denominator: Σw · max(den) < 2^63.
  *
  * Null x rows are dropped (a null carries no quantile information);
  * NaN sorts greatest, matching Spark's ordering.
  */
object WeightedQuantile {

  /** Per-group exact weighted quantiles at levels `ps` (given as exact
    * rationals `(num, den)`, e.g. (1,4), (1,2), (3,4)). Returns one row
    * per group: (grp, w_total, q_num_den...) with one column per level
    * named q_<num>_<den>, typed as x. */
  def weightedQuantiles(df: DataFrame, group: Column, x: Column,
      weight: Column, ps: Seq[(Int, Int)]): DataFrame = {
    require(ps.nonEmpty, "at least one quantile level")
    val base = df.select(group.as("grp"), x.as("x"),
        weight.cast("long").as("w"))
      .filter(col("x").isNotNull)
      .withColumn("sk",
        graft.functions.VectorExpressions.sortableBits(col("x").cast("double")))

    // tiny literal level table: one row per requested quantile
    val spark = df.sparkSession
    import spark.implicits._
    val lvl = broadcast(ps.zipWithIndex
      .map { case ((n, d), i) => (i, n.toLong, d.toLong) }
      .toDF("qi", "num", "den"))

    // ---- pass 1: 16-bit radix histogram; crossing bucket per level.
    // The histogram is ≤ 65 536 rows per group, so the per-group window
    // is bounded by construction (not by the data).
    val h1 = base.groupBy(col("grp"), shiftright(col("sk"), 48).as("b"))
      .agg(sum(col("w")).as("bw"))
    val runW = Window.partitionBy(col("grp")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c1 = h1.withColumn("cb", sum(col("bw")).over(runW))
      .withColumn("tot", sum(col("bw")).over(Window.partitionBy(col("grp"))))
    // crossing bucket = min b with cb·den ≥ tot·num; its exclusive
    // prefix weight rides along via min_by (b is unique per group)
    val cand1 = c1.crossJoin(lvl)
      .where(col("cb") * col("den") >= col("tot") * col("num"))
      .groupBy(col("grp"), col("qi"), col("num"), col("den"), col("tot"))
      .agg(min(col("b")).as("cb1"),
        min_by(col("cb") - col("bw"), col("b")).as("off"))
      .select(col("grp").as("cgrp"), col("qi"), col("num"), col("den"),
        col("tot"), col("cb1"), col("off"))

    // ---- pass 2: same search at 32-bit prefix granularity, restricted
    // to each level's candidate bucket (the 32-bit prefix determines the
    // 16-bit one, so the next join can key on it alone)
    val sel1 = base.join(broadcast(cand1),
      col("grp") === col("cgrp") && shiftright(col("sk"), 48) === col("cb1"))
    val h2 = sel1.groupBy(col("grp"), col("qi"), col("num"), col("den"),
        col("tot"), col("off"), shiftright(col("sk"), 32).as("b"))
      .agg(sum(col("w")).as("bw"))
    val runL = Window.partitionBy(col("grp"), col("qi")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c2 = h2.withColumn("cb", col("off") + sum(col("bw")).over(runL))
    val cand2 = c2.where(col("cb") * col("den") >= col("tot") * col("num"))
      .groupBy(col("grp"), col("qi"), col("num"), col("den"), col("tot"))
      .agg(min(col("b")).as("cb2"),
        min_by(col("cb") - col("bw"), col("b")).as("off"))
      .select(col("grp").as("cgrp"), col("qi"), col("num"), col("den"),
        col("tot"), col("cb2"), col("off"))

    // ---- pass 3: exact resolution over the final bucket's distinct
    // values, cumulated in the ORIGINAL x order (two distinct x may
    // share a double image; the original type breaks the tie exactly)
    val sel2 = base.join(broadcast(cand2),
      col("grp") === col("cgrp") && shiftright(col("sk"), 32) === col("cb2"))
    val dx = sel2.groupBy(col("grp"), col("qi"), col("num"), col("den"),
        col("tot"), col("off"), col("x"))
      .agg(sum(col("w")).as("wv"))
    val runX = Window.partitionBy(col("grp"), col("qi")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perLevel = dx
      .withColumn("cw", col("off") + sum(col("wv")).over(runX))
      .where(col("cw") * col("den") >= col("tot") * col("num"))
      .groupBy(col("grp"), col("qi"))
      .agg(max(col("tot")).as("tot"), min(col("x")).as("q"))

    val qCols = ps.zipWithIndex.map { case ((n, d), i) =>
      min(when(col("qi") === i, col("q"))).as(s"q_${n}_$d")
    }
    perLevel.groupBy(col("grp"))
      .agg(max(col("tot")).as("w_total"), qCols: _*)
  }
}
