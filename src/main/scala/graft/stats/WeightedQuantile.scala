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
  *
  * x must be NUMERIC: the radix bucket key is `double(x)`, and the
  * search is only correct when that cast is weakly monotone w.r.t.
  * x's native ordering and null-free on non-null x — true of every
  * numeric type (longs beyond 2^53 may SHARE a double image, which
  * is fine: pass 3 breaks the tie in the original type), false of
  * e.g. strings (lexicographic order ≠ numeric order, and a failed
  * cast yields a null bucket key that would corrupt the histogram
  * cumsum). Enforced with a `require` at plan-build time.
  */
object WeightedQuantile {

  /** The tiny broadcast level table: one row per requested quantile,
    * levels as exact rationals. */
  private def levelTable(df: DataFrame, ps: Seq[(Int, Int)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    broadcast(ps.zipWithIndex
      .map { case ((n, d), i) => (i, n.toLong, d.toLong) }
      .toDF("qi", "num", "den"))
  }

  /** Pivot (grp, qi, tot, q) long form to one row per group with a
    * q_<num>_<den> column per level. */
  private def pivotLevels(perLevel: DataFrame, ps: Seq[(Int, Int)]): DataFrame = {
    val qCols = ps.zipWithIndex.map { case ((n, d), i) =>
      min(when(col("qi") === i, col("q"))).as(s"q_${n}_$d")
    }
    perLevel.groupBy(col("grp"))
      .agg(max(col("tot")).as("w_total"), qCols: _*)
  }

  private def requireNumeric(df: DataFrame, x: Column): Unit = {
    val t = df.select(x.as("x")).schema.head.dataType
    require(t.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"weighted quantiles need a numeric x whose double cast is " +
        s"order-preserving; got $t")
  }

  /** Per-group exact weighted quantiles at levels `ps` (given as exact
    * rationals `(num, den)`, e.g. (1,4), (1,2), (3,4)). Returns one row
    * per group: (grp, w_total, q_num_den...) with one column per level
    * named q_<num>_<den>, typed as x. */
  def weightedQuantiles(df: DataFrame, group: Column, x: Column,
      weight: Column, ps: Seq[(Int, Int)]): DataFrame = {
    require(ps.nonEmpty, "at least one quantile level")
    requireNumeric(df, x)
    val base = df.select(group.as("grp"), x.as("x"),
        weight.cast("long").as("w"))
      .filter(col("x").isNotNull)
      .withColumn("sk",
        graft.functions.VectorExpressions.sortableBits(col("x").cast("double")))
      // belt-and-braces: a null bucket key would sort FIRST in the
      // histogram window and corrupt every cumulative offset after it.
      // Numeric casts never null a non-null x (enforced above), so
      // this filter is a no-op that costs nothing — but it turns a
      // silent wrong answer into a dropped row if the contract is
      // ever violated.
      .filter(col("sk").isNotNull)

    val lvl = levelTable(df, ps)

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

    pivotLevels(perLevel, ps)
  }

  /** Bounded-DOMAIN variant: one distinct-value cumsum pass instead of
    * the three radix scans. Same contract and output schema as
    * [[weightedQuantiles]]; the caller asserts that x's distinct-value
    * domain per group is BOUNDED (quantized scores, code points,
    * character counts — not raw continuous measures).
    *
    * Decision rule (measured at sf0.1, min-of-3): for a domain of
    * ≤ ~10^6 distinct values per group the distinct table is no larger
    * than the radix path's own pass-1 histogram, so one scan + one
    * domain-bounded window strictly beats three scans — the decile
    * callers (1e-6-quantized propensities, ~60k distinct) and the
    * MAD screen (character counts) regressed 1.2–1.45× when moved to
    * the uniform radix path and recover here. For unbounded domains
    * (prices, measures) the distinct table is data-sized, the window
    * becomes a per-group sort of the data, and the radix path wins —
    * that asymmetry is why the dispatch is an explicit caller choice
    * rather than a cardinality guess inside the function.
    *
    * 100 TB shape: one codegen'd scan + partial hash agg to the
    * distinct table (≤ domain × groups rows), one window over it,
    * level resolution on the broadcast rational table. No persist, no
    * repartitionByRange, deterministic under recomputation. */
  def weightedQuantilesDistinct(df: DataFrame, group: Column, x: Column,
      weight: Column, ps: Seq[(Int, Int)]): DataFrame = {
    require(ps.nonEmpty, "at least one quantile level")
    requireNumeric(df, x)
    val base = df.select(group.as("grp"), x.as("x"),
        weight.cast("long").as("w"))
      .filter(col("x").isNotNull)
    val dx = base.groupBy(col("grp"), col("x"))
      .agg(sum(col("w")).as("wv"))
    val runX = Window.partitionBy(col("grp")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = dx.withColumn("cw", sum(col("wv")).over(runX))
      .withColumn("tot", sum(col("wv")).over(Window.partitionBy(col("grp"))))
    val perLevel = c.crossJoin(levelTable(df, ps))
      .where(col("cw") * col("den") >= col("tot") * col("num"))
      .groupBy(col("grp"), col("qi"))
      .agg(max(col("tot")).as("tot"), min(col("x")).as("q"))
    pivotLevels(perLevel, ps)
  }
}
