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

  /** Prepare the (grp, x, w, sk) base frame shared by every radix
    * entry point. */
  private def radixBase(df: DataFrame, group: Column, x: Column,
      weight: Column): DataFrame =
    df.select(group.as("grp"), x.as("x"), weight.cast("long").as("w"))
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

  /** Pass-1 radix histogram with running and total weight: one row per
    * (grp, 16-bit bucket), ≤ 65 536 per group, so the per-group window
    * is bounded by construction (not by the data). */
  private def pass1(base: DataFrame): DataFrame = {
    val h1 = base.groupBy(col("grp"), shiftright(col("sk"), 48).as("b"))
      .agg(sum(col("w")).as("bw"))
    val runW = Window.partitionBy(col("grp")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h1.withColumn("cb", sum(col("bw")).over(runW))
      .withColumn("tot", sum(col("bw")).over(Window.partitionBy(col("grp"))))
  }

  /** The shared three-pass rank search: min x with cum(w) ≥ k, exactly,
    * for every (group × target-table row). `c1` is [[pass1]] over
    * `base`; `lvl` is the tiny broadcast target table (one row per
    * requested rank, arbitrary carrier columns); `ri` names the target
    * id and `k` the LONG rank, both expressions over c1's `tot` column
    * and lvl's columns — computed INLINE on the histogram cross-join so
    * c1 (and with it the fact table) is consumed exactly once. The
    * rational-level search passes k = ⌈tot·num/den⌉ (identical to
    * cb·den ≥ tot·num on 64-bit integers); the interpolated search the
    * two bracketing ranks of a continuous position.
    * Returns (grp, ri, tot, q). */
  private def rankSearch(base: DataFrame, c1: DataFrame, lvl: DataFrame,
      ri: Column, k: Column): DataFrame = {
    // crossing bucket = min b with cb ≥ k; its exclusive prefix weight
    // rides along via min_by (b is unique per group)
    val cand1 = c1.crossJoin(broadcast(lvl))
      .withColumn("ri", ri).withColumn("k", k)
      .where(col("cb") >= col("k"))
      .groupBy(col("grp"), col("ri"), col("k"), col("tot"))
      .agg(min(col("b")).as("cb1"),
        min_by(col("cb") - col("bw"), col("b")).as("off"))
      .select(col("grp").as("cgrp"), col("ri"), col("k"),
        col("tot"), col("cb1"), col("off"))

    // ---- pass 2: same search at 32-bit prefix granularity, restricted
    // to each target's candidate bucket (the 32-bit prefix determines
    // the 16-bit one, so the next join can key on it alone)
    val sel1 = base.join(broadcast(cand1),
      col("grp") === col("cgrp") && shiftright(col("sk"), 48) === col("cb1"))
    val h2 = sel1.groupBy(col("grp"), col("ri"), col("k"),
        col("tot"), col("off"), shiftright(col("sk"), 32).as("b"))
      .agg(sum(col("w")).as("bw"))
    val runL = Window.partitionBy(col("grp"), col("ri")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c2 = h2.withColumn("cb", col("off") + sum(col("bw")).over(runL))
    val cand2 = c2.where(col("cb") >= col("k"))
      .groupBy(col("grp"), col("ri"), col("k"), col("tot"))
      .agg(min(col("b")).as("cb2"),
        min_by(col("cb") - col("bw"), col("b")).as("off"))
      .select(col("grp").as("cgrp"), col("ri"), col("k"),
        col("tot"), col("cb2"), col("off"))

    // ---- pass 3: exact resolution over the final bucket's distinct
    // values, cumulated in the ORIGINAL x order (two distinct x may
    // share a double image; the original type breaks the tie exactly)
    val sel2 = base.join(broadcast(cand2),
      col("grp") === col("cgrp") && shiftright(col("sk"), 32) === col("cb2"))
    val dx = sel2.groupBy(col("grp"), col("ri"), col("k"),
        col("tot"), col("off"), col("x"))
      .agg(sum(col("w")).as("wv"))
    val runX = Window.partitionBy(col("grp"), col("ri")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dx.withColumn("cw", col("off") + sum(col("wv")).over(runX))
      .where(col("cw") >= col("k"))
      .groupBy(col("grp"), col("ri"))
      .agg(max(col("tot")).as("tot"), min(col("x")).as("q"))
  }

  /** Per-group exact weighted quantiles at levels `ps` (given as exact
    * rationals `(num, den)`, e.g. (1,4), (1,2), (3,4)). Returns one row
    * per group: (grp, w_total, q_num_den...) with one column per level
    * named q_<num>_<den>, typed as x. */
  def weightedQuantiles(df: DataFrame, group: Column, x: Column,
      weight: Column, ps: Seq[(Int, Int)]): DataFrame = {
    require(ps.nonEmpty, "at least one quantile level")
    requireNumeric(df, x)
    val base = radixBase(df, group, x, weight)
    val c1 = pass1(base)
    // one rank target per (group, level): cb·den ≥ tot·num on 64-bit
    // integers ⟺ cb ≥ ⌈tot·num/den⌉ (all terms positive; `div` is
    // integer division, keeping the whole search in exact 64-bit)
    val perLevel = rankSearch(base, c1, levelTable(df, ps),
        ri = col("qi"),
        k = expr("(tot * num + den - 1) div den"))
      .withColumnRenamed("ri", "qi")
    pivotLevels(perLevel, ps)
  }

  /** Per-group INTERPOLATED (type-7 / `quantile_cont`) quantiles: the
    * continuous position h = (W−1)·p over the weight-expanded order
    * statistics, linearly interpolated between the two bracketing
    * values — the grouped twin of Spark's exact `percentile` aggregate
    * and DuckDB's `quantile_cont`, with `weight` as frequency.
    *
    * Why not the built-in aggregate: `percentile` buffers a per-group
    * value-count map — data-sized state per group that at the 100×
    * probe meant ~20M-entry maps, 158 s and heavy GC for one query.
    * Here each level becomes (at most) TWO exact rank targets for the
    * shared radix [[rankSearch]] — the same three bounded scans, no
    * data-sized aggregation state anywhere, and the interpolation is
    * plain double arithmetic on the two resolved ranks (h and h−⌊h⌋
    * computed exactly as the built-ins compute them, so results agree
    * bit-for-bit where the built-in agreed).
    *
    * Returns one row per group: (grp, w_total, q_0, q_1, ...) with one
    * DOUBLE column per requested level, in `ps` order. */
  def interpolatedQuantiles(df: DataFrame, group: Column, x: Column,
      weight: Column, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "at least one quantile level")
    require(ps.forall(p => p >= 0.0 && p <= 1.0), s"levels must be in [0,1]: $ps")
    requireNumeric(df, x)
    val spark = df.sparkSession
    import spark.implicits._
    val base = radixBase(df, group, x.cast("double"), weight)
    val c1 = pass1(base)
    // one target row per (level, side): h = (W−1)·p, lower rank
    // ⌊h⌋+1, upper rank ⌊h⌋+2 — both searched unconditionally (when h
    // is integral, or the upper rank exceeds W, the upper target
    // simply resolves to no row / the same value and the frac-0
    // interpolation below ignores it)
    val lvl = broadcast(ps.zipWithIndex.flatMap { case (p, i) =>
      Seq((i, p, 0), (i, p, 1)) }.toDF("qi", "p", "side"))
    val res = rankSearch(base, c1, lvl,
      ri = col("qi") * 2 + col("side"),
      k = floor((col("tot") - lit(1L)).cast("double") * col("p"))
        .cast("long") + lit(1L) + col("side"))
    // pivot sides back per level and interpolate: lo + (hi − lo)·frac
    val pTable = broadcast(ps.zipWithIndex.map { case (p, i) => (i, p) }
      .toDF("qi", "p"))
    val qCols = ps.indices.map(i =>
      min(when(col("qi") === i, col("q"))).as(s"q_$i"))
    res
      .withColumn("qi", ((col("ri") - col("ri") % 2) / 2).cast("int"))
      .withColumn("side", col("ri") % 2)
      .groupBy(col("grp"), col("qi"))
      .agg(max(col("tot")).as("tot"),
        min(when(col("side") === 0, col("q"))).as("xlo"),
        max(when(col("side") === 1, col("q"))).as("xhi"))
      .join(pTable, Seq("qi"))
      .withColumn("h", (col("tot") - lit(1L)).cast("double") * col("p"))
      .withColumn("frac", col("h") - floor(col("h")))
      // frac = 0 short-circuits BEFORE touching xhi: the upper rank may
      // not exist (p = 1) or may be a NaN whose 0-weighted term would
      // still poison the product
      .withColumn("q", when(col("frac") === 0.0 || col("xhi").isNull,
          col("xlo"))
        .otherwise(col("xlo") + (col("xhi") - col("xlo")) * col("frac")))
      .groupBy(col("grp"))
      .agg(max(col("tot")).as("w_total"), qCols: _*)
  }

  /** Global (single-group) interpolated quantiles, returned as driver
    * scalars — the scalable twin of `percentile(x, array(ps)).head`.
    * The builtin aggregate buffers ONE value-count map over every
    * distinct x in the dataset (data-sized state merged through a
    * single reducer — a guaranteed OOM on a continuous column at
    * 100 TB); this costs three bounded scans instead and returns the
    * same type-7 values in DuckDB's `lo + (hi−lo)·frac` form.
    * Throws on an empty/all-null input, like `.head().getDouble` on
    * the builtin's null result did at every call site this replaced. */
  def interpolatedQuantilesGlobal(df: DataFrame, x: Column,
      weight: Column, ps: Seq[Double]): Seq[Double] = {
    val rows = interpolatedQuantiles(df, lit(1), x, weight, ps).collect()
    require(rows.nonEmpty, "interpolatedQuantilesGlobal on empty input")
    ps.indices.map(i => rows.head.getDouble(2 + i))
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
