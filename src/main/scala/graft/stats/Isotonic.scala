package graft.stats

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Isotonic (monotone non-decreasing) regression over a bounded bin
  * axis — the probability-calibration primitive (reliability curves,
  * score→rate monotonization).
  *
  * Strategy for scale: the data is first reduced to per-bin weighted
  * sums by ONE distributed aggregate (the bin axis is caller-bounded,
  * e.g. fixed-width score buckets), then the isotonic fit is computed
  * on the B-row bin table via the minimax characterization
  *
  *   f_i = max_{j ≤ i} min_{k ≥ i} mean(y over bins j..k)
  *
  * which equals the pool-adjacent-violators solution exactly (the
  * classic minimax theorem for isotonic regression; see Robertson,
  * Wright & Dykstra 1988, Thm 1.4.4). The j×k enumeration is B² over
  * range means from prefix sums — O(B²) rows for B bins, data-size
  * independent, and purely relational, so the same formula replays in
  * any SQL oracle with no sequential PAVA loop.
  */
object Isotonic {

  /** Per-bin isotonic means. `bin` must be an integral, bounded-
    * cardinality column; `y` the response; `w` the weight.
    * Returns (bin, n_w, raw_mean, iso_mean) ordered by bin. */
  def fit(df: DataFrame, bin: Column, y: Column, w: Column): DataFrame = {
    val g = df
      .select(bin.cast("long").as("bin"), y.cast("double").as("y"),
        w.cast("double").as("w"))
      .groupBy(col("bin"))
      .agg(sum(col("w") * col("y")).as("wy"), sum(col("w")).as("ww"))

    // prefix sums over the collapsed bin axis: B rows, bounded by the
    // caller's bin cardinality (≤ dozens), never by the data
    val asc = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = g.select(col("bin"), col("wy"), col("ww"),
      sum(col("wy")).over(asc).as("cy"), sum(col("ww")).over(asc).as("cw"))

    // range mean over bins j..k from prefix-sum differences
    val lo = p.select(col("bin").as("j"),
      (col("cy") - col("wy")).as("cy_lo"), (col("cw") - col("ww")).as("cw_lo"))
    val hi = p.select(col("bin").as("k"), col("cy").as("cy_hi"),
      col("cw").as("cw_hi"))
    val ranges = lo.join(hi, col("j") <= col("k"))
      .select(col("j"), col("k"),
        ((col("cy_hi") - col("cy_lo")) / (col("cw_hi") - col("cw_lo")))
          .as("m"))

    // f_i = max_j min_k — two tiny aggregations over the B² range table
    val i = g.select(col("bin").as("i"))
    val inner = i.join(ranges, col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("i"), col("j")).agg(min(col("m")).as("mn"))
    val iso = inner.groupBy(col("i")).agg(max(col("mn")).as("iso_mean"))

    g.join(iso, col("bin") === col("i"))
      .select(col("bin"), col("ww").as("n_w"),
        (col("wy") / col("ww")).as("raw_mean"), col("iso_mean"))
      .orderBy(col("bin"))
  }
}
