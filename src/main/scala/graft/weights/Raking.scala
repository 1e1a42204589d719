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
  * factor f_h = N_h / N̂_h, w ← w·f_h.
  *
  * Distributed shape: margin tables are CONTROL totals — inherently
  * dimension-sized (thousands of cells, not rows) — so the factors live
  * on the DRIVER as map literals and each step is ONE tiny grouped
  * aggregate plus a narrow map-lookup expression. No join, no shuffle
  * of the sample, no plan pinning: the whole multi-sweep adjustment
  * compiles to nested codegen'd expressions over the input, and the
  * aggregates run against a single cached narrow projection. (The
  * previous broadcast-join formulation re-derived the sample frame
  * twice per step and needed persist pins every other sweep; at 100 TB
  * the factor map is kilobytes while the joins were full-width
  * shuffles-worth of plan.)
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
    // narrow working projection: original columns + string cell keys;
    // cached because every step's aggregate re-scans it (released
    // before returning — the result recomputes one narrow pass)
    var base = df.withColumn("rake_wt", weight.cast("double"))
    dims.foreach { case ((cell, _), i) =>
      base = base.withColumn(s"__rk$i", cell.cast("string"))
    }
    val cached = base.persist()

    // control totals to the driver, once per dimension; a missing (or
    // null) cell keeps factor 1.0 — a partial targets table must not
    // silently delete sample rows (inner-join semantics would)
    val targetMaps: Seq[Map[String, Double]] = margins.map { case (_, tg) =>
      tg.select(col(tg.columns.head).cast("string"),
          col(tg.columns(1)).cast("double"))
        .collect().filter(r => !r.isNullAt(0) && !r.isNullAt(1))
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    }

    // rake_wt as a growing expression: sweeps × dims map-lookup factors
    var wt: Column = col("rake_wt")
    for (_ <- 1 to sweeps; ((_, _), i) <- dims) {
      val hat = cached.groupBy(col(s"__rk$i")).agg(sum(wt).as("hat"))
        .collect().filter(!_.isNullAt(0))
        .map(r => r.getString(0) -> r.getDouble(1))
      val factors = hat.flatMap { case (cell, h) =>
        targetMaps(i).get(cell).map(t => cell -> t / h)
      }.toMap
      wt = if (factors.isEmpty) wt
      else {
        val m = map(factors.toSeq.flatMap { case (k, v) =>
          Seq(lit(k), lit(v)) }: _*)
        wt * coalesce(element_at(m, col(s"__rk$i")), lit(1.0))
      }
    }
    val result = base.withColumn("rake_wt", wt)
      .drop(dims.map { case (_, i) => s"__rk$i" }: _*)
    cached.unpersist(blocking = false)
    result
  }
}
