package graft.hazard

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Aalen–Johansen cumulative-incidence estimation under competing
  * risks — the multi-cause generalization of the reference's
  * cumulative-hazard surface (absrisk_fun.R works with a single cause
  * competing against mortality; this exposes the general two-cause
  * estimator as a first-class operator).
  *
  * CIF_k(t) = Σ_{t_j ≤ t} S(t_j−) · d_kj / n_j, with S(t−) the
  * all-cause Kaplan–Meier survival just before t. The per-time event
  * table is produced by one distributed groupBy; the risk-set /
  * prefix-product scans then run over the *collapsed time axis* (one
  * row per distinct event time — bounded by the time grid, not the
  * data), so the single-partition window is over a small frame by
  * construction, exactly like the M8/M26 step-table scans.
  */
object CompetingRisks {

  /** Per-time cumulative incidence for causes 1 and 2.
    *
    * @param df    unit-level frame
    * @param t     event/censoring time column
    * @param cause 0 = censored, 1 / 2 = competing event causes
    * @return one row per distinct event time: t, n_risk, d1, d2,
    *         s_prev (all-cause KM just before t), cif1, cif2
    */
  def aalenJohansen(df: DataFrame, t: Column, cause: Column): DataFrame = {
    val g = df
      .select(t.cast("double").as("t"), cause.cast("int").as("cause"))
      .groupBy(col("t"))
      .agg(
        sum(when(col("cause") === 1, 1.0).otherwise(0.0)).as("d1"),
        sum(when(col("cause") === 2, 1.0).otherwise(0.0)).as("d2"),
        count(lit(1)).cast("double").as("ct"))

    // risk set n(t) = Σ_{t' ≥ t} ct — descending cumulative over the
    // collapsed time axis
    val desc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = g.withColumn("n_risk", sum(col("ct")).over(desc))

    // keep event times; drop a time where the whole risk set fails
    // (ln 0) — mirrors KaplanMeier.fit's guard
    val e = r.filter(col("d1") + col("d2") > 0 &&
      col("d1") + col("d2") < col("n_risk"))

    val ascPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ascIncl = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("s_prev",
        exp(coalesce(
          sum(log(lit(1.0) - (col("d1") + col("d2")) / col("n_risk")))
            .over(ascPrev),
          lit(0.0))))
      .withColumn("cif1",
        sum(col("s_prev") * col("d1") / col("n_risk")).over(ascIncl))
      .withColumn("cif2",
        sum(col("s_prev") * col("d2") / col("n_risk")).over(ascIncl))
      .select("t", "n_risk", "d1", "d2", "s_prev", "cif1", "cif2")
  }
}
