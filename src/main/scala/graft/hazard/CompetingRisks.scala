package graft.hazard

import graft.core.Windows
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
  * prefix scans then run over the *collapsed time axis* via the
  * two-phase distributed scan in [[graft.core.Windows]] — exactly the
  * shape its siblings use (Breslow.scala:37, KaplanMeier.scala:46,
  * DiscreteHazard.scala:33). For discrete time grids the collapsed
  * table is tiny and the scan's probe takes the single-window small
  * path; for CONTINUOUS event times (the reference's regime,
  * taylor_deviate.R:614) the step table is data-sized and the scan
  * stays fully distributed — no bare global `Window.orderBy` anywhere.
  */
object CompetingRisks {

  /** Per-time cumulative incidence for causes 1 and 2.
    *
    * @param df    unit-level frame
    * @param t     event/censoring time column
    * @param cause 0 = censored, 1 / 2 = competing event causes
    * @param sizeHint cardinality of the TIE-COLLAPSED time axis (pass
    *                 Small for known-coarse discrete grids, Large for
    *                 continuous times; Auto probes)
    * @return one row per distinct event time: t, n_risk, d1, d2,
    *         s_prev (all-cause KM just before t), cif1, cif2
    */
  def aalenJohansen(df: DataFrame, t: Column, cause: Column,
      sizeHint: Windows.SizeHint = Windows.SizeHint.Auto): DataFrame = {
    val g = df
      .select(t.cast("double").as("t"), cause.cast("int").as("cause"))
      .groupBy(col("t"))
      .agg(
        sum(when(col("cause") === 1, 1.0).otherwise(0.0)).as("d1"),
        sum(when(col("cause") === 2, 1.0).otherwise(0.0)).as("d2"),
        count(lit(1)).cast("double").as("ct"))

    // risk set n(t) = Σ_{t' ≥ t} ct — descending scan over the
    // collapsed time axis
    val r = Windows.scan(g, Seq(col("t").desc),
      Seq(col("ct") -> "n_risk"), sizeHint = sizeHint)

    // keep event times; drop a time where the whole risk set fails
    // (ln 0) — mirrors KaplanMeier.fit's guard
    val e = r.filter(col("d1") + col("d2") > 0 &&
        col("d1") + col("d2") < col("n_risk"))
      .withColumn("lnf",
        log(lit(1.0) - (col("d1") + col("d2")) / col("n_risk")))

    // S(t−): EXCLUSIVE log-survival prefix, recovered from the
    // inclusive scan by peeling the current term (exact at the
    // round-8 contract every caller applies; the scan itself already
    // re-associates partial sums across partitions)
    val s = Windows.scan(e, Seq(col("t")),
        Seq(col("lnf") -> "__cum_lnf"), sizeHint = sizeHint)
      .withColumn("s_prev", exp(col("__cum_lnf") - col("lnf")))

    Windows.scan(s, Seq(col("t")),
        Seq((col("s_prev") * col("d1") / col("n_risk")) -> "cif1",
          (col("s_prev") * col("d2") / col("n_risk")) -> "cif2"),
        sizeHint = sizeHint)
      .select("t", "n_risk", "d1", "d2", "s_prev", "cif1", "cif2")
  }
}
