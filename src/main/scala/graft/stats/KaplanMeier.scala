package graft.stats

import graft.core.Windows
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Weighted Kaplan-Meier product-limit survival estimator with
  * Greenwood variance.
  *
  * The reference estimates survival through the Breslow cumulative
  * hazard (`taylor_deviate.R:1023-1055`) and discrete hazard/AR chain
  * (`taylor_deviate.R:746-883`); the product-limit estimator is the
  * nonparametric companion every survival consumer expects, built from
  * the same risk-set mechanics (tie-collapse A1 + suffix-cumsum O3 +
  * prefix scan O4):
  *
  *   S(t) = prod over event times u <= t of (1 - dw(u) / n(u)),
  *   Greenwood: Var S(t) = S(t)^2 * sum u<=t dw/(n*(n-dw)).
  *
  * Scale shape: one groupBy(t) collapses the event stream to the
  * distinct-time step table (bounded by time cardinality, not rows);
  * the suffix/prefix scans run on that collapsed table via the
  * two-phase distributed scan in [[graft.core.Windows]] — no global
  * single-task window over raw rows at any point.
  */
object KaplanMeier {

  /** Step table of the estimator at distinct event times (rows where a
    * weighted event mass dw > 0): columns
    * (t, n_risk, d_w, surv, se). Rows whose entire remaining risk set
    * dies (dw == n_risk, only possible at the maximum time) are
    * excluded: S is 0 there and Greenwood's denominator vanishes.
    */
  def fit(df: DataFrame, t: Column, d: Column, w: Column): DataFrame = {
    val perTime = df
      .select(t.cast("double").as("t"), d.cast("double").as("d"),
        w.cast("double").as("w"))
      .groupBy(col("t"))
      .agg(sum(col("w") * col("d")).as("wd"), sum(col("w")).as("wall"))
    val atRisk = Windows.suffixSum(perTime, col("t"),
      Seq((col("wall"), "n_risk")))
    val events = atRisk.filter(col("wd") > 0 && col("wd") < col("n_risk"))
      .withColumn("lnf", log(lit(1.0) - col("wd") / col("n_risk")))
      .withColumn("gw",
        col("wd") / (col("n_risk") * (col("n_risk") - col("wd"))))
    Windows.scan(events, Seq(col("t")),
      Seq((col("lnf"), "cum_lnf"), (col("gw"), "cum_gw")))
      .select(col("t"), col("n_risk"), col("wd").as("d_w"),
        exp(col("cum_lnf")).as("surv"),
        (exp(col("cum_lnf")) * sqrt(col("cum_gw"))).as("se"))
  }
}
