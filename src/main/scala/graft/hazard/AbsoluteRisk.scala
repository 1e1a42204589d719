package graft.hazard

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Absolute risk (SURVEY.md M12) — the reference's `absR_w`
  * (taylor_deviate.R:933-953):
  *
  *   absR(t*, x0) = 1 − exp(−Λ(t*) · e^{x0'β})
  *
  * Inputs are a |t*|-row cumulative-hazard table and a fitted β — tiny;
  * the transform is a plain expression (delta-method influence columns
  * attach downstream on the unit-level influence frame).
  */
object AbsoluteRisk {

  def column(cumHzd: Column, relHzd0: Double): Column =
    lit(1.0) - exp(-cumHzd * lit(relHzd0))

  /** cumHzdAt: (t_star, cum_hzd); x0·β supplied as the scalar linear
    * predictor of the risk-profile covariates. */
  def at(cumHzdAt: DataFrame, eta0: Double): DataFrame = {
    val rel = math.exp(eta0)
    cumHzdAt.withColumn("abs_risk", column(col(cumHzdAt.columns(1)), rel))
  }
}
