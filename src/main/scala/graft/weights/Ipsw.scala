package graft.weights

import graft.core.FeatureArray
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Inverse-propensity-score pseudo-weights (SURVEY.md M4).
  *
  * After the propensity model for cohort membership is fit on the
  * stacked cohort ∪ survey sample, a cohort unit's pseudo-weight is the
  * inverse of its propensity odds: ipsw = exp(−x'γ)/a
  * (simu_fun.R:48-49; taylor_deviate.R:63-64). Pure column arithmetic
  * over the fitted linear predictor — stays in whole-stage codegen.
  */
object Ipsw {

  /** ipsw from the linear predictor (log-odds) column. */
  def fromLinearPredictor(eta: Column, a: Double = 1.0): Column =
    exp(-eta) / lit(a)

  /** ipsw from a feature array + fitted coefficient vector. */
  def fromFeatures(features: Column, gamma: Array[Double], a: Double = 1.0): Column =
    fromLinearPredictor(FeatureArray.dot(features, gamma), a)

  /** Jacobian ∂ipsw/∂γ_j = −ipsw·x_j (taylor_deviate.R:64), as one
    * column per coefficient. */
  def jacobian(features: Column, gamma: Array[Double], p: Int): Seq[Column] = {
    val w = fromFeatures(features, gamma)
    (0 until p).map(j => -w * features.getItem(j))
  }
}
