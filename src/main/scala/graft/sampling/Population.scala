package graft.sampling

import graft.core.Rng
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synthetic finite-population generator (SURVEY.md S3) — the
  * reference's population synthesis (calib_simu_noninf0315.R:26-108):
  * correlated normal covariates, Weibull proportional-hazards event
  * times, double censoring.
  *
  * All randomness derives from the engine's deterministic cross-engine
  * RNG keyed on the row id (graft.core.Rng), so the population is
  * reproducible on any cluster size AND oracle-checkable — generation is
  * `spark.range(N)` + pure column expressions: embarrassingly parallel,
  * no shuffle, no driver data.
  */
object Population {

  /** Standard normal via Box-Muller from two keyed uniforms. */
  private def boxMuller(id: org.apache.spark.sql.Column, salt: Long) = {
    val u1 = Rng.uniform(id, salt)
    val u2 = Rng.uniform(id, salt + 1000003L)
    sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
  }

  /** @param n        population size (reference N=300,000)
    * @param beta     PH coefficients (β0 absorbed into scale; reference
    *                 beta = c(log(-log(.85)/15), 0.2, 0.2, 0.3))
    * @param shape    Weibull shape
    * @param adminCensor fixed administrative censor time
    */
  def generate(spark: SparkSession, n: Long,
      beta: Array[Double] = Array(math.log(-math.log(0.85) / 15.0), 0.2, 0.2, 0.3),
      shape: Double = 1.0,
      adminCensor: Double = 15.0,
      sds: Array[Double] = Array(4.0, 2.0, 2.0)): DataFrame = {
    val idc = col("id")
    val base = spark.range(1, n + 1).toDF("id")
      .withColumn("x1", boxMuller(idc, 1) * lit(sds(0)))
      .withColumn("x2", boxMuller(idc, 2) * lit(sds(1)))
      .withColumn("x3", boxMuller(idc, 3) * lit(sds(2)))
    // PH Weibull: T = (−ln(1−u) / exp(x'β))^{1/shape}; β(0) is the
    // log-baseline-rate intercept.
    val eta = lit(beta(0)) + col("x1") * lit(beta(1)) +
      col("x2") * lit(beta(2)) + col("x3") * lit(beta(3))
    val u = Rng.uniform(idc, 4)
    val tEvent = pow(-log(lit(1.0) - u) / exp(eta), lit(1.0 / shape))
    // double censoring: random c1 ~ U(0, 2·τ) and administrative τ
    val c1 = Rng.uniform(idc, 5) * lit(2.0 * adminCensor)
    base
      .withColumn("t_i", tEvent)
      .withColumn("c1", c1)
      .withColumn("t", least(col("t_i"), col("c1"), lit(adminCensor)))
      .withColumn("d", when(col("t_i") <= least(col("c1"), lit(adminCensor)), 1).otherwise(0))
      .withColumn("w", lit(1.0))
  }

  /** One measurement-error scenario (calib_simu_noninf0315.R:61-90
    * `t_d_gen`): reported times t_tilde = min(t_i + δ, censors) with
    * δ = max(0, b0 + b1·x1 + b2·x2 + b3·x1·x2 + N(0.01, 1)), the
    * error-prone indicator d_tilde, and the population-level WLS
    * imputation t_imp = clip(t_tilde − δ̂) on d_tilde=1 rows
    * (`lm(t_delta ~ x1*x2)`), t_imp = t elsewhere. */
  final case class ErrorScenario(beta: Array[Double])

  def withErrorScenarios(pop: DataFrame,
      scenarios: Seq[ErrorScenario],
      adminCensor: Double = 15.0): DataFrame = {
    import graft.core.FeatureArray
    import graft.stats.WeightedGLM
    scenarios.zipWithIndex.foldLeft(pop) { case (df, (sc, i0)) =>
      val i = i0 + 1
      val b = sc.beta
      val noise = boxMuller(col("id"), 7000L + 13L * i) + lit(0.01)
      val deltaRaw = lit(b(0)) + col("x1") * lit(b(1)) + col("x2") * lit(b(2)) +
        col("x1") * col("x2") * lit(b(3)) + noise
      val stage = df
        .withColumn(s"t_delta_$i", greatest(deltaRaw, lit(0.0)))
        .withColumn(s"__td_$i", col("t_i") + col(s"t_delta_$i"))
        .withColumn(s"t_tilde_$i",
          least(col(s"__td_$i"), col("c1"), lit(adminCensor)))
        .withColumn(s"d_tilde_$i",
          when(col(s"__td_$i") <= least(col("c1"), lit(adminCensor)), 1.0)
            .otherwise(0.0))
        .drop(s"__td_$i")
      // population WLS of δ on [1, x1, x2, x1·x2] over reported events
      val feats = FeatureArray.withInteractions(
        Seq(col("x1"), col("x2")), Seq((0, 1)))
      val fit = WeightedGLM.wls(stage.filter(col(s"d_tilde_$i") === 1.0),
        feats, col(s"t_delta_$i"), lit(1.0), p = 4)
      val fitted = lit(fit.coefficients(0)) +
        col("x1") * lit(fit.coefficients(1)) + col("x2") * lit(fit.coefficients(2)) +
        col("x1") * col("x2") * lit(fit.coefficients(3))
      stage.withColumn(s"t_imp_$i",
        when(col(s"d_tilde_$i") === 1.0,
          greatest(col(s"t_tilde_$i") - greatest(fitted, lit(0.0)), lit(0.0)))
          .otherwise(col("t")))
    }
  }
}
