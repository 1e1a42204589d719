package graft.pipeline

import graft.core.{FeatureArray, LinAlg}
import graft.stats.{CoxPH, WeightedGLM}
import graft.variance.{CoxInfluence, HazardInfluence, Influence}
import graft.weights.Ipsw
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** The reference's analytic-variance entry point (`inference_beta` /
  * the IPSW block of taylor_deviate.R:38-236) as ONE composable chain:
  *
  *   stack → weighted-logistic propensity (γ̂) → IPSW pseudo-weights →
  *   weighted Cox (β̂) → per-unit influence of β, Λ(t*), ΛG(t*), absR
  *   with the FULL γ-chain (weights depend on γ̂) and β-chain — survey
  *   units included as γ-only deviate rows — → Poisson and PPS variance
  *   contractions split by sample (taylor_deviate.R:109-111).
  *
  * Deviate convention: everything is per unit MULTIPLICITY m_i (the
  * derivative of each estimand w.r.t. duplicating unit i), so the
  * contraction is directly Σ(1−π_i)Δ_i² with no further weighting —
  * algebraically identical to the reference's ps.w·(per-weight deviate)
  * but with one consistent scale throughout:
  *
  *   Δβ/dm_i  = ipsw_i·I⁻¹U_i + B·Δγ_i,   Δγ_i = H⁻¹ w_i(y−μ)x_i
  *   ΔΛ/dm_i  = ipsw_i·(direct) + Δγ_i'·C_γ(t*) + Δβ'·C_β(t*)
  *
  * Cohort π_i = 1/ipsw_i, survey π_i = 1/wt_i.
  */
object TaylorInference {

  final case class Estimand(estimate: Double, varPoisson: Double, varPps: Double)

  final case class IpswInference(
      gamma: Array[Double],
      beta: Array[Double],
      betaVarPoisson: Array[Double],
      betaVarPps: Array[Double],
      lambda: Map[Double, Estimand],
      gail: Map[Double, Estimand],
      absRisk: Map[Double, Estimand],
      absRiskGail: Map[Double, Estimand])

  /** @param cohort  non-probability cohort (t, d, covariates)
    * @param survey  probability sample with design weight `surveyWt`
    * @param psFeatureCols propensity-model covariates (intercept added)
    * @param a       sampling fraction n_s/N scaling the survey side of
    *                the propensity stack (jk_fun.R:123-127)
    * @param x0      risk profile (same order as featureCols) for absR
    */
  def ipswChain(
      cohort: DataFrame, survey: DataFrame, surveyWt: Column,
      time: Column, event: Column,
      featureCols: Seq[String], psFeatureCols: Seq[String],
      tStar: Seq[Double],
      lambdaStar: Option[DataFrame] = None,
      x0: Option[Array[Double]] = None,
      a: Double = 1.0,
      sizeHint: graft.core.Windows.SizeHint =
        graft.core.Windows.SizeHint.Auto,
      // pinned iteration counts (0 ⇒ run to convergence) let a DuckDB
      // oracle replay the identical fixed-point arithmetic
      psIters: Int = 0,
      coxIters: Int = 0): IpswInference = {
    val p = featureCols.length
    val q = psFeatureCols.length + 1
    val psFeats = FeatureArray.withIntercept(psFeatureCols.map(col))

    // 1. propensity fit on the a-scaled stack
    val stacked = SurveyIntegration.stack(cohort, survey, surveyWt)
      .withColumn("__wps", when(col("trt") === 1, 1.0)
        .otherwise(col("w").cast("double") * a))
      .persist()
    val psFit =
      if (psIters > 0) WeightedGLM.logistic(stacked, psFeats, col("trt"),
        col("__wps"), p = q, maxIter = psIters, tol = 0.0)
      else WeightedGLM.logistic(stacked, psFeats, col("trt"), col("__wps"), p = q)
    val gammaDevExprs = Influence.logisticDeviates(psFit, psFeats,
      col("trt"), col("__wps"))

    // 2. cohort pseudo-weights + Cox fit
    val score = FeatureArray.dot(psFeats, psFit.coefficients)
    val withW = stacked
      .withColumn("__ipsw", when(col("trt") === 1,
        Ipsw.fromLinearPredictor(score, a)).otherwise(lit(0.0)))
      .withColumn("__psw", when(col("trt") === 1, col("__ipsw"))
        .otherwise(col("w").cast("double")))
      .withColumn("__pi", when(col("trt") === 1, lit(1.0) / col("__ipsw"))
        .otherwise(lit(1.0) / col("w").cast("double")))
    val gdCols = gammaDevExprs.zipWithIndex.map { case (c, m0) =>
      c.as(s"__gd$m0") }
    val pgCols = (0 until q).map(m0 =>
      (when(col("trt") === 1, -col("__ipsw") * psFeats.getItem(m0))
        .otherwise(0.0)).as(s"__pg$m0"))
    val prepared = withW.select((withW.columns.map(col) ++ gdCols ++ pgCols): _*)
    val cohortF = prepared.filter(col("trt") === 1)
    val feats = featureCols.map(col)
    val fit =
      if (coxIters > 0) CoxPH.fit(cohortF, time, event, col("__ipsw"), feats,
        maxIter = coxIters, tol = 0.0)
      else CoxPH.fit(cohortF, time, event, col("__ipsw"), feats)

    // 3. influence frame: cohort rows carry the direct score influence,
    //    survey rows join as zero-weight γ-only blocks (the reference's
    //    rbind(…, matrix(0, n_s, …)))
    val pass = Seq(col("trt"), col("__pi"), col("__psw")) ++
      (0 until q).map(m0 => col(s"__gd$m0")) ++
      (0 until q).map(m0 => col(s"__pg$m0"))
    val devC = CoxInfluence.deviates(cohortF, time, event, col("__ipsw"),
      feats, fit.coefficients, fit.infoPacked, passthrough = pass,
      sizeHint = sizeHint)
    // build survey rows with the same schema as devC
    val devCols = devC.columns
    val surveySide = prepared.filter(col("trt") === 0)
    val sCols = surveySide.columns.toSet
    val surveyAligned = surveySide.select(devCols.map {
      case "__t" => time.cast("double").as("__t")
      case "__d" => lit(0.0).as("__d")
      case "__w" => lit(0.0).as("__w")
      case "__rh" => lit(0.0).as("__rh")
      case n if n.startsWith("__x") =>
        col(featureCols(n.stripPrefix("__x").toInt)).cast("double").as(n)
      case n if sCols.contains(n) => col(n)
      // CoxInfluence internals (risk-set/score columns) — inert zeros
      case n => lit(0.0).as(n)
    }: _*)
    val allDev = devC.unionByName(surveyAligned).persist()

    // 4. per-m β deviates: ipsw·I⁻¹U + B·Δγ (cross-derivative through
    //    ∂w̃/∂γ = −ipsw·x_ps; survey rows have U = 0)
    val dExprs = for (j <- 0 until p; m0 <- 0 until q) yield
      sum(col(s"ui_$j") * col(s"__pg$m0")).as(s"d${j}_$m0")
    val dRow = allDev.agg(dExprs.head, dExprs.tail: _*).head()
    val dMat = breeze.linalg.DenseMatrix.tabulate(p, q)((j, m0) =>
      dRow.getDouble(j * q + m0))
    val bMat = LinAlg.inverse(LinAlg.unpack(p, fit.infoPacked)) * dMat
    val dbTot = (0 until p).map { j =>
      (col("__psw") * col("trt") * col(s"dbeta_$j") +
        (0 until q).map(m0 => lit(bMat(j, m0)) * col(s"__gd$m0"))
          .foldLeft(lit(0.0): Column)(_ + _)).as(s"dbeta_m_$j")
    }
    val withDb = allDev.select((allDev.columns.map(col) ++ dbTot): _*)

    // 5. hazard-chain deviates at the same per-m scale
    val risk = x0.map(v => HazardInfluence.RiskProfile(fit.coefficients, v))
    val long = HazardInfluence.cumulativeDeviates(withDb, p, tStar,
      lambdaStar = lambdaStar, risk = risk,
      gamma = Some(HazardInfluence.GammaChain(
        (0 until q).map(m0 => col(s"__pg$m0")),
        (0 until q).map(m0 => col(s"__gd$m0")))),
      betaDevPrefix = "dbeta_m_",
      directScale = col("__psw") * col("trt"),
      sizeHint = sizeHint,
      passthrough = Seq(col("trt"), col("__pi"), col("__psw"))).persist()

    // 6. contractions: Poisson Σ(1−π)Δ² over both samples; PPS
    //    n·cov per sample summed (taylor_deviate.R:109-111)
    def contract(dcol: String): Map[Double, Estimand] = {
      if (!long.columns.contains(dcol)) return Map.empty
      val pois = long.groupBy(col("t_star"))
        .agg(sum((lit(1.0) - col("__pi")) * col(dcol) * col(dcol)).as("v"))
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      val pps = long.groupBy(col("t_star"), col("trt"))
        .agg((covar_samp(col(dcol), col(dcol)) * count(lit(1))).as("v"))
        .collect()
        .groupBy(_.getDouble(0))
        .map { case (t, rs) => t -> rs.map(r =>
          if (r.isNullAt(2)) 0.0 else r.getDouble(2)).sum }
      val est = long.groupBy(col("t_star"))
        .agg(max(col(dcol.replace("d_", ""))).as("e"))
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      tStar.map(t => t -> Estimand(est(t), pois(t), pps(t))).toMap
    }
    val lam = contract("d_cum_hzd")
    val gail = if (lambdaStar.isDefined) contract("d_cum_gail") else Map.empty[Double, Estimand]
    val absR = if (risk.isDefined) contract("d_abs_risk") else Map.empty[Double, Estimand]
    val absRG = if (risk.isDefined && lambdaStar.isDefined)
      contract("d_abs_risk_gail") else Map.empty[Double, Estimand]

    val bPois = (0 until p).map { j =>
      withDb.agg(sum((lit(1.0) - col("__pi")) *
        col(s"dbeta_m_$j") * col(s"dbeta_m_$j"))).head().getDouble(0)
    }.toArray
    val bPps = (0 until p).map { j =>
      withDb.groupBy(col("trt"))
        .agg((covar_samp(col(s"dbeta_m_$j"), col(s"dbeta_m_$j")) *
          count(lit(1))).as("v"))
        .agg(sum(col("v"))).head().getDouble(0)
    }.toArray

    long.unpersist(blocking = false)
    allDev.unpersist(blocking = false)
    stacked.unpersist(blocking = false)
    IpswInference(psFit.coefficients, fit.coefficients, bPois, bPps,
      lam, gail, absR, absRG)
  }
}
