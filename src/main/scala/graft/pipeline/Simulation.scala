package graft.pipeline

import graft.sampling.{Population, Pps}
import graft.stats.CoxPH
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Monte-Carlo simulation driver (SURVEY.md §3.1) — the shape of
  * `calib_simu_noninf0315.R`: synthesize a finite population with known
  * PH truth, then for each replicate draw PPS cohort + survey samples,
  * run the pseudo-weight → estimator battery, and emit one TALL result
  * frame keyed by (simu_id, method, param) — the Spark-idiomatic
  * replacement for the reference's 3-D result arrays
  * (`beta_est[simu, coeff, method]`, SURVEY.md §1.1).
  *
  * Per-replicate sample sizes are reference-scaled (n_c=600, n_s=300);
  * replicate seeds derive from the deterministic RNG, mirroring
  * seed.txt's role. The population is built once and persisted; each
  * replicate reuses it (loop-invariant hoisting, the engine-side
  * equivalent of `recal.wt=F` pre-fitting, jk_fun.R:291-313).
  */
object Simulation {

  final case class Config(
      populationSize: Long = 50000,
      nCohort: Int = 600,
      nSurvey: Int = 300,
      nSimu: Int = 3,
      beta: Array[Double] = Array(math.log(-math.log(0.85) / 15.0), 0.2, 0.2, 0.3),
      tStar: Seq[Double] = Seq(5.0, 10.0, 15.0))

  def run(spark: SparkSession, cfg: Config = Config()): DataFrame = {
    import spark.implicits._
    val pop = Population.generate(spark, cfg.populationSize, cfg.beta)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // population truth (the reference's pop fits, calib_simu:113-124)
    val truthFit = CoxPH.fit(pop, col("t"), col("d"), col("w"),
      Seq(col("x1"), col("x2"), col("x3")))

    val results = (1 to cfg.nSimu).flatMap { simu =>
      val cohort = Pps.draw(pop.withColumn("msize", exp(col("x1") / 8.0)),
        col("id"), col("msize"), cfg.nCohort, salt = 1000L + simu).drop("msize")
      val survey = Pps.draw(pop.withColumn("msize", exp(col("x2") / 8.0)),
        col("id"), col("msize"), cfg.nSurvey, salt = 2000L + simu).drop("msize")

      val stacked = SurveyIntegration.stack(cohort, survey, col("wt"))
      val ps = SurveyIntegration.propensityModel(stacked, Seq("x1", "x2", "x3"))
      val withIpsw = SurveyIntegration.withIpsw(cohort, ps)

      val naive = SurveyIntegration.estimatorBattery(cohort,
        col("t"), col("d"), lit(1.0), Seq("x1", "x2", "x3"), cfg.tStar)
      val ipsw = SurveyIntegration.estimatorBattery(withIpsw,
        col("t"), col("d"), col("ipsw"), Seq("x1", "x2", "x3"), cfg.tStar)
      val svyWtd = SurveyIntegration.estimatorBattery(survey,
        col("t"), col("d"), col("wt"), Seq("x1", "x2", "x3"), cfg.tStar)

      def rows(method: String, b: SurveyIntegration.Battery) =
        b.beta.zipWithIndex.map { case (v, j) =>
          (simu, method, s"beta${j + 1}", v)
        } ++ b.lambdaAt.toSeq.map { case (t, v) =>
          (simu, method, s"Lambda@$t", v)
        } ++ b.absRiskAt.toSeq.map { case (t, v) =>
          (simu, method, s"absR@$t", v)
        }

      rows("naive", naive) ++ rows("ipsw", ipsw) ++ rows("svy_wtd", svyWtd) ++
        truthFit.coefficients.zipWithIndex.map { case (v, j) =>
          (simu, "truth", s"beta${j + 1}", v)
        }
    }
    pop.unpersist(blocking = false)
    results.toDF("simu_id", "method", "param", "value")
  }
}
