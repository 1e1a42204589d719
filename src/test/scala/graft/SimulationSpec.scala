package graft

import graft.pipeline.Simulation
import org.apache.spark.sql.functions._

/** The reference's main entry point (§3.1): Monte-Carlo replicates of
  * the sampling → pseudo-weighting → estimation battery against a known
  * population truth, emitting the tall results frame — including the
  * full 16-method battery (jk_fun.R:79-170) and the informative-sampling
  * twin (calib_simu_inf0315.R).
  */
class SimulationSpec extends SparkSpec {

  private val fullMethods = Set("naive", "cht", "svy", "ipsw") ++
    (1 to 3).flatMap(i => Seq(s"calib.d$i", s"calib_ipsw.d$i",
      s"imp.d$i", s"imp_calib_ipsw.d$i")) + "truth"

  test("Monte-Carlo driver: tall results, reproducible, methods near truth") {
    val res = Simulation.run(spark,
      Simulation.Config(populationSize = 20000, nSimu = 2)).persist()

    // schema + completeness: every (simu, method) carries betas + curves
    assert(res.columns.toSeq == Seq("simu_id", "method", "param", "value"))
    val methods = res.select("method").distinct().collect().map(_.getString(0)).toSet
    assert(methods == Set("naive", "cht", "svy", "ipsw", "truth"))
    val perSim = res.groupBy("simu_id").count().collect().map(_.getLong(1)).toSet
    assert(perSim.size == 1, "replicates must emit identical result shapes")

    // estimates finite and reproducible (same seeds → same values)
    assert(res.filter(col("value").isNull || isnan(col("value"))).count() == 0)
    val again = Simulation.run(spark,
      Simulation.Config(populationSize = 20000, nSimu = 2))
    val diff = res.as("a").join(again.as("b"),
        Seq("simu_id", "method", "param"))
      .filter(abs(col("a.value") - col("b.value")) > 1e-12).count()
    assert(diff == 0, "simulation must be bit-reproducible")

    // ipsw-corrected β should be near the population truth fit
    val truthB = res.filter(col("method") === "truth" && col("param") === "beta3")
      .agg(avg("value")).head().getDouble(0)
    val ipswB = res.filter(col("method") === "ipsw" && col("param") === "beta3")
      .agg(avg("value")).head().getDouble(0)
    assert(math.abs(ipswB - truthB) < 0.25, s"ipsw=$ipswB truth=$truthB")
    res.unpersist(blocking = false)
  }

  test("full 16-method battery emits complete, finite estimates per slot") {
    val res = Simulation.run(spark, Simulation.Config(
      populationSize = 15000, nCohort = 500, nSurvey = 300, nSimu = 1,
      fullBattery = true)).persist()
    val methods = res.select("method").distinct().collect().map(_.getString(0)).toSet
    assert(methods == fullMethods, s"missing: ${fullMethods -- methods}")
    assert(res.filter(col("value").isNull || isnan(col("value"))).count() == 0)
    // every non-truth method carries 3 betas + Λ/ΛG/absR at 3 t* each
    val counts = res.filter(col("method") =!= "truth")
      .groupBy("method").count().collect().map(r => r.getString(0) -> r.getLong(1))
    counts.foreach { case (m, n) =>
      assert(n == 3 + 3 * 3, s"method $m emitted $n params")
    }

    // weighted/corrected β near the truth; the aggressive-error
    // scenarios (d2, d3 add δ≈10 to event times) are repaired by
    // calibration back toward the true-outcome fit
    val byMp = res.groupBy("method", "param").agg(avg("value").as("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for (j <- 1 to 3) {
      val truth = byMp(("truth", s"beta$j"))
      for (m <- Seq("cht", "ipsw", "calib.d1", "imp.d1"))
        assert(math.abs(byMp((m, s"beta$j")) - truth) < 0.3,
          s"$m beta$j=${byMp((m, s"beta$j"))} truth=$truth")
    }
    res.unpersist(blocking = false)
  }

  test("informative design: weighted estimators repair the naive bias") {
    import spark.implicits._
    // Under the informative cohort design (odds ∝ exp(−0.75·d − 0.2·x2·d))
    // events are strongly undersampled: the naive event prevalence is
    // biased low while the Horvitz-Thompson weighted prevalence is not.
    val pop = graft.sampling.Population.generate(spark, 20000).persist()
    val popPrev = pop.agg(avg(col("d").cast("double"))).head().getDouble(0)
    val odds = exp(col("x1") * -0.15 + col("d") * -0.75 +
      col("x2") * 0.1 + col("x2") * col("d") * -0.2)
    val cohort = graft.sampling.Pps.draw(pop.withColumn("msize", odds),
      col("id"), col("msize"), n = 600, salt = 1001L)
    val r = cohort.agg(
      avg(col("d").cast("double")),
      (sum(col("wt") * col("d")) / sum(col("wt")))).head()
    val naivePrev = r.getDouble(0); val htPrev = r.getDouble(1)
    pop.unpersist(blocking = false)
    assert(naivePrev < popPrev * 0.8,
      s"design not informative: naive=$naivePrev pop=$popPrev")
    assert(math.abs(htPrev - popPrev) < 0.35 * popPrev,
      s"HT prevalence off: ht=$htPrev pop=$popPrev")

    // and the full driver runs under the informative flag with weighted
    // β still near truth
    val res = Simulation.run(spark, Simulation.Config(
      populationSize = 15000, nCohort = 500, nSurvey = 300, nSimu = 1,
      informative = true)).persist()
    assert(res.filter(col("value").isNull || isnan(col("value"))).count() == 0)
    // the outcome-dependent PS variant (fm_ps = trt~x1+x2*d, ipsw.0)
    // must be fit under the informative design
    val methods = res.select("method").distinct().collect()
      .map(_.getString(0)).toSet
    assert(methods.contains("ipsw.0"), s"got $methods")
    val byMp = res.groupBy("method", "param").agg(avg("value").as("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for (j <- 1 to 3) {
      assert(math.abs(byMp(("cht", s"beta$j")) - byMp(("truth", s"beta$j"))) < 0.3)
      assert(math.abs(byMp(("ipsw.0", s"beta$j")) - byMp(("truth", s"beta$j"))) < 0.3,
        s"ipsw.0 beta$j=${byMp(("ipsw.0", s"beta$j"))}")
    }
    res.unpersist(blocking = false)
  }

  test("seed-table-keyed replicates: bit-reproducible, seeds drive the draws") {
    import graft.sources.SeedTable
    // an R-format seed.txt (calib_simu_noninf0315.R:14-19); row k seeds
    // replicate k's cohort/survey RNG streams (simu_fun.R:389-390)
    val tmp = java.nio.file.Files.createTempDirectory("graft-simu-seed")
    val file = tmp.resolve("seed.txt")
    java.nio.file.Files.writeString(file,
      "\"seed1\" \"seed2\"\n9158.0 223.0\n4717.0 8381.0\n")
    val seeds = SeedTable.read(spark, file.toString)
    val cfg = Simulation.Config(populationSize = 12000, nCohort = 400,
      nSurvey = 250, nSimu = 2, seedTable = Some(seeds))
    val res = Simulation.run(spark, cfg).persist()
    assert(res.filter(col("value").isNull || isnan(col("value"))).count() == 0)

    // same seed table → bit-identical results
    val again = Simulation.run(spark, cfg)
    val diff = res.as("a").join(again.as("b"), Seq("simu_id", "method", "param"))
      .filter(abs(col("a.value") - col("b.value")) > 0.0).count()
    assert(diff == 0, "seeded simulation must be bit-reproducible")

    // different seeds → different samples → different (non-truth) estimates
    val other = Simulation.run(spark, cfg.copy(seedTable = None))
    val same = res.as("a").join(other.as("b"), Seq("simu_id", "method", "param"))
      .filter(col("method") =!= "truth")
      .filter(abs(col("a.value") - col("b.value")) === 0.0).count()
    val tot = res.filter(col("method") =!= "truth").count()
    assert(same < tot, "seed table had no effect on the draws")
    res.unpersist(blocking = false)
  }

  test("informative full battery fits all four PS formulas + .t twins") {
    val res = Simulation.run(spark, Simulation.Config(
      populationSize = 10000, nCohort = 400, nSurvey = 250, nSimu = 1,
      informative = true, fullBattery = true)).persist()
    val methods = res.select("method").distinct().collect()
      .map(_.getString(0)).toSet
    val want = Set("naive", "cht", "svy", "ipsw", "truth") ++
      (0 to 3).map(i => s"ipsw.$i") ++
      (1 to 3).flatMap(i => Seq(s"calib.d$i", s"calib_ipsw.d$i",
        s"imp.d$i", s"imp_calib_ipsw.d$i",
        s"calib_ipsw_t.d$i", s"imp_calib_ipsw_t.d$i"))
    assert(methods == want, s"missing: ${want -- methods} extra: ${methods -- want}")
    assert(res.filter(col("value").isNull || isnan(col("value"))).count() == 0)
    // all four PS variants correct the informative design bias for the
    // error-free covariate effect
    val byMp = res.groupBy("method", "param").agg(avg("value").as("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for (i <- 0 to 3)
      assert(math.abs(byMp((s"ipsw.$i", "beta3")) - byMp(("truth", "beta3"))) < 0.35,
        s"ipsw.$i beta3=${byMp((s"ipsw.$i", "beta3"))}")
    res.unpersist(blocking = false)
  }
}
