package graft

import graft.pipeline.Simulation
import org.apache.spark.sql.functions._

/** The reference's main entry point (§3.1): Monte-Carlo replicates of
  * the sampling → pseudo-weighting → estimation battery against a known
  * population truth, emitting the tall results frame.
  */
class SimulationSpec extends SparkSpec {

  test("Monte-Carlo driver: tall results, methods near truth") {
    val res = Simulation.run(spark,
      Simulation.Config(populationSize = 20000, nSimu = 2)).persist()

    // schema + completeness: every (simu, method) carries betas + curves
    assert(res.columns.toSeq == Seq("simu_id", "method", "param", "value"))
    val methods = res.select("method").distinct().collect().map(_.getString(0)).toSet
    assert(methods == Set("naive", "ipsw", "svy_wtd", "truth"))
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
}
