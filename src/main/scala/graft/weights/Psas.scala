package graft.weights

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Propensity-score stratification (subclassification) pseudo-weights —
  * "PSAS", the third weighting method the reference's header declares
  * alongside IPSW and KW (simu_fun.R:2 "generate IPSW, PSAS, and KW
  * weights"; simu_fun.R:12 "Choose PS model for PSAS method") but whose
  * body the reference never ships. Implemented from the standard
  * subclassification construction the header names: stratify on the
  * cohort score's G exact quantile groups, then give every cohort unit
  * in stratum h an equal share of the stratum's survey design-weight
  * mass:
  *
  *   psas_c = Σ_{s ∈ h(c)} wt_s / n_{cohort, h(c)}
  *
  * Σ psas = Σ wt over all survey units falling in strata that contain
  * at least one cohort unit — the same mass-conservation contract as KW
  * with rm.s=F (strata are built FROM cohort quantiles, so every
  * stratum contains cohort units by construction; only survey units
  * outside every cohort-occupied stratum are impossible, not dropped).
  *
  * Distributed shape: G−1 exact-percentile scalars to the driver
  * (G ≤ 10 in practice), then the stratum assignment is a codegen'd
  * `when` chain and each side takes ONE hash aggregate over G groups;
  * the G-row factor table broadcast-joins back. No pair stream at all —
  * PSAS is the O(n) sibling of KW's O(pairs).
  */
object Psas {

  /** @param survey (score, wt) side — the probability sample
    * @param cohort (id, score) side — receives pseudo-weights
    * @param g      number of propensity strata (quantile groups)
    * @return (c_id, psas) one row per cohort row */
  def compute(
      survey: DataFrame, sScore: Column, sWt: Column,
      cohort: DataFrame, cId: Column, cScore: Column,
      g: Int): DataFrame = {
    require(g >= 2, s"need at least 2 strata, got $g")
    val c = cohort.select(cId.as("c_id"), cScore.cast("double").as("q"))
    val s = survey.select(sScore.cast("double").as("q"),
      sWt.cast("double").as("wt"))

    // exact quantile breaks on the cohort score: G−1 driver scalars
    // via the radix rank search — exact AND scale-safe (no value-count
    // map over the continuous score domain)
    val probs = (1 until g).map(_.toDouble / g)
    val breaks = graft.stats.WeightedQuantile.interpolatedQuantilesGlobal(
      c, col("q"), lit(1L), probs)

    def stratum(q: Column): Column =
      breaks.zipWithIndex.foldRight(lit(g): Column) {
        case ((b, i), e) => when(q <= b, i + 1).otherwise(e)
      }

    val sTot = s.groupBy(stratum(col("q")).as("h"))
      .agg(sum(col("wt")).as("swt"))
    val cN = c.groupBy(stratum(col("q")).as("h"))
      .agg(count(lit(1)).cast("double").as("n"))
    val factors = cN.join(sTot, Seq("h"), "left")
      .select(col("h"),
        (coalesce(col("swt"), lit(0.0)) / col("n")).as("psas"))

    c.select(col("c_id"), stratum(col("q")).as("h"))
      .join(broadcast(factors), Seq("h"))
      .select(col("c_id"), col("psas"))
  }
}
