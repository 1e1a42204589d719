package graft.sampling

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Stratified-design sample allocation.
  *
  * The reference draws stratified/PPS samples with externally chosen
  * sizes (`simu_fun.R:389-467`); Neyman allocation is how those sizes
  * are chosen in practice: n_h proportional to N_h * S_h (stratum size
  * times stratum standard deviation) minimizes the variance of the
  * stratified mean at fixed total n. Proportional allocation
  * (n_h ∝ N_h) is the baseline it beats.
  *
  * One hash aggregate per stratum computes (N_h, S_h) from explicit
  * power sums; the stratum table is dimension-sized, so the total-n
  * normalization joins back via broadcast.
  */
object Allocation {

  /** One row per stratum: (N_h, S_h, n_neyman, n_prop) for a total
    * sample size of `nTotal`. Strata with undefined S_h (singleton)
    * are dropped — they cannot receive a Neyman share.
    */
  def neyman(df: DataFrame, stratum: Column, y: Column, nTotal: Long,
      stratumName: String): DataFrame = {
    val s = df.select(stratum.as(stratumName), y.cast("double").as("y"))
      .groupBy(col(stratumName))
      .agg(count(lit(1)).as("nh"), sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("sy2"))
      .filter(col("nh") > 1)
      .withColumn("nhd", col("nh").cast("double"))
      .withColumn("sh", sqrt(
        (col("sy2") - col("sy") * col("sy") / col("nhd")) / (col("nhd") - 1)))
    val tot = s.agg(sum(col("nhd") * col("sh")).as("denom"),
      sum(col("nhd")).as("ntot"))
    s.crossJoin(broadcast(tot))
      .select(
        col(stratumName),
        col("nh"),
        col("sh"),
        round(lit(nTotal.toDouble) * col("nhd") * col("sh") / col("denom"), 0)
          .cast("long").as("n_neyman"),
        round(lit(nTotal.toDouble) * col("nhd") / col("ntot"), 0)
          .cast("long").as("n_prop"))
  }
}
