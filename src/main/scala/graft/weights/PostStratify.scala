package graft.weights

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Post-stratification calibration (SURVEY.md M6) — the reference's
  * `post.f` (taylor_deviate.R:957-982) and the cell-weighting at
  * simu_fun.R:215-229.
  *
  * Given sample rows with a stratum cell and weight, and known
  * population cell totals Nh: the adjustment factor per cell is
  * f_h = Nh / N̂h where N̂h = Σ_{i∈h} w_i. The reference one-hot-encodes
  * cells into an n×G matrix (`model.matrix(~post.var-1)`) and matrix-
  * multiplies; Spark-first this is a groupBy + broadcast join — G is
  * tiny, the n×G indicator matrix is never materialized (the reference
  * itself refuses the n×n Jacobian: "R vector memory exhausted",
  * taylor_deviate.R:975).
  */
object PostStratify {

  /** @param df        sample
    * @param cell      stratum cell column (any groupable type)
    * @param weight    design weight column
    * @param popTotals (cell, "N_h") population totals — dimension-sized
    * @return df + columns `ps_f` (factor) and `ps_wt` (= weight · f)
    */
  def calibrate(df: DataFrame, cell: Column, weight: Column, popTotals: DataFrame): DataFrame = {
    val hat = df.groupBy(cell.as("__cell"))
      .agg(sum(weight.cast("double")).as("__Nh_hat"))
    val factors = hat.join(popTotals.select(col(popTotals.columns.head).as("__cell"),
        col(popTotals.columns(1)).cast("double").as("__Nh")), Seq("__cell"))
      .select(col("__cell"), (col("__Nh") / col("__Nh_hat")).as("ps_f"))
    df.withColumn("__cell", cell)
      .join(broadcast(factors), Seq("__cell"))
      .withColumn("ps_wt", weight.cast("double") * col("ps_f"))
      .drop("__cell")
  }
}
