package graft.hazard

import graft.core.{AsOf, Windows}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Gail attributable-risk cumulative hazard (SURVEY.md M11) — the
  * reference's `LambdaG_w` / `gail_h`
  * (taylor_deviate.R:903-929,1067-1123):
  *
  *   ΛG(t*) = Σ_{u <= t*} λ*(u) · (1 − ar(u))
  *
  * where λ*(u) is a population reference hazard step function and ar(u)
  * the sample attributable risk. The two step functions live on
  * different time grids: full-outer-join on t, LOCF both series (the
  * reference's merge + `rep(ar[cmp_t_indx], rep_time)` gap fill), then
  * prefix-cumsum of the product and an as-of lookup at t*.
  */
object GailHazard {

  /** @param lambdaStar (t, lambda_star) population hazard steps
    * @param ar         (t, ar) sample attributable-risk steps
    */
  def cumulativeSteps(lambdaStar: DataFrame, ar: DataFrame): DataFrame = {
    val l = lambdaStar.select(col(lambdaStar.columns.head).cast("double").as("t"),
      col(lambdaStar.columns(1)).cast("double").as("lambda_star"))
    val a = ar.select(col(ar.columns.head).cast("double").as("t"),
      col(ar.columns(1)).cast("double").as("ar"))
    // λ* is a POINT MASS at its own grid times; flag them before LOCF so
    // ar-only rows never double-count a carried-forward λ*.
    val joined = l.join(a, Seq("t"), "full_outer")
      .withColumn("is_step", col("lambda_star").isNotNull)
    val filled = AsOf.locfPartitioned(joined, col("t"), Seq("lambda_star", "ar"))
      .na.fill(Map("ar" -> 0.0))
    val masses = filled.withColumn("g",
      when(col("is_step"), col("lambda_star") * (lit(1.0) - col("ar")))
        .otherwise(lit(0.0)))
    Windows.scan(masses, Seq(col("t")), Seq(col("g") -> "cum_gail"))
      .select(col("t"), col("cum_gail"))
  }

  def at(lambdaStar: DataFrame, ar: DataFrame, tStar: Seq[Double]): DataFrame =
    AsOf.lookup(cumulativeSteps(lambdaStar, ar), col("t"), col("cum_gail"), tStar)
      .withColumnRenamed("value", "cum_gail")
}
