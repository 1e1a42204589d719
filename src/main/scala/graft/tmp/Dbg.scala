package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    val li = graft.core.Tables(spark, d, "lineitem")
      .filter(col("l_orderkey") % 50 === 0)
    def side(m: Int) = li.filter(col("l_suppkey") % 2 === m).select(
      (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("uid"),
      col("l_quantity").cast("double").as("t"),
      when(col("l_returnflag") =!= "A", 1.0).otherwise(0.0).as("d"),
      (col("l_discount") * 10).cast("double").as("x"),
      (lit(1.0) + col("l_orderkey") % 5).cast("double").as("wt"))
    val cohort = side(0).drop("wt")
    val survey = side(1)
    // replicate kwChain's gamma fit
    val psFeats = graft.core.FeatureArray.withIntercept(Seq(col("x")))
    val stacked = graft.pipeline.SurveyIntegration.stack(
        cohort.withColumn("__cid", col("uid")),
        survey.withColumn("__sid", col("uid")), col("wt"))
      .withColumn("__wps", when(col("trt") === 1, 1.0)
        .otherwise(col("w").cast("double") * 0.3))
    val psFit = graft.stats.WeightedGLM.logistic(stacked, psFeats, col("trt"),
      col("__wps"), p = 2, maxIter = 6, tol = 0.0)
    println("gamma: " + psFit.coefficients.mkString(","))
    val score = graft.core.FeatureArray.dot(psFeats, psFit.coefficients)
    val scored = stacked.withColumn("__q", score)
    val jac = graft.weights.KernelWeights.jacobian(
      scored.filter(col("trt") === 0), col("__sid"), col("__q"),
      col("w").cast("double"),
      scored.filter(col("trt") === 1), col("__cid"), col("__q"), 0.4,
      sFeatures = (0 until 2).map(m0 => psFeats.getItem(m0)),
      cFeatures = (0 until 2).map(m0 => psFeats.getItem(m0)))
    val agg = jac.agg(count(lit(1)), sum(col("kw")), min(col("kw")),
      max(col("kw"))).head()
    println(s"jac rows=${agg.getLong(0)} kwSum=${agg.getDouble(1)} " +
      s"min=${agg.getDouble(2)} max=${agg.getDouble(3)}")
    println("cohort units = " + scored.filter(col("trt") === 1).count())
    jac.coalesce(1).write.mode("overwrite").parquet("/tmp/dbg_jac")
    // also the full chain beta
    val inf = graft.pipeline.TaylorInference.kwChain(
      cohort, col("uid"), survey, col("uid"), col("wt"),
      col("t"), col("d"),
      Seq("x"), Seq("x"), Seq(10.0, 20.0, 30.0, 40.0, 50.0),
      a = 0.3, bandwidth = Some(0.4), psIters = 6, coxIters = 4,
      sizeHint = graft.core.Windows.SizeHint.Small)
    println("chain beta = " + inf.beta(0))
    spark.stop()
  }
}
