package graft.stats

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.core.{LinAlg, NormalEqAgg}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder}

/** Design-weighted GLMs (SURVEY.md M1/M3).
  *
  * M1: weighted logistic regression — the reference's
  * `svyglm(trt ~ ..., family=binomial)` propensity / outcome models
  * (simu_fun.R:29-31,67-68; taylor_deviate.R:8). Implemented as explicit
  * IRLS: each iteration is ONE distributed pass (a custom typed
  * aggregate computing the p×p Hessian and p-gradient at the current β)
  * followed by a driver-side Breeze solve. p ≤ ~6, ~8 iterations —
  * O(iterations) shuffle-free scans over a cached input, never a
  * per-row collect.
  *
  * M3: weighted least squares — the imputation model
  * `lm(t_delta ~ x1*x2)` (calib_simu_noninf0315.R:82): single-pass
  * normal equations + driver solve.
  */
object WeightedGLM {

  final case class Fit(
      coefficients: Array[Double],
      iterations: Int,
      converged: Boolean,
      hessianPacked: Array[Double]) {
    def predictEta(features: Column): Column =
      graft.core.FeatureArray.dot(features, coefficients)
    def predictProb(features: Column): Column =
      graft.core.FeatureArray.sigmoid(predictEta(features))
  }

  /** One IRLS pass: at fixed β accumulate
    * [ Σ w·μ(1-μ)·x xᵀ | Σ w·(y-μ)·x | Σ w | deviance-ish ]. */
  private class LogisticIterAgg(p: Int, beta: Array[Double])
      extends Aggregator[(Seq[Double], Double, Double), Array[Double], Array[Double]] {
    private val tri = p * (p + 1) / 2
    private val len = tri + p + 1

    override def zero: Array[Double] = new Array[Double](len)

    override def reduce(b: Array[Double], in: (Seq[Double], Double, Double)): Array[Double] = {
      val (xs, y, w) = in
      val x = xs.toArray
      var eta = 0.0
      var i = 0
      while (i < p) { eta += beta(i) * x(i); i += 1 }
      val mu = 1.0 / (1.0 + math.exp(-eta))
      val s = w * mu * (1.0 - mu)
      val r = w * (y - mu)
      var k = 0
      i = 0
      while (i < p) {
        val sxi = s * x(i)
        var j = i
        while (j < p) { b(k) += sxi * x(j); k += 1; j += 1 }
        b(tri + i) += r * x(i)
        i += 1
      }
      b(tri + p) += w
      b
    }

    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0; while (i < len) { a(i) += b(i); i += 1 }; a
    }
    override def finish(b: Array[Double]): Array[Double] = b
    override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  }

  /** Fit weighted logistic regression of `label` (0/1) on the feature
    * array column `features` (length p, intercept included by caller)
    * with per-row weights `weight`. Input is projected once and should
    * be cheap to rescan (caller may persist). */
  def logistic(
      df: DataFrame,
      features: Column,
      label: Column,
      weight: Column,
      p: Int,
      maxIter: Int = 50,
      tol: Double = 1e-9): Fit = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(features.cast("array<double>"), label.cast("double"), weight.cast("double"))
      .as[(Seq[Double], Double, Double)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var beta = new Array[Double](p)
    var iter = 0
    var converged = false
    var lastHessian = new Array[Double](p * (p + 1) / 2)
    while (iter < maxIter && !converged) {
      val buf = ds.select(new LogisticIterAgg(p, beta).toColumn).head()
      val tri = p * (p + 1) / 2
      lastHessian = buf.slice(0, tri)
      val grad = buf.slice(tri, tri + p)
      val step = LinAlg.solvePacked(p, lastHessian, grad)
      var i = 0
      var maxStep = 0.0
      while (i < p) {
        beta(i) += step(i)
        maxStep = math.max(maxStep, math.abs(step(i)))
        i += 1
      }
      iter += 1
      converged = maxStep < tol
    }
    ds.unpersist(blocking = false)
    Fit(beta, iter, converged, lastHessian)
  }

  /** Weighted least squares: solve (X'WX) β = X'Wy in one pass. */
  def wls(df: DataFrame, features: Column, y: Column, weight: Column, p: Int): Fit = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(features.cast("array<double>"), y.cast("double"), weight.cast("double"))
      .as[(Seq[Double], Double, Double)]
    val buf = ds.select(NormalEqAgg.column(p)).head()
    val res = NormalEqAgg.Result(p, buf)
    val beta = LinAlg.solvePacked(p, res.gram, res.xy)
    Fit(beta, 1, converged = true, res.gram)
  }

  /** Weighted mean of y: Σw·y / Σw (A3; svymean, simu_fun.R:315). */
  def weightedMean(df: DataFrame, y: Column, weight: Column): Double = {
    val r = df.agg(
      sum(weight * y).cast("double").as("swy"),
      sum(weight).cast("double").as("sw")).head()
    r.getDouble(0) / r.getDouble(1)
  }
}
