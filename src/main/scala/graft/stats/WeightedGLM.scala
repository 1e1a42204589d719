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
      tol: Double = 1e-9): Fit =
    irls(df, features, label, weight, p, maxIter, tol) { eta =>
      val mu = lit(1.0) / (lit(1.0) + exp(-eta))
      (mu, mu * (lit(1.0) - mu))
    }

  /** Weighted Poisson GLM (log link) — the rate-model sibling of
    * [[logistic]] (the parametric form behind the reference's
    * event-rate modeling, absrisk_fun.R): μ = exp(η), working weight
    * w·μ, score w·(y − μ). Same two-phase IRLS shape: ONE distributed
    * aggregate per iteration, driver-side p×p solve. */
  def poisson(
      df: DataFrame,
      features: Column,
      label: Column,
      weight: Column,
      p: Int,
      maxIter: Int = 50,
      tol: Double = 1e-9): Fit =
    irls(df, features, label, weight, p, maxIter, tol) { eta =>
      val mu = exp(eta)
      (mu, mu)
    }

  /** Shared IRLS driver: `family(η)` returns (μ, Var(μ)) as columns —
    * the mean and the working-weight variance function at the current
    * linear predictor. */
  private def irls(
      df: DataFrame,
      features: Column,
      label: Column,
      weight: Column,
      p: Int,
      maxIter: Int,
      tol: Double)(family: Column => (Column, Column)): Fit = {
    // flatten the feature array to scalar columns once so every IRLS
    // pass is a plain codegen'd hash aggregate (the typed-Aggregator
    // formulation paid encoder deserialization per row per iteration —
    // measured several× slower on wide inputs)
    val cached = df.select(((0 until p).map(i =>
        features.getItem(i).cast("double").as(s"__f$i")) ++
      Seq(label.cast("double").as("__y"), weight.cast("double").as("__w"))): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // leaf-plan view of the cache: each IRLS pass re-plans a one-node
    // tree instead of re-analyzing the caller's full upstream lineage
    val flat = org.apache.spark.sql.GraftSqlBridge.flattenPlan(cached)

    val tri = p * (p + 1) / 2
    val pairs = for (i <- 0 until p; j <- i until p) yield (i, j)
    var beta = new Array[Double](p)
    var iter = 0
    var converged = false
    var lastHessian = new Array[Double](tri)
    while (iter < maxIter && !converged) {
      // β enters as referenced values (functions.Coef.at), not inlined
      // literals: the generated code is identical every iteration (and
      // across same-p fits), so only iteration 1 ever pays a Janino
      // compile. Reads the same double the literal held — the fixed
      // point is bit-identical.
      val eta = (0 until p).map(i =>
          graft.functions.Coef.at(beta, i) * col(s"__f$i"))
        .foldLeft(lit(0.0): Column)(_ + _)
      val (mu, varFn) = family(eta)
      val sWgt = col("__w") * varFn
      val resid = col("__w") * (col("__y") - mu)
      val aggs = pairs.map { case (i, j) =>
        sum(sWgt * col(s"__f$i") * col(s"__f$j")).as(s"h${i}_$j") } ++
        (0 until p).map(i => sum(resid * col(s"__f$i")).as(s"g$i"))
      val row = flat.agg(aggs.head, aggs.tail: _*).head()
      lastHessian = (0 until tri).map(row.getDouble).toArray
      val grad = (0 until p).map(i => row.getDouble(tri + i)).toArray
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
    cached.unpersist(blocking = false)
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
