package graft.weights

import graft.core.LinAlg
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deville–Särndal bounded (logit-distance) calibration — the
  * range-restricted sibling of GREG (`weights/Greg.scala`) and raking
  * (`weights/Raking.scala`): calibrated weights w_i = d_i · F(x_i'λ)
  * where F is the logistic distance function bounded in [L, U], so no
  * weight is adjusted below L·d_i or above U·d_i (GREG's linear F can
  * go negative; raking's exp F is unbounded above). λ solves the
  * calibration equations Σ w_i x_i = T by Newton.
  *
  * F(u) = (L(U−1) + U(1−L)·z) / ((U−1) + (1−L)·z),  z = e^{A·u},
  * A = (U−L)/((1−L)(U−1));   F(0) = 1, L < F < U, F' > 0.
  *
  * Scale shape (same discipline as the IRLS/GREG drivers): each Newton
  * step is ONE codegen'd hash aggregate over the sample producing a
  * p-vector residual and p×p Jacobian; only those p(p+3)/2 doubles
  * reach the driver. Iteration count is pinned by the caller so a
  * second engine can replay the fixed point exactly.
  */
object BoundedCalib {

  /** Solve for λ over `df` whose calibration variables are the scalar
    * columns `xs` (x₀ is conventionally the intercept 1) with design
    * weight `d`, against population totals `targets`. */
  def solve(df: DataFrame, xs: Seq[Column], d: Column,
      targets: Array[Double], l: Double, u: Double,
      iters: Int): Array[Double] = {
    val p = targets.length
    require(xs.length == p, s"need ${targets.length} x-columns, got ${xs.length}")
    val cols = xs.zipWithIndex.map { case (c, i) => c.cast("double").as(s"x$i") }
    val base = df.select(cols :+ d.cast("double").as("d"): _*).persist()
    try {
      var lambda = Array.fill(p)(0.0)
      for (_ <- 1 to iters) {
        // λ as referenced values, not inlined literals: identical
        // generated code every Newton step → codegen-cache hit after
        // step 1 (functions.Coef.at; bit-identical arithmetic)
        val (fExpr, fpExpr) = distance(
          (0 until p).map(j =>
            col(s"x$j") * graft.functions.Coef.at(lambda, j)).reduce(_ + _), l, u)
        val aggs =
          (0 until p).map(j => sum(col("d") * fExpr * col(s"x$j")).as(s"r$j")) ++
          (for (j <- 0 until p; k <- j until p) yield
            sum(col("d") * fpExpr * col(s"x$j") * col(s"x$k")).as(s"j${j}_$k"))
        val row = base.agg(aggs.head, aggs.tail: _*).head()
        val r = Array.tabulate(p)(j => targets(j) - row.getDouble(j))
        if (p == 2) {
          // closed-form 2×2 step in the EXACT operation order a SQL
          // replay writes it — keeps the two engines' fixed points
          // bit-aligned instead of LU-vs-Cramer ulp drift
          val (j00, j01, j11) = (row.getDouble(2), row.getDouble(3), row.getDouble(4))
          val det = j00 * j11 - j01 * j01
          lambda = Array(lambda(0) + (j11 * r(0) - j01 * r(1)) / det,
            lambda(1) + (j00 * r(1) - j01 * r(0)) / det)
        } else {
          val jm = breeze.linalg.DenseMatrix.zeros[Double](p, p)
          var idx = p
          for (j <- 0 until p; k <- j until p) {
            jm(j, k) = row.getDouble(idx); jm(k, j) = jm(j, k); idx += 1
          }
          val delta = LinAlg.solve(jm, breeze.linalg.DenseVector(r))
          lambda = Array.tabulate(p)(j => lambda(j) + delta(j))
        }
      }
      lambda
    } finally { base.unpersist(); () }
  }

  /** The calibration factor F(x'λ) as a column expression. */
  def factor(xs: Seq[Column], lambda: Array[Double],
      l: Double, u: Double): Column =
    distance(xs.zipWithIndex
      .map { case (c, j) => c.cast("double") * lit(lambda(j)) }
      .reduce(_ + _), l, u)._1

  /** (F(u), F'(u)) for the bounded logit distance. The expression
    * shapes are kept literal-for-literal identical to the oracle SQL
    * (constant subexpressions pre-folded to plain doubles) so both
    * engines evaluate the same IEEE operation sequence. */
  private def distance(uExpr: Column, l: Double, u: Double): (Column, Column) = {
    val a = (u - l) / ((1 - l) * (u - 1))
    val z = exp(lit(a) * uExpr)
    val dEx = lit(u - 1) + lit(1 - l) * z
    val f = (lit(l * (u - 1)) + lit(u * (1 - l)) * z) / dEx
    val fp = lit((1 - l) * (u - 1) * (u - l) * a) * z / (dEx * dEx)
    (f, fp)
  }
}
