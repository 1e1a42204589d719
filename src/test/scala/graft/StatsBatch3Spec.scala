package graft

import graft.hazard.CompetingRisks
import graft.stats.{Isotonic, Pca}
import org.apache.spark.sql.functions._

/** Fixtures for the third statistical batch: Aalen–Johansen competing
  * risks (hand-computed tiny sample + the KM/CIF adding-up identity)
  * and the power-iteration PCA (checked against a matrix with a known
  * dominant eigenpair).
  */
class StatsBatch3Spec extends SparkSpec {
  import spark.implicits._

  test("Aalen-Johansen matches the hand-computed two-cause curve") {
    // n=4: t=1 cause1; t=2 cause2; t=3 censored; t=4 cause1
    // t=1: n=4, S(1-)=1,    cif1 = 1/4
    // t=2: n=3, S(2-)=3/4,  cif2 = (3/4)(1/3) = 1/4
    // t=4: n=1 — dropped by the all-fail guard (d = n_risk)
    val df = Seq((1.0, 1), (2.0, 2), (3.0, 0), (4.0, 1)).toDF("t", "cause")
    val aj = CompetingRisks.aalenJohansen(df, col("t"), col("cause"))
      .orderBy("t").collect()
    assert(aj.length == 2)
    assertNear(aj(0).getAs[Double]("cif1"), 0.25)
    assertNear(aj(0).getAs[Double]("cif2"), 0.0)
    assertNear(aj(1).getAs[Double]("s_prev"), 0.75)
    assertNear(aj(1).getAs[Double]("cif1"), 0.25)
    assertNear(aj(1).getAs[Double]("cif2"), 0.25)
  }

  test("Aalen-Johansen adding-up: S(t) + CIF1(t) + CIF2(t) = 1 sans censoring") {
    // without censoring the all-cause KM and the two CIFs partition
    // probability mass exactly at every event time
    val df = Seq(
      (1.0, 1), (1.0, 2), (2.0, 1), (3.0, 2), (3.0, 1), (5.0, 2),
      (6.0, 1), (7.0, 2), (8.0, 1), (9.0, 2))
      .toDF("t", "cause")
    val aj = CompetingRisks.aalenJohansen(df, col("t"), col("cause"))
      .withColumn("s_t",
        col("s_prev") * (lit(1.0) - (col("d1") + col("d2")) / col("n_risk")))
      .select(col("s_t") + col("cif1") + col("cif2"))
      .collect()
    aj.foreach(r => assertNear(r.getDouble(0), 1.0))
  }

  test("Aalen-Johansen: all-censored frame yields an empty step table") {
    val df = Seq((1.0, 0), (2.0, 0), (3.0, 0)).toDF("t", "cause")
    assert(CompetingRisks.aalenJohansen(df, col("t"), col("cause")).count() == 0)
  }

  test("Aalen-Johansen: distributed scan path == single-window path") {
    // m36 harmonized onto Windows.scan (r11): a continuous-time frame
    // whose collapsed axis exceeds nothing — force both paths via the
    // size hint and demand agreement at the query's round-8 contract
    val rng = new scala.util.Random(11)
    val df = (1 to 4000).map { _ =>
      (math.rint(rng.nextDouble() * 4000) / 4.0, rng.nextInt(3))
    }.toDF("t", "cause")
    def run(h: graft.core.Windows.SizeHint) =
      CompetingRisks.aalenJohansen(df, col("t"), col("cause"), h)
        .orderBy("t").collect()
    val small = run(graft.core.Windows.SizeHint.Small)
    val large = run(graft.core.Windows.SizeHint.Large)
    assert(small.length == large.length && small.nonEmpty)
    small.zip(large).foreach { case (s, l) =>
      assert(s.getDouble(0) == l.getDouble(0))
      assertNear(s.getAs[Double]("n_risk"), l.getAs[Double]("n_risk"), 1e-9)
      assertNear(s.getAs[Double]("s_prev"), l.getAs[Double]("s_prev"), 1e-8)
      assertNear(s.getAs[Double]("cif1"), l.getAs[Double]("cif1"), 1e-8)
      assertNear(s.getAs[Double]("cif2"), l.getAs[Double]("cif2"), 1e-8)
    }
  }

  test("Poisson GLM intercept-only recovers ln of the weighted mean") {
    // score 0 at the fixed point: Σw(y − e^b0) = 0 ⟹ b0 = ln(Σwy/Σw)
    val df = Seq((1.0, 2.0), (3.0, 1.0), (5.0, 1.0), (0.0, 2.0))
      .toDF("y", "w")
    val fit = graft.stats.WeightedGLM.poisson(df,
      array(lit(1.0)), col("y"), col("w"), p = 1)
    val want = math.log((1.0 * 2 + 3 + 5 + 0.0 * 2) / 6.0)
    assertNear(fit.coefficients(0), want, 1e-8)
    assert(fit.converged)
  }

  test("isotonic: single bin is its own fit; reversed means pool to one level") {
    val one = Seq((5, 0.4, 2.0), (5, 0.8, 2.0)).toDF("bin", "y", "w")
    val g1 = Isotonic.fit(one, col("bin"), col("y"), col("w")).collect()
    assert(g1.length == 1)
    assertNear(g1(0).getAs[Double]("iso_mean"), 0.6)
    // strictly decreasing input pools everything to the global mean
    val dec = Seq((0, 0.9, 1.0), (1, 0.5, 1.0), (2, 0.1, 1.0))
      .toDF("bin", "y", "w")
    Isotonic.fit(dec, col("bin"), col("y"), col("w")).collect()
      .foreach(r => assertNear(r.getAs[Double]("iso_mean"), 0.5))
  }

  test("isotonic minimax formula equals hand-run PAVA") {
    // bins with raw means 0.2, 0.5, 0.3, 0.6 and weights 1, 1, 2, 1:
    // PAVA pools bins 1,2 (violation 0.5 > 0.3 backwards): pooled mean
    // (0.5*1 + 0.3*2)/3 = 1.1/3; final curve 0.2, 1.1/3, 1.1/3, 0.6
    val df = Seq(
      (0, 0.2, 1.0), (1, 0.5, 1.0), (2, 0.3, 2.0), (3, 0.6, 1.0))
      .toDF("bin", "y", "w")
    val got = Isotonic.fit(df, col("bin"), col("y"), col("w"))
      .orderBy("bin").collect()
    assertNear(got(0).getAs[Double]("iso_mean"), 0.2)
    assertNear(got(1).getAs[Double]("iso_mean"), 1.1 / 3.0)
    assertNear(got(2).getAs[Double]("iso_mean"), 1.1 / 3.0)
    assertNear(got(3).getAs[Double]("iso_mean"), 0.6)
    // already-monotone input is a fixed point
    val mono = Seq((0, 0.1, 1.0), (1, 0.4, 3.0), (2, 0.9, 2.0))
      .toDF("bin", "y", "w")
    Isotonic.fit(mono, col("bin"), col("y"), col("w"))
      .orderBy("bin").collect()
      .zip(Seq(0.1, 0.4, 0.9))
      .foreach { case (r, want) =>
        assertNear(r.getAs[Double]("iso_mean"), want) }
  }

  test("power iteration recovers a known dominant eigenpair") {
    // x0 = N(0, sd 3) direction, x1 = x0/2 + noise, x2 independent small:
    // instead of sampling, feed points whose sample covariance is exactly
    // [[8,2,0],[2,5,0],[0,0,1]] — dominant eigenpair: λ=9, v ∝ (2,1,0)
    // Construct 4 points with that covariance: rows of sqrt-scaled ±1
    // designs. Sample covariance of {(a,b,c) and sign flips} is diagonal
    // of squares — instead just check the iteration math on a frame whose
    // covariance Spark computes, and compare against a brute-force 3×3
    // eigen solve done here in the test.
    val pts = Seq(
      (3.0, 1.0, 0.5), (-3.0, -1.0, -0.5), (1.0, 2.0, -0.5),
      (-1.0, -2.0, 0.5), (2.0, -1.0, 1.0), (-2.0, 1.0, -1.0))
    val df = pts.toDF("x0", "x1", "x2")
    val got = Pca.topComponent(df, Seq(col("x0"), col("x1"), col("x2")), 60)
      .collect()(0)
    // brute-force reference: covariance then many-iteration power method
    // with a different start vector — agreement proves convergence to the
    // dominant eigenpair rather than to the start direction
    val n = pts.length
    val m = Array(
      pts.map(_._1).sum / n, pts.map(_._2).sum / n, pts.map(_._3).sum / n)
    val xs = pts.map(p => Array(p._1 - m(0), p._2 - m(1), p._3 - m(2)))
    val a = Array.ofDim[Double](3, 3)
    for (i <- 0 until 3; j <- 0 until 3)
      a(i)(j) = xs.map(r => r(i) * r(j)).sum / (n - 1)
    var v = Array(1.0, 0.0, 0.0)
    for (_ <- 1 to 200) {
      val w = Array.tabulate(3)(i => (0 until 3).map(j => a(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
    }
    val lam = (0 until 3).map(i =>
      v(i) * (0 until 3).map(j => a(i)(j) * v(j)).sum).sum
    assertNear(got.getAs[Double]("eigval"), lam, 1e-6)
    val sgn = if (v(0) < 0) -1.0 else 1.0
    assertNear(got.getAs[Double]("v1"), sgn * v(0), 1e-6)
    assertNear(got.getAs[Double]("v2"), sgn * v(1), 1e-6)
    assertNear(got.getAs[Double]("v3"), sgn * v(2), 1e-6)
  }
}
