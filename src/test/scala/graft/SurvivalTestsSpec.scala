package graft

import graft.sampling.Allocation
import graft.stats.{KaplanMeier, RankTests}
import graft.weights.Diagnostics
import org.apache.spark.sql.functions._

/** Fixtures for the nonparametric survival/test batch, hand-computed
  * from the textbook definitions (tiny samples small enough to do the
  * product-limit and hypergeometric arithmetic by hand).
  */
class SurvivalTestsSpec extends SparkSpec {
  import spark.implicits._

  test("Kaplan-Meier matches the hand-computed product-limit curve with ties") {
    // (t, d, w=1): events at 1,1, censor at 2, events at 3, censor at 4
    // n=5. t=1: n_risk=5, d=2 -> S=3/5. t=3: n_risk=2, d=1 -> S=3/5*1/2=0.3
    val df = Seq((1.0, 1.0), (1.0, 1.0), (2.0, 0.0), (3.0, 1.0), (4.0, 0.0))
      .toDF("t", "d").withColumn("w", lit(1.0))
    val km = KaplanMeier.fit(df, col("t"), col("d"), col("w"))
      .orderBy("t").collect()
    assert(km.length == 2)
    assert(km(0).getAs[Double]("t") == 1.0)
    assertNear(km(0).getAs[Double]("n_risk"), 5.0)
    assertNear(km(0).getAs[Double]("surv"), 0.6)
    // Greenwood at t=1: S^2 * d/(n(n-d)) = 0.36 * 2/(5*3) -> se = sqrt(0.048)
    assertNear(km(0).getAs[Double]("se"), math.sqrt(0.36 * 2.0 / 15.0))
    assertNear(km(1).getAs[Double]("surv"), 0.3)
    // cumulative Greenwood: 2/15 + 1/(2*1) = 0.6333...; se = 0.09*0.63333
    assertNear(km(1).getAs[Double]("se"), math.sqrt(0.09 * (2.0 / 15.0 + 0.5)))
  }

  test("weighted Kaplan-Meier uses weighted risk sets") {
    // weights 2 and 1: t=1 event w=2, t=2 censor w=1
    // n_risk(1)=3, dw=2 -> S=1/3
    val df = Seq((1.0, 1.0, 2.0), (2.0, 0.0, 1.0)).toDF("t", "d", "w")
    val km = KaplanMeier.fit(df, col("t"), col("d"), col("w")).collect()
    assert(km.length == 1)
    assertNear(km(0).getAs[Double]("surv"), 1.0 / 3.0)
  }

  test("log-rank test matches the hand-computed hypergeometric terms") {
    // group 1: events at t=1,2 ; group 0: event at t=2, censor at t=3
    // t=1: d1=1 dt=1 n1=2 nt=4 -> e=0.5, v=1*(2/4)*(2/4)*(3/3)=0.25
    // t=2: d1=1 dt=2 n1=1 nt=3 -> e=2/3, v=2*(1/3)*(2/3)*(1/2)=2/9
    val df = Seq((1.0, 1.0, 1), (2.0, 1.0, 1), (2.0, 1.0, 0), (3.0, 0.0, 0))
      .toDF("t", "d", "g")
    val r = RankTests.logRank(df, col("t"), col("d"), col("g") === 1).collect()(0)
    assertNear(r.getAs[Double]("o1"), 2.0)
    assertNear(r.getAs[Double]("e1"), 0.5 + 2.0 / 3.0)
    assertNear(r.getAs[Double]("v"), 0.25 + 2.0 / 9.0)
    val oe = 2.0 - (0.5 + 2.0 / 3.0)
    assertNear(r.getAs[Double]("chisq"), oe * oe / (0.25 + 2.0 / 9.0))
  }

  test("identical groups give log-rank chisq 0") {
    val df = Seq((1.0, 1.0, 1), (1.0, 1.0, 0), (2.0, 1.0, 1), (2.0, 1.0, 0))
      .toDF("t", "d", "g")
    val r = RankTests.logRank(df, col("t"), col("d"), col("g") === 1).collect()(0)
    assertNear(r.getAs[Double]("chisq"), 0.0, 1e-12)
  }

  test("KS statistic matches the hand-computed ECDF gap") {
    // A = {1,2,3}, B = {3,4,5}: D = 2/3, attained at v=2 (2/3 - 0) and
    // v=3 (1 - 1/3). In IEEE doubles 1-1/3 is one ulp above 2/3, so the
    // deterministic argmax is v=3.
    val df = Seq((1.0, 1), (2.0, 1), (3.0, 1), (3.0, 0), (4.0, 0), (5.0, 0))
      .toDF("v", "a")
    val r = RankTests.ksTwoSample(df, col("v"), col("a") === 1).collect()(0)
    assertNear(r.getAs[Double]("ks_d"), 2.0 / 3.0)
    assertNear(r.getAs[Double]("ks_at"), 3.0)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
  }

  test("KS of a sample against itself is 0") {
    val df = Seq((1.0, 1), (2.0, 1), (1.0, 0), (2.0, 0)).toDF("v", "a")
    val r = RankTests.ksTwoSample(df, col("v"), col("a") === 1).collect()(0)
    assertNear(r.getAs[Double]("ks_d"), 0.0, 1e-12)
  }

  test("Mann-Whitney U matches hand-computed ranks, with and without ties") {
    // A={1,2}, B={3,4}: R1=3, U=0, varU=5/3, z=-2/sqrt(5/3)
    val df1 = Seq((1.0, 1), (2.0, 1), (3.0, 0), (4.0, 0)).toDF("v", "a")
    val r1 = RankTests.mannWhitney(df1, col("v"), col("a") === 1).collect()(0)
    assertNear(r1.getAs[Double]("u"), 0.0, 1e-12)
    assertNear(r1.getAs[Double]("z"), -2.0 / math.sqrt(5.0 / 3.0))
    // ties: A={1,1}, B={1,2}: midranks 2,2,2,4 -> R1=4, U=1,
    // ties term 24 -> varU = (4/12)*(5 - 24/12) = 1, z = -1
    val df2 = Seq((1.0, 1), (1.0, 1), (1.0, 0), (2.0, 0)).toDF("v", "a")
    val r2 = RankTests.mannWhitney(df2, col("v"), col("a") === 1).collect()(0)
    assertNear(r2.getAs[Double]("u"), 1.0, 1e-12)
    assertNear(r2.getAs[Double]("z"), -1.0)
  }

  test("chi-square independence handles absent cells via the o²/e identity") {
    // balanced 2x2 [[10,20],[20,10]]: e=15 everywhere, chi2 = 100/15
    val rows1 = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val r1 = RankTests.chiSquare(rows1.toDF("r", "c"), col("r"), col("c"))
      .collect()(0)
    assertNear(r1.getAs[Double]("chi2"), 100.0 / 15.0)
    assert(r1.getAs[Long]("dof") == 1L && r1.getAs[Long]("n") == 60L)
    // absent (a,y) cell must still contribute its expected mass:
    // cells ax=2, bx=1, by=1 -> chi2 = 4/3
    val rows2 = Seq(("a", "x"), ("a", "x"), ("b", "x"), ("b", "y"))
    val r2 = RankTests.chiSquare(rows2.toDF("r", "c"), col("r"), col("c"))
      .collect()(0)
    assertNear(r2.getAs[Double]("chi2"), 4.0 / 3.0)
  }

  test("weight diagnostics: equal weights give deff 1, ess n, gini 0") {
    val df = Seq.fill(8)(("s", 2.5)).toDF("grp", "w")
    val r = Diagnostics.weightDiagnostics(df, col("w"), col("grp"), "g")
      .collect()(0)
    assertNear(r.getAs[Double]("deff"), 1.0)
    assertNear(r.getAs[Double]("ess"), 8.0)
    assertNear(r.getAs[Double]("cv_w"), 0.0, 1e-12)
    assertNear(r.getAs[Double]("gini"), 0.0, 1e-12)
    assertNear(r.getAs[Double]("w_ratio"), 1.0)
  }

  test("weight diagnostics: hand-computed Kish deff and Gini") {
    // w = (1, 3): n=2, sw=4, sw2=10 -> deff = 2*10/16 = 1.25, ess = 1.6
    // gini = 2*(1*1+2*3)/(2*4) - 3/2 = 14/8 - 1.5 = 0.25
    val df = Seq(("s", 1.0), ("s", 3.0)).toDF("grp", "w")
    val r = Diagnostics.weightDiagnostics(df, col("w"), col("grp"), "g")
      .collect()(0)
    assertNear(r.getAs[Double]("deff"), 1.25)
    assertNear(r.getAs[Double]("ess"), 1.6)
    assertNear(r.getAs[Double]("gini"), 0.25)
    assertNear(r.getAs[Double]("w_ratio"), 3.0)
  }

  test("Neyman allocation is proportional to Nh*Sh and sums to ~n") {
    // stratum a: 4 units sd 1; stratum b: 2 units sd 5
    // shares: 4*1=4 vs 2*5=10 -> n_neyman = 100*(4/14, 10/14) = (29, 71)
    val a = Seq.tabulate(4)(i => ("a", i.toDouble + 1)) // sd = 1.29099
    val b = Seq(("b", 0.0), ("b", 10.0)) // sd = 7.0710678
    val df = (a ++ b).toDF("grp", "y")
    val rows = Allocation.neyman(df, col("grp"), col("y"), 100L, "g")
      .orderBy("g").collect()
    val sdA = math.sqrt((1.0 + 4 + 9 + 16 - 100.0 / 4) / 3)
    val sdB = math.sqrt((100.0 - 50.0) / 1)
    val denom = 4 * sdA + 2 * sdB
    assert(rows(0).getAs[Long]("n_neyman") == math.round(100 * 4 * sdA / denom))
    assert(rows(1).getAs[Long]("n_neyman") == math.round(100 * 2 * sdB / denom))
    assert(rows(0).getAs[Long]("n_prop") == 67L)
    assert(rows(1).getAs[Long]("n_prop") == 33L)
  }
}
