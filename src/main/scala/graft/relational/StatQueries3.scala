package graft.relational

import graft.core.{FeatureArray, Tables}
import graft.hazard.CompetingRisks
import graft.stats.{Isotonic, Pca, WeightedGLM}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Third statistical batch: penalized regression (ridge), principal
  * components (two-phase Gram + power iteration), a two-proportion
  * z-test, and Aalen–Johansen competing-risks cumulative incidence —
  * rounding out the survey/survival toolbox the reference's absolute-
  * risk pipeline (absrisk_fun.R) sits on.
  */
object StatQueries3 {
  import QueryDef._

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private def rnd(x: Double, k: Int): Double =
    BigDecimal(x).setScale(k, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Unrolled fixed-iteration Poisson IRLS as chained DuckDB CTEs
    * (2-parameter log link: intercept + x) — the Poisson twin of
    * StatQueries.irlsSql. μ = exp(η); working weight w·μ. */
  private def poissonIrlsSql(nIter: Int, baseSql: String, roundTo: Int): String = {
    val sb = new StringBuilder
    sb.append(s"WITH base AS ($baseSql),\n")
    sb.append("it0 AS (SELECT CAST(0.0 AS DOUBLE) AS b0, CAST(0.0 AS DOUBLE) AS b1),\n")
    for (k <- 1 to nIter) {
      sb.append(
        s"""it$k AS (
           |  SELECT b0 + (h11*g0 - h01*g1)/(h00*h11 - h01*h01) AS b0,
           |         b1 + (h00*g1 - h01*g0)/(h00*h11 - h01*h01) AS b1
           |  FROM (
           |    SELECT MAX(s.b0) AS b0, MAX(s.b1) AS b1,
           |      SUM(w*mu) AS h00, SUM(w*mu*x) AS h01, SUM(w*mu*x*x) AS h11,
           |      SUM(w*(y-mu)) AS g0, SUM(w*(y-mu)*x) AS g1
           |    FROM (SELECT base.y, base.x, base.w, p.b0, p.b1,
           |            EXP(p.b0 + p.b1*base.x) AS mu
           |          FROM base, it${k - 1} p) s))""".stripMargin)
      sb.append(if (k < nIter) ",\n" else "\n")
    }
    sb.append(s"SELECT ROUND(b0, $roundTo) AS b0, ROUND(b1, $roundTo) AS b1 FROM it$nIter")
    sb.toString
  }

  val all: Seq[QueryDef] = Seq(

    // ---- M37: weighted Poisson GLM (log link, 10 pinned IRLS
    //      iterations): urgent-order count per customer on account
    //      balance — the count-regression sibling of M1, fit by the
    //      same one-aggregate-per-iteration two-phase shape. ----
    sqlChecked("m37_poisson_glm",
      poissonIrlsSql(10,
        """SELECT CAST(COUNT(o.o_orderkey) AS DOUBLE) AS y,
          |  MAX(c.c_acctbal) / 10000.0 AS x,
          |  1.0 + MAX(c.c_custkey) % 3 AS w
          |FROM customer c LEFT JOIN orders o
          |  ON o.o_custkey = c.c_custkey AND o.o_orderpriority LIKE '1%'
          |GROUP BY c.c_custkey""".stripMargin,
        roundTo = 6)) { (s, d) =>
      import s.implicits._
      val urgent = t(s, d, "orders")
        .filter(col("o_orderpriority").startsWith("1"))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_urgent"))
      val base = t(s, d, "customer")
        .join(urgent, col("o_custkey") === col("c_custkey"), "left")
        .select(
          coalesce(col("n_urgent"), lit(0L)).cast("double").as("y"),
          (col("c_acctbal") / 10000.0).as("x"),
          (lit(1.0) + col("c_custkey") % 3).cast("double").as("w"))
      val fit = WeightedGLM.poisson(base,
        FeatureArray.withIntercept(Seq(col("x"))), col("y"), col("w"),
        p = 2, maxIter = 10, tol = 0.0)
      Seq((rnd(fit.coefficients(0), 6), rnd(fit.coefficients(1), 6)))
        .toDF("b0", "b1")
    },

    // ---- M33: ridge regression (intercept unpenalized). With one
    //      predictor the penalized solution is the centered closed
    //      form b1 = Sxy / (Sxx + λ), b0 = ȳ − b1·x̄ — both engines
    //      compute it from the same covariance/mean aggregates, one
    //      distributed pass, no driver iteration at all. ----
    sqlChecked("m33_ridge",
      """WITH a AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |    covar_pop(l_quantity, l_extendedprice) AS cxy,
        |    var_pop(l_quantity) AS vx,
        |    AVG(l_quantity) AS mx, AVG(l_extendedprice) AS my
        |  FROM lineitem)
        |SELECT CAST(n AS BIGINT) AS n,
        |  ROUND((cxy * n) / (vx * n + 5000000.0), 6) AS b1,
        |  ROUND(my - (cxy * n) / (vx * n + 5000000.0) * mx, 4) AS b0,
        |  ROUND(cxy / vx, 6) AS b1_ols,
        |  ROUND((vx * n) / (vx * n + 5000000.0), 6) AS shrink
        |FROM a""".stripMargin) { (s, d) =>
      val lam = 5000000.0
      t(s, d, "lineitem")
        .agg(
          count(lit(1)).cast("double").as("n"),
          covar_pop(col("l_quantity"), col("l_extendedprice")).as("cxy"),
          var_pop(col("l_quantity")).as("vx"),
          avg(col("l_quantity")).as("mx"),
          avg(col("l_extendedprice")).as("my"))
        .select(
          col("n").cast("long").as("n"),
          round((col("cxy") * col("n")) / (col("vx") * col("n") + lam), 6)
            .as("b1"),
          round(col("my") -
            (col("cxy") * col("n")) / (col("vx") * col("n") + lam) * col("mx"), 4)
            .as("b0"),
          round(col("cxy") / col("vx"), 6).as("b1_ols"),
          round((col("vx") * col("n")) / (col("vx") * col("n") + lam), 6)
            .as("shrink"))
    },

    // ---- M34: dominant principal component of a 3-variable customer
    //      profile. Distributed part is ONE pass producing the 3×3
    //      sample covariance (6 aggregates); the fixed 24-step power
    //      iteration is a pure driver-side recursion the oracle
    //      replays as a recursive CTE. Scaling the three variables to
    //      comparable magnitude keeps the eigen-gap healthy so both
    //      engines converge far below the 6-digit rounding. ----
    sqlChecked("m34_pca",
      """WITH RECURSIVE base AS (SELECT c_acctbal / 1000.0 AS x0,
        |    (c_custkey % 100) / 10.0 AS x1,
        |    CAST(c_nationkey AS DOUBLE) AS x2 FROM customer),
        |c AS (SELECT covar_samp(x0, x0) AS a00, covar_samp(x0, x1) AS a01,
        |    covar_samp(x0, x2) AS a02, covar_samp(x1, x1) AS a11,
        |    covar_samp(x1, x2) AS a12, covar_samp(x2, x2) AS a22
        |  FROM base),
        |it AS (
        |  SELECT 0 AS k, 0.5773502691896258 AS v0,
        |    0.5773502691896258 AS v1, 0.5773502691896258 AS v2
        |  UNION ALL
        |  SELECT k + 1,
        |    w0 / SQRT(w0*w0 + w1*w1 + w2*w2),
        |    w1 / SQRT(w0*w0 + w1*w1 + w2*w2),
        |    w2 / SQRT(w0*w0 + w1*w1 + w2*w2)
        |  FROM (SELECT k, a00*v0 + a01*v1 + a02*v2 AS w0,
        |          a01*v0 + a11*v1 + a12*v2 AS w1,
        |          a02*v0 + a12*v1 + a22*v2 AS w2
        |        FROM it, c WHERE k < 24) s),
        |fin AS (SELECT v0, v1, v2,
        |    CASE WHEN v0 < 0 THEN -1.0 ELSE 1.0 END AS sgn
        |  FROM it WHERE k = 24)
        |SELECT
        |  ROUND(v0*(a00*v0 + a01*v1 + a02*v2)
        |      + v1*(a01*v0 + a11*v1 + a12*v2)
        |      + v2*(a02*v0 + a12*v1 + a22*v2), 6) AS eigval,
        |  ROUND(sgn * v0, 6) AS v1, ROUND(sgn * v1, 6) AS v2,
        |  ROUND(sgn * v2, 6) AS v3
        |FROM fin, c""".stripMargin) { (s, d) =>
      Pca.topComponent(t(s, d, "customer"),
          Seq(col("c_acctbal") / 1000.0, (col("c_custkey") % 100) / 10.0,
            col("c_nationkey")), 24)
        .select(round(col("eigval"), 6).as("eigval"),
          round(col("v1"), 6).as("v1"), round(col("v2"), 6).as("v2"),
          round(col("v3"), 6).as("v3"))
    },

    // ---- M35: two-proportion z-test (pooled variance): finished-order
    //      rate, urgent vs non-urgent priority — the A/B-test primitive.
    //      One conditional-aggregate pass; no join, no window. ----
    sqlChecked("m35_twoprop",
      """WITH a AS (SELECT
        |    SUM(CASE WHEN o_orderpriority LIKE '1%' THEN 1.0 ELSE 0.0 END) AS n1,
        |    SUM(CASE WHEN o_orderpriority LIKE '1%'
        |          AND o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END) AS s1,
        |    SUM(CASE WHEN o_orderpriority NOT LIKE '1%' THEN 1.0 ELSE 0.0 END) AS n0,
        |    SUM(CASE WHEN o_orderpriority NOT LIKE '1%'
        |          AND o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END) AS s0
        |  FROM orders)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
        |  ROUND(s1 / n1, 6) AS p1, ROUND(s0 / n0, 6) AS p0,
        |  ROUND((s1 / n1 - s0 / n0)
        |    / SQRT((s1 + s0) / (n1 + n0) * (1 - (s1 + s0) / (n1 + n0))
        |           * (1 / n1 + 1 / n0)), 4) AS z
        |FROM a""".stripMargin) { (s, d) =>
      val urgent = col("o_orderpriority").startsWith("1")
      val fin = col("o_orderstatus") === "F"
      t(s, d, "orders")
        .agg(
          sum(when(urgent, 1.0).otherwise(0.0)).as("n1"),
          sum(when(urgent && fin, 1.0).otherwise(0.0)).as("s1"),
          sum(when(!urgent, 1.0).otherwise(0.0)).as("n0"),
          sum(when(!urgent && fin, 1.0).otherwise(0.0)).as("s0"))
        .select(
          col("n1").cast("long").as("n1"), col("n0").cast("long").as("n0"),
          round(col("s1") / col("n1"), 6).as("p1"),
          round(col("s0") / col("n0"), 6).as("p0"),
          round((col("s1") / col("n1") - col("s0") / col("n0")) /
            sqrt((col("s1") + col("s0")) / (col("n1") + col("n0")) *
              (lit(1.0) - (col("s1") + col("s0")) / (col("n1") + col("n0"))) *
              (lit(1.0) / col("n1") + lit(1.0) / col("n0"))), 4).as("z"))
    },

    // ---- M36: Aalen–Johansen cumulative incidence under two
    //      competing causes (return 'R' vs 'N', 'A' censored) on the
    //      shared discrete-time survival frame. Generalizes M26's KM to
    //      cause-specific risk — the estimator the reference's absolute-
    //      risk pipeline (absrisk_fun.R) approximates parametrically. ----
    sqlChecked("m36_cuminc",
      """WITH base AS (SELECT l_quantity AS t,
        |    CASE WHEN l_returnflag = 'R' THEN 1
        |         WHEN l_returnflag = 'N' THEN 2 ELSE 0 END AS cause
        |  FROM lineitem),
        |g AS (SELECT t,
        |    SUM(CASE WHEN cause = 1 THEN 1.0 ELSE 0.0 END) AS d1,
        |    SUM(CASE WHEN cause = 2 THEN 1.0 ELSE 0.0 END) AS d2,
        |    CAST(COUNT(*) AS DOUBLE) AS ct FROM base GROUP BY t),
        |r AS (SELECT t, d1, d2, SUM(ct) OVER (ORDER BY t DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
        |  FROM g),
        |e AS (SELECT t, d1, d2, n_risk FROM r
        |  WHERE d1 + d2 > 0 AND d1 + d2 < n_risk),
        |s AS (SELECT t, d1, d2, n_risk,
        |    EXP(COALESCE(SUM(LN(1 - (d1 + d2) / n_risk)) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) AS s_prev
        |  FROM e),
        |c AS (SELECT t, n_risk, s_prev,
        |    SUM(s_prev * d1 / n_risk) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cif1,
        |    SUM(s_prev * d2 / n_risk) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cif2
        |  FROM s)
        |SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
        |  ROUND(s_prev, 8) AS s_prev, ROUND(cif1, 8) AS cif1,
        |  ROUND(cif2, 8) AS cif2
        |FROM c ORDER BY t""".stripMargin) { (s, d) =>
      // l_quantity is a ≤50-value discrete grid: the collapsed time
      // axis is schema-bounded, so skip the three scan probes (each
      // re-pays the groupBy upstream) — the Small hint is the same
      // single-window form the probe would pick, minus the probes
      CompetingRisks.aalenJohansen(t(s, d, "lineitem"),
          col("l_quantity"),
          when(col("l_returnflag") === "R", 1)
            .when(col("l_returnflag") === "N", 2).otherwise(0),
          sizeHint = graft.core.Windows.SizeHint.Small)
        .select(col("t"), col("n_risk").cast("long").as("n_risk"),
          round(col("s_prev"), 8).as("s_prev"),
          round(col("cif1"), 8).as("cif1"),
          round(col("cif2"), 8).as("cif2"))
        .orderBy(col("t"))
    },

    // ---- M38: isotonic regression (probability calibration):
    //      finished-order rate vs fixed-width price bucket, forced
    //      monotone. One distributed aggregate collapses the data to
    //      ≤12 bins; the fit is the minimax characterization
    //      f_i = max_{j≤i} min_{k≥i} mean(j..k) — exactly PAVA, but
    //      purely relational (B² range means from prefix sums), so
    //      the oracle replays it with no sequential loop. ----
    sqlChecked("m38_isotonic",
      """WITH base AS (SELECT
        |    LEAST(CAST(FLOOR(o_totalprice / 50000) AS BIGINT), 9) AS bin,
        |    CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y,
        |    1.0 + o_orderkey % 3 AS w FROM orders),
        |g AS (SELECT bin, SUM(w * y) AS wy, SUM(w) AS ww
        |  FROM base GROUP BY bin),
        |p AS (SELECT bin, wy, ww,
        |    SUM(wy) OVER (ORDER BY bin) AS cy,
        |    SUM(ww) OVER (ORDER BY bin) AS cw FROM g),
        |r AS (SELECT lo.bin AS j, hi.bin AS k,
        |    (hi.cy - lo.cy + lo.wy) / (hi.cw - lo.cw + lo.ww) AS m
        |  FROM p lo JOIN p hi ON lo.bin <= hi.bin),
        |inner_mn AS (SELECT g.bin AS i, r.j, MIN(r.m) AS mn
        |  FROM g JOIN r ON r.j <= g.bin AND r.k >= g.bin
        |  GROUP BY g.bin, r.j),
        |iso AS (SELECT i, MAX(mn) AS iso_mean FROM inner_mn GROUP BY i)
        |SELECT g.bin, ROUND(g.ww, 6) AS n_w,
        |  ROUND(g.wy / g.ww, 6) AS raw_mean,
        |  ROUND(iso.iso_mean, 6) AS iso_mean
        |FROM g JOIN iso ON iso.i = g.bin ORDER BY g.bin""".stripMargin) { (s, d) =>
      Isotonic.fit(t(s, d, "orders"),
          least(floor(col("o_totalprice") / 50000), lit(9L)),
          when(col("o_orderstatus") === "F", 1.0).otherwise(0.0),
          (lit(1.0) + col("o_orderkey") % 3).cast("double"))
        .select(col("bin"), round(col("n_w"), 6).as("n_w"),
          round(col("raw_mean"), 6).as("raw_mean"),
          round(col("iso_mean"), 6).as("iso_mean"))
        .orderBy(col("bin"))
    },

    // ---- M39: ROC curve + AUC from a bounded score-bin axis (the
    //      scale-correct formulation: ONE distributed aggregate to
    //      ≤29 bins, then trapezoid integration over the tiny bin
    //      table — never a global rank sort of the raw scores).
    //      Counts are integers, so every TPR/FPR ratio is exact on
    //      both engines. ----
    sqlChecked("m39_auc_roc",
      """WITH base AS (SELECT
        |    LEAST(CAST(FLOOR(o_totalprice / 20000) AS BIGINT), 24) AS bin,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
        |  FROM orders),
        |g AS (SELECT bin, CAST(SUM(pos) AS DOUBLE) AS p,
        |    CAST(COUNT(*) - SUM(pos) AS DOUBLE) AS n
        |  FROM base GROUP BY bin),
        |tot AS (SELECT SUM(p) AS tp, SUM(n) AS tn FROM g),
        |c AS (SELECT bin,
        |    SUM(p) OVER (ORDER BY bin DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / tp AS tpr,
        |    SUM(n) OVER (ORDER BY bin DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / tn AS fpr
        |  FROM g CROSS JOIN tot),
        |tz AS (SELECT bin, tpr, fpr,
        |    (fpr - COALESCE(LAG(fpr) OVER (ORDER BY bin DESC), 0.0))
        |      * (tpr + COALESCE(LAG(tpr) OVER (ORDER BY bin DESC), 0.0)) / 2
        |      AS contrib
        |  FROM c)
        |SELECT bin, ROUND(tpr, 6) AS tpr, ROUND(fpr, 6) AS fpr,
        |  ROUND(SUM(contrib) OVER (), 6) AS auc
        |FROM tz ORDER BY bin""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val g = t(s, d, "orders")
        .select(
          least(floor(col("o_totalprice") / 20000), lit(24L)).as("bin"),
          when(col("o_orderstatus") === "F", 1).otherwise(0).as("pos"))
        .groupBy(col("bin"))
        .agg(sum(col("pos")).cast("double").as("p"),
          (count(lit(1)) - sum(col("pos"))).cast("double").as("n"))
      val tot = g.agg(sum(col("p")).as("tp"), sum(col("n")).as("tn"))
      // bin axis is capped at 25 rows by the least(...) clamp above —
      // the single-partition windows run on that bounded table only
      val desc = Window.orderBy(col("bin").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lagW = Window.orderBy(col("bin").desc)
      val c = g.crossJoin(broadcast(tot))
        .withColumn("tpr", sum(col("p")).over(desc) / col("tp"))
        .withColumn("fpr", sum(col("n")).over(desc) / col("tn"))
      val tz = c
        .withColumn("contrib",
          (col("fpr") - coalesce(lag(col("fpr"), 1).over(lagW), lit(0.0))) *
            (col("tpr") + coalesce(lag(col("tpr"), 1).over(lagW), lit(0.0))) / 2)
      tz.withColumn("auc",
          sum(col("contrib")).over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
        .select(col("bin"), round(col("tpr"), 6).as("tpr"),
          round(col("fpr"), 6).as("fpr"), round(col("auc"), 6).as("auc"))
        .orderBy(col("bin"))
    },

    // ---- M40: SRS mean with finite-population correction — the
    //      survey-sampling textbook baseline. The "sample" is a 1-in-10
    //      systematic subset of customers drawn from the known frame;
    //      SE carries the (1 − n/N) FPC, CI at z = 1.96. One aggregate
    //      over the sample + one COUNT over the frame. ----
    sqlChecked("m40_fpc_ci",
      """WITH fr AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM customer),
        |s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(c_acctbal) AS mu,
        |    var_samp(c_acctbal) AS s2
        |  FROM customer WHERE c_custkey % 10 = 0)
        |SELECT CAST(n AS BIGINT) AS n, CAST(nn AS BIGINT) AS n_pop,
        |  ROUND(mu, 6) AS mean,
        |  ROUND(SQRT((1 - n / nn) * s2 / n), 6) AS se,
        |  ROUND(mu - 1.96 * SQRT((1 - n / nn) * s2 / n), 6) AS lo,
        |  ROUND(mu + 1.96 * SQRT((1 - n / nn) * s2 / n), 6) AS hi
        |FROM s CROSS JOIN fr""".stripMargin) { (s, d) =>
      val cust = t(s, d, "customer")
      val fr = cust.agg(count(lit(1)).cast("double").as("nn"))
      val sm = cust.filter(col("c_custkey") % 10 === 0)
        .agg(count(lit(1)).cast("double").as("n"),
          avg(col("c_acctbal")).as("mu"),
          var_samp(col("c_acctbal")).as("s2"))
      val se = sqrt((lit(1.0) - col("n") / col("nn")) * col("s2") / col("n"))
      sm.crossJoin(broadcast(fr))
        .select(col("n").cast("long").as("n"),
          col("nn").cast("long").as("n_pop"),
          round(col("mu"), 6).as("mean"), round(se, 6).as("se"),
          round(col("mu") - lit(1.96) * se, 6).as("lo"),
          round(col("mu") + lit(1.96) * se, 6).as("hi"))
    },

    // ---- M41: ratio estimator with linearized variance — estimate
    //      total order revenue per unit quantity R = Σy/Σx from the
    //      sample, SE from the Taylor deviates z_i = (y_i − R·x_i)/x̄
    //      (Cochran §6.3). Two aggregates over one scan each (the
    //      second needs R, so the chain is two driver-synced passes —
    //      the same shape as every M13 influence pipeline). ----
    sqlChecked("m41_ratio",
      """WITH s AS (SELECT l_extendedprice AS y, l_quantity AS x
        |  FROM lineitem WHERE l_orderkey % 7 = 0),
        |m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(y) AS sy,
        |    SUM(x) AS sx, AVG(x) AS mx FROM s),
        |v AS (SELECT MAX(m.n) AS n, MAX(m.sy / m.sx) AS r,
        |    var_samp((s.y - (m.sy / m.sx) * s.x) / m.mx) AS vz
        |  FROM s CROSS JOIN m)
        |SELECT CAST(n AS BIGINT) AS n, ROUND(r, 6) AS ratio,
        |  ROUND(SQRT(vz / n), 6) AS se
        |FROM v""".stripMargin) { (s, d) =>
      val sm = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 7 === 0)
        .select(col("l_extendedprice").as("y"), col("l_quantity").as("x"))
      val m = sm.agg(count(lit(1)).cast("double").as("n"),
        sum(col("y")).as("sy"), sum(col("x")).as("sx"),
        avg(col("x")).as("mx"))
      val v = sm.crossJoin(broadcast(m))
        .agg(max(col("n")).as("n"), max(col("sy") / col("sx")).as("r"),
          var_samp((col("y") - (col("sy") / col("sx")) * col("x")) /
            col("mx")).as("vz"))
      v.select(col("n").cast("long").as("n"), round(col("r"), 6).as("ratio"),
        round(sqrt(col("vz") / col("n")), 6).as("se"))
    },

    // ---- M42: regression (difference) estimator — adjust the sample
    //      mean of y by the known frame mean of an auxiliary x:
    //      ŷ_reg = ȳ + b·(X̄ − x̄) with b the sample OLS slope
    //      (Cochran §7). Auxiliary totals over the full frame, slope +
    //      moments over the sample: two aggregates, no joins of
    //      data-sized tables. ----
    sqlChecked("m42_reg_est",
      """WITH fr AS (SELECT AVG(o_totalprice) AS xbar_pop FROM orders),
        |s AS (SELECT o_totalprice AS x,
        |    CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(x) AS mx,
        |    AVG(y) AS my, covar_pop(x, y) AS cxy, var_pop(x) AS vx
        |  FROM s)
        |SELECT CAST(n AS BIGINT) AS n, ROUND(my, 6) AS mean_naive,
        |  ROUND(cxy / vx, 9) AS slope,
        |  ROUND(my + (cxy / vx) * (xbar_pop - mx), 6) AS mean_reg
        |FROM m CROSS JOIN fr""".stripMargin) { (s, d) =>
      val ords = t(s, d, "orders")
      val fr = ords.agg(avg(col("o_totalprice")).as("xbar_pop"))
      val sm = ords.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_totalprice").as("x"),
          when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("y"))
      val m = sm.agg(count(lit(1)).cast("double").as("n"),
        avg(col("x")).as("mx"), avg(col("y")).as("my"),
        covar_pop(col("x"), col("y")).as("cxy"),
        var_pop(col("x")).as("vx"))
      m.crossJoin(broadcast(fr))
        .select(col("n").cast("long").as("n"),
          round(col("my"), 6).as("mean_naive"),
          round(col("cxy") / col("vx"), 9).as("slope"),
          round(col("my") + (col("cxy") / col("vx")) *
            (col("xbar_pop") - col("mx")), 6).as("mean_reg"))
    },

    // ---- M43: capture–recapture (dual-frame) population-size
    //      estimate, Chapman-corrected Lincoln–Petersen — the
    //      two-overlapping-frames primitive behind dual-frame survey
    //      integration. Frames are two systematic subsets of the
    //      customer frame; one conditional aggregate computes nA, nB,
    //      the overlap m, N̂ and its SE. ----
    sqlChecked("m43_capture",
      """WITH a AS (SELECT
        |    SUM(CASE WHEN c_custkey % 2 = 0 THEN 1.0 ELSE 0.0 END) AS na,
        |    SUM(CASE WHEN c_custkey % 3 = 0 THEN 1.0 ELSE 0.0 END) AS nb,
        |    SUM(CASE WHEN c_custkey % 6 = 0 THEN 1.0 ELSE 0.0 END) AS m,
        |    CAST(COUNT(*) AS BIGINT) AS n_true
        |  FROM customer)
        |SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
        |  CAST(m AS BIGINT) AS m, n_true,
        |  ROUND((na + 1) * (nb + 1) / (m + 1) - 1, 4) AS n_hat,
        |  ROUND(SQRT((na + 1) * (nb + 1) * (na - m) * (nb - m)
        |    / ((m + 1) * (m + 1) * (m + 2))), 4) AS se
        |FROM a""".stripMargin) { (s, d) =>
      val a = t(s, d, "customer").agg(
        sum(when(col("c_custkey") % 2 === 0, 1.0).otherwise(0.0)).as("na"),
        sum(when(col("c_custkey") % 3 === 0, 1.0).otherwise(0.0)).as("nb"),
        sum(when(col("c_custkey") % 6 === 0, 1.0).otherwise(0.0)).as("m"),
        count(lit(1)).as("n_true"))
      a.select(col("na").cast("long").as("na"),
        col("nb").cast("long").as("nb"), col("m").cast("long").as("m"),
        col("n_true"),
        round((col("na") + 1) * (col("nb") + 1) / (col("m") + 1) - 1, 4)
          .as("n_hat"),
        round(sqrt((col("na") + 1) * (col("nb") + 1) * (col("na") - col("m"))
          * (col("nb") - col("m")) /
          ((col("m") + 1) * (col("m") + 1) * (col("m") + 2))), 4).as("se"))
    },

    // ---- M44: ultimate-cluster (between-PSU) variance of a total —
    //      the design-based variance for a clustered sample, PSU =
    //      nation: v(T̂) = k/(k−1) · Σ(t_i − t̄)². One groupBy to PSU
    //      totals (bounded by the PSU count), one aggregate over the
    //      PSU table. The workhorse behind every "with-replacement
    //      PSU" survey variance, including the reference's jackknife
    //      groups. ----
    sqlChecked("m44_cluster_var",
      """WITH psu AS (SELECT c_nationkey, SUM(c_acctbal) AS t_i
        |  FROM customer GROUP BY c_nationkey),
        |a AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k, SUM(t_i) AS tot,
        |    var_samp(t_i) AS s2 FROM psu)
        |SELECT CAST(k AS BIGINT) AS k, ROUND(tot, 2) AS total,
        |  ROUND(k * s2, -4) AS var_tot,
        |  ROUND(SQRT(k * s2), 4) AS se
        |FROM a""".stripMargin) { (s, d) =>
      val psu = t(s, d, "customer")
        .groupBy(col("c_nationkey")).agg(sum(col("c_acctbal")).as("t_i"))
      psu.agg(count(lit(1)).cast("double").as("k"),
          sum(col("t_i")).as("tot"), var_samp(col("t_i")).as("s2"))
        // var_tot is O(5e13): its double ulp (~0.008) times the PSU
        // sum's accumulated drift exceeds any positive-scale quantum,
        // so round to the nearest 1e4 (relative resolution ~2e-10) —
        // the raw-ulp compare flipped on the sf1 probe
        .select(col("k").cast("long").as("k"),
          round(col("tot"), 2).as("total"),
          round(col("k") * col("s2"), -4).as("var_tot"),
          round(sqrt(col("k") * col("s2")), 4).as("se"))
    },

    // ---- M45: partial-pooling shrinkage of small-area means — the
    //      empirical-Bayes composite μ̂_i = (n_i·ȳ_i + λ·ȳ) / (n_i + λ)
    //      with fixed prior strength λ: sparse areas pull toward the
    //      grand mean, populous areas keep their own. One grouped
    //      aggregate + a broadcast grand mean. ----
    sqlChecked("m45_shrinkage",
      """WITH g AS (SELECT c_nationkey, CAST(COUNT(*) AS DOUBLE) AS n,
        |    AVG(c_acctbal) AS ybar FROM customer GROUP BY c_nationkey),
        |gl AS (SELECT SUM(n * ybar) / SUM(n) AS ygl FROM g)
        |SELECT c_nationkey, CAST(n AS BIGINT) AS n,
        |  ROUND(ybar, 6) AS raw_mean,
        |  ROUND((n * ybar + 50.0 * ygl) / (n + 50.0), 6) AS shrunk_mean
        |FROM g CROSS JOIN gl ORDER BY c_nationkey""".stripMargin) { (s, d) =>
      val g = t(s, d, "customer").groupBy(col("c_nationkey"))
        .agg(count(lit(1)).cast("double").as("n"),
          avg(col("c_acctbal")).as("ybar"))
      val gl = g.agg((sum(col("n") * col("ybar")) / sum(col("n"))).as("ygl"))
      g.crossJoin(broadcast(gl))
        .select(col("c_nationkey"), col("n").cast("long").as("n"),
          round(col("ybar"), 6).as("raw_mean"),
          round((col("n") * col("ybar") + lit(50.0) * col("ygl")) /
            (col("n") + lit(50.0)), 6).as("shrunk_mean"))
        .orderBy(col("c_nationkey"))
    }
  )
}
