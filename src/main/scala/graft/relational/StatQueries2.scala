package graft.relational

import graft.core.Tables
import graft.sampling.Allocation
import graft.stats.{KaplanMeier, RankTests}
import graft.weights.Diagnostics
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Second statistical batch: the nonparametric survival companions of
  * the reference's hazard chain (Kaplan-Meier product-limit with
  * Greenwood variance, the two-group log-rank test), distribution
  * comparison (two-sample Kolmogorov-Smirnov), and survey-design
  * tooling (Kish design-effect weight diagnostics, Neyman allocation).
  * All reuse the tie-collapse + suffix/prefix scan machinery
  * (SURVEY.md O3/O4/O5) so no operator ever runs a global window over
  * raw rows.
  */
object StatQueries2 {
  import QueryDef._

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private val riskWindowDesc =
    "ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
  private val prefixWindowAsc =
    "ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"

  val all: Seq[QueryDef] = Seq(

    // ---- M26: weighted Kaplan-Meier + Greenwood SE on the shared
    //      survival frame (heavy ties exercise the tie-collapse).
    //      Both sides filter the degenerate whole-risk-set-dies row
    //      (only possible at max t) before the prefix scans. ----
    sqlChecked("m26_km",
      s"""WITH base AS (${StatQueries.survSql}),
         |g AS (SELECT t, SUM(w * d) AS wd, SUM(w) AS wall
         |      FROM base GROUP BY t),
         |r AS (SELECT t, wd,
         |        SUM(wall) OVER ($riskWindowDesc) AS n_risk FROM g),
         |k AS (SELECT t, wd, n_risk FROM r
         |      WHERE wd > 0 AND wd < n_risk),
         |km AS (SELECT t, wd, n_risk,
         |    EXP(SUM(LN(1 - wd / n_risk)) OVER ($prefixWindowAsc)) AS surv,
         |    SUM(wd / (n_risk * (n_risk - wd)))
         |      OVER ($prefixWindowAsc) AS gw
         |  FROM k)
         |SELECT t, ROUND(n_risk, 6) AS n_risk, ROUND(wd, 6) AS d_w,
         |  ROUND(surv, 8) AS surv, ROUND(surv * SQRT(gw), 8) AS se
         |FROM km ORDER BY t""".stripMargin) { (s, d) =>
      KaplanMeier.fit(StatQueries.survFrame(s, d),
          col("t"), col("d"), col("w"))
        .select(col("t"), round(col("n_risk"), 6).as("n_risk"),
          round(col("d_w"), 6).as("d_w"), round(col("surv"), 8).as("surv"),
          round(col("se"), 8).as("se"))
        .orderBy(col("t"))
    },

    // ---- M27: two-group log-rank test (group = above-median
    //      discount), hypergeometric variance ----
    sqlChecked("m27_logrank",
      s"""WITH base AS (${StatQueries.survSql}),
         |b2 AS (SELECT t, d, CASE WHEN x >= 0.5 THEN 1 ELSE 0 END AS g
         |       FROM base),
         |g AS (SELECT t,
         |    SUM(CASE WHEN g = 1 THEN d ELSE 0 END) AS d1, SUM(d) AS dt,
         |    CAST(SUM(g) AS DOUBLE) AS c1, CAST(COUNT(*) AS DOUBLE) AS ct
         |  FROM b2 GROUP BY t),
         |r AS (SELECT t, d1, dt,
         |    SUM(c1) OVER ($riskWindowDesc) AS n1,
         |    SUM(ct) OVER ($riskWindowDesc) AS nt FROM g),
         |f AS (SELECT SUM(d1) AS o1, SUM(dt * n1 / nt) AS e1,
         |    SUM(CASE WHEN nt > 1 THEN dt * (n1 / nt) * (1 - n1 / nt)
         |          * (nt - dt) / (nt - 1) ELSE 0 END) AS v
         |  FROM r WHERE dt > 0)
         |SELECT ROUND(o1, 6) AS o1, ROUND(e1, 6) AS e1,
         |  ROUND(v, 6) AS v, ROUND(POWER(o1 - e1, 2) / v, 6) AS chisq
         |FROM f""".stripMargin) { (s, d) =>
      RankTests.logRank(StatQueries.survFrame(s, d),
          col("t"), col("d"), col("x") >= 0.5)
        .select(round(col("o1"), 6).as("o1"), round(col("e1"), 6).as("e1"),
          round(col("v"), 6).as("v"), round(col("chisq"), 6).as("chisq"))
    },

    // ---- M28: Kish weight diagnostics per market segment: design
    //      effect, effective sample size, CV of weights, Gini weight
    //      concentration, max/min ratio. Variances from explicit power
    //      sums so the oracle replays identical algebra. ----
    sqlChecked("m28_weight_diag",
      """WITH base AS (SELECT c_mktsegment AS seg,
        |    1.0 + (c_custkey % 7)
        |      + CASE WHEN c_acctbal < 0 THEN 0.5 ELSE 0 END AS w
        |  FROM customer),
        |rk AS (SELECT seg, w,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY seg ORDER BY w)
        |      AS DOUBLE) AS i FROM base),
        |a AS (SELECT seg, COUNT(*) AS n, SUM(w) AS sw, SUM(w * w) AS sw2,
        |    SUM(i * w) AS siw, MIN(w) AS wmin, MAX(w) AS wmax
        |  FROM rk GROUP BY seg),
        |m AS (SELECT seg, n, CAST(n AS DOUBLE) AS nd, sw, sw2, siw,
        |    wmin, wmax,
        |    SQRT((sw2 - sw * sw / n) / (n - 1)) AS sd FROM a)
        |SELECT seg, n,
        |  ROUND(nd * sw2 / (sw * sw), 6) AS deff,
        |  ROUND(sw * sw / sw2, 4) AS ess,
        |  ROUND(sd / (sw / nd), 6) AS cv_w,
        |  ROUND(2 * siw / (nd * sw) - (nd + 1) / nd, 6) AS gini,
        |  ROUND(wmax / wmin, 6) AS w_ratio
        |FROM m ORDER BY seg""".stripMargin) { (s, d) =>
      Diagnostics.weightDiagnostics(t(s, d, "customer"),
          lit(1.0) + (col("c_custkey") % 7)
            + when(col("c_acctbal") < 0, 0.5).otherwise(0.0),
          col("c_mktsegment"), "seg")
        .select(col("seg"), col("n"), round(col("deff"), 6).as("deff"),
          round(col("ess"), 4).as("ess"), round(col("cv_w"), 6).as("cv_w"),
          round(col("gini"), 6).as("gini"),
          round(col("w_ratio"), 6).as("w_ratio"))
        .orderBy(col("seg"))
    },

    // ---- M29: two-sample Kolmogorov-Smirnov D on order totals,
    //      urgent-ish priorities vs the rest. ECDF differences are
    //      exact rationals in doubles, so the argmax row is
    //      engine-deterministic. ----
    sqlChecked("m29_ks",
      """WITH base AS (SELECT o_totalprice AS v,
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1.0 ELSE 0.0 END AS ga FROM orders),
        |g AS (SELECT v, SUM(ga) AS ca, SUM(1.0 - ga) AS cb
        |      FROM base GROUP BY v),
        |c AS (SELECT v,
        |    SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cuma,
        |    SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cumb FROM g),
        |tot AS (SELECT SUM(ga) AS na, SUM(1.0 - ga) AS nb FROM base),
        |dv AS (SELECT v, ABS(cuma / na - cumb / nb) AS dv
        |       FROM c CROSS JOIN tot)
        |SELECT ROUND(dv, 8) AS ks_d, v AS ks_at,
        |  CAST((SELECT na FROM tot) AS BIGINT) AS n_a,
        |  CAST((SELECT nb FROM tot) AS BIGINT) AS n_b
        |FROM dv ORDER BY dv DESC, v LIMIT 1""".stripMargin) { (s, d) =>
      RankTests.ksTwoSample(t(s, d, "orders"), col("o_totalprice"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(round(col("ks_d"), 8).as("ks_d"), col("ks_at"),
          col("n_a"), col("n_b"))
    },

    // ---- M31: Pearson chi-square independence test on the
    //      returnflag × linestatus contingency table, via the
    //      empty-cell-safe identity chi2 = Σ o²/e − n ----
    sqlChecked("m31_chisq",
      """WITH cells AS (SELECT l_returnflag AS r, l_linestatus AS c,
        |    CAST(COUNT(*) AS DOUBLE) AS o FROM lineitem GROUP BY 1, 2),
        |rt AS (SELECT r, SUM(o) AS rt FROM cells GROUP BY r),
        |ct AS (SELECT c, SUM(o) AS ct FROM cells GROUP BY c),
        |t AS (SELECT SUM(o) AS n,
        |    CAST(COUNT(DISTINCT r) AS DOUBLE) AS nr,
        |    CAST(COUNT(DISTINCT c) AS DOUBLE) AS nc FROM cells)
        |SELECT ROUND(SUM(o * o / (rt.rt * ct.ct / t.n)) - MAX(t.n), 6)
        |    AS chi2,
        |  CAST(MAX((nr - 1) * (nc - 1)) AS BIGINT) AS dof,
        |  CAST(MAX(n) AS BIGINT) AS n
        |FROM cells JOIN rt USING (r) JOIN ct USING (c)
        |CROSS JOIN t""".stripMargin) { (s, d) =>
      RankTests.chiSquare(t(s, d, "lineitem"),
          col("l_returnflag"), col("l_linestatus"))
        .select(round(col("chi2"), 6).as("chi2"), col("dof"), col("n"))
    },

    // ---- M32: Mann-Whitney U rank-sum test (midrank ties +
    //      tie-corrected normal z): English vs other documents by
    //      length ----
    sqlChecked("m32_mannwhitney",
      """WITH base AS (SELECT CAST(n_chars AS DOUBLE) AS v,
        |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS ga
        |  FROM documents),
        |p AS (SELECT v, SUM(ga) AS ca, SUM(1.0 - ga) AS cb,
        |    SUM(1.0) AS c FROM base GROUP BY v),
        |s AS (SELECT v, ca, cb, c,
        |    SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cumc FROM p),
        |r AS (SELECT SUM(ca * (cumc - c + (c + 1) / 2)) AS r1,
        |    SUM(ca) AS na, SUM(cb) AS nb, SUM(c * c * c - c) AS ties
        |  FROM s),
        |f AS (SELECT r1, na, nb, r1 - na * (na + 1) / 2 AS u,
        |    na * nb / 12 * ((na + nb + 1)
        |      - ties / ((na + nb) * (na + nb - 1))) AS varu FROM r)
        |SELECT ROUND(u, 4) AS u,
        |  ROUND((u - na * nb / 2) / SQRT(varu), 6) AS z,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
        |FROM f""".stripMargin) { (s, d) =>
      RankTests.mannWhitney(t(s, d, "documents"),
          col("n_chars"), col("lang") === "en")
        .select(round(col("u"), 4).as("u"), round(col("z"), 6).as("z"),
          col("n_a"), col("n_b"))
    },

    // ---- M30: Neyman vs proportional allocation of n=1000 across
    //      account-balance strata (n_h ∝ N_h·S_h) ----
    sqlChecked("m30_neyman",
      """WITH s AS (SELECT c_mktsegment AS seg, COUNT(*) AS nh,
        |    SUM(c_acctbal) AS sy, SUM(c_acctbal * c_acctbal) AS sy2
        |  FROM customer GROUP BY seg),
        |m AS (SELECT seg, nh, CAST(nh AS DOUBLE) AS nhd,
        |    SQRT((sy2 - sy * sy / nh) / (nh - 1)) AS sh
        |  FROM s WHERE nh > 1),
        |tot AS (SELECT SUM(nhd * sh) AS denom, SUM(nhd) AS ntot FROM m)
        |SELECT seg, nh, ROUND(sh, 6) AS sh,
        |  CAST(ROUND(1000 * nhd * sh / denom, 0) AS BIGINT) AS n_neyman,
        |  CAST(ROUND(1000 * nhd / ntot, 0) AS BIGINT) AS n_prop
        |FROM m CROSS JOIN tot ORDER BY seg""".stripMargin) { (s, d) =>
      Allocation.neyman(t(s, d, "customer"), col("c_mktsegment"),
          col("c_acctbal"), 1000L, "seg")
        .select(col("seg"), col("nh"), round(col("sh"), 6).as("sh"),
          col("n_neyman"), col("n_prop"))
        .orderBy(col("seg"))
    })
}
