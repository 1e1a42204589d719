package graft.relational

import graft.core.Tables
import graft.stats.CoxPH
import graft.variance.{CoxInfluence, Jackknife, JointVariance}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Third batch: sliding event windows, approximate sketches (the
  * 100-TB path of the exact operators), and the integrated
  * influence/jackknife heavy paths as bench-visible queries.
  */
object RelationalQueries3 {
  import QueryDef._

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private def rnd(x: Double, k: Int): Double =
    BigDecimal(x).setScale(k, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Unrolled fixed-iteration Cox Newton-Raphson (1 covariate, Breslow
    * ties) as chained DuckDB CTEs — the same pinned-iteration technique
    * as StatQueries.irlsSql: NR is a contraction, so engine ulp
    * differences in the group sums decay instead of amplifying. Emits
    * CTEs `base`, `it0(b)`..`it$iters(b)` plus per-iteration `g$k`/`sc$k`
    * (the last of which carries the information sum at the penultimate
    * β, matching CoxPH.fit's `lastInfo`). */
  private[relational] def coxNrCtes(iters: Int, baseSql: String): String = {
    val sb = new StringBuilder
    sb.append(s"WITH base AS ($baseSql),\n")
    sb.append("it0(b) AS (SELECT CAST(0.0 AS DOUBLE)),\n")
    for (k <- 1 to iters) {
      sb.append(
        s"""g$k AS (SELECT t,
           |    SUM(w*EXP(p.b*x)) AS s0g, SUM(w*EXP(p.b*x)*x) AS s1g,
           |    SUM(w*EXP(p.b*x)*x*x) AS s2g,
           |    SUM(w*d) AS wd, SUM(w*d*x) AS ux, MAX(p.b) AS b
           |  FROM base, it${k - 1} p GROUP BY t),
           |sc$k AS (SELECT t, wd, ux, b,
           |    SUM(s0g) OVER rw AS s0, SUM(s1g) OVER rw AS s1,
           |    SUM(s2g) OVER rw AS s2
           |  FROM g$k WINDOW rw AS (ORDER BY t DESC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |it$k(b) AS (SELECT MAX(b)
           |    + SUM(ux - wd*s1/s0) / SUM(wd*(s2/s0 - s1*s1/(s0*s0)))
           |  FROM sc$k WHERE wd > 0),
           |""".stripMargin)
    }
    sb.toString.stripSuffix(",\n")
  }

  private val survBaseSql =
    """SELECT l_quantity AS t,
      |  CASE WHEN l_returnflag <> 'A' THEN 1.0 ELSE 0.0 END AS d,
      |  1.0 + (l_orderkey % 5) AS w,
      |  l_discount * 10 AS x, l_orderkey FROM lineitem
      |WHERE l_orderkey % 3 = 0""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // ---- S2: sink roundtrip — parquet write → read → CSV write →
    //      schema-enforced CSV read must reproduce the source rows ----
    sqlChecked("s2_sink",
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_s2").toString
      val df = t(s, d, "nation").select("n_nationkey", "n_name", "n_regionkey")
      df.write.mode("overwrite").parquet(s"$tmp/p")
      s.read.parquet(s"$tmp/p")
        .write.mode("overwrite").option("header", "true").csv(s"$tmp/c")
      s.read.option("header", "true").schema(df.schema).csv(s"$tmp/c")
        .orderBy("n_nationkey")
    },

    // ---- A8: kernel-weight Jacobian ∂kw/∂γ (Gaussian closed form) ----
    sqlChecked("a8_kw_jacobian",
      """WITH sv AS (SELECT c_custkey AS sid, c_acctbal / 1000.0 AS qs,
        |    1.0 + (c_custkey % 3) AS wt, c_nationkey / 10.0 AS xs
        |  FROM customer WHERE c_custkey % 97 = 0),
        |ch AS (SELECT s_suppkey AS cid, s_acctbal / 1000.0 AS qc,
        |    s_nationkey / 10.0 AS xc
        |  FROM supplier WHERE s_suppkey % 7 = 0),
        |p AS (SELECT sid, cid, wt, (qs - qc) / 0.5 AS u, xs, xc
        |  FROM sv CROSS JOIN ch),
        |k AS (SELECT sid, cid, wt,
        |    EXP(-u * u / 2) / SQRT(2 * PI()) AS k,
        |    (-u) * EXP(-u * u / 2) / SQRT(2 * PI()) * (xs - xc) / 0.5 AS dk
        |  FROM p),
        |r AS (SELECT sid, SUM(k) AS row_k, SUM(dk) AS row_dk
        |  FROM k GROUP BY sid)
        |SELECT cid AS c_id, ROUND(SUM(wt * k / row_k), 8) AS kw,
        |  ROUND(SUM(wt * (dk * row_k - k * row_dk) / (row_k * row_k)), 8)
        |    AS d_kw_0
        |FROM k JOIN r USING (sid) WHERE row_k > 0
        |GROUP BY cid ORDER BY c_id""".stripMargin) { (s, d) =>
      val surv = t(s, d, "customer").filter(col("c_custkey") % 97 === 0)
        .select(col("c_custkey").as("sid"),
          (col("c_acctbal") / 1000.0).as("qs"),
          (lit(1.0) + col("c_custkey") % 3).cast("double").as("wt"),
          (col("c_nationkey") / 10.0).as("xs"))
      val coh = t(s, d, "supplier").filter(col("s_suppkey") % 7 === 0)
        .select(col("s_suppkey").as("cid"),
          (col("s_acctbal") / 1000.0).as("qc"),
          (col("s_nationkey") / 10.0).as("xc"))
      graft.weights.KernelWeights.jacobian(
          surv, col("sid"), col("qs"), col("wt"),
          coh, col("cid"), col("qc"), h = 0.5,
          sFeatures = Seq(col("xs")), cFeatures = Seq(col("xc")))
        .select(col("c_id"), round(col("kw"), 8).as("kw"),
          round(col("d_kw_0"), 8).as("d_kw_0"))
        .orderBy(col("c_id"))
    },

    // ---- sliding windows: each event lands in 2 overlapping 1h/30m buckets ----
    sqlChecked("ev_sliding",
      """WITH b AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS w1, value FROM events),
        |exploded AS (
        |  SELECT w1 AS win, value FROM b
        |  UNION ALL
        |  SELECT w1 - INTERVAL '30 minutes' AS win, value FROM b)
        |SELECT CAST(epoch(win) AS BIGINT) AS win, COUNT(*) AS n,
        |  ROUND(SUM(value), 2) AS v
        |FROM exploded GROUP BY 1 ORDER BY win""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
        .select(unix_timestamp(col("w.start")).as("win"), col("n"), col("v"))
        .orderBy(col("win"))
    },

    // ---- approximate sketches: the documented scale path for exact
    //      percentile / count-distinct (rows-only: sketch internals are
    //      engine-specific; accuracy asserted in ApproxSpec) ----
    rowsOnly("a_approx_sketches") { (s, d) =>
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("acd_part"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p50_approx"),
          count_min_sketch(col("l_suppkey"), lit(0.01), lit(0.95), lit(42))
            .as("cms"))
        .select(col("l_returnflag"), col("acd_part"), col("p50_approx"),
          length(col("cms")).cast("long").as("cms_bytes"))
        .orderBy(col("l_returnflag"))
    },

    // ---- M13 integrated: joint (β,γ)-corrected PPS variance of Cox β,
    //      4 pinned NR iterations + the full influence algebra replayed
    //      by DuckDB (deterministic l_orderkey%3 subset) ----
    sqlChecked("m13_joint_var",
      coxNrCtes(4, survBaseSql) + ",\n" +
        """i3(i1) AS (SELECT SUM(wd*(s2/s0 - s1*s1/(s0*s0)))
          |  FROM sc4 WHERE wd > 0),
          |g5 AS (SELECT t, SUM(w*EXP(p.b*x)) AS s0g,
          |    SUM(w*EXP(p.b*x)*x) AS s1g, SUM(w*d) AS wd
          |  FROM base, it4 p GROUP BY t),
          |sc5 AS (SELECT t, wd,
          |    SUM(s0g) OVER rw AS s0, SUM(s1g) OVER rw AS s1
          |  FROM g5 WINDOW rw AS (ORDER BY t DESC
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          |steps AS (SELECT t, s0, s1,
          |    SUM(CASE WHEN wd > 0 THEN wd/s0 ELSE 0 END) OVER pw AS G0,
          |    SUM(CASE WHEN wd > 0 THEN wd*s1/(s0*s0) ELSE 0 END) OVER pw AS G1
          |  FROM sc5 WINDOW pw AS (ORDER BY t ASC
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          |unit AS (SELECT b.d, b.x, EXP(p.b*b.x) AS rh,
          |    s.s0, s.s1, s.G0, s.G1, i.i1
          |  FROM base b JOIN steps s ON b.t = s.t
          |  CROSS JOIN it4 p CROSS JOIN i3 i),
          |dev AS (SELECT (d*(x - s1/s0) - rh*(x*G0 - G1)) / i1 AS dbeta
          |  FROM unit)
          |SELECT ROUND((SELECT b FROM it4), 8) AS beta,
          |  ROUND(VAR_SAMP(dbeta) * COUNT(*), 10) AS v_pps
          |FROM dev""".stripMargin) { (s, d) =>
      import s.implicits._
      val base = t(s, d, "lineitem").filter(col("l_orderkey") % 3 === 0).select(
        col("l_quantity").cast("double").as("t"),
        when(col("l_returnflag") =!= "A", 1.0).otherwise(0.0).as("d"),
        (lit(1.0) + col("l_orderkey") % 5).cast("double").as("w"),
        (col("l_discount") * 10).cast("double").as("x"))
      val fit = CoxPH.fit(base, col("t"), col("d"), col("w"), Seq(col("x")),
        maxIter = 4, tol = 0.0)
      val dev = CoxInfluence.deviates(base, col("t"), col("d"), col("w"),
        Seq(col("x")), fit.coefficients, fit.infoPacked,
        sizeHint = graft.core.Windows.SizeHint.Small)
      val corrected = JointVariance.ipswCorrectedDeviates(dev, p = 1,
        psWeight = col("__w"), psFeatures = Seq(col("__x0")),
        gammaDevs = Seq(lit(0.0)), infoPacked = fit.infoPacked)
      val v = JointVariance.ppsVariance(corrected, p = 1)
      Seq((rnd(fit.coefficients(0), 8), rnd(v(0), 10))).toDF("beta", "v_pps")
    },

    // ---- M14×M2 integrated: all-replicates-at-once jackknifed Cox,
    //      3 pinned NR iterations per replicate, DuckDB replaying all
    //      10 replicates through grouped windows ----
    sqlChecked("m14_cox_jk",
      s"""WITH b0 AS ($survBaseSql),
         |r(rep) AS (SELECT CAST(range AS INT) FROM range(10)),
         |base AS (SELECT rep, t, d, x,
         |    CASE WHEN l_orderkey % 10 = rep THEN 0.0
         |         ELSE w * 10.0 / 9.0 END AS w
         |  FROM b0 CROSS JOIN r),
         |it0 AS (SELECT rep, CAST(0.0 AS DOUBLE) AS b FROM r),
         |""".stripMargin +
        (1 to 3).map { k =>
          s"""g$k AS (SELECT base.rep, t,
             |    SUM(w*EXP(p.b*x)) AS s0g, SUM(w*EXP(p.b*x)*x) AS s1g,
             |    SUM(w*EXP(p.b*x)*x*x) AS s2g,
             |    SUM(w*d) AS wd, SUM(w*d*x) AS ux, MAX(p.b) AS b
             |  FROM base JOIN it${k - 1} p ON base.rep = p.rep
             |  GROUP BY base.rep, t),
             |sc$k AS (SELECT rep, t, wd, ux, b,
             |    SUM(s0g) OVER rw AS s0, SUM(s1g) OVER rw AS s1,
             |    SUM(s2g) OVER rw AS s2
             |  FROM g$k WINDOW rw AS (PARTITION BY rep ORDER BY t DESC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |it$k AS (SELECT rep, MAX(b)
             |    + SUM(ux - wd*s1/s0) / SUM(wd*(s2/s0 - s1*s1/(s0*s0))) AS b
             |  FROM sc$k WHERE wd > 0 GROUP BY rep),
             |""".stripMargin
        }.mkString +
        """est AS (SELECT rep, b AS beta FROM it3)
          |SELECT ROUND(9.0 / 10.0 *
          |    SUM((beta - t_bar) * (beta - t_bar)), 12) AS jk_var_beta
          |FROM est, (SELECT AVG(beta) AS t_bar FROM est)""".stripMargin) { (s, d) =>
      import s.implicits._
      val m = 10
      val base = t(s, d, "lineitem").filter(col("l_orderkey") % 3 === 0).select(
        col("l_orderkey"),
        col("l_quantity").cast("double").as("t"),
        when(col("l_returnflag") =!= "A", 1.0).otherwise(0.0).as("d"),
        (lit(1.0) + col("l_orderkey") % 5).cast("double").as("w"),
        (col("l_discount") * 10).cast("double").as("x"))
      val rep = Jackknife.replicated(base, (col("l_orderkey") % m).cast("int"),
        col("w"), m)
      val joint = graft.stats.CoxPHReplicated.fit(rep, col("jk_r"), col("t"),
        col("d"), col("jk_wt"), Seq(col("x")), m, maxIter = 3, tol = 0.0)
      val est = joint.betas.toSeq.map { case (r, b) => (r, b(0)) }.toDF("r", "beta")
      val v = Jackknife.variance(est, col("beta"), m).head().getDouble(0)
      Seq(rnd(v, 12)).toDF("jk_var_beta")
    },

  )
  // §3.1 Monte-Carlo driver (pipeline.Simulation) is exercised by
  // SimulationSpec rather than declared as a query: its ~40 NR/IRLS
  // iterations would dominate the benchmark without adding oracle value.
}
