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

  val all: Seq[QueryDef] = Seq(

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

    // ---- M13 integrated: joint (β,γ)-corrected PPS variance of Cox β ----
    rowsOnly("m13_joint_var") { (s, d) =>
      import s.implicits._
      val base = t(s, d, "lineitem").limit(20000).select(
        col("l_quantity").cast("double").as("t"),
        when(col("l_returnflag") =!= "A", 1.0).otherwise(0.0).as("d"),
        (lit(1.0) + col("l_orderkey") % 5).cast("double").as("w"),
        (col("l_discount") * 10).cast("double").as("x"))
      val fit = CoxPH.fit(base, col("t"), col("d"), col("w"), Seq(col("x")))
      val dev = CoxInfluence.deviates(base, col("t"), col("d"), col("w"),
        Seq(col("x")), fit.coefficients, fit.infoPacked)
      val corrected = JointVariance.ipswCorrectedDeviates(dev, p = 1,
        psWeight = col("__w"), psFeatures = Seq(col("__x0")),
        gammaDevs = Seq(lit(0.0)), infoPacked = fit.infoPacked)
      val v = JointVariance.ppsVariance(corrected, p = 1)
      Seq((fit.coefficients(0), v(0), fit.iterations))
        .toDF("beta", "v_pps", "iters")
    },

    // ---- M14×M2 integrated: all-replicates-at-once jackknifed Cox ----
    rowsOnly("m14_cox_jk") { (s, d) =>
      import s.implicits._
      val m = 10
      val base = t(s, d, "lineitem").limit(20000).select(
        col("l_orderkey"),
        col("l_quantity").cast("double").as("t"),
        when(col("l_returnflag") =!= "A", 1.0).otherwise(0.0).as("d"),
        (lit(1.0) + col("l_orderkey") % 5).cast("double").as("w"),
        (col("l_discount") * 10).cast("double").as("x"))
      val rep = Jackknife.replicated(base, (col("l_orderkey") % m).cast("int"),
        col("w"), m)
      val joint = graft.stats.CoxPHReplicated.fit(rep, col("jk_r"), col("t"),
        col("d"), col("jk_wt"), Seq(col("x")), m)
      val est = joint.betas.toSeq.map { case (r, b) => (r, b(0)) }.toDF("r", "beta")
      val v = Jackknife.variance(est, col("beta"), m).head().getDouble(0)
      Seq((v, joint.iterations, joint.maxScoreResidual))
        .toDF("jk_var_beta", "iters", "max_score_residual")
    },

  )
  // §3.1 Monte-Carlo driver (pipeline.Simulation) is exercised by
  // SimulationSpec rather than declared as a query: its ~40 NR/IRLS
  // iterations would dominate the benchmark without adding oracle value.
}
