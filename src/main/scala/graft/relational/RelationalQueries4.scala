package graft.relational

import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fourth relational batch: bivariate regression aggregates, ordered
  * string aggregation, pivot/unpivot reshaping, and array explode with
  * ordinality — the remaining SQL-surface families a user migrating
  * analytic workloads would reach for.
  */
object RelationalQueries4 {
  import QueryDef._

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val all: Seq[QueryDef] = Seq(

    // ---- bivariate regression/correlation aggregates: one hash
    //      aggregate computes the full co-moment family per group
    //      (partial+final merge, the same 100 TB shape as any grouped
    //      sum). Rounding digits sized to each statistic's magnitude
    //      so engine-side summation-order ulps cannot flip a digit. ----
    sqlChecked("a_regr",
      """SELECT l_returnflag, COUNT(*) AS n,
        |  ROUND(corr(l_extendedprice, l_quantity), 8) AS r,
        |  ROUND(covar_samp(l_extendedprice, l_quantity), 4) AS cov,
        |  ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        |  ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
        |  ROUND(regr_r2(l_extendedprice, l_quantity), 8) AS r2
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val (y, x) = (col("l_extendedprice"), col("l_quantity"))
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(corr(y, x), 8).as("r"),
          round(covar_samp(y, x), 4).as("cov"),
          round(regr_slope(y, x), 6).as("slope"),
          round(regr_intercept(y, x), 4).as("icept"),
          round(regr_r2(y, x), 8).as("r2"))
        .orderBy(col("l_returnflag"))
    },

    // ---- ordered string aggregation (listagg): deterministic via an
    //      explicit ORDER BY inside the aggregate; the Spark side sorts
    //      the collected array so the result is partitioning-independent
    //      (collect_list order is otherwise nondeterministic) ----
    sqlChecked("a_string_agg",
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin) { (s, d) =>
      t(s, d, "nation")
        .join(t(s, d, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",")
          .as("nations"))
        .orderBy(col("r_name"))
    },

    // ---- PIVOT long→wide with an EXPLICIT value list: naming the
    //      pivot values skips the extra distinct-scan job Spark
    //      otherwise runs to discover them, and fixes the output schema
    //      regardless of which values a partition happens to hold ----
    sqlChecked("p_pivot",
      """SELECT l_returnflag,
        |  ROUND(CAST(SUM(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS qty_f,
        |  ROUND(CAST(SUM(CASE WHEN l_linestatus = 'O'
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")))
        .select(col("l_returnflag"),
          round(col("F").cast("double"), 2).as("qty_f"),
          round(col("O").cast("double"), 2).as("qty_o"))
        .orderBy(col("l_returnflag"))
    },

    // ---- UNPIVOT wide→long (melt): the inverse reshape; NULL cells
    //      dropped explicitly on both sides (engines differ on the
    //      default) ----
    sqlChecked("p_unpivot",
      """WITH p AS (
        |  SELECT l_returnflag,
        |    ROUND(CAST(SUM(CASE WHEN l_linestatus = 'F'
        |      THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS qty_f,
        |    ROUND(CAST(SUM(CASE WHEN l_linestatus = 'O'
        |      THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS qty_o
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, ls, qty FROM (
        |  SELECT l_returnflag, 'qty_f' AS ls, qty_f AS qty FROM p
        |  UNION ALL
        |  SELECT l_returnflag, 'qty_o' AS ls, qty_o AS qty FROM p)
        |WHERE qty IS NOT NULL
        |ORDER BY l_returnflag, ls""".stripMargin) { (s, d) =>
      val wide = t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")))
        .select(col("l_returnflag"),
          round(col("F").cast("double"), 2).as("qty_f"),
          round(col("O").cast("double"), 2).as("qty_o"))
      wide.unpivot(Array(col("l_returnflag")),
          Array(col("qty_f"), col("qty_o")), "ls", "qty")
        .filter(col("qty").isNotNull)
        .orderBy(col("l_returnflag"), col("ls"))
    },

    // ---- grouped exact percentiles: per-group interpolated quantiles
    //      + median, the reference's quantile/bandwidth machinery (O6)
    //      grouped. Computed with the radix rank search
    //      (WeightedQuantile.interpolatedQuantiles), NOT the builtin
    //      `percentile` aggregate: that aggregate buffers a per-group
    //      value-count map — data-sized state that at the 100× probe
    //      meant ~20M-entry maps per group, 158 s and GC-bound
    //      variance. The rank search is three bounded scans per value
    //      column and measured 85× → ~8× there. ----
    sqlChecked("a_pctile_grouped",
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6) AS p50,
        |  ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9), 6) AS p90,
        |  ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS med_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      import graft.stats.WeightedQuantile.interpolatedQuantiles
      // BOTH value columns ride one rank search: each row explodes to
      // (column id, value) and the column id joins the group key, so
      // the three radix scans are shared instead of paid per column
      // (qty's unused 0.9 target costs a few extra histogram rows)
      val ex = t(s, d, "lineitem")
        .select(col("l_returnflag"), explode(array(
          struct(lit(0).as("ci"),
            col("l_extendedprice").cast("double").as("v")),
          struct(lit(1).as("ci"),
            col("l_quantity").cast("double").as("v")))).as("e"))
        .select(struct(col("l_returnflag").as("rf"),
          col("e.ci").as("ci")).as("g"), col("e.v").as("v"))
      val q = interpolatedQuantiles(ex, col("g"), col("v"), lit(1L),
        Seq(0.5, 0.9))
      q.groupBy(col("grp.rf").as("l_returnflag"))
        .agg(
          round(min(when(col("grp.ci") === 0, col("q_0"))), 6).as("p50"),
          round(min(when(col("grp.ci") === 0, col("q_1"))), 6).as("p90"),
          round(min(when(col("grp.ci") === 1, col("q_0"))), 6).as("med_qty"))
        .orderBy(col("l_returnflag"))
    },

    // ---- boolean / conditional aggregates: count_if + bool_and/bool_or
    //      (every one folds into the same partial+final hash aggregate) ----
    sqlChecked("f_bool_agg",
      """SELECT o_orderpriority,
        |  CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
        |  bool_and(o_totalprice > 900) AS all_above,
        |  bool_or(o_orderstatus = 'F') AS any_f
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      t(s, d, "orders").groupBy(col("o_orderpriority"))
        .agg(count_if(col("o_totalprice") > 150000).as("n_big"),
          bool_and(col("o_totalprice") > 900).as("all_above"),
          bool_or(col("o_orderstatus") === "F").as("any_f"))
        .orderBy(col("o_orderpriority"))
    },

    // ---- rolling windowed median: an exact percentile aggregate over
    //      a moving ROWS frame (order-statistic smoothing per key) ----
    sqlChecked("w_rolling_median",
      """SELECT o_custkey, o_orderkey,
        |  ROUND(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS med3
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, 0)
      t(s, d, "orders").select(col("o_custkey"), col("o_orderkey"),
          round(percentile(col("o_totalprice").cast("double"), lit(0.5)).over(w), 4)
            .as("med3"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // ---- array explode WITH ORDINALITY: posexplode keeps the element
    //      index (0-based; the oracle's 1-based subscripts shifted to
    //      match), the lateral-view building block for any
    //      array-of-features table ----
    sqlChecked("f_explode",
      """SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS i,
        |  ROUND(CAST(unnest(embedding) AS DOUBLE), 6) AS v
        |FROM embeddings WHERE vec_id % 53 = 0
        |ORDER BY vec_id, i""".stripMargin) { (s, d) =>
      t(s, d, "embeddings").filter(col("vec_id") % 53 === 0)
        .select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("i", "v")))
        .select(col("vec_id"), col("i"),
          round(col("v").cast("double"), 6).as("v"))
        .orderBy(col("vec_id"), col("i"))
    },

    // ---- ntile + cume_dist: equi-count bucketing and empirical CDF
    //      within each priority partition. o_orderpriority has ~5
    //      distinct values, so `Window.partitionBy(priority)` is a
    //      DATA-SIZED window (each of 5 tasks sorts a fifth of the
    //      table — the grouped-scan skew trap). Instead: per-group rank
    //      from the two-phase grouped scan (order stays contiguous
    //      across range partitions, offsets from the tiny boundary
    //      table), per-group counts broadcast back, and both NTILE and
    //      CUME_DIST recovered in closed form from (rank, n). The
    //      (price, key) tiebreak is unique, so rank == running count:
    //      cume_dist = rank/n exactly, and NTILE's first (n mod k)
    //      buckets carry ceil(n/k) rows (the SQL-standard definition
    //      both engines implement). ----
    sqlChecked("w_ntile",
      """SELECT o_orderkey,
        |  NTILE(7) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS bucket,
        |  ROUND(CUME_DIST() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey), 10) AS cd
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val k = 7
      val orders = t(s, d, "orders")
      val ranked = graft.core.Windows.groupedScan(orders,
        Seq(col("o_orderpriority")),
        Seq(col("o_totalprice"), col("o_orderkey")),
        Seq((lit(1.0), "__rnk")),
        sizeHint = graft.core.Windows.SizeHint.Large)
      val counts = orders.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("__gn"))
      val r = col("__rnk").cast("long")
      val n = col("__gn")
      val base = expr(s"__gn div $k")
      val rem = n % k
      val big = rem * (base + 1L) // rows covered by the (base+1)-sized buckets
      val bucket = when(r <= big, floor((r - 1L) / (base + 1L)) + 1L)
        .otherwise(rem + floor((r - 1L - big) / base) + 1L)
      ranked.join(broadcast(counts), Seq("o_orderpriority"))
        .select(col("o_orderkey"), bucket.cast("int").as("bucket"),
          round(r.cast("double") / n.cast("double"), 10).as("cd"))
        .orderBy(col("o_orderkey"))
    },

    // ---- higher central moments from EXACT integral power sums:
    //      l_quantity is integer-valued, so Σx²/Σx³/Σx⁴ are exact in
    //      either engine in any summation order — skewness/kurtosis
    //      derived from the same closed form on both sides (built-in
    //      skewness() definitions differ across engines; the moment
    //      algebra doesn't) ----
    sqlChecked("a_moments",
      """WITH s AS (SELECT l_returnflag AS flag, COUNT(*) AS n,
        |    SUM(l_quantity) AS s1, SUM(l_quantity*l_quantity) AS s2,
        |    SUM(l_quantity*l_quantity*l_quantity) AS s3,
        |    SUM(l_quantity*l_quantity*l_quantity*l_quantity) AS s4
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT flag, n,
        |  ROUND(s1 / n, 8) AS mean,
        |  ROUND((s2 / n - (s1 / n) * (s1 / n)), 8) AS m2,
        |  ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
        |    / POW(s2 / n - (s1 / n) * (s1 / n), 1.5), 8) AS skew,
        |  ROUND((s4 / n - 4 * (s1 / n) * (s3 / n)
        |      + 6 * (s1 / n) * (s1 / n) * (s2 / n)
        |      - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
        |    / POW(s2 / n - (s1 / n) * (s1 / n), 2.0) - 3.0, 8) AS ex_kurt
        |FROM s ORDER BY flag""".stripMargin) { (s, d) =>
      val x = col("l_quantity").cast("double")
      val g = t(s, d, "lineitem").groupBy(col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("n"), sum(x).as("s1"), sum(x * x).as("s2"),
          sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4"))
      val n = col("n").cast("double")
      val (m1, r2, r3, r4) = (col("s1") / n, col("s2") / n, col("s3") / n,
        col("s4") / n)
      g.select(col("flag"), col("n"), round(m1, 8).as("mean"),
          round(r2 - m1 * m1, 8).as("m2"),
          round((r3 - lit(3) * m1 * r2 + lit(2) * m1 * m1 * m1)
            / pow(r2 - m1 * m1, 1.5), 8).as("skew"),
          round((r4 - lit(4) * m1 * r3 + lit(6) * m1 * m1 * r2
              - lit(3) * m1 * m1 * m1 * m1)
            / pow(r2 - m1 * m1, 2.0) - 3.0, 8).as("ex_kurt"))
        .orderBy(col("flag"))
    },
  )
}
