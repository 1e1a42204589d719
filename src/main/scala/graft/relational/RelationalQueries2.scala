package graft.relational

import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Second relational batch: the long tail of the extended surface —
  * cube/grouping sets, navigation windows, regex extraction, correlated
  * subqueries, TPC-H-style date-filtered join-agg-topk, distinct
  * aggregates, array operations.
  */
object RelationalQueries2 {
  import QueryDef._

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val all: Seq[QueryDef] = Seq(

    sqlChecked("agg_cube",
      """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS l_linestatus,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"), col("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    sqlChecked("w_lead_lag",
      """SELECT o_custkey, o_orderkey,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS od,
        |  COALESCE(CAST(epoch(LAG(o_orderdate) OVER w) AS BIGINT), 0) AS prev_od,
        |  COALESCE(CAST(epoch(LEAD(o_orderdate) OVER w) AS BIGINT), 0) AS next_od,
        |  NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, od, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val wq = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, d, "orders").select(col("o_custkey"), col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("od"),
          coalesce(unix_timestamp(lag(col("o_orderdate"), 1).over(w)), lit(0L)).as("prev_od"),
          coalesce(unix_timestamp(lead(col("o_orderdate"), 1).over(w)), lit(0L)).as("next_od"),
          ntile(4).over(wq).as("quartile"))
        .orderBy(col("o_custkey"), col("od"), col("o_orderkey"))
    },

    sqlChecked("f_regexp",
      """SELECT p_partkey,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |  len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      t(s, d, "part").select(col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          size(expr("regexp_extract_all(p_name, '[aeiou]', 0)")).as("n_vowels"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))
        .orderBy(col("p_partkey"))
    },

    sqlChecked("j_exists_subquery",
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |              AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val big = t(s, d, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_custkey"))
      t(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    sqlChecked("q3_shipping",
      """SELECT l_orderkey,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS od
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-06-30'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin) { (s, d) =>
      t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01"))),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem")
          .filter(col("l_shipdate") > to_timestamp(lit("1996-06-30"))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          unix_timestamp(col("o_orderdate")).as("od"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    },

    // ---- TPC-H Q5 shape: six-table join with the local-supplier
    //      constraint (customer and supplier in the SAME nation) —
    //      the canonical join-ordering exercise. Dimension chain
    //      (region→nation) broadcasts; the fact-side joins shuffle on
    //      their keys and AQE reorders freely. ----
    sqlChecked("q5_region_volume",
      """SELECT n_name,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01"))),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, d, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    sqlChecked("a_distinct",
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_suppkey) AS n_supp,
        |  COUNT(DISTINCT l_partkey) AS n_part,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_ord
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          countDistinct(col("l_orderkey")).as("n_ord"))
        .orderBy(col("l_returnflag"))
    },

    sqlChecked("f_array_ops",
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_el,
        |  ROUND(list_sum(CAST(embedding AS DOUBLE[])), 5) AS el_sum,
        |  ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS el_max
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      val v = col("embedding").cast("array<double>")
      t(s, d, "embeddings").select(col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(v, 1), 6).as("first_el"),
          round(aggregate(v, lit(0.0), _ + _), 5).as("el_sum"),
          round(array_max(v), 6).as("el_max"))
        .orderBy(col("vec_id"))
    },

    // first/last ordered aggregates (max_by/min_by)
    sqlChecked("a_argmax",
      """WITH r AS (SELECT c_nationkey, c_custkey,
        |  ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal DESC, c_custkey DESC) AS rmax,
        |  ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal ASC, c_custkey ASC) AS rmin
        |  FROM customer)
        |SELECT c_nationkey,
        |  MAX(CASE WHEN rmax = 1 THEN c_custkey END) AS richest,
        |  MAX(CASE WHEN rmin = 1 THEN c_custkey END) AS poorest
        |FROM r GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, d) =>
      t(s, d, "customer").groupBy(col("c_nationkey"))
        .agg(max_by(col("c_custkey"), struct(col("c_acctbal"), col("c_custkey")))
            .as("richest"),
          min_by(col("c_custkey"), struct(col("c_acctbal"), col("c_custkey")))
            .as("poorest"))
        .orderBy(col("c_nationkey"))
    },

    sqlChecked("w_pct_rank",
      """SELECT o_orderkey,
        |  ROUND(PERCENT_RANK() OVER w, 8) AS pr,
        |  ROUND(CUME_DIST() OVER w, 8) AS cd
        |FROM orders
        |WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      // Global rank via the two-phase distributed scan (Windows.scan):
      // range-repartition on the order key, local row numbers, tiny
      // per-partition offset table broadcast back — never the
      // single-partition `Window.orderBy` funnel. The tiebreak key
      // (o_orderkey) is unique, so rank == row_number == running count
      // and cume_dist == rank/N exactly; percent_rank == (rank-1)/(N-1).
      // Both are exact-integer double divisions — bit-identical to the
      // window-function definitions on either engine.
      val orders = t(s, d, "orders")
      val ranked = graft.core.Windows.scan(orders,
        Seq(col("o_totalprice"), col("o_orderkey")),
        Seq((lit(1.0), "__rnk")),
        sizeHint = graft.core.Windows.SizeHint.Large)
      // N from the SOURCE table (a metadata-only parquet count), not
      // from re-scanning the persisted ranked frame
      val n = orders.count().toDouble
      ranked
        .select(col("o_orderkey"),
          round((col("__rnk") - 1.0) / lit(n - 1.0), 8).as("pr"),
          round(col("__rnk") / lit(n), 8).as("cd"))
        .orderBy(col("o_orderkey"))
    },

    sqlChecked("f_null_battery",
      """SELECT c_custkey,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'WAS_BUILDING') AS seg2,
        |  CASE WHEN c_acctbal IS NULL THEN -1.0
        |       WHEN c_acctbal < 0 THEN 0.0 ELSE ROUND(c_acctbal, 2) END AS bal3,
        |  CAST(c_acctbal IS NOT NULL AS INT) AS has_bal,
        |  IFNULL(NULL, c_nationkey) AS nk
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer").select(col("c_custkey"),
          coalesce(when(col("c_mktsegment") =!= "BUILDING", col("c_mktsegment")),
            lit("WAS_BUILDING")).as("seg2"),
          when(col("c_acctbal").isNull, -1.0)
            .when(col("c_acctbal") < 0, 0.0)
            .otherwise(round(col("c_acctbal"), 2)).as("bal3"),
          col("c_acctbal").isNotNull.cast("int").as("has_bal"),
          coalesce(lit(null), col("c_nationkey")).as("nk"))
        .orderBy(col("c_custkey"))
    },

    sqlChecked("f_datemath",
      """SELECT o_orderkey,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
        |  CAST(epoch(o_orderdate + INTERVAL '90 days') AS BIGINT) AS due,
        |  CAST(dayofweek(o_orderdate) AS INT) AS dow,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      t(s, d, "orders").select(col("o_orderkey"),
          datediff(col("o_orderdate"), to_timestamp(lit("1995-01-01")))
            .cast("long").as("days_since"),
          unix_timestamp(col("o_orderdate") + expr("INTERVAL 90 days")).as("due"),
          (dayofweek(col("o_orderdate")) - 1).cast("int").as("dow"),
          quarter(col("o_orderdate")).cast("int").as("qtr"))
        .orderBy(col("o_orderkey"))
    },

    sqlChecked("set_union_distinct",
      """SELECT id FROM (
        |  SELECT o_custkey AS id FROM orders WHERE o_orderstatus = 'O'
        |  UNION
        |  SELECT c_custkey AS id FROM customer WHERE c_acctbal < 0)
        |ORDER BY id""".stripMargin) { (s, d) =>
      t(s, d, "orders").filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("id"))
        .union(t(s, d, "customer").filter(col("c_acctbal") < 0)
          .select(col("c_custkey").as("id")))
        .distinct()
        .orderBy(col("id"))
    },

    // conditional aggregation with FILTER clause
    sqlChecked("a_filter_clause",
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  ROUND(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 0), 2) AS tot_o
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      t(s, d, "orders").groupBy(col("o_orderpriority"))
        .agg(count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          round(coalesce(sum(when(col("o_orderstatus") === "O", col("o_totalprice"))),
            lit(0)), 2).as("tot_o"))
        .orderBy(col("o_orderpriority"))
    }
  )
}
