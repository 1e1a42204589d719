package graft.relational

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Sixth relational batch: time-series diagnostics over the event
  * stream (autocorrelation, CUSUM change detection) and the TPC-H Q18
  * large-volume-order shape.
  */
object RelationalQueries6 {
  import QueryDef._

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** Hourly event counts keyed by epoch seconds. Counts are integers,
    * so Σv and the mean Σv/n are the same exact doubles on any engine —
    * deviations from the mean are then engine-deterministic. */
  private def hourly(s: SparkSession, d: String) =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour")("start").as("hr"))
      .agg(count(lit(1)).cast("double").as("v"))
      .select(unix_timestamp(col("hr")).as("hre"), col("v"))

  private val hourlySql =
    """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT)
      |    AS hre, CAST(COUNT(*) AS DOUBLE) AS v
      |  FROM events GROUP BY 1""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // ---- lag-k autocorrelation of the hourly event-count series,
    //      k = 1..3: the seasonality probe for stream monitoring. The
    //      series is hour-cardinality-bounded after one time-bucket
    //      aggregate; lags come from an integer epoch equi-join, not a
    //      window shift. ----
    sqlChecked("ev_autocorr",
      s"""WITH h AS ($hourlySql),
         |m AS (SELECT SUM(v) / COUNT(*) AS mu FROM h),
         |dv AS (SELECT hre, v - mu AS dev FROM h CROSS JOIN m),
         |den AS (SELECT SUM(dev * dev) AS den FROM dv),
         |k AS (SELECT unnest([1, 2, 3]) AS k),
         |num AS (SELECT k.k AS k, SUM(a.dev * b.dev) AS num,
         |    CAST(COUNT(*) AS BIGINT) AS n_pairs
         |  FROM k CROSS JOIN dv a
         |  JOIN dv b ON b.hre = a.hre + k.k * 3600 GROUP BY k.k)
         |SELECT k, ROUND(num / den, 6) AS acf, n_pairs
         |FROM num CROSS JOIN den ORDER BY k""".stripMargin) { (s, d) =>
      import s.implicits._
      val h = hourly(s, d)
      val m = h.agg((sum(col("v")) / count(lit(1))).as("mu"))
      val dv = h.crossJoin(broadcast(m))
        .select(col("hre"), (col("v") - col("mu")).as("dev"))
      val den = dv.agg(sum(col("dev") * col("dev")).as("den"))
      val lags = Seq(1, 2, 3).toDF("k")
      dv.as("a").crossJoin(broadcast(lags))
        .join(dv.as("b"),
          col("b.hre") === col("a.hre") + col("k") * 3600)
        .groupBy(col("k"))
        .agg(sum(col("a.dev") * col("b.dev")).as("num"),
          count(lit(1)).as("n_pairs"))
        .crossJoin(broadcast(den))
        .select(col("k"), round(col("num") / col("den"), 6).as("acf"),
          col("n_pairs"))
        .orderBy(col("k"))
    },

    // ---- CUSUM change-point scan over the hourly series: the hour
    //      with the largest |cumulative deviation from the mean| — the
    //      classic level-shift detector. The prefix scan runs in one
    //      fixed ascending order over exact-identical doubles, so the
    //      argmax row matches across engines bit-for-bit. ----
    sqlChecked("ev_cusum",
      s"""WITH h AS ($hourlySql),
         |m AS (SELECT SUM(v) / COUNT(*) AS mu,
         |    CAST(COUNT(*) AS BIGINT) AS nh FROM h),
         |c AS (SELECT hre, SUM(v - mu) OVER (ORDER BY hre
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
         |  FROM h CROSS JOIN m)
         |SELECT ROUND(ABS(cusum), 4) AS cusum_max, hre AS at_hr,
         |  (SELECT nh FROM m) AS n_hours
         |FROM c ORDER BY ABS(cusum) DESC, hre LIMIT 1""".stripMargin) { (s, d) =>
      val h = hourly(s, d)
      val m = h.agg((sum(col("v")) / count(lit(1))).as("mu"),
        count(lit(1)).as("nh"))
      val c = graft.core.Windows.scan(
        h.crossJoin(broadcast(m))
          .withColumn("dev", col("v") - col("mu")),
        Seq(col("hre")), Seq(col("dev") -> "cusum"))
      c.orderBy(abs(col("cusum")).desc, col("hre")).limit(1)
        .select(round(abs(col("cusum")), 4).as("cusum_max"),
          col("hre").as("at_hr"), col("nh").as("n_hours"))
    },

    // ---- TPC-H Q18 shape: large-volume orders (per-order quantity
    //      rollup + HAVING), joined back to orders and customer. The
    //      HAVING filter shrinks the rollup to a sliver, which then
    //      BROADCASTS into both joins — the fact table is never
    //      reshuffled. Quantities are integers, so the rollup and the
    //      threshold are exact. ----
    sqlChecked("q18_big_orders",
      """WITH big AS (SELECT l_orderkey, SUM(l_quantity) AS qty
        |  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 150)
        |SELECT c.c_name, o.o_custkey, o.o_orderkey,
        |  CAST(epoch(o.o_orderdate) AS BIGINT) AS odate, b.qty
        |FROM big b
        |JOIN orders o ON o.o_orderkey = b.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY b.qty DESC, o.o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      val big = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 150)
      t(s, d, "orders").join(broadcast(big),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, d, "customer")),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("o_custkey"), col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("odate"), col("qty"))
        .orderBy(col("qty").desc, col("o_orderkey")).limit(100)
    })
}
