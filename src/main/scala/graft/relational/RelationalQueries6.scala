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
  private[relational] def hourly(s: SparkSession, d: String) =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour")("start").as("hr"))
      .agg(count(lit(1)).cast("double").as("v"))
      .select(unix_timestamp(col("hr")).as("hre"), col("v"))

  private[relational] val hourlySql =
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
    },

    // ---- TPC-H Q14 shape: promotion revenue share — conditional
    //      aggregation over a fact × broadcast-dimension join ----
    sqlChecked("q14_promo_share",
      """SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
        |    THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
        |    / SUM(l.l_extendedprice * (1 - l.l_discount)), 6)
        |    AS promo_share,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem l JOIN part p
        |  ON p.p_partkey = l.l_partkey""".stripMargin) { (s, d) =>
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      t(s, d, "lineitem").join(broadcast(t(s, d, "part")),
          col("p_partkey") === col("l_partkey"))
        .agg(
          round(lit(100.0) * sum(when(col("p_type") === "PROMO", rev)
            .otherwise(0.0)) / sum(rev), 6).as("promo_share"),
          count(lit(1)).as("n_lines"))
    },

    // ---- month-over-month revenue change: rollup to the
    //      month-cardinality table, then one lag over the tiny step
    //      table (never over raw orders) ----
    sqlChecked("o11_mom_change",
      """WITH m AS (SELECT CAST(epoch(date_trunc('month', o_orderdate))
        |      AS BIGINT) AS mo, SUM(o_totalprice) AS rev
        |    FROM orders GROUP BY 1),
        |c AS (SELECT mo, rev, LAG(rev) OVER (ORDER BY mo) AS prev FROM m)
        |SELECT mo, ROUND(rev, 2) AS rev, ROUND(rev - prev, 2) AS delta,
        |  ROUND(100.0 * (rev - prev) / prev, 6) AS pct
        |FROM c ORDER BY mo""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val m = t(s, d, "orders")
        .groupBy(unix_timestamp(date_trunc("month", col("o_orderdate")))
          .as("mo"))
        .agg(sum(col("o_totalprice")).as("rev"))
      // month-cardinality step table: the single-partition lag window
      // is bounded by months, not rows
      m.withColumn("prev", lag(col("rev"), 1).over(Window.orderBy(col("mo"))))
        .select(col("mo"), round(col("rev"), 2).as("rev"),
          round(col("rev") - col("prev"), 2).as("delta"),
          round(lit(100.0) * (col("rev") - col("prev")) / col("prev"), 6)
            .as("pct"))
        .orderBy(col("mo"))
    },

    // ---- nearest-event join: each click's closest purchase by the
    //      same user in either time direction, |Δt| ties to the
    //      earlier one. Two conditional running extremes per user
    //      (last purchase ≤ t, next purchase ≥ t) — a user-partitioned
    //      window (high-cardinality partitions), no self-join, exact
    //      integer microseconds throughout. ----
    sqlChecked("j10_nearest",
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    epoch_us(ts) AS tus FROM events),
        |w AS (SELECT e.*,
        |    MAX(CASE WHEN event_type = 'purchase' THEN tus END)
        |      OVER (PARTITION BY user_id ORDER BY tus, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_p,
        |    MIN(CASE WHEN event_type = 'purchase' THEN tus END)
        |      OVER (PARTITION BY user_id ORDER BY tus, event_id
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_p
        |  FROM e),
        |n AS (SELECT event_id, user_id, tus,
        |    CASE WHEN prev_p IS NULL THEN next_p
        |         WHEN next_p IS NULL THEN prev_p
        |         WHEN tus - prev_p <= next_p - tus THEN prev_p
        |         ELSE next_p END AS np
        |  FROM w WHERE event_type = 'click')
        |SELECT event_id, user_id, tus, np AS nearest_purchase,
        |  np - tus AS delta_us
        |FROM n ORDER BY event_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("tus"))
      val purchase = when(col("event_type") === "purchase", col("tus"))
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
      val w = e
        .withColumn("prev_p", max(purchase).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("next_p", min(purchase).over(
          ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      w.filter(col("event_type") === "click")
        .withColumn("np",
          when(col("prev_p").isNull, col("next_p"))
            .when(col("next_p").isNull, col("prev_p"))
            .when(col("tus") - col("prev_p") <= col("next_p") - col("tus"),
              col("prev_p"))
            .otherwise(col("next_p")))
        .select(col("event_id"), col("user_id"), col("tus"),
          col("np").as("nearest_purchase"),
          (col("np") - col("tus")).as("delta_us"))
        .orderBy(col("event_id"))
    },

    // ---- corpus n-gram novelty: per document, the fraction of its
    //      distinct 3-grams first seen in it (by doc_id order) — the
    //      redundancy-growth curve of an accumulating corpus. One
    //      gram-keyed aggregate for first-occurrence + one join back;
    //      both shuffles partition on the gram, partial-agg friendly. ----
    sqlChecked("t_ngram_novelty",
      """WITH ws AS (SELECT doc_id,
        |    string_split(TRIM(regexp_replace(LOWER(text), '\s+', ' ',
        |      'g')), ' ') AS w FROM documents),
        |g AS (SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS gram
        |  FROM ws),
        |f AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram)
        |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel,
        |  ROUND(CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0
        |    END) AS DOUBLE) / COUNT(*), 6) AS novelty
        |FROM g JOIN f USING (gram)
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin) { (s, d) =>
      import graft.llm.Dedup
      // the shingling transform is interpreted (higher-order fn, no
      // codegen) and the corpus may arrive as ONE parquet split —
      // spread it first or the whole tokenize runs on one core (same
      // guard as Dedup.ngramJaccard); no-op when the scan is already
      // wider than the cluster
      val docs0 = t(s, d, "documents")
      val para = s.sparkContext.defaultParallelism
      val docs =
        if (docs0.rdd.getNumPartitions < para) docs0.repartition(para)
        else docs0
      val g = docs.select(col("doc_id"),
        explode(Dedup.shingles(col("text"), 3)).as("gram"))
      val f = g.groupBy(col("gram")).agg(min(col("doc_id")).as("first_doc"))
      g.join(f, Seq("gram"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          round(col("n_novel").cast("double") / col("n_grams"), 6)
            .as("novelty"))
        .orderBy(col("doc_id"))
    })
}
