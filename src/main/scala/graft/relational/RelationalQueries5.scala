package graft.relational

import graft.core.Tables
import graft.llm.{Dedup, LinkGraph}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.SparkSession

/** Fifth batch: graph triangle counting, BM25 term scoring, and the
  * messy-ingestion source surface (schema evolution across parquet
  * batches, corrupt-record JSON handling) — what a long-lived 100 TB
  * corpus actually throws at an engine.
  */
object RelationalQueries5 {
  import QueryDef._

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private val normSql =
    "TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g'))"

  val all: Seq[QueryDef] = Seq(

    // ---- exact triangle counts on the order graph via the
    //      degree-ordered oriented wedge join (out-degree O(sqrt m)
    //      after orientation — no hot-vertex wedge blowup). The oracle
    //      replays the identical orientation and closure. ----
    sqlChecked("g_triangles",
      """WITH e0 AS (SELECT DISTINCT o_custkey % 100 AS a, o_orderkey % 150 AS b
        |  FROM orders WHERE o_custkey % 100 <> o_orderkey % 150),
        |und AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM e0),
        |deg AS (SELECT n, COUNT(*) AS d FROM
        |  (SELECT u AS n FROM und UNION ALL SELECT v FROM und) GROUP BY n),
        |ori AS (SELECT CASE WHEN (da.d, u) < (db.d, v) THEN u ELSE v END AS s,
        |               CASE WHEN (da.d, u) < (db.d, v) THEN v ELSE u END AS t
        |        FROM und JOIN deg da ON da.n = u JOIN deg db ON db.n = v),
        |tri AS (SELECT e1.s AS x, e1.t AS y, e2.t AS z
        |        FROM ori e1 JOIN ori e2 ON e1.t = e2.s
        |        JOIN ori e3 ON e3.s = e1.s AND e3.t = e2.t),
        |corners AS (SELECT x AS node FROM tri
        |  UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
        |SELECT node, COUNT(*) AS n_tri FROM corners
        |GROUP BY node ORDER BY node""".stripMargin) { (s, d) =>
      val edges = t(s, d, "orders").select(
        (col("o_custkey") % 100).as("a"), (col("o_orderkey") % 150).as("b"))
      LinkGraph.triangleCounts(edges, col("a"), col("b"))
        .orderBy(col("node"))
    },

    // ---- BM25 top terms per document (k1=1.2, b=0.75): the ranking
    //      twin of t_tfidf with document-length normalization — tf,
    //      df, and doc length all come from the one token stream, the
    //      dimension-sized df table broadcasts back. ----
    sqlChecked("t_bm25",
      s"""WITH toks AS (SELECT doc_id,
         |    unnest(string_split($normSql, ' ')) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
         |  GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
         |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks
         |  GROUP BY term),
         |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl
         |  FROM dl),
         |scored AS (SELECT tf.doc_id, tf.term, tf.tf,
         |    LN(1.0 + (n - df + 0.5) / (df + 0.5))
         |      * (tf * 2.2)
         |      / (tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl)) AS score
         |  FROM tf JOIN df USING (term) JOIN dl ON dl.doc_id = tf.doc_id
         |  CROSS JOIN stats),
         |ranked AS (SELECT doc_id, term, tf, score,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, term) AS rk FROM scored)
         |SELECT doc_id, term, tf, rk, ROUND(score, 8) AS bm25
         |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val toks = docs.select(col("doc_id"),
        explode(split(Dedup.normalize(col("text")), " ")).as("term"))
      val tf = toks.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val df = toks.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val Array(nDocs, avgdl) = dl
        .agg(count(lit(1)).cast("double"), avg(col("dl"))).head()
        .toSeq.map(_.asInstanceOf[Double]).toArray
      val scored = tf.join(broadcast(df), Seq("term"))
        .join(dl, Seq("doc_id"))
        .withColumn("score",
          log(lit(1.0) + (lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5))
            * (col("tf") * 2.2)
            / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl))))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("rk"),
          round(col("score"), 8).as("bm25"))
        .orderBy(col("doc_id"), col("rk"))
    },

    // ---- schema evolution across parquet batches: an early batch
    //      lacks the `source` column a later batch carries; the
    //      mergeSchema scan unions them losslessly (missing column
    //      null-filled). The oracle derives the same split from the
    //      source table, so the evolved read must reconstruct it
    //      exactly. ----
    sqlChecked("s8_evolution",
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars,
        |  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS with_src
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_s8").toString
      val docs = t(s, d, "documents")
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$tmp/b1")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("source"))
        .write.mode("overwrite").parquet(s"$tmp/b2")
      s.read.option("mergeSchema", "true").parquet(s"$tmp/b1", s"$tmp/b2")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
          sum(when(col("source").isNotNull, 1L).otherwise(0L)).as("with_src"))
        .orderBy(col("lang"))
    },

    // ---- MERGE-style upsert: a derived I/U/D changeset applied to
    //      the orders snapshot in ONE full-outer equi-join (CDC
    //      application / re-crawl refresh shape); the rollup of the
    //      merged state must match the oracle's set-algebra replay.
    //      Update and delete predicates are disjoint by construction
    //      so each key carries at most one change row. ----
    sqlChecked("s10_upsert",
      """WITH ch AS (
        |  SELECT o_orderkey AS k, 'U' AS op, o_totalprice * 2.0 AS price
        |    FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL SELECT o_orderkey, 'D', 0.0 FROM orders
        |    WHERE o_orderkey % 10 <> 0 AND o_orderkey % 17 = 3
        |  UNION ALL SELECT o_orderkey + 100000000, 'I', 55.5 FROM orders
        |    WHERE o_orderkey % 1000 = 7),
        |snap AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |    o_totalprice AS price FROM orders),
        |merged AS (SELECT COALESCE(s.st, 'NEW') AS st,
        |    COALESCE(c.price, s.price) AS price
        |  FROM snap s FULL OUTER JOIN ch c ON s.k = c.k
        |  WHERE c.op IS NULL OR c.op <> 'D')
        |SELECT st, COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        |FROM merged GROUP BY st ORDER BY st""".stripMargin) { (s, d) =>
      val o = t(s, d, "orders")
      val snap = o.select(col("o_orderkey").as("k"),
        col("o_orderstatus").as("st"), col("o_totalprice").as("price"))
      val ch = o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey").as("k"), lit("U").as("op"),
          (col("o_totalprice") * 2.0).as("price"))
        .unionByName(o
          .filter(col("o_orderkey") % 10 =!= 0 && col("o_orderkey") % 17 === 3)
          .select(col("o_orderkey").as("k"), lit("D").as("op"),
            lit(0.0).as("price")))
        .unionByName(o.filter(col("o_orderkey") % 1000 === 7)
          .select((col("o_orderkey") + 100000000L).as("k"), lit("I").as("op"),
            lit(55.5).as("price")))
      graft.core.Upsert(snap, ch, key = "k")
        .select(coalesce(col("st"), lit("NEW")).as("st"), col("price"))
        .groupBy(col("st"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("price").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .orderBy(col("st"))
    },

    // ---- correlated scalar subquery through the spark.sql entry path
    //      (Catalyst rewrites it to an aggregated left outer join —
    //      asserted by result parity with the oracle's identical
    //      query); exercises the SQL-string surface a migrating user
    //      hits first ----
    sqlChecked("j_scalar_subquery",
      """SELECT o_orderkey,
        |  COALESCE((SELECT MAX(l_quantity) FROM lineitem l
        |            WHERE l.l_orderkey = o.o_orderkey), 0.0) AS max_qty,
        |  COALESCE((SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        |            WHERE l.l_orderkey = o.o_orderkey), 0) AS n_lines
        |FROM orders o WHERE o_orderkey % 100 = 0
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      t(s, d, "orders").createOrReplaceTempView("orders")
      t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT o_orderkey,
          |  COALESCE((SELECT MAX(l_quantity) FROM lineitem l
          |            WHERE l.l_orderkey = o.o_orderkey), 0.0) AS max_qty,
          |  COALESCE((SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
          |            WHERE l.l_orderkey = o.o_orderkey), 0) AS n_lines
          |FROM orders o WHERE o_orderkey % 100 = 0
          |ORDER BY o_orderkey""".stripMargin)
    },

    // ---- EXCEPT ALL / INTERSECT ALL: bag semantics with duplicate
    //      multiplicity (the distinct variants live in set_*) ----
    sqlChecked("set_bag_ops",
      """WITH a AS (SELECT l_orderkey % 50 AS k FROM lineitem),
        |b AS (SELECT o_orderkey % 50 AS k FROM orders),
        |ea AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b),
        |ia AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
        |SELECT k, CAST(SUM(src) AS BIGINT) AS n_except,
        |  CAST(SUM(1 - src) AS BIGINT) AS n_intersect
        |FROM (SELECT k, 1 AS src FROM ea UNION ALL SELECT k, 0 FROM ia)
        |GROUP BY k ORDER BY k""".stripMargin) { (s, d) =>
      val a = t(s, d, "lineitem").select((col("l_orderkey") % 50).as("k"))
      val b = t(s, d, "orders").select((col("o_orderkey") % 50).as("k"))
      a.exceptAll(b).withColumn("src", lit(1))
        .unionByName(a.intersectAll(b).withColumn("src", lit(0)))
        .groupBy(col("k"))
        .agg(sum(col("src")).cast("long").as("n_except"),
          sum(lit(1) - col("src")).cast("long").as("n_intersect"))
        .orderBy(col("k"))
    },

    // ---- time-spine densification + gap fill: sparse monthly totals
    //      per priority densified onto the full month spine, missing
    //      months filled BOTH ways (LOCF and linear interpolation
    //      between the surrounding observations) — the standard
    //      time-series regularization before any windowed model. The
    //      spine is generated, not scanned; fills are per-group
    //      windows over the (tiny) month grid. ----
    sqlChecked("o8_densify",
      """WITH m AS (SELECT o_orderpriority AS grp,
        |    date_trunc('month', o_orderdate) AS mth,
        |    ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        |      AS v
        |  FROM orders WHERE o_orderkey % 5 = 0 GROUP BY 1, 2),
        |b AS (SELECT MIN(mth) AS lo, MAX(mth) AS hi FROM m),
        |spine AS (SELECT grp, unnest(generate_series(lo, hi,
        |    INTERVAL 1 MONTH)) AS mth FROM (SELECT DISTINCT grp FROM m), b),
        |j AS (SELECT s.grp, s.mth, m.v, ROW_NUMBER() OVER (PARTITION BY s.grp
        |    ORDER BY s.mth) AS rn
        |  FROM spine s LEFT JOIN m ON m.grp = s.grp AND m.mth = s.mth),
        |f AS (SELECT grp, mth, v, rn,
        |    LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY grp ORDER BY mth
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
        |    LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY grp ORDER BY mth
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
        |    LAST_VALUE(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
        |      OVER (PARTITION BY grp ORDER BY mth
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pi,
        |    FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY grp ORDER BY mth
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
        |    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
        |      OVER (PARTITION BY grp ORDER BY mth
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ni
        |  FROM j)
        |SELECT grp, CAST(epoch(mth) AS BIGINT) AS mth, v IS NULL AS is_gap,
        |  locf,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |         ROUND(pv + (nv - pv) * CAST(rn - pi AS DOUBLE)
        |           / CAST(ni - pi AS DOUBLE), 6)
        |  END AS lerp
        |FROM f ORDER BY grp, mth""".stripMargin) { (s, d) =>
      val m = t(s, d, "orders").filter(col("o_orderkey") % 5 === 0)
        .groupBy(col("o_orderpriority").as("grp"),
          date_trunc("month", col("o_orderdate")).as("mth"))
        .agg(round(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double"), 2).as("v"))
      val bnd = m.agg(min(col("mth")).as("lo"), max(col("mth")).as("hi"))
      val spine = m.select(col("grp")).distinct()
        .crossJoin(broadcast(bnd))
        .select(col("grp"), explode(sequence(col("lo"), col("hi"),
          expr("interval 1 month"))).as("mth"))
      val ord = Window.partitionBy(col("grp")).orderBy(col("mth"))
      val j = spine.join(m, Seq("grp", "mth"), "left")
        .withColumn("rn", row_number().over(ord))
      val wCur = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPrev = ord.rowsBetween(Window.unboundedPreceding, -1)
      val wNext = ord.rowsBetween(1, Window.unboundedFollowing)
      val obsRn = when(col("v").isNotNull, col("rn"))
      j.withColumn("locf", last(col("v"), ignoreNulls = true).over(wCur))
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
        .withColumn("pi", last(obsRn, ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
        .withColumn("ni", first(obsRn, ignoreNulls = true).over(wNext))
        .select(col("grp"), unix_timestamp(col("mth")).as("mth"),
          col("v").isNull.as("is_gap"), col("locf"),
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNotNull && col("nv").isNotNull,
              round(col("pv") + (col("nv") - col("pv")) *
                (col("rn") - col("pi")).cast("double") /
                (col("ni") - col("pi")).cast("double"), 6))
            .as("lerp"))
        .orderBy(col("grp"), col("mth"))
    },

    // ---- per-group z-score standardization: the feature-normalization
    //      pass every embedding/quality pipeline runs before modeling.
    //      Window aggregates (no join-back); moments are exact integral
    //      sums so both engines agree bit-for-bit ----
    sqlChecked("w_zscore",
      """SELECT l_orderkey, l_linenumber,
        |  ROUND((l_quantity - s1 / n)
        |    / SQRT(s2 / n - (s1 / n) * (s1 / n)), 8) AS z
        |FROM (SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE)
        |    AS l_quantity,
        |    SUM(CAST(l_quantity AS DOUBLE)) OVER (PARTITION BY l_returnflag)
        |      AS s1,
        |    SUM(CAST(l_quantity AS DOUBLE) * l_quantity)
        |      OVER (PARTITION BY l_returnflag) AS s2,
        |    CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS DOUBLE) AS n
        |  FROM lineitem WHERE l_orderkey % 7 = 0)
        |ORDER BY l_orderkey, l_linenumber, z""".stripMargin) { (s, d) =>
      // moments from EXACT integral power sums (not Welford stddev,
      // whose merge order differs across engines). The per-flag moments
      // come from a hash aggregate broadcast back — an unordered
      // `Window.partitionBy(l_returnflag)` buffers a third of the table
      // per task (3 flags = 3 data-sized tasks); the 3-row aggregate is
      // value-identical because the sums are exact integers in double.
      val x = col("l_quantity").cast("double")
      val base = t(s, d, "lineitem").filter(col("l_orderkey") % 7 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          x.as("l_quantity"))
      val mom = base.groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("s1"),
          sum(col("l_quantity") * col("l_quantity")).as("s2"),
          count(lit(1)).cast("double").as("n"))
      base.join(broadcast(mom), Seq("l_returnflag"))
        .select(col("l_orderkey"), col("l_linenumber"),
          round((col("l_quantity") - col("s1") / col("n")) /
            sqrt(col("s2") / col("n") -
              (col("s1") / col("n")) * (col("s1") / col("n"))), 8).as("z"))
        // z tiebreak: duplicate (orderkey, linenumber) keys exist in the
        // synthetic lineitem; keep the sort total
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("z"))
    },

    // ---- percentile winsorization: clip each group's tail values at
    //      its own exact [p05, p95] — outlier taming before any
    //      moment-based estimator. The cut points ride the radix rank
    //      search (three bounded scans, no data-sized aggregation
    //      state) rather than the builtin `percentile` aggregate,
    //      whose per-group value-count map over the continuous price
    //      domain measured 71 s / 34.6x at the 100x probe; the tiny
    //      per-group frame then broadcasts back onto the clip scan ----
    sqlChecked("p_winsor",
      """WITH b AS (SELECT l_returnflag AS flag,
        |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.05) AS lo,
        |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS hi
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT flag, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_lo,
        |  CAST(SUM(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hi,
        |  ROUND(AVG(GREATEST(LEAST(CAST(l_extendedprice AS DOUBLE), hi), lo)), 6)
        |    AS wins_mean
        |FROM lineitem JOIN b ON l_returnflag = flag
        |GROUP BY flag ORDER BY flag""".stripMargin) { (s, d) =>
      val li = t(s, d, "lineitem")
      val x = col("l_extendedprice").cast("double")
      val b = graft.stats.WeightedQuantile.interpolatedQuantiles(
          li, col("l_returnflag"), x, lit(1L), Seq(0.05, 0.95))
        .select(col("grp").as("flag"), col("q_0").as("lo"),
          col("q_1").as("hi"))
      li.join(broadcast(b), col("l_returnflag") === col("flag"))
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n"),
          sum(when(x < col("lo"), 1L).otherwise(0L)).as("n_lo"),
          sum(when(x > col("hi"), 1L).otherwise(0L)).as("n_hi"),
          round(avg(greatest(least(x, col("hi")), col("lo"))), 6)
            .as("wins_mean"))
        .orderBy(col("flag"))
    },

    // ---- corrupt-record JSON ingestion: a deterministic 1-in-7 of
    //      the corpus is mangled into invalid JSON, read back
    //      PERMISSIVE with a corrupt-record column; good rows keep
    //      their payload, bad rows are counted, nothing is dropped
    //      silently. The oracle knows exactly which rows were mangled. ----
    sqlChecked("s9_corrupt",
      """SELECT
        |  CAST(SUM(CASE WHEN doc_id % 7 <> 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_good,
        |  CAST(SUM(CASE WHEN doc_id % 7 = 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_corrupt,
        |  CAST(SUM(CASE WHEN doc_id % 7 <> 3 THEN n_chars ELSE 0 END) AS BIGINT)
        |    AS good_chars
        |FROM documents""".stripMargin) { (s, d) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_s9").toString
      val line = to_json(struct(col("doc_id"), col("lang"), col("n_chars")))
      t(s, d, "documents")
        .select(when(col("doc_id") % 7 === 3,
            concat(substring(line, 1, 20), lit("###")))
          .otherwise(line).as("value"))
        .write.mode("overwrite").text(s"$tmp/j")
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("n_chars", LongType), StructField("_bad", StringType)))
      s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(s"$tmp/j")
        .agg(sum(when(col("_bad").isNull, 1L).otherwise(0L)).as("n_good"),
          sum(when(col("_bad").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
          sum(when(col("_bad").isNull, col("n_chars")).otherwise(0L))
            .as("good_chars"))
    },

    // ---- exact design-weighted quantiles (survey wt.quantile class):
    //      quantity-weighted price quartiles per return flag. Weights
    //      are BIGINTs and levels exact rationals, so every threshold
    //      comparison is integer arithmetic — no floating cumsum, and
    //      ties pre-aggregate to distinct-x granularity (order-free).
    //      Engine side: sample-free radix search (three scan+hash-agg
    //      passes over IEEE sortable-bit buckets — WeightedQuantile),
    //      deterministic under recomputation; the oracle states the
    //      same quantile as a window cumsum over distinct values. ----
    sqlChecked("a_weighted_quantile",
      """WITH c AS (SELECT l_returnflag AS grp, l_extendedprice AS x,
        |    CAST(l_quantity AS BIGINT) AS w FROM lineitem),
        |d AS (SELECT grp, x, CAST(SUM(w) AS BIGINT) AS wv
        |  FROM c GROUP BY grp, x),
        |s AS (SELECT grp, x, CAST(SUM(wv) OVER (PARTITION BY grp ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw
        |  FROM d),
        |tt AS (SELECT grp, CAST(SUM(wv) AS BIGINT) AS tot FROM d GROUP BY grp)
        |SELECT grp AS l_returnflag, MAX(tot) AS w_total,
        |  MIN(CASE WHEN cw * 4 >= tot * 1 THEN x END) AS q_1_4,
        |  MIN(CASE WHEN cw * 2 >= tot * 1 THEN x END) AS q_1_2,
        |  MIN(CASE WHEN cw * 4 >= tot * 3 THEN x END) AS q_3_4
        |FROM s JOIN tt USING (grp)
        |GROUP BY grp ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      graft.stats.WeightedQuantile.weightedQuantiles(
          t(s, d, "lineitem"), col("l_returnflag"), col("l_extendedprice"),
          col("l_quantity"), Seq((1, 4), (1, 2), (3, 4)))
        .select(col("grp").as("l_returnflag"), col("w_total"),
          col("q_1_4"), col("q_1_2"), col("q_3_4"))
        .orderBy(col("l_returnflag"))
    },

    // ---- robust outlier screen: per-language median/MAD of document
    //      length, docs beyond 2 MADs flagged — the data-cleaning
    //      filter that survives the heavy tails mean/stddev screens
    //      don't. Medians are the exact left-continuous weighted
    //      quantile at w=1 (integer cumsums over distinct values), so
    //      both engines agree exactly; all outputs stay BIGINT. ----
    sqlChecked("p_mad_outlier",
      """WITH c AS (SELECT lang, CAST(n_chars AS BIGINT) AS x FROM documents),
        |d1 AS (SELECT lang, x, COUNT(*) AS nv FROM c GROUP BY lang, x),
        |s1 AS (SELECT lang, x, CAST(SUM(nv) OVER (PARTITION BY lang ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw
        |  FROM d1),
        |t1 AS (SELECT lang, COUNT(*) AS n FROM c GROUP BY lang),
        |med AS (SELECT lang, MIN(CASE WHEN cw * 2 >= n THEN x END) AS med
        |  FROM s1 JOIN t1 USING (lang) GROUP BY lang),
        |a AS (SELECT c.lang, c.x, ABS(c.x - m.med) AS ax
        |  FROM c JOIN med m USING (lang)),
        |d2 AS (SELECT lang, ax, COUNT(*) AS nv FROM a GROUP BY lang, ax),
        |s2 AS (SELECT lang, ax, CAST(SUM(nv) OVER (PARTITION BY lang ORDER BY ax
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw
        |  FROM d2),
        |mad AS (SELECT lang, MIN(CASE WHEN cw * 2 >= n THEN ax END) AS mad
        |  FROM s2 JOIN t1 USING (lang) GROUP BY lang)
        |SELECT a.lang, MAX(m1.med) AS med, MAX(m2.mad) AS mad,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN a.ax > 2 * m2.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outlier
        |FROM a JOIN med m1 USING (lang) JOIN mad m2 USING (lang)
        |GROUP BY a.lang ORDER BY a.lang""".stripMargin) { (s, d) =>
      // character counts are a BOUNDED domain (≤ max doc length
      // distinct values per language) → the one-pass distinct-cumsum
      // beats the three-scan radix search; see WeightedQuantile's
      // decision rule. `dev` feeds BOTH the MAD quantile and the
      // final outlier agg — materialize it once via a lazy
      // localCheckpoint rather than persist(): checkpoint blocks are
      // released by the ContextCleaner as soon as the frame is
      // unreachable, so a driver that does NOT clearCache between
      // queries (persist() pins the CacheManager until one does)
      // cannot accumulate it across a catalog run.
      import graft.stats.WeightedQuantile.weightedQuantilesDistinct
      val docs = t(s, d, "documents")
        .select(col("lang"), col("n_chars").cast("long").as("x"))
      val med = weightedQuantilesDistinct(docs, col("lang"), col("x"),
          lit(1L), Seq((1, 2)))
        .select(col("grp").as("lang"), col("q_1_2").as("med"))
      val dev = docs.join(med, Seq("lang"))
        .withColumn("ax", abs(col("x") - col("med")))
        .localCheckpoint(false)
      val mad = weightedQuantilesDistinct(dev, col("lang"), col("ax"),
          lit(1L), Seq((1, 2)))
        .select(col("grp").as("lang"), col("q_1_2").as("mad"))
      dev.join(mad, Seq("lang"))
        .groupBy(col("lang"))
        .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
          count(lit(1)).as("n"),
          sum(when(col("ax") > lit(2) * col("mad"), 1L).otherwise(0L))
            .as("n_outlier"))
        .orderBy(col("lang"))
    },

    // ---- exact one-pass Pearson correlation matrix: inputs scale to
    //      exact BIGINTs (2-dp money ×100 through decimal), moments
    //      accumulate as decimal(38,0)/HUGEINT, and the cancellation
    //      n·Σxy − Σx·Σy happens in integer arithmetic before the one
    //      cast to double — so the distributed partial aggregate and
    //      the single-node replay agree exactly. ONE hash-agg pass
    //      over the fact table, driver-sized everything else. ----
    sqlChecked("a_corr_matrix", {
      val pairs = Seq(("disc", "price"), ("disc", "qty"), ("disc", "tax"),
        ("price", "qty"), ("price", "tax"), ("qty", "tax"))
      val pairSel = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS var_a, '$b' AS var_b,
           |  ROUND(CAST(n*sp_${a}_$b - s_$a*s_$b AS DOUBLE)
           |    / (SQRT(CAST(n*ss_$a - s_$a*s_$a AS DOUBLE))
           |       * SQRT(CAST(n*ss_$b - s_$b*s_$b AS DOUBLE))), 10) AS corr
           |FROM m""".stripMargin
      }.mkString("\nUNION ALL ")
      val names = Seq("qty", "price", "disc", "tax")
      s"""WITH c AS (SELECT CAST(l_quantity AS BIGINT) AS qty,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS price,
         |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS disc,
         |    CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS tax
         |  FROM lineitem),
         |m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         |    ${names.map(v => s"SUM($v) AS s_$v").mkString(", ")},
         |    ${names.map(v => s"SUM($v*$v) AS ss_$v").mkString(", ")},
         |    ${pairs.map { case (a, b) => s"SUM($a*$b) AS sp_${a}_$b" }
        .mkString(", ")}
         |  FROM c)
         |$pairSel
         |ORDER BY var_a, var_b""".stripMargin
    }) { (s, d) =>
      val base = t(s, d, "lineitem").select(
        col("l_quantity").cast("long").as("qty"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("price"),
        (col("l_discount").cast("decimal(18,2)") * 100).cast("long").as("disc"),
        (col("l_tax").cast("decimal(18,2)") * 100).cast("long").as("tax"))
      // pair order must match the oracle's (sorted) var pairs
      graft.stats.ExactCorr.pearsonMatrix(base, Seq(
          "disc" -> col("disc"), "price" -> col("price"),
          "qty" -> col("qty"), "tax" -> col("tax")))
        .select(col("var_a"), col("var_b"), round(col("corr"), 10).as("corr"))
        .orderBy(col("var_a"), col("var_b"))
    },

    // ---- j8: blocked fuzzy self-join (record linkage on short
    //      strings): candidates from a brand-block equi-join, length-
    //      difference lower bound pruned, thresholded Levenshtein ≤ 2.
    //      Linkage runs over DISTINCT (brand, name) records (min part
    //      id as the representative) — duplicated rows of one entity
    //      are exact-dedup's job (d1), and pairing them here both
    //      re-reports the same name pair O(dups²) times and made the
    //      sf1 probe quadratic (24x on 10x data). The oracle replays
    //      the identical collapse, blocking, and distance. ----
    sqlChecked("j8_fuzzy_join",
      """WITH p AS (SELECT p_brand, p_name, MIN(p_partkey) AS id
        |  FROM part GROUP BY p_brand, p_name)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM p a JOIN p b
        |  ON a.p_brand = b.p_brand AND a.id < b.id
        |  AND ABS(LENGTH(a.p_name) - LENGTH(b.p_name)) <= 2
        |  AND levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val recs = t(s, d, "part").groupBy(col("p_brand"), col("p_name"))
        .agg(min(col("p_partkey")).as("id"))
      graft.llm.EntityResolution.blockedFuzzyJoin(
          recs, col("id"), col("p_name"), col("p_brand"),
          maxDist = 2)
        .select(col("id_a"), col("id_b"), col("dist").cast("int").as("dist"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- s11: SCD type-2 dimension build from an event log — collapse
    //      each user's purchase stream into change-interval rows
    //      (attr, valid_from, valid_to, is_current), the slowly-changing-
    //      dimension history a warehouse maintains from CDC feeds. Two
    //      user-partitioned windows (lag to detect changes, lead to close
    //      intervals); no global sort, partitions by user_id. ----
    sqlChecked("s11_scd2",
      """WITH p AS (SELECT user_id, ts, CAST(FLOOR(value / 10) AS INT) AS attr,
        |             event_id
        |           FROM events WHERE event_type = 'purchase'),
        |o AS (SELECT user_id, ts, attr,
        |        LAG(attr) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |      FROM p),
        |chg AS (SELECT user_id, ts, attr FROM o
        |        WHERE prev IS NULL OR attr <> prev),
        |v AS (SELECT user_id, attr, ts AS valid_from,
        |        LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
        |      FROM chg)
        |SELECT user_id, attr, epoch_us(valid_from) AS valid_from,
        |  epoch_us(valid_to) AS valid_to,
        |  CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM v ORDER BY user_id, valid_from""".stripMargin) { (s, d) =>
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          floor(col("value") / 10).cast("int").as("attr"), col("event_id"))
        .withColumn("prev", lag(col("attr"), 1).over(byUser))
        .filter(col("prev").isNull || col("attr") =!= col("prev"))
        .select(col("user_id"), col("attr"), col("ts").as("valid_from"))
        .withColumn("valid_to",
          lead(col("valid_from"), 1).over(
            Window.partitionBy(col("user_id")).orderBy(col("valid_from"))))
        .select(col("user_id"), col("attr"),
          unix_micros(col("valid_from")).as("valid_from"),
          unix_micros(col("valid_to")).as("valid_to"),
          when(col("valid_to").isNull, 1).otherwise(0).as("is_current"))
        .orderBy(col("user_id"), col("valid_from"))
    },

    // ---- o9: gaps-and-islands — per-user consecutive-day activity
    //      streaks from the event log. The island key is the classic
    //      date − row_number() trick (constant within a consecutive
    //      run), so the whole thing is one distinct, one user-
    //      partitioned window, two hash aggregates — no self-join,
    //      no per-day loop. ----
    sqlChecked("o9_streaks",
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt
        |              FROM events),
        |isl AS (SELECT user_id, dt,
        |          dt - CAST(ROW_NUMBER() OVER
        |            (PARTITION BY user_id ORDER BY dt) AS INT) AS island
        |        FROM days),
        |st AS (SELECT user_id, island, COUNT(*) AS len, MIN(dt) AS start_dt
        |       FROM isl GROUP BY user_id, island)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_streaks,
        |  CAST(MAX(len) AS BIGINT) AS longest,
        |  STRFTIME(MIN(start_dt), '%Y-%m-%d') AS first_day
        |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("dt"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts").cast("date").as("dt")).distinct()
        .withColumn("island",
          date_sub(col("dt"), row_number().over(byUser)))
        .groupBy(col("user_id"), col("island"))
        .agg(count(lit(1)).as("len"), min(col("dt")).as("start_dt"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_streaks"), max(col("len")).as("longest"),
          date_format(min(col("start_dt")), "yyyy-MM-dd").as("first_day"))
        .orderBy(col("user_id"))
    },

    // ---- ev_anomaly: rolling z-score monitoring over the hourly event
    //      series — per type, each hour scored against the trailing
    //      24 hours (excluding itself); flagged at |z| > 3 once 12
    //      trailing points exist. One time-bucket aggregate + one
    //      type-partitioned ROWS frame; partitions by event_type, no
    //      global sort until the sink. ----
    sqlChecked("ev_anomaly",
      """WITH h AS (SELECT event_type,
        |             time_bucket(INTERVAL '1 hour', ts) AS hr,
        |             SUM(value) AS v
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, hr, v,
        |        AVG(v) OVER w AS mu, STDDEV_SAMP(v) OVER w AS sd,
        |        COUNT(*) OVER w AS n
        |      FROM h
        |      WINDOW w AS (PARTITION BY event_type ORDER BY hr
        |                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, CAST(epoch(hr) AS BIGINT) AS hr,
        |  ROUND(v, 4) AS v,
        |  ROUND(CASE WHEN n >= 12 AND sd > 0 THEN (v - mu) / sd END, 4) AS z,
        |  CASE WHEN n >= 12 AND sd > 0 AND ABS((v - mu) / sd) > 3
        |       THEN 1 ELSE 0 END AS anomaly
        |FROM r ORDER BY event_type, hr""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        .rowsBetween(-24, -1)
      Tables.events(s, d)
        .groupBy(col("event_type"),
          window(col("ts"), "1 hour")("start").as("hr"))
        .agg(sum(col("value")).as("v"))
        .withColumn("mu", avg(col("v")).over(w))
        .withColumn("sd", stddev_samp(col("v")).over(w))
        .withColumn("n", count(lit(1)).over(w))
        .select(col("event_type"), unix_timestamp(col("hr")).as("hr"),
          round(col("v"), 4).as("v"),
          round(when(col("n") >= 12 && col("sd") > 0,
            (col("v") - col("mu")) / col("sd")), 4).as("z"),
          when(col("n") >= 12 && col("sd") > 0 &&
            abs((col("v") - col("mu")) / col("sd")) > 3, 1).otherwise(0)
            .as("anomaly"))
        .orderBy(col("event_type"), col("hr"))
    },

    // ---- f_bitwise: bitwise scalar battery (AND/OR/XOR, shifts,
    //      popcount) — hash/partition/bucket arithmetic primitives ----
    sqlChecked("f_bitwise",
      """SELECT l_orderkey, l_linenumber,
        |  l_orderkey & 255 AS b_and,
        |  l_orderkey | 4096 AS b_or,
        |  xor(l_orderkey, l_partkey) AS b_xor,
        |  (l_linenumber << 4) AS shl,
        |  (l_orderkey >> 2) AS shr,
        |  bit_count(l_orderkey) AS pop
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          col("l_orderkey").bitwiseAND(255).as("b_and"),
          col("l_orderkey").bitwiseOR(4096).as("b_or"),
          col("l_orderkey").bitwiseXOR(col("l_partkey")).as("b_xor"),
          shiftleft(col("l_linenumber"), 4).cast("long").as("shl"),
          shiftright(col("l_orderkey"), 2).as("shr"),
          bit_count(col("l_orderkey")).cast("long").as("pop"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- w_sliding_distinct: trailing-7-hour DISTINCT active users
    //      per event type (the rolling-actives metric). Spark has no
    //      distinct window aggregate, so the engine pre-collapses to
    //      hourly user SETS (one hash aggregate) and unions sets over a
    //      RANGE frame — set sizes are per-hour distinct users, far
    //      smaller than raw rows, so the window state is bounded by
    //      |users|, not |events|. ----
    sqlChecked("w_sliding_distinct",
      """WITH d AS (SELECT DISTINCT event_type,
        |             time_bucket(INTERVAL '1 hour', ts) AS hr, user_id
        |           FROM events),
        |w AS (SELECT event_type, hr,
        |        COUNT(DISTINCT user_id) OVER
        |          (PARTITION BY event_type ORDER BY hr
        |           RANGE BETWEEN INTERVAL 6 HOUR PRECEDING AND CURRENT ROW)
        |          AS u7
        |      FROM d)
        |SELECT event_type, CAST(epoch(hr) AS BIGINT) AS hr,
        |  CAST(MAX(u7) AS BIGINT) AS u7
        |FROM w GROUP BY 1, 2 ORDER BY event_type, hr""".stripMargin) { (s, d) =>
      val hourly = Tables.events(s, d)
        .select(col("event_type"),
          window(col("ts"), "1 hour")("start").as("hr"), col("user_id"))
        .groupBy(col("event_type"), col("hr"))
        .agg(collect_set(col("user_id")).as("us"))
        .withColumn("hr_s", unix_timestamp(col("hr")))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hr_s"))
        .rangeBetween(-6L * 3600L, 0L)
      hourly.select(col("event_type"), col("hr_s").as("hr"),
          size(array_distinct(flatten(collect_list(col("us")).over(w))))
            .cast("long").as("u7"))
        .orderBy(col("event_type"), col("hr"))
    },

    // ---- j9: bucketed point-in-interval range join — orders matched
    //      to OVERLAPPING promo windows. No equi-key exists, so stock
    //      Spark would nested-loop; the engine recovers a hash join by
    //      exploding intervals to covered buckets and matching points
    //      on their single bucket (core/RangeJoin), with the exact
    //      BETWEEN filter on co-bucketed candidates only. ----
    sqlChecked("j9_range_join",
      """WITH promo AS (SELECT i AS promo_id,
        |    9131 + i * 180 AS lo, 9131 + i * 180 + 250 AS hi
        |  FROM generate_series(0, 11) t(i)),
        |pts AS (SELECT o_orderkey,
        |    date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS d
        |  FROM orders)
        |SELECT p.o_orderkey, CAST(pr.promo_id AS BIGINT) AS promo_id
        |FROM pts p JOIN promo pr ON p.d BETWEEN pr.lo AND pr.hi
        |ORDER BY o_orderkey, promo_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val promo = (0 to 11).map(i => (i.toLong, 9131 + i * 180, 9131 + i * 180 + 250))
        .toDF("promo_id", "lo", "hi")
      graft.core.RangeJoin.pointInInterval(
          t(s, d, "orders").select(col("o_orderkey"),
            datediff(col("o_orderdate"), lit("1970-01-01")).as("d")),
          col("o_orderkey"), col("d"),
          promo, col("promo_id"), col("lo"), col("hi"),
          bucketWidth = 256.0)
        .select(col("p_key").as("o_orderkey"), col("i_key").as("promo_id"))
        .orderBy(col("o_orderkey"), col("promo_id"))
    },

    // ---- s12: small-file compaction — the operational chore a
    //      long-lived table needs: a fragmented write (64 shards of a
    //      500-row table) is coalesced to 4 files and re-read; content
    //      must be byte-identical through both roundtrips (the oracle
    //      is the source table itself). coalesce(), not repartition():
    //      compaction must not pay a shuffle. File-count reduction is
    //      asserted in SourcesSpec. ----
    sqlChecked("s12_compaction",
      """SELECT doc_id, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-s12")
      val frag = tmp.resolve("frag").toString
      val comp = tmp.resolve("compact").toString
      t(s, d, "documents").select(col("doc_id"), col("source"), col("n_chars"))
        .repartition(64).write.mode("overwrite").parquet(frag)
      s.read.parquet(frag).coalesce(4)
        .write.mode("overwrite").parquet(comp)
      s.read.parquet(comp).orderBy(col("doc_id"))
    },

    // ---- w_nth_value: positional window battery with IGNORE NULLS —
    //      first/last/nth non-null over a running frame (last = LOCF,
    //      the gap-fill idiom; nth = "second reading" lookups). NULLs
    //      injected on even line numbers so every branch is exercised. ----
    sqlChecked("w_nth_value",
      """WITH v AS (SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_linenumber % 2 = 0 THEN NULL
        |         ELSE MAX(l_quantity) END AS v
        |  FROM lineitem GROUP BY l_orderkey, l_linenumber)
        |SELECT l_orderkey, l_linenumber,
        |  first_value(v IGNORE NULLS) OVER w AS fv,
        |  last_value(v IGNORE NULLS) OVER w AS lv,
        |  nth_value(v, 2 IGNORE NULLS) OVER w AS nv
        |FROM v
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      // (orderkey, linenumber) is NOT unique in the testdata, so the
      // window order must run over the tie-collapsed key — the Breslow
      // tie-collapse discipline applied to a positional window
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "lineitem")
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(max(col("l_quantity")).as("q"))
        .select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_linenumber") % 2 === 0, lit(null))
            .otherwise(col("q")).as("v"))
        .select(col("l_orderkey"), col("l_linenumber"),
          first(col("v"), ignoreNulls = true).over(w).as("fv"),
          last(col("v"), ignoreNulls = true).over(w).as("lv"),
          nth_value(col("v"), 2, ignoreNulls = true).over(w).as("nv"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- a_mode: exact per-group mode with deterministic ties
    //      (smallest value wins) — mode() builtins leave tie order
    //      undefined, so both engines replay the explicit
    //      count + rank construction ----
    sqlChecked("a_mode",
      """WITH c AS (SELECT l_returnflag, l_quantity, COUNT(*) AS n
        |           FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT l_returnflag, l_quantity, n,
        |        ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |                           ORDER BY n DESC, l_quantity) AS rk
        |      FROM c)
        |SELECT l_returnflag, l_quantity AS mode_qty, CAST(n AS BIGINT) AS n
        |FROM r WHERE rk = 1 ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("n").desc, col("l_quantity"))
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("n"))
        .orderBy(col("l_returnflag"))
    }
  )
}
