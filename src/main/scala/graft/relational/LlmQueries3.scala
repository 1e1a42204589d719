package graft.relational

import graft.core.Tables
import graft.llm.{Dedup, LanguageModel, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Third LLM-pipeline batch: corpus-fit language-model quality scoring
  * and semantic (embedding-space) deduplication — the model-based
  * filter stages that sit between heuristic quality signals and
  * training-set assembly.
  */
object LlmQueries3 {
  import QueryDef._

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private val normSql =
    "TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g'))"

  val all: Seq[QueryDef] = Seq(

    // ---- perplexity-style quality filter: add-one bigram LM fit on
    //      the corpus itself, each doc scored by mean log-prob. The
    //      per-doc mean runs over FLOOR(term·1e7 + 0.5) BIGINTs so a
    //      distributed partial aggregate and the single-node replay
    //      agree bit-for-bit (integer sums are order-free). ----
    sqlChecked("t_bigram_lm",
      s"""WITH ws AS (SELECT doc_id, string_split($normSql, ' ') AS w
         |  FROM documents),
         |bi AS (SELECT doc_id,
         |    unnest(list_transform(range(1, len(w)), i -> w[i])) AS a,
         |    unnest(list_transform(range(1, len(w)),
         |      i -> w[i] || ' ' || w[i + 1])) AS bg
         |  FROM ws),
         |c2 AS (SELECT bg, COUNT(*) AS n2 FROM bi GROUP BY bg),
         |c1 AS (SELECT a, COUNT(*) AS n1 FROM bi GROUP BY a),
         |vv AS (SELECT CAST(COUNT(DISTINCT tk) AS DOUBLE) AS v
         |  FROM (SELECT unnest(w) AS tk FROM ws)),
         |q AS (SELECT doc_id,
         |    CAST(FLOOR((LN(CAST(n2 AS DOUBLE) + 1.0)
         |      - LN(CAST(n1 AS DOUBLE) + v)) * 10000000.0 + 0.5) AS BIGINT) AS q
         |  FROM bi JOIN c2 USING (bg) JOIN c1 USING (a) CROSS JOIN vv)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |  CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 10000000.0
         |    AS avg_logp
         |FROM q GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      LanguageModel.bigramLmScores(t(s, d, "documents"),
          col("doc_id"), col("text"))
        .select(col("id").as("doc_id"), col("n_bigrams"), col("avg_logp"))
        .orderBy(col("doc_id"))
    },

    // ---- SemDeDup: hierarchical k-means cells, within-cell cosine
    //      ≥ 0.45 → semantic duplicates, keep the min id of each
    //      neighborhood. The oracle replays the whole tree fixed point
    //      AND the in-cell pair verdicts. The cell count is
    //      CORPUS-DERIVED on both sides — k = max(8, n/512) — so
    //      expected cell size (and the O(n²/k) in-cell pair work)
    //      stays bounded as the corpus grows; a pinned k would make
    //      the fixture quadratic at scale even though the operator
    //      isn't. The QUANTIZER is where the first version actually
    //      went quadratic: flat assignment streams n·k candidates,
    //      which with k ∝ n measured 20.8× time for 2× data at sf40
    //      (83 GB spill). The depth-4 tree (branch = smallest b with
    //      b⁴ ≥ k) assigns in n·4b codegen'd distance evaluations —
    //      and degenerates bit-exactly to the flat fixed point while
    //      k ≤ 16, so small-sf hashes are unchanged. The Lloyd fits
    //      run on a deterministic ¼ subsample (centroid quality needs
    //      a representative sample, not the corpus); the final descent
    //      and all pair work stay full-corpus. ----
    sqlChecked("d13_semdedup", {
      val ITERS = 3
      val KSQL = "GREATEST(8, (SELECT COUNT(*) // 512 FROM emb))"
      s"""WITH ${KmeansReplay.treeCtes(KSQL, ITERS, 64, "vec_id % 4 = 0")},
         |pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    list_dot_product(a.v, b.v) /
         |      (SQRT(list_dot_product(a.v, a.v))
         |       * SQRT(list_dot_product(b.v, b.v))) AS cos
         |  FROM cells a JOIN cells b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id),
         |hits AS (SELECT id_a, id_b, cos FROM pr WHERE cos >= 0.45),
         |sym AS (SELECT id_a AS id, id_b AS nb, cos FROM hits
         |  UNION ALL SELECT id_b, id_a, cos FROM hits),
         |v AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_near,
         |    MAX(cos) AS best_cos,
         |    MAX(CASE WHEN nb < id THEN 1 ELSE 0 END) AS dominated
         |  FROM sym GROUP BY id)
         |SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell,
         |  COALESCE(v.n_near, 0) AS n_near,
         |  ROUND(COALESCE(v.best_cos, 0.0), 6) AS best_cos,
         |  1 - COALESCE(v.dominated, 0) AS kept
         |FROM cells c LEFT JOIN v ON v.id = c.vec_id
         |ORDER BY c.vec_id""".stripMargin
    }) { (s, d) =>
      val emb = t(s, d, "embeddings")
      // k ∝ corpus/targetCellSize (mirrors the oracle's KSQL exactly:
      // Scala Long division and DuckDB // both floor on non-negatives);
      // the fit subsample mirrors the oracle's fitWhere, and the
      // depth-4 branch law mirrors bb (integer search both sides)
      val k = math.max(8L, emb.count() / 512L).toInt
      val levels = Similarity.kmeansTreeFit(
        emb.filter(col("vec_id") % 4 === 0),
        col("vec_id"), col("embedding"), Similarity.treeBranches(k),
        iters = 3)
      Similarity.semDedupTree(emb, col("vec_id"), col("embedding"),
          levels, minCos = 0.45)
        .select(col("id").as("vec_id"), col("cell").cast("long").as("cell"),
          col("n_near"), round(col("best_cos"), 6).as("best_cos"),
          col("kept"))
        .orderBy(col("vec_id"))
    },

    // ---- per-label centroid + medoid: element-wise centroid via
    //      posexplode → (label, pos) hash aggregate (never a driver
    //      loop, linear in rows×dim), centroid re-assembled with an
    //      ordered collect per label (10×64 — dimension-sized), then
    //      one broadcast join back and a codegen'd cosine to pick each
    //      label's most-central member. The cluster-summary shape used
    //      for corpus curation (topic prototypes, nearest-real-doc per
    //      cluster). ----
    sqlChecked("a_centroid_knn",
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |comp AS (SELECT label, gs.i AS pos, AVG(v[gs.i]) AS m
        |         FROM e, generate_series(1, 64) AS gs(i) GROUP BY label, gs.i),
        |cent AS (SELECT label, list(m ORDER BY pos) AS c FROM comp GROUP BY label),
        |scored AS (SELECT e.label, e.vec_id,
        |    list_dot_product(e.v, cent.c) /
        |      (SQRT(list_dot_product(e.v, e.v)) *
        |       SQRT(list_dot_product(cent.c, cent.c))) AS cos
        |  FROM e JOIN cent USING (label)),
        |ranked AS (SELECT label, vec_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY cos DESC, vec_id) AS rk
        |  FROM scored)
        |SELECT CAST(label AS INT) AS label, vec_id AS medoid_id,
        |  ROUND(cos, 6) AS cos
        |FROM ranked WHERE rk = 1 ORDER BY label""".stripMargin) { (s, d) =>
      val e = t(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
      val comp = e.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos")).agg(avg(col("x")).as("m"))
      val cent = comp.groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("label")).orderBy(col("cos").desc, col("vec_id"))
      e.join(broadcast(cent), Seq("label"))
        .withColumn("cos",
          graft.functions.VectorExpressions.cosine(col("v"), col("c")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("label").cast("int").as("label"),
          col("vec_id").as("medoid_id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("label"))
    },

    // ---- batched exact k-NN join: a FIXED 80-query batch; each query
    //      gets its top-5 corpus neighbors in ONE broadcast nested-loop
    //      pass + a query-partitioned window (no corpus self-shuffle).
    //      The batched-retrieval shape: RAG candidate fetch, eval-set
    //      neighbor audits — the batch size is a workload constant
    //      while the corpus grows (a %-of-corpus query set made this
    //      query quadratic on the sf1 probe: 32x on 10x data). ----
    sqlChecked("sim_knn_join",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 80),
        |scored AS (SELECT q.q_id, e.vec_id AS c_id,
        |    list_dot_product(e.v, q.qv) /
        |      (SQRT(list_dot_product(e.v, e.v)) *
        |       SQRT(list_dot_product(q.qv, q.qv))) AS cos
        |  FROM e, q WHERE e.vec_id <> q.q_id),
        |ranked AS (SELECT q_id, c_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk
        |  FROM scored)
        |SELECT q_id, c_id, ROUND(cos, 6) AS cos, CAST(rk AS BIGINT) AS rk
        |FROM ranked WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      Similarity.knnJoin(
          emb, col("vec_id"), col("embedding"),
          emb.filter(col("vec_id") < 80), col("vec_id"), col("embedding"),
          k = 5)
        .select(col("q_id"), col("c_id"), round(col("cos"), 6).as("cos"),
          col("rk").cast("long").as("rk"))
        .orderBy(col("q_id"), col("rk"))
    },

    // ---- classifier-eval rollup: confusion matrix + per-class recall
    //      of the t_langid heuristic against the declared lang label —
    //      the quality-filter audit every corpus pipeline runs before
    //      trusting a model-based filter at scale. Two hash aggregates
    //      over the scored frame; the recall denominator is a
    //      class-partitioned window over the (tiny) matrix itself. ----
    sqlChecked("t_lang_confusion",
      s"""WITH sc AS (SELECT doc_id, lang,
         |    len(list_filter(string_split($normSql, ' '),
         |        w -> w IN ('the','and','of','to','in','is'))) AS s_en,
         |    len(list_filter(string_split($normSql, ' '),
         |        w -> w IN ('der','die','und','das','ist','ein'))) AS s_de,
         |    len(list_filter(string_split($normSql, ' '),
         |        w -> w IN ('le','la','et','les','des','un'))) AS s_fr
         |  FROM documents),
         |pred AS (SELECT lang AS lang_declared,
         |    (SELECT l FROM (VALUES (s_en, 'en'), (s_de, 'de'), (s_fr, 'fr'))
         |       t(sc2, l) ORDER BY sc2 DESC, l DESC LIMIT 1) AS lang_pred
         |  FROM sc),
         |m AS (SELECT lang_declared, lang_pred, COUNT(*) AS n
         |      FROM pred GROUP BY 1, 2)
         |SELECT lang_declared, lang_pred, CAST(n AS BIGINT) AS n,
         |  ROUND(CAST(n AS DOUBLE) /
         |    SUM(n) OVER (PARTITION BY lang_declared), 8) AS recall
         |FROM m ORDER BY lang_declared, lang_pred""".stripMargin) { (s, d) =>
      val markers = Seq(
        "en" -> Seq("the", "and", "of", "to", "in", "is"),
        "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
        "fr" -> Seq("le", "la", "et", "les", "des", "un"))
      val byClass = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang_declared"))
      t(s, d, "documents")
        .select(col("lang").as("lang_declared"),
          graft.llm.TextAnalysis.languageId(col("text"), markers).as("lang_pred"))
        .groupBy(col("lang_declared"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .select(col("lang_declared"), col("lang_pred"), col("n"),
          round(col("n").cast("double") / sum(col("n")).over(byClass), 8)
            .as("recall"))
        .orderBy(col("lang_declared"), col("lang_pred"))
    },

    // ---- d15: cross-source dedup survivor selection — when a dup
    //      cluster spans sources, keep the highest-priority source's
    //      doc (curated beats crawl), tie-broken by doc_id. The d3→d6
    //      composition plus one cluster-partitioned window; the real
    //      pipeline decision step between clustering and deletion. ----
    sqlChecked("d15_cross_source",
      s"""WITH RECURSIVE ${LlmQueries.minhashCtes},
         |sym AS (SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(a, b) AS (SELECT a, b FROM sym
         |  UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         |comp AS (SELECT a AS id, LEAST(a, MIN(b)) AS cluster
         |  FROM reach GROUP BY a),
         |lab AS (SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster,
         |    CAST(SUBSTR(d.source, 4) AS INT) % 3 AS tier
         |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
         |r AS (SELECT doc_id, cluster, tier,
         |    ROW_NUMBER() OVER (PARTITION BY cluster
         |                       ORDER BY tier, doc_id) AS rk
         |  FROM lab)
         |SELECT doc_id, cluster, tier,
         |  CASE WHEN rk = 1 THEN 1 ELSE 0 END AS kept
         |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val pairs = Dedup.minhashPairs(docs, col("doc_id"), col("text"),
        shingleK = 3, numHashes = 32, bands = 8, threshold = 0.30,
        hasher = Dedup.md5Hash60)
      val cc = Dedup.connectedComponents(pairs, col("id_a"), col("id_b"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster")).orderBy(col("tier"), col("doc_id"))
      docs.select(col("doc_id"), col("source"))
        .join(cc, col("doc_id") === col("id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster"), col("doc_id")).as("cluster"),
          (substring(col("source"), 4, 10).cast("int") % 3).as("tier"))
        .withColumn("kept",
          when(row_number().over(w) === 1, 1).otherwise(0))
        .orderBy(col("doc_id"))
    }
  )
}
