package graft.relational

import graft.core.Tables
import graft.llm.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** LLM-training-data pipeline operators (dedup, similarity search,
  * multimodal plumbing, text analysis) over the documents/embeddings
  * tables. All hash-family ops run here on the md5-derived 60-bit base
  * hash (Dedup.md5Hash60) so DuckDB replays the identical MinHash /
  * SimHash signature arithmetic; the xxhash64 default stays the
  * production path and is fixture-tested in ScalaTest.
  */
object LlmQueries {
  import QueryDef._

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private val normSql =
    "TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g'))"

  /** Shared DuckDB replay of the MinHash-LSH pipeline (d3/d6): word
    * 3-shingles → 60-bit md5 base hash → 32 affine permutations → 8×4
    * band keys → bucket-join candidates → signature-agreement estimate,
    * ending in a `pairs(id_a, id_b, jaccard_est)` CTE filtered at the
    * 0.30 estimate threshold. Mirrors Dedup.minhashPairs with
    * hasher = md5Hash60 exactly. */
  private[relational] val minhashCtes: String = {
    val P = 2147483647L
    val mins = (0 until 32).map { i =>
      val a = 1103515245L * (i + 1) % P
      val b = 12345L + 7919L * i
      s"MIN(($a * h + $b) % $P) AS h$i"
    }.mkString(",\n    ")
    val bandSelects = (0 until 8).map { b =>
      val key = (0 until 4).map(r => s"h${b * 4 + r}").mkString(", ',', ")
      s"SELECT doc_id, $b AS band, CONCAT($key) AS bkey FROM sig"
    }.mkString("\n  UNION ALL ")
    val matches = (0 until 32)
      .map(i => s"CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""ws AS (SELECT doc_id, string_split($normSql, ' ') AS w
       |  FROM documents),
       |grams AS (SELECT doc_id,
       |    unnest(list_transform(range(1, len(w) - 1),
       |      i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS sh
       |  FROM ws),
       |h AS (SELECT doc_id,
       |    ('0x' || substr(md5(sh), 1, 15))::BIGINT % $P AS h FROM grams),
       |sig AS (SELECT doc_id,
       |    $mins
       |  FROM h GROUP BY doc_id),
       |banded AS ($bandSelects),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |pairs AS (SELECT id_a, id_b, ($matches) / 32.0 AS jaccard_est
       |  FROM cand JOIN sig sa ON sa.doc_id = id_a
       |            JOIN sig sb ON sb.doc_id = id_b
       |  WHERE ($matches) / 32.0 >= 0.30)""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(

    // ---- exact dedup: hash-groupBy, keep-first ----
    sqlChecked("d1_dedup_exact",
      s"""WITH h AS (SELECT doc_id, md5($normSql) AS text_hash FROM documents),
         |g AS (SELECT text_hash, COUNT(*) AS dup_count, MIN(doc_id) AS keeper
         |      FROM h GROUP BY 1)
         |SELECT doc_id AS id, h.text_hash, dup_count, doc_id = keeper AS keep
         |FROM h JOIN g USING (text_hash) ORDER BY id""".stripMargin) { (s, d) =>
      Dedup.exact(t(s, d, "documents"), col("doc_id"), col("text"))
        .orderBy(col("id"))
    },

    // ---- exact n-gram Jaccard near-dup within blocking key, J ≥ 0.8
    //      via lossless prefix filtering (the oracle brute-forces every
    //      blocked pair and filters — it must agree exactly, which
    //      proves the prefix candidate generation loses nothing) ----
    sqlChecked("d2_ngram_jaccard",
      s"""WITH base AS (
         |  SELECT doc_id, lang || '|' || CAST(n_chars // 100 AS VARCHAR) AS blk,
         |    list_distinct(string_split($normSql, ' ')) AS sh
         |  FROM documents),
         |j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
         |    / (len(a.sh) + len(b.sh)
         |       - len(list_filter(a.sh, x -> list_contains(b.sh, x)))) AS jaccard
         |FROM base a JOIN base b ON a.blk = b.blk AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, ROUND(jaccard, 8) AS jaccard FROM j
         |WHERE jaccard >= 0.8 ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Dedup.ngramJaccard(t(s, d, "documents"), col("doc_id"), col("text"),
          concat_ws("|", col("lang"), floor(col("n_chars") / 100).cast("string")),
          k = 1, threshold = 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 8).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- MinHash-LSH near-dup candidates, full signature pipeline
    //      replayed by DuckDB on the md5-derived 60-bit base hash ----
    sqlChecked("d3_minhash_lsh",
      s"""WITH $minhashCtes
         |SELECT id_a, id_b, jaccard_est FROM pairs
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Dedup.minhashPairs(t(s, d, "documents"), col("doc_id"), col("text"),
          shingleK = 3, numHashes = 32, bands = 8, threshold = 0.30,
          hasher = Dedup.md5Hash60)
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- duplicate-cluster assembly: the MinHash-LSH pair stream fed
    //      through distributed connected components (min-label star
    //      contraction, O(log diameter) equi-join rounds — no driver
    //      graph, no all-pairs), then one survivor per cluster. The
    //      oracle recomputes the identical pair set and closes it with
    //      a recursive transitive-closure CTE — the converged Spark
    //      labels must agree exactly. ----
    sqlChecked("d6_dedup_cluster",
      s"""WITH RECURSIVE $minhashCtes,
         |sym AS (SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(a, b) AS (SELECT a, b FROM sym
         |  UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         |comp AS (SELECT a AS id, LEAST(a, MIN(b)) AS cluster
         |  FROM reach GROUP BY a)
         |SELECT d.doc_id AS id, COALESCE(c.cluster, d.doc_id) AS cluster,
         |  COALESCE(c.cluster, d.doc_id) = d.doc_id AS keep
         |FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
         |ORDER BY id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val pairs = Dedup.minhashPairs(docs, col("doc_id"), col("text"),
        shingleK = 3, numHashes = 32, bands = 8, threshold = 0.30,
        hasher = Dedup.md5Hash60)
      val cc = Dedup.connectedComponents(pairs, col("id_a"), col("id_b"))
      docs.select(col("doc_id"))
        .join(cc, col("doc_id") === col("id"), "left")
        .select(col("doc_id").as("id"),
          coalesce(col("cluster"), col("doc_id")).as("cluster"),
          (coalesce(col("cluster"), col("doc_id")) === col("doc_id")).as("keep"))
        .orderBy(col("id"))
    },

    // ---- SimHash fingerprints + banded-Hamming near-dup pairs. The
    //      4×16-bit band join is EXACT for Hamming ≤ 3 (pigeonhole), so
    //      the oracle can brute-force all pairs and must agree ----
    sqlChecked("d4_simhash", {
      val votes = (0 until 60)
        .map(b => s"SUM(CASE WHEN (h >> $b) % 2 = 0 THEN -1 ELSE 1 END) AS v$b")
        .mkString(",\n    ")
      val fp = (0 until 60)
        .map(b => s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END")
        .mkString(" + ")
      s"""WITH w AS (SELECT doc_id,
         |    unnest(string_split($normSql, ' ')) AS tok FROM documents),
         |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
         |  FROM w),
         |v AS (SELECT doc_id,
         |    $votes
         |  FROM h GROUP BY doc_id),
         |fp AS (SELECT doc_id, CAST($fp AS BIGINT) AS sh FROM v)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
         |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sh, b.sh)) <= 3
         |ORDER BY id_a, id_b""".stripMargin
    }) { (s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), col("doc_id"), col("text"),
          bands = 4, maxHamming = 3, hasher = Dedup.md5Hash60)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- embedding-cosine near-dup: a FIXED 200-vector ingestion
    //      batch exact-screened against the label-blocked corpus —
    //      the admission check a pipeline runs per batch. Cost is
    //      batch × corpus (linear in the corpus); the full
    //      corpus-vs-corpus label self-join was quadratic on the sf1
    //      probe (16x on 10x data) — whole-corpus semantic pruning is
    //      d13_semdedup / sim_bucketed_ann's LSH-bucketed job. ----
    sqlChecked("d5_embed_neardup",
      """WITH base AS (SELECT vec_id, label,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ROUND(list_dot_product(a.v, b.v) /
        |    (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))),
        |    6) AS cos
        |FROM base a JOIN base b
        |  ON a.label = b.label AND a.vec_id < 200 AND b.vec_id > a.vec_id
        |WHERE list_dot_product(a.v, b.v) /
        |    (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      Dedup.embeddingNearDupBatch(emb.filter(col("vec_id") < 200), emb,
          col("vec_id"), col("embedding"), col("label"), minCos = 0.45)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- brute-force cosine top-k against a fixed query vector ----
    sqlChecked("sim_topk",
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
        |           WHERE vec_id = 0),
        |scored AS (SELECT vec_id,
        |    list_dot_product(CAST(embedding AS DOUBLE[]), qv) /
        |      (SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                             CAST(embedding AS DOUBLE[])))
        |       * SQRT(list_dot_product(qv, qv))) AS cos
        |  FROM embeddings, q WHERE vec_id <> 0)
        |SELECT vec_id AS id, ROUND(cos, 6) AS cos
        |FROM scored ORDER BY cos DESC, id LIMIT 10""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
      Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0),
          col("vec_id"), col("embedding"), q, k = 10)
        .select(col("id"), round(col("cos"), 6).as("cos"))
        .orderBy(col("cos").desc, col("id"))
    },

    // ---- LSH-bucketed ANN: sign-plane bucket + in-bucket top-k ----
    sqlChecked("sim_bucketed_ann",
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |              FROM embeddings),
        |bucketed AS (SELECT vec_id, v,
        |    (CASE WHEN list_sum(list_transform(range(0, len(v)),
        |       i -> CASE WHEN (i // 1) % 2 = 0 THEN v[i + 1] ELSE -v[i + 1] END)) >= 0
        |       THEN 1 ELSE 0 END)
        |  + (CASE WHEN list_sum(list_transform(range(0, len(v)),
        |       i -> CASE WHEN (i // 2) % 2 = 0 THEN v[i + 1] ELSE -v[i + 1] END)) >= 0
        |       THEN 2 ELSE 0 END)
        |  + (CASE WHEN list_sum(list_transform(range(0, len(v)),
        |       i -> CASE WHEN (i // 3) % 2 = 0 THEN v[i + 1] ELSE -v[i + 1] END)) >= 0
        |       THEN 4 ELSE 0 END) AS bucket
        |  FROM base),
        |q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM bucketed WHERE vec_id < 3),
        |scored AS (SELECT q_id, c.vec_id AS c_id,
        |    list_dot_product(c.v, qv) /
        |      (SQRT(list_dot_product(c.v, c.v)) * SQRT(list_dot_product(qv, qv))) AS cos
        |  FROM bucketed c JOIN q USING (bucket) WHERE c.vec_id <> q_id),
        |ranked AS (SELECT q_id, c_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rn
        |  FROM scored)
        |SELECT q_id, c_id, ROUND(cos, 6) AS cos, rn
        |FROM ranked WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val res = Similarity.bucketedTopK(
        emb, col("vec_id"), col("embedding"),
        emb.filter(col("vec_id") < 3), col("vec_id"), col("embedding"),
        planes = 3, k = 6)  // k=6 then drop self-match below
      res.filter(col("c_id") =!= col("q_id"))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
            .orderBy(col("cos").desc, col("c_id"))))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("c_id"), round(col("cos"), 6).as("cos"), col("rn"))
        .orderBy(col("q_id"), col("rn"))
    },

    // ---- IVF ANN: k-means coarse quantizer (3 pinned Lloyd
    //      iterations, init = 8 smallest ids, exact quantized-BIGINT
    //      centroid means so both engines agree bit-for-bit regardless
    //      of aggregation order) + 2-probe cell search with exact
    //      in-cell cosine. DuckDB replays the whole fixed point. ----
    sqlChecked("sim_ivf", {
      val K = 8; val ITERS = 3; val NP = 2; val TOPK = 5; val DIMS = 64
      import KmeansReplay.assignSql
      s"""WITH ${KmeansReplay.ctes(K, ITERS, DIMS)},
         |qset AS (SELECT vec_id, v FROM emb
         |  WHERE vec_id % 101 = 0 AND vec_id < 51712),
         |probes AS (SELECT vec_id AS q_id, v AS qv, cid AS cell
         |  FROM (${KmeansReplay.rankedAssignSql("qset", s"c$ITERS", "pr")})
         |  WHERE pr <= $NP),
         |scored AS (SELECT p.q_id, s.vec_id AS c_id,
         |    list_dot_product(s.v, p.qv) /
         |      (SQRT(list_dot_product(s.v, s.v))
         |       * SQRT(list_dot_product(p.qv, p.qv))) AS cos
         |  FROM cells s JOIN probes p USING (cell)),
         |ranked AS (SELECT q_id, c_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rn
         |  FROM scored)
         |SELECT q_id, c_id, ROUND(cos, 8) AS cos, rn
         |FROM ranked WHERE rn <= $TOPK ORDER BY q_id, rn""".stripMargin
    }) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val cents = Similarity.kmeansFit(emb, col("vec_id"), col("embedding"),
        k = 8, iters = 3)
      // FIXED query panel: every 101st vector, capped at 512 probes
      // (512·101 = 51712) — an ANN search serves a bounded query batch
      // against a growing corpus, so search cost is O(|corpus|·nProbe/K),
      // linear in the data. Uncapped, the panel itself grew with the
      // corpus and the probe stage went quadratic (354× at the 100×
      // probe). No-op at ≤ sf1 (panel ≤ 199 there).
      Similarity.ivfTopK(emb, col("vec_id"), col("embedding"),
          emb.filter(col("vec_id") % 101 === 0 && col("vec_id") < 51712),
          col("vec_id"), col("embedding"),
          cents, nProbe = 2, k = 5)
        .select(col("q_id"), col("c_id"), round(col("cos"), 8).as("cos"),
          col("rn"))
        .orderBy(col("q_id"), col("rn"))
    },

    // ---- language-ID heuristic (marker words, deterministic argmax) ----
    sqlChecked("t_langid",
      s"""WITH sc AS (SELECT doc_id, lang,
         |    len(list_filter(string_split($normSql, ' '),
         |        w -> w IN ('the','and','of','to','in','is'))) AS s_en,
         |    len(list_filter(string_split($normSql, ' '),
         |        w -> w IN ('der','die','und','das','ist','ein'))) AS s_de,
         |    len(list_filter(string_split($normSql, ' '),
         |        w -> w IN ('le','la','et','les','des','un'))) AS s_fr
         |  FROM documents)
         |SELECT doc_id, lang AS lang_declared,
         |  (SELECT l FROM (VALUES (s_en, 'en'), (s_de, 'de'), (s_fr, 'fr')) t(sc2, l)
         |   ORDER BY sc2 DESC, l DESC LIMIT 1) AS lang_pred,
         |  s_en, s_de, s_fr
         |FROM sc ORDER BY doc_id""".stripMargin) { (s, d) =>
      val markers = Seq(
        "en" -> Seq("the", "and", "of", "to", "in", "is"),
        "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
        "fr" -> Seq("le", "la", "et", "les", "des", "un"))
      val docs = t(s, d, "documents")
      docs.select(col("doc_id"), col("lang").as("lang_declared"),
          TextAnalysis.languageId(col("text"), markers).as("lang_pred"),
          TextAnalysis.stopwordCount(col("text"), markers(0)._2).as("s_en"),
          TextAnalysis.stopwordCount(col("text"), markers(1)._2).as("s_de"),
          TextAnalysis.stopwordCount(col("text"), markers(2)._2).as("s_fr"))
        .orderBy(col("doc_id"))
    },

    // ---- quality scoring: length/punct/stopword signals ----
    sqlChecked("t_quality",
      s"""WITH n AS (SELECT doc_id, text, $normSql AS norm FROM documents)
         |SELECT doc_id,
         |  LENGTH(text) AS n_chars_m,
         |  LENGTH(norm) - LENGTH(REPLACE(norm, ' ', '')) + 1 AS n_tokens,
         |  ROUND(CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[.,;:!?'']', '', 'g'))
         |    AS DOUBLE) / GREATEST(LENGTH(text), 1), 8) AS punct_ratio,
         |  ROUND(CAST(len(list_filter(string_split(norm, ' '),
         |    w -> w IN ('the','and','of','to','in','is'))) AS DOUBLE)
         |    / (LENGTH(norm) - LENGTH(REPLACE(norm, ' ', '')) + 1), 8) AS stop_ratio
         |FROM n ORDER BY doc_id""".stripMargin) { (s, d) =>
      val norm = Dedup.normalize(col("text"))
      val nTok = length(norm) - length(regexp_replace(norm, " ", "")) + 1
      t(s, d, "documents").select(col("doc_id"),
          length(col("text")).as("n_chars_m"),
          nTok.as("n_tokens"),
          round((length(col("text")) -
            length(regexp_replace(col("text"), "[.,;:!?']", ""))).cast("double") /
            greatest(length(col("text")), lit(1)), 8).as("punct_ratio"),
          round(TextAnalysis.stopwordCount(col("text"),
            Seq("the", "and", "of", "to", "in", "is")).cast("double") / nTok, 8)
            .as("stop_ratio"))
        .orderBy(col("doc_id"))
    },

    // ---- token counting (whitespace) + corpus rollup ----
    sqlChecked("t_tokens",
      s"""WITH n AS (SELECT doc_id, lang, $normSql AS norm FROM documents)
         |SELECT lang,
         |  CAST(SUM(LENGTH(norm) - LENGTH(REPLACE(norm, ' ', '')) + 1) AS BIGINT) AS total_tokens,
         |  ROUND(CAST(SUM(LENGTH(norm) - LENGTH(REPLACE(norm, ' ', '')) + 1) AS DOUBLE) / COUNT(*), 6) AS avg_tokens,
         |  COUNT(*) AS n_docs
         |FROM n GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("lang"), TextAnalysis.tokenCount(col("text")).as("tc"))
        .groupBy(col("lang"))
        .agg(sum(col("tc")).as("total_tokens"),
          // exact long sum / count, not avg(): double accumulation order
          // differs across engines and ROUND(...,6) amplifies the ulp
          round(sum(col("tc")).cast("double") / count(lit(1)), 6).as("avg_tokens"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    },

    // ---- link-graph PageRank (corpus-quality signal): 5 pinned
    //      damped iterations over a synthetic 150-node weighted link
    //      graph (nodes 100-149 are dangling — never a source — so the
    //      dangling-mass redistribution is exercised). Each DuckDB CTE
    //      replays one iteration; PageRank contracts, so ulps decay. ----
    sqlChecked("g_pagerank", {
      val iters = (1 to 5).map { k =>
        s"""d$k(dang) AS (SELECT COALESCE(SUM(r.rank), 0) FROM r${k - 1} r
           |  LEFT JOIN outw o ON r.node = o.src WHERE o.src IS NULL),
           |i$k AS (SELECT e.dst AS node, SUM(r.rank / o.outw * e.wt) AS inflow
           |  FROM e JOIN r${k - 1} r ON e.src = r.node
           |  JOIN outw o ON o.src = e.src GROUP BY e.dst),
           |r$k AS (SELECT nodes.node,
           |    0.15 / (SELECT n FROM n)
           |    + 0.85 * (COALESCE(i.inflow, 0)
           |              + (SELECT dang FROM d$k) / (SELECT n FROM n)) AS rank
           |  FROM nodes LEFT JOIN i$k i ON nodes.node = i.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT o_custkey % 100 AS src, o_orderkey % 150 AS dst,
         |    CAST(COUNT(*) AS DOUBLE) AS wt FROM orders GROUP BY 1, 2),
         |outw AS (SELECT src, SUM(wt) AS outw FROM e GROUP BY src),
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
         |n(n) AS (SELECT COUNT(*) FROM nodes),
         |r0 AS (SELECT node, 1.0 / (SELECT n FROM n) AS rank FROM nodes),
         |$iters
         |SELECT node, ROUND(rank, 10) AS rank FROM r5 ORDER BY node""".stripMargin
    }) { (s, d) =>
      val edges = t(s, d, "orders").select(
        (col("o_custkey") % 100).as("src"),
        (col("o_orderkey") % 150).as("dst"), lit(1.0).as("w"))
      graft.llm.LinkGraph.pageRank(edges, col("src"), col("dst"), col("w"),
          damping = 0.85, iters = 5)
        .select(col("node"), round(col("rank"), 10).as("rank"))
        .orderBy(col("node"))
    },

    // ---- benchmark decontamination: flag training docs sharing any
    //      word 5-gram with a (small) eval set — the standard n-gram
    //      overlap check before training. Eval grams broadcast into an
    //      equi-join on the gram; nothing quadratic, train side streams.
    //      ----
    sqlChecked("d7_decontaminate",
      s"""WITH ws AS (SELECT doc_id, string_split($normSql, ' ') AS w
         |  FROM documents),
         |grams AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 3),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
         |      || ' ' || w[i+4])) AS g
         |  FROM ws),
         |eg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
         |tg AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 97 <> 0)
         |SELECT tg.doc_id, COUNT(*) AS n_shared
         |FROM tg JOIN eg ON tg.g = eg.g
         |GROUP BY tg.doc_id ORDER BY tg.doc_id""".stripMargin) { (s, d) =>
      val words = t(s, d, "documents").select(col("doc_id"),
        posexplode(split(Dedup.normalize(col("text")), " ")).as(Seq("pos", "w")))
      val byDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      val parts = col("w") +: (1 until 5).map(o => lead(col("w"), o).over(byDoc))
      // gram and completeness flag in ONE select: window expressions in
      // a select AFTER a filter would re-evaluate over the already-
      // filtered partition and emit truncated tail grams
      val grams = words
        .select(col("doc_id"), concat_ws(" ", parts: _*).as("g"),
          lead(col("w"), 4).over(byDoc).isNotNull.as("full"))
        .filter(col("full")).drop("full")
      val eg = grams.filter(col("doc_id") % 97 === 0).select(col("g")).distinct()
      val tg = grams.filter(col("doc_id") % 97 =!= 0).distinct()
      tg.join(broadcast(eg), Seq("g"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
        .orderBy(col("doc_id"))
    },

    // ---- deterministic train/valid/test split: the cross-engine RNG
    //      keyed by doc id gives a reproducible 80/10/10 assignment
    //      with no shuffle beyond the final rollup ----
    sqlChecked("d8_split", {
      val uSql = graft.core.Rng.uniformSql("doc_id", 2024L)
      // thresholds generated from the SAME scanLeft doubles assignSplit
      // uses (0.8 + 0.1 ≠ 0.9 in IEEE arithmetic)
      val cases = graft.sampling.Resample
        .splitThresholds(Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
        .map { case (n, c) => s"WHEN $uSql < $c THEN '$n'" }.mkString(" ")
      s"""WITH s AS (SELECT doc_id, n_chars,
         |    CASE $cases ELSE 'test' END AS split
         |  FROM documents)
         |SELECT split, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
         |FROM s GROUP BY split ORDER BY split""".stripMargin
    }) { (s, d) =>
      t(s, d, "documents")
        .withColumn("split", graft.sampling.Resample.assignSplit(col("doc_id"),
          Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), salt = 2024L))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
        .orderBy(col("split"))
    },

    // ---- TF-IDF top terms per document: tokenize → per-doc tf →
    //      corpus df → tf·ln(N/df) → top-3 per doc (score desc, term
    //      asc tie-break). The whole thing is two hash aggregates +
    //      a broadcast df join + one per-doc window — the canonical
    //      keyword-extraction shape for corpus-scale pipelines. ----
    sqlChecked("t_tfidf",
      s"""WITH toks AS (SELECT doc_id,
         |    unnest(string_split($normSql, ' ')) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
         |  GROUP BY doc_id, term),
         |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks
         |  GROUP BY term),
         |n(n) AS (SELECT COUNT(*) FROM documents),
         |scored AS (SELECT doc_id, term, tf,
         |    CAST(tf AS DOUBLE) * LN(CAST(n AS DOUBLE) / df) AS score
         |  FROM tf JOIN df USING (term) CROSS JOIN n),
         |ranked AS (SELECT doc_id, term, tf, score,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, term) AS rk
         |  FROM scored)
         |SELECT doc_id, term, tf, rk, ROUND(score, 8) AS tfidf
         |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val toks = docs.select(col("doc_id"),
        explode(split(Dedup.normalize(col("text")), " ")).as("term"))
      val tf = toks.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df = toks.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val n = docs.count().toDouble
      val scored = tf.join(broadcast(df), Seq("term"))
        .withColumn("score", col("tf").cast("double") * log(lit(n) / col("df")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("rk"),
          round(col("score"), 8).as("tfidf"))
        .orderBy(col("doc_id"), col("rk"))
    },

    // ---- PII scrubbing: regex redaction of email-like and long-digit
    //      tokens with per-doc redaction counts — the standard scrub
    //      stage before training. Patterns stay in the common subset of
    //      Java and RE2 regex so both engines transform identically. ----
    sqlChecked("t_redact",
      """WITH r AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(text,
        |      '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g'),
        |      '[0-9]{6,}', '<NUM>', 'g') AS red,
        |    len(regexp_extract_all(text, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+'))
        |      AS n_emails,
        |    len(regexp_extract_all(text, '[0-9]{6,}')) AS n_longnums
        |  FROM documents)
        |SELECT doc_id, n_emails, n_longnums, LENGTH(red) AS red_len,
        |  md5(red) AS red_hash
        |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
      val email = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+"
      val num = "[0-9]{6,}"
      val red = regexp_replace(regexp_replace(col("text"),
        email, "<EMAIL>"), num, "<NUM>")
      t(s, d, "documents").select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(email), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("text"), lit(num), lit(0))).as("n_longnums"),
          length(red).as("red_len"),
          md5(red).as("red_hash"))
        .orderBy(col("doc_id"))
    },

    // ---- corpus bigram frequency: top-20 word bigrams — the n-gram
    //      LM / contamination-check staple; explode + lead window +
    //      hash aggregate + TakeOrdered ----
    sqlChecked("t_bigrams",
      s"""WITH ws AS (SELECT doc_id, string_split($normSql, ' ') AS w
         |  FROM documents),
         |bi AS (SELECT unnest(list_transform(range(1, len(w)),
         |    i -> w[i] || ' ' || w[i + 1])) AS bigram FROM ws)
         |SELECT bigram, COUNT(*) AS n FROM bi GROUP BY bigram
         |ORDER BY n DESC, bigram LIMIT 20""".stripMargin) { (s, d) =>
      val words = t(s, d, "documents").select(col("doc_id"),
        posexplode(split(Dedup.normalize(col("text")), " ")).as(Seq("pos", "w")))
      val byDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      words.withColumn("nx", lead(col("w"), 1).over(byDoc))
        .filter(col("nx").isNotNull)
        .select(concat_ws(" ", col("w"), col("nx")).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram")).limit(20)
    },

    // ---- document fingerprinting ----
    sqlChecked("t_fingerprint",
      s"""SELECT doc_id, SUBSTR(md5($normSql), 1, 16) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    },

    // ---- multimodal: REAL byte formats (BMP / WAV / framed-BMP
    //      video), REAL pure-JVM parsing in a partition-batched decode.
    //      Payloads are deterministic functions of doc_id, so the
    //      oracle replays the pixel/sample arithmetic as integer SQL
    //      and the decoded stats must hash-match exactly. ----
    sqlChecked("mm_decode",
      """WITH img AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h
        |    FROM documents WHERE doc_id % 3 = 0),
        |iy AS (SELECT doc_id, w, h, unnest(range(h)) AS y FROM img),
        |ipx AS (SELECT doc_id, w, h, y, unnest(range(w)) AS x FROM iy),
        |istat AS (SELECT doc_id AS media_id, 'image' AS kind,
        |    MAX(w) AS width, MAX(h) AS height, CAST(0 AS BIGINT) AS duration_ms,
        |    1 AS n_frames,
        |    ROUND(CAST(SUM((doc_id*31 + 7*x + 13*y) % 256) AS DOUBLE)
        |      / (MAX(w) * MAX(h)), 6) AS mean_val
        |  FROM ipx GROUP BY doc_id),
        |aud AS (SELECT doc_id, 256 + doc_id % 128 AS n FROM documents
        |  WHERE doc_id % 3 = 1),
        |asmp AS (SELECT doc_id, n, unnest(range(n)) AS i FROM aud),
        |astat AS (SELECT doc_id AS media_id, 'audio' AS kind,
        |    0 AS width, 0 AS height, MAX(n) * 1000 // 8000 AS duration_ms,
        |    0 AS n_frames,
        |    ROUND(CAST(SUM(ABS((doc_id*131 + i*17) % 65536 - 32768)) AS DOUBLE)
        |      / MAX(n), 6) AS mean_val
        |  FROM asmp GROUP BY doc_id),
        |vid AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h,
        |    2 + doc_id % 4 AS fr FROM documents WHERE doc_id % 3 = 2),
        |vf AS (SELECT doc_id, w, h, fr, unnest(range(fr)) AS f FROM vid),
        |vy AS (SELECT doc_id, w, h, fr, f, unnest(range(h)) AS y FROM vf),
        |vpx AS (SELECT doc_id, w, h, fr, f, y, unnest(range(w)) AS x FROM vy),
        |vstat AS (SELECT doc_id AS media_id, 'video' AS kind,
        |    MAX(w) AS width, MAX(h) AS height, MAX(fr) * 40 AS duration_ms,
        |    CAST(MAX(fr) AS INT) AS n_frames,
        |    ROUND(CAST(SUM((doc_id*31 + f*101 + 7*x + 13*y) % 256) AS DOUBLE)
        |      / (MAX(fr) * MAX(w) * MAX(h)), 6) AS mean_val
        |  FROM vpx GROUP BY doc_id)
        |SELECT * FROM (SELECT * FROM istat UNION ALL SELECT * FROM astat
        |  UNION ALL SELECT * FROM vstat) ORDER BY media_id""".stripMargin) { (s, d) =>
      val media = Multimodal.synthesize(t(s, d, "documents"),
        col("doc_id"), col("text"), col("source"))
      Multimodal.decode(media)
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("duration_ms"), col("n_frames"), round(col("mean_val"), 6).as("mean_val"))
        .orderBy(col("media_id"))
    },

    sqlChecked("mm_frames",
      """WITH vid AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h,
        |    2 + doc_id % 4 AS fr FROM documents WHERE doc_id % 3 = 2),
        |vf AS (SELECT doc_id, w, h, unnest(range(fr)) AS f FROM vid),
        |sampled AS (SELECT * FROM vf WHERE f % 4 = 0),
        |vy AS (SELECT doc_id, w, h, f, unnest(range(h)) AS y FROM sampled),
        |vpx AS (SELECT doc_id, w, h, f, y, unnest(range(w)) AS x FROM vy)
        |SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
        |  MAX(w) AS width, MAX(h) AS height,
        |  ROUND(CAST(SUM((doc_id*31 + f*101 + 7*x + 13*y) % 256) AS DOUBLE)
        |    / (MAX(w) * MAX(h)), 6) AS mean_val
        |FROM vpx GROUP BY doc_id, f ORDER BY media_id, frame_idx""".stripMargin) { (s, d) =>
      val media = Multimodal.synthesize(t(s, d, "documents"),
        col("doc_id"), col("text"), col("source"))
      Multimodal.sampleFrames(media, stride = 4)
        .select(col("media_id"), col("frame_idx"), col("width"), col("height"),
          round(col("mean_val"), 6).as("mean_val"))
        .orderBy(col("media_id"), col("frame_idx"))
    },

    // ---- flagship: end-to-end training-data prep (dedup → quality
    //      filter → per-lang corpus stats), all in one declarative plan ----
    sqlChecked("d_pipeline",
      s"""WITH h AS (
         |  SELECT doc_id, lang, n_chars, $normSql AS norm,
         |    md5($normSql) AS fp FROM documents),
         |kept AS (
         |  SELECT *,
         |    LENGTH(norm) - LENGTH(REPLACE(norm, ' ', '')) + 1 AS n_tok,
         |    ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |  FROM h),
         |clean AS (
         |  SELECT * FROM kept
         |  WHERE rn = 1                 -- exact-dup removal, keep first
         |    AND n_tok >= 10            -- too-short filter
         |    AND n_chars <= 2000)       -- too-long filter
         |SELECT lang,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         |  ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars
         |FROM clean GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val norm = Dedup.normalize(col("text"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fp")).orderBy(col("doc_id"))
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"), norm.as("norm"),
          md5(norm).as("fp"))
        .withColumn("n_tok",
          length(col("norm")) - length(regexp_replace(col("norm"), " ", "")) + 1)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("n_tok") >= 10 && col("n_chars") <= 2000)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"),
          round(sum(col("n_chars")).cast("double") / count(lit(1)), 6).as("avg_chars"))
        .orderBy(col("lang"))
    },

    // ---- intra-document repetition score: duplicate-trigram mass and
    //      the single most-repeated trigram's share — the classic
    //      looping-text quality signal. Per-doc grouped counts only;
    //      nothing global, so it scales like any grouped aggregate. ----
    sqlChecked("t_repetition",
      s"""WITH ws AS (SELECT doc_id, string_split($normSql, ' ') AS w
         |  FROM documents),
         |g AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g FROM ws),
         |c AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY doc_id, g),
         |a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
         |    COUNT(*) AS n_distinct, MAX(c) AS top FROM c GROUP BY doc_id)
         |SELECT doc_id, n_grams,
         |  ROUND(1 - CAST(n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE), 8)
         |    AS rep_ratio,
         |  ROUND(CAST(top AS DOUBLE) / CAST(n_grams AS DOUBLE), 8) AS top_ratio
         |FROM a ORDER BY doc_id""".stripMargin) { (s, d) =>
      val words = t(s, d, "documents").select(col("doc_id"),
        posexplode(split(Dedup.normalize(col("text")), " ")).as(Seq("pos", "w")))
      val byDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      // gram + completeness flag in ONE select (the d7 lesson: a window
      // expression in a select AFTER a filter re-evaluates over the
      // filtered partition and emits truncated tail grams)
      val grams = words.select(col("doc_id"),
          concat_ws(" ", col("w"), lead(col("w"), 1).over(byDoc),
            lead(col("w"), 2).over(byDoc)).as("g"),
          lead(col("w"), 2).over(byDoc).isNotNull.as("full"))
        .filter(col("full"))
      grams.groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_grams"), count(lit(1)).as("n_distinct"),
          max(col("c")).as("top"))
        .select(col("doc_id"), col("n_grams"),
          round(lit(1) - col("n_distinct").cast("double")
            / col("n_grams").cast("double"), 8).as("rep_ratio"),
          round(col("top").cast("double")
            / col("n_grams").cast("double"), 8).as("top_ratio"))
        .orderBy(col("doc_id"))
    },

    // ---- per-source language-distribution entropy: the corpus-mix
    //      diversity signal (a source whose language histogram is
    //      near-deterministic scores ~0). Two grouped aggregates; the
    //      share comes from a window sum so no self-join. ----
    sqlChecked("t_entropy",
      """WITH c AS (SELECT source, lang, COUNT(*) AS n
        |  FROM documents GROUP BY source, lang),
        |p AS (SELECT source,
        |    CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY source)
        |      AS DOUBLE) AS p
        |  FROM c)
        |SELECT source, ROUND(-SUM(p * LN(p)), 8) AS h, COUNT(*) AS n_langs
        |FROM p GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val wSrc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
      t(s, d, "documents").groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n"))
        .select(col("source"),
          (col("n").cast("double")
            / sum(col("n")).over(wSrc).cast("double")).as("p"))
        .groupBy(col("source"))
        .agg(round(-sum(col("p") * log(col("p"))), 8).as("h"),
          count(lit(1)).as("n_langs"))
        .orderBy(col("source"))
    },

    // ---- cross-document repeated-passage detection: exact 6-gram
    //      shingles shared by 2..50 distinct documents, rolled up per
    //      doc. The 50-doc cap is the skew guard (boilerplate grams
    //      carry no dedup signal and would be shuffle hot keys); the
    //      md5-derived hash makes the whole pipeline DuckDB-replayable. ----
    sqlChecked("d9_passage_dup",
      s"""WITH ws AS (SELECT doc_id, string_split($normSql, ' ') AS w
         |  FROM documents),
         |grams AS (SELECT DISTINCT doc_id,
         |    ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
         |  FROM (SELECT doc_id,
         |      unnest(list_transform(range(1, greatest(len(w) - 5, 1) + 1),
         |        i -> array_to_string(w[i:i+5], ' '))) AS g FROM ws)),
         |hot AS (SELECT h, COUNT(*) AS n_docs FROM grams GROUP BY h
         |  HAVING COUNT(*) BETWEEN 2 AND 50)
         |SELECT doc_id, COUNT(*) AS n_dup, MAX(n_docs) AS max_spread
         |FROM grams JOIN hot USING (h)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      Dedup.repeatedPassages(t(s, d, "documents"), col("doc_id"), col("text"),
          n = 6, minDocs = 2, maxDocs = 50, hasher = Dedup.md5Hash60)
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_dup"), max(col("n_docs")).as("max_spread"))
        .select(col("id").as("doc_id"), col("n_dup"), col("max_spread"))
        .orderBy(col("doc_id"))
    }
  )
}

/** Shared DuckDB replay of the pinned-Lloyd k-means fixed point
  * (Similarity.kmeansFit: init = k smallest ids, quantized-BIGINT
  * centroid means, fixed iteration count) over the embeddings table.
  * Consumed by `sim_ivf` and `d13_semdedup` — both end at a `cells`
  * CTE holding every vector's final cell assignment. */
private[relational] object KmeansReplay {

  /** Nearest-centroid assignment of `src` rows against the `cent`
    * centroid CTE, by the same (v·v − 2 v·c) + c·c association order
    * the engine's dist2 expression uses, ties → smallest cid. Written
    * as a GROUP BY + struct-MIN aggregate (lexicographic (d, cid)),
    * NOT a ROW_NUMBER window: the window form sorts the full
    * |src|·|cent| pair stream WITH the 64-double vectors riding along —
    * at sf10 (200k × 390 centroids) that spilled ~70 GB of DuckDB temp
    * and killed the replay; the aggregate projects v away before any
    * state grows, then joins v back by id. Same argmin, same ties. */
  def assignSql(src: String, cent: String): String =
    s"""SELECT s.vec_id, s.v, a.cid
       |    FROM (SELECT e.vec_id,
       |        (MIN(struct_pack(d := list_dot_product(e.v, e.v)
       |            - 2*list_dot_product(e.v, c.v)
       |            + list_dot_product(c.v, c.v),
       |          cid := c.cid))).cid AS cid
       |      FROM $src e CROSS JOIN $cent c GROUP BY e.vec_id) a
       |    JOIN $src s ON s.vec_id = a.vec_id""".stripMargin

  /** Window-ranked variant for callers that need the TOP-N nearest
    * centroids per row (IVF probe selection), not just the argmin.
    * Fine for QUERY-sized inputs; for corpus-sized assignment use
    * [[assignSql]] (see its spill note). */
  def rankedAssignSql(src: String, cent: String, rnName: String): String =
    s"""SELECT e.vec_id, e.v, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |        list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c.v)
       |          + list_dot_product(c.v, c.v), c.cid) AS $rnName
       |    FROM $src e CROSS JOIN $cent c""".stripMargin

  /** The emb → c0 → (a_i, m_i, c_i)* → cells CTE stack (no leading
    * WITH). Empty clusters keep their previous centroid (LEFT JOIN +
    * COALESCE), mirroring kmeansFit exactly. */
  def ctes(k: Int, iters: Int, dims: Int): String =
    ctes(k.toString, iters, dims)

  /** Like [[ctes]] but k is an arbitrary SQL scalar expression
    * (evaluated against the emb CTE), so a fixture can derive the cell
    * count from the CORPUS — the same k ∝ n/targetCellSize rule the
    * engine side uses — and the oracle replays the identical fixed
    * point at any scale factor. `fitWhere` optionally restricts the
    * Lloyd ITERATIONS (init + means) to a deterministic subsample —
    * the standard fit-on-a-sample discipline: centroid quality needs
    * only a representative sample, while the final `cells` assignment
    * always runs over the full corpus. With it the fit passes cost
    * |sample|·k instead of n·k each. */
  def ctes(kSql: String, iters: Int, dims: Int,
      fitWhere: String = ""): String = {
    val meanList = (1 to dims).map(i =>
      s"CAST(SUM(CAST(FLOOR(v[$i]*10000000.0 + 0.5) AS BIGINT)) AS DOUBLE)" +
        "/CAST(COUNT(*) AS DOUBLE)/10000000.0")
      .mkString("list_value(", ", ", ")")
    val fit = if (fitWhere.isEmpty) "emb"
              else s"(SELECT * FROM emb WHERE $fitWhere) "
    val iterCtes = (1 to iters).map { it =>
      s"""a$it AS (${assignSql(fit, s"c${it - 1}")}),
         |m$it AS (SELECT cid, $meanList AS v FROM a$it GROUP BY cid),
         |c$it AS (SELECT o.cid, COALESCE(n.v, o.v) AS v
         |  FROM c${it - 1} o LEFT JOIN m$it n USING (cid))""".stripMargin
    }.mkString(",\n")
    s"""emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |c0 AS (SELECT cid, v FROM (
       |    SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v
       |    FROM $fit)
       |  WHERE cid < ($kSql)),
       |$iterCtes,
       |cells AS (SELECT vec_id, v, cid AS cell
       |  FROM (${assignSql("emb", s"c$iters")}))""".stripMargin
  }

  /** Keyed variant of [[assignSql]] for a TREE level: each row of
    * `src` (which carries its current `cell`) considers only the
    * children OF ITS OWN PARENT — `child.cid // b = row.cell` — so the
    * candidate stream is |src|·b, never |src|·k. Same argmin, same
    * (d, cid) tie order, same distance association. */
  private def assignChildSql(src: String, cent: String): String =
    s"""SELECT s.vec_id, s.v, a.cid
       |    FROM (SELECT e.vec_id,
       |        (MIN(struct_pack(d := list_dot_product(e.v, e.v)
       |            - 2*list_dot_product(e.v, c.v)
       |            + list_dot_product(c.v, c.v),
       |          cid := c.cid))).cid AS cid
       |      FROM $src e CROSS JOIN bb JOIN $cent c
       |        ON (c.cid // bb.b) = e.cell
       |      GROUP BY e.vec_id) a
       |    JOIN $src s ON s.vec_id = a.vec_id""".stripMargin

  /** The hierarchical twin of [[ctes]]: emb → fixed-DEPTH-4 tree fit →
    * cells, mirroring [[graft.llm.Similarity.kmeansTreeFit]] +
    * `assignTree` exactly. Structure (per level ℓ ≥ 2, prefix tℓ):
    * init = the b smallest-id fit members of each parent cell (cid =
    * parent·b + rank; a fit-empty parent keeps its own centroid as
    * sole child), `iters` grouped Lloyd passes with the same quantized
    * integer mean sums, then the fit rows' level assignment pℓ; the
    * final f1..f4 chain assigns the FULL corpus. The branch factor is
    * the smallest integer with b⁴ ≥ k (integer search over 1..16 —
    * float `ceil(pow)` could round differently across engines at exact
    * fourth powers); k ≤ 16 degenerates to b1 = k, b = 1, which keeps
    * every cell bit-identical to the flat [[ctes]] (a 1-child level is
    * an identity on cells regardless of centroid values). Depth is
    * structurally pinned at 4 because this string cannot vary its CTE
    * count with the data; the ENGINE's tree supports any depth. */
  def treeCtes(kSql: String, iters: Int, dims: Int,
      fitWhere: String = ""): String = {
    val meanList = (1 to dims).map(i =>
      s"CAST(SUM(CAST(FLOOR(v[$i]*10000000.0 + 0.5) AS BIGINT)) AS DOUBLE)" +
        "/CAST(COUNT(*) AS DOUBLE)/10000000.0")
      .mkString("list_value(", ", ", ")")
    val fit = if (fitWhere.isEmpty) "emb"
              else s"(SELECT * FROM emb WHERE $fitWhere) "
    // level 1: flat fit with b1 centroids (b1 ≤ 16 → cross-join argmin)
    val l1 = (1 to iters).map { it =>
      s"""t1a$it AS MATERIALIZED (${assignSql(fit, s"t1c${it - 1}")}),
         |t1m$it AS MATERIALIZED (SELECT cid, $meanList AS v FROM t1a$it GROUP BY cid),
         |t1c$it AS MATERIALIZED (SELECT o.cid, COALESCE(n.v, o.v) AS v
         |  FROM t1c${it - 1} o LEFT JOIN t1m$it n USING (cid))""".stripMargin
    }.mkString(",\n")
    // levels 2..4: grouped init + keyed Lloyd over the previous level's
    // fit assignment p{ℓ-1}
    val deep = (2 to 4).map { lv =>
      val p = s"p${lv - 1}"; val t = s"t$lv"; val prevC = s"t${lv - 1}c$iters"
      val iter = (1 to iters).map { it =>
        s"""${t}a$it AS MATERIALIZED (${assignChildSql(p, s"${t}c${it - 1}")}),
           |${t}m$it AS MATERIALIZED (SELECT cid, $meanList AS v FROM ${t}a$it GROUP BY cid),
           |${t}c$it AS MATERIALIZED (SELECT o.cid, COALESCE(n.v, o.v) AS v
           |  FROM ${t}c${it - 1} o LEFT JOIN ${t}m$it n USING (cid))""".stripMargin
      }.mkString(",\n")
      s"""${t}c0 AS MATERIALIZED (
         |  SELECT parent * bb.b + rn - 1 AS cid, v FROM (
         |      SELECT cell AS parent, v,
         |        ROW_NUMBER() OVER (PARTITION BY cell ORDER BY vec_id) AS rn
         |      FROM $p) CROSS JOIN bb WHERE rn <= bb.b
         |  UNION ALL
         |  SELECT c.cid * bb.b + 0 AS cid, c.v FROM $prevC c CROSS JOIN bb
         |  WHERE NOT EXISTS (SELECT 1 FROM $p WHERE $p.cell = c.cid)),
         |$iter,
         |p$lv AS MATERIALIZED (SELECT vec_id, v, cid AS cell
         |  FROM (${assignChildSql(p, s"${t}c$iters")}))""".stripMargin
    }.mkString(",\n")
    // full-corpus descent over the fitted levels
    val descent = (2 to 4).map { lv =>
      s"""f$lv AS MATERIALIZED (SELECT vec_id, v, cid AS cell
         |  FROM (${assignChildSql(s"f${lv - 1}", s"t${lv}c$iters")}))""".stripMargin
    }.mkString(",\n")
    s"""emb AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |kk AS MATERIALIZED (SELECT ($kSql) AS k),
       |bb AS MATERIALIZED (SELECT CASE WHEN kk.k <= 16 THEN kk.k
       |      ELSE COALESCE(b4.b, CAST('treeCtes: k exceeds 16^4 = 65536' AS BIGINT)) END AS b1,
       |    CASE WHEN kk.k <= 16 THEN 1
       |      ELSE COALESCE(b4.b, CAST('treeCtes: k exceeds 16^4 = 65536' AS BIGINT)) END AS b
       |  FROM kk CROSS JOIN (SELECT MIN(t.x) AS b
       |    FROM (SELECT CAST(range AS BIGINT) + 1 AS x FROM range(16)) t,
       |      kk WHERE t.x*t.x*t.x*t.x >= kk.k) b4),
       |t1c0 AS MATERIALIZED (SELECT cid, v FROM (
       |    SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v
       |    FROM $fit)
       |  CROSS JOIN bb WHERE cid < bb.b1),
       |$l1,
       |p1 AS MATERIALIZED (SELECT vec_id, v, cid AS cell
       |  FROM (${assignSql(fit, s"t1c$iters")})),
       |$deep,
       |f1 AS MATERIALIZED (SELECT vec_id, v, cid AS cell
       |  FROM (${assignSql("emb", s"t1c$iters")})),
       |$descent,
       |cells AS MATERIALIZED (SELECT vec_id, v, cell FROM f4)""".stripMargin
  }
}
