package graft.relational

import graft.core.{Rng, Tables}
import graft.llm.{Dedup, Mixing}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Second LLM-pipeline batch: corpus-mixing (temperature source
  * weights, per-source weighted reservoir draws), concat-and-chunk
  * sequence packing, and incremental (new-batch-vs-corpus) MinHash
  * dedup — the corpus-assembly steps downstream of filtering/dedup in
  * a training-data pipeline.
  */
object LlmQueries2 {
  import QueryDef._

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val all: Seq[QueryDef] = Seq(

    // ---- temperature-based source mixing: p_i ∝ n_i^0.7 over the 20
    //      sources, plus effective epochs at a 1M-token budget. One
    //      grouped sum over the corpus; normalization on the
    //      dimension-sized group frame. ----
    sqlChecked("mix_temperature",
      """WITH g AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n_tokens
        |           FROM documents GROUP BY source),
        |s AS (SELECT source, n_tokens,
        |        POW(CAST(n_tokens AS DOUBLE), 0.7) AS sc FROM g)
        |SELECT source, n_tokens,
        |  ROUND(sc / SUM(sc) OVER (), 10) AS p_mix,
        |  ROUND(sc / SUM(sc) OVER () * 1000000.0 / n_tokens, 8) AS epochs
        |FROM s ORDER BY source""".stripMargin) { (s, d) =>
      Mixing.temperatureWeights(t(s, d, "documents"),
          col("source"), col("n_chars"), alpha = 0.7, budget = 1e6)
        .select(col("grp").as("source"), col("n_tokens"),
          round(col("p_mix"), 10).as("p_mix"),
          round(col("epochs"), 8).as("epochs"))
        .orderBy(col("source"))
    },

    // ---- per-source weighted reservoir draw (Efraimidis–Spirakis
    //      keys on the cross-engine RNG): 10 docs per source, longer
    //      docs proportionally likelier. The oracle replays the
    //      identical key arithmetic, so the drawn sets must agree
    //      exactly. ----
    sqlChecked("mix_reservoir",
      s"""WITH keyed AS (SELECT doc_id, source, n_chars,
         |  -LN(${Rng.uniformSql("doc_id", 11L)}) / CAST(n_chars AS DOUBLE) AS k
         |  FROM documents),
         |r AS (SELECT doc_id, source, n_chars,
         |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY k, doc_id) AS rk
         |  FROM keyed)
         |SELECT doc_id, source, n_chars FROM r WHERE rk <= 10
         |ORDER BY source, doc_id""".stripMargin) { (s, d) =>
      Mixing.reservoirPerGroup(
          t(s, d, "documents").select(col("doc_id"), col("source"), col("n_chars")),
          col("source"), col("doc_id"), col("n_chars"), k = 10, salt = 11L)
        .orderBy(col("source"), col("doc_id"))
    },

    // ---- concat-and-chunk sequence packing: documents laid end-to-end
    //      in doc_id order, cut into 16384-char chunks; each doc
    //      reports its chunk span. The prefix sum is the two-phase
    //      distributed scan — no single-partition window. ----
    sqlChecked("d10_pack",
      """WITH c AS (SELECT doc_id, n_chars,
        |  CAST(SUM(n_chars) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_end
        |  FROM documents)
        |SELECT doc_id, n_chars,
        |  CAST(FLOOR((cum_end - n_chars) / 16384.0) AS BIGINT) AS chunk_first,
        |  CAST(FLOOR((cum_end - 1) / 16384.0) AS BIGINT) AS chunk_last,
        |  CAST(FLOOR((cum_end - 1) / 16384.0)
        |    - FLOOR((cum_end - n_chars) / 16384.0) + 1 AS BIGINT) AS n_chunks
        |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      Mixing.packChunks(t(s, d, "documents"),
          col("doc_id"), col("n_chars"), capacity = 16384L)
        .select(col("id").as("doc_id"), col("n_tok").as("n_chars"),
          col("chunk_first"), col("chunk_last"), col("n_chunks"))
        .orderBy(col("doc_id"))
    },

    // ---- directional containment screen: blocked pairs where the
    //      SMALLER side is ≥90% contained in the other — the
    //      subset-duplicate signal symmetric Jaccard misses. Engine
    //      side uses one-sided prefix filtering + exact verify; the
    //      oracle brute-forces the blocked pairs and must agree. ----
    sqlChecked("d12_containment",
      s"""WITH base AS (
         |  SELECT doc_id, lang || '|' || CAST(n_chars // 100 AS VARCHAR) AS blk,
         |    list_distinct(string_split(
         |      TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g')), ' ')) AS sh
         |  FROM documents),
         |j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS i,
         |    len(a.sh) AS n_a, len(b.sh) AS n_b
         |  FROM base a JOIN base b ON a.blk = b.blk AND a.doc_id < b.doc_id),
         |sym AS (SELECT id_a AS id, CAST(i AS DOUBLE) / n_a AS c FROM j
         |  UNION ALL SELECT id_b, CAST(i AS DOUBLE) / n_b FROM j)
         |SELECT id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_containers,
         |  ROUND(MAX(c), 8) AS best
         |FROM sym WHERE c >= 0.9 GROUP BY id ORDER BY doc_id""".stripMargin) { (s, d) =>
      // doc_id is the table key and blk is computed per row, so every
      // id has exactly one block: assert the precondition and take the
      // narrow-key / no-collapse path
      val pairs = Dedup.ngramContainment(t(s, d, "documents"), col("doc_id"),
        col("text"),
        concat_ws("|", col("lang"), floor(col("n_chars") / 100).cast("string")),
        k = 1, threshold = 0.9, uniqueBlockPerId = true)
      // per-doc rollup: how often (and how fully) each doc is contained
      // in a same-block partner — the actionable dedup signal, and the
      // compact output (pairs stay an engine-internal stream).
      // SINGLE traversal: each pair explodes to its two directed (id, c)
      // rows. The previous self-union planned the verify-join subtree
      // twice (column pruning makes the two branches' exchanges differ,
      // so ReuseExchange never fires) — the whole candidate+verify
      // pipeline ran twice per run at every scale.
      pairs.select(explode(array(
          struct(col("id_a").as("id"), col("c_ab").as("c")),
          struct(col("id_b").as("id"), col("c_ba").as("c")))).as("e"))
        .select(col("e.id").as("id"), col("e.c").as("c"))
        .filter(col("c") >= 0.9)
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_containers"), round(max(col("c")), 8).as("best"))
        .select(col("id").as("doc_id"), col("n_containers"), col("best"))
        .orderBy(col("doc_id"))
    },

    // ---- product-quantization ANN (Jégou et al. PQ/ADC): 4 subspace
    //      codebooks from pinned-Lloyd k-means, corpus encoded to 4
    //      code ids (the compressed representation — full vectors
    //      never enter the scoring join), queries rank by the sum of
    //      per-subspace lookup distances. The oracle replays all four
    //      sub-k-means, the encoding, and the ADC sum. ----
    sqlChecked("sim_pq", {
      val M = 4; val SUB = 16; val K = 8; val ITERS = 2; val TOPK = 5
      def meanList(dims: Int) = (1 to dims).map(i =>
        s"CAST(SUM(CAST(FLOOR(v[$i]*10000000.0 + 0.5) AS BIGINT)) AS DOUBLE)" +
          "/CAST(COUNT(*) AS DOUBLE)/10000000.0")
        .mkString("list_value(", ", ", ")")
      def assignSql(src: String, cent: String, rnName: String) =
        s"""SELECT e.vec_id, e.v, c.cid,
           |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
           |        list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c.v)
           |          + list_dot_product(c.v, c.v), c.cid) AS $rnName
           |    FROM $src e CROSS JOIN $cent c""".stripMargin
      val subCtes = (0 until M).map { j =>
        val off = j * SUB
        val iters = (1 to ITERS).map { it =>
          s"""a${j}_$it AS (SELECT * FROM
             |  (${assignSql(s"emb$j", s"c${j}_${it - 1}", "rn")}) WHERE rn = 1),
             |m${j}_$it AS (SELECT cid, ${meanList(SUB)} AS v FROM a${j}_$it
             |  GROUP BY cid),
             |c${j}_$it AS (SELECT o.cid, COALESCE(n.v, o.v) AS v
             |  FROM c${j}_${it - 1} o LEFT JOIN m${j}_$it n USING (cid))""".stripMargin
        }.mkString(",\n")
        s"""emb$j AS (SELECT vec_id, v[${off + 1}:${off + SUB}] AS v FROM emb),
           |c${j}_0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v
           |  FROM emb$j ORDER BY vec_id LIMIT $K),
           |$iters,
           |cells$j AS (SELECT vec_id, cid
           |  FROM (${assignSql(s"emb$j", s"c${j}_$ITERS", "rn")}) WHERE rn = 1),
           |d$j AS (SELECT q.vec_id AS q_id, s.vec_id AS c_id,
           |    list_dot_product(q.v[${off + 1}:${off + SUB}],
           |                     q.v[${off + 1}:${off + SUB}])
           |      - 2*list_dot_product(q.v[${off + 1}:${off + SUB}], c.v)
           |      + list_dot_product(c.v, c.v) AS d
           |  FROM qset q CROSS JOIN cells$j s
           |  JOIN c${j}_$ITERS c ON c.cid = s.cid)""".stripMargin
      }.mkString(",\n")
      val dSum = (0 until M).map(j => s"d$j.d").mkString(" + ")
      val dJoins = (1 until M)
        .map(j => s"JOIN d$j USING (q_id, c_id)").mkString(" ")
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |qset AS (SELECT vec_id, v FROM emb
         |  WHERE vec_id % 101 = 0 AND vec_id < 51712),
         |$subCtes,
         |total AS (SELECT d0.q_id, d0.c_id, $dSum AS adist FROM d0 $dJoins),
         |ranked AS (SELECT q_id, c_id, adist,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY adist, c_id) AS rn FROM total)
         |SELECT q_id, c_id, ROUND(adist, 8) AS adist, rn
         |FROM ranked WHERE rn <= $TOPK ORDER BY q_id, rn""".stripMargin
    }) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val books = graft.llm.Similarity.pqFit(emb, col("vec_id"),
        col("embedding"), m = 4, k = 8, iters = 2)
      // fixed 512-probe query panel (512·101 = 51712) — ADC scores the
      // FULL corpus per query, so a corpus-growing panel is quadratic;
      // a bounded batch keeps it O(|corpus|). No-op at ≤ sf1.
      graft.llm.Similarity.pqTopK(emb, col("vec_id"), col("embedding"),
          emb.filter(col("vec_id") % 101 === 0 && col("vec_id") < 51712),
          col("vec_id"), col("embedding"),
          books, k = 5)
        .select(col("q_id"), col("c_id"), round(col("adist"), 8).as("adist"),
          col("rn"))
        .orderBy(col("q_id"), col("rn"))
    },

    // ---- incremental dedup: screen the "new crawl" quarter of the
    //      corpus (doc_id % 4 = 3) against the existing three quarters
    //      via the MinHash band join — batch×corpus candidates only,
    //      the re-cluster-nothing shape of incremental ingestion. The
    //      oracle filters the all-pairs CTE to cross-set pairs, which
    //      is the same set by construction. ----
    sqlChecked("d11_incremental",
      s"""WITH ${LlmQueries.minhashCtes},
         |sym AS (SELECT id_a AS b_id, id_b AS c_id, jaccard_est FROM pairs
         |  UNION ALL SELECT id_b, id_a, jaccard_est FROM pairs),
         |m AS (SELECT b_id, COUNT(*) AS n_matches, MAX(jaccard_est) AS best
         |  FROM sym WHERE b_id % 4 = 3 AND c_id % 4 <> 3 GROUP BY b_id)
         |SELECT d.doc_id, CAST(COALESCE(m.n_matches, 0) AS BIGINT) AS n_matches,
         |  ROUND(COALESCE(m.best, 0.0), 6) AS best_est
         |FROM documents d LEFT JOIN m ON m.b_id = d.doc_id
         |WHERE d.doc_id % 4 = 3 ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      // one shared signature pass; both sides are filtered slices of it
      val sig = Dedup.minhashSignatures(docs, col("doc_id"), col("text"),
        shingleK = 3, numHashes = 32, hasher = Dedup.md5Hash60).persist()
      Dedup.minhashMatchesFromSigs(
          cSig = sig.filter(col("id") % 4 =!= 3),
          bSig = sig.filter(col("id") % 4 === 3),
          numHashes = 32, bands = 8, threshold = 0.30)
        .select(col("id").as("doc_id"), col("n_matches"),
          round(coalesce(col("best"), lit(0.0)), 6).as("best_est"))
        .orderBy(col("doc_id"))
    },

    // ---- d14: the STREAMING incremental screen, batch-replayed. The
    //      same new-docs slice as d11 arrives as a parquet file stream
    //      in 2 micro-batches (maxFilesPerTrigger=1); each batch is
    //      MinHash-screened against the static corpus signatures via
    //      foreachBatch and appended to a parquet sink. Because every
    //      new doc is screened only against the static side, the union
    //      of per-batch verdicts is micro-batching-invariant and equals
    //      the one-shot d11 screen — which is exactly what the shared
    //      oracle asserts. (Two batches keep the multi-batch semantics
    //      under test while halving fixed per-trigger overhead; the
    //      full split-invariance sweep lives in StreamingSpec.) ----
    sqlChecked("d14_stream_screen",
      s"""WITH ${LlmQueries.minhashCtes},
         |sym AS (SELECT id_a AS b_id, id_b AS c_id, jaccard_est FROM pairs
         |  UNION ALL SELECT id_b, id_a, jaccard_est FROM pairs),
         |m AS (SELECT b_id, COUNT(*) AS n_matches, MAX(jaccard_est) AS best
         |  FROM sym WHERE b_id % 4 = 3 AND c_id % 4 <> 3 GROUP BY b_id)
         |SELECT d.doc_id, CAST(COALESCE(m.n_matches, 0) AS BIGINT) AS n_matches,
         |  ROUND(COALESCE(m.best, 0.0), 6) AS best_est
         |FROM documents d LEFT JOIN m ON m.b_id = d.doc_id
         |WHERE d.doc_id % 4 = 3 ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val cSig = Dedup.minhashSignatures(
        docs.filter(col("doc_id") % 4 =!= 3), col("doc_id"), col("text"),
        shingleK = 3, numHashes = 32, hasher = Dedup.md5Hash60).persist()
      val tmp = java.nio.file.Files.createTempDirectory("graft-d14")
      val inDir = tmp.resolve("in").toString
      val outDir = tmp.resolve("out").toString
      docs.filter(col("doc_id") % 4 === 3)
        .repartition(2).write.mode("overwrite").parquet(inDir)
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      val q = graft.streaming.IncrementalDedup.start(
        stream, col("doc_id"), col("text"), cSig,
        shingleK = 3, numHashes = 32, bands = 8, threshold = 0.30,
        hasher = Dedup.md5Hash60,
        sink = v => v.write.mode("append").parquet(outDir))
      q.awaitTermination()
      cSig.unpersist(blocking = false)
      s.read.parquet(outDir)
        .select(col("id").as("doc_id"), col("n_matches"),
          round(coalesce(col("best"), lit(0.0)), 6).as("best_est"))
        .orderBy(col("doc_id"))
    }
  )
}
