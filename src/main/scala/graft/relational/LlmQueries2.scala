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
      Dedup.minhashMatchesAgainst(
          corpus = docs.filter(col("doc_id") % 4 =!= 3),
          batch = docs.filter(col("doc_id") % 4 === 3),
          col("doc_id"), col("text"), shingleK = 3, numHashes = 32,
          bands = 8, threshold = 0.30, hasher = Dedup.md5Hash60)
        .select(col("id").as("doc_id"), col("n_matches"),
          round(coalesce(col("best"), lit(0.0)), 6).as("best_est"))
        .orderBy(col("doc_id"))
    }
  )
}
