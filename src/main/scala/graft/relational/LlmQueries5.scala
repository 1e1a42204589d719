package graft.relational

import graft.core.{Rng, Tables}
import graft.llm.{Dedup, HeavyHitters, Multimodal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Fifth LLM-pipeline batch: exact duplicated-span extraction, LSH
  * quality evaluation against exact Jaccard ground truth, and per-frame
  * audio features over real decoded WAV bytes.
  */
object LlmQueries5 {
  import QueryDef._

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private val normSql =
    "TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g'))"

  val all: Seq[QueryDef] = Seq(

    // ---- exact duplicated-span extraction (Lee et al. 2022 "exact
    //      substring" signal): 6-gram starts repeated across 2–50 docs,
    //      merged into maximal per-doc runs by gaps-and-islands.
    //      Span starts are 0-based token offsets; a run of m
    //      consecutive duplicated gram starts covers m+5 tokens. ----
    sqlChecked("d17_dup_spans",
      s"""WITH ws AS (SELECT doc_id, string_split($normSql, ' ') AS w
         |  FROM documents),
         |g AS (SELECT doc_id, i AS pos,
         |    ('0x' || substr(md5(array_to_string(w[i:i+5], ' ')), 1, 15))::BIGINT AS h
         |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 4)) AS i FROM ws)),
         |hot AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM g)
         |  GROUP BY h HAVING COUNT(*) BETWEEN 2 AND 50),
         |dp AS (SELECT DISTINCT doc_id, pos FROM g JOIN hot USING (h)),
         |isl AS (SELECT doc_id, pos,
         |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM dp)
         |SELECT doc_id, CAST(MIN(pos) - 1 AS BIGINT) AS span_start,
         |  CAST(COUNT(*) + 5 AS BIGINT) AS span_tokens
         |FROM isl GROUP BY doc_id, grp
         |ORDER BY doc_id, span_start""".stripMargin) { (s, d) =>
      Dedup.duplicatedSpans(t(s, d, "documents"), col("doc_id"), col("text"),
          n = 6, minDocs = 2, maxDocs = 50, hasher = Dedup.md5Hash60)
        .select(col("id").as("doc_id"),
          col("span_start").cast("long").as("span_start"),
          col("span_tokens").cast("long").as("span_tokens"))
        .orderBy(col("doc_id"), col("span_start"))
    },

    // ---- LSH quality evaluation: exact-verify every MinHash-LSH
    //      candidate (precision) and measure recall on a fixed-size
    //      64-doc deterministic sample — the harness that tells you
    //      whether the band/threshold settings hold before trusting a
    //      100 TB dedup run with them. Intersections are equi-joins on
    //      the hashed shingle stream (no per-pair arrays); the oracle
    //      replays signatures, bands, candidates AND the exact set
    //      arithmetic. ----
    sqlChecked("d18_lsh_eval", {
      val uSql = Rng.uniformSql("doc_id", 99L)
      val uScore = Rng.uniformSql("id_a * 1000003 + id_b", 77L)
      s"""WITH ${LlmQueries.minhashCtes},
         |hh AS (SELECT DISTINCT doc_id, h FROM h),
         |szs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
         |  FROM hh GROUP BY doc_id),
         |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cand FROM pairs),
         |ps AS (SELECT id_a, id_b FROM pairs
         |  ORDER BY $uScore, id_a, id_b LIMIT 20000),
         |cint AS (SELECT p.id_a, p.id_b, COUNT(*) AS inter FROM ps p
         |  JOIN hh a ON a.doc_id = p.id_a
         |  JOIN hh b ON b.doc_id = p.id_b AND b.h = a.h
         |  GROUP BY p.id_a, p.id_b),
         |cj AS (SELECT p.id_a, p.id_b, COALESCE(ci.inter, 0) AS inter,
         |    sa.sz AS sza, sb.sz AS szb
         |  FROM ps p
         |  LEFT JOIN cint ci ON ci.id_a = p.id_a AND ci.id_b = p.id_b
         |  JOIN szs sa ON sa.doc_id = p.id_a
         |  JOIN szs sb ON sb.doc_id = p.id_b),
         |ctp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cand_scored,
         |    CAST(COALESCE(SUM(CASE WHEN CAST(inter AS DOUBLE)
         |        / (sza + szb - inter) >= 0.30 THEN 1 ELSE 0 END), 0)
         |      AS BIGINT) AS n_tp FROM cj),
         |samp AS (SELECT doc_id FROM (SELECT doc_id, $uSql AS u
         |    FROM (SELECT DISTINCT doc_id FROM hh))
         |  ORDER BY u, doc_id LIMIT 64),
         |sp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM samp a JOIN samp b ON a.doc_id < b.doc_id),
         |sint AS (SELECT p.id_a, p.id_b, COUNT(*) AS inter FROM sp p
         |  JOIN hh a ON a.doc_id = p.id_a
         |  JOIN hh b ON b.doc_id = p.id_b AND b.h = a.h
         |  GROUP BY p.id_a, p.id_b),
         |sj AS (SELECT p.id_a, p.id_b, COALESCE(si.inter, 0) AS inter,
         |    sa.sz AS sza, sb.sz AS szb
         |  FROM sp p
         |  LEFT JOIN sint si ON si.id_a = p.id_a AND si.id_b = p.id_b
         |  JOIN szs sa ON sa.doc_id = p.id_a
         |  JOIN szs sb ON sb.doc_id = p.id_b),
         |struth AS (SELECT id_a, id_b FROM sj
         |  WHERE CAST(inter AS DOUBLE) / (sza + szb - inter) >= 0.30),
         |recs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
         |    CAST(COALESCE(SUM(CASE WHEN p.id_a IS NOT NULL
         |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hit
         |  FROM struth s
         |  LEFT JOIN pairs p ON p.id_a = s.id_a AND p.id_b = s.id_b)
         |SELECT nc.n_cand, ctp.n_cand_scored,
         |  ROUND(CASE WHEN nc.n_cand > 0
         |    THEN CAST(ctp.n_cand_scored AS DOUBLE) / nc.n_cand
         |    ELSE 1.0 END, 6) AS frac_scored,
         |  n_tp,
         |  ROUND(CASE WHEN n_cand_scored > 0
         |    THEN CAST(n_tp AS DOUBLE) / n_cand_scored
         |    ELSE 0.0 END, 6) AS precision,
         |  n_truth, n_hit,
         |  ROUND(CASE WHEN n_truth > 0 THEN CAST(n_hit AS DOUBLE) / n_truth
         |    ELSE 0.0 END, 6) AS recall
         |FROM ctp, recs, nc""".stripMargin
    }) { (s, d) =>
      Dedup.lshEvaluation(t(s, d, "documents"), col("doc_id"), col("text"),
        shingleK = 3, numHashes = 32, bands = 8, threshold = 0.30,
        hasher = Dedup.md5Hash60, sampleSize = 64, sampleSalt = 99L,
        maxScore = 20000, scoreSalt = 77L)
    },

    // ---- per-frame audio features over REAL parsed WAV bytes: RMS
    //      energy + zero-crossing count per 160-sample (20 ms @ 8 kHz)
    //      frame — the classic speech/VAD front end as a corpus
    //      operator. The engine decodes the PCM it synthesized; the
    //      oracle replays the synthesis formula. Sum-of-squares is
    //      exact int64, so RMS doubles agree bit-for-bit. ----
    sqlChecked("mm_audio",
      """WITH aud AS (SELECT doc_id AS media_id,
        |    CAST(256 + doc_id % 128 AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |i AS (SELECT media_id, n, unnest(range(n)) AS i FROM aud),
        |s AS (SELECT media_id, n, i,
        |    (media_id * 131 + i * 17) % 65536 - 32768 AS v FROM i),
        |p AS (SELECT media_id, i, n, CAST(i // 160 AS BIGINT) AS frame, v,
        |    LEAD(v) OVER (PARTITION BY media_id ORDER BY i) AS nxt FROM s),
        |f AS (SELECT media_id, frame, CAST(COUNT(*) AS BIGINT) AS n_samples,
        |    SUM(v * v) AS ss,
        |    CAST(SUM(CASE WHEN nxt IS NOT NULL AND (i + 1) // 160 = frame
        |      AND (v < 0) <> (nxt < 0) THEN 1 ELSE 0 END) AS BIGINT) AS zcr
        |  FROM p GROUP BY media_id, frame)
        |SELECT media_id, frame, n_samples,
        |  ROUND(SQRT(CAST(ss AS DOUBLE) / n_samples), 3) AS rms, zcr
        |FROM f ORDER BY media_id, frame""".stripMargin) { (s, d) =>
      val media = Multimodal.synthesize(t(s, d, "documents"),
        col("doc_id"), col("text"), col("source"))
      Multimodal.audioFrameFeatures(media, frameLen = 160)
        .select(col("media_id"), col("frame").cast("long").as("frame"),
          col("n_samples").cast("long").as("n_samples"),
          // round to 3: both engines sqrt the SAME exact-int64 ratio,
          // but their ROUND algorithms (exact decimal vs double-mul)
          // can split a .5 boundary — at round-6 the boundary zone is
          // wide enough that one sf1 frame in ~3e5 hit it
          round(col("rms"), 3).as("rms"), col("zcr").cast("long").as("zcr"))
        .orderBy(col("media_id"), col("frame"))
    },

    // ---- exact top-20 corpus tokens via the Misra–Gries mergeable
    //      sketch + exact recount: the frequent-items primitive a
    //      100 TB vocabulary sweep needs (bounded per-partition state,
    //      merge-order-safe guarantee, then exact counts of the ≤
    //      capacity candidates only). The oracle is the plain exact
    //      top-k — the sketch must be invisible in the result. ----
    sqlChecked("t_heavy_hitters",
      s"""WITH toks AS (SELECT unnest(string_split($normSql, ' ')) AS term
         |  FROM documents)
         |SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks
         |GROUP BY term ORDER BY cnt DESC, term LIMIT 20""".stripMargin) { (s, d) =>
      HeavyHitters.topK(
        t(s, d, "documents").select(explode(
          split(Dedup.normalize(col("text")), " ")).as("term")),
        col("term"), k = 20, capacity = 512)
    })
}
