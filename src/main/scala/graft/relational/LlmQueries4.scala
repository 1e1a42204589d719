package graft.relational

import graft.core.Tables
import graft.llm.{Dedup, Multimodal, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Fourth LLM-pipeline batch: Gopher-style quality-rule filtering,
  * Zipf rank-frequency fit, Benford leading-digit screening, the
  * 2-D skyline (Pareto frontier) operator, and perceptual-hash
  * near-duplicate detection over REAL decoded image bytes.
  */
object LlmQueries4 {
  import QueryDef._

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private val normSql =
    "TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g'))"

  val all: Seq[QueryDef] = Seq(

    // ---- Gopher-style quality-rule battery: per-document lexical
    //      health signals and the aggregate keep verdict. One token
    //      explode feeds every signal (no second pass over text). ----
    sqlChecked("t_gopher",
      s"""WITH toks AS (SELECT doc_id,
         |    unnest(string_split($normSql, ' ')) AS term FROM documents),
         |sig AS (SELECT doc_id, COUNT(*) AS n_words,
         |    ROUND(AVG(LEN(term)), 6) AS mean_wlen,
         |    COUNT(DISTINCT term) AS n_unique,
         |    CAST(SUM(CASE WHEN term IN ('the', 'a', 'and', 'of', 'to',
         |      'in') THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
         |  FROM toks GROUP BY doc_id)
         |SELECT doc_id, n_words, mean_wlen, n_unique, n_stop,
         |  CAST(n_words >= 20 AND n_words <= 100000 AS INT) AS pass_len,
         |  CAST(mean_wlen >= 3 AND mean_wlen <= 10 AS INT) AS pass_wlen,
         |  CAST(n_stop >= 2 AS INT) AS pass_stop,
         |  CAST(n_unique >= 0.2 * n_words AS INT) AS pass_unique,
         |  CAST(n_words >= 20 AND n_words <= 100000
         |    AND mean_wlen >= 3 AND mean_wlen <= 10 AND n_stop >= 2
         |    AND n_unique >= 0.2 * n_words AS INT) AS keep
         |FROM sig ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = t(s, d, "documents").select(col("doc_id"),
        explode(split(Dedup.normalize(col("text")), " ")).as("term"))
      val sig = toks.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_words"),
        round(avg(length(col("term"))), 6).as("mean_wlen"),
        countDistinct(col("term")).as("n_unique"),
        sum(when(col("term").isin("the", "a", "and", "of", "to", "in"), 1L)
          .otherwise(0L)).as("n_stop"))
      val passLen = col("n_words") >= 20 && col("n_words") <= 100000
      val passWlen = col("mean_wlen") >= 3 && col("mean_wlen") <= 10
      val passStop = col("n_stop") >= 2
      val passUniq = col("n_unique") >= lit(0.2) * col("n_words")
      sig.select(col("doc_id"), col("n_words"), col("mean_wlen"),
        col("n_unique"), col("n_stop"),
        passLen.cast("int").as("pass_len"),
        passWlen.cast("int").as("pass_wlen"),
        passStop.cast("int").as("pass_stop"),
        passUniq.cast("int").as("pass_unique"),
        (passLen && passWlen && passStop && passUniq).cast("int").as("keep"))
        .orderBy(col("doc_id"))
    },

    // ---- Zipf rank-frequency fit over the corpus vocabulary: OLS of
    //      ln(freq) on ln(rank) from explicit power sums (identical
    //      algebra on both engines). Vocabulary-sized input after the
    //      token groupBy, so the fit aggregate is a single tiny pass. ----
    sqlChecked("t_zipf",
      s"""WITH toks AS (SELECT
         |    unnest(string_split($normSql, ' ')) AS term FROM documents),
         |tf AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term),
         |rk AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS r
         |       FROM tf),
         |pts AS (SELECT LN(CAST(r AS DOUBLE)) AS lx,
         |               LN(CAST(c AS DOUBLE)) AS ly FROM rk),
         |s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(lx) AS sx,
         |    SUM(ly) AS sy, SUM(lx * lx) AS sxx, SUM(lx * ly) AS sxy,
         |    SUM(ly * ly) AS syy FROM pts)
         |SELECT ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
         |  ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         |    AS intercept,
         |  ROUND(POWER(n * sxy - sx * sy, 2)
         |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2,
         |  CAST(n AS BIGINT) AS n_terms
         |FROM s""".stripMargin) { (s, d) =>
      val tf = t(s, d, "documents")
        .select(explode(split(Dedup.normalize(col("text")), " ")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("c"))
      // vocabulary-sized table: the single-partition rank window is
      // bounded by vocab cardinality, not corpus rows
      val rk = tf.withColumn("r",
        row_number().over(Window.orderBy(col("c").desc, col("term"))))
      val pts = rk.select(log(col("r").cast("double")).as("lx"),
        log(col("c").cast("double")).as("ly"))
      pts.agg(count(lit(1)).cast("double").as("n"), sum(col("lx")).as("sx"),
          sum(col("ly")).as("sy"), sum(col("lx") * col("lx")).as("sxx"),
          sum(col("lx") * col("ly")).as("sxy"),
          sum(col("ly") * col("ly")).as("syy"))
        .select(
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            / (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
          round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy"))
            / (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx"))
            / col("n"), 6).as("intercept"),
          round(pow(col("n") * col("sxy") - col("sx") * col("sy"), 2)
            / ((col("n") * col("sxx") - col("sx") * col("sx"))
              * (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r2"),
          col("n").cast("long").as("n_terms"))
    },

    // ---- Benford leading-digit screen on order totals: observed vs
    //      expected digit shares + per-digit chi-square contribution —
    //      the classic synthetic/fabricated-numbers data-quality probe.
    //      Digit extraction is numeric (no engine-dependent double
    //      formatting). ----
    sqlChecked("a_benford",
      """WITH d AS (SELECT CAST(FLOOR(o_totalprice
        |      / POWER(10, FLOOR(LOG10(o_totalprice)))) AS INT) AS digit
        |    FROM orders WHERE o_totalprice > 0),
        |c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
        |t AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot FROM c)
        |SELECT digit, n, ROUND(n / tot, 6) AS obs_p,
        |  ROUND(LOG10(1 + 1.0 / digit), 6) AS benford_p,
        |  ROUND(POWER(n - tot * LOG10(1 + 1.0 / digit), 2)
        |    / (tot * LOG10(1 + 1.0 / digit)), 6) AS chi2_term
        |FROM c CROSS JOIN t ORDER BY digit""".stripMargin) { (s, d) =>
      val digits = t(s, d, "orders").filter(col("o_totalprice") > 0)
        .select(floor(col("o_totalprice")
          / pow(lit(10.0), floor(log10(col("o_totalprice")))))
          .cast("int").as("digit"))
      val c = digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = c.agg(sum(col("n")).cast("double").as("tot"))
      val benford = log(10.0, lit(1.0) + lit(1.0) / col("digit"))
      c.crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          round(col("n") / col("tot"), 6).as("obs_p"),
          round(benford, 6).as("benford_p"),
          round(pow(col("n") - col("tot") * benford, 2)
            / (col("tot") * benford), 6).as("chi2_term"))
        .orderBy(col("digit"))
    },

    // ---- 2-D skyline (Pareto frontier) of suppliers: minimize mean
    //      unit price, maximize shipped quantity. The oracle states the
    //      quadratic NOT-EXISTS dominance definition; the engine
    //      computes the same set in O(n log n): collapse to per-price
    //      maxima, then one running-max pass over the price-sorted
    //      (supplier-cardinality) frontier table. ----
    sqlChecked("o10_skyline",
      """WITH pts AS (SELECT l_suppkey AS s,
        |    ROUND(AVG(l_extendedprice), 6) AS price,
        |    SUM(l_quantity) AS qty
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT s, price, qty FROM pts p
        |WHERE NOT EXISTS (SELECT 1 FROM pts q
        |  WHERE q.price <= p.price AND q.qty >= p.qty
        |    AND (q.price < p.price OR q.qty > p.qty))
        |ORDER BY s""".stripMargin) { (s, d) =>
      val pts = t(s, d, "lineitem").groupBy(col("l_suppkey").as("s"))
        .agg(round(avg(col("l_extendedprice")), 6).as("price"),
          sum(col("l_quantity")).as("qty"))
      // within one price, only max-qty rows survive (greater qty at
      // equal price dominates); across prices, a point survives iff its
      // qty strictly beats every smaller price's best. The global
      // prefix-max window runs on the per-SUPPLIER aggregate (600×
      // smaller than lineitem; the skyline itself is inherently a
      // total-order scan over that collapsed axis)
      val perPrice = pts.withColumn("pmax",
        max(col("qty")).over(Window.partitionBy(col("price"))))
        .filter(col("qty") === col("pmax"))
      val prevMax = max(col("pmax")).over(
        Window.orderBy(col("price"))
          .rowsBetween(Window.unboundedPreceding, -1))
      perPrice.withColumn("prevmax", prevMax)
        .filter(col("prevmax").isNull || col("qty") > col("prevmax"))
        .select(col("s"), col("price"), col("qty"))
        .orderBy(col("s"))
    },

    // ---- Perceptual-hash near-dup pairs over REAL decoded BMP bytes:
    //      aHash (8x8 nearest-neighbor downsample, mean threshold) per
    //      image, banded Hamming join (8 bands of 8 bits — exact for
    //      radius <= 7), popcount verify. The oracle replays the
    //      synthesis formula's pixels; the engine actually parses the
    //      BMPs it synthesized. ----
    //      The output is the PER-IMAGE rollup (n_near, min_ham), not the
    //      pair list: near-dup degree is linear in the corpus while the
    //      pair list is quadratic whenever duplication is dense (the
    //      synthetic corpus collapses to 40 hash classes — at the 100×
    //      probe its pair list was ~350M rows and filled the scratch
    //      disk). Same rollup-over-pairs contract as d12_containment.
    //      The engine computes it at the distinct-hash level
    //      (perceptualDupStats); the oracle replays naive all-pairs at
    //      verify scale, where they agree exactly. ----
    sqlChecked("mm_phash",
      """WITH img AS (SELECT doc_id AS media_id, 8 + doc_id % 8 AS w,
        |    8 + doc_id % 5 AS h FROM documents WHERE doc_id % 3 = 0),
        |g1 AS (SELECT media_id, w, h, unnest(range(8)) AS gy FROM img),
        |g2 AS (SELECT media_id, w, h, gy, unnest(range(8)) AS gx FROM g1),
        |px AS (SELECT media_id, gy, gx,
        |    CAST((media_id * 31 + 7 * ((gx * w) // 8)
        |      + 13 * ((gy * h) // 8)) % 256 AS DOUBLE) AS v FROM g2),
        |m AS (SELECT media_id, AVG(v) AS mean FROM px GROUP BY media_id),
        |bits AS (SELECT px.media_id, gy AS band,
        |    CAST(SUM(CASE WHEN v > mean THEN 1 << gx ELSE 0 END)
        |      AS BIGINT) AS byte
        |  FROM px JOIN m ON px.media_id = m.media_id
        |  GROUP BY px.media_id, gy),
        |ham AS (SELECT a.media_id AS ida, b.media_id AS idb,
        |    CAST(SUM(bit_count(xor(a.byte, b.byte))) AS BIGINT) AS hamming
        |  FROM bits a JOIN bits b ON a.band = b.band
        |    AND a.media_id <> b.media_id
        |  GROUP BY ida, idb)
        |SELECT ida AS media_id, CAST(COUNT(*) AS BIGINT) AS n_near,
        |  MIN(hamming) AS min_ham
        |FROM ham WHERE hamming <= 2
        |GROUP BY ida ORDER BY media_id""".stripMargin) { (s, d) =>
      val media = Multimodal.synthesize(t(s, d, "documents"),
        col("doc_id"), col("text"), col("source"))
      Multimodal.perceptualDupStats(Multimodal.aHashes(media), maxHamming = 2)
        .orderBy(col("media_id"))
    },

    // ---- DSIR-style importance scoring (Xie et al. 2023, "Data
    //      Selection for Language Models via Importance Resampling"):
    //      score every document by the mean log-likelihood ratio of a
    //      TARGET distribution (here the English slice) vs the raw
    //      corpus over hashed unigram features. Two streaming passes
    //      over the token explode (census, then score); the 128-row
    //      quantized log-ratio table broadcasts back, so per-doc sums
    //      are exact BIGINTs and no token-sized state is persisted. ----
    sqlChecked("t_dsir",
      s"""WITH toks AS (SELECT doc_id, lang = 'en' AS tgt,
         |    unnest(string_split($normSql, ' ')) AS term FROM documents),
         |tb AS (SELECT doc_id, tgt,
         |    ('0x' || substr(md5(term), 1, 15))::BIGINT % 128 AS b
         |  FROM toks),
         |cb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n_all,
         |    CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS n_t
         |  FROM tb GROUP BY b),
         |tot AS (SELECT CAST(SUM(n_all) AS BIGINT) AS na,
         |    CAST(SUM(n_t) AS BIGINT) AS nt FROM cb),
         |lr AS (SELECT b, CAST(FLOOR((LN(CAST(n_t + 1 AS DOUBLE))
         |      - LN(CAST(nt + 128 AS DOUBLE))
         |      - LN(CAST(n_all + 1 AS DOUBLE))
         |      + LN(CAST(na + 128 AS DOUBLE))) * 10000000.0 + 0.5)
         |    AS BIGINT) AS q
         |  FROM cb CROSS JOIN tot)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(SUM(q) AS DOUBLE) / COUNT(*) / 10000000.0 AS dsir_score,
         |  CAST(SUM(q) AS DOUBLE) / COUNT(*) / 10000000.0 > 0 AS keep
         |FROM tb JOIN lr USING (b)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.dsirScores(t(s, d, "documents"), col("doc_id"),
          col("text"), col("lang") === "en", buckets = 128)
        .orderBy(col("doc_id"))
    })
}
