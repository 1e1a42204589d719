package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus-fit n-gram language-model scoring — the perplexity-style
  * quality filter of CCNet/Gopher-class pipelines (score each document
  * by the mean log-probability its own corpus assigns to it; outliers
  * on the low side are boilerplate/garbage, outliers on the high side
  * are templated repetition).
  *
  * Model: add-one-smoothed bigram LM fit on the SAME corpus being
  * scored. P(b|a) = (c(a,b) + 1) / (c(a·) + V) with c(a,b) the corpus
  * bigram occurrence count, c(a·) the count of bigrams starting with
  * `a`, and V the corpus vocabulary size (distinct token types).
  *
  * Cross-engine determinism: each bigram's log-term
  * ln(c(a,b)+1) − ln(c(a·)+V) is a scalar function of exact integers
  * (both engines produce the identical double), and the per-document
  * MEAN runs over FLOOR(term·1e7 + 0.5) BIGINTs — an integer sum is
  * order-independent, so a distributed partial aggregate and a
  * single-node replay agree bit-for-bit (the same quantized-mean
  * discipline as Similarity's k-means centroids).
  *
  * 100 TB shape: one token pass builds the (persisted) bigram stream;
  * counts are hash aggregates on n-gram keys; the score join is
  * aggregate-then-join (the count tables, not the corpus, are the
  * build sides), so hot prefixes ("the …") cost one skewed-key join
  * that AQE splits — nothing is ever driver-sized except V.
  */
object LanguageModel {

  /** Per-document mean bigram log-probability under the corpus-fit
    * add-one model. Returns (id, n_bigrams, avg_logp), one row per
    * document with ≥ 1 bigram (≥ 2 tokens). */
  def bigramLmScores(df: DataFrame, id: Column, text: Column): DataFrame = {
    val words = df.select(id.as("id"),
      posexplode(split(Dedup.normalize(text), " ")).as(Seq("pos", "w")))
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    // the bigram stream feeds three consumers (c2, c1, the score join)
    val bi = words.withColumn("nx", lead(col("w"), 1).over(byDoc))
      .filter(col("nx").isNotNull)
      .select(col("id"), col("w").as("a"),
        concat_ws(" ", col("w"), col("nx")).as("bg"))
      .persist()
    val c2 = bi.groupBy(col("bg")).agg(count(lit(1)).as("n2"))
    val c1 = bi.groupBy(col("a")).agg(count(lit(1)).as("n1"))
    val vocab = words.select(countDistinct(col("w")).cast("double").as("v"))
    val term = log(col("n2").cast("double") + lit(1.0)) -
      log(col("n1").cast("double") + col("v"))
    bi.join(c2, Seq("bg"))
      .join(c1, Seq("a"))
      .crossJoin(broadcast(vocab))
      .select(col("id"),
        floor(term * lit(1e7) + lit(0.5)).cast("long").as("q"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("q")).cast("double") / count(lit(1)).cast("double") /
          lit(1e7)).as("avg_logp"))
  }
}
