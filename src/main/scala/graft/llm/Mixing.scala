package graft.llm

import graft.core.{Rng, Windows}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus-mixing operators for training-data assembly: temperature
  * reweighting of source proportions, weighted per-group reservoir
  * sampling, and concat-and-chunk sequence packing.
  *
  * These extend the reference's survey-weighting toolkit (SURVEY.md
  * §2.11) to the corpus-assembly side of a 100 TB pipeline: deciding
  * how much of each source to train on, drawing the per-source sample,
  * and laying the chosen documents into fixed-length training chunks.
  */
object Mixing {

  /** Temperature-based source mixing: p_i ∝ n_i^alpha, the standard
    * multilingual / multi-source rebalancing rule (alpha < 1 upsamples
    * small sources). Returns one row per group with the natural token
    * count, mixed sampling probability, and effective epochs over the
    * source at a given token budget.
    *
    * Scale shape: one grouped sum over the corpus (partial+final hash
    * aggregate); the normalization runs on the dimension-sized group
    * frame, so the global window never sees fact rows.
    */
  def temperatureWeights(df: DataFrame, group: Column, size: Column,
      alpha: Double, budget: Double): DataFrame = {
    val g = df.groupBy(group.as("grp")).agg(sum(size).as("n_tokens"))
    val all = Window.partitionBy()
    g.withColumn("__s", pow(col("n_tokens").cast("double"), lit(alpha)))
      .withColumn("p_mix", col("__s") / sum(col("__s")).over(all))
      .withColumn("epochs", col("p_mix") * lit(budget) / col("n_tokens").cast("double"))
      .drop("__s")
  }

  /** Weighted reservoir sample of k rows per group — Efraimidis–
    * Spirakis A-ES keys (keep the k smallest -ln(u)/w), deterministic
    * via the cross-engine [[Rng]] stream so a SQL oracle replays the
    * identical draw. Ties broken by idKey for full determinism.
    *
    * Scale shape: one window rank per group partition — no global
    * sort. Groups are assumed numerous-or-large (sources, languages);
    * a single skewed group sorts within its own partition only.
    */
  def reservoirPerGroup(df: DataFrame, group: Column, idKey: Column,
      weight: Column, k: Int, salt: Long = 0L): DataFrame = {
    val key = -log(Rng.uniform(idKey, salt)) / weight.cast("double")
    val w = Window.partitionBy(group).orderBy(key.asc, idKey.asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Concat-and-chunk sequence packing: documents are laid end-to-end
    * in deterministic `id` order and cut into fixed-`capacity` training
    * chunks (the standard LLM pretraining tokenizer-output layout).
    * Returns (id, n_tok, cum_end, chunk_first, chunk_last, n_chunks) —
    * the chunk span each document occupies, including boundary docs
    * that straddle chunks.
    *
    * The prefix sum is the two-phase distributed scan
    * ([[Windows.cumSum]]) — per-partition partials + broadcast offsets,
    * never a global single-partition window, so the layout assignment
    * streams at corpus scale.
    */
  def packChunks(df: DataFrame, id: Column, tokens: Column,
      capacity: Long): DataFrame = {
    val cum = Windows.cumSum(
      df.select(id.as("id"), tokens.cast("long").as("n_tok")),
      col("id"), col("n_tok"), "cum_end")
    val cap = lit(capacity.toDouble)
    val first = floor((col("cum_end") - col("n_tok")) / cap).cast("long")
    val last = when(col("n_tok") > 0,
      floor((col("cum_end") - 1) / cap).cast("long")).otherwise(first)
    cum.withColumn("chunk_first", first)
      .withColumn("chunk_last", greatest(last, first))
      .withColumn("n_chunks", col("chunk_last") - col("chunk_first") + 1L)
  }
}
