package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over an embedding column (Array[Float]).
  *
  * Brute-force cosine top-k is the exact baseline: one scan, no shuffle
  * until the final top-k (TakeOrderedAndProject). The scale path is
  * LSH-style sign-bucketing on fixed hyperplanes: each vector lands in
  * one bucket; queries search only their bucket (and optionally
  * neighbors), turning O(n) per query into O(n/2^planes) at a small
  * recall cost.
  */
object Similarity {

  /** Cosine via the native codegen'd Catalyst expression (a tight
    * primitive loop inside whole-stage codegen; the zip_with/aggregate
    * HOF formulation is CodegenFallback and measured ~3× slower on the
    * candidate-pair hot path). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine(a, b)

  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  /** Exact brute-force top-k most-similar vectors to the given query
    * vector. Plans as scan → project → TakeOrdered(k): linear, no
    * shuffle of the corpus. */
  def bruteForceTopK(df: DataFrame, id: Column, vec: Column,
      query: Array[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(id.as("id"), cosine(vec.cast("array<double>"), q).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** Sign-LSH bucket id from `planes` fixed hyperplanes. Deterministic
    * alternating-sign patterns (plane p flips sign every (p+1) dims) so
    * the same bucketing is expressible in plain SQL for the oracle. */
  def signBucket(vec: Column, planes: Int): Column = {
    val v = vec.cast("array<double>")
    val bits = (0 until planes).map { p =>
      val proj = aggregate(zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
        when(floor(i / lit(p + 1)).cast("long") % 2 === 0, x).otherwise(-x)),
        lit(0.0), _ + _)
      when(proj >= 0, lit(1 << p)).otherwise(0)
    }
    bits.reduce(_ + _)
  }

  /** Bucketed ANN top-k: query vectors search only their own bucket.
    * Exact within-bucket; recall depends on planes (recall/speed knob).
    * `queries` is small (broadcast). */
  def bucketedTopK(corpus: DataFrame, cId: Column, cVec: Column,
      queries: DataFrame, qId: Column, qVec: Column,
      planes: Int, k: Int): DataFrame = {
    val c = corpus.select(cId.as("c_id"), cVec.cast("array<double>").as("c_v"))
      .withColumn("bucket", signBucket(col("c_v"), planes))
    val q = queries.select(qId.as("q_id"), qVec.cast("array<double>").as("q_v"))
      .withColumn("bucket", signBucket(col("q_v"), planes))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    c.join(broadcast(q), Seq("bucket"))
      .withColumn("cos", cosine(col("c_v"), col("q_v")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("cos"), col("rn"))
  }
}
