package graft.llm

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoder}

/** Exact top-k frequent items at stream scale via a Misra–Gries
  * (SpaceSaving-family) mergeable sketch + exact recount.
  *
  * Stage 1 runs [[MisraGries]] as a partial+final object-hash
  * aggregate: each partition keeps at most `capacity` counters, merges
  * are the Agarwal et al. mergeable-summaries rule (sum, then subtract
  * the (capacity+1)-th largest count), and the driver receives only
  * ≤ capacity candidate hashes. The MG guarantee — any item with true
  * frequency > N/(capacity+1) survives every partitioning and merge
  * order — makes the candidate set a superset of the true top-k
  * whenever the k-th item clears that threshold.
  *
  * Stage 2 recounts ONLY the candidates exactly (broadcast `InSet`
  * filter + hash agg), so the final (term, cnt) top-k is exact and
  * deterministic even though the sketch itself is merge-order
  * dependent. Total cost: two streaming passes, no token-sized state.
  */
object HeavyHitters {

  /** Misra–Gries frequent-items sketch over hashed items. */
  class MisraGries(capacity: Int)
      extends Aggregator[Long, Map[Long, Long], Array[Long]] {

    override def zero: Map[Long, Long] = Map.empty

    override def reduce(m: Map[Long, Long], h: Long): Map[Long, Long] =
      m.get(h) match {
        case Some(c) => m.updated(h, c + 1)
        case None if m.size < capacity => m.updated(h, 1L)
        case None =>
          // decrement-all, drop zeros: the classic MG eviction step
          m.flatMap { case (k, v) =>
            if (v > 1) Some(k -> (v - 1)) else None }
      }

    override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
      val combined = b.foldLeft(a) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v)
      }
      if (combined.size <= capacity) combined
      else {
        // subtract the (capacity+1)-th largest count, drop <= 0
        val t = combined.valuesIterator.toArray.sortBy(-_).apply(capacity)
        combined.flatMap { case (k, v) =>
          if (v > t) Some(k -> (v - t)) else None }
      }
    }

    override def finish(m: Map[Long, Long]): Array[Long] =
      m.keysIterator.toArray.sorted

    override def bufferEncoder: Encoder[Map[Long, Long]] =
      ExpressionEncoder[Map[Long, Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Exact top-k items of `item` by count: MG candidate sweep, then an
    * exact recount of candidates only. The MG guarantee makes the
    * result exact whenever the k-th item's true frequency exceeds
    * N/(capacity+1) — and instead of trusting the doc comment, the
    * guarantee is VERIFIED at runtime against the recounted k-th
    * count; if an undersized capacity fails the check, the method
    * falls back to the plain exact groupBy top-k (one extra pass, a
    * loud log line, never a silently wrong "exact" answer). */
  def topK(df: DataFrame, item: org.apache.spark.sql.Column,
      k: Int, capacity: Int): DataFrame = {
    val spark = df.sparkSession
    val toks = df.select(item.cast("string").as("term"))
    def exactTopK(input: DataFrame): DataFrame = input
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(k)
    // one scan yields BOTH the candidate set and the total N the
    // guarantee check needs (the Aggregator re-registered untyped)
    val mg = udaf(new MisraGries(capacity),
      org.apache.spark.sql.Encoders.scalaLong)
    val head = toks
      .agg(mg(xxhash64(col("term"))).as("cand"), count(lit(1)).as("n"))
      .head()
    val candidates = head.getAs[scala.collection.Seq[Long]](0).toSeq
    val n = head.getLong(1)
    val rows = exactTopK(
        toks.filter(xxhash64(col("term")).isin(candidates: _*)))
      .collect()
    // sufficient condition for exactness: every item OUTSIDE the
    // candidate set has true frequency ≤ N/(capacity+1) (MG), so if
    // the k-th recounted count strictly exceeds that threshold no
    // missed item can displace (or tie into) the returned top-k
    val guaranteed = n == 0L ||
      (rows.length == k && rows.last.getLong(1) * (capacity + 1L) > n)
    if (guaranteed) {
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("term",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("cnt",
            org.apache.spark.sql.types.LongType, nullable = false))))
    } else {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"MG capacity $capacity cannot certify exact top-$k " +
          s"(k-th count ${rows.lastOption.map(_.getLong(1))} vs " +
          s"threshold N/(capacity+1) = ${n / (capacity + 1.0)}); " +
          "falling back to the exact full groupBy")
      exactTopK(toks)
    }
  }
}
