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
    * exact recount of candidates only. Requires the k-th item's true
    * frequency to exceed N/(capacity+1) — size `capacity` accordingly
    * (the spec exercises the guarantee at the boundary). */
  def topK(df: DataFrame, item: org.apache.spark.sql.Column,
      k: Int, capacity: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(item.cast("string").as("term"))
    val candidates = toks.select(xxhash64(col("term")).as("h")).as[Long]
      .select(new MisraGries(capacity).toColumn.name("cand"))
      .head()
    toks.filter(xxhash64(col("term")).isin(candidates.toSeq: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(k)
  }
}
