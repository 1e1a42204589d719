package graft

import graft.llm.HeavyHitters
import org.apache.spark.sql.functions._

/** Misra–Gries sketch + exact-recount top-k: the sketch must actually
  * evict (vocabulary ≫ capacity) and the final answer must still be
  * the exact top-k, under any partitioning.
  */
class HeavyHittersSpec extends SparkSpec {

  // 2000-item vocabulary, Zipf-ish: item i appears ~ceil(4000/(i+1))
  // times. Capacity 64 forces heavy eviction (N ≈ 4000·H(2000) ≈ 31k,
  // threshold N/65 ≈ 480 — items 0..7 clear it; top-5 asked).
  private def skewed = {
    import spark.implicits._
    (0 until 2000).flatMap(i => Seq.fill(4000 / (i + 1))(s"tok_$i"))
      .toDF("term")
  }

  test("topK equals the exact groupBy top-k despite eviction") {
    val exact = skewed.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = HeavyHitters.topK(skewed, col("term"), k = 5, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exact, s"got $got want $exact")
  }

  test("topK is partitioning-invariant (merge-order safety)") {
    val a = HeavyHitters.topK(skewed.repartition(17), col("term"), 5, 64)
      .collect().map(_.getString(0)).toSeq
    val b = HeavyHitters.topK(skewed.repartition(3), col("term"), 5, 64)
      .collect().map(_.getString(0)).toSeq
    assert(a == b, s"partitioning changed the answer: $a vs $b")
  }

  test("MG guarantee: every item above N/(cap+1) survives as a candidate") {
    import spark.implicits._
    val mg = new HeavyHitters.MisraGries(64)
    val ds = skewed.select(xxhash64(col("term")).as("h")).as[Long]
    val cands = ds.select(mg.toColumn.name("c")).head().toSet
    val n = skewed.count()
    val must = skewed.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > n / 65)
      .select(xxhash64(col("term"))).collect().map(_.getLong(0))
    assert(must.nonEmpty && must.forall(cands.contains),
      s"guaranteed item missing from ${cands.size} candidates")
  }
}
