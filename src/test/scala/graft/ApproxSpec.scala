package graft

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Accuracy contract for the approximate scale-path operators declared
  * in a_approx_sketches (the 100-TB replacements for exact
  * percentile/count-distinct, SURVEY.md §7.4.4).
  */
class ApproxSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact") {
    val li = Tables(spark, sf, "lineitem")
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).head()
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("approx percentile within one discrete step of exact") {
    val li = Tables(spark, sf, "lineitem")
    val r = li.agg(
      expr("percentile(l_quantity, 0.5)").as("exact"),
      percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("approx")).head()
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 1.0,
      s"exact=${r.getDouble(0)} approx=${r.getDouble(1)}")
  }

  test("pq codes compress losslessly-enough: top-1 recall vs exact L2") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val books = graft.llm.Similarity.pqFit(emb, col("vec_id"),
      col("embedding"), m = 4, k = 8, iters = 2)
    assert(books.length == 4 && books.forall(_.length == 8)
      && books.forall(_.forall(_.length == 16)))
    val queries = emb.filter(col("vec_id") % 101 === 0)
    val pq = graft.llm.Similarity.pqTopK(emb, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), books, k = 10)
      .filter(col("rn") <= 10)
      .select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // every query's own vector has ADC distance = quantization error,
    // near-minimal: the query itself must appear in its own top-10
    val selfHits = pq.count { case (q, cands) => cands.contains(q) }
    assert(selfHits >= pq.size * 8 / 10,
      s"only $selfHits/${pq.size} queries retrieved themselves in PQ top-10")
  }

  test("a_approx_sketches query shape is stable") {
    // r13 recast: (l_returnflag, acd_exact, p50_exact, acd_ok, p50_ok,
    // cms_ok) — exact-side values plus banded verdicts the oracle
    // asserts TRUE. All three verdicts must genuinely hold here (the
    // CORRECTNESS hash compare relies on it), not just be present.
    val df = SparkEntry.queries("a_approx_sketches")(spark, sf)
    val rows = df.collect()
    assert(rows.length == 3) // one per returnflag
    rows.foreach { r =>
      assert(r.getLong(1) > 0)             // acd_exact
      assert(r.getDouble(2) > 0)           // p50_exact
      assert(r.getBoolean(3), s"acd out of 5% band: $r")
      assert(r.getBoolean(4), s"p50 out of 4% band: $r")
      assert(r.getBoolean(5), s"cms sketch empty: $r")
    }
  }
}
