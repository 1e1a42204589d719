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

  test("a_approx_sketches query shape is stable") {
    val df = SparkEntry.queries("a_approx_sketches")(spark, sf)
    val rows = df.collect()
    assert(rows.length == 3) // one per returnflag
    rows.foreach { r =>
      assert(r.getLong(1) > 0)     // acd_part
      assert(r.getLong(3) > 0)     // cms_bytes
    }
  }
}
