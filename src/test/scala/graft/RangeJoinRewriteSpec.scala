package graft

import graft.functions.GraftFunctions
import graft.plans.RangeJoinRewrite
import org.apache.spark.sql.functions._

/** The Catalyst range-join rewrite: a naive `p BETWEEN lo AND hi` inner
  * join must (a) keep exact semantics under the rule, including
  * negatives and degenerate intervals, (b) plan as a hash/shuffle
  * equi-join instead of a nested loop when the width conf is set, and
  * (c) stay untouched without the conf or when an equi-key exists.
  */
class RangeJoinRewriteSpec extends SparkSpec {

  private def withRule[A](width: Option[Long])(body: => A): A = {
    GraftFunctions.install(spark)
    width match {
      case Some(w) => spark.conf.set(RangeJoinRewrite.WidthConf, w.toString)
      case None => spark.conf.unset(RangeJoinRewrite.WidthConf)
    }
    try body finally spark.conf.unset(RangeJoinRewrite.WidthConf)
  }

  private def points = {
    import spark.implicits._
    (-50L to 50L).map(p => (p, p * 3)).toDF("pid", "p")
  }
  private def intervals = {
    import spark.implicits._
    Seq((1L, -120L, -80L), (2L, -10L, 25L), (3L, 0L, 0L),
      (4L, 90L, 150L), (5L, 40L, 30L) /* degenerate lo>hi */)
      .toDF("iid", "lo", "hi")
  }

  private def naive = points.join(intervals,
    col("p") >= col("lo") && col("p") <= col("hi"))
    .select(col("pid"), col("iid"))

  test("rewrite preserves exact semantics (negatives, degenerates, boundaries)") {
    val expect = withRule(None) { naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet }
    val got = withRule(Some(7L)) { naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet }
    assert(expect.nonEmpty, "test fixture matched nothing")
    assert(got == expect, s"rewrite changed results: ${got.diff(expect)} / ${expect.diff(got)}")
  }

  test("with the width conf the plan is an equi-join over exploded buckets") {
    withRule(Some(16L)) {
      // disable broadcast so the no-equi fallback would be visible as
      // a join with no keys rather than a harmless broadcast NLJ
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val df = naive
        df.collect()
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin") &&
          !p.contains("CartesianProduct"),
          s"range join not rewritten:\n$p")
        assert(p.toLowerCase.contains("generate") && p.contains("sequence"),
          s"no bucket explode in plan:\n$p")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("no conf, or an existing equi-key: the rule stays out of the way") {
    withRule(None) {
      val p = { val df = naive; df.collect(); df.queryExecution.executedPlan.toString }
      assert(!p.contains(RangeJoinRewrite.WidthConf) && !p.contains("Sequence("),
        s"rule fired without conf:\n$p")
    }
    withRule(Some(16L)) {
      val eq = points.join(intervals,
        col("pid") === col("iid") && col("p") >= col("lo") && col("p") <= col("hi"))
      eq.collect()
      val p = eq.queryExecution.executedPlan.toString
      assert(!p.toLowerCase.contains("explode"),
        s"rule fired on an equi-keyed join:\n$p")
    }
  }

  test("rewrite agrees with the manual core/RangeJoin operator") {
    val manual = graft.core.RangeJoin.pointInInterval(
        points, col("pid"), col("p"),
        intervals, col("iid"), col("lo"), col("hi"), bucketWidth = 7.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = withRule(Some(7L)) {
      naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet }
    assert(auto == manual)
  }
}
