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

  // ---- floating path ----

  private def dPoints = {
    import spark.implicits._
    Seq(1L -> Some(-37.25), 2L -> Some(-0.5), 3L -> Some(0.0),
      4L -> Some(12.75), 5L -> Some(99.99), 6L -> Some(150.0),
      7L -> Some(Double.NaN), 8L -> Some(Double.PositiveInfinity),
      9L -> Some(Double.NegativeInfinity), 10L -> None)
      .toDF("pid", "p")
  }
  private def dIntervals = {
    import spark.implicits._
    Seq((1L, Some(-40.0), Some(-30.0)), (2L, Some(-1.0), Some(13.0)),
      (3L, Some(0.0), Some(0.0)), (4L, Some(95.5), Some(80.0)) /* degenerate */,
      (5L, Some(90.0), Some(Double.NaN)) /* NaN hi: catches NaN/+Inf points */,
      (6L, Some(Double.NegativeInfinity), Some(-35.0)),
      (7L, None, Some(5.0)), (8L, Some(100.0), None))
      .toDF("iid", "lo", "hi")
  }
  private def dNaive = dPoints.join(dIntervals,
    col("p") >= col("lo") && col("p") <= col("hi"))
    .select(col("pid"), col("iid"))

  test("floating path: exact semantics incl. NaN/±Inf/null routing") {
    val expect = withRule(None) {
      dNaive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet }
    val got = withRule(Some(8L)) {
      dNaive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet }
    assert(expect.nonEmpty, "floating fixture matched nothing")
    // sanity on Spark's NaN ordering: the NaN-hi interval catches the
    // NaN and +Inf points (NaN sorts above everything)
    assert(expect.contains((7L, 5L)) && expect.contains((8L, 5L)),
      s"fixture lost its non-finite matches: $expect")
    assert(got == expect,
      s"floating rewrite changed results: ${got.diff(expect)} / ${expect.diff(got)}")
  }

  test("floating path: the plan is a bucket equi-join, both sides exploded") {
    withRule(Some(8L)) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val df = dNaive
        df.collect()
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin") &&
          !p.contains("CartesianProduct"),
          s"floating range join not rewritten:\n$p")
        assert(p.toLowerCase.contains("generate"),
          s"no bucket explode in floating plan:\n$p")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("decimal (≤15-digit) points ride the floating path exactly") {
    import spark.implicits._
    // decimal(10,2) values are exact in a double, so the floor(x/W)
    // bucketing is value-faithful; >15-digit decimals must NOT rewrite
    val dp = (-20L to 20L).map(p => (p, BigDecimal(p * 25) + BigDecimal("0.25")))
      .toDF("pid", "praw")
      .select(col("pid"), col("praw").cast("decimal(10,2)").as("p"))
    val di = Seq((1L, "-300.00", "-100.50"), (2L, "-0.25", "120.75"),
        (3L, "400.00", "300.00") /* degenerate */, (4L, "499.25", "500.25"))
      .toDF("iid", "lo0", "hi0")
      .select(col("iid"), col("lo0").cast("decimal(10,2)").as("lo"),
        col("hi0").cast("decimal(10,2)").as("hi"))
    def run = dp.join(di, col("p") >= col("lo") && col("p") <= col("hi"))
      .select(col("pid"), col("iid"))
    val expect = withRule(None) { run.collect().map(r => (r.getLong(0), r.getLong(1))).toSet }
    val got = withRule(Some(64L)) {
      val df = run
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("__graft_bucket"), s"decimal rewrite did not fire:\n$p")
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(expect.nonEmpty && got == expect,
      s"decimal rewrite changed results: ${got.diff(expect)} / ${expect.diff(got)}")
    // wide decimals (precision > 15) are not double-exact: stay out
    withRule(Some(64L)) {
      val wide = dp.select(col("pid"), col("p").cast("decimal(30,10)").as("p"))
        .join(di.select(col("iid"), col("lo").cast("decimal(30,10)").as("lo"),
          col("hi").cast("decimal(30,10)").as("hi")),
          col("p") >= col("lo") && col("p") <= col("hi"))
      wide.collect()
      assert(!wide.queryExecution.executedPlan.toString.contains("__graft_bucket"),
        "rule fired on a 30-digit decimal")
    }
  }

  // ---- semi / anti / outer shapes ----

  private def shaped(tpe: String) = points.join(intervals,
    col("p") >= col("lo") && col("p") <= col("hi"), tpe)

  test("left_semi/left_anti/left_outer (points left) keep exact semantics and fire") {
    for (tpe <- Seq("left_semi", "left_anti", "left_outer")) {
      val pick: org.apache.spark.sql.Row => (Long, Any) = r =>
        (r.getLong(0), if (tpe == "left_outer") r.get(2) else null)
      val expect = withRule(None) { shaped(tpe).collect().map(pick).toSeq.sorted(
        Ordering.by((t: (Long, Any)) => (t._1, String.valueOf(t._2)))) }
      val got = withRule(Some(7L)) { shaped(tpe).collect().map(pick).toSeq.sorted(
        Ordering.by((t: (Long, Any)) => (t._1, String.valueOf(t._2)))) }
      assert(got == expect, s"$tpe rewrite changed results")
    }
    withRule(Some(7L)) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val df = shaped("left_semi")
        df.collect()
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin") &&
          p.toLowerCase.contains("generate"),
          s"semi range join not rewritten:\n$p")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("shape guards: points-on-right outer and floating semi stay unrewritten") {
    withRule(Some(7L)) {
      // LeftOuter with the POINTS on the right would need the interval
      // (preserved) side exploded — must not fire
      val wrongSide = intervals.join(points,
        col("p") >= col("lo") && col("p") <= col("hi"), "left_outer")
      wrongSide.collect()
      assert(!wrongSide.queryExecution.executedPlan.toString
        .toLowerCase.contains("generate"),
        "rule exploded the preserved side of a left_outer")
      // floating semi: the 2x point fan-out would break EXISTS counts
      val fsemi = dPoints.join(dIntervals,
        col("p") >= col("lo") && col("p") <= col("hi"), "left_semi")
      fsemi.collect()
      assert(!fsemi.queryExecution.executedPlan.toString
        .toLowerCase.contains("generate"),
        "rule fired on a floating-point semi join")
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
