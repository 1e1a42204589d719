package graft

import org.apache.spark.sql.functions._

/** The sample-free radix quantile machinery (stats/WeightedQuantile +
  * functions SortableBits), exercised on the regions the sf fixtures
  * never reach: negatives (the `Long.MinValue - bits` reflection),
  * the -0.0/+0.0 collision, NaN/±Inf routing, longs beyond 2^53 whose
  * double images collide (the pass-3 original-type tie-break), and a
  * randomized brute-force oracle over mixed-sign doubles.
  */
class QuantileRadixSpec extends SparkSpec {
  import spark.implicits._

  private def sortableBitsOf(xs: Seq[Double]): Seq[Long] =
    xs.toDF("x")
      .select(graft.functions.VectorExpressions.sortableBits(col("x")).as("s"))
      .collect().map(_.getLong(0)).toSeq

  test("SortableBits: strictly monotone over ordered doubles, negatives included") {
    val ordered = Seq(
      Double.NegativeInfinity, -1.7e308, -1.5, -Double.MinPositiveValue,
      0.0, Double.MinPositiveValue, 1.5, 1.7e308,
      Double.PositiveInfinity, Double.NaN)
    val bits = sortableBitsOf(ordered)
    ordered.indices.drop(1).foreach { i =>
      assert(bits(i - 1) < bits(i),
        s"f(${ordered(i - 1)})=${bits(i - 1)} !< f(${ordered(i)})=${bits(i)}")
    }
  }

  test("SortableBits: -0.0 and +0.0 collide at 0; NaN maps above +Inf") {
    val Seq(nz, pz, inf, nan) =
      sortableBitsOf(Seq(-0.0, 0.0, Double.PositiveInfinity, Double.NaN))
    assert(nz == 0L && pz == 0L, s"zeros must collide at 0: $nz vs $pz")
    assert(nan > inf, "NaN must sort above +Inf (Spark NaN-greatest)")
  }

  /** Brute-force left-continuous weighted quantile over the sorted
    * distinct values: min x with cum(w) * den >= W * num. */
  private def bruteForce(rows: Seq[(Double, Long)], num: Long, den: Long): Double = {
    val byX = rows.groupBy(_._1).map { case (x, g) => (x, g.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val w = byX.map(_._2).sum
    var cum = 0L
    byX.collectFirst {
      case (x, wv) if { cum += wv; cum * den >= w * num } => x
    }.get
  }

  test("radix path matches a brute-force oracle on mixed-sign random doubles") {
    val rnd = new scala.util.Random(20260814L)
    // heavy-tailed mixed-sign values with forced duplicates and -0.0
    val pool = Seq.fill(60)(math.exp(rnd.nextGaussian() * 8) *
      (if (rnd.nextBoolean()) -1 else 1)) ++ Seq(-0.0, 0.0, -1.0, 1.0)
    val data = (1 to 400).map { _ =>
      val g = "g" + rnd.nextInt(3)
      (g, pool(rnd.nextInt(pool.length)), 1L + rnd.nextInt(5))
    }
    val ps = Seq((1, 10), (1, 4), (1, 2), (3, 4), (9, 10), (1, 1))
    val got = graft.stats.WeightedQuantile.weightedQuantiles(
        data.toDF("grp", "x", "w"), col("grp"), col("x"), col("w"), ps)
      .collect().map(r => r.getString(0) ->
        ps.indices.map(i => r.getDouble(2 + i))).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val flat = rows.map(r => (r._2, r._3))
      ps.zipWithIndex.foreach { case ((n, d), i) =>
        val want = bruteForce(flat, n, d)
        // -0.0 == 0.0 under ==; bit equality not required (they collide
        // by design), value equality is
        assert(got(g)(i) == want,
          s"group $g q_${n}_$d: got ${got(g)(i)}, want $want")
      }
    }
  }

  test("distinct-domain path agrees with the radix path (and the oracle)") {
    val rnd = new scala.util.Random(42L)
    val data = (1 to 300).map { _ =>
      ("g" + rnd.nextInt(2), (rnd.nextInt(40) - 20).toDouble, 1L + rnd.nextInt(3))
    }
    val ps = Seq((1, 4), (1, 2), (3, 4))
    def collectQ(f: => org.apache.spark.sql.DataFrame) =
      f.collect().map(r => r.getString(0) ->
        (r.getLong(1), ps.indices.map(i => r.getDouble(2 + i)))).toMap
    val df = data.toDF("grp", "x", "w")
    val radix = collectQ(graft.stats.WeightedQuantile.weightedQuantiles(
      df, col("grp"), col("x"), col("w"), ps))
    val dist = collectQ(graft.stats.WeightedQuantile.weightedQuantilesDistinct(
      df, col("grp"), col("x"), col("w"), ps))
    assert(radix == dist, s"paths disagree: $radix vs $dist")
    data.groupBy(_._1).foreach { case (g, rows) =>
      ps.zipWithIndex.foreach { case ((n, d), i) =>
        assert(radix(g)._2(i) == bruteForce(rows.map(r => (r._2, r._3)), n, d))
      }
    }
  }

  test("pass-3 tie-break: distinct longs sharing one double image resolve exactly") {
    // 2^53 and 2^53 + 1 both round to the same double, so they land in
    // the SAME radix bucket at every granularity — only the pass-3
    // cumsum in the original long order can separate them
    val big = 1L << 53
    val df = Seq(("g", big, 1L), ("g", big + 1, 1L), ("g", big + 3, 2L))
      .toDF("grp", "x", "w")
    assert(big.toDouble == (big + 1).toDouble, "fixture must collide")
    val r = graft.stats.WeightedQuantile.weightedQuantiles(
        df, col("grp"), col("x"), col("w"), Seq((1, 4), (1, 2), (1, 1)))
      .collect().head
    // W=4: q_1/4 → first cum ≥ 1 → 2^53 exactly; q_1/2 → cum ≥ 2 →
    // 2^53+1 (the collided neighbor, NOT 2^53); q_1/1 → 2^53+3
    assert(r.getLong(2) == big, s"q_1_4 ${r.getLong(2)}")
    assert(r.getLong(3) == big + 1, s"q_1_2 ${r.getLong(3)}")
    assert(r.getLong(4) == big + 3, s"q_1_1 ${r.getLong(4)}")
  }

  test("±Inf and NaN route to the extreme quantiles in order") {
    val df = Seq(
      ("g", Double.NegativeInfinity, 1L), ("g", 1.0, 1L),
      ("g", Double.PositiveInfinity, 1L), ("g", Double.NaN, 1L))
      .toDF("grp", "x", "w")
    val r = graft.stats.WeightedQuantile.weightedQuantiles(df, col("grp"),
        col("x"), col("w"), Seq((1, 4), (1, 2), (3, 4), (1, 1)))
      .collect().head
    assert(r.getDouble(2) == Double.NegativeInfinity)
    assert(r.getDouble(3) == 1.0)
    assert(r.getDouble(4) == Double.PositiveInfinity)
    assert(r.getDouble(5).isNaN, "max must be NaN (NaN-greatest)")
  }

  test("interpolatedQuantiles matches Spark's exact percentile aggregate") {
    val rnd = new scala.util.Random(99L)
    // duplicates, negatives, and group sizes that hit both integral and
    // fractional interpolation positions
    val data = (1 to 401).map { i =>
      ("g" + i % 3, math.rint(rnd.nextGaussian() * 1000) / 4.0)
    }
    val df = data.toDF("grp", "x")
    val ps = Seq(0.0, 0.1, 0.25, 0.5, 0.9, 1.0)
    val got = graft.stats.WeightedQuantile.interpolatedQuantiles(
        df, col("grp"), col("x"), lit(1L), ps)
      .collect().map(r => r.getString(0) ->
        ps.indices.map(i => r.getDouble(2 + i))).toMap
    val want = df.groupBy(col("grp"))
      .agg(percentile(col("x"), array(ps.map(lit): _*)).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (g, qs) =>
      ps.indices.foreach { i =>
        // last-ulp tolerance: Spark's builtin interpolates with the
        // two-sided (hi−pos)·lo + (pos−lo)·hi form, ours with DuckDB's
        // lo + (hi−lo)·frac — algebraically identical, 1-ulp apart on
        // some inputs (the hash oracle is DuckDB, so ours is the form
        // that must match bit-for-bit downstream)
        val tol = math.max(math.ulp(qs(i)) * 4, 1e-300)
        assert(math.abs(got(g)(i) - qs(i)) <= tol,
          s"group $g p=${ps(i)}: got ${got(g)(i)}, want ${qs(i)}")
      }
    }
  }

  test("interpolatedQuantiles honors frequency weights like percentile") {
    val df = Seq(("g", 1.0, 3L), ("g", 2.0, 1L), ("g", 5.0, 2L))
      .toDF("grp", "x", "w")
    val ps = Seq(0.5, 0.75)
    val got = graft.stats.WeightedQuantile.interpolatedQuantiles(
        df, col("grp"), col("x"), col("w"), ps)
      .collect().head
    val want = df.groupBy(col("grp"))
      .agg(percentile(col("x"), array(ps.map(lit): _*), col("w")).as("q"))
      .collect().head.getSeq[Double](1)
    assert(got.getLong(1) == 6L)
    assert(got.getDouble(2) == want(0) && got.getDouble(3) == want(1),
      s"got (${got.getDouble(2)}, ${got.getDouble(3)}), want $want")
  }

  test("interpolatedQuantiles edge groups: single row, all-equal, two-point") {
    // single row (W=1 -> h=0, upper rank beyond W), all-equal values
    // (lo == hi regardless of frac), and the smallest fractional case
    val df = Seq(
      ("one", 7.25), ("eq", 3.0), ("eq", 3.0), ("eq", 3.0),
      ("two", 1.0), ("two", 2.0)).toDF("grp", "x")
    val ps = Seq(0.0, 0.5, 1.0)
    val got = graft.stats.WeightedQuantile.interpolatedQuantiles(
        df, col("grp"), col("x"), lit(1L), ps)
      .collect().map(r => r.getString(0) ->
        ps.indices.map(i => r.getDouble(2 + i))).toMap
    assert(got("one") == Seq(7.25, 7.25, 7.25))
    assert(got("eq") == Seq(3.0, 3.0, 3.0))
    assert(got("two") == Seq(1.0, 1.5, 2.0))
  }

  test("interpolatedQuantiles: NaN-greatest and negative values interpolate like percentile") {
    val df = Seq(("g", -5.0), ("g", -1.0), ("g", Double.NaN), ("g", 4.0))
      .toDF("grp", "x")
    val ps = Seq(0.25, 0.5, 1.0)
    val got = graft.stats.WeightedQuantile.interpolatedQuantiles(
        df, col("grp"), col("x"), lit(1L), ps).collect().head
    val want = df.groupBy(col("grp"))
      .agg(percentile(col("x"), array(ps.map(lit): _*)).as("q"))
      .collect().head.getSeq[Double](1)
    // p=0.25/0.5 interpolate among the ordered finite values; p=1.0
    // lands ON the NaN (greatest) — both engines agree
    assert(got.getDouble(2) == want(0) && got.getDouble(3) == want(1),
      s"got (${got.getDouble(2)}, ${got.getDouble(3)}), want $want")
    assert(got.getDouble(4).isNaN && want(2).isNaN)
  }

  test("interpolatedQuantiles: randomized weights match a brute-force expansion oracle") {
    // type-7 with frequency weights == type-7 over the weight-expanded
    // multiset; brute-force that expansion directly (sizes stay small)
    val rnd = new scala.util.Random(2026L)
    val data = (1 to 160).map { i =>
      ("g" + i % 4, math.rint(rnd.nextGaussian() * 50) / 8.0,
        1L + rnd.nextInt(5).toLong)
    }
    val ps = Seq(0.1, 0.37, 0.5, 0.93)
    def brute(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      val h = (s.length - 1) * p
      val lo = s(math.floor(h).toInt)
      if (h == math.floor(h)) lo
      else lo + (s(math.floor(h).toInt + 1) - lo) * (h - math.floor(h))
    }
    val want = data.groupBy(_._1).map { case (g, rows) =>
      val expanded = rows.flatMap(r => Seq.fill(r._3.toInt)(r._2))
      g -> ps.map(p => brute(expanded, p))
    }
    val got = graft.stats.WeightedQuantile.interpolatedQuantiles(
        data.toDF("grp", "x", "w"), col("grp"), col("x"), col("w"), ps)
      .collect().map(r => r.getString(0) ->
        ps.indices.map(i => r.getDouble(2 + i))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (g, qs) =>
      ps.indices.foreach { i =>
        assert(got(g)(i) == qs(i),
          s"group $g p=${ps(i)}: got ${got(g)(i)}, want ${qs(i)}")
      }
    }
  }

  test("non-numeric x is rejected at plan-build time") {
    val df = Seq(("g", "10", 1L)).toDF("grp", "x", "w")
    val e = intercept[IllegalArgumentException] {
      graft.stats.WeightedQuantile.weightedQuantiles(df, col("grp"),
        col("x"), col("w"), Seq((1, 2)))
    }
    assert(e.getMessage.contains("numeric"))
  }
}
