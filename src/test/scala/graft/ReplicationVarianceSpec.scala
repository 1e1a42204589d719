package graft

import org.apache.spark.sql.Row

/** Behavioral invariants for the replication-variance batch
  * (StatQueries4): Woodruff CI brackets, Rao–Wu bootstrap, BRR/Fay.
  * Exact values are hash-pinned by the DuckDB oracles; these tests pin
  * the statistical invariants the hashes can't express.
  */
class ReplicationVarianceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String): Row =
    SparkEntry.queries(name)(spark, sf).collect().head

  test("m46_woodruff: CI brackets the median, positive SE") {
    val r = run("m46_woodruff")
    val (med, se, lo, hi) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3))
    assert(se > 0.0 && se < 0.5, s"se_p out of range: $se")
    assert(lo <= med && med <= hi, s"CI [$lo, $hi] does not bracket $med")
    assert(hi > lo, "degenerate CI")
  }

  test("m47_rao_wu: bootstrap SE positive and near the SRS-scale SE") {
    val r = run("m47_rao_wu")
    val theta = r.getDouble(0)
    val se = r.getDouble(1)
    assert(r.getLong(2) == 16L)
    assert(se > 0.0, "bootstrap SE must be positive")
    // weighted mean of acctbal (uniform on [-999, 10000]) — SE of the
    // mean at n≈150 is ~3176/√150 ≈ 260; the bootstrap estimate should
    // land within a factor ~3 of it (stratification + 16 reps noise)
    assert(se > 50 && se < 900, s"bootstrap SE implausible: $se")
    assert(theta > 2000 && theta < 7000, s"theta implausible: $theta")
  }

  test("m49_caliper_match: every match is within caliper, nearest, deterministic") {
    val rows = SparkEntry.queries("m49_caliper_match")(spark, sf).collect()
    assert(rows.nonEmpty)
    val matched = rows.filter(!_.isNullAt(2))
    assert(matched.nonEmpty, "no treated unit found a control in caliper")
    matched.foreach { r =>
      val (tSq, cSq, dist) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(dist == math.abs(tSq - cSq), s"dist inconsistent: $r")
      assert(dist <= 20000L, s"match outside caliper: $r")
    }
    // with replacement: a control may serve several treated units, and
    // treated ids are unique in the output
    val tIds = rows.map(_.getLong(0))
    assert(tIds.distinct.length == tIds.length, "duplicate treated rows")
  }

  test("m50_bounded_calib: factors bounded in [0.5, 2], totals calibrated") {
    val r = SparkEntry.queries("m50_bounded_calib")(spark, sf).collect().head
    val (sumW, tgtN) = (r.getDouble(2), r.getDouble(3))
    val (sumWx, tgtX) = (r.getDouble(4), r.getDouble(5))
    val (fMin, fMax) = (r.getDouble(6), r.getDouble(7))
    assert(fMin >= 0.5 - 1e-9 && fMax <= 2.0 + 1e-9,
      s"calibration factor escaped bounds: [$fMin, $fMax]")
    assert(math.abs(sumW - tgtN) / tgtN < 1e-4,
      s"count total not calibrated: $sumW vs $tgtN")
    assert(math.abs(sumWx - tgtX) / math.abs(tgtX) < 1e-3,
      s"x total not calibrated: $sumWx vs $tgtX")
  }

  test("m48_brr_fay: BRR SE positive, theta matches full-sample mean") {
    val r = run("m48_brr_fay")
    val theta = r.getDouble(0)
    val se = r.getDouble(1)
    assert(r.getLong(2) == 8L)
    assert(se > 0.0, "BRR SE must be positive")
    assert(se > 50 && se < 900, s"BRR SE implausible: $se")
    // the two replication estimators target the same θ̂
    val rw = run("m47_rao_wu")
    assertNear(theta, rw.getDouble(0), 1e-9)
  }
}
