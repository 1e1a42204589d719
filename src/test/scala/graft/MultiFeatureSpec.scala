package graft

import graft.stats.{CoxPH, CoxPHReplicated}
import graft.variance.Jackknife
import org.apache.spark.sql.functions._

/** p=2 coverage for the Cox machinery — the packed S2/information
  * indexing (j,k pairs) only exercises its off-diagonal logic with ≥2
  * features. Expected values from an independent numpy NR fit.
  */
class MultiFeatureSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1.0, 1.0, 1.0, 0.5, 1.0), (1.0, 1.0, 2.0, -0.2, 0.3),
    (2.0, 1.0, 1.0, 1.0, -0.5), (2.0, 0.0, 1.0, 0.3, 0.8),
    (3.0, 1.0, 1.5, -0.5, 0.2), (4.0, 0.0, 1.0, 0.8, -1.1),
    (5.0, 1.0, 1.0, 1.2, 0.4), (6.0, 0.0, 2.0, -1.0, 0.9),
    (7.0, 1.0, 1.0, 0.1, -0.3), (8.0, 0.0, 1.0, -0.4, 0.6)
  ).toDF("t", "d", "w", "x1", "x2")

  test("M2 two-feature Cox NR matches independent fit (off-diagonal info)") {
    val fit = CoxPH.fit(df, col("t"), col("d"), col("w"), Seq(col("x1"), col("x2")))
    assert(fit.converged)
    assertSeqNear(fit.coefficients.toSeq,
      Seq(0.6107685348210262, 0.1521203636150067), 1e-8)
    val (u, info) = CoxPH.scoreAndInfo(df, col("t"), col("d"), col("w"),
      Seq(col("x1"), col("x2")), fit.coefficients)
    assert(u.map(math.abs).max < 1e-8)
    // packed upper triangle [I00, I01, I11]
    assertSeqNear(info.toSeq,
      Seq(3.892894104889845, -1.351994876258857, 2.633603207294219), 1e-8)
  }

  test("M14 replicated two-feature Cox matches sequential per-replicate fits") {
    val m = 3
    val withId = df.withColumn("id", monotonically_increasing_id())
    val rep = Jackknife.replicated(withId, (col("id") % m).cast("int"), col("w"), m)
    val joint = CoxPHReplicated.fit(rep, col("jk_r"), col("t"), col("d"),
      col("jk_wt"), Seq(col("x1"), col("x2")), m, maxIter = 25)
    (0 until m).foreach { k =>
      val sub = withId.filter(col("id") % m =!= k)
        .withColumn("jw", col("w") * lit(m.toDouble / (m - 1)))
      val seq = CoxPH.fit(sub, col("t"), col("d"), col("jw"),
        Seq(col("x1"), col("x2")), maxIter = 25)
      assertSeqNear(joint.betas(k).toSeq, seq.coefficients.toSeq, 1e-6)
    }
  }

  test("M13 two-feature Cox deviates: weighted deviate sums consistent with score≈0") {
    val fit = CoxPH.fit(df, col("t"), col("d"), col("w"), Seq(col("x1"), col("x2")))
    val dev = graft.variance.CoxInfluence.deviates(df, col("t"), col("d"), col("w"),
      Seq(col("x1"), col("x2")), fit.coefficients, fit.infoPacked)
    // Σ w_i · ∂U/∂w_i = U(β̂) = 0 by Euler homogeneity of the weighted score
    val r = dev.agg(sum(col("__w") * col("ui_0")), sum(col("__w") * col("ui_1"))).head()
    assert(math.abs(r.getDouble(0)) < 1e-8, s"Σ w·ui_0 = ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1)) < 1e-8, s"Σ w·ui_1 = ${r.getDouble(1)}")
  }
}
