package graft

import graft.stats.{CoxPH, CoxPHReplicated}
import graft.variance.{CoxInfluence, Jackknife, JointVariance}
import org.apache.spark.sql.functions._

class ReplicatedSpec extends SparkSpec {
  import spark.implicits._

  private def survival = {
    val rng = new scala.util.Random(42)
    (1 to 200).map { i =>
      val x = rng.nextGaussian()
      val t = -math.log(rng.nextDouble()) / math.exp(0.4 * x)
      val c = rng.nextDouble() * 3.0
      (i.toLong, math.min(t, c), if (t <= c) 1.0 else 0.0, 1.0 + i % 3, x)
    }.toDF("id", "t", "d", "w", "x")
  }

  test("vectorized replicate Cox matches sequential per-replicate fits") {
    val m = 5
    val df = survival
    val rep = Jackknife.replicated(df, (col("id") % m).cast("int"), col("w"), m)
    val joint = CoxPHReplicated.fit(rep, col("jk_r"), col("t"), col("d"),
      col("jk_wt"), Seq(col("x")), m)
    assert(joint.maxScoreResidual < 1e-6)

    (0 until m).foreach { k =>
      val sub = df.filter(col("id") % m =!= k)
        .withColumn("jw", col("w") * lit(m.toDouble / (m - 1)))
      val seq = CoxPH.fit(sub, col("t"), col("d"), col("jw"), Seq(col("x")))
      assertNear(joint.betas(k)(0), seq.coefficients(0), 1e-6)
    }
  }

  test("jackknife variance from replicated Cox betas is positive, sane") {
    val m = 8
    val df = survival
    val rep = Jackknife.replicated(df, (col("id") % m).cast("int"), col("w"), m)
    val joint = CoxPHReplicated.fit(rep, col("jk_r"), col("t"), col("d"),
      col("jk_wt"), Seq(col("x")), m)
    val est = joint.betas.toSeq.map { case (r, b) => (r, b(0)) }.toDF("r", "beta")
    val v = Jackknife.variance(est, col("beta"), m).head().getDouble(0)
    assert(v > 0 && v < 1.0, s"jk var $v")
  }

  test("joint (beta,gamma) correction: zero gamma-deviates → direct deviates") {
    val df = survival
    val fit = CoxPH.fit(df, col("t"), col("d"), col("w"), Seq(col("x")))
    val dev = CoxInfluence.deviates(df, col("t"), col("d"), col("w"),
      Seq(col("x")), fit.coefficients, fit.infoPacked)
    val corrected = JointVariance.ipswCorrectedDeviates(dev, p = 1,
      psWeight = col("__w"), psFeatures = Seq(col("__x0")),
      gammaDevs = Seq(lit(0.0)), infoPacked = fit.infoPacked)
    val r = corrected.agg(
      sum(abs(col("dbeta_tot_0") - col("dbeta_0")))).head().getDouble(0)
    assertNear(r, 0.0, 1e-12)
    val v = JointVariance.ppsVariance(corrected, p = 1)
    assert(v(0) > 0.0)
  }
}
