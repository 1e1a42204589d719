package graft

import graft.sampling.{Population, Pps}
import org.apache.spark.sql.functions._

class TwoStageSpec extends SparkSpec {

  test("M15 two-stage cluster PPS: sizes, weights, reproducibility") {
    val pop = Population.generate(spark, 10000)
      .withColumn("psu", (col("id") % 50).cast("int"))
      .withColumn("msize", exp(col("x1") / 10.0))
      .persist()
    val s1 = Pps.drawTwoStage(pop, col("id"), col("psu"), col("msize"),
      nPsu = 10, nPerPsu = 20, salt = 3L).persist()

    assert(s1.count() == 200, "10 PSUs × 20 units")
    assert(s1.select(countDistinct(col("id") % 50)).head().getLong(0) == 10)
    val wts = s1.agg(min("wt"), sum("wt")).head()
    assert(wts.getDouble(0) > 0.0)
    // HT estimate of N in a sane band (cluster designs are noisier)
    assert(wts.getDouble(1) > 2000 && wts.getDouble(1) < 50000,
      s"N̂=${wts.getDouble(1)}")

    // deterministic: same salt ⇒ identical draw
    val s2 = Pps.drawTwoStage(pop, col("id"), col("psu"), col("msize"),
      nPsu = 10, nPerPsu = 20, salt = 3L)
    assert(s1.select("id").except(s2.select("id")).count() == 0)
    // different salt ⇒ different draw
    val s3 = Pps.drawTwoStage(pop, col("id"), col("psu"), col("msize"),
      nPsu = 10, nPerPsu = 20, salt = 4L)
    assert(s1.select("id").except(s3.select("id")).count() > 0)
    pop.unpersist(blocking = false)
  }
}
