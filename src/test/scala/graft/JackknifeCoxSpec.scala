package graft

import graft.pipeline.SurveyIntegration
import org.apache.spark.sql.functions._

class JackknifeCoxSpec extends SparkSpec {
  import spark.implicits._

  test("jackknifeCox: full-sample beta + positive replicate variance") {
    val rng = new scala.util.Random(9)
    val df = (1 to 300).map { i =>
      val x = rng.nextGaussian()
      val t = -math.log(rng.nextDouble()) / math.exp(0.5 * x)
      val c = rng.nextDouble() * 3.0
      (i.toLong, math.min(t, c), if (t <= c) 1.0 else 0.0, 1.0, x)
    }.toDF("id", "t", "d", "w", "x")
    val (beta, vars) = SurveyIntegration.jackknifeCox(df,
      col("t"), col("d"), col("w"), Seq("x"),
      (col("id") % 8).cast("int"), m = 8)
    assert(math.abs(beta(0) - 0.5) < 0.3, s"beta=${beta(0)}")
    assert(vars(0) > 0 && vars(0) < 0.5, s"jk var=${vars(0)}")
  }
}
