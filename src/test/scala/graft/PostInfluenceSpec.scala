package graft

import graft.stats.CoxPH
import graft.variance.CoxInfluence
import org.apache.spark.sql.functions._

/** Post-stratified Cox score influence vs the reference's literal
  * `beta_pw.cox(post=...)` loop (taylor_deviate.R:670-742), replicated
  * independently in numpy (2 cells, β=0.35, Nh=(8,9)).
  */
class PostInfluenceSpec extends SparkSpec {
  import spark.implicits._

  test("M13 post-stratified deviates match the reference loop exactly") {
    val df = Seq(
      (1.0, 1.0, 1.0, 0.5, 0), (1.0, 1.0, 2.0, -0.2, 1),
      (2.0, 1.0, 1.0, 1.0, 0), (2.0, 0.0, 1.0, 0.3, 1),
      (3.0, 1.0, 1.5, -0.5, 0), (4.0, 0.0, 1.0, 0.8, 1),
      (5.0, 1.0, 1.0, 1.2, 0), (6.0, 0.0, 2.0, -1.0, 1),
      (7.0, 1.0, 1.0, 0.1, 0), (8.0, 0.0, 1.0, -0.4, 1)
    ).toDF("t", "d", "pw", "x", "cell")
    val pop = Seq((0, 8.0), (1, 9.0)).toDF("cell", "N_h")
    val beta = 0.35
    // info at the post-stratified weights (f·pw)
    val hat = df.groupBy("cell").agg(sum("pw").as("nh_hat"))
    val withF = df.join(pop, Seq("cell")).join(hat, Seq("cell"))
      .withColumn("w", col("pw") * col("N_h") / col("nh_hat"))
    val (_, info) = CoxPH.scoreAndInfo(withF, col("t"), col("d"), col("w"),
      Seq(col("x")), Array(beta))

    val dev = CoxInfluence.deviatesPostStratified(df,
      col("t"), col("d"), col("pw"), col("cell"), pop,
      Seq(col("x")), Array(beta), info)
    val got = dev.orderBy(col("__t"), col("__x0"))
      .select(col("ui_post_0")).collect().map(_.getDouble(0)).toSeq
    // fixture order after sort by (t, x): t=1 → x=-0.2 then 0.5
    val want = Seq(-0.5357912729808842, 0.2515878550846826, -0.145671563210282,
      0.506339608959762, -0.4653166873823688, -0.6909326778063222,
      -0.2015069644240258, 0.6857547470030123, 0.1415545314531341,
      0.5366772929723482)
    assertSeqNear(got, want, 1e-9)
  }
}
