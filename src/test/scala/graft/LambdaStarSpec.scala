package graft

import graft.hazard.GailHazard
import org.apache.spark.sql.functions._

/** `lambda_star.pop` parity (taylor_deviate.R:1200-1242): tie-summed
  * event weights, full risk sets, and the interval-binned variant with
  * risk-at-last-event-in-interval semantics. Expected values replicated
  * independently. */
class LambdaStarSpec extends SparkSpec {
  import spark.implicits._

  private def pop = Seq(
    (1.0, 1.0, 1.0), (1.0, 1.0, 2.0), (2.0, 1.0, 1.0), (2.0, 0.0, 1.0),
    (3.0, 1.0, 1.5), (4.0, 0.0, 1.0), (5.0, 1.0, 1.0), (6.0, 0.0, 2.0),
    (7.0, 1.0, 1.0), (8.0, 0.0, 1.0)
  ).toDF("t", "d", "w")

  test("ungridded: per-event-time hazard with tie-summed numerators") {
    val got = GailHazard.lambdaStarPop(pop, col("t"), col("d"), col("w"))
      .orderBy("t").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val want = Seq(
      (1.0, 0.24, 3.0, 12.5), (2.0, 1.0 / 9.5, 1.0, 9.5),
      (3.0, 0.2, 1.5, 7.5), (5.0, 0.2, 1.0, 5.0), (7.0, 0.5, 1.0, 2.0))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, e) =>
      assertNear(g._1, e._1); assertNear(g._2, e._2, 1e-12)
      assertNear(g._3, e._3); assertNear(g._4, e._4)
    }
  }

  test("gridded: interval event sums over risk-at-last-event") {
    val got = GailHazard.lambdaStarPop(pop, col("t"), col("d"), col("w"),
        tStarGrid = Seq(2.0, 5.0))
      .orderBy("t").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val want = Seq(
      (2.0, 4.0 / 9.5, 4.0, 9.5), (5.0, 0.5, 2.5, 5.0), (7.0, 0.5, 1.0, 2.0))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, e) =>
      assertNear(g._1, e._1); assertNear(g._2, e._2, 1e-12)
      assertNear(g._3, e._3); assertNear(g._4, e._4)
    }
  }
}
