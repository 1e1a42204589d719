package graft.weights

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighting-class nonresponse adjustment — the classic survey-weights
  * step upstream of the reference's calibration family (post-strat /
  * GREG / raking adjust to EXTERNAL totals; nonresponse adjustment
  * redistributes the SAMPLE's own weight mass from nonrespondents to
  * respondents within adjustment classes):
  *
  *   adj_i = wt_i · Σ_{j ∈ class(i)} wt_j / Σ_{j ∈ class(i), resp} wt_j
  *
  * for respondents; nonrespondents leave the sample. Within every class
  * that has at least one respondent, Σ adj over respondents equals the
  * class's full initial mass (conservation); a class with NO respondents
  * contributes nothing and is surfaced to the caller via the factor
  * frame rather than silently inflating a neighbor.
  *
  * Distributed shape: one hash aggregate over classes (conditional sums
  * — respondent mass via sum(when)), the class-count factor table is
  * dimension-sized and broadcast-joins back. O(n) + one broadcast; the
  * same shape as [[PostStratify]].
  */
object Nonresponse {

  /** @param df         sample rows
    * @param cls        adjustment-class column
    * @param weight     base design weight
    * @param respondent boolean response indicator
    * @return respondent rows only, all original columns + `adj_wt` */
  def adjust(df: DataFrame, cls: Column, weight: Column,
      respondent: Column): DataFrame = {
    val keyed = df.withColumn("__nr_cls", cls.cast("string"))
      .withColumn("__nr_wt", weight.cast("double"))
      .withColumn("__nr_resp", respondent)
    val factors = keyed.groupBy(col("__nr_cls"))
      .agg(
        sum(col("__nr_wt")).as("tot"),
        sum(when(col("__nr_resp"), col("__nr_wt")).otherwise(0.0)).as("resp"))
      .filter(col("resp") > 0.0)
      .select(col("__nr_cls"), (col("tot") / col("resp")).as("__nr_f"))
    keyed.filter(col("__nr_resp"))
      .join(broadcast(factors), Seq("__nr_cls"))
      .withColumn("adj_wt", col("__nr_wt") * col("__nr_f"))
      .drop("__nr_cls", "__nr_wt", "__nr_resp", "__nr_f")
  }
}
