package graft.sampling

import graft.core.Windows
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Systematic (every k-th) sampling — the list-sampling design that
  * rounds out the engine's PPS / stratified / Poisson-bootstrap family:
  * sort the frame by the listing variable, take rows at positions
  * start, start+k, start+2k, … and give each a design weight of k
  * (1-in-k inclusion). With a listing variable correlated to the study
  * variable this is implicit stratification — the classic reason
  * surveys systematic-sample ordered frames.
  *
  * Distributed shape: the global position is a cumulative COUNT over
  * the sort order, which runs through `Windows.scan`'s two-phase
  * distributed prefix sum — never a single-partition window. The sort
  * order must be total (pass a unique tiebreak column last) or the
  * draw is not well-defined; that contract is the caller's, exactly as
  * in the reference's `order(...)` idiom (taylor_deviate.R:614).
  */
object Systematic {

  /** @param start 0-based offset of the first selected row, in [0, k)
    * @return selected rows + `sys_wt` (= k) */
  def draw(df: DataFrame, orderCols: Seq[Column], k: Int,
      start: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(start >= 0 && start < k, s"start must be in [0, $k), got $start")
    val ranked = Windows.scan(df, orderCols, Seq((lit(1.0), "__sys_rn")))
    ranked
      .filter(((col("__sys_rn") - 1).cast("long") % k) === start)
      .drop("__sys_rn")
      .withColumn("sys_wt", lit(k.toDouble))
  }
}
