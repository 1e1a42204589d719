package graft.stats

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/** Principal component extraction via the classic two-phase shape used
  * throughout the engine's model fitters: ONE distributed pass reduces
  * the data to a p×p sample-covariance matrix (p tiny and fixed by the
  * caller — the collect is p(p+1)/2 doubles, not data-sized), then a
  * driver-side power iteration extracts the dominant eigenpair. The
  * iteration is a pure function of the covariance entries, so a DuckDB
  * oracle replaying the same fixed-iteration recursion from the same
  * covariance aggregates reproduces it to rounding.
  */
object Pca {

  /** Dominant eigenpair of the sample covariance of `xs`.
    *
    * @param iters fixed power-iteration count (contractive — by the
    *              documented iteration budget both engines agree far
    *              below the output rounding)
    * @return single-row DataFrame: eigval, v1..vp (sign-normalized so
    *         the first component is non-negative)
    */
  def topComponent(df: DataFrame, xs: Seq[Column], iters: Int): DataFrame = {
    val p = xs.size
    val named = df.select(xs.zipWithIndex.map {
      case (c, i) => c.cast("double").as(s"x$i")
    }: _*)
    // p×p covariance in one pass; covar_samp is symmetric so only the
    // upper triangle is aggregated
    val aggs = for { i <- 0 until p; j <- i until p }
      yield covar_samp(col(s"x$i"), col(s"x$j")).as(s"c${i}_$j")
    val row: Row = named.agg(aggs.head, aggs.tail: _*).head()
    val a = Array.ofDim[Double](p, p)
    var k = 0
    for { i <- 0 until p; j <- i until p } {
      a(i)(j) = row.getDouble(k); a(j)(i) = row.getDouble(k); k += 1
    }

    var v = Array.fill(p)(1.0 / math.sqrt(p.toDouble))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(p)(i =>
        (0 until p).map(j => a(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
    }
    val av = Array.tabulate(p)(i => (0 until p).map(j => a(i)(j) * v(j)).sum)
    val eig = (0 until p).map(i => v(i) * av(i)).sum
    val sgn = if (v(0) < 0) -1.0 else 1.0
    val spark = df.sparkSession
    import spark.implicits._
    Seq((eig, v.map(_ * sgn).toSeq))
      .toDF("eigval", "v")
      .select(col("eigval") +:
        (0 until p).map(i => col("v")(i).as(s"v${i + 1}")): _*)
  }
}
