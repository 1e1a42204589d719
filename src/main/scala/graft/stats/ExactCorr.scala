package graft.stats

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Exact distributed Pearson correlation matrix from integer power
  * sums — the cross-engine-deterministic twin of `corr()` (whose
  * streaming co-moment update is float-order-dependent, so a
  * distributed partial aggregate and a single-node replay drift).
  *
  * Inputs are pre-scaled to exact BIGINTs by the caller (e.g. a 2-dp
  * price → decimal(18,2) → ×100); all moments Σx, Σx², Σxy accumulate
  * as decimal(38,0) (exact up to 38 digits, map-side combinable), and
  * the correlation numerator/denominators n·Σxy − Σx·Σy are formed in
  * exact decimal BEFORE the single cast to double — the
  * catastrophic-cancellation step happens in integer arithmetic.
  *
  * 100 TB shape: ONE hash-aggregate pass producing k + k + k(k−1)/2
  * scalar sums, then a driver-sized unpivot. Nothing else touches the
  * fact table.
  */
object ExactCorr {

  /** Pairwise Pearson correlations of the given integer-valued
    * columns. Returns (var_a, var_b, corr) for every a < b pair in
    * input order. */
  def pearsonMatrix(df: DataFrame, vars: Seq[(String, Column)]): DataFrame = {
    val dec = "decimal(38,0)"
    val sums =
      Seq(count(lit(1)).cast(dec).as("n")) ++
        vars.map { case (nm, c) => sum(c.cast(dec)).as(s"s_$nm") } ++
        vars.map { case (nm, c) => sum((c * c).cast(dec)).as(s"ss_$nm") } ++
        vars.combinations(2).map { case Seq((na, ca), (nb, cb)) =>
          sum((ca * cb).cast(dec)).as(s"sp_${na}_$nb")
        }.toSeq
    val m = df.agg(sums.head, sums.tail: _*)
    val pairRows = vars.combinations(2).map { case Seq((na, _), (nb, _)) =>
      val num = (col("n") * col(s"sp_${na}_$nb") -
        col(s"s_$na") * col(s"s_$nb")).cast("double")
      val da = (col("n") * col(s"ss_$na") -
        col(s"s_$na") * col(s"s_$na")).cast("double")
      val db = (col("n") * col(s"ss_$nb") -
        col(s"s_$nb") * col(s"s_$nb")).cast("double")
      struct(lit(na).as("var_a"), lit(nb).as("var_b"),
        (num / (sqrt(da) * sqrt(db))).as("corr"))
    }.toSeq
    m.select(explode(array(pairRows: _*)).as("p"))
      .select(col("p.var_a"), col("p.var_b"), col("p.corr"))
  }
}
