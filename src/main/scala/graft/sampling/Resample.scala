package graft.sampling

import graft.core.Rng
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Replicate-weight and sampling helpers beyond the reference's
  * jackknife: Poisson bootstrap, stratified fixed-size draws, and
  * deterministic dataset splits — all driven by the cross-engine RNG
  * (`core.Rng`), so every one of them is DuckDB-oracle-checkable and
  * bit-reproducible across runs and engines.
  */
object Resample {

  /** Poisson(1) CDF thresholds (17 significant digits — both engines
    * parse the identical IEEE double). */
  val poissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712)

  /** Stride for mixing (unit, replicate) into one RNG key. Reducing the
    * unit mod P first bounds the product at (P−1)·stride ≈ 2.1e18 < 2⁶³
    * (exact, no ANSI overflow), and r < stride keeps the map injective
    * for any replicate count a bootstrap would ever use. */
  val replicateStride = 1000000007L

  /** The mixed key as DuckDB SQL — oracle queries must use exactly this
    * expression so both engines draw the same uniform stream. */
  def mixedKeySql(unitExpr: String, repExpr: String): String =
    s"((($unitExpr) % ${Rng.P}) * $replicateStride + ($repExpr))"

  /** Poisson(1) bootstrap multiplier for one (unit, replicate) pair via
    * inverse CDF over the deterministic uniform stream. The replicate is
    * mixed injectively (see [[replicateStride]]) so no (unit, replicate)
    * pair shares a draw with any other. */
  def poissonMultiplier(unitKey: Column, replicate: Column): Column = {
    val u = Rng.uniform((unitKey.cast("long") % Rng.P) * replicateStride
      + replicate.cast("long"))
    poissonCdf.zipWithIndex.foldRight(lit(7.0): Column) {
      case ((t, k), e) => when(u < t, k.toDouble).otherwise(e)
    }
  }

  /** Explode `b` bootstrap replicates: returns df + (boot_r,
    * boot_wt = weight · m_ir). One shuffle-free explode — the
    * with-replacement sibling of `Jackknife.replicated`. */
  def bootstrapReplicates(df: DataFrame, unitKey: Column, weight: Column,
      b: Int): DataFrame =
    df.withColumn("boot_r", explode(sequence(lit(0L), lit(b - 1L))))
      .withColumn("boot_wt",
        weight.cast("double") * poissonMultiplier(unitKey, col("boot_r")))

  /** Deterministic per-stratum fixed-size sample (distributed SRSWOR):
    * rank the RNG stream within each stratum, keep the first `n`.
    *
    * Two-phase top-n: stratum cardinality is typically TINY (return
    * flags, segments), so a bare `Window.partitionBy(stratum)` sorts a
    * data-sized slice in one task per stratum — the grouped-window
    * funnel (the growth tool fit e ≈ 2.1 on m20 at the 100× probe).
    * Instead each (stratum, salt-bucket) keeps a local top-n — 64
    * balanced sort tasks per stratum over n/64-sized slices — and only
    * the ≤ 64·n survivors per stratum enter the stratum-level rank.
    * Any stratum top-n is contained in the union of its buckets'
    * top-ns, and (u, unitKey) is a total order, so the kept set is
    * IDENTICAL to the single-window form at any bucket count. */
  def stratifiedFixed(df: DataFrame, stratum: Column, unitKey: Column,
      n: Int, salt: Long = 0L, buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = df.withColumn("__u", Rng.uniform(unitKey, salt))
      .withColumn("__b", pmod(xxhash64(unitKey), lit(buckets)))
    val wLocal = Window.partitionBy(stratum, col("__b"))
      .orderBy(col("__u"), unitKey)
    val wStratum = Window.partitionBy(stratum).orderBy(col("__u"), unitKey)
    keyed.withColumn("__rk", row_number().over(wLocal))
      .filter(col("__rk") <= n)
      .withColumn("__rk", row_number().over(wStratum))
      .filter(col("__rk") <= n)
      .drop("__rk", "__u", "__b")
  }

  /** Cumulative split thresholds, computed ONCE here so an oracle can
    * be generated from the identical IEEE doubles (floating summation
    * makes 0.8 + 0.1 = 0.9000000000000001 — a hand-written 0.9 literal
    * would classify u in [0.9, 0.9000000000000001) differently). */
  def splitThresholds(splits: Seq[(String, Double)]): Seq[(String, Double)] = {
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    splits.init.map(_._1).zip(cum.init)
  }

  /** Deterministic dataset split by cumulative fractions, e.g.
    * Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1). */
  def assignSplit(unitKey: Column, splits: Seq[(String, Double)],
      salt: Long = 0L): Column = {
    val u = Rng.uniform(unitKey, salt)
    splitThresholds(splits).foldRight(lit(splits.last._1): Column) {
      case ((name, c), e) => when(u < c, name).otherwise(e)
    }
  }
}
