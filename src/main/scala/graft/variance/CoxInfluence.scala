package graft.variance

import graft.core.{AsOf, LinAlg, Windows}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Per-unit Cox-score influence deviates (SURVEY.md M13) — the
  * reference's `beta_pw.cox` (taylor_deviate.R:601-742, no-post path).
  *
  * The reference loops over event times accumulating an n×p matrix
  * (U_w_2). Algebraically the loop collapses to the martingale-residual
  * form, which is what the engine computes — O(n) distributed, never an
  * n×|events| intermediate:
  *
  *   Ui_j = d_i·(x_ij − S1_j(t_i)/S0(t_i))
  *        − rh_i·(x_ij·G0(t_i) − G1_j(t_i))
  *   G0(t)   = Σ_{events u ≤ t} wd_u / S0(u)
  *   G1_j(t) = Σ_{events u ≤ t} wd_u · S1_j(u) / S0(u)²
  *
  * Pipeline: tie-collapse groupBy(t) → suffix scan (S0, S1) → event-time
  * prefix scan (G0, G1) → join S/G values back to unit rows by t (S at
  * t_i is exact; G is a step function evaluated at t_i, which for the
  * risk-set structure equals the value at t_i since every t_i is in the
  * step table). The β deviates are Δ_i = I⁻¹·Ui — a constant p×p
  * driver-side matrix applied as codegen'd expressions.
  */
object CoxInfluence {

  /** `units` is the deviate frame (see `deviates`); `collapsed` is the
    * tie-collapse aggregate it was built from, in the hazard-chain
    * convention (__t, ng, zg, yg, ag0..ag{p-1}[, dng/dzg/dyg per γ]) so
    * `HazardInfluence.cumulativeDeviates` can consume it as
    * `preCollapsed` instead of re-aggregating the (much more expensive)
    * joined deviate frame. */
  final case class Deviates(units: DataFrame, collapsed: DataFrame)

  /** Returns the input frame + per-unit score columns `ui_0..ui_{p-1}`
    * and β-deviate columns `dbeta_0..dbeta_{p-1}`. */
  def deviates(
      df: DataFrame,
      time: Column, event: Column, weight: Column,
      features: Seq[Column],
      beta: Array[Double],
      infoPacked: Array[Double],
      passthrough: Seq[Column] = Nil,
      sizeHint: Windows.SizeHint = Windows.SizeHint.Auto): DataFrame =
    deviatesAndCollapse(df, time, event, weight, features, beta, infoPacked,
      passthrough, sizeHint).units

  /** As `deviates`, also exposing the tie-collapsed step aggregate.
    * `gammaQ` > 0 additionally collapses the γ-chain measure columns
    * `pgPrefix`0..{q-1} (which must be in `passthrough`) — the sums the
    * hazard chain needs (taylor_deviate.R:823-834). */
  def deviatesAndCollapse(
      df: DataFrame,
      time: Column, event: Column, weight: Column,
      features: Seq[Column],
      beta: Array[Double],
      infoPacked: Array[Double],
      passthrough: Seq[Column] = Nil,
      sizeHint: Windows.SizeHint = Windows.SizeHint.Auto,
      gammaQ: Int = 0,
      pgPrefix: String = "__pg"): Deviates = {
    val p = features.length
    val x = features.indices.map(j => features(j).cast("double").as(s"__x$j"))
    val base = df.select((Seq(time.cast("double").as("__t"),
      event.cast("double").as("__d"), weight.cast("double").as("__w")) ++ x
      ++ passthrough): _*)
      .withColumn("__rh", exp(
        beta.zipWithIndex.map { case (b, j) => col(s"__x$j") * lit(b) }
          .foldLeft(lit(0.0): Column)(_ + _)))

    // tie-collapse + risk-set suffix sums. ONE groupBy serves both this
    // score influence (zg = S0 increments, ag_j = S1_j) and the
    // downstream hazard chain (ng, yg, γ sums) — computed over the cheap
    // projected base, not the joined deviate output.
    val aggExprs = Seq(
      sum(when(col("__d") === 1.0, col("__w")).otherwise(0.0)).as("ng"),
      sum(col("__w") * col("__rh")).as("zg"),
      sum(col("__w")).as("yg")) ++
      (0 until p).map(j => sum(col("__w") * col("__rh") * col(s"__x$j")).as(s"ag$j")) ++
      (0 until gammaQ).flatMap(m => Seq(
        sum(when(col("__d") === 1.0, col(pgPrefix + m)).otherwise(0.0)).as(s"dng$m"),
        sum(col(pgPrefix + m) * col("__rh")).as(s"dzg$m"),
        sum(col(pgPrefix + m)).as(s"dyg$m")))
    val grouped = base.groupBy(col("__t")).agg(aggExprs.head, aggExprs.tail: _*)
    val scanCols = (col("zg") -> "S0") +:
      (0 until p).map(j => col(s"ag$j") -> s"S1$j")
    val withS = Windows.scan(grouped, Seq(col("__t").desc), scanCols,
      sizeHint = sizeHint)

    // event-time prefix sums G0, G1_j (zero increment at non-event times
    // keeps every t in the step table for the back-join)
    val gCols = (when(col("ng") > 0, col("ng") / col("S0")).otherwise(0.0) -> "G0") +:
      (0 until p).map(j =>
        (when(col("ng") > 0, col("ng") * col(s"S1$j") / (col("S0") * col("S0")))
          .otherwise(0.0)) -> s"G1$j")
    val steps = Windows.scan(withS, Seq(col("__t")), gCols, sizeHint = sizeHint)
      .select((col("__t") +: col("S0") +:
        (0 until p).map(j => col(s"S1$j")) ++:
        col("G0") +: (0 until p).map(j => col(s"G1$j"))): _*)

    // join S/G back to unit rows by exact t (every t_i is in steps);
    // a Small step table broadcasts — no shuffle of the unit rows
    val stepsSide = if (sizeHint == Windows.SizeHint.Small) broadcast(steps)
                    else steps
    val joined = base.join(stepsSide, Seq("__t"))

    val ui = (0 until p).map { j =>
      (col("__d") * (col(s"__x$j") - col(s"S1$j") / col("S0")) -
        col("__rh") * (col(s"__x$j") * col("G0") - col(s"G1$j"))).as(s"ui_$j")
    }
    val withUi = joined.select((joined.columns.map(col).toSeq ++ ui): _*)

    val iinv = LinAlg.inverse(LinAlg.unpack(p, infoPacked))
    val dbeta = (0 until p).map { r =>
      (0 until p).map(j => lit(iinv(r, j)) * col(s"ui_$j")).reduce(_ + _).as(s"dbeta_$r")
    }
    Deviates(withUi.select((withUi.columns.map(col).toSeq ++ dbeta): _*), grouped)
  }

  /** Post-stratified variant (the reference's `post` branch,
    * taylor_deviate.R:670-742, with `post.f`'s factored f_w,
    * 957-982). The reference accumulates an extra n×p loop term
    * (U_w_3 − U_w_4) through the block-structured ∂f/∂w Jacobian;
    * swapping the summation order collapses the whole branch to
    *
    *   Ui_post(i) = f_h(i)·Ui_base(i) + v_h(i) · Σ_{j∈h(i)} pw_j·Ui_base(j)
    *   v_h = −f_h/N̂_h,  f_h = N_h/N̂_h
    *
    * where Ui_base is the plain per-unit score influence computed at the
    * post-stratified weights w = f·pw. So the post path costs exactly
    * one extra per-cell aggregate + broadcast join — never the n×n
    * Jacobian the reference refuses to materialize (its `Large` flag).
    * Verified to machine precision against the reference's literal loop.
    *
    * @param popTotals (cell, N_h) population totals, dimension-sized
    */
  def deviatesPostStratified(
      df: DataFrame,
      time: Column, event: Column, baseWeight: Column, cell: Column,
      popTotals: DataFrame,
      features: Seq[Column],
      beta: Array[Double],
      infoPacked: Array[Double]): DataFrame = {
    val p = features.length
    // post factors per cell
    val hat = df.groupBy(cell.as("__cell"))
      .agg(sum(baseWeight.cast("double")).as("__Nh_hat"))
    val factors = hat.join(
        popTotals.select(col(popTotals.columns.head).as("__cell"),
          col(popTotals.columns(1)).cast("double").as("__Nh")), Seq("__cell"))
      .select(col("__cell"), (col("__Nh") / col("__Nh_hat")).as("__f"),
        (-col("__Nh") / (col("__Nh_hat") * col("__Nh_hat"))).as("__v"))
    val withF = df.withColumn("__cell", cell)
      .join(broadcast(factors), Seq("__cell"))
      .withColumn("__pw", baseWeight.cast("double"))

    // base influence at the post-stratified weights w = f·pw
    val dev = deviates(withF, time, event, col("__f") * col("__pw"),
      features, beta, infoPacked,
      passthrough = Seq(col("__cell"), col("__f"), col("__v"), col("__pw")))

    // per-cell Σ pw_j · Ui_base(j)
    val cellAggs = (0 until p).map(j =>
      sum(col("__pw") * col(s"ui_$j")).as(s"__cs$j"))
    val cellSums = dev.groupBy(col("__cell")).agg(cellAggs.head, cellAggs.tail: _*)
    val joined = dev.join(broadcast(cellSums), Seq("__cell"))

    val uiPost = (0 until p).map { j =>
      (col("__f") * col(s"ui_$j") + col("__v") * col(s"__cs$j")).as(s"ui_post_$j")
    }
    val withPost = joined.select((joined.columns.map(col).toSeq ++ uiPost): _*)
    val iinv = LinAlg.inverse(LinAlg.unpack(p, infoPacked))
    val dbeta = (0 until p).map { r =>
      (0 until p).map(j => lit(iinv(r, j)) * col(s"ui_post_$j")).reduce(_ + _)
        .as(s"dbeta_post_$r")
    }
    withPost.select((withPost.columns.map(col).toSeq ++ dbeta): _*)
  }
}
