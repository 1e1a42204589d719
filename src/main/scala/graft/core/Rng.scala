package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic pseudo-randomness.
  *
  * The reference fixes seeds (calib_simu_noninf0315.R:26, seed.txt) for
  * reproducible Monte-Carlo; R's Mersenne-Twister cannot be bit-matched
  * from SQL engines (SURVEY.md §7.4.3). The engine therefore defines its
  * own reproducible stream: a 31-bit LCG (glibc constants) whitened by a
  * second round, computable identically — in exact 64-bit integer
  * arithmetic — by both Spark and the DuckDB oracle. Uniforms derived
  * from a row key are thus hash-comparable across engines, which makes
  * the *sampling* operators (M15 PPS via Efraimidis–Spirakis keys,
  * jackknife group assignment, synthetic population generation S3)
  * oracle-checkable, not just rows-only.
  */
object Rng {
  val A = 1103515245L
  val C = 12345L
  val M = 2147483648L // 2^31

  val SALT_MIX = 69069L

  private def lcg(x: Column): Column = (lit(A) * x + lit(C)) % lit(M)

  /** key must be a non-negative integral column; returns uniform in
    * (0,1). The salt multiplies into the key stream (not just adds) so
    * streams with different salts never alias shifted ids. All
    * intermediates stay within exact int64 range. */
  def uniform(key: Column, salt: Long = 0L): Column = {
    val k = ((key.cast("long") % lit(M)) * lit(SALT_MIX) + lit(salt)) % lit(M)
    (lcg(lcg(k)).cast("double") + lit(0.5)) / lit(M.toDouble)
  }

  /** The identical computation as DuckDB SQL over an integral expression. */
  def uniformSql(expr: String, salt: Long = 0L): String = {
    val k = s"((((($expr) % $M) * $SALT_MIX) + $salt) % $M)"
    val l1 = s"(($A * $k + $C) % $M)"
    val l2 = s"(($A * $l1 + $C) % $M)"
    s"((CAST($l2 AS DOUBLE) + 0.5) / $M)"
  }

  /** Inverse-CDF exponential with rate `rate` (for Efraimidis–Spirakis
    * weighted-sampling keys: -ln(u)/w). */
  def exponential(key: Column, rate: Column): Column =
    -log(uniform(key)) / rate

  /** Inverse-CDF Weibull(shape, scale): scale * (-ln(1-u))^(1/shape) —
    * the reference's rweibull synthesis (calib_simu_noninf0315.R:52). */
  def weibull(key: Column, shape: Double, scale: Column): Column =
    scale * pow(-log(lit(1.0) - uniform(key)), lit(1.0 / shape))
}
