package graft.core

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, TypedColumn}

/** The one custom UDAF the engine genuinely needs (SURVEY.md §2.9, §7.3):
  * a vector outer-product accumulator. One pass over rows
  * `(x: Seq[Double], y: Double, w: Double)` produces the packed normal
  * equations
  *
  *   buffer = [ Σ w·x xᵀ (upper triangle, p(p+1)/2) | Σ w·x·y (p) | Σ w | Σ w·y | Σ w·y² ]
  *
  * which covers the reference's Gram/covariance aggregations
  * (X'WX at taylor_deviate.R:475,558,996; sandwich blocks at
  * simu_fun.R:239-259; cov at taylor_deviate.R:490) without ever
  * materializing an n×n object. Runs as a partial+final object-hash
  * aggregate; the p×p result collects to the driver (p ≤ ~10).
  */
class NormalEqAgg(p: Int)
    extends Aggregator[(Seq[Double], Double, Double), Array[Double], Array[Double]] {

  private val tri = p * (p + 1) / 2
  private val len = tri + p + 3

  override def zero: Array[Double] = new Array[Double](len)

  override def reduce(b: Array[Double], in: (Seq[Double], Double, Double)): Array[Double] = {
    val (xs, y, w) = in
    val x = xs.toArray
    var k = 0
    var i = 0
    while (i < p) {
      val wxi = w * x(i)
      var j = i
      while (j < p) { b(k) += wxi * x(j); k += 1; j += 1 }
      b(tri + i) += wxi * y
      i += 1
    }
    b(tri + p) += w
    b(tri + p + 1) += w * y
    b(tri + p + 2) += w * y * y
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Double]): Array[Double] = b

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

object NormalEqAgg {
  /** Typed column for `ds.select(...)` over (features, y, weight) tuples. */
  def column(p: Int): TypedColumn[(Seq[Double], Double, Double), Array[Double]] =
    new NormalEqAgg(p).toColumn

  /** Views into the packed buffer. */
  final case class Result(p: Int, buf: Array[Double]) {
    private val tri = p * (p + 1) / 2
    def gram: Array[Double] = buf.slice(0, tri)            // Σ w x xᵀ packed
    def xy: Array[Double] = buf.slice(tri, tri + p)        // Σ w x y
    def sumW: Double = buf(tri + p)
    def sumWy: Double = buf(tri + p + 1)
    def sumWy2: Double = buf(tri + p + 2)
  }
}
