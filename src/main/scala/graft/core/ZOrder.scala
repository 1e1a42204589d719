package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve clustering for multi-dimensional data
  * skipping. Sorting a table by the bit-interleaved z-value of several
  * columns before writing gives every file/row-group a tight bounding
  * box in ALL interleaved dimensions at once, so parquet min/max
  * stats prune point and range predicates on any of them — the
  * standard layout trick for 100 TB fact tables queried on more than
  * one key. The z-value itself is a pure codegen'd bit expression
  * (shifts + masks, no UDF).
  */
object ZOrder {

  /** Bit-interleaved z-value of `dims` (each already reduced to a
    * non-negative integer of at most `bits` bits; caller clamps, e.g.
    * `col % 1024` for 10 bits). Dimension 0 takes the highest bit
    * positions at each interleave step. Total bits = dims.size * bits
    * must stay ≤ 62. */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && dims.size * bits <= 62,
      s"z-value needs dims*bits <= 62, got ${dims.size} * $bits")
    val d = dims.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- dims.zipWithIndex
    } yield {
      // bit i of dim j lands at position i*d + (d-1-j)
      val pos = i * d + (d - 1 - j)
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << pos)
    }
    terms.reduce(_ + _)
  }

  /** The identical arithmetic as ANSI SQL over pre-clamped integer
    * expressions — lets a second engine replay the curve exactly. */
  def zValueSql(dims: Seq[String], bits: Int): String = {
    val d = dims.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- dims.zipWithIndex
    } yield {
      val pos = i * d + (d - 1 - j)
      s"((($c >> $i) & 1) * ${1L << pos})"
    }
    terms.mkString("(", " + ", ")")
  }
}
