package graft.core

import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.types.{ArrayType, DoubleType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row}

/** Attach a driver-side coefficient vector to every row as a one-row
  * broadcast array column — instead of inlining it as literals.
  *
  * Why: the IRLS/Newton drivers re-plan their per-iteration aggregate
  * with the CURRENT β as `lit(...)`s. Literals are inlined into the
  * generated code, so every iteration's whole-stage source is unique
  * and pays a fresh Janino compile that the codegen cache can never
  * amortize. Routed through a broadcast variable the source is
  * iteration-invariant (values live in the referenced broadcast DATA,
  * not the code): iteration 2+ — and every later fit with the same
  * shape — hits the codegen cache. The join is a one-row
  * BroadcastNestedLoopJoin, fully codegen'd, built driver-side from a
  * LocalTableScan (no job). Arithmetic is unchanged: `element_at`
  * yields the same double the literal held, so fixed points are
  * bit-identical.
  */
object CoefCol {
  def attach(df: DataFrame, name: String, values: Array[Double]): DataFrame = {
    val schema = StructType(Seq(StructField(name,
      ArrayType(DoubleType, containsNull = false), nullable = false)))
    val one = df.sparkSession.createDataFrame(
      java.util.Collections.singletonList(Row(values.toIndexedSeq)), schema)
    df.crossJoin(broadcast(one))
  }
}
