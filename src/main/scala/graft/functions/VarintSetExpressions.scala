package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** Compact binary set fingerprints for the dedup verify joins.
  *
  * The d12 containment verify join is the catalog's widest shuffle:
  * every candidate pair ships BOTH docs' full token arrays (8-byte
  * xxhash64 values — ~1 KB/side at 120 tokens/doc), and at the sf10+
  * probes that pair × array stream is the one multi-GB spiller left.
  * The token VALUES are irrelevant to the verify — only set identity
  * within a block matters — so the posting side first densifies each
  * block's vocabulary to integer ranks (0..V−1) and the verify then
  * ships a delta-varint encoding of each doc's sorted rank set:
  * unsigned LEB128 of the first rank, then of the gaps (≥ 1, sets are
  * distinct). Dense ranks make gaps small — ~1–2 bytes/token against
  * the 8-byte hashes, a 4–8× payload cut — and the intersection count
  * is a straight merge over the two byte streams, decoded on the fly
  * with no per-pair allocation.
  *
  * Same hot-path discipline as [[VectorExpressions]]: native
  * expressions with `doGenCode` (the generated code calls the static
  * forwarders on [[VarintSet]]) so the verify stays inside whole-stage
  * codegen.
  */
object VarintSetExpressions {
  import org.apache.spark.sql.GraftSqlBridge

  /** Delta-varint fingerprint of a SORTED DISTINCT non-negative
    * ARRAY<INT> (see [[DeltaVarintEncode]]). */
  def encode(sortedRanks: Column): Column =
    GraftSqlBridge.column(
      DeltaVarintEncode(GraftSqlBridge.expression(sortedRanks)))

  /** |A ∩ B| of two [[encode]]d fingerprints (see
    * [[VarintIntersectCount]]). */
  def intersectCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(VarintIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** Byte-level codec, shared by interpreted eval and generated code
  * (Scala object ⇒ static forwarders callable from codegen'd Java). */
object VarintSet {
  /** Unsigned-LEB128 delta encoding of a sorted distinct int array.
    * Deltas of a distinct ascending sequence are ≥ 1, so decode can
    * rebuild the exact set; the first value is stored as-is (≥ 0). */
  def encodeFromArrayData(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val buf = new Array[Byte](n * 5) // LEB128 of an int is ≤ 5 bytes
    var pos = 0
    var prev = 0
    var i = 0
    while (i < n) {
      val v = a.getInt(i)
      var d = v - prev // first iteration: the value itself
      while ((d & ~0x7f) != 0) {
        buf(pos) = ((d & 0x7f) | 0x80).toByte; pos += 1
        d >>>= 7
      }
      buf(pos) = d.toByte; pos += 1
      prev = v
      i += 1
    }
    java.util.Arrays.copyOf(buf, pos)
  }

  /** Merge-count over two encoded streams: O(|a| + |b|) decode, zero
    * allocation. Both inputs must come from [[encodeFromArrayData]]. */
  def intersectCount(a: Array[Byte], b: Array[Byte]): Long = {
    var ia = 0; var ib = 0
    var va = 0; var vb = 0
    var count = 0L
    var haveA = false; var haveB = false
    while (true) {
      if (!haveA) {
        if (ia >= a.length) return count
        var shift = 0; var d = 0
        var more = true
        while (more) {
          val byte0 = a(ia); ia += 1
          d |= (byte0 & 0x7f) << shift; shift += 7
          more = (byte0 & 0x80) != 0
        }
        va += d; haveA = true
      }
      if (!haveB) {
        if (ib >= b.length) return count
        var shift = 0; var d = 0
        var more = true
        while (more) {
          val byte0 = b(ib); ib += 1
          d |= (byte0 & 0x7f) << shift; shift += 7
          more = (byte0 & 0x80) != 0
        }
        vb += d; haveB = true
      }
      if (va == vb) { count += 1; haveA = false; haveB = false }
      else if (va < vb) haveA = false
      else haveB = false
    }
    count // unreachable
  }
}

/** fp = delta_varint(sorted distinct ARRAY<INT>) — the compact set
  * fingerprint the verify joins shuffle instead of raw token arrays. */
case class DeltaVarintEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull must be false: getInt on a null slot is undefined
    // and would silently corrupt the fingerprint instead of failing
    case ArrayType(IntegerType, false) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"delta_varint_encode needs ARRAY<INT> (no nulls), got $t")
  }
  override def prettyName: String = "delta_varint_encode"

  override def nullSafeEval(input: Any): Any =
    VarintSet.encodeFromArrayData(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VarintSet.encodeFromArrayData($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** |A ∩ B| over two [[DeltaVarintEncode]] fingerprints. */
case class VarintIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"varint_intersect_count needs (BINARY, BINARY), " +
        s"got ${left.dataType} / ${right.dataType}")
  override def prettyName: String = "varint_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any =
    VarintSet.intersectCount(
      l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VarintSet.intersectCount($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
