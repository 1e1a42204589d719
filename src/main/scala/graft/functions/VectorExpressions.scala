package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the embedding hot path (SURVEY.md
  * §7.3 tier (b): custom `Expression` beats UDF beats interpreted
  * higher-order functions).
  *
  * `zip_with`/`aggregate` are CodegenFallback — every element bounces
  * through interpreted lambda dispatch, which measured ~3× slower on the
  * 64-dim cosine over millions of candidate pairs. These expressions
  * generate a tight primitive loop inside whole-stage codegen instead.
  * Summation order is left-to-right, matching both the HOF formulation
  * and DuckDB's list_dot_product — oracle-hash compatible.
  */
object VectorExpressions {
  import org.apache.spark.sql.GraftSqlBridge

  /** cosine(a, b) for ArrayType(Double) columns. */
  def cosine(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSim(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Order-preserving IEEE-754 bit image of a double (see
    * [[SortableBits]]). */
  def sortableBits(a: Column): Column =
    GraftSqlBridge.column(SortableBits(GraftSqlBridge.expression(a)))

  /** |A ∩ B| of two SORTED distinct long arrays (see
    * [[SortedIntersectCount]]). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** One descent step of a hierarchical coarse quantizer (see
    * [[NearestChild]]). */
  def nearestChild(parent: Column, vec: Column,
      children: Array[Array[Array[Double]]], branch: Int): Column =
    GraftSqlBridge.column(NearestChild(
      GraftSqlBridge.expression(parent), GraftSqlBridge.expression(vec),
      children, branch))
}

trait VectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
}

case class CosineSim(left: Expression, right: Expression) extends VectorBinary {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class DotProduct(left: Expression, right: Expression) extends VectorBinary {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** One descent step of a HIERARCHICAL coarse quantizer: given a row's
  * current tree cell (`left`, int) and its vector (`right`,
  * array<double>), return `parent·branch + argmin_j d²(v, child_j)` —
  * the row's cell one level deeper. `children(parent)` holds that
  * parent's child centroids (1 to `branch` of them; a parent whose
  * fit-time cell was empty carries its own centroid as sole child, so
  * descent is total).
  *
  * This is what makes corpus-derived cell counts scale: a FLAT
  * quantizer with k ∝ n (SemDeDup's cell-size law) must stream n·k
  * candidate pairs through a broadcast join — O(n²/cellSize) work that
  * measured 20.8× for 2× data once it spilled (sf20→sf40, d13). A
  * depth-D descent does n·b·D distance evaluations with b = k^(1/D),
  * entirely INSIDE whole-stage codegen: the centroid tree rides along
  * as a reference object (never an expression tree, so — unlike the
  * literal-array `nearestCentroid` path, which falls out of codegen
  * past ~16 centroids — code size is independent of b), and assignment
  * is a pure map: no join, no shuffle, nothing data-sized on the
  * driver.
  *
  * Distance uses the same association order as the flat paths and the
  * DuckDB oracle — `(v·v − 2·v·c) + c·c`, v·v hoisted per call, c·c
  * precomputed per child — and ties break to the smallest j (strict
  * `<` keeps the earliest), so a 1-level call with parent 0 is
  * value-identical to `nearestCentroid`/`assignSql`.
  */
case class NearestChild(left: Expression, right: Expression,
    tree: Array[Array[Array[Double]]], branch: Int)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = right.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (left.dataType == org.apache.spark.sql.types.IntegerType && vecOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"tree_nearest_child needs (INT parent, ARRAY<DOUBLE> vec), " +
          s"got ${left.dataType} / ${right.dataType}")
  }
  override def prettyName: String = "tree_nearest_child"

  /** c·c per (parent, child), precomputed once on the driver in the
    * same left-to-right order as the SQL replay's list_dot_product. */
  private val cc: Array[Array[Double]] = tree.map(_.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  })

  override def nullSafeEval(p: Any, v: Any): Any = {
    val parent = p.asInstanceOf[Int]
    val a = v.asInstanceOf[ArrayData]
    val ch = tree(parent)
    val cs = cc(parent)
    val n = a.numElements()
    var vv = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); vv += x * x; i += 1 }
    var best = Double.PositiveInfinity
    var bj = 0
    var j = 0
    while (j < ch.length) {
      val c = ch(j)
      val m = math.min(n, c.length)
      var vc = 0.0
      var d = 0
      while (d < m) { vc += a.getDouble(d) * c(d); d += 1 }
      val dist = vv - 2.0 * vc + cs(j)
      if (dist < best) { best = dist; bj = j }
      j += 1
    }
    parent * branch + bj
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val chRef = ctx.addReferenceObj("treeChildren", tree, "double[][][]")
    val ccRef = ctx.addReferenceObj("treeChildCc", cc, "double[][]")
    nullSafeCodeGen(ctx, ev, (p, v) => {
      val ch = ctx.freshName("ch"); val cs = ctx.freshName("cs")
      val n = ctx.freshName("n"); val vv = ctx.freshName("vv")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val m = ctx.freshName("m")
      val vc = ctx.freshName("vc"); val d = ctx.freshName("d")
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best"); val bj = ctx.freshName("bj")
      val x = ctx.freshName("x")
      s"""
         |double[][] $ch = $chRef[$p];
         |double[] $cs = $ccRef[$p];
         |int $n = $v.numElements();
         |double $vv = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $v.getDouble($i); $vv += $x * $x;
         |}
         |double $best = Double.POSITIVE_INFINITY;
         |int $bj = 0;
         |for (int $j = 0; $j < $ch.length; $j++) {
         |  double[] $c = $ch[$j];
         |  int $m = java.lang.Math.min($n, $c.length);
         |  double $vc = 0.0;
         |  for (int $d = 0; $d < $m; $d++) { $vc += $v.getDouble($d) * $c[$d]; }
         |  double $dist = $vv - 2.0 * $vc + $cs[$j];
         |  if ($dist < $best) { $best = $dist; $bj = $j; }
         |}
         |${ev.value} = $p * $branch + $bj;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Order-preserving map from a double to a signed long: the exact
  * IEEE-754 trick radix sorts use. For non-negative doubles the raw
  * bit pattern, read as a signed long, already ascends with the value
  * (0x0000… for +0.0 up to 0x7FF0… for +Inf); for negatives the bits
  * ascend as the value DEscends, so they are reflected below zero with
  * `Long.MinValue - bits`. Properties, all exact by bit layout (no
  * floating arithmetic, so no rounding argument needed):
  *
  *   - strictly monotone over ordered doubles: x < y ⇒ f(x) < f(y);
  *   - f(-0.0) = f(+0.0) = 0 (numerically equal values collide, which
  *     is what an order key wants);
  *   - NaN (canonicalized by doubleToLongBits) maps above +Inf —
  *     matching Spark SQL's NaN-greatest ordering.
  *
  * Any arithmetic right-shift of the result is then a weakly-monotone
  * RADIX BUCKET of the double line — the deterministic, sample-free
  * partitioning key behind [[graft.stats.WeightedQuantile]] (a
  * `repartitionByRange` re-samples boundaries on every materialization;
  * `shiftright(sortable_bits(x), 48)` never changes).
  */
case class SortableBits(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sortable_bits needs DOUBLE, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])
    if (b >= 0L) b else Long.MinValue - b
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => {
      val b = ctx.freshName("bits")
      s"""
         |long $b = java.lang.Double.doubleToLongBits($d);
         |${ev.value} = ($b >= 0L) ? $b : (java.lang.Long.MIN_VALUE - $b);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Intersection CARDINALITY of two sorted, duplicate-free long arrays
  * via a single merge pass — the verify-arm primitive for set-overlap
  * dedup (n-gram containment/Jaccard). `size(array_intersect(a, b))`
  * builds a hash set and materializes the intersection ARRAY per call;
  * on a 10⁸-pair candidate stream that allocation is the dominant
  * cost. This is a branch-light O(|a|+|b|) count with zero allocation,
  * inside whole-stage codegen. Value-identical to the built-in on
  * sorted distinct inputs (both count distinct common elements).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // containsNull must be false: the merge reads getLong on every slot,
    // which is undefined for a null element — it would silently diverge
    // from size(array_intersect) instead of failing.
    def isLongArray(t: DataType) = t match {
      case ArrayType(org.apache.spark.sql.types.LongType, containsNull) =>
        !containsNull
      case _ => false
    }
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count needs ARRAY<BIGINT> with non-null " +
          s"elements, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val c = ctx.freshName("c")
      s"""
         |int $na = $a.numElements(), $nb = $b.numElements();
         |int $i = 0, $j = 0;
         |long $c = 0L;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
