package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}

/** SQL exposure of the engine's custom expressions, two ways:
  *
  *  - `GraftFunctions.register(spark)` on a live session, after which
  *    `spark.sql("SELECT graft_cosine(a, b) ...")` works;
  *  - `new GraftExtensions` via
  *    `SparkSession.builder().withExtensions(new GraftExtensions)` /
  *    `spark.sql.extensions=graft.functions.GraftExtensions`, the
  *    deployment-time injection path.
  */
object GraftFunctions {
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> (exprs => CosineSim(exprs(0), exprs(1))),
    "graft_dot" -> (exprs => DotProduct(exprs(0), exprs(1))))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      GraftSqlBridge.registerFunction(spark, name, builder)
    }

  /** Full live-session install: SQL functions + the engine's optimizer
    * rules (range-join bucketing). Idempotent. */
  def install(spark: SparkSession): Unit = {
    register(spark)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeJoinRewrite
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.VectorExpressions", name),
        builder))
    }
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
