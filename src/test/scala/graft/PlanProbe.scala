package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan dumper for pin development: prints a query's executed
  * plan at sf0.001. `Test/runMain graft.PlanProbe <query> [sfDir]`. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = SparkEntry.queries(args(0))(spark, dir)
    df.collect()
    println("=== PLAN " + args(0) + " ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
