package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Sample {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def tm[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tm] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val li = graft.core.Tables(spark, d, "lineitem")
      .filter(col("l_orderkey") % 50 === 0)
    li.count()
    def side(m: Int) = li.filter(col("l_suppkey") % 2 === m).select(
      (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("uid"),
      col("l_quantity").cast("double").as("t"),
      when(col("l_returnflag") =!= "A", 1.0).otherwise(0.0).as("d"),
      (col("l_discount") * 10).cast("double").as("x"),
      (lit(1.0) + col("l_orderkey") % 5).cast("double").as("wt"))
    println("cohort=" + side(1).count() + " survey=" + side(0).count())
    (1 to 2).foreach { i =>
      tm(s"kwChain full #$i")(graft.pipeline.TaylorInference.kwChain(
        side(0).drop("wt"), col("uid"), side(1), col("uid"), col("wt"),
        col("t"), col("d"),
        Seq("x"), Seq("x"), Seq(10.0, 20.0, 30.0, 40.0, 50.0),
        a = 0.3, bandwidth = Some(0.4), psIters = 6, coxIters = 4,
        sizeHint = graft.core.Windows.SizeHint.Small))
    }
    spark.stop()
  }
}
