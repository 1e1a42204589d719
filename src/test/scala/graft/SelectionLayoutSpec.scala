package graft

import org.apache.spark.sql.functions._

/** Behavioral invariants for DSIR importance scoring and z-order
  * layout clustering (values are hash-pinned by their DuckDB oracles;
  * these pin the semantics the hashes can't express).
  */
class SelectionLayoutSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("t_dsir: target-language docs outscore the rest on average") {
    val docs = graft.core.Tables(spark, sf, "documents")
    val scored = SparkEntry.queries("t_dsir")(spark, sf)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val Array(enAvg, otherAvg) = scored
      .groupBy(col("lang") === "en")
      .agg(avg(col("dsir_score")))
      .orderBy(col("(lang = en)").desc)
      .collect().map(_.getDouble(1))
    assert(enAvg > otherAvg,
      s"target slice should outscore the rest: en=$enAvg other=$otherAvg")
  }

  test("s15_zorder: z-layout bounding boxes are far tighter than natural") {
    val rows = SparkEntry.queries("s15_zorder")(spark, sf).collect()
    val area = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(area("zorder") * 4 < area("natural"),
      s"z-order should shrink total bbox area ≥4×: $area")
  }

  test("ZOrder.zValue: interleave is a bijection on the 2-bit toy grid") {
    import spark.implicits._
    val df = (for (x <- 0 to 3; y <- 0 to 3) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .withColumn("z", graft.core.ZOrder.zValue(Seq(col("x"), col("y")), 2))
    val zs = df.select("z").collect().map(_.getLong(0)).sorted
    assert(zs.toSeq == (0L to 15L), s"z-values not a bijection: ${zs.toSeq}")
    // dim 0 owns the higher bit of each pair: (x=1, y=0) → z=2
    val z10 = df.filter(col("x") === 1 && col("y") === 0)
      .select("z").head().getLong(0)
    assert(z10 == 2L, s"bit placement wrong: z(1,0)=$z10")
  }
}
