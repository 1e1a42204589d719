package graft

import org.apache.spark.sql.functions._

/** Empty-input behavior for the iterative / library-level operators —
  * at corpus scale a filter can legitimately leave zero rows, and an
  * iterative operator must terminate (not loop or throw) on it.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def emptyPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")

  test("connected components on an empty edge list is empty") {
    val cc = graft.llm.Dedup.connectedComponents(
      emptyPairs, col("id_a"), col("id_b"))
    assert(cc.collect().isEmpty)
  }

  test("connected components on only-self-edges is empty") {
    val cc = graft.llm.Dedup.connectedComponents(
      Seq((3L, 3L), (9L, 9L)).toDF("id_a", "id_b"), col("id_a"), col("id_b"))
    assert(cc.collect().isEmpty)
  }

  test("raking an empty frame terminates and returns empty") {
    val df = Seq.empty[(String, Double)].toDF("r", "w")
    val tr = Seq(("a", 1.0)).toDF("r", "t")
    val out = graft.weights.Raking.rake(df, col("w"),
      Seq(col("r") -> tr), sweeps = 2)
    assert(out.collect().isEmpty)
  }

  test("bootstrap/stratified/split on empty frames are empty") {
    val df = Seq.empty[Long].toDF("id").withColumn("w", lit(1.0))
    assert(graft.sampling.Resample
      .bootstrapReplicates(df, col("id"), col("w"), 3).collect().isEmpty)
    assert(graft.sampling.Resample
      .stratifiedFixed(df, col("w"), col("id"), 5).collect().isEmpty)
    assert(df.withColumn("s", graft.sampling.Resample.assignSplit(col("id"),
      Seq("a" -> 0.5, "b" -> 0.5))).collect().isEmpty)
  }

  test("exact dedup and minhash pairs on an empty corpus are empty") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.llm.Dedup.exact(docs, col("doc_id"), col("text"))
      .collect().isEmpty)
    assert(graft.llm.Dedup.minhashPairs(docs, col("doc_id"), col("text"))
      .collect().isEmpty)
  }
}
