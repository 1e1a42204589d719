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

  test("upsert: update keeps uncarried columns, insert null-fills them, delete drops") {
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "tag", "price")
    val ch = Seq((2L, "U", 99.0), (3L, "D", 0.0), (4L, "I", 55.0))
      .toDF("k", "op", "price")
    val out = graft.core.Upsert(snap, ch, key = "k")
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), r.getDouble(2))).toSet
    assert(out == Set(
      (1L, Some("a"), 10.0),   // untouched
      (2L, Some("b"), 99.0),   // price updated, tag kept
      (4L, None, 55.0)))       // inserted, snapshot-only column null
  }

  test("upsert: empty changeset is identity; empty snapshot keeps inserts only") {
    val snap = Seq((1L, 1.0)).toDF("k", "v")
    val none = Seq.empty[(Long, String, Double)].toDF("k", "op", "v")
    assert(graft.core.Upsert(snap, none, "k").collect().toSeq ==
      snap.collect().toSeq)
    val onlyIns = Seq((9L, "I", 2.0), (8L, "D", 0.0)).toDF("k", "op", "v")
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    val out = graft.core.Upsert(empty, onlyIns, "k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(out == Set((9L, 2.0)))
  }
}
