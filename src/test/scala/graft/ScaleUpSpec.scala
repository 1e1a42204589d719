package graft

import org.apache.spark.sql.functions._

/** The sf1/sf10 probe data generator (graft.ScaleUp): the scale
  * argument rests on this data being a FAITHFUL 10× — shifted-key
  * replicas with exact referential integrity, linear (not quadratic)
  * duplicate-cluster growth, and bit-reproducibility.
  */
class ScaleUpSpec extends SparkSpec {

  private val out = "/tmp/graft_scaleup_spec"

  test("3x scale-up preserves schema, counts, FK integrity, and dedup linearity") {
    ScaleUp.run(spark, "/root/testdata/sf0.001", out, 3)

    def rd(n: String) = spark.read.parquet(s"$out/$n.parquet")
    def src(n: String) = spark.read.parquet(s"/root/testdata/sf0.001/$n.parquet")

    // counts: facts 3x, dimensions fixed
    for (n <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "documents", "embeddings"))
      assert(rd(n).count() == 3 * src(n).count(), s"$n not 3x")
    for (n <- Seq("region", "nation"))
      assert(rd(n).count() == src(n).count(), s"$n dimension scaled")

    // schema identical (names + types) on a representative pair
    assert(rd("lineitem").schema == src("lineitem").schema)
    assert(rd("documents").schema.map(f => (f.name, f.dataType)) ==
      src("documents").schema.map(f => (f.name, f.dataType)))

    // referential integrity: every FK resolves
    val orphansO = rd("orders").join(rd("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    val orphansL = rd("lineitem").join(rd("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(orphansO == 0 && orphansL == 0, s"orphan FKs: $orphansO/$orphansL")

    // keys stay unique after shifting
    val dupKeys = rd("orders").groupBy("o_orderkey").count()
      .filter(col("count") > 1).count()
    assert(dupKeys == 0, "shifted order keys collide")

    // per-key fan-out preserved: max lineitems per order unchanged
    val fan = (df: org.apache.spark.sql.DataFrame) => df
      .groupBy("l_orderkey").count().agg(max("count")).head().getLong(0)
    assert(fan(rd("lineitem")) == fan(src("lineitem")))

    // dedup linearity: distinct texts must scale 3x (copies are NOT
    // textual duplicates of each other), and distinct-value growth on
    // perturbed measures is real
    assert(rd("documents").select("text").distinct().count() ==
      3 * src("documents").select("text").distinct().count(),
      "document copies are exact duplicates — cluster sizes would grow 3x")
    assert(rd("orders").select("o_totalprice").distinct().count() >
      2 * src("orders").select("o_totalprice").distinct().count())

    // embeddings: a vector and its per-copy shift are geometrically
    // unrelated — spot-check that copy 1 of vec 0 is not equal to it
    val v0 = rd("embeddings").filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val n1 = src("embeddings").count()
    val v1 = rd("embeddings").filter(col("vec_id") === n1)
      .select("embedding").head().getSeq[Float](0)
    assert(v0 != v1, "embedding copies identical — ANN neighborhoods would densify")

    // bit-reproducibility: regenerate and compare a content checksum
    val sum1 = rd("lineitem").agg(sum(hash(col("l_orderkey"),
      col("l_extendedprice"), col("l_shipdate")).cast("long"))).head().getLong(0)
    ScaleUp.run(spark, "/root/testdata/sf0.001", out2, 3)
    val sum2 = spark.read.parquet(s"$out2/lineitem.parquet")
      .agg(sum(hash(col("l_orderkey"), col("l_extendedprice"),
        col("l_shipdate")).cast("long"))).head().getLong(0)
    assert(sum1 == sum2, "scale-up is not deterministic")
  }

  private def out2 = out + "2"
}
