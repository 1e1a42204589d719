package graft

import graft.core.Salting
import org.apache.spark.sql.functions._

/** Salted-join exactness: the output multiset must equal the plain
  * join for any salt assignment, full-salt and hot-keys-only. */
class SaltingSpec extends SparkSpec {
  import spark.implicits._

  private def big = (0 until 2000).map { i =>
    // key 7 owns half the table — the skew scenario
    (if (i % 2 == 0) 7L else (i % 10).toLong, i.toLong)
  }.toDF("k", "v")
  private def dim = (0L until 10L).map(k => (k, s"d$k")).toDF("k", "name")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq

  test("saltedJoin equals the plain join") {
    val plain = canon(big.join(dim, Seq("k")))
    assert(canon(Salting.saltedJoin(big, dim, "k", salts = 8)) == plain)
    assert(canon(Salting.saltedJoin(big, dim, "k", salts = 1)) == plain)
  }

  test("saltedJoinHotKeys equals the plain join and spreads the hot key") {
    val plain = canon(big.join(dim, Seq("k")))
    assert(canon(Salting.saltedJoinHotKeys(big, dim, "k",
      hotKeys = Seq(7L), salts = 8)) == plain)
  }

  test("left join keeps unmatched big-side rows") {
    val sparseDim = dim.filter(col("k") < 3)
    val plain = big.join(sparseDim, Seq("k"), "left").count()
    val salted = Salting.saltedJoin(big, sparseDim, "k",
      salts = 4, joinType = "left").count()
    assert(salted == plain)
  }
}
