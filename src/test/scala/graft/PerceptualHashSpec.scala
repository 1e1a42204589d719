package graft

import graft.llm.Multimodal
import graft.relational.LlmQueries4
import org.apache.spark.sql.functions._

/** The perceptual-hash dedup and skyline operators, checked against
  * brute force on small real inputs. Media payloads come from
  * [[Multimodal.synthesize]] (ids ≡ 0 mod 3 are BMP images), so the
  * engine path under test is the REAL byte decode.
  */
class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  private def refHash(id: Long): Array[Long] = {
    // replay the synthesis formula v(x,y) = (id*31 + 7x + 13y) mod 256
    // at the nearest-neighbor 8x8 sample grid
    val w = (8 + id % 8).toInt
    val h = (8 + id % 5).toInt
    val v = Array.tabulate(8, 8)((gy, gx) =>
      ((id * 31 + 7 * (gx * w / 8) + 13 * (gy * h / 8)) % 256).toInt)
    val mean = v.map(_.sum).sum / 64.0
    Array.tabulate(8) { gy =>
      (0 until 8).foldLeft(0L)((acc, gx) =>
        if (v(gy)(gx) > mean) acc | (1L << gx) else acc)
    }
  }

  private def mediaFor(ids: Seq[Long]) =
    Multimodal.synthesize(
      ids.map(id => (id, s"doc $id", "src")).toDF("doc_id", "text", "source"),
      col("doc_id"), col("text"), col("source"))

  test("aHash of a real decoded BMP equals the formula-replayed hash") {
    val ids = Seq(0L, 3L, 9L, 123L, 3840L)
    val got = Multimodal.aHashes(mediaFor(ids))
      .select("media_id", "bytes").as[(Long, Seq[Long])]
      .collect().toMap
    assert(got.keySet == ids.toSet)
    ids.foreach(id => assert(got(id) == refHash(id).toSeq, s"id=$id"))
  }

  test("banded Hamming search finds exactly the brute-force pairs") {
    val ids = (0L until 300L by 3L).toSeq // all ids ≡ 0 mod 3 → images
    val got = Multimodal.perceptualDupPairs(Multimodal.aHashes(mediaFor(ids)), 2)
      .select("ida", "idb", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    val hashes = ids.map(id => id -> refHash(id)).toMap
    val want = (for {
      a <- ids; b <- ids if a < b
      ham = hashes(a).zip(hashes(b))
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if ham <= 2
    } yield (a, b, ham.toLong)).toSet
    assert(want.nonEmpty, "fixture should produce at least one pair")
    assert(got == want)
  }

  test("distinct-hash rollup equals the brute-force per-image rollup") {
    val ids = (0L until 300L by 3L).toSeq
    val got = Multimodal.perceptualDupStats(Multimodal.aHashes(mediaFor(ids)), 2)
      .select("media_id", "n_near", "min_ham").as[(Long, Long, Long)]
      .collect().toSet
    val hashes = ids.map(id => id -> refHash(id)).toMap
    val want = ids.flatMap { a =>
      val partners = ids.filter(_ != a).map { b =>
        hashes(a).zip(hashes(b))
          .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum.toLong
      }.filter(_ <= 2L)
      if (partners.isEmpty) None
      else Some((a, partners.size.toLong, partners.min))
    }.toSet
    assert(want.nonEmpty, "fixture should produce at least one rolled-up image")
    assert(got == want)
  }

  test("skyline window computation equals brute-force dominance") {
    val sf = "/root/testdata/sf0.001"
    val q = LlmQueries4.all.find(_.name == "o10_skyline").get
    val got = q.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val pts = graft.core.Tables(spark, sf, "lineitem")
      .groupBy(col("l_suppkey").as("s"))
      .agg(round(avg(col("l_extendedprice")), 6).as("price"),
        sum(col("l_quantity")).as("qty"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val want = pts.filter { case (_, p, q0) =>
      !pts.exists { case (_, p2, q2) =>
        p2 <= p && q2 >= q0 && (p2 < p || q2 > q0)
      }
    }.toSet
    assert(want.nonEmpty && got == want)
  }
}
