package graft

import graft.llm.{Dedup, Mixing}
import org.apache.spark.sql.functions._

/** Library-level invariants for the corpus-mixing operators
  * (temperature weights, weighted reservoir, sequence packing,
  * incremental MinHash screen). The cross-engine hash checks live in
  * the mix / d10 / d11 oracle queries; these tests pin the algebraic
  * contracts on adversarial inputs the test tables don't contain.
  */
class MixingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "aa bb cc dd ee ff gg hh ii jj", "web", 10L),
    (2L, "aa bb cc dd ee ff gg hh ii jj", "web", 10L),
    (3L, "zz yy xx wv uu tt ss rr qq pp", "web", 25L),
    (4L, "one two three four five six seven", "book", 7L),
    (5L, "eight nine ten eleven twelve thirteen", "book", 40L),
    (6L, "lorem ipsum dolor sit amet consectetur", "code", 3L)
  ).toDF("doc_id", "text", "source", "n_tok")

  test("temperatureWeights: probabilities sum to 1; alpha=1 is proportional") {
    val w = Mixing.temperatureWeights(docs, col("source"), col("n_tok"),
      alpha = 1.0, budget = 100.0).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assertNear(w.map(_._3).sum, 1.0)
    val tot = w.map(_._2).sum.toDouble
    w.foreach { case (_, n, p, e) =>
      assertNear(p, n / tot) // alpha=1 keeps natural proportions
      assertNear(e, p * 100.0 / n) // epochs = share of budget / size
    }
  }

  test("temperatureWeights: alpha=0 flattens to uniform over sources") {
    val w = Mixing.temperatureWeights(docs, col("source"), col("n_tok"),
      alpha = 0.0, budget = 1.0).select("p_mix").as[Double].collect()
    w.foreach(p => assertNear(p, 1.0 / 3.0))
  }

  test("reservoirPerGroup: exactly min(k, group size) rows per group, drawn from the group") {
    val r = Mixing.reservoirPerGroup(docs, col("source"), col("doc_id"),
      col("n_tok"), k = 2, salt = 5L)
    val bySrc = r.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc == Map("web" -> 2L, "book" -> 2L, "code" -> 1L))
    // determinism: identical draw on re-evaluation
    val ids1 = r.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Mixing.reservoirPerGroup(docs, col("source"), col("doc_id"),
      col("n_tok"), k = 2, salt = 5L).select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
    // a different salt is a different (valid) draw of the same shape
    val alt = Mixing.reservoirPerGroup(docs, col("source"), col("doc_id"),
      col("n_tok"), k = 2, salt = 6L)
    assert(alt.groupBy("source").count().as[(String, Long)].collect().toMap == bySrc)
  }

  test("packChunks: spans are contiguous, conserve length, and cover every chunk") {
    val p = Mixing.packChunks(docs, col("doc_id"), col("n_tok"), capacity = 16L)
      .orderBy("id")
      .select("id", "n_tok", "cum_end", "chunk_first", "chunk_last", "n_chunks")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val totalTok = docs.agg(sum("n_tok")).head().getLong(0)
    // last doc ends at the corpus length
    assertNear(p.last._3, totalTok.toDouble)
    // chunk spans: doc i+1 starts in the chunk doc i ends in (or the next)
    p.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 == a._5 || b._4 == a._5 + 1,
        s"doc ${b._1} first-chunk ${b._4} discontiguous after ${a._5}")
      case _ => ()
    }
    // every chunk index from 0 to ceil(total/cap)-1 is covered by some span
    val covered = p.flatMap(d => d._4 to d._5).toSet
    assert(covered == (0L until (totalTok + 15) / 16).toSet)
    // n_chunks consistent with span
    p.foreach(d => assert(d._6 == d._5 - d._4 + 1))
  }

  test("packChunks: zero-length docs keep a one-chunk span at their boundary") {
    val z = Seq((1L, 10L), (2L, 0L), (3L, 10L)).toDF("doc_id", "n_tok")
    val p = Mixing.packChunks(z, col("doc_id"), col("n_tok"), capacity = 8L)
      .orderBy("id").select("chunk_first", "chunk_last", "n_chunks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(p(1) == ((1L, 1L, 1L))) // empty doc sits at offset 10 -> chunk 1
    assert(p.forall(_._3 >= 1L))
  }

  test("minhashMatchesAgainst agrees with minhashPairs cross-set slice") {
    val all = docs.select(col("doc_id"), col("text"))
    val batch = all.filter(col("doc_id") % 2 === 0)
    val corpus = all.filter(col("doc_id") % 2 === 1)
    val inc = Dedup.minhashMatchesAgainst(corpus, batch, col("doc_id"),
        col("text"), shingleK = 2, numHashes = 16, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 2 duplicates doc 1 exactly -> must match; others have no near-dup
    assert(inc(2L) >= 1L)
    assert(inc(4L) == 0L && inc(6L) == 0L)
    // cross-check against the all-pairs stream restricted to cross-set pairs
    val pairs = Dedup.minhashPairs(all, col("doc_id"), col("text"),
        shingleK = 2, numHashes = 16, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val crossCount = pairs.count { case (a, b) =>
      (a % 2 == 0) != (b % 2 == 0)
    }
    assert(inc.values.sum == crossCount)
  }
}
