package graft

import graft.llm.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class LlmSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
    (3L, "completely different content about spark query engines and data pipelines"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (5L, "unrelated text mentioning neither foxes nor dogs just numbers one two three")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps smallest id") {
    val r = Dedup.exact(docs, col("doc_id"), col("text"))
      .orderBy("id").collect()
    val byId = r.map(x => x.getLong(0) -> (x.getLong(2), x.getBoolean(3))).toMap
    assert(byId(1L) == (2L, true))   // doc 1 & 4 identical; 1 kept
    assert(byId(4L) == (2L, false))
    assert(byId(2L) == (1L, true))
    assert(byId(3L) == (1L, true))
  }

  test("MinHash-LSH finds the near-duplicate pair, not the unrelated ones") {
    val pairs = Dedup.minhashPairs(docs, col("doc_id"), col("text"),
        shingleK = 2, numHashes = 32, bands = 16, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)), s"exact dup must be found: $pairs")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)),
      s"near dup (1,2) should be found: $pairs")
    assert(!pairs.contains((3L, 5L)), "unrelated docs must not pair")
  }

  test("MinHash Jaccard estimate tracks exact Jaccard") {
    val exact = Dedup.ngramJaccard(docs, col("doc_id"), col("text"), lit(1), k = 1)
      .filter(col("id_a") === 1 && col("id_b") === 2)
      .head().getDouble(2)
    val est = Dedup.minhashPairs(docs, col("doc_id"), col("text"),
        shingleK = 1, numHashes = 64, bands = 32, threshold = 0.0)
      .filter(col("id_a") === 1 && col("id_b") === 2)
      .head().getDouble(2)
    assert(math.abs(est - exact) < 0.25, s"est=$est exact=$exact")
  }

  test("prefix-filtered Jaccard equals dense Jaccard filtered at t") {
    // random-ish corpus with heavy shared stopwords, several blocks
    val vocab = Vector("the", "a", "of", "and", "to", "fox", "dog", "river",
      "spark", "query", "engine", "data", "pipe", "bank", "tree", "stone")
    val rnd = new scala.util.Random(42)
    val corpus = (0 until 60).map { i =>
      val n = 4 + rnd.nextInt(10)
      val words = Seq("the", "of") ++ (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
      (i.toLong, (i % 3).toString, words.mkString(" "))
    }.toDF("doc_id", "blk", "text")
    for (t <- Seq(0.2, 0.4, 0.7)) {
      val dense = Dedup.ngramJaccard(corpus, col("doc_id"), col("text"),
          col("blk"), k = 1)
        .filter(col("jaccard") >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pref = Dedup.ngramJaccard(corpus, col("doc_id"), col("text"),
          col("blk"), k = 1, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pref == dense, s"t=$t: prefix=${pref.size} dense=${dense.size}\n" +
        s"missing=${dense -- pref}\nextra=${pref -- dense}")
    }
  }

  test("prefix filtering defuses an every-doc stopword hotspot") {
    // one block, one token present in EVERY doc: the dense token join
    // would generate df² = n² rows for it; the prefix index must not.
    val n = 200
    val corpus = (0 until n).map { i =>
      (i.toLong, s"common shared$i extra${i % 7} tail${i % 11}")
    }.toDF("doc_id", "text")
    val res = Dedup.ngramJaccard(corpus, col("doc_id"), col("text"),
      lit(1), k = 1, threshold = 0.5)
    // J(A,B) for distinct docs ≤ 3/5 only when both rare tokens align;
    // brute-force check of correctness at the hotspot
    val dense = Dedup.ngramJaccard(corpus, col("doc_id"), col("text"),
        lit(1), k = 1).filter(col("jaccard") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = res.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == dense, s"got=${got.size} want=${dense.size}")
    // and the candidate generator stayed sub-quadratic: the "common"
    // token (df = n) sorts last in every doc's frequency-ranked token
    // list, so no prefix (length 3 of 5 at t=0.5) contains it
    assert(got.size < n * (n - 1) / 4)
  }

  test("SimHash: identical docs distance 0; near-dups close; unrelated far") {
    val sh = Dedup.simhashes(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(4L)) == 0)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)),
      "near-dup should be closer than unrelated")
  }

  test("brute-force top-k: self-similarity 1, ordering correct") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)), (4L, Array(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, col("vec_id"), col("embedding"),
      Array(1.0, 0.0, 0.0), k = 3).collect()
    assert(top(0).getLong(0) == 1L && math.abs(top(0).getDouble(1) - 1.0) < 1e-12)
    assert(top(1).getLong(0) == 2L)
    assert(top(2).getLong(0) == 3L)
  }

  test("bucketed ANN recalls same-bucket exact matches") {
    val emb = (0 until 100).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 0.7 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val res = Similarity.bucketedTopK(emb, col("vec_id"), col("embedding"),
      emb.filter(col("vec_id") < 5), col("vec_id"), col("embedding"),
      planes = 2, k = 3)
    // every query's top hit is itself (cos = 1)
    val tops = res.filter(col("rn") === 1).collect()
    tops.foreach { r =>
      assert(r.getLong(1) == r.getLong(0), "rank-1 should be the query itself")
      assertNear(r.getDouble(2), 1.0, 1e-9)
    }
  }

  test("IVF: kmeans is deterministic, top-1 is self, recall tracks brute force") {
    // three well-separated gaussian-ish clusters
    val emb = (0 until 120).map { i =>
      val c = i % 3
      (i.toLong, Array.tabulate(8)(j =>
        (c * 3.0 + 0.1 * math.sin(i * 1.7 + j) + (if (j == c) 1.0 else 0.0)).toFloat))
    }.toDF("vec_id", "embedding")
    val c1 = Similarity.kmeansFit(emb, col("vec_id"), col("embedding"),
      k = 3, iters = 4)
    val c2 = Similarity.kmeansFit(emb, col("vec_id"), col("embedding"),
      k = 3, iters = 4)
    // bit-deterministic across runs (quantized-BIGINT means)
    assert(c1.flatten.toSeq == c2.flatten.toSeq)

    val queries = emb.filter(col("vec_id") % 17 === 0)
    val ivf = Similarity.ivfTopK(emb, col("vec_id"), col("embedding"),
      queries, col("vec_id"), col("embedding"), c1, nProbe = 1, k = 5)
    // the query vector itself lives in the probed cell → rank 1, cos 1
    ivf.filter(col("rn") === 1).collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(0))
      assertNear(r.getDouble(2), 1.0, 1e-9)
    }
    // on clustered data with nProbe=1, IVF top-5 == brute-force top-5
    val qIds = queries.select(col("vec_id")).collect().map(_.getLong(0))
    qIds.foreach { qid =>
      val qv = emb.filter(col("vec_id") === qid)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0).toArray
      val bf = Similarity.bruteForceTopK(emb, col("vec_id"), col("embedding"),
        qv, k = 5).collect().map(_.getLong(0)).toSet
      val iv = ivf.filter(col("q_id") === qid).collect()
        .map(_.getLong(1)).toSet
      assert((bf & iv).size >= 4,
        s"recall@5 too low for query $qid: brute=$bf ivf=$iv")
    }
  }

  test("delta-varint fingerprints: intersectCount == size(array_intersect), incl. multi-byte varints") {
    // the d12 verify codec (VarintSet): encode sorted distinct int
    // ranks, merge-count the byte streams. Cases cover empty sets,
    // identical sets, singletons, gaps needing 1..5-byte LEB128
    // (ranks up to Int.MaxValue), and random dense-vocab draws (the
    // regime d12 actually runs in).
    val rnd = new scala.util.Random(13)
    val cases = Seq(
      (Seq.empty[Int], Seq.empty[Int]),
      (Seq(0, 1, 2), Seq.empty[Int]),
      (Seq(0), Seq(0)),
      (Seq(0, 127, 128, 16383, 16384, Int.MaxValue),
        Seq(0, 127, 128, 16383, 16384, Int.MaxValue)),
      (Seq(5, 300, 70000, 2000000000), Seq(6, 300, 70001, 1999999999))
    ) ++ (1 to 25).map { i =>
      // val (not def): identical-pair regime must use the SAME array on
      // both sides; odd cases draw an independent partner instead
      val a = (0 until rnd.nextInt(60))
        .map(_ => rnd.nextInt(500)).distinct.sorted
      val partner = (0 until rnd.nextInt(60))
        .map(_ => rnd.nextInt(500)).distinct.sorted
      a -> (if (i % 2 == 0) a else partner)
    }
    val df = cases.toDF("a", "b")
    val got = df.select(
      graft.functions.VarintSetExpressions.intersectCount(
        graft.functions.VarintSetExpressions.encode(col("a")),
        graft.functions.VarintSetExpressions.encode(col("b"))).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"),
      length(graft.functions.VarintSetExpressions.encode(col("a")))
        .as("bytes"), size(col("a")).as("n"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"varint merge count ${r.getLong(0)} != builtin ${r.getLong(1)}")
      // compactness: dense ranks (< 500) must encode ≤ 2 bytes/token
      if (r.getInt(3) >= 10)
        assert(r.getInt(2) <= 2 * r.getInt(3),
          s"fingerprint ${r.getInt(2)}B for ${r.getInt(3)} dense ranks")
    }
  }

  test("sortedIntersectCount == size(array_intersect) on sorted distinct arrays") {
    // property check vs the built-in, incl. empty / disjoint / identical
    // sets, negatives, and Long extremes
    val rnd = new scala.util.Random(7)
    val cases = Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(1L, 2L, 3L), Seq.empty[Long]),
      (Seq(Long.MinValue, -5L, 0L, 7L, Long.MaxValue),
        Seq(Long.MinValue, -5L, 0L, 7L, Long.MaxValue)),
      (Seq(-3L, 1L, 9L), Seq(-2L, 2L, 10L))
    ) ++ (1 to 20).map { i =>
      val a = (0 until rnd.nextInt(40))
        .map(_ => rnd.nextInt(30).toLong - 15L).distinct.sorted
      val partner = (0 until rnd.nextInt(40))
        .map(_ => rnd.nextInt(30).toLong - 15L).distinct.sorted
      // even cases exercise the exact-duplicate (a == b) regime
      a -> (if (i % 2 == 0) a else partner)
    }
    val df = cases.toDF("a", "b")
    val got = df.select(
      graft.functions.VectorExpressions
        .sortedIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"merge count ${r.getLong(0)} != builtin ${r.getLong(1)}"))
  }

  test("assignCells: broadcast-join path (k > ExprAssignMaxK) matches the expression path bit-for-bit") {
    // 200 vectors, 80 centroids — above Similarity.ExprAssignMaxK (16),
    // so assignCells takes the broadcast-join + argmin-aggregate path.
    // The distance algebra ((v·v) − 2(v·c)) + (c·c) must agree with the
    // nearestCentroid expression exactly (same association order, same
    // tie rule), or the k-means fixed point would drift between small-
    // and large-codebook corpora.
    val emb = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        math.sin(i * 2.3 + j * 0.7).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = (0 until 80).map { c =>
      Array.tabulate(8)(j => math.cos(c * 1.1 + j * 0.9))
    }
    val joined = Similarity.assignCells(emb, col("vec_id"),
        col("embedding"), cents)
      .select(col("id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expr = emb.select(col("vec_id").as("id"),
        Similarity.nearestCentroid(col("embedding").cast("array<double>"),
          cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(joined == expr)
    // and the v column must survive the argmin aggregate unchanged
    val v0 = Similarity.assignCells(emb, col("vec_id"), col("embedding"), cents)
      .filter(col("id") === 7L).select(col("v")).head().getSeq[Double](0)
    val want = emb.filter(col("vec_id") === 7L)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    assert(v0 == want)
  }

  test("IVF: empty clusters keep their previous centroid") {
    // 2 distinct points but k=4 → at least 2 clusters go empty
    val emb = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.0f, 0.0f)),
      (2L, Array(5.0f, 5.0f)), (3L, Array(5.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val c = Similarity.kmeansFit(emb, col("vec_id"), col("embedding"),
      k = 4, iters = 3)
    assert(c.length == 4 && c.forall(_.forall(v => !v.isNaN)))
  }

  test("language-ID picks the language with most marker hits") {
    val d = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze ist ein tier"),
      (3L, "le chat et la maison des amis")
    ).toDF("doc_id", "text")
    val markers = Seq(
      "en" -> Seq("the", "and", "of"),
      "de" -> Seq("der", "und", "die", "ist", "ein"),
      "fr" -> Seq("le", "et", "la", "des"))
    val r = d.select(col("doc_id"),
        TextAnalysis.languageId(col("text"), markers).as("lang"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "en", 2L -> "de", 3L -> "fr"), r.toString)
  }

  test("multimodal: real BMP/WAV/video payloads parse back to closed-form stats") {
    val media = Multimodal.synthesize(docs, col("doc_id"), col("text"), lit("src"))
    assert(media.schema("payload").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    val dec1 = Multimodal.decode(media).orderBy("media_id").collect()
    val dec2 = Multimodal.decode(media).orderBy("media_id").collect()
    assert(dec1.sameElements(dec2), "decode must be deterministic")
    assert(dec1.length == 5)
    val byId = dec1.map(r => r.getLong(0) -> r).toMap
    // id 3 → image, 8+3%8 × 8+3%5 = 11×11; mean replays the pixel formula
    val img = byId(3L)
    assert(img.getString(1) == "image" && img.getInt(2) == 11 && img.getInt(3) == 11)
    val expMean = (for (x <- 0 until 11; y <- 0 until 11)
      yield (3 * 31 + 7 * x + 13 * y) % 256).sum.toDouble / 121
    assertNear(img.getDouble(6), expMean, 1e-9)
    // id 1 → audio, n = 257 samples at 8 kHz
    val aud = byId(1L)
    assert(aud.getString(1) == "audio" && aud.getLong(4) == 257L * 1000 / 8000)
    // id 2 → video, 2 + 2%4 = 4 frames at 40 ms/frame
    val vid = byId(2L)
    assert(vid.getString(1) == "video" && vid.getInt(5) == 4 &&
      vid.getLong(4) == 160L)
    // frame sampling decodes the embedded BMPs (stride 2 → frames 0, 2)
    val fr = Multimodal.sampleFrames(media, stride = 2)
      .orderBy("media_id", "frame_idx").collect()
    assert(fr.map(r => (r.getLong(0), r.getInt(1))).toSeq
      .startsWith(Seq((2L, 0), (2L, 2))), fr.mkString(","))
  }

  test("connected components: cliques, chains, and singletons cluster to min id") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), // clique {1,2,3}
      (5L, 6L), (6L, 7L), (7L, 8L), // chain {5,6,7,8}
      (11L, 10L)                    // reversed pair {10,11}
    ).toDF("id_a", "id_b")
    // run both execution paths: driver union-find endgame (default)
    // and the pure distributed star rounds — they must agree
    for (cutoff <- Seq(1L << 20, 0L)) {
      val cc = Dedup.connectedComponents(pairs, col("id_a"), col("id_b"),
          localCutoff = cutoff)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L, 10L -> 10L, 11L -> 10L),
        s"cutoff=$cutoff: $cc")
    }
  }

  test("connected components: a 40-node path converges (log rounds, not O(n))") {
    val pairs = (1 until 40).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
    // a bound far below the path length proves contraction is
    // geometric: flat min-propagation would need 39 rounds
    val cc = Dedup.connectedComponents(pairs, col("id_a"), col("id_b"),
      maxIter = 12, localCutoff = 0)
    val labels = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 40 && labels.values.forall(_ == 1L),
      s"path did not fully collapse in 8 rounds: ${labels.toSeq.sorted}")
  }

  test("connected components handle duplicate and self edges") {
    val pairs = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 2L), (1L, 2L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, col("id_a"), col("id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L), cc)
  }

  test("PageRank: mass conserved, dangling handled, star center ranks highest") {
    // star: everyone links to 1; 99 is isolated-dangling (only a dst)
    val edges = ((2L to 6L).map(v => (v, 1L, 1.0)) :+ ((1L, 99L, 1.0)))
      .toDF("src", "dst", "w")
    val r = graft.llm.LinkGraph.pageRank(edges, col("src"), col("dst"),
        col("w"), damping = 0.85, iters = 20)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9,
      s"rank mass must be conserved: ${r.values.sum}")
    // 99 absorbs the center's ENTIRE outflow, so it ranks above the
    // center, which ranks far above the five leaves
    assert(r(99L) == r.values.max && r(1L) > 4 * r(2L),
      s"expected 99 > 1 >> leaves: $r")
    assert((2L to 6L).map(r).distinct.size == 1, "leaves must tie exactly")
  }

  test("token counting and fingerprints are stable") {
    val r = docs.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getString(2)))
    assert(r.find(_._1 == 1L).get._2 == 14)
    assert(r.find(_._1 == 1L).get._3 == r.find(_._1 == 4L).get._3,
      "identical docs share fingerprints")
    assert(r.map(_._3).forall(_.length == 16))
  }

  test("repeated passages: shared grams found, maxDocs skew guard excludes boilerplate") {
    // docs 1, 2, 4 share the 12-word prefix → plenty of shared 6-grams;
    // doc 3 and 5 share nothing 6 words long with anyone
    val rp = Dedup.repeatedPassages(docs, col("doc_id"), col("text"), n = 6)
    val byDoc = rp.groupBy(col("id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(1L, 2L, 4L).subsetOf(byDoc.keySet), s"sharers missing: $byDoc")
    assert(!byDoc.contains(3L) && !byDoc.contains(5L),
      s"unique docs must not be flagged: $byDoc")
    // identical docs 1 and 4 flag the same gram set
    assert(byDoc(1L) == byDoc(4L))
    // spread: the prefix grams live in all three docs
    assert(rp.agg(max(col("n_docs"))).head.getLong(0) == 3L)

    // skew guard: capping maxDocs below the spread removes those grams
    val capped = Dedup.repeatedPassages(docs, col("doc_id"), col("text"),
      n = 6, minDocs = 2, maxDocs = 2)
    assert(capped.filter(col("n_docs") > 2).count() == 0L)
    // grams shared by exactly 2 docs (1-2 and 2-4 overlap in the
    // 13-word variants' tails) survive the cap
    assert(capped.count() < rp.count())
  }

  test("ngramContainment finds short-doc-inside-long across length buckets") {
    // doc 11 is wholly quoted inside doc 10 (plus much more): Jaccard is
    // low (~0.2) but containment on the short side is 1.0
    val longText = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      "one two three four five six seven eight nine ten eleven twelve"
    val corpus = Seq(
      (10L, longText, "en"),
      (11L, "one two three four five six seven", "en"),
      (12L, "unrelated words entirely different content here", "en"),
      (13L, longText, "de") // other block: must not pair with 10
    ).toDF("doc_id", "text", "lang")
    val got = graft.llm.Dedup.ngramContainment(corpus, col("doc_id"),
        col("text"), col("lang"), k = 1, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(t => (t._1, t._2)).toSet == Set((10L, 11L)),
      s"expected exactly the (10,11) containment pair, got ${got.toSeq}")
    assert(got.head._3 == 1.0)
    // and the symmetric Jaccard screen at the same threshold misses it
    val jac = graft.llm.Dedup.ngramJaccard(corpus, col("doc_id"),
        col("text"), col("lang"), k = 1, threshold = 0.9)
      .filter(col("id_a") === 10 && col("id_b") === 11).count()
    assert(jac == 0L)
    // the uniqueBlockPerId fast path (narrow keys, no collapse exchange)
    // must be row-identical to the default multi-block path whenever its
    // precondition holds — this corpus has one block per id
    val fast = graft.llm.Dedup.ngramContainment(corpus, col("doc_id"),
        col("text"), col("lang"), k = 1, threshold = 0.9,
        uniqueBlockPerId = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val slow = graft.llm.Dedup.ngramContainment(corpus, col("doc_id"),
        col("text"), col("lang"), k = 1, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(fast == slow, s"fast-path mismatch: $fast vs $slow")
  }

  test("uniqueBlockPerId debug guard trips on a multi-block id") {
    // the fast path is caller-asserted; behind the debug flag a wrong
    // assertion must fail loudly instead of silently changing results
    val multi = Seq(
      (1L, "alpha beta gamma", "en"),
      (1L, "alpha beta gamma", "de"), // same id, second block
      (2L, "unrelated words here", "en")
    ).toDF("doc_id", "text", "lang")
    sys.props("graft.check.preconditions") = "1"
    try {
      val ex = intercept[IllegalArgumentException] {
        graft.llm.Dedup.ngramContainment(multi, col("doc_id"), col("text"),
          col("lang"), k = 1, threshold = 0.9, uniqueBlockPerId = true)
      }
      assert(ex.getMessage.contains("uniqueBlockPerId"))
      // a corpus that satisfies the precondition passes under the flag
      val ok = Seq((1L, "alpha beta gamma", "en"),
        (2L, "alpha beta gamma", "en")).toDF("doc_id", "text", "lang")
      graft.llm.Dedup.ngramContainment(ok, col("doc_id"), col("text"),
        col("lang"), k = 1, threshold = 0.9, uniqueBlockPerId = true)
        .collect()
    } finally sys.props.remove("graft.check.preconditions")
  }

  test("triangleCounts: K4 closed form; stars and paths have none") {
    // complete graph on 4 vertices: C(4,3)=4 triangles, each vertex in 3
    val k4 = (for (a <- 1 to 4; b <- 1 to 4 if a < b) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val tri = graft.llm.LinkGraph.triangleCounts(k4, col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(tri == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // a star has wedges but no closures; duplicate/reversed edges and
    // self-loops must not fabricate any
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (0L, 1L), (2L, 2L))
      .toDF("a", "b")
    assert(graft.llm.LinkGraph.triangleCounts(star, col("a"), col("b"))
      .count() == 0L)
  }

  test("bigram LM: closed-form add-one scores on a 3-doc corpus") {
    // corpus: "a b a b" | "a b" | "c c"  → bigram counts:
    //   (a b)=3, (b a)=1, (c c)=1; prefix counts: a·=3, b·=1, c·=1
    // vocab V=3 (a, b, c)
    val corpus = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c c"))
      .toDF("doc_id", "text")
    val got = graft.llm.LanguageModel
      .bigramLmScores(corpus, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def lp(n2: Long, n1: Long): Double = {
      val t = math.log(n2.toDouble + 1.0) - math.log(n1.toDouble + 3.0)
      math.floor(t * 1e7 + 0.5) / 1e7
    }
    val ab = lp(3, 3); val ba = lp(1, 1); val cc = lp(1, 1)
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - (ab + ba + ab) / 3.0) < 1e-9)
    assert(got(2L) == ((1L, ab)))
    assert(got(3L) == ((1L, cc)))
    // the common bigram scores higher than the rare ones
    assert(got(2L)._2 > got(3L)._2)
  }

  test("semDedup: identical vectors prune to the min id, distinct survive") {
    // 8+ vectors so kmeansFit(k=2) init exists; ids 20/21/22 identical
    // (must co-cluster), everything else mutually far
    def v(x: Double, y: Double) = Array(x, y, 0.0, 0.0)
    val rows = Seq(
      20L -> v(10, 0), 21L -> v(10, 0), 22L -> v(10, 0),
      30L -> v(0, 10), 31L -> v(2, 9), // cos(30,31) ≈ 0.976 < 0.99
      40L -> v(-10, 1), 50L -> v(1, -10))
    val df = rows.map { case (i, a) => (i, a) }.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansFit(df, col("vec_id"), col("embedding"),
      k = 2, iters = 3)
    val got = Similarity.semDedup(df, col("vec_id"), col("embedding"),
        cents, minCos = 0.99)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(4))).toMap
    // the identical triple: 20 kept, 21/22 pruned, each sees 2 neighbors
    assert(got(20L) == ((2L, 1)))
    assert(got(21L) == ((2L, 0)))
    assert(got(22L) == ((2L, 0)))
    // near-but-below-threshold and isolated vectors all survive
    Seq(30L, 31L, 40L, 50L).foreach(id => assert(got(id) == ((0L, 1))))
    // verdict covers every input exactly once
    assert(got.size == rows.size)
  }
}
