package graft.llm

import graft.core.Rng
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All of these are shuffle-shaped for 100 TB: exact dedup is one
  * hash-groupBy; MinHash-LSH turns the quadratic pair problem into
  * band-bucket joins (candidates only); SimHash buckets by fingerprint
  * bands the same way. Nothing ever materializes an n×n similarity
  * matrix.
  */
object Dedup {

  /** Canonical text normalization shared by the fingerprint/dedup ops:
    * lowercase, collapse whitespace runs, trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Default token hash: xxhash64 — cheapest per token, the production
    * choice. Engine-specific (not reproducible outside Spark). */
  val xxHash: Column => Column = c => xxhash64(c)

  /** Cross-engine-reproducible 60-bit token hash: first 15 hex digits of
    * md5 as a BIGINT. DuckDB computes the identical value as
    * `('0x' || substr(md5(s), 1, 15))::BIGINT`, making the whole
    * MinHash/SimHash signature pipeline oracle-checkable. Nonnegative
    * (60 bits), so `%` and `>>` agree across engines too. */
  val md5Hash60: Column => Column = c =>
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Exact dedup: md5 of normalized text; keeps the smallest id per
    * group. Returns (idCol, hash, dup_count, keep). */
  def exact(df: DataFrame, id: Column, text: Column): DataFrame = {
    val h = md5(normalize(text))
    val w = Window.partitionBy(col("__h")).orderBy(col("__id"))
    df.select(id.as("__id"), h.as("__h"))
      .withColumn("rn", row_number().over(w))
      .withColumn("dup_count", count(lit(1)).over(Window.partitionBy(col("__h"))))
      .select(col("__id").as("id"), col("__h").as("text_hash"),
        col("dup_count"), (col("rn") === 1).as("keep"))
  }

  /** Word k-shingles of the normalized text. */
  def shingles(text: Column, k: Int): Column = {
    val words = split(normalize(text), " ")
    if (k == 1) array_distinct(words)
    else {
      // sliding k-grams via transform over indices
      val n = size(words)
      array_distinct(transform(sequence(lit(0), greatest(n - k, lit(0))),
        i => concat_ws(" ", slice(words, i + 1, lit(k)))))
    }
  }

  /** MinHash signatures for a whole corpus: explode shingles to long
    * form, hash each (shingle, seed) with xxhash64, take per-id minima
    * in ONE codegen'd hash aggregate with `numHashes` min columns.
    *
    * This deliberately avoids `transform(shingles, ...)` repeated per
    * signature slot: higher-order functions are codegen-fallback and the
    * optimizer inlines the (expensive) shingling into every slot —
    * measured 30× slower. Explode + partial-aggregate is also the
    * 100-TB shape: map-side combine collapses each partition to one row
    * per doc before the shuffle. Returns (id, sig ArrayType(Long)). */
  /** The (id, h) shingle-hash stream shared by signature building and
    * exact set verification: k-gram shingles via posexplode + lead
    * windows (codegen'd), hashed and reduced mod the MinHash prime.
    * NOT distinct per doc — min() downstream is idempotent; exact-set
    * consumers dropDuplicates themselves. */
  private[llm] def shingleHashStream(df: DataFrame, id: Column, text: Column,
      shingleK: Int, hasher: Column => Column): DataFrame = {
    val P = 2147483647L
    // shingling + hashing is CPU-bound: spread input rows across cores
    // first (a small-file parquet scan otherwise pins it to one task)
    val spread = df.select(id.as("id"), text.as("__text"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    val words = spread.select(col("id"),
      posexplode(split(normalize(col("__text")), " ")).as(Seq("pos", "w")))
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    val grams =
      if (shingleK == 1) words.select(col("id"), col("w").as("sh"))
      else {
        val parts = col("w") +: (1 until shingleK).map(o =>
          lead(col("w"), o).over(byDoc))
        words.select(col("id"), concat_ws(" ", parts: _*).as("sh"),
            lead(col("w"), shingleK - 1).over(byDoc).isNotNull.as("full"))
          .filter(col("full"))
      }
    grams.select(col("id"), pmod(hasher(col("sh")), lit(P)).as("h"))
  }

  def minhashSignatures(df: DataFrame, id: Column, text: Column,
      shingleK: Int, numHashes: Int,
      hasher: Column => Column = xxHash): DataFrame = {
    // One string hash per shingle, then numHashes cheap integer
    // permutations h_i = (a_i·h + b_i) mod p — the standard MinHash
    // construction; avoids numHashes string hashes per shingle.
    val P = 2147483647L
    val exploded = shingleHashStream(df, id, text, shingleK, hasher)
    val mins = (0 until numHashes).map { i =>
      val a = 1103515245L * (i + 1) % P
      val b = 12345L + 7919L * i
      min((lit(a) * col("h") + lit(b)) % lit(P)).as(s"h$i")
    }
    exploded.groupBy(col("id")).agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** MinHash-LSH near-duplicate pairs: signature → bands → bucket join.
    * @param bands    number of LSH bands (numHashes % bands == 0)
    * @return (id_a, id_b, jaccard_est) candidate pairs (id_a < id_b) with
    *         estimated Jaccard = fraction of matching signature slots.
    */
  def minhashPairs(df: DataFrame, id: Column, text: Column,
      shingleK: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5,
      hasher: Column => Column = xxHash): DataFrame = {
    val rows = numHashes / bands
    val sig = minhashSignatures(df, id, text, shingleK, numHashes, hasher)
      .persist()
    // band key = (band index, the band's signature slice itself) —
    // collision-free and engine-neutral; a short string key costs no
    // more than hashing it in the exchange
    val banded = sig.select(col("id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"), concat_ws(",",
          slice(col("sig"), b * rows + 1, lit(rows))).as("bkey")))).as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.bkey"))
    // candidate pairs shuffle only (id_a, id_b) — signatures rejoin after
    // dedup, keeping the wide arrays out of the pair-dedup exchange
    val a = banded.select(col("band"), col("bkey"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bkey"), col("id").as("id_b"))
    val cand = a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
    cand.withColumn("jaccard_est",
        aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          when(x === y, 1.0).otherwise(0.0)), lit(0.0), _ + _) / numHashes.toDouble)
      .filter(col("jaccard_est") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard_est"))
  }

  /** Incremental near-dup screen: match each `batch` document against
    * `corpus` via the MinHash band join — no batch×batch or
    * corpus×corpus pairs. This is the shape of deduplicating a new
    * crawl increment against an existing corpus WITHOUT re-clustering
    * the corpus: signatures for the (small) increment are computed
    * fresh, the corpus side would be a precomputed signature table at
    * scale, and the band join touches only colliding buckets.
    *
    * Returns one row per batch id: `n_matches` corpus partners with
    * estimated Jaccard ≥ threshold and the best estimate (null when
    * none). Both sides use the identical hash family, so
    * batch-vs-corpus estimates equal the corresponding
    * [[minhashPairs]] estimates over the union.
    */
  def minhashMatchesAgainst(corpus: DataFrame, batch: DataFrame,
      id: Column, text: Column, shingleK: Int, numHashes: Int,
      bands: Int, threshold: Double,
      hasher: Column => Column = xxHash): DataFrame =
    minhashMatchesFromSigs(
      minhashSignatures(corpus, id, text, shingleK, numHashes, hasher),
      minhashSignatures(batch, id, text, shingleK, numHashes, hasher)
        .persist(),
      numHashes, bands, threshold)

  /** [[minhashMatchesAgainst]] on PRECOMPUTED signature tables
    * (id, sig) — the production shape, where the corpus signature
    * index is built once and re-probed by every increment (and both
    * sides of one call may be filtered slices of a single shared
    * signature pass). */
  def minhashMatchesFromSigs(cSig: DataFrame, bSig: DataFrame,
      numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    val rows = numHashes / bands
    def bandKeys(sig: DataFrame, out: String): DataFrame =
      sig.select(col("id").as(out),
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(b.as("band"), concat_ws(",",
            slice(col("sig"), b * rows + 1, lit(rows))).as("bkey")))).as("bk"))
        .select(col(out), col("bk.band"), col("bk.bkey"))
    // pair dedup carries only the two ids; signatures rejoin afterwards
    val cand = bandKeys(bSig, "b_id")
      .join(bandKeys(cSig, "c_id"), Seq("band", "bkey"))
      .select(col("b_id"), col("c_id"))
      .dropDuplicates("b_id", "c_id")
      .join(bSig.select(col("id").as("b_id"), col("sig").as("sig_b")), Seq("b_id"))
      .join(cSig.select(col("id").as("c_id"), col("sig").as("sig_c")), Seq("c_id"))
    val matches = cand.withColumn("jaccard_est",
        aggregate(zip_with(col("sig_b"), col("sig_c"), (x, y) =>
          when(x === y, 1.0).otherwise(0.0)), lit(0.0), _ + _) / numHashes.toDouble)
      .filter(col("jaccard_est") >= threshold)
      .groupBy(col("b_id"))
      .agg(count(lit(1)).as("n_matches"), max(col("jaccard_est")).as("best"))
    bSig.select(col("id"))
      .join(matches, col("id") === col("b_id"), "left")
      .select(col("id"), coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("best"))
  }

  /** Exact word-level n-gram Jaccard similarity over candidate pairs
    * produced by a cheap blocking key — the oracle-checkable exact-math
    * sibling of minhashPairs.
    *
    * Inverted-index formulation: |A∩B| comes from a token-level
    * self-join + pair count and |A∪B| = |A|+|B|−|A∩B|, so the n²-pair
    * stream carries only (id, id, counts) — never the shingle arrays.
    * The array-intersect-per-pair form measured ~10× slower at sf0.1
    * and ships every document's token array into every pair.
    *
    * `threshold > 0` switches to LOSSLESS prefix filtering (Bayardo et
    * al.'s All-Pairs): tokens are globally ordered by ascending
    * per-block document frequency, each document indexes only its
    * n − ⌈t·n⌉ + 1 RAREST tokens, and candidates come from the prefix
    * index join — any pair with J ≥ t has overlap ≥ ⌈t·n⌉ on both
    * sides, so its prefixes must collide. This removes the
    * quadratic-in-df hotspot of the full token self-join (a stopword in
    * every doc of a block generates df² pair rows; in the prefix index
    * the ultra-common tokens sort LAST and mostly fall outside every
    * prefix), which is the 100-TB skew guard. Surviving candidates get
    * their EXACT intersection from the full posting lists, so output ==
    * dense output filtered to jaccard ≥ threshold (property-tested).
    * threshold = 0 keeps the dense all-blocked-pairs semantics. */
  def ngramJaccard(df: DataFrame, id: Column, text: Column, block: Column,
      k: Int = 1, threshold: Double = 0.0): DataFrame = {
    // no persist: the self-join / multi-use sides are identical subplans
    // whose shuffles Spark deduplicates via ReuseExchange
    //
    // Normalization + shingling is regex-heavy and happens BEFORE the
    // first shuffle, so its parallelism is the raw scan's split count —
    // a corpus in one small file would tokenize on one core. Spread the
    // raw text first when the scan is narrower than the cluster; at
    // real scale the input already has >= defaultParallelism splits and
    // this is a no-op (no extra shuffle of the corpus).
    val raw = df.select(id.as("id"), block.as("blk"), text.as("__text"))
    val para = df.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (raw.rdd.getNumPartitions < para) raw.repartition(para) else raw
    val base = spread.select(col("id"), col("blk"),
      shingles(col("__text"), k).as("sh"))
    val sizes = base.select(col("blk"), col("id"), size(col("sh")).as("n"))
    val tok = base.select(col("blk"), col("id"), explode(col("sh")).as("w"))

    if (threshold <= 0.0) {
      // all blocked pairs (zero-overlap pairs included, matching the
      // dense semantics) — id+count only
      val pairs = sizes.select(col("blk"), col("id").as("id_a"), col("n").as("n_a"))
        .join(sizes.select(col("blk"), col("id").as("id_b"), col("n").as("n_b")),
          Seq("blk"))
        .filter(col("id_a") < col("id_b"))
      // |A∩B| per pair from the inverted index — a literal self-join so
      // both sides are the identical subplan and the (blk, w) shuffle is
      // deduplicated by ReuseExchange (distinct projections defeat it)
      val inter = tok.as("ta").join(tok.as("tb"),
          col("ta.blk") === col("tb.blk") && col("ta.w") === col("tb.w") &&
            col("ta.id") < col("tb.id"))
        .groupBy(col("ta.id").as("id_a"), col("tb.id").as("id_b"))
        .agg(count(lit(1)).as("i"))
      pairs.join(inter, Seq("id_a", "id_b"), "left")
        .withColumn("i", coalesce(col("i"), lit(0L)))
        .select(col("id_a"), col("id_b"),
          (col("i").cast("double") / (col("n_a") + col("n_b") - col("i")))
            .as("jaccard"))
    } else {
      // prefix index: rank each doc's tokens by (block df, token) asc
      // and keep rank ≤ n − ⌈t·n⌉ + 1. The ε guards float noise in
      // t·n the SAFE way (a longer prefix only adds candidates).
      // df and the per-doc size come from WINDOWS over the two shuffles
      // the ranking needs anyway — the groupBy+join-back formulation
      // paid two extra shuffle stages for the same values (the query is
      // stage-count-bound, not data-bound, at survey scale; at 100 TB
      // both forms shuffle the token stream the same two ways)
      val byTok = Window.partitionBy(col("blk"), col("w"))
      val byDocOrd = Window.partitionBy(col("blk"), col("id"))
        .orderBy(col("df"), col("w"))
      val byDocAll = Window.partitionBy(col("blk"), col("id"))
      val prefix = tok
        .withColumn("df", count(lit(1)).over(byTok))
        .withColumn("r", row_number().over(byDocOrd))
        .withColumn("n", count(lit(1)).over(byDocAll))
        .filter(col("r") <=
          col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1)
        .select(col("blk"), col("w"), col("id"))
      val cand = prefix.as("pa").join(prefix.as("pb"),
          col("pa.blk") === col("pb.blk") && col("pa.w") === col("pb.w") &&
            col("pa.id") < col("pb.id"))
        .select(col("pa.id").as("id_a"), col("pb.id").as("id_b"))
        .dropDuplicates("id_a", "id_b")
      // exact verification per candidate from the doc-level shingle
      // arrays: with a selective threshold the candidate set is orders
      // of magnitude smaller than the token stream, so two joins
      // against the DOC-sized base + array_intersect beat re-shuffling
      // the full posting lists twice (the dense path's trade-off
      // inverts — there every pair survives, here almost none do)
      // literal self-join aliases (not per-side projections) so both
      // broadcast builds are the identical subplan and ReuseExchange
      // ships the doc arrays once
      //
      // the verify join carries each doc's shingle set into every
      // surviving pair, so element width IS the shuffle: hashing the
      // (already-distinct) tokens to 64-bit longs cuts the pair-stream
      // bytes ~2.5× and replaces string equality with long equality in
      // array_intersect — measured 35% off the verify stage at sf0.1.
      // Set sizes are preserved up to a 64-bit collision within one
      // document (P ≈ |vocab|²/2⁶⁵ — negligible, and a collision could
      // only perturb one pair's intersection count by 1).
      //
      // The arrays are SORTED once per doc so |A∩B| is a codegen'd
      // zero-allocation merge count (SortedIntersectCount) instead of
      // size(array_intersect(...)), which builds a hash set and
      // materializes the intersection array once per candidate pair
      // (d2's sf10 bench: 39.7 → 26.0 s from this swap alone).
      val b = base.select(col("id"),
        array_sort(transform(col("sh"), x => xxhash64(x))).as("sh"))
      val withSh = cand
        .join(b.as("ba"), col("ba.id") === col("id_a"))
        .join(b.as("bb"), col("bb.id") === col("id_b"))
        .select(col("id_a"), col("id_b"),
          graft.functions.VectorExpressions
            .sortedIntersectCount(col("ba.sh"), col("bb.sh")).as("i"),
          size(col("ba.sh")).cast("long").as("n_a"),
          size(col("bb.sh")).cast("long").as("n_b"))
      withSh
        .withColumn("jaccard",
          col("i").cast("double") / (col("n_a") + col("n_b") - col("i")))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }
  }

  /** Directional n-gram containment screen: blocked pairs with
    * max(|A∩B|/|A|, |A∩B|/|B|) ≥ threshold — the subset-duplicate
    * signal symmetric Jaccard misses (a short doc quoted wholesale
    * inside a long one has low Jaccard but containment ≈ 1 on the
    * short side).
    *
    * One-sided prefix filtering: C_max ≥ t ⟹ |A∩B| ≥ t·min(|A|,|B|),
    * so the smaller side's size-based prefix (its n − ⌈t·n⌉ + 1 rarest
    * tokens) must intersect the other side's FULL posting list. Every
    * doc indexes its own prefix; candidates come from prefix ×
    * full-list joins. The skew guard holds one-sidedly: a block-wide
    * stopword has huge df in the full lists but (sorting last by df)
    * almost never enters a prefix, so the join never goes df².
    * Surviving candidates verify exactly on hashed shingle arrays.
    *
    * A doc id may appear under several blocks: fingerprints, candidate
    * pairs and the verify join all key on (blk, id) — token ranks are a
    * bijection only WITHIN a block, so rank spaces never mix — and a
    * pair surviving in more than one block collapses to its best
    * per-block containment (max per direction).
    *
    * `uniqueBlockPerId = true` is a CALLER-ASSERTED precondition that
    * every id occurs under exactly one block (automatic whenever `id`
    * is a key of `df` — `block` is evaluated per row, so a unique id
    * has exactly one block row). Under it the (blk, id) compound keys
    * are provably redundant (blk is a function of id on every joined/
    * deduped stream) and the multi-block pair collapse is the identity,
    * so the screen drops blk from the fingerprint/candidate/verify keys
    * and skips the collapse exchange — one fewer shuffle and narrower
    * keys on all three, identical rows. The DEFAULT stays the safe
    * multi-block path.
    *
    * The two scratch persists (hashed shingle arrays, fingerprints)
    * stay cached until the session's next `clearCache` unless a
    * `release` buffer is passed (same contract as [[duplicatedSpans]]).
    *
    * Returns (id_a, id_b, cmax, c_ab, c_ba), id_a < id_b, where c_ab =
    * |A∩B|/|A| (how much of A sits inside B) and cmax = max(c_ab, c_ba)
    * ≥ threshold.
    */
  def ngramContainment(df: DataFrame, id: Column, text: Column,
      block: Column, k: Int = 1, threshold: Double = 0.9,
      release: Option[scala.collection.mutable.Buffer[DataFrame]] = None,
      uniqueBlockPerId: Boolean = false)
      : DataFrame = {
    require(threshold > 0.0, "containment screen needs a positive threshold")
    val raw = df.select(id.as("id"), block.as("blk"), text.as("__text"))
    // uniqueBlockPerId is caller-asserted and silently result-changing
    // if wrong (dropping blk from the join keys merges rank spaces).
    // Behind the debug flag, verify it with one extra job; never runs
    // in a timed path.
    if (uniqueBlockPerId && graft.core.DebugChecks.enabled) {
      val bad = raw.groupBy(col("id"))
        .agg(countDistinct(col("blk")).as("nb"))
        .filter(col("nb") > 1).limit(1).collect()
      require(bad.isEmpty, "uniqueBlockPerId asserted but id " +
        s"${bad.head.get(0)} occurs under ${bad.head.get(1)} blocks")
    }
    val para = df.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (raw.rdd.getNumPartitions < para) raw.repartition(para) else raw
    // shingles hashed ONCE up front (the exploded posting stream carries
    // 8-byte longs, not shingle strings) and persisted: candidate
    // generation and exact verify both consume this table, and the
    // shingling + hashing pass was the dominant cost when recomputed
    val base = spread.select(col("id"), col("blk"),
      transform(shingles(col("__text"), k), x => xxhash64(x)).as("sh"))
      .persist()
    release.foreach(_ += base)
    // n (the doc's distinct-token count) rides the explode from the
    // persisted arrays — no posting-stream count window needed, and
    // the size-ordered candidate cut below gets it for free
    val tok = base.select(col("blk"), col("id"), explode(col("sh")).as("w"),
      size(col("sh")).as("n"))
    val byDocOrd = Window.partitionBy(col("blk"), col("id"))
      .orderBy(col("df"), col("w"))
    // per-token document frequency via groupBy + join, NOT a window: a
    // window over (blk, w) sorts the whole posting stream and lands every
    // occurrence of a hot token (stopword shingle) in ONE partition — the
    // 100 TB skew hotspot. The hash aggregate has map-side partials and
    // the join is AQE skew-splittable; values are identical.
    val dfCounts = tok.groupBy(col("blk"), col("w"))
      .agg(count(lit(1)).as("df"))
    // per-block NEAR-dense token ranks over the VOCAB table (one row
    // per distinct (blk, token) — never the posting stream). A single
    // per-block window would sort a whole block's vocabulary in one
    // task, so the vocab is split into `RidBuckets` hash buckets and
    // the ids bit-interleaved (rank_in_bucket · B + bucket): ids stay
    // within a skew factor of dense — w is already a hash, so bucket
    // sizes concentrate at V/B — which is all the delta-varint payload
    // needs (average gap ≈ V/n either way). Ranks exist purely to
    // shrink the verify payload: token identity within a block is all
    // the intersect needs, and small ints delta-varint encode to ~1–2
    // bytes where the xxhash64 values took 8. Int ids wrap only past
    // 2³¹ distinct shingles per block, where k must grow anyway.
    val RidBuckets = 1024
    val ridMap = dfCounts
      .withColumn("bkt", pmod(col("w"), lit(RidBuckets.toLong)))
      .withColumn("rid",
        ((row_number().over(Window.partitionBy(col("blk"), col("bkt"))
            .orderBy(col("w"))).cast("long") - 1L) * RidBuckets +
          col("bkt")).cast("int"))
      .drop("bkt")
    val tokR = tok.join(ridMap, Seq("blk", "w"))
    val prefix = tokR
      .withColumn("r", row_number().over(byDocOrd))
      .filter(col("r") <=
        col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1)
      .select(col("blk"), col("w"), col("id"), col("n"))
    // size-ordered candidate cut (r13, lossless): the pigeonhole
    // guarantee is one-sided in doc SIZE — cmax ≥ t ⟹ i ≥ t·n_min ⟹
    // the SMALLER doc's prefix intersects the larger doc's full list.
    // Contrapositive: a pair whose only shared prefix token sits in
    // the LARGER doc's prefix can never reach the threshold. So the
    // join only pairs a prefix with same-or-larger docs: the pre-dedup
    // candidate stream halves (every true pair still arrives via its
    // smaller side) and the guaranteed-false larger-side-only
    // candidates never reach the verify join at all.
    val candNames =
      if (uniqueBlockPerId) Seq("id_a", "id_b") else Seq("blk", "id_a", "id_b")
    val candKeys = Seq(
      col("pa.blk").as("blk"),
      least(col("pa.id"), col("pb.id")).as("id_a"),
      greatest(col("pa.id"), col("pb.id")).as("id_b"))
      .takeRight(candNames.length)
    val cand = prefix.as("pa").join(tok.as("pb"),
        col("pa.blk") === col("pb.blk") && col("pa.w") === col("pb.w") &&
          col("pa.id") =!= col("pb.id") && col("pa.n") <= col("pb.n"))
      .select(candKeys: _*)
      .dropDuplicates(candNames)
    // exact verify on compact set FINGERPRINTS (r13): each doc's token
    // set, as sorted per-block ranks, delta-varint encoded to BINARY —
    // values identical to intersecting the hashed arrays (ranks are a
    // per-block bijection of the hashes), but the candidate-pair ×
    // payload shuffle that made d12 the catalog's only multi-GB
    // spiller (14 GB at sf10, 27.8 at sf20) ships ~1–2 bytes/token
    // instead of 8. The count is a codegen'd zero-allocation merge
    // over the two byte streams (VarintIntersectCount — the same
    // discipline as the earlier SortedIntersectCount swap, which
    // moved the sf10 bench 178.8 → 100.9 s over
    // size(array_intersect)). Prefix choice stays ordering-free-
    // correct (ANY prefix of that size works). n_a/n_b are carried as
    // scalars from the same aggregation.
    // fingerprints are per (blk, id): rids are a bijection of token
    // hashes only within their block, so a doc carried under two blocks
    // gets two fingerprints in two independent rank spaces (never
    // mixed). Under the uniqueBlockPerId precondition blk is a function
    // of id, so the blk key is redundant and dropped.
    val fpKeys = if (uniqueBlockPerId) Seq(col("id")) else
      Seq(col("blk"), col("id"))
    val b = tokR.groupBy(fpKeys: _*).agg(
      graft.functions.VarintSetExpressions
        .encode(array_sort(collect_list(col("rid")))).as("fp"),
      count(lit(1)).as("n"))
      .persist()
    release.foreach(_ += b)
    val cmax = greatest(col("i").cast("double") / col("n_a"),
      col("i").cast("double") / col("n_b"))
    def sameBlk(side: String): Column =
      if (uniqueBlockPerId) lit(true)
      else col(s"$side.blk") === col("c.blk")
    val verified = cand.as("c")
      .join(b.as("ba"), sameBlk("ba") && col("ba.id") === col("c.id_a"))
      .join(b.as("bb"), sameBlk("bb") && col("bb.id") === col("c.id_b"))
      .select(col("c.id_a").as("id_a"), col("c.id_b").as("id_b"),
        graft.functions.VarintSetExpressions
          .intersectCount(col("ba.fp"), col("bb.fp")).as("i"),
        col("ba.n").as("n_a"), col("bb.n").as("n_b"))
      .withColumn("cmax", cmax)
      .filter(col("cmax") >= threshold)
    if (uniqueBlockPerId)
      // one block per id ⇒ one verify row per pair: the multi-block
      // collapse below would be an identity exchange — skip it
      verified.select(col("id_a"), col("id_b"), col("cmax"),
        (col("i").cast("double") / col("n_a")).as("c_ab"),
        (col("i").cast("double") / col("n_b")).as("c_ba"))
    else verified
      // a pair surviving under several blocks collapses to its best
      // per-block containment per direction (single-block ids: identity)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(cmax).as("cmax"),
        max(col("i").cast("double") / col("n_a")).as("c_ab"),
        max(col("i").cast("double") / col("n_b")).as("c_ba"))
  }

  /** 64-bit SimHash per document: explode tokens, hash each ONCE with
    * xxhash64, sign-aggregate every bit in one codegen'd hash aggregate
    * (64 sum columns), then assemble the fingerprint. Same
    * explode-not-HOF rationale as minhashSignatures. Near-dups differ in
    * few bits (Hamming). Returns (id, simhash Long). */
  def simhashes(df: DataFrame, id: Column, text: Column,
      hasher: Column => Column = xxHash): DataFrame = {
    val spread = df.select(id.as("id"), text.as("__text"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    val exploded = spread.select(col("id"),
        explode(split(normalize(col("__text")), " ")).as("w"))
      .select(col("id"), hasher(col("w")).as("h"))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b) % 2 === 0, -1L).otherwise(1L)).as(s"v$b")
    }
    val fp = (0 until 64).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    exploded.groupBy(col("id")).agg(votes.head, votes.tail: _*)
      .select(col("id"), fp.as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs via a banded-Hamming candidate join:
    * split the 64-bit fingerprint into `bands` equal bit-bands; by the
    * pigeonhole principle any pair within Hamming distance < bands
    * shares at least one exact band, so candidates come from `bands`
    * equi-joins on (band, bits) — never an all-pairs product. Pairs at
    * distance ≥ bands may be missed (standard LSH recall trade-off;
    * raise `bands` for a larger radius). Returns (id_a, id_b, hamming)
    * with hamming <= maxHamming. */
  def simhashPairs(df: DataFrame, id: Column, text: Column,
      bands: Int = 4, maxHamming: Int = 3,
      hasher: Column => Column = xxHash): DataFrame = {
    require(64 % bands == 0, s"bands=$bands must divide 64")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val fp = simhashes(df, id, text, hasher).persist()
    val banded = fp.select(col("id"), col("simhash"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * width)
            .bitwiseAND(lit(mask)).as("bits"))): _*)).as("bk"))
      .select(col("id"), col("simhash"), col("bk.band"), col("bk.bits"))
    val a = banded.select(col("band"), col("bits"),
      col("id").as("id_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band"), col("bits"),
      col("id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band", "bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Connected components over an undirected edge list — the cluster
    * step of a dedup pipeline (LSH candidate pairs → duplicate GROUPS →
    * one survivor per group). Returns (id, cluster) for every vertex
    * that appears in an edge, where `cluster` is the component's
    * minimum id; vertices in no edge are their own singleton (callers
    * left-join and coalesce).
    *
    * Algorithm: the alternating LARGE-STAR / SMALL-STAR method (the
    * published MapReduce/Spark CC construction — Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14). Edges
    * are kept as (child > parent) pointers:
    *   large-star — every node links its LARGER neighbors to the
    *     minimum of its closed neighborhood;
    *   small-star — every node re-links its (all smaller) parents and
    *     itself to the minimum parent.
    * Both are one groupBy + one equi-join over the current edge set;
    * the pair converges in O(log² n) rounds to per-component stars
    * rooted at the component minimum. No driver-side graph, no
    * all-pairs product, and long chains collapse geometrically (a flat
    * min-propagation or naive contraction needs O(diameter) rounds —
    * a 100-TB no-go for stringy near-dup chains).
    *
    * `maxIter = 0` runs to convergence (edge set stable); a positive
    * bound pins the round count for replay-style oracles.
    *
    * Endgame: once the (geometrically shrinking) edge set fits under
    * `localCutoff`, the remaining graph is solved in one driver-side
    * union-find pass instead of more distributed rounds — each round
    * costs ~5 scheduled stages, which dominates wall-clock long after
    * the data stopped mattering. 1M edges ≈ 16 MB on the driver; the
    * contraction rounds above the cutoff keep the guarantee that we
    * only ever collect a bounded set. `localCutoff = 0` disables the
    * endgame (pure distributed, used by the pinned-round tests). */
  def connectedComponents(pairs: DataFrame, idA: Column, idB: Column,
      maxIter: Int = 0, localCutoff: Long = 1L << 20): DataFrame = {
    val e0 = pairs.select(idA.cast("long").as("c"), idB.cast("long").as("p"))
    // each round's frame is persisted AND plan-flattened: the loop
    // re-derives `edges` several times per round, so without the leaf
    // view the logical plan nests ~4× per round — exponential analysis
    // cost (and an OOM building plan strings) long before any data cost
    def pin(df: DataFrame): (DataFrame, DataFrame) = {
      val cached = df.persist()
      (cached, org.apache.spark.sql.GraftSqlBridge.flattenPlan(cached))
    }
    var (edgesCache, edges) = pin(e0.filter(col("c") =!= col("p"))
      .select(greatest(col("c"), col("p")).as("c"),
        least(col("c"), col("p")).as("p"))
      .dropDuplicates("c", "p"))
    var edgeCount = edges.count()
    var iter = 0
    var done = edgeCount == 0
    while (!done && (maxIter == 0 || iter < maxIter) &&
        (localCutoff == 0 || edgeCount > localCutoff)) {
      // large-star: m(x) = min over {x} ∪ Γ(x); link n > x to m(x)
      val sym = edges.select(col("c").as("x"), col("p").as("n"))
        .union(edges.select(col("p").as("x"), col("c").as("n")))
      val mClosed = sym.groupBy(col("x"))
        .agg(least(min(col("n")), first(col("x"))).as("m"))
      val (lsCache, ls) = pin(sym.join(mClosed, Seq("x"))
        .filter(col("n") > col("x") && col("n") =!= col("m"))
        .select(col("n").as("c"), col("m").as("p"))
        .dropDuplicates("c", "p"))
      ls.count()
      // small-star: parents of c are all < c; re-link them (and c) to
      // the minimum parent
      val mSmall = ls.groupBy(col("c")).agg(min(col("p")).as("m"))
      val (nextCache, next) = pin(ls.join(mSmall, Seq("c"))
        .filter(col("p") =!= col("m"))
        .select(col("p").as("c"), col("m").as("p"))
        .union(mSmall.select(col("c"), col("m").as("p")))
        .dropDuplicates("c", "p"))
      val nextCount = next.count()
      done = nextCount == edgeCount && next.except(edges).isEmpty
      edgesCache.unpersist(blocking = false)
      lsCache.unpersist(blocking = false)
      edgesCache = nextCache
      edges = next
      edgeCount = nextCount
      iter += 1
    }
    if (!done && localCutoff > 0 && edgeCount <= localCutoff) {
      // endgame: bounded residual graph → one union-find pass with
      // min-id roots (path-compressed), parallelized back out
      val spark = pairs.sparkSession
      val local = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      edgesCache.unpersist(blocking = false)
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(v: Long): Long = {
        var root = v
        while (parent.getOrElse(root, root) != root)
          root = parent.getOrElse(root, root)
        var cur = v
        while (cur != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
        root
      }
      local.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val labels = local.iterator.flatMap { case (a, b) => Iterator(a, b) }
        .toSet.toSeq.map((v: Long) => (v, find(v)))
      import spark.implicits._
      return labels.toDF("id", "cluster")
    }
    // converged: edges are (vertex, componentMin) stars; roots map to
    // themselves. min() instead of dropDuplicates: on a non-converged
    // exit (positive maxIter, localCutoff = 0) the edge set need not be
    // a star, so a vertex can appear as both child and parent —
    // arbitrary-row dedup would pick a nondeterministic label; the min
    // is deterministic and identical to the star labels once converged.
    edges.select(col("c").as("id"), col("p").as("cluster"))
      .union(edges.select(col("p").as("id"), col("p").as("cluster")))
      .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
  }

  /** Cross-document repeated-passage detection: word n-gram shingles
    * that occur in [minDocs, maxDocs] distinct documents, returned as
    * one row per (id, passage hash, document spread). This is exact
    * substring-level dedup — the signal MinHash's whole-document
    * similarity misses when two long documents share only a paragraph.
    *
    * 100 TB shape: distinct (doc, gram-hash) pairs → one hash groupBy
    * per gram → equi-join back. `maxDocs` is the skew guard: a
    * boilerplate gram present in a huge fraction of the corpus would
    * make its hash a shuffle hot key and a quadratic join-back while
    * carrying no dedup signal (the d2 prefix-filter discipline); it is
    * capped out BEFORE the join. */
  def repeatedPassages(df: DataFrame, id: Column, text: Column, n: Int,
      minDocs: Int = 2, maxDocs: Int = Int.MaxValue,
      hasher: Column => Column = xxHash): DataFrame = {
    // gram construction via posexplode + lead windows (codegen'd), not
    // the transform/slice higher-order form — and persisted, because
    // the gram stream feeds BOTH the frequency aggregate and the
    // join-back (recomputing the shingling was ~2x the query cost)
    val spread = df.select(id.as("id"), text.as("__text"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    val words = spread.select(col("id"),
      posexplode(split(normalize(col("__text")), " ")).as(Seq("pos", "w")))
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    val parts = col("w") +: (1 until n).map(o => lead(col("w"), o).over(byDoc))
    val nWords = count(lit(1)).over(Window.partitionBy(col("id")))
    // full n-grams; a doc shorter than n words keeps its pos-0 row,
    // where concat_ws drops the null leads -> one whole-text gram
    val grams = words
      .select(col("id"), concat_ws(" ", parts: _*).as("__g"),
        (lead(col("w"), n - 1).over(byDoc).isNotNull ||
          (col("pos") === 0 && nWords < n)).as("__keep"))
      .filter(col("__keep"))
      .select(col("id"), hasher(col("__g")).as("h"))
      .dropDuplicates("id", "h")
      .persist()
    val hot = grams.groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs && col("n_docs") <= maxDocs)
    grams.join(hot, Seq("h"))
  }

  /** Maximal duplicated-span extraction (the exact-substring dedup
    * signal of Lee et al. 2022): positions of n-grams repeated across
    * documents, merged into maximal runs per document with the
    * gaps-and-islands trick (pos − row_number is constant on a run).
    * A run of m consecutive duplicated n-gram starts covers m+n−1
    * tokens. Only full n-grams participate (docs shorter than n words
    * emit nothing). The per-doc island window partitions on the doc
    * id — parallel across documents at any scale; the df filter caps
    * boilerplate grams exactly as [[repeatedPassages]].
    *
    * The gram stream is persisted (it feeds both the df filter and the
    * join-back); pass `release` to unpersist it after your action —
    * with no buffer it stays cached until the session's next
    * `clearCache` (the Verify/Bench harnesses clear between queries).
    *
    * Returns (id, span_start, span_tokens) — one row per maximal
    * duplicated span. */
  def duplicatedSpans(df: DataFrame, id: Column, text: Column, n: Int,
      minDocs: Int = 2, maxDocs: Int = Int.MaxValue,
      hasher: Column => Column = xxHash,
      release: Option[scala.collection.mutable.Buffer[DataFrame]] = None)
      : DataFrame = {
    val spread = df.select(id.as("id"), text.as("__text"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    val words = spread.select(col("id"),
      posexplode(split(normalize(col("__text")), " ")).as(Seq("pos", "w")))
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    val parts = col("w") +: (1 until n).map(o => lead(col("w"), o).over(byDoc))
    val grams = words
      .select(col("id"), col("pos"), concat_ws(" ", parts: _*).as("__g"),
        lead(col("w"), n - 1).over(byDoc).isNotNull.as("__full"))
      .filter(col("__full"))
      .select(col("id"), col("pos"), hasher(col("__g")).as("h"))
      .persist()
    release.foreach(_ += grams)
    val hot = grams.select(col("id"), col("h")).dropDuplicates("id", "h")
      .groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs && col("n_docs") <= maxDocs)
      .select(col("h"))
    val dup = grams.join(hot, Seq("h"))
      .select(col("id"), col("pos")).dropDuplicates("id", "pos")
    val isl = dup.withColumn("__grp",
      col("pos") - row_number().over(byDoc))
    isl.groupBy(col("id"), col("__grp"))
      .agg(min(col("pos")).as("span_start"),
        (count(lit(1)) + (n - 1)).as("span_tokens"))
      .select(col("id"), col("span_start"), col("span_tokens"))
  }

  /** LSH quality evaluation: how good are [[minhashPairs]] candidates
    * against EXACT shingle-set Jaccard? Precision is exact-verified on
    * a BOUNDED deterministic subset of candidate pairs (`maxScore`
    * keyed-RNG draws — at 100 TB the candidate set scales with the
    * corpus, so an uncapped exact-verify arm would dwarf the dedup it
    * evaluates); the scored count and fraction are REPORTED in the
    * output row (`n_cand_scored`, `frac_scored`) so a capped run can
    * never masquerade as full coverage. Recall is estimated on a
    * fixed-size deterministic document sample (top-`sampleSize` by the
    * keyed RNG), keeping the ground-truth pair set bounded
    * (sampleSize² pairs) at any corpus size. Exact intersections run
    * as equi-joins on the hashed shingle stream — no per-pair array
    * materialization.
    *
    * The one-row summary is materialized EAGERLY so the scratch
    * persists (shingle stream, candidate pairs) are released before
    * returning — no cached blocks outlive the call.
    *
    * Returns one row: (n_cand, n_cand_scored, frac_scored, n_tp,
    * precision, n_truth, n_hit, recall). */
  def lshEvaluation(df: DataFrame, id: Column, text: Column,
      shingleK: Int, numHashes: Int, bands: Int, threshold: Double,
      hasher: Column => Column = xxHash,
      sampleSize: Int = 64, sampleSalt: Long = 99L,
      maxScore: Int = 20000, scoreSalt: Long = 77L): DataFrame = {
    val spark = df.sparkSession
    val hh = shingleHashStream(df, id, text, shingleK, hasher)
      .dropDuplicates("id", "h").persist()
    val sz = hh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    def trueJaccard(pairs: DataFrame): DataFrame = {
      val inter = pairs
        .join(hh.select(col("id").as("id_a"), col("h")), Seq("id_a"))
        .join(hh.select(col("id").as("id_b"), col("h")), Seq("id_b", "h"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
      pairs
        .join(inter, Seq("id_a", "id_b"), "left")
        .join(sz.select(col("id").as("id_a"), col("sz").as("sza")), Seq("id_a"))
        .join(sz.select(col("id").as("id_b"), col("sz").as("szb")), Seq("id_b"))
        .withColumn("j_true",
          coalesce(col("inter"), lit(0L)).cast("double") /
            (col("sza") + col("szb") - coalesce(col("inter"), lit(0L))))
    }
    val cands = minhashPairs(df, id, text, shingleK, numHashes, bands,
        threshold, hasher)
      .select(col("id_a"), col("id_b")).persist()
    // bounded precision arm: a deterministic keyed-RNG top-`maxScore`
    // draw of candidate pairs (TakeOrdered — no single-task sort)
    val scored = cands
      .withColumn("__u", graft.core.Rng.uniform(
        col("id_a") * 1000003L + col("id_b"), scoreSalt))
      .orderBy(col("__u"), col("id_a"), col("id_b")).limit(maxScore)
      .select(col("id_a"), col("id_b"))
    val nCand = cands.groupBy().agg(count(lit(1)).as("n_cand"))
    val prec = trueJaccard(scored).agg(
      count(lit(1)).as("n_cand_scored"),
      coalesce(sum(when(col("j_true") >= threshold, 1L).otherwise(0L)),
        lit(0L)).as("n_tp"))
      .crossJoin(broadcast(nCand))
    val sampled = hh.select(col("id")).distinct()
      .withColumn("__u", graft.core.Rng.uniform(col("id"), sampleSalt))
      .orderBy(col("__u"), col("id")).limit(sampleSize)
      .select(col("id"))
    val sp = sampled.select(col("id").as("id_a"))
      .crossJoin(broadcast(sampled.select(col("id").as("id_b"))))
      .filter(col("id_a") < col("id_b"))
    val struth = trueJaccard(sp).filter(col("j_true") >= threshold)
      .select(col("id_a"), col("id_b"))
    val rec = struth.join(cands.withColumn("__hit", lit(1)),
        Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_truth"),
        coalesce(sum(coalesce(col("__hit"), lit(0))).cast("long"), lit(0L))
          .as("n_hit"))
    val out = prec.crossJoin(broadcast(rec)).select(
      col("n_cand"), col("n_cand_scored"),
      round(when(col("n_cand") > 0,
        col("n_cand_scored").cast("double") / col("n_cand"))
        .otherwise(1.0), 6).as("frac_scored"),
      col("n_tp"),
      round(when(col("n_cand_scored") > 0,
        col("n_tp").cast("double") / col("n_cand_scored")).otherwise(0.0), 6)
        .as("precision"),
      col("n_truth"), col("n_hit"),
      round(when(col("n_truth") > 0,
        col("n_hit").cast("double") / col("n_truth")).otherwise(0.0), 6)
        .as("recall"))
    // single summary row: collect it now so the scratch persists can be
    // dropped before returning (the caller's action replays nothing)
    val row = out.collect()
    hh.unpersist(blocking = false)
    cands.unpersist(blocking = false)
    spark.createDataFrame(
      spark.sparkContext.parallelize(row.toIndexedSeq, 1), out.schema)
  }

  /** Embedding-cosine near-duplicate pairs within a blocking key.
    * Exact and quadratic in the block size — use for bounded blocks
    * or bounded batches ([[embeddingNearDupBatch]]); whole-corpus
    * semantic pruning belongs to the LSH-bucketed paths. */
  def embeddingNearDup(df: DataFrame, id: Column, vec: Column, block: Column,
      minCos: Double): DataFrame = {
    val base = df.select(id.as("id"), block.as("blk"),
      vec.cast("array<double>").as("v"))
    val a = base.select(col("blk"), col("id").as("id_a"), col("v").as("v_a"))
    val b = base.select(col("blk"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Batch-vs-corpus variant of [[embeddingNearDup]]: every `batch`
    * vector is exact-screened against the strictly-later corpus
    * vectors sharing its block — the per-ingestion admission check,
    * linear in the corpus for a fixed batch (the broadcast side is
    * the batch). Pairs internal to the batch appear once (id_a <
    * id_b). */
  def embeddingNearDupBatch(batch: DataFrame, corpus: DataFrame,
      id: Column, vec: Column, block: Column, minCos: Double): DataFrame = {
    val a = batch.select(block.as("blk"), id.as("id_a"),
      vec.cast("array<double>").as("v_a"))
    val b = corpus.select(block.as("blk"), id.as("id_b"),
      vec.cast("array<double>").as("v_b"))
    b.join(broadcast(a), Seq("blk")).filter(col("id_b") > col("id_a"))
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
