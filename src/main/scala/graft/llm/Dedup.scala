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
  def minhashSignatures(df: DataFrame, id: Column, text: Column,
      shingleK: Int, numHashes: Int): DataFrame = {
    // One string hash per shingle, then numHashes cheap integer
    // permutations h_i = (a_i·h + b_i) mod p — the standard MinHash
    // construction; avoids numHashes string hashes per shingle.
    val P = 2147483647L
    // shingling + hashing is CPU-bound: spread input rows across cores
    // first (a small-file parquet scan otherwise pins it to one task),
    // then build k-grams with posexplode + lead windows — fully
    // codegen'd, unlike the transform/slice higher-order formulation
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
    // no per-doc distinct needed: min() is idempotent over duplicates
    val exploded = grams
      .select(col("id"), pmod(xxhash64(col("sh")), lit(P)).as("h"))
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
      threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val sig = minhashSignatures(df, id, text, shingleK, numHashes).persist()
    // band key = (band index, hash of the band's signature slice)
    val banded = sig.select(col("id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"), xxhash64(concat_ws(",",
          slice(col("sig"), b * rows + 1, lit(rows))), b).as("bkey")))).as("bk"))
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

  /** Exact word-level n-gram Jaccard similarity over candidate pairs
    * produced by a cheap blocking key — the oracle-checkable exact-math
    * sibling of minhashPairs. */
  def ngramJaccard(df: DataFrame, id: Column, text: Column, block: Column,
      k: Int = 1): DataFrame = {
    val base = df.select(id.as("id"), block.as("blk"),
      shingles(text, k).as("sh"))
    val a = base.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = base.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }

  /** 64-bit SimHash per document: explode tokens, hash each ONCE with
    * xxhash64, sign-aggregate every bit in one codegen'd hash aggregate
    * (64 sum columns), then assemble the fingerprint. Same
    * explode-not-HOF rationale as minhashSignatures. Near-dups differ in
    * few bits (Hamming). Returns (id, simhash Long). */
  def simhashes(df: DataFrame, id: Column, text: Column): DataFrame = {
    val spread = df.select(id.as("id"), text.as("__text"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    val exploded = spread.select(col("id"),
        explode(split(normalize(col("__text")), " ")).as("w"))
      .select(col("id"), xxhash64(col("w")).as("h"))
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

  /** Embedding-cosine near-duplicate pairs within a blocking key. */
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
}
