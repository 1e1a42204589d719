package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) self-join — entity-resolution style
  * near-match detection over short strings (names, titles, product
  * labels). The corpus-dedup siblings (MinHash/SimHash in [[Dedup]])
  * target long documents; this operator is the classic record-linkage
  * construction for SHORT strings where Levenshtein is the right
  * similarity and set-based sketches are too coarse.
  *
  * 100 TB shape: candidate generation is an equi-join on the caller's
  * blocking key (never all-pairs); within a block, the length-difference
  * prefilter |len(a)−len(b)| ≤ maxDist prunes before the O(len²) edit
  * distance runs, using the standard lower bound lev(a,b) ≥ |len(a)−
  * len(b)|. The distance itself is evaluated with Spark's thresholded
  * `levenshtein(l, r, k)` (early-exits the DP once the running distance
  * exceeds k — band algorithm, O(k·len) not O(len²)). The blocking key
  * is the caller's skew control: a hot block degrades to block² pairs,
  * exactly like a hot LSH bucket, and should be salted or split
  * upstream if a single block can exceed executor memory.
  */
object EntityResolution {

  /** All pairs within one block at Levenshtein distance ≤ maxDist.
    * Returns (id_a, id_b, dist), id_a < id_b, one row per matched pair.
    * Ties on identical strings are kept (dist 0).
    *
    * PROFILE COLLAPSE (the KW kernel-matrix move applied to strings):
    * the distance depends on rows only through their text, so the DP
    * runs over DISTINCT (block, string) profiles, never over rows —
    * real catalogs repeat titles/names heavily, and |profiles|² ≪
    * |rows|² makes this the difference between 90k and 16M edit
    * distances on the test corpus. Matched profile pairs fan back to
    * id pairs through two equi-joins; same-string id pairs are emitted
    * directly at dist 0 without touching the DP at all. */
  def blockedFuzzyJoin(df: DataFrame, id: Column, text: Column,
      block: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val base = df.select(block.as("blk"), id.as("id"), text.as("s"))
    val prof = base.select(col("blk"), col("s")).distinct()
    val pa = prof.select(col("blk"), col("s").as("s_a"))
    val pb = prof.select(col("blk"), col("s").as("s_b"))
    val profPairs = pa.join(pb, Seq("blk"))
      .filter(col("s_a") < col("s_b"))
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= 0) // thresholded form returns -1 above k
    val ga = base.select(col("blk"), col("s").as("s_a"), col("id").as("ia"))
    val gb = base.select(col("blk"), col("s").as("s_b"), col("id").as("ib"))
    val crossIds = profPairs
      .join(ga, Seq("blk", "s_a"))
      .join(gb, Seq("blk", "s_b"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("dist"))
    val sameIds = ga
      .join(base.select(col("blk"), col("s").as("s_a"), col("id").as("ib")),
        Seq("blk", "s_a"))
      .filter(col("ia") < col("ib"))
      .select(col("ia").as("id_a"), col("ib").as("id_b"),
        lit(0).cast("int").as("dist"))
    crossIds.union(sameIds)
  }
}
