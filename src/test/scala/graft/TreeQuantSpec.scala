package graft

import graft.functions.VectorExpressions
import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** The hierarchical coarse quantizer (NearestChild descent +
  * kmeansTreeFit) that keeps corpus-derived cell counts linear-time:
  * equivalence to the flat quantizer where the tree degenerates, the
  * branch law's integer search, and argmin agreement between the
  * codegen'd expression and the literal-expression path.
  */
class TreeQuantSpec extends SparkSpec {
  import spark.implicits._

  private def vecsDf(n: Int, dims: Int) = {
    // deterministic pseudo-vectors: no RNG, reproducible across runs
    (0 until n).map { i =>
      (i.toLong, (0 until dims).map(d =>
        math.sin(i * 0.7 + d * 1.3) + 0.01 * d).toArray.toSeq)
    }.toDF("id", "v")
  }

  test("treeBranches: flat law below 17, smallest b with b^4 >= k above") {
    assert(Similarity.treeBranches(8) == Seq(8, 1, 1, 1))
    assert(Similarity.treeBranches(16) == Seq(16, 1, 1, 1))
    assert(Similarity.treeBranches(17) == Seq(3, 3, 3, 3)) // 2^4 = 16 < 17
    assert(Similarity.treeBranches(81) == Seq(3, 3, 3, 3))
    assert(Similarity.treeBranches(82) == Seq(4, 4, 4, 4))
    assert(Similarity.treeBranches(1562) == Seq(7, 7, 7, 7))
    assert(Similarity.treeBranches(65536) == Seq(16, 16, 16, 16))
    intercept[IllegalArgumentException](Similarity.treeBranches(65537))
  }

  test("NearestChild with one 0-parent level matches nearestCentroid") {
    val df = vecsDf(200, 8)
    val cents = df.orderBy(col("id")).limit(7).collect()
      .map(_.getSeq[Double](1).toArray)
    val viaTree = df.withColumn("cell",
        VectorExpressions.nearestChild(lit(0), col("v"), Array(cents), 7))
      .select(col("id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaFlat = Similarity.assignCells(df, col("id"), col("v"), cents.toSeq)
      .select(col("id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaTree == viaFlat)
  }

  test("degenerate tree (k <= 16) reproduces the flat fixed point exactly") {
    val df = vecsDf(300, 6)
    val fit = df.filter(col("id") % 4 === 0)
    val flatCents = Similarity.kmeansFit(fit, col("id"), col("v"),
      k = 8, iters = 3)
    val flat = Similarity.assignCells(df, col("id"), col("v"),
        flatCents.toSeq)
      .select(col("id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val levels = Similarity.kmeansTreeFit(fit, col("id"), col("v"),
      Similarity.treeBranches(8), iters = 3)
    assert(levels.map(_.branch) == Seq(8, 1, 1, 1))
    // identity levels carry no centroid table
    assert(levels.tail.forall(_.children == null))
    // level-1 centroids equal the flat fit's bit-for-bit
    levels.head.children(0).zip(flatCents).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq)
    }
    val tree = Similarity.assignTree(df, col("id"), col("v"), levels)
      .select(col("id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(tree == flat)
  }

  test("deep tree: every leaf is the true per-level argmin of its own parent chain") {
    val df = vecsDf(400, 5)
    val levels = Similarity.kmeansTreeFit(df, col("id"), col("v"),
      Seq(2, 2, 2, 2), iters = 2)
    assert(levels.map(_.branch) == Seq(2, 2, 2, 2))
    assert(levels(3).children.length == 8) // dense parent table at level 4
    val assigned = Similarity.assignTree(df, col("id"), col("v"), levels)
      .collect()
    assert(assigned.length == 400)
    def d2(v: Seq[Double], c: Array[Double]): Double = {
      var vv = 0.0; var vc = 0.0; var cc = 0.0
      for (i <- v.indices) {
        vv += v(i) * v(i); vc += v(i) * c(i); cc += c(i) * c(i)
      }
      vv - 2.0 * vc + cc
    }
    assigned.foreach { r =>
      val v = r.getSeq[Double](1)
      val leaf = r.getInt(2)
      // replay the descent on the driver and compare
      var cell = 0
      levels.foreach { lv =>
        val ch = lv.children(cell)
        val best = ch.indices.minBy(j => (d2(v, ch(j)), j))
        cell = cell * lv.branch + best
      }
      assert(cell == leaf, s"id ${r.getLong(0)}: leaf $leaf, replay $cell")
    }
  }

  test("ragged levels: phantom cells (p % b >= children.length) never crash the fit") {
    // One far outlier + a tight spread: level 1 (b = 3) inits on ids
    // 0,1,2 and Lloyd leaves the outlier alone in cell 0, so cell 0 has
    // ONE fit member → its level-2 child array has length 1 < b. Level
    // 3 then densely enumerates 9 parents; parents 1 and 2 are phantom
    // (no row can carry them — NearestChild only emits j < length), and
    // parentCentroid must fall back instead of indexing past the ragged
    // array (pre-r13 this threw ArrayIndexOutOfBoundsException).
    val rows = (0L, Seq(100.0, 100.0, 100.0)) +: (1 until 60).map { i =>
      (i.toLong, Seq(math.sin(i * 0.7), math.cos(i * 1.1), i * 0.01))
    }
    val df = rows.toDF("id", "v")
    val levels = Similarity.kmeansTreeFit(df, col("id"), col("v"),
      Seq(3, 3, 3, 3), iters = 2)
    assert(levels.map(_.branch) == Seq(3, 3, 3, 3))
    // the ragged shape actually occurred (else this fixture tests nothing)
    assert(levels.exists(lv => lv.children.exists(_.length < lv.branch)),
      "fixture failed to produce a ragged child array")
    val assigned = Similarity.assignTree(df, col("id"), col("v"), levels)
      .collect()
    assert(assigned.length == rows.length)
    // every leaf matches the driver replay of the ragged descent
    def d2(v: Seq[Double], c: Array[Double]): Double = {
      var vv = 0.0; var vc = 0.0; var cc = 0.0
      for (i <- v.indices) {
        vv += v(i) * v(i); vc += v(i) * c(i); cc += c(i) * c(i)
      }
      vv - 2.0 * vc + cc
    }
    assigned.foreach { r =>
      val v = r.getSeq[Double](1)
      var cell = 0
      levels.foreach { lv =>
        if (lv.branch > 1) {
          val ch = lv.children(cell)
          cell = cell * lv.branch + ch.indices.minBy(j => (d2(v, ch(j)), j))
        }
      }
      assert(cell == r.getInt(2), s"id ${r.getLong(0)}")
    }
  }

  test("live tree (k > 16): kmeansTreeFit -> semDedupTree matches a brute-force replay") {
    // The regime the sf1 oracle replay certifies (branches 3,3,3,3 from
    // treeBranches(27)), CI-guarded at unit scale: fit the tree, run the
    // full semDedupTree operator, and replay EVERYTHING on the driver —
    // descent, in-cell pair cosines (same left-to-right summation as
    // CosineSim), verdict — expecting exact equality.
    val df = vecsDf(500, 6)
    val fit = df.filter(col("id") % 3 === 0)
    val branches = Similarity.treeBranches(27)
    assert(branches == Seq(3, 3, 3, 3))
    val levels = Similarity.kmeansTreeFit(fit, col("id"), col("v"),
      branches, iters = 3)
    val minCos = 0.9
    val got = Similarity.semDedupTree(df, col("id"), col("v"), levels, minCos)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
    // driver replay
    val vecs = df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    def d2(v: Seq[Double], c: Array[Double]): Double = {
      var vv = 0.0; var vc = 0.0; var cc = 0.0
      for (i <- v.indices) {
        vv += v(i) * v(i); vc += v(i) * c(i); cc += c(i) * c(i)
      }
      vv - 2.0 * vc + cc
    }
    def cosRep(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val cellOf = vecs.map { case (id, v) =>
      var cell = 0
      levels.foreach { lv =>
        if (lv.branch > 1) {
          val ch = lv.children(cell)
          cell = cell * lv.branch + ch.indices.minBy(j => (d2(v, ch(j)), j))
        }
      }
      id -> cell
    }.toMap
    // the live regime is actually live: more than 16 occupied cells
    assert(cellOf.values.toSet.size > 16,
      s"fixture occupies only ${cellOf.values.toSet.size} cells")
    val expected = vecs.map { case (id, v) =>
      val nbs = vecs.filter { case (o, w) =>
        o != id && cellOf(o) == cellOf(id) && cosRep(v, w) >= minCos
      }
      val kept = if (nbs.exists(_._1 < id)) 0 else 1
      val best = if (nbs.isEmpty) 0.0 else nbs.map(p => cosRep(v, p._2)).max
      id -> ((cellOf(id), nbs.size.toLong, best, kept))
    }.toMap
    assert(got == expected)
    // the verdict is non-trivial on this fixture: both outcomes occur
    assert(got.values.exists(_._4 == 0) && got.values.exists(_._4 == 1))
  }

  test("semDedupTree == semDedup on the k <= 16 corpus (d13's small-sf regime)") {
    val emb = graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val fit = emb.filter(col("vec_id") % 4 === 0)
    val k = 8
    val flat = Similarity.semDedup(emb, col("vec_id"), col("embedding"),
        Similarity.kmeansFit(fit, col("vec_id"), col("embedding"), k, 3),
        minCos = 0.45)
      .orderBy(col("id")).collect().toSeq
    val tree = Similarity.semDedupTree(emb, col("vec_id"), col("embedding"),
        Similarity.kmeansTreeFit(fit, col("vec_id"), col("embedding"),
          Similarity.treeBranches(k), 3),
        minCos = 0.45)
      .orderBy(col("id")).collect().toSeq
    assert(tree == flat)
  }
}
