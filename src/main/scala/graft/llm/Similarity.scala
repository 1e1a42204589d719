package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over an embedding column (Array[Float]).
  *
  * Brute-force cosine top-k is the exact baseline: one scan, no shuffle
  * until the final top-k (TakeOrderedAndProject). The scale path is
  * LSH-style sign-bucketing on fixed hyperplanes: each vector lands in
  * one bucket; queries search only their bucket (and optionally
  * neighbors), turning O(n) per query into O(n/2^planes) at a small
  * recall cost.
  */
object Similarity {

  /** Cosine via the native codegen'd Catalyst expression (a tight
    * primitive loop inside whole-stage codegen; the zip_with/aggregate
    * HOF formulation is CodegenFallback and measured ~3× slower on the
    * candidate-pair hot path). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine(a, b)

  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  /** Exact brute-force top-k most-similar vectors to the given query
    * vector. Plans as scan → project → TakeOrdered(k): linear, no
    * shuffle of the corpus. */
  def bruteForceTopK(df: DataFrame, id: Column, vec: Column,
      query: Array[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(id.as("id"), cosine(vec.cast("array<double>"), q).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(k)
  }

  /** Exact k-NN JOIN: per-QUERY top-k over the corpus for a whole query
    * SET at once — the batched retrieval shape (RAG candidate fetch,
    * eval-set neighbor audit). The query side must be the small side:
    * it broadcasts, the corpus streams through ONE nested-loop pass
    * (linear in corpus × |queries|, embarrassingly parallel over corpus
    * partitions), and the per-query top-k is a query-partitioned window
    * — no corpus self-shuffle anywhere. For corpus-×-corpus all-pairs
    * use the LSH/IVF/PQ paths instead; a broadcastable query set is the
    * precondition here. */
  def knnJoin(corpus: DataFrame, cId: Column, cVec: Column,
      queries: DataFrame, qId: Column, qVec: Column, k: Int): DataFrame = {
    val c = corpus.select(cId.as("c_id"), cVec.cast("array<double>").as("cv"))
    val q = queries.select(qId.as("q_id"), qVec.cast("array<double>").as("qv"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("c_id"))
    c.crossJoin(broadcast(q))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"), cosine(col("cv"), col("qv")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("c_id"), col("cos"), col("rk"))
  }

  /** Sign-LSH bucket id from `planes` fixed hyperplanes. Deterministic
    * alternating-sign patterns (plane p flips sign every (p+1) dims) so
    * the same bucketing is expressible in plain SQL for the oracle. */
  def signBucket(vec: Column, planes: Int): Column = {
    val v = vec.cast("array<double>")
    val bits = (0 until planes).map { p =>
      val proj = aggregate(zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
        when(floor(i / lit(p + 1)).cast("long") % 2 === 0, x).otherwise(-x)),
        lit(0.0), _ + _)
      when(proj >= 0, lit(1 << p)).otherwise(0)
    }
    bits.reduce(_ + _)
  }

  // ----- IVF (inverted-file) ANN: k-means coarse quantizer + probes ----

  /** Quantization scale for the exact centroid means: per-dimension
    * sums run over FLOOR(x·1e7 + 0.5) as BIGINT, so the mean is
    * independent of row order AND engine (float addition is
    * order-sensitive; a distributed partial aggregate and a single-node
    * replay would drift in the last ulp and flip boundary
    * assignments). 1e-7 resolution is far below any embedding noise
    * floor. */
  private val MeanQ = 1e7

  /** Squared L2 distance to a fixed centroid, written as
    * (v·v − 2·v·c) + c·c with the same association order as the SQL
    * replay (`list_dot_product(v,v) - 2*list_dot_product(v,c) +
    * list_dot_product(c,c)`). */
  private def dist2(v: Column, c: Array[Double]): Column = {
    // centroid vector and its c·c enter as REFERENCED values
    // (functions.Coef), not literals: Lloyd iterations re-plan this
    // expression with fresh centroids, and literal doubles would make
    // every iteration's generated code unique (a fresh Janino compile
    // per iteration — see CoefExpressions). Same doubles, same
    // association order, bit-identical distances.
    val cl = graft.functions.Coef.array(c)
    var cc = 0.0
    var i = 0
    while (i < c.length) { cc += c(i) * c(i); i += 1 }
    dot(v, v) - lit(2.0) * dot(v, cl) + graft.functions.Coef.at(Array(cc), 0)
  }

  /** Index of the nearest centroid (ties → smallest index), as a pure
    * expression: array_min over (dist², cid) structs — no join, no
    * shuffle, codegen-friendly for small k. */
  def nearestCentroid(v: Column, centroids: Seq[Array[Double]]): Column =
    array_min(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(dist2(v, c).as("d"), lit(i).as("cid")) }: _*)).getField("cid")

  /** Codebooks at or below this size assign via the [[nearestCentroid]]
    * expression (zero shuffle); larger ones would bloat the expression
    * tree past what codegen tolerates (k dist² subtrees, each with a
    * dims-literal array) and switch to the broadcast-join path. The cap
    * is measured, not guessed: at k = 39 × 64 dims the expression tree
    * already falls out of whole-stage codegen and interpreted eval made
    * d13's sf1 fit 2.5× SLOWER than its sf10 join-path run — 16
    * centroids is comfortably inside codegen at 64 dims. */
  private val ExprAssignMaxK = 16

  /** Nearest-centroid assignment that scales with the CODEBOOK, not
    * just the corpus: returns (id, v, cell) with v cast to
    * array<double>. Small codebooks ride the pure-expression path;
    * large ones (corpus-derived k, e.g. SemDeDup's k ∝ n) broadcast a
    * k-row centroid table, stream the n·k candidate pairs through one
    * codegen'd dot product, and take the per-row argmin as a hash
    * aggregate (map-side partials reduce the shuffle back to n rows).
    * Both paths — and the SQL oracle replay — compute the distance as
    * ((v·v) − 2·(v·c)) + (c·c) with identical association order, v·v
    * hoisted out of the per-centroid work, and c·c a driver-computed
    * scalar, so assignments agree bit-for-bit across paths and engines. */
  def assignCells(df: DataFrame, id: Column, vec: Column,
      centroids: Seq[Array[Double]]): DataFrame = {
    val base = df.select(id.as("id"), vec.cast("array<double>").as("v"))
    if (centroids.length <= ExprAssignMaxK)
      base.withColumn("cell", nearestCentroid(col("v"), centroids))
    else {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val spark = df.sparkSession
      val rows = centroids.zipWithIndex.map { case (c, i) =>
        var cc = 0.0
        var j = 0
        while (j < c.length) { cc += c(j) * c(j); j += 1 }
        Row(i, c.toSeq, cc)
      }
      val centsDf = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("cid", IntegerType),
          StructField("cv", ArrayType(DoubleType)),
          StructField("cc", DoubleType))))
      // one parquet file = one partition; the n·k candidate stream is
      // the dense stage and must run corpus-parallel
      val para = spark.sparkContext.defaultParallelism
      val wide =
        if (base.rdd.getNumPartitions < para) base.repartition(para) else base
      wide
        .withColumn("vv", dot(col("v"), col("v")))
        .crossJoin(broadcast(centsDf))
        .withColumn("d",
          col("vv") - lit(2.0) * dot(col("v"), col("cv")) + col("cc"))
        // ties → smallest cid, the nearestCentroid/oracle order; v rides
        // inside the struct (constant per id, never reaches comparison
        // because (d, cid) is unique per candidate row)
        .groupBy(col("id"))
        .agg(min(struct(col("d"), col("cid"), col("v"))).as("m"))
        .select(col("id"), col("m.v").as("v"), col("m.cid").as("cell"))
    }
  }

  /** Lloyd k-means with DETERMINISTIC init (the k vectors with the
    * smallest ids, in id order) and a PINNED iteration count, so a SQL
    * oracle can replay the identical fixed point. Each iteration is one
    * distributed pass: an expression-only assignment (no shuffle) into
    * a single groupBy computing all per-dimension quantized sums; only
    * k×(dims+1) aggregates come to the driver. Empty clusters keep
    * their previous centroid. This is the 100-TB shape: O(iters) jobs,
    * each linear in the corpus, centroids always driver-sized. */
  def kmeansFit(df: DataFrame, id: Column, vec: Column,
      k: Int, iters: Int): Array[Array[Double]] = {
    val base = df.select(id.as("id"), vec.cast("array<double>").as("v"))
    val init = base.orderBy(col("id")).limit(k).collect()
      .map(_.getSeq[Double](1).toArray)
    require(init.length == k, s"kmeansFit: corpus has fewer than $k rows")
    val dims = init(0).length
    var cents = init
    for (_ <- 1 to iters) {
      val assigned = assignCells(base, col("id"), col("v"), cents.toSeq)
      val aggs = (0 until dims).map(i =>
        sum(floor(element_at(col("v"), i + 1) * lit(MeanQ) + lit(0.5))
          .cast("long")).as(s"s$i")) :+ count(lit(1)).as("n")
      val rows = assigned.groupBy(col("cell"))
        .agg(aggs.head, aggs.tail: _*).collect()
      val next = cents.map(_.clone())
      rows.foreach { r =>
        val cid = r.getInt(0)
        val n = r.getLong(dims + 1).toDouble
        next(cid) = (0 until dims).map(i =>
          r.getLong(i + 1).toDouble / n / MeanQ).toArray
      }
      cents = next
    }
    cents
  }

  /** One level of a hierarchical (tree) coarse quantizer: the branch
    * factor and the dense parent-indexed child-centroid table
    * (`children(parent)(j)(dim)`). A `branch == 1` level is an exact
    * identity on cells (cid = parent·1 + 0 = parent, whatever the
    * centroid values), so it carries no table — the degenerate shape
    * that lets a FIXED-depth fixture cover the small-k regime while
    * staying bit-identical to the flat quantizer there. */
  case class TreeLevel(branch: Int, children: Array[Array[Array[Double]]])

  /** The d13 fixture's branch law: a fixed depth-4 tree whose branch
    * factor is the smallest integer with b⁴ ≥ k (INTEGER search on
    * both engines — `ceil(pow(k, .25))` could round differently across
    * float libraries at exact fourth powers). k ≤ 16 keeps the flat
    * quantizer bit-exactly: level 1 branches k ways and the deeper
    * levels degenerate to identity. Depth is pinned at 4 ONLY because
    * the DuckDB oracle is one static SQL string (its CTE count cannot
    * vary with the data); [[kmeansTreeFit]]/[[assignTree]] take any
    * `branches`, and a production deployment at 10⁸⁺ cells would pick
    * depth ∝ log k instead (assignment cost n·b·depth). */
  def treeBranches(k: Int): Seq[Int] =
    if (k <= 16) Seq(k, 1, 1, 1)
    else {
      val b = (2 to 16).find(x => x.toLong * x * x * x >= k).getOrElse(
        throw new IllegalArgumentException(
          s"treeBranches: k = $k exceeds the fixture's 16⁴ = 65536 cell " +
            "bound (the oracle's integer branch search scans 1..16); " +
            "call kmeansTreeFit with a deeper branches vector instead"))
      Seq(b, b, b, b)
    }

  /** The codegen'd descent over fitted levels: cell₀ = 0, then one
    * [[graft.functions.NearestChild]] per non-identity level. A pure
    * column — no join, no shuffle, plan cost n·Σb. */
  private def descend(v: Column, levels: Seq[TreeLevel]): Column =
    levels.foldLeft(lit(0)) { (cell, lv) =>
      if (lv.branch == 1) cell
      else graft.functions.VectorExpressions
        .nearestChild(cell, v, lv.children, lv.branch)
    }

  /** Pinned-Lloyd fit of a hierarchical quantizer, level by level —
    * the scale path for CORPUS-DERIVED cell counts (k ∝ n), where the
    * flat [[kmeansFit]]+[[assignCells]] pair would stream n·k
    * candidates (O(n²/cellSize) — measured 20.8× time for 2× data at
    * d13's sf40 once it spilled 83 GB). Same determinism discipline as
    * the flat fit, per level: init = the `branch` smallest-id members
    * of each parent cell (a parent with no fit members keeps its own
    * centroid as sole child, so descent stays total), `iters` Lloyd
    * passes with quantized integer mean sums (order- and
    * engine-independent), empty children keep their previous centroid,
    * argmin ties to the smallest child. Every pass is one linear
    * codegen'd job; only branch^level centroid rows reach the driver.
    * `branch == 1` levels are skipped outright — identity on cells
    * (see [[TreeLevel]]). */
  def kmeansTreeFit(df: DataFrame, id: Column, vec: Column,
      branches: Seq[Int], iters: Int): Seq[TreeLevel] = {
    val base = df.select(id.as("id"), vec.cast("array<double>").as("v"))
    val done = scala.collection.mutable.ArrayBuffer[TreeLevel]()
    var parents = 1
    for (b <- branches) {
      if (b == 1) done += TreeLevel(1, null)
      else {
        val withP = base.withColumn("p", descend(col("v"), done.toSeq))
        // init: the b smallest-id members per parent. Level 1 (one
        // parent) is a plain global top-b; deeper levels rank inside
        // each parent cell — the partition count equals the CELL count
        // (grows with the corpus), never one global task.
        val memberInit: Map[Int, Array[Array[Double]]] =
          if (parents == 1)
            Map(0 -> base.orderBy(col("id")).limit(b).collect()
              .map(_.getSeq[Double](1).toArray))
          else {
            val rows = withP.withColumn("rn", row_number().over(
                Window.partitionBy(col("p")).orderBy(col("id"))))
              .filter(col("rn") <= b)
              .select(col("p"), col("rn"), col("v")).collect()
            rows.groupBy(_.getInt(0)).map { case (p, rs) =>
              p -> rs.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
            }
          }
        require(memberInit.nonEmpty, "kmeansTreeFit: empty fit corpus")
        val dims = memberInit.valuesIterator.next()(0).length
        // dense parent-indexed table; a fit-empty parent carries its
        // own centroid (from the last non-identity level) as sole child.
        // Ragged guard: the previous level's child arrays can be SHORTER
        // than its branch factor (a parent with < b fit members, or a
        // fit-empty parent's 1-element sole child), so the dense 0 until
        // parents enumeration here includes PHANTOM cell ids with
        // p % branch >= children(p / branch).length. NearestChild only
        // emits child indices < ch.length, so no row can ever carry a
        // phantom parent — any in-range centroid keeps descent total
        // without touching a single assignment; arr(0) is the cheapest.
        def parentCentroid(p: Int): Array[Double] = {
          val lv = done.reverseIterator.find(_.branch > 1).get
          val arr = lv.children(p / lv.branch)
          if (p % lv.branch < arr.length) arr(p % lv.branch) else arr(0)
        }
        var children: Array[Array[Array[Double]]] =
          (0 until parents).map(p =>
            memberInit.getOrElse(p, Array(parentCentroid(p)))).toArray
        for (_ <- 1 to iters) {
          val assigned = withP.withColumn("c", graft.functions
            .VectorExpressions.nearestChild(col("p"), col("v"), children, b))
          val aggs = (0 until dims).map(i =>
            sum(floor(element_at(col("v"), i + 1) * lit(MeanQ) + lit(0.5))
              .cast("long")).as(s"s$i")) :+ count(lit(1)).as("n")
          val rows = assigned.groupBy(col("c"))
            .agg(aggs.head, aggs.tail: _*).collect()
          val next = children.map(_.map(_.clone()))
          rows.foreach { r =>
            val cid = r.getInt(0)
            val p = cid / b; val j = cid % b
            if (j < next(p).length) {
              val n = r.getLong(dims + 1).toDouble
              next(p)(j) = (0 until dims).map(i =>
                r.getLong(i + 1).toDouble / n / MeanQ).toArray
            }
          }
          children = next
        }
        done += TreeLevel(b, children)
        parents *= b
      }
    }
    done.toSeq
  }

  /** Full-corpus leaf assignment under a fitted tree: (id, v, cell) —
    * the [[assignCells]] contract, as one codegen'd map. */
  def assignTree(df: DataFrame, id: Column, vec: Column,
      levels: Seq[TreeLevel]): DataFrame = {
    val base = df.select(id.as("id"), vec.cast("array<double>").as("v"))
    // one parquet file = one partition; downstream pair work needs the
    // corpus spread even though the descent itself is a cheap map
    val para = df.sparkSession.sparkContext.defaultParallelism
    val wide =
      if (base.rdd.getNumPartitions < para) base.repartition(para) else base
    wide.withColumn("cell", descend(col("v"), levels))
  }

  /** IVF top-k: corpus vectors live in their nearest-centroid cell;
    * each query probes its `nProbe` nearest cells and ranks exact
    * cosine inside them. Probe selection is expression-only
    * (array_sort over (dist², cid) structs); the per-query top-k is a
    * window over the probed cells. Queries are small by contract
    * (broadcast); the corpus is never paired beyond its probed cells —
    * O(n·k_centroids) assignment + O(n·nProbe/k_centroids) candidate
    * stream per query, the IVF trade. */
  def ivfTopK(corpus: DataFrame, cId: Column, cVec: Column,
      queries: DataFrame, qId: Column, qVec: Column,
      centroids: Array[Array[Double]], nProbe: Int, k: Int): DataFrame = {
    val c0 = corpus.select(cId.as("c_id"), cVec.cast("array<double>").as("c_v"))
    // one parquet file = one partition; the in-cell scoring below is the
    // dense O(|corpus|·|probes|/K) stage and must run corpus-parallel
    val para = corpus.sparkSession.sparkContext.defaultParallelism
    val c = (if (c0.rdd.getNumPartitions < para) c0.repartition(para) else c0)
      .withColumn("cell", nearestCentroid(col("c_v"), centroids.toSeq))
    val probeArr = array(centroids.zipWithIndex.map { case (cc, i) =>
      struct(dist2(col("q_v"), cc).as("d"), lit(i).as("cid")) }: _*)
    val q = queries.select(qId.as("q_id"), qVec.cast("array<double>").as("q_v"))
      .withColumn("p", explode(slice(array_sort(probeArr), 1, nProbe)))
      .select(col("q_id"), col("q_v"), col("p").getField("cid").as("cell"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    // project to the skinny (q_id, c_id, cos) BEFORE the rank window:
    // the candidate stream is |corpus|·nProbe/K rows, and a window sorts
    // its whole input — carrying both 64-dim vectors through that sort
    // is ~40× the bytes (it filled the scratch disk at the sf10 probe)
    c.join(broadcast(q), Seq("cell"))
      .select(col("q_id"), col("c_id"),
        cosine(col("c_v"), col("q_v")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("cos"), col("rn"))
  }

  /** Product-quantization codebooks: the vector space is split into
    * `m` contiguous subspaces and each gets its own pinned-Lloyd
    * codebook ([[kmeansFit]] — deterministic init, quantized means, so
    * a SQL oracle replays the identical fixed point). Returns
    * m × k × (dims/m) centroids.
    *
    * 100 TB shape: m independent k-means over SLICED vectors — each
    * iteration is one linear pass; codebooks are driver-sized
    * (m·k·subdim doubles), never a join side. */
  def pqFit(df: DataFrame, id: Column, vec: Column,
      m: Int, k: Int, iters: Int): Array[Array[Array[Double]]] = {
    val base = df.select(id.as("id"), vec.cast("array<double>").as("v"))
    // ONE init collect for all subspaces (sliced on the driver), then
    // ONE exploded pass per Lloyd iteration advancing every subspace's
    // codebook together — m independent kmeansFit calls would pay
    // m×iters sequential jobs for the same fixed point (measured 7.2 s
    // → 2.5 s at sf0.1). The per-(subspace, cell) quantized sums are
    // identical to the per-subspace computation, so the SQL oracle's
    // independent sub-k-means replay still matches bit-for-bit.
    val init = base.orderBy(col("id")).limit(k).collect()
      .map(_.getSeq[Double](1).toArray)
    require(init.length == k, s"pqFit: corpus has fewer than $k rows")
    val dims = init(0).length
    require(dims % m == 0, s"pqFit: $dims dims not divisible into $m subspaces")
    val sub = dims / m
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m)(j => init.map(_.slice(j * sub, (j + 1) * sub)))
    for (_ <- 1 to iters) {
      val sliced = base.select(explode(array((0 until m).map(j =>
          struct(lit(j).as("j"),
            slice(col("v"), j * sub + 1, sub).as("sv"))): _*)).as("e"))
        .select(col("e.j").as("j"), col("e.sv").as("sv"))
      val cell = (0 until m).foldLeft(lit(-1)) { (acc, j) =>
        when(col("j") === j, nearestCentroid(col("sv"), books(j).toSeq))
          .otherwise(acc)
      }
      val aggs = (0 until sub).map(i =>
        sum(floor(element_at(col("sv"), i + 1) * lit(MeanQ) + lit(0.5))
          .cast("long")).as(s"s$i")) :+ count(lit(1)).as("n")
      val rows = sliced.withColumn("cell", cell)
        .groupBy(col("j"), col("cell"))
        .agg(aggs.head, aggs.tail: _*).collect()
      val next = books.map(_.map(_.clone()))
      rows.foreach { r =>
        val (j, cid) = (r.getInt(0), r.getInt(1))
        val n = r.getLong(sub + 2).toDouble
        next(j)(cid) = (0 until sub).map(i =>
          r.getLong(i + 2).toDouble / n / MeanQ).toArray
      }
      books = next
    }
    books
  }

  /** PQ/ADC top-k: corpus vectors are ENCODED to m small code ids (the
    * compressed representation — the full vectors never enter the
    * scoring join), queries compute per-subspace distance tables to
    * the codebooks as pure expressions, and the approximate distance
    * is the sum of m table lookups. Exactly the asymmetric-distance
    * computation of Jégou et al.'s PQ, with the lookup expressed as
    * `element_at` over a literal distance array — codegen'd, no UDF.
    *
    * Returns (q_id, c_id, adist, rn) — the k smallest approximate
    * distances per query (ties → smaller c_id). */
  def pqTopK(corpus: DataFrame, cId: Column, cVec: Column,
      queries: DataFrame, qId: Column, qVec: Column,
      codebooks: Array[Array[Array[Double]]], k: Int): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    // persisted: the encoded corpus IS the PQ index (m bytes-ish per
    // row); materializing it keeps the 32-distance encoding expression
    // out of the scoring stage, whose fused codegen otherwise
    // recompiles the whole encode+join pipeline on every invocation
    // (measured 3.4 s → 0.8 s at sf0.1). At scale this is exactly the
    // build-once / probe-many index lifecycle.
    val c0 = corpus.select(cId.as("c_id"), cVec.cast("array<double>").as("c_v"))
    // the ADC pair stream below is |corpus|·|queries| rows and must run
    // corpus-parallel — one parquet file would pin it to one thread
    val para = corpus.sparkSession.sparkContext.defaultParallelism
    val enc = (if (c0.rdd.getNumPartitions < para) c0.repartition(para) else c0)
      .withColumn("codes", array((0 until m).map(j =>
        nearestCentroid(slice(col("c_v"), j * sub + 1, sub),
          codebooks(j).toSeq)): _*))
      .select(col("c_id"), col("codes"))
      .persist()
    // the ADC lookup table — dist²(q_j, codebook_j[c]) for every
    // (subspace, code) — is computed ONCE PER QUERY ROW on the
    // broadcast side (m·k literal-centroid expressions over the query
    // vector), so the pair stream below does m array lookups per row
    // instead of m·k distance evaluations (measured 5.1 s → sub-second
    // scoring at sf0.1). Same doubles, same Σ_j order, so the oracle's
    // per-pair d1+..+dm replay matches bit-for-bit.
    val kCodes = codebooks(0).length
    val lut = array((0 until m).flatMap { j =>
      val qsub = slice(col("q_v"), j * sub + 1, sub)
      codebooks(j).map(c => dist2(qsub, c))
    }: _*)
    val q = queries.select(qId.as("q_id"), qVec.cast("array<double>").as("q_v"))
      .withColumn("lut", lut)
      .select(col("q_id"), col("lut"))
    val adist = (0 until m).map(j =>
      element_at(col("lut"),
        lit(j * kCodes) + element_at(col("codes"), j + 1) + 1))
      .reduce(_ + _)
    val w = Window.partitionBy(col("q_id")).orderBy(col("adist").asc, col("c_id"))
    // skinny (q_id, c_id, adist) BEFORE the rank window — the window
    // sorts the whole |corpus|·|queries| stream, and dragging the
    // 32-double LUT array through that sort is ~12× the bytes
    enc.crossJoin(broadcast(q))
      .select(col("q_id"), col("c_id"), adist.as("adist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("adist"), col("rn"))
  }

  /** Bucketed ANN top-k: query vectors search only their own bucket.
    * Exact within-bucket; recall depends on planes (recall/speed knob).
    * `queries` is small (broadcast). */
  def bucketedTopK(corpus: DataFrame, cId: Column, cVec: Column,
      queries: DataFrame, qId: Column, qVec: Column,
      planes: Int, k: Int): DataFrame = {
    val c = corpus.select(cId.as("c_id"), cVec.cast("array<double>").as("c_v"))
      .withColumn("bucket", signBucket(col("c_v"), planes))
    val q = queries.select(qId.as("q_id"), qVec.cast("array<double>").as("q_v"))
      .withColumn("bucket", signBucket(col("q_v"), planes))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    c.join(broadcast(q), Seq("bucket"))
      .withColumn("cos", cosine(col("c_v"), col("q_v")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("cos"), col("rn"))
  }

  /** SemDeDup-style semantic pruning (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus with the pinned-Lloyd
    * coarse quantizer, then call any two SAME-CLUSTER vectors with
    * cosine ≥ `minCos` semantic duplicates and keep only the
    * smallest id of each duplicate neighborhood. (The paper keeps the
    * item farthest from the centroid; min-id is the deterministic,
    * order-free choice — the pruned COUNT is the same, membership of
    * the kept set differs only within a duplicate group.)
    *
    * Returns one row per corpus vector: (id, cell, n_near, best_cos,
    * kept) where n_near counts same-cell neighbors with cos ≥ minCos,
    * best_cos is the strongest of them (0.0 when none) and kept = 0
    * iff some SMALLER id sits within minCos — a one-pass verdict, no
    * iterative clustering of the duplicate graph.
    *
    * 100 TB shape: the pair stream is blocked by k-means cell (never
    * all-pairs — O(Σ|cell|²) with driver-sized centroids), assignment
    * rides [[assignCells]] (expression for small codebooks, broadcast
    * join + argmin aggregate for corpus-derived k), and the verdict is
    * a single aggregate over the symmetric pair stream. Skew knob = k:
    * callers should derive k ∝ n/targetCellSize so expected cell size —
    * and with it the in-cell O(n²/k) pair work — stays bounded as the
    * corpus grows (the d13 fixture does). */
  def semDedup(df: DataFrame, id: Column, vec: Column,
      centroids: Array[Array[Double]], minCos: Double): DataFrame =
    semDedupAssigned(assignCells(df, id.cast("long"), vec, centroids.toSeq),
      minCos)

  /** [[semDedup]] over a TREE quantizer (see [[kmeansTreeFit]]): the
    * scale path for corpus-derived cell counts — assignment is the
    * codegen'd descent, never the n·k candidate stream. */
  def semDedupTree(df: DataFrame, id: Column, vec: Column,
      levels: Seq[TreeLevel], minCos: Double): DataFrame =
    semDedupAssigned(assignTree(df, id.cast("long"), vec, levels), minCos)

  /** The pair/verdict phase of [[semDedup]] over an already-assigned
    * (id, v, cell) frame. */
  def semDedupAssigned(base: DataFrame, minCos: Double): DataFrame = {
    val pairs = base.as("a").join(base.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("cos"), col("a.cell").as("cell"))
      .filter(col("cos") >= minCos)
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("nb"),
        col("cos"))
      .unionByName(pairs.select(col("id_b").as("id"), col("id_a").as("nb"),
        col("cos")))
    val verdict = sym.groupBy(col("id")).agg(
      count(lit(1)).as("n_near"),
      max(col("cos")).as("best_cos"),
      max(when(col("nb") < col("id"), 1).otherwise(0)).as("dominated"))
    base.select(col("id"), col("cell"))
      .join(verdict, Seq("id"), "left")
      .select(col("id"), col("cell"),
        coalesce(col("n_near"), lit(0L)).as("n_near"),
        coalesce(col("best_cos"), lit(0.0)).as("best_cos"),
        (lit(1) - coalesce(col("dominated"), lit(0))).as("kept"))
  }
}
