package graft

import graft.sources.SeedTable
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {

  test("S1: seed-table roundtrip in R-compatible whitespace format") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-seed")
    val file = tmp.resolve("seed.txt")
    // the reference's format: quoted header, space-delimited doubles
    java.nio.file.Files.writeString(file,
      "\"seed1\" \"seed2\"\n0.1 0.9\n0.25 0.75\n123.5 42.0\n")
    val df = SeedTable.read(spark, file.toString)
    assert(df.columns.toSeq == Seq("seed1", "seed2"))
    val rows = df.orderBy("seed1").collect()
    assert(rows.length == 3)
    assertNear(rows(0).getDouble(0), 0.1)
    assertNear(rows(2).getDouble(1), 42.0)

    val out = tmp.resolve("out").toString
    SeedTable.write(df, out)
    val back = SeedTable.read(spark, out)
    assert(back.count() == 3)
  }

  test("s12 compaction actually reduces file count without a shuffle") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact")
    val frag = tmp.resolve("frag").toString
    val comp = tmp.resolve("compact").toString
    spark.range(500).selectExpr("id", "id * 2 AS v")
      .repartition(64).write.mode("overwrite").parquet(frag)
    def parts(dir: String) = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parts(frag) == 64, s"expected 64 fragment files, got ${parts(frag)}")
    val df = spark.read.parquet(frag).coalesce(4)
    // coalesce is a shuffle-free narrow repartition — no Exchange node
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "compaction introduced a shuffle")
    df.write.mode("overwrite").parquet(comp)
    assert(parts(comp) <= 4, s"expected <=4 compacted files, got ${parts(comp)}")
    assert(spark.read.parquet(comp).count() == 500)
  }

  test("Tables.events survives both physical ts layouts (nanos-long and µs-NTZ)") {
    // the testdata generator has shipped events.ts as TIMESTAMP(NANOS)
    // in some rounds and TIMESTAMP(MICROS, isAdjustedToUTC=false) in
    // others; Tables.events must normalize BOTH to the same TimestampType
    // values so a regeneration can never silently break the events surface
    import org.apache.spark.sql.types.TimestampType
    import spark.implicits._
    val micros = Seq(1704067200000000L, 1704070800123456L, 1704074400999999L)
    val tmp = java.nio.file.Files.createTempDirectory("graft-evts")

    val nanosDir = tmp.resolve("nanos").toString
    micros.map(u => (u * 1000L, "a")).toDF("ts", "kind")
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")

    val ntzDir = tmp.resolve("ntz").toString
    micros.map(u => (u, "a")).toDF("us", "kind")
      .selectExpr("timestamp_micros(us) AS tmp_ts", "kind")
      .selectExpr("CAST(tmp_ts AS TIMESTAMP_NTZ) AS ts", "kind")
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")

    Seq(nanosDir, ntzDir).foreach { dir =>
      val ev = graft.core.Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType, s"$dir: ${ev.schema("ts").dataType}")
      val got = ev.selectExpr("unix_micros(ts)").orderBy("unix_micros(ts)")
        .collect().map(_.getLong(0)).toSeq
      assert(got == micros.sorted, s"$dir: $got")
    }
  }

  test("DSv2 population source: parallel, deterministic, bit-matches the expression RNG") {
    def read(parts: Int) = spark.read
      .format("graft.sources.PopulationSource")
      .option("n", 999).option("partitions", parts).option("seed", 3)
      .load()

    val df = read(7)
    // the planner must see the requested splits as real input partitions
    assert(df.rdd.getNumPartitions == 7, s"got ${df.rdd.getNumPartitions}")
    assert(df.count() == 999)

    // same values at any parallelism (generation keyed on id, not split)
    val a = df.orderBy("id").collect()
    val b = read(3).orderBy("id").collect()
    assert(a.toSeq == b.toSeq, "values depend on partitioning")

    // bit-match against the Catalyst-expression stream the oracles use
    val expr = spark.range(1, 1000).toDF("id").select(
      col("id"),
      graft.core.Rng.uniform(col("id"), 3).as("u"),
      (sqrt(lit(-2.0) * log(graft.core.Rng.uniform(col("id"), 3))) *
        cos(lit(2.0 * math.Pi) *
          graft.core.Rng.uniform(col("id"), 3 + 1000003L))).as("z"))
      .orderBy("id").collect()
    a.zip(expr).foreach { case (g, e) =>
      assert(g.getLong(0) == e.getLong(0))
      // the uniform stream is exact 64-bit integer arithmetic → bitwise
      assert(g.getDouble(1) == e.getDouble(1), s"u mismatch at id ${g.getLong(0)}")
      // Box–Muller goes through Math.cos/log, where the HotSpot
      // intrinsic and the interpreted path may each differ in the last
      // ulp; with the sqrt·cos product that compounds to a few ulp —
      // the guarantee for transcendental-derived values
      assert(math.abs(g.getDouble(2) - e.getDouble(2)) <=
        4 * math.ulp(e.getDouble(2)), s"z mismatch at id ${g.getLong(0)}")
    }
  }

  test("DSv2 population source: id filters clamp generation; projection prunes the scan") {
    val df = spark.read.format("graft.sources.PopulationSource")
      .option("n", 1000000).option("partitions", 8).option("seed", 3)
      .load()

    // range filter generates [11, 20] — 10 rows, not a million filtered
    val sel = df.filter(col("id") > 10 && col("id") <= 20)
    assert(sel.count() == 10)
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || !plan.contains("Filter ("),
      s"id range not pushed:\n$plan")
    // the clamp is visible as partition shrink: ≤10 rows → ≤10 splits
    assert(sel.rdd.getNumPartitions <= 10,
      s"clamped range still planned 8 full partitions")

    // column pruning: a u-only projection must not carry z in readSchema
    val uOnly = df.select("u").limit(5)
    val uPlan = uOnly.queryExecution.executedPlan.toString
    assert(!uPlan.contains("z#"), s"z not pruned from the scan:\n$uPlan")
    assert(uOnly.collect().length == 5)
  }

  test("DSv2 population source: COUNT/MIN/MAX(id) answer closed-form, no generation") {
    val df = spark.read.format("graft.sources.PopulationSource")
      .option("n", 50000000).option("partitions", 8).option("seed", 3)
      .load()

    // 50M-row count must be instant arithmetic: the pushed-agg scan
    // plans ONE answer row and Spark drops its own aggregate
    val cnt = df.agg(count(lit(1)))
    val t0 = System.nanoTime()
    assert(cnt.head().getLong(0) == 50000000L)
    val dt = (System.nanoTime() - t0) / 1e9
    val cntPlan = cnt.queryExecution.executedPlan.toString
    assert(cntPlan.contains("PushedAggregates"),
      s"aggregate not pushed into the scan:\n$cntPlan")
    assert(dt < 5.0, s"pushed count(*) took ${dt}s — generated the rows?")

    // min/max compose with the id-range clamp (post-filter exactness)
    val mm = df.filter(col("id") > 100 && col("id") <= 2000)
      .agg(min(col("id")), max(col("id")), count(col("id"))).head()
    assert((mm.getLong(0), mm.getLong(1), mm.getLong(2)) == ((101L, 2000L, 1900L)))

    // a residual (non-pushable) filter must BLOCK the push: Spark
    // re-aggregates over really-generated rows
    val guarded = spark.read.format("graft.sources.PopulationSource")
      .option("n", 1000).option("partitions", 4).option("seed", 3).load()
      .filter(col("u") > 0.5).agg(count(lit(1)))
    assert(!guarded.queryExecution.executedPlan.toString
      .contains("PushedAggregates"), "agg pushed past a residual filter")
    val manual = spark.read.format("graft.sources.PopulationSource")
      .option("n", 1000).option("partitions", 4).option("seed", 3).load()
      .collect().count(_.getDouble(1) > 0.5).toLong
    assert(guarded.head().getLong(0) == manual)
  }
}
