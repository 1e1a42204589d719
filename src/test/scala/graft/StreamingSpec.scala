package graft

import graft.core.Tables
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Batch/stream parity (SURVEY.md §2.10): the same transforms run over
  * a readStream replay of the events table and must agree with the
  * batch result — which is itself DuckDB-oracle-checked (ev_tumbling).
  */
class StreamingSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("streaming tumbling-window aggregation matches the batch result") {
    val batchEvents = Tables.events(spark, sf)
    val expected = EventStreams.tumbling(batchEvents)
      .orderBy("win", "event_type").collect()

    // replay the same parquet as a bounded stream
    val schema = batchEvents.schema
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    batchEvents.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(schema).parquet(tmp)
    val q = EventStreams.tumbling(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_tumbling_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("graft_tumbling_out")
      .orderBy("win", "event_type").collect()
    assert(got.length == expected.length,
      s"stream rows ${got.length} != batch ${expected.length}")
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g != $e") }
  }

  test("stateful sessionization counts sessions per user") {
    val batchEvents = Tables.events(spark, sf)
    // batch expectation: lag/gap session counting (oracle-checked shape)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val expected = batchEvents
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s", when(col("prev").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev")) > 1800000000L, 1).otherwise(0))
      .groupBy(col("user_id")).agg(sum(col("new_s")).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val schema = batchEvents.schema
    val tmp = java.nio.file.Files.createTempDirectory("graft-sess").toString
    batchEvents.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(schema).parquet(tmp)
    val q = EventStreams.sessionize(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_sessions_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("graft_sessions_out")
      .groupBy("user_id").agg(max("n_sessions").as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got == expected, s"stream=$got batch=$expected")
  }

  test("stateful first-seen matches the batch groupBy min/count") {
    val batchEvents = Tables.events(spark, sf)
    val expected = batchEvents.groupBy(col("user_id"), col("event_type"))
      .agg(min(unix_micros(col("ts"))).as("first_us"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

    val schema = batchEvents.schema
    val tmp = java.nio.file.Files.createTempDirectory("graft-first").toString
    batchEvents.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(schema).parquet(tmp)
    val q = EventStreams.firstSeen(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("graft_first_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // update mode may emit a key several times across micro-batches;
    // the LAST update per key (max n) is the final state
    val got = spark.table("graft_first_out")
      .groupBy("user_id", "event_type")
      .agg(min("first_us").as("first_us"), max("n").as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected, s"stream first-seen state != batch aggregate")
  }

  test("checkpointed restart resumes exactly-once (no duplicate windows)") {
    val batchEvents = Tables.events(spark, sf).persist()
    val schema = batchEvents.schema
    val root = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val srcDir = s"$root/src"; val outDir = s"$root/out"; val ckpt = s"$root/ckpt"
    // batch ground truth for every (window, event_type)
    val truth = EventStreams.tumbling(batchEvents).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    val cut = batchEvents.agg(
      expr("percentile(unix_micros(ts), 0.5)")).head().getDouble(0).toLong
    def run(part: org.apache.spark.sql.DataFrame, dir: String): Unit = {
      part.write.mode("overwrite").parquet(dir)
      val stream = spark.readStream.schema(schema).parquet(srcDir + "/*")
      val q = EventStreams.tumbling(stream)
        .writeStream.outputMode("append")
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    // first half, then RESTART the query from the same checkpoint with
    // the second half added — the sink must end up exactly-once
    run(batchEvents.filter(unix_micros(col("ts")) < cut), s"$srcDir/p1")
    run(batchEvents.filter(unix_micros(col("ts")) >= cut), s"$srcDir/p2")

    val out = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty, "append sink emitted nothing across both runs")
    val dups = out.groupBy(_._1).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"duplicate windows after restart: ${dups.take(3)}")
    // every emitted (closed) window must carry the exact batch aggregate
    out.foreach { case (k, v) =>
      assert(truth(k) == v, s"window $k: stream=$v batch=${truth(k)}")
    }
    batchEvents.unpersist(blocking = false)
  }

  test("stream-stream interval join matches the batch interval join") {
    val batchEvents = Tables.events(spark, sf)
    val expected = EventStreams.viewsBeforeClicks(
        batchEvents.filter(col("event_type") === "click"),
        batchEvents.filter(col("event_type") === "view"))
      .orderBy("click_id", "view_id").collect()
    assert(expected.nonEmpty, "batch interval join found no pairs at sf0.001")

    val schema = batchEvents.schema
    val tmp = java.nio.file.Files.createTempDirectory("graft-ij").toString
    batchEvents.write.mode("overwrite").parquet(tmp)
    def side(tpe: String) = spark.readStream.schema(schema).parquet(tmp)
      .filter(col("event_type") === tpe)
      .withWatermark("ts", "1 hour")
    val q = EventStreams.viewsBeforeClicks(side("click"), side("view"))
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_ij_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("graft_ij_out")
      .orderBy("click_id", "view_id").collect()
    assert(got.length == expected.length,
      s"stream rows ${got.length} != batch ${expected.length}")
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g != $e") }
  }

  test("incremental MinHash screen: micro-batched stream equals one-shot batch") {
    val docs = Tables(spark, sf, "documents")
    val corpus = docs.filter(col("doc_id") % 4 =!= 3)
    val newDocs = docs.filter(col("doc_id") % 4 === 3)
    val corpusSigs = graft.llm.Dedup.minhashSignatures(corpus,
      col("doc_id"), col("text"), shingleK = 3, numHashes = 32).persist()

    val expected = graft.llm.Dedup.minhashMatchesFromSigs(corpusSigs,
        graft.llm.Dedup.minhashSignatures(newDocs, col("doc_id"), col("text"),
          shingleK = 3, numHashes = 32),
        numHashes = 32, bands = 8, threshold = 0.30)
      .filter(col("n_matches") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty, "batch screen found no matches at sf0.001")

    // 4 parquet files + maxFilesPerTrigger=1 → a genuinely multi-batch
    // stream; verdicts must be batch-boundary-invariant
    val tmp = java.nio.file.Files.createTempDirectory("graft-inc").toString
    newDocs.repartition(4).write.mode("overwrite").parquet(tmp)
    val got = new scala.collection.concurrent.TrieMap[Long, (Long, Double)]()
    val stream = spark.readStream.schema(newDocs.schema)
      .option("maxFilesPerTrigger", 1).parquet(tmp)
    var batches = 0
    val q = graft.streaming.IncrementalDedup.start(stream,
      col("doc_id"), col("text"), corpusSigs,
      shingleK = 3, numHashes = 32, bands = 8, threshold = 0.30,
      hasher = graft.llm.Dedup.xxHash,
      sink = { verdicts =>
        batches += 1
        verdicts.filter(col("n_matches") > 0).collect()
          .foreach(r => got.put(r.getLong(0), (r.getLong(1), r.getDouble(2))))
      })
    q.awaitTermination(120000)
    corpusSigs.unpersist(blocking = false)

    assert(batches >= 4, s"expected ≥4 micro-batches, saw $batches")
    val gotSet = got.map { case (id, (n, b)) => (id, n, b) }.toSet
    assert(gotSet == expected,
      s"stream/batch mismatch: only-stream=${gotSet -- expected} " +
        s"only-batch=${expected -- gotSet}")
  }

  test("stream-static enrichment matches the batch broadcast join") {
    val batchEvents = Tables.events(spark, sf)
    // static dimension: user segment from the user id
    val dim = batchEvents.select(col("user_id")).distinct()
      .withColumn("segment",
        when(col("user_id") % 3 === 0, "a").otherwise("b"))
    val expected = EventStreams.enrich(batchEvents, dim, "user_id")
      .groupBy("segment", "event_type").agg(count(lit(1)).as("n"))
      .orderBy("segment", "event_type").collect()

    val tmp = java.nio.file.Files.createTempDirectory("graft-enrich").toString
    batchEvents.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(batchEvents.schema).parquet(tmp)
    val q = EventStreams.enrich(stream, dim, "user_id")
      .groupBy(col("segment"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_enrich_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("graft_enrich_out")
      .orderBy("segment", "event_type").collect()
    assert(got.length == expected.length && got.zip(expected).forall {
      case (g, e) => g == e
    }, s"stream=${got.toSeq} batch=${expected.toSeq}")
  }

  test("watermark drops late rows in append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00")

    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    val ev = ms.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.tumbling(ev, "1 hour", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_wm_out")
      .start()

    // batch 1: three rows in the 10:00 window, one at 12:05 that
    // advances the watermark to 11:55 and closes the 10:00 window
    ms.addData((ts("10:00"), "click", 1.0), (ts("10:20"), "click", 1.0),
      (ts("10:40"), "view", 1.0), (ts("12:05"), "view", 1.0))
    q.processAllAvailable()
    // batch 2: a LATE 10:15 click (behind the 11:55 watermark — must be
    // dropped) plus a 13:10 row that closes the 12:00 window
    ms.addData((ts("10:15"), "click", 9.0), (ts("13:10"), "click", 1.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("graft_wm_out")
      .select(col("win"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val w10 = ts("10:00").getTime / 1000
    val w12 = ts("12:00").getTime / 1000
    // the 10:00 click count stays 2 — the late 10:15 row never lands
    assert(rows.contains((w10, "click", 2L)),
      s"late row leaked into the closed window: $rows")
    assert(rows.contains((w10, "view", 1L)) && rows.contains((w12, "view", 1L)),
      s"expected closed windows missing: $rows")
  }

  test("stream-stream LEFT OUTER join emits unmatched rows after watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00")

    val clicks = MemoryStream[(java.sql.Timestamp, Long)]
    val views = MemoryStream[(java.sql.Timestamp, Long)]
    val c = clicks.toDF().toDF("c_ts", "user").withWatermark("c_ts", "10 minutes")
    val v = views.toDF().toDF("v_ts", "v_user").withWatermark("v_ts", "10 minutes")
    // left-outer: every click emits; with a view by the same user in
    // the preceding 30 minutes if one exists, else nulls — but ONLY
    // once the watermark proves no further view can arrive
    val joined = c.join(v,
      col("user") === col("v_user") &&
        col("v_ts") >= col("c_ts") - org.apache.spark.sql.functions.expr("INTERVAL 30 MINUTES") &&
        col("v_ts") <= col("c_ts"),
      "left_outer")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("graft_lsj_out").start()

    clicks.addData((ts("10:00"), 1L), (ts("10:00"), 2L))
    views.addData((ts("09:45"), 1L)) // matches user 1; user 2 unmatched
    q.processAllAvailable()
    // nothing can be final yet: user 2's null row needs the watermark
    val early = spark.table("graft_lsj_out").filter(col("user") === 2)
    assert(early.isEmpty, "unmatched left row emitted before watermark closed")
    // advance both watermarks far past 10:00 + 30m
    clicks.addData((ts("12:00"), 9L)); views.addData((ts("12:00"), 9L))
    q.processAllAvailable()
    clicks.addData((ts("12:30"), 9L)); views.addData((ts("12:30"), 9L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("graft_lsj_out")
      .select(col("user"), col("v_user"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(rows.contains((1L, 1L)), s"matched pair missing: ${rows.toSeq}")
    assert(rows.contains((2L, -1L)),
      s"unmatched click not emitted with nulls after watermark: ${rows.toSeq}")
  }

  test("dropDuplicatesWithinWatermark dedups retries, re-admits after expiry") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00")

    // at-least-once ingestion: the same event id may be retried within
    // the delivery window; dedup state must also EXPIRE so unbounded
    // id cardinality cannot pin unbounded state — exactly what
    // dropDuplicatesWithinWatermark gives over plain dropDuplicates
    val ms = MemoryStream[(java.sql.Timestamp, Long)]
    val q = ms.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_ddww_out")
      .start()

    ms.addData((ts("10:00"), 1L), (ts("10:05"), 1L), (ts("10:02"), 2L))
    q.processAllAvailable()
    // advance the watermark far past 10:05 + 30m, expiring id 1's state
    ms.addData((ts("12:00"), 3L))
    q.processAllAvailable()
    // the same business id arrives again AFTER expiry → re-admitted
    ms.addData((ts("12:10"), 1L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("graft_ddww_out")
      .select(col("event_id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(got == Seq(1L, 1L, 2L, 3L),
      s"expected in-window retry deduped and post-expiry re-admission, got $got")
  }
}
