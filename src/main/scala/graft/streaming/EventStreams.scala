package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface (SURVEY.md §2.10 extension — the
  * reference is batch-only; the `events` table supports streaming
  * analogues).
  *
  * Batch/stream parity: the same transform functions run over either a
  * batch DataFrame or a readStream DataFrame, so the batch DuckDB
  * oracles (ev_tumbling / ev_session) double as correctness checks for
  * the streaming path — the spec replays the events table through a
  * stream and compares with the batch result.
  */
object EventStreams {

  /** Tumbling-window counts/sums with a watermark (append-capable). */
  def tumbling(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
      .select(unix_timestamp(col("w.start")).as("win"), col("event_type"),
        col("n"), col("v"))

  /** Stream-static enrichment: join each micro-batch against a (small)
    * static dimension. The dimension broadcasts — stateless, no
    * watermark, and the static side is re-planned per batch so a
    * refreshed dimension snapshot is picked up on restart. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key))

  final case class Ev(user_id: Long, tsMicros: Long, value: Double)
  final case class SessionOut(user_id: Long, n_sessions: Int, n_events: Long)
  final case class KeyEv(user_id: Long, event_type: String, tsMicros: Long)
  final case class FirstSeen(user_id: Long, event_type: String,
      first_us: Long, n: Long)

  /** Streaming first-seen / running-count state per (user, event_type):
    * ONE state row per key via mapGroupsWithState (the streaming twin
    * of `groupBy.agg(min(ts), count(*))` — batch execution of the same
    * function is the parity check, and the batch aggregate is the
    * DuckDB oracle `ev_first_seen`). This is the stateful-dedup shape
    * for a training-data feed: emit/update each key's earliest sighting
    * while duplicates stream in unordered. */
  def firstSeen(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events.select(col("user_id").cast("long"), col("event_type"),
      unix_micros(col("ts")).as("tsMicros")).as[KeyEv]
    ds.groupByKey(e => (e.user_id, e.event_type))
      .mapGroupsWithState[(Long, Long), FirstSeen](GroupStateTimeout.NoTimeout) {
        case ((uid, et), rows, state) =>
          var (mn, n) = state.getOption.getOrElse((Long.MaxValue, 0L))
          rows.foreach { r =>
            if (r.tsMicros < mn) mn = r.tsMicros
            n += 1
          }
          state.update((mn, n))
          FirstSeen(uid, et, mn, n)
      }.toDF()
  }

  /** Stream-stream interval join: each `click` matched to the same
    * user's `view` events in the preceding `maxGap`. The join condition
    * is an equi-key (user_id) plus an event-time range, which is
    * exactly the shape Structured Streaming's stream-stream join can
    * bound state for: with watermarks on BOTH sides (caller applies
    * `withWatermark` pre-call on streaming inputs) the range condition
    * lets Spark expire old view-side state instead of buffering the
    * full history. Batch execution of the same function is the DuckDB
    * oracle `ev_interval_join`; streaming parity is in StreamingSpec.
    *
    * At 100 TB the equi-key carries the shuffle (hash by user), and the
    * range predicate is a post-join filter within each key group — no
    * cross product beyond a user's own click×view window. */
  def viewsBeforeClicks(clicks: DataFrame, views: DataFrame,
      maxGapUs: Long = 300000000L): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"),
      col("event_id").as("click_id"), col("ts").as("cts"))
    val v = views.select(col("user_id").as("v_user"),
      col("event_id").as("view_id"), col("ts").as("vts"))
    c.join(v, col("c_user") === col("v_user") &&
        col("vts") < col("cts") &&
        col("vts") >= col("cts") - expr(s"INTERVAL ${maxGapUs} MICROSECOND"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        (unix_micros(col("cts")) - unix_micros(col("vts"))).as("gap_us"))
  }

  /** Stateful sessionization via flatMapGroupsWithState: counts sessions
    * per user with a 30-minute inactivity gap. For the bounded test
    * replay, state finalizes on stream end (batch parity). */
  def sessionize(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events.select(col("user_id").cast("long"),
      unix_micros(col("ts")).as("tsMicros"), col("value").cast("double"))
      .as[Ev]
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Long], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[List[Long]]) =>
          val times = (state.getOption.getOrElse(Nil) ++ rows.map(_.tsMicros)).sorted
          val gaps = times.zip(times.drop(1)).count { case (a, b) => b - a > 1800000000L }
          state.update(times)
          Iterator(SessionOut(uid, gaps + 1, times.length.toLong))
      }.toDF()
  }
}
