package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming twins of the incremental/batch operators: the
  * reference has no streaming engine (SURVEY §2.10) — its watermark
  * batch (T1) is re-expressed here as real event-time streaming, so the
  * same library serves both the nightly batch and a live feed.
  *
  * Every transform takes a DataFrame and doesn't care whether it came
  * from `read` or `readStream` — the plans are identical (verified in
  * StreamingSpec via MemoryStream); only the sink differs.
  */
object EventStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

  case class UserSessionState(nEvents: Long, lastTs: Long)
  case class SessionUpdate(user_id: Long, nEvents: Long, closed: Boolean)

  /** Tumbling 1-hour counts with a 2-hour event-time watermark — the
    * streaming form of queries.StreamingBatch.st1. Late events beyond
    * the watermark are dropped, state is bounded.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows (30-minute gap) per user via the built-in
    * session_window — the streaming form of st3.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Streaming dedup — first event per (user_id, event_type), the
    * streaming form of queries.StreamingBatch.st4: state is bounded by
    * the watermark (keys older than it are evicted), so this runs
    * forever without unbounded state — exactly the contract a
    * continuous training-data intake needs.
    */
  def dedupFirstSeen(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Stream-static enrichment, the streaming form of st5: the static
    * dim side is broadcast per micro-batch (re-read each trigger, so a
    * slowly-changing dim is picked up without restart); no watermark
    * needed — stream-static joins are stateless.
    */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim),
      col("user_id") === col("c_custkey"))

  /** Stream-stream interval join, the streaming form of st6: each
    * side is watermarked and the join condition carries a time-range
    * bound, so the engine can evict buffered rows — clicks are held at
    * most (watermark + 10 min), purchases at most the watermark. The
    * state never grows unboundedly, which is what makes stream-stream
    * joins viable on an endless feed.
    */
  def followupJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "30 minutes")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_uid"), col("ts").as("c_ts"))
    val p = purchases.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("p_uid"), col("ts").as("p_ts"))
    c.join(p,
      col("c_uid") === col("p_uid") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"))
  }

  /** Custom keyed state via mapGroupsWithState: running per-user event
    * counter with processing-time timeout — the pattern for state the
    * built-in windows can't express (T4's resume-state analog).
    */
  def runningUserCounts(events: Dataset[Event],
      expireAfter: Option[String] = None): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    // NOTE: a processing-time timeout makes the engine self-trigger to
    // check expiry, so the stream never quiesces — opt in only for
    // production jobs that want state expiry (expireAfter=Some("30
    // minutes")); tests and bounded replays leave it off.
    val timeout = if (expireAfter.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout
    else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserSessionState, SessionUpdate](timeout) {
        case (userId, batch, state: GroupState[UserSessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionUpdate(userId, s.nEvents, closed = true)
          } else {
            val events = batch.toSeq
            val prev = state.getOption.getOrElse(UserSessionState(0L, 0L))
            val next = UserSessionState(prev.nEvents + events.size,
              math.max(prev.lastTs, events.map(_.ts.getTime).max))
            state.update(next)
            expireAfter.foreach(state.setTimeoutDuration)
            SessionUpdate(userId, next.nEvents, closed = false)
          }
      }
  }

  case class GapSessionState(sessionStart: Long, lastTs: Long,
    nEvents: Long)
  case class ClosedSession(user_id: Long, session_start: Timestamp,
    n_events: Long, duration_s: Long)

  /** Gap-based sessionization with CUSTOM state — the streaming twin
    * of queries.TimeSeries.ts3 and the flatMapGroupsWithState shape
    * session_window can't express when per-session state is richer
    * than an aggregate (resume ladders, per-session spill files, …).
    *
    * A session closes when (a) a later event for the same user
    * arrives more than `gapMs` after the previous one, or (b) the
    * event-time watermark passes lastTs + gapMs (EventTimeTimeout) —
    * so state is bounded by the watermark and closed sessions are
    * emitted exactly once (Append mode).
    */
  def gapSessions(events: Dataset[Event],
      gapMs: Long = 4L * 3600 * 1000): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    def close(uid: Long, s: GapSessionState): ClosedSession =
      ClosedSession(uid, new Timestamp(s.sessionStart), s.nEvents,
        (s.lastTs - s.sessionStart) / 1000)
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GapSessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, batch, state: GroupState[GapSessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(close(uid, s))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            var st = state.getOption.orNull
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (st == null) st = GapSessionState(t, t, 1L)
              else if (t - st.lastTs > gapMs) {
                out += close(uid, st)
                st = GapSessionState(t, t, 1L)
              } else st = GapSessionState(st.sessionStart,
                math.max(st.lastTs, t), st.nEvents + 1)
            }
            state.update(st)
            // the timeout must sit at-or-after the watermark; a
            // session whose close point the watermark already passed
            // times out on the next trigger
            state.setTimeoutTimestamp(math.max(st.lastTs + gapMs,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Streaming MERGE sink: every micro-batch is applied to the target
    * parquet table with last-write-wins semantics (K5) inside
    * foreachBatch — the streaming twin of the bronze raw-response sink.
    * Checkpointing makes this exactly-once at the table level: replays
    * re-apply idempotent merges (T4).
    */
  def mergeSink(stream: DataFrame, targetDir: String,
      checkpointDir: String, keys: Seq[String], orderCol: String) =
    stream.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val target = scala.util.Try(spark.read.parquet(targetDir)).toOption
        val merged = target match {
          case Some(existing) => graft.operators.Upsert.lastWriteWins(
            existing.unionByName(batch.toDF()), keys, orderCol)
          case None => batch.toDF()
        }
        // overwrite-after-merge; at scale this is a MERGE INTO on a
        // transactional table instead of a full rewrite
        merged.cache().count()
        merged.write.mode("overwrite").parquet(targetDir)
        merged.unpersist()
        ()
      }
}
