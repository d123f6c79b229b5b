package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-windowed aggregations over the events table. The reference has
  * no streaming engine (SURVEY §2.10) — its closest analog is the
  * incremental watermark batch. We provide the real thing: these exact
  * plans run unchanged under Structured Streaming (`readStream` +
  * `withWatermark` — see `graft.streaming.EventStream`); here they run
  * in batch mode so the DuckDB oracle can check them.
  *
  * Scale: tumbling/sliding windows are hash aggregations on
  * (window, key) — map-side partial agg applies; session windows need
  * a per-key sort, bounded by `spark.sql.shuffle.partitions`.
  */
object StreamingBatch {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  val queries: Map[String, Q] = Map(
    // Tumbling 1-hour window: counts + sums per (window, event_type).
    "st1_tumbling_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_value"))
        .select(col("w.start").as("bucket_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("bucket_start"), col("event_type"))
    }),

    // Sliding 2-hour window, 1-hour slide: every event lands in 2
    // windows. The oracle replays it as two phase-shifted tumbling
    // passes.
    "st2_sliding_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("bucket_start"), col("n"))
        .orderBy(col("bucket_start"))
    }),

    // Session windows with a 30-minute inactivity gap, per user:
    // classic lag+cumsum sessionization — expressible identically in
    // both engines, and the streaming twin is
    // `session_window(col("ts"), "30 minutes")`.
    "st3_session_window" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sess = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull, lit(1))
            .when(unix_timestamp(col("ts")) -
              unix_timestamp(col("prev_ts")) > 1800, lit(1))
            .otherwise(lit(0)))
        .withColumn("session_id", sum(col("new_session")).over(sess))
        .groupBy(col("user_id"), col("session_id"))
        // Serialize the timestamp: raw timestamp cells hash differently
        // across engines (repo convention: no array- or timestamp-typed
        // output columns — render to string).
        .agg(date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // Streaming dedup, batch-checkable twin: first event per
    // (user_id, event_type) via min(struct) — map-side partial agg,
    // no sort. The streaming form is `EventStream.dedupFirstSeen`
    // (`dropDuplicatesWithinWatermark`, state bounded by watermark).
    "st4_stream_dedup" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(struct(col("ts"), col("event_id"))).as("first"))
        .select(col("user_id"), col("event_type"),
          col("first.event_id").as("first_event_id"),
          date_format(col("first.ts"), "yyyy-MM-dd HH:mm:ss")
            .as("first_ts"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // Stream-static enrichment: events joined to the customer dim
    // (broadcast — the dim is small and the join is shuffle-free),
    // aggregated per market segment. Streaming form:
    // `EventStream.enrich` — stream-static joins need no watermark.
    "st5_stream_static_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      t(s, dir, "events")
        .join(broadcast(c), col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("c_mktsegment"))
    }),

    // Stream-stream interval join, batch-checkable twin: purchases by
    // the same user within 10 minutes after each click. The streaming
    // form is `EventStream.followupJoin` (two watermarked streams,
    // time-range join condition bounds the buffered state on both
    // sides). LEFT join so clicks with no follow-up stay visible.
    "st6_stream_stream_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_uid"), col("ts").as("c_ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("ts").as("p_ts"))
      clicks.join(purchases,
          col("c_uid") === col("p_uid") &&
            col("p_ts") >= col("c_ts") &&
            col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"),
          "left")
        .groupBy(col("click_id"))
        .agg(count(col("p_uid")).as("n_purchases_10m"))
        .orderBy(col("click_id"))
    }),

    // Per-window ranked top-k, batch-checkable twin of
    // `EventStream.windowTopK` (custom flatMapGroupsWithState state —
    // rank needs the WHOLE window, which update-mode streaming aggs
    // can't give). Deterministic tie-break: count desc, then type.
    "st7_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("window_start"))
        .orderBy(col("n").desc, col("event_type"))
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .orderBy(col("window_start"), col("rank"))
    })
  )

  val oracle: Map[String, String] = Map(
    "st7_window_topk" ->
      """SELECT window_start, event_type, n, rank FROM (
           SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             event_type, count(*) AS n,
             CAST(row_number() OVER (
               PARTITION BY time_bucket(INTERVAL '1 hour', ts)
               ORDER BY count(*) DESC, event_type) AS INT) AS rank
           FROM events GROUP BY 1, 2)
         WHERE rank <= 3 ORDER BY window_start, rank""",
    "st1_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
         event_type, count(*) AS n, round(sum(value),2) AS sum_value
         FROM events GROUP BY 1,2 ORDER BY 1,2""",
    "st2_sliding_window" ->
      """SELECT bucket_start, count(*) AS n FROM (
           SELECT time_bucket(INTERVAL '2 hours', ts) AS bucket_start
           FROM events
           UNION ALL
           SELECT time_bucket(INTERVAL '2 hours', ts,
             INTERVAL '1 hour') AS bucket_start
           FROM events)
         GROUP BY bucket_start ORDER BY bucket_start""",
    "st3_session_window" ->
      """SELECT user_id, session_id,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         count(*) AS n_events
         FROM (
           -- CAST: DuckDB window sum() yields HUGEINT, which pandas
           -- renders float64 (1.0 vs Spark's bigint 1) → hash mismatch.
           SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id) AS BIGINT) AS session_id
           FROM (
             SELECT *, CASE WHEN prev_ts IS NULL THEN 1
               WHEN date_diff('second', prev_ts, ts) > 1800 THEN 1
               ELSE 0 END AS new_session
             FROM (
               SELECT *, lag(ts) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS prev_ts
               FROM events)))
         GROUP BY user_id, session_id ORDER BY user_id, session_id""",
    "st4_stream_dedup" ->
      """SELECT user_id, event_type, event_id AS first_event_id,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id,
             event_type ORDER BY epoch_us(ts), event_id) AS rn
           FROM events)
         WHERE rn = 1 ORDER BY user_id, event_type""",
    "st5_stream_static_join" ->
      """SELECT c_mktsegment, count(*) AS n_events,
         round(sum(value), 2) AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "st6_stream_stream_join" ->
      """SELECT c.event_id AS click_id,
         count(p.user_id) AS n_purchases_10m
         FROM (SELECT * FROM events WHERE event_type = 'click') c
         LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
           ON c.user_id = p.user_id
           AND p.ts >= c.ts
           AND p.ts <= c.ts + INTERVAL 10 MINUTE
         GROUP BY 1 ORDER BY click_id"""
  )
}
