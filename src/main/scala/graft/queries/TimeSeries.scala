package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the events table: gap-filled resampling
  * with last-observation-carried-forward, and range-based (time-
  * interval) rolling windows — the two shapes BI/feature pipelines
  * need that plain row-frame windows (W1-W4) can't express.
  *
  * Scale: the spine join and the LOCF window both partition on
  * user_id — one shuffle, reused by both steps; the rolling window
  * sorts within user partitions only (no global sort until the
  * deterministic output ORDER BY).
  */
object TimeSeries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  val queries: Map[String, Q] = Map(
    // Hourly resample + LOCF: build each user's hour spine (min..max),
    // take the last value per present hour (max(struct) — partial agg,
    // no sort), left-join the spine, carry the last non-null forward.
    "ts1_resample_locf" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val hourly = e
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .agg(max(struct(col("ts"), col("event_id"), col("value")))
          .as("last"))
        .select(col("user_id"), col("h"),
          round(col("last.value"), 2).as("v"))
      val spine = e.groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("h0"),
          date_trunc("hour", max(col("ts"))).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"),
            expr("INTERVAL 1 HOUR"))).as("h"))
      val locf = Window.partitionBy(col("user_id")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(hourly, Seq("user_id", "h"), "left")
        .withColumn("value_locf",
          last(col("v"), ignoreNulls = true).over(locf))
        .select(col("user_id"),
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("value_locf"), col("v").isNull.cast("int").as("filled"))
        .orderBy(col("user_id"), col("hour"))
    }),

    // Hourly resample + LINEAR interpolation — ts1's other standard
    // fill mode: each missing hour takes
    //   v0 + (v1 - v0) · (h - h0) / (h1 - h0)
    // between its last known (h0, v0) and next known (h1, v1). The
    // spine is bounded by each user's min/max event hour, so interior
    // nulls ALWAYS have both neighbours — no edge policy needed.
    // Numerics: values ride integer cents (ts2's discipline), the
    // interpolant is integer milli-cents with ONE floor of a double
    // quotient whose operands are exact small integers — bit-identical
    // IEEE in both engines, no rounding-mode or summation-order risk
    // (integer DIV would differ on negative deltas: Spark truncates,
    // DuckDB floors — floor() sidesteps that trap explicitly). Both
    // lookback and lookahead windows share ONE partition sort.
    "ts4_resample_interp" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val hourly = e
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .agg(max(struct(col("ts"), col("event_id"), col("value")))
          .as("last"))
        .select(col("user_id"), col("h"),
          round(col("last.value") * 100).cast("long").as("vc"))
      val spine = e.groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("h0"),
          date_trunc("hour", max(col("ts"))).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"),
            expr("INTERVAL 1 HOUR"))).as("h"))
      val wPrev = Window.partitionBy(col("user_id")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy(col("user_id")).orderBy(col("h"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val hi = call_function("div", unix_micros(col("h")),
        lit(3600000000L))
      spine.join(hourly, Seq("user_id", "h"), "left")
        .withColumn("hi", hi)
        .withColumn("v0", last(col("vc"), ignoreNulls = true).over(wPrev))
        .withColumn("p0", last(when(col("vc").isNotNull, col("hi")),
          ignoreNulls = true).over(wPrev))
        .withColumn("v1", first(col("vc"), ignoreNulls = true).over(wNext))
        .withColumn("p1", first(when(col("vc").isNotNull, col("hi")),
          ignoreNulls = true).over(wNext))
        .select(col("user_id"),
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          when(col("vc").isNotNull, col("vc") * 1000)
            .otherwise(col("v0") * 1000 +
              floor(((col("v1") - col("v0")) * 1000 *
                (col("hi") - col("p0"))).cast("double") /
                (col("p1") - col("p0")).cast("double")).cast("long"))
            .as("value_milli_cents"),
          col("vc").isNull.cast("int").as("filled"))
        .orderBy(col("user_id"), col("hour"))
    }),

    // Range-frame rolling aggregates: count + avg of each user's
    // events in the hour BEFORE each event (inclusive), keyed on
    // epoch microseconds so both engines bound the frame identically
    // (events carry sub-second components; never range over seconds).
    "ts2_rolling_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3600L * 1000000L, 0L)
      // values are exact 2-decimal — sum in integer cents so the
      // sliding-frame accumulation is EXACT (a float running sum with
      // add/remove drifts by ulps; and round() on the exact-half
      // quotients of an avg disagrees between engines — Spark rounds
      // the decimal string, DuckDB the binary double — so emit the
      // exact sum, not a rounded average)
      t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_1h"),
          (sum(col("cents")).over(w).cast("double") / 100.0)
            .as("sum_1h"))
        .orderBy(col("event_id"))
    }),

    // Gap-based batch sessionization (the batch twin of st3's
    // streaming session_window): a new session starts when the gap
    // since the user's previous event exceeds 4 hours; session_id =
    // running count of session starts. Both windows share ONE
    // partition-sort on (user_id, ts) — Spark plans a single
    // Exchange+Sort for the lag and the cumulative sum. At 100 TB
    // this is the canonical "one shuffle, two window passes" shape.
    "ts3_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val e = t(s, dir, "events")
        .withColumn("gap_s",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1)
            .over(byUser))
        .withColumn("new_session",
          (col("gap_s").isNull || col("gap_s") > 4L * 3600 * 1000000L)
            .cast("long"))
        .withColumn("session_id", sum(col("new_session"))
          .over(byUser.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      e.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          // integer seconds (div truncates; both durations are >= 0 so
          // it agrees with DuckDB's floor //) — a double quotient here
          // would hash-compare floats
          expr("(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000")
            .as("duration_s"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // Exponentially-weighted moving value, alpha = 1/2, truncated at
    // 8 taps: ewma_x256 = sum_{k=0..7} cents[t-k] * 2^(7-k) — the
    // truncated-geometric EWMA in EXACT scaled integers (x256), so
    // there is no float accumulation at all: true recursive EWMA
    // (s = s/2 + x/2) carries infinite history as an irrational
    // float; 8 taps of alpha=1/2 keep >99.6% of the mass and make the
    // whole signal integer arithmetic, identical in any engine. ONE
    // partition-sort per user feeds all 8 lag() taps (Spark plans a
    // single Window node); at 100 TB this shuffles each user's rows
    // once — the same shape as ts3.
    "ts5_ewma" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val e = t(s, dir, "events")
        .withColumn("cents", round(col("value") * 100).cast("long"))
      val taps = (0 to 7).map(k =>
        coalesce(lag(col("cents"), k).over(w), lit(0L)) *
          lit(1L << (7 - k)))
      e.select(col("event_id"), col("user_id"), col("cents"),
          taps.reduce(_ + _).as("ewma_x256"))
        .orderBy(col("event_id"))
    }),

    // Hour-of-day seasonality profile + residual outlier census — the
    // simplest seasonal decomposition (mean-by-phase), kept EXACT:
    // the per-(type, hour) mean rides as milli-cents via integer
    // div, and the "residual > 50 cents" test is the cross-
    // multiplication |cents·n − sum| > 50·n — zero floats anywhere.
    // One aggregation builds the 24×5 profile (broadcast back), one
    // conditional-aggregate scan counts residual outliers. At 100 TB
    // the profile is O(types×24) — always broadcastable.
    "ts6_seasonality" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .withColumn("hod", hour(col("ts")).cast("long"))
      val prof = e.groupBy(col("event_type"), col("hod"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      e.join(broadcast(prof), Seq("event_type", "hod"))
        .groupBy(col("event_type"), col("hod"))
        .agg(first(col("n")).as("n"),
          first(col("sum_cents")).as("sum_cents"),
          sum(when(abs(col("cents") * col("n") - col("sum_cents")) >
            lit(5000L) * col("n"), 1L).otherwise(0L))
            .as("n_outliers"))
        .withColumn("mean_milli", call_function("div",
          col("sum_cents") * 1000L, col("n")))
        .select(col("event_type"), col("hod"), col("n"),
          col("sum_cents"), col("mean_milli"), col("n_outliers"))
        .orderBy(col("event_type"), col("hod"))
    })
  )

  val oracle: Map[String, String] = Map(
    "ts1_resample_locf" ->
      """WITH hourly AS (
           SELECT user_id, h, round(value, 2) AS v FROM (
             SELECT user_id, date_trunc('hour', ts) AS h, value,
               row_number() OVER (PARTITION BY user_id,
                 date_trunc('hour', ts)
                 ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
             FROM events) WHERE rn = 1),
         bounds AS (SELECT user_id, date_trunc('hour', min(ts)) AS h0,
             date_trunc('hour', max(ts)) AS h1
           FROM events GROUP BY 1),
         spine AS (SELECT user_id, unnest(generate_series(h0, h1,
             INTERVAL 1 HOUR)) AS h FROM bounds)
         SELECT s.user_id,
           strftime(s.h, '%Y-%m-%d %H:%M:%S') AS hour,
           last_value(v IGNORE NULLS) OVER (PARTITION BY s.user_id
             ORDER BY s.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS value_locf,
           CAST(v IS NULL AS INT) AS filled
         FROM spine s LEFT JOIN hourly USING (user_id, h)
         ORDER BY user_id, hour""",
    // same spine; the interpolant's floor(double quotient) replays
    // bit-identically (operands are exact small integers)
    "ts4_resample_interp" ->
      """WITH hourly AS (
           SELECT user_id, h, CAST(round(value*100) AS BIGINT) AS vc
           FROM (
             SELECT user_id, date_trunc('hour', ts) AS h, value,
               row_number() OVER (PARTITION BY user_id,
                 date_trunc('hour', ts)
                 ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
             FROM events) WHERE rn = 1),
         bounds AS (SELECT user_id, date_trunc('hour', min(ts)) AS h0,
             date_trunc('hour', max(ts)) AS h1
           FROM events GROUP BY 1),
         spine AS (SELECT user_id, unnest(generate_series(h0, h1,
             INTERVAL 1 HOUR)) AS h FROM bounds),
         j AS (SELECT s.user_id, s.h,
             epoch_us(s.h) // 3600000000 AS hi, vc
           FROM spine s LEFT JOIN hourly USING (user_id, h)),
         w AS (SELECT user_id, h, hi, vc,
             last_value(vc IGNORE NULLS) OVER wp AS v0,
             last_value(CASE WHEN vc IS NOT NULL THEN hi END
               IGNORE NULLS) OVER wp AS p0,
             first_value(vc IGNORE NULLS) OVER wn AS v1,
             first_value(CASE WHEN vc IS NOT NULL THEN hi END
               IGNORE NULLS) OVER wn AS p1
           FROM j
           WINDOW wp AS (PARTITION BY user_id ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wn AS (PARTITION BY user_id ORDER BY h
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           CASE WHEN vc IS NOT NULL THEN vc * 1000
             ELSE v0 * 1000 + CAST(floor(
               ((v1 - v0) * 1000 * (hi - p0))::DOUBLE / (p1 - p0))
               AS BIGINT) END AS value_milli_cents,
           CAST(vc IS NULL AS INT) AS filled
         FROM w ORDER BY user_id, hour""",
    "ts2_rolling_window" ->
      """SELECT event_id, user_id,
         count(*) OVER w AS n_1h,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
             AS BIGINT) / 100.0 AS sum_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "ts3_sessionize" ->
      """WITH marked AS (
           SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                  > 14400000000::BIGINT THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
         sess AS (
           SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
           FROM marked)
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
             AS duration_s
         FROM sess GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",
    // 8 integer taps, weight 2^(7-k) on lag k; missing history -> 0
    "ts5_ewma" ->
      """SELECT event_id, user_id,
           CAST(round(value * 100) AS BIGINT) AS cents,
           CAST(coalesce(lag(CAST(round(value*100) AS BIGINT), 0) OVER w, 0) * 128
             + coalesce(lag(CAST(round(value*100) AS BIGINT), 1) OVER w, 0) * 64
             + coalesce(lag(CAST(round(value*100) AS BIGINT), 2) OVER w, 0) * 32
             + coalesce(lag(CAST(round(value*100) AS BIGINT), 3) OVER w, 0) * 16
             + coalesce(lag(CAST(round(value*100) AS BIGINT), 4) OVER w, 0) * 8
             + coalesce(lag(CAST(round(value*100) AS BIGINT), 5) OVER w, 0) * 4
             + coalesce(lag(CAST(round(value*100) AS BIGINT), 6) OVER w, 0) * 2
             + coalesce(lag(CAST(round(value*100) AS BIGINT), 7) OVER w, 0)
             AS BIGINT) AS ewma_x256
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         ORDER BY event_id""",
    // profile + cross-multiplied residual test, all integers
    "ts6_seasonality" ->
      """WITH e AS (SELECT event_type, hour(ts) AS hod,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         prof AS (SELECT event_type, hod, count(*) AS n,
             CAST(sum(cents) AS BIGINT) AS sum_cents
           FROM e GROUP BY 1, 2)
       SELECT e.event_type, e.hod, any_value(p.n) AS n,
         any_value(p.sum_cents) AS sum_cents,
         (any_value(p.sum_cents) * 1000) // any_value(p.n)
           AS mean_milli,
         CAST(sum(CASE WHEN abs(e.cents * p.n - p.sum_cents)
           > 5000 * p.n THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       FROM e JOIN prof p
         ON p.event_type = e.event_type AND p.hod = e.hod
       GROUP BY e.event_type, e.hod
       ORDER BY e.event_type, e.hod"""
  )
}
