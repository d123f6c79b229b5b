package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / time-series analytics over the events stream:
  * rolling z-score anomaly detection (extends the ts family),
  * retention cohorts, and the event-transition census. All compared
  * output is exact integer arithmetic — the anomaly test is the
  * z² > 9 inequality cleared of its denominators,
  * (n·x − S)² > 9·(n·Q − S²), so no sqrt, no division, no float
  * drift between engines; probabilities ride as integer per-mille.
  */
object Behavior {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  val queries: Map[String, Q] = Map(

    // Rolling 24 h z-score anomaly detection per event type: flag
    // events more than 3 sigma from their trailing-window mean. The
    // window accumulates integer cents and cents² (exact; a float
    // running sum drifts by ulps as the frame slides), and the
    // z² > 9 test is cleared of denominators so the comparison is
    // integer-exact: (n·x−S)² > 9·(n·Q−S²). event_type alone is a
    // low-cardinality window key — at 100 TB one task would sort a
    // hot type's ENTIRE stream — AND Spark re-aggregates a sliding
    // range frame per row (O(n·w̄): measured ~quadratic in per-day
    // density on the sf0.5/sf1 scale-up sets), so the moments come
    // from TrailingAgg's boundary-marker prefix sums instead: one
    // global range sort, linear work, values IDENTICAL to the
    // unsalted window (the oracle replays the unsalted form).
    // SaltedWindow remains the right shape below w̄ ≈ a few hundred
    // rows/window; this query's density grows with SF, so it takes
    // the O(n log n) path.
    "ts7_rolling_anomaly" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        // Σx² stays a LONG sum (exact to ~9·10⁸ rows per 24 h per
        // type with cents ≤ 10⁵ — far past any real window; a
        // decimal accumulator here measured 3× slower).
        .withColumn("x", round(col("value") * 100).cast("long"))
        .select(col("event_id"), col("event_type"), col("us"), col("x"))
      graft.operators.TrailingAgg.countSumSq(ev, Seq("event_type"),
          "us", "event_id", "x", 86400L * 1000000L, carry = Seq("x"))
        .filter(col("n") >= 10)
        // The real int64 risk is the cleared inequality's products —
        // n²·max(x)² wraps around n ≈ 3·10⁴ — so the COMPARISON runs
        // in exact 128-bit (decimal(38) here, HUGEINT in the oracle);
        // the emitted columns carry no decimal
        .withColumn("dev",
          col("n").cast("decimal(38,0)") * col("x") - col("s"))
        .withColumn("lhs", col("dev") * col("dev"))
        .withColumn("rhs", lit(9L).cast("decimal(38,0)") *
          (col("n").cast("decimal(38,0)") * col("q") -
            col("s").cast("decimal(38,0)") * col("s")))
        .filter(col("lhs") > col("rhs"))
        .select(col("event_id"), col("event_type"), col("n").as("n_24h"))
        .orderBy(col("event_id"))
    }),

    // Retention cohorts: users grouped by first-seen week, counted in
    // each subsequent week they return. Weeks are exact integer
    // epoch-microsecond divisions (no date math ambiguity). Shapes:
    // one user-keyed agg for cohorts, one user-keyed equi-join back
    // to events (broadcastable when the user dimension fits; shuffle
    // join otherwise — AQE picks), one distinct + count.
    "xq9_retention_cohorts" -> ((s, dir) => {
      val weekUs = 7L * 86400L * 1000000L
      val ev = t(s, dir, "events")
        .select(col("user_id"),
          call_function("div", unix_micros(col("ts")), lit(weekUs))
            .as("week"))
      val cohorts = ev.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      ev.join(cohorts, Seq("user_id"))
        .select(col("user_id"), col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_k"))
        .distinct()
        .groupBy(col("cohort_week"), col("week_k"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_week"), col("week_k"))
    }),

    // OLAP rollup: the (status, priority) hierarchy totals BI tools
    // ask for — detail, per-status subtotal, grand total in ONE pass
    // (Catalyst plans grouping sets as a 3-way Expand over a single
    // scan with map-side partial aggregation; three separate
    // aggregations would scan three times). grouping_id
    // disambiguates subtotal levels; money rides as exact cents.
    "xq11_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long"))
            .as("cents"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("gid"), col("n"), col("cents"))
        .orderBy(col("gid"), col("status"), col("priority"))
    }),

    // Semi-structured analytics: the events.props JSON column queried
    // without a schema migration — extract, bucket, aggregate in one
    // scan (the "JSON columns are first-class" lake contract).
    "xq13_props_json" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        // negative-$.k parity is NOT latent-fragile: verified that
        // BOTH engines truncate integer division toward zero
        // (Spark div and DuckDB // each give -7/2 = -3), so plain
        // div agrees for every k, negative included
        .groupBy(col("event_type"),
          call_function("div", col("k"), lit(10L)).as("k_decade"))
        .agg(count(lit(1)).as("n"),
          min(col("k")).as("k_min"), max(col("k")).as("k_max"))
        .orderBy(col("event_type"), col("k_decade"))
    }),

    // Median absolute deviation per event type — the outlier-robust
    // spread measure (stddev is hostage to the outliers an anomaly
    // pipeline exists to find; MAD is not). EXACT, and never sorts
    // raw events: the xq6 value-distribution trick applied twice —
    // (type, cents) counts → cumulative-count lower median → absolute
    // deviations AGGREGATED ON THE SAME DISTRIBUTION (never back to
    // the events) → second cumulative median. All frames after the
    // first aggregation are bounded by #types × #distinct-cents.
    "xq14_mad" -> ((s, dir) => {
      val dist = graft.operators.ManagedCache.persist(
        t(s, dir, "events")
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .groupBy(col("event_type"), col("cents"))
          .agg(count(lit(1)).as("n")))
      val tot = dist.groupBy(col("event_type"))
        .agg(sum(col("n")).as("n_rows"))
      def lowerMedian(d: DataFrame, valCol: String,
          out: String): DataFrame = {
        val wcum = Window.partitionBy(col("event_type"))
          .orderBy(col(valCol))
        d.withColumn("cum", sum(col("n")).over(wcum))
          .join(broadcast(tot.select(col("event_type"),
            call_function("div", col("n_rows") + 1, lit(2L))
              .as("target"))), Seq("event_type"))
          .filter(col("cum") >= col("target"))
          .groupBy(col("event_type")).agg(min(col(valCol)).as(out))
      }
      val med = lowerMedian(dist, "cents", "median_cents")
      val devDist = dist.join(broadcast(med), Seq("event_type"))
        .groupBy(col("event_type"),
          abs(col("cents") - col("median_cents")).as("dev"))
        .agg(sum(col("n")).as("n"))
      val mad = lowerMedian(devDist, "dev", "mad_cents")
      med.join(mad, Seq("event_type")).join(tot, Seq("event_type"))
        .select(col("event_type"), col("median_cents"),
          col("mad_cents"), col("n_rows"))
        .orderBy(col("event_type"))
    }),

    // Event-transition census (first-order Markov chain of user
    // behavior): per-user next-event pairs via ONE lead window, then
    // a count aggregation; transition probabilities as exact integer
    // per-mille of the from-type total.
    "xq10_event_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = t(s, dir, "events")
        .select(col("user_id"), col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w).as("to_type"))
        .filter(col("to_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val wf = Window.partitionBy(col("from_type"))
      pairs
        .withColumn("p_mille", call_function("div",
          lit(1000L) * col("n"), sum(col("n")).over(wf)))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // Sequential-pattern census (PrefixSpan-lite): the top
    // CONTIGUOUS event-type trigrams ranked by USER SUPPORT (how
    // many distinct users exhibit the pattern at least once — the
    // support notion sequence mining uses, not raw occurrence
    // count), with occurrence totals beside. xq10's length-2
    // transition census extended one step: BOTH leads ride the SAME
    // user-keyed window sort (one exchange, high-cardinality key),
    // support = count(distinct user) after a (trigram, user) dedup
    // that map-side combines. Top-15 by (support desc, trigram) —
    // the behavioral motifs a funnel designer mines first.
    "xq20_trigram_sequences" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val tri = t(s, dir, "events")
        .select(col("user_id"), col("event_type").as("t1"),
          lead(col("event_type"), 1).over(w).as("t2"),
          lead(col("event_type"), 2).over(w).as("t3"))
        .filter(col("t3").isNotNull)
      val byUser = tri.groupBy(col("t1"), col("t2"), col("t3"),
          col("user_id"))
        .agg(count(lit(1)).as("k"))
      byUser.groupBy(col("t1"), col("t2"), col("t3"))
        .agg(count(lit(1)).as("user_support"),
          sum(col("k")).as("n_occurrences"))
        .orderBy(col("user_support").desc, col("t1"), col("t2"),
          col("t3"))
        .limit(15)
    })
  )

  val oracle: Map[String, String] = Map(
    "ts7_rolling_anomaly" ->
      """WITH roll AS (
           SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS x,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
               AS BIGINT) AS s,
             CAST(sum(CAST(round(value * 100) AS BIGINT) *
               CAST(round(value * 100) AS BIGINT)) OVER w
               AS BIGINT) AS q
           FROM events
           WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW))
         SELECT event_id, event_type, n AS n_24h
         FROM roll
         WHERE n >= 10
           AND (CAST(n AS HUGEINT)*x - s) * (CAST(n AS HUGEINT)*x - s)
             > 9 * (CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
         ORDER BY event_id""",

    "xq9_retention_cohorts" ->
      """WITH ev AS (SELECT user_id,
             epoch_us(ts) // 604800000000 AS week FROM events),
         cohorts AS (SELECT user_id, min(week) AS cohort_week
           FROM ev GROUP BY 1)
         SELECT cohort_week, week_k, count(*) AS n_users FROM (
           SELECT DISTINCT ev.user_id, cohort_week,
             week - cohort_week AS week_k
           FROM ev JOIN cohorts USING (user_id))
         GROUP BY 1, 2 ORDER BY cohort_week, week_k""",

    "xq11_rollup" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT)
             AS gid,
           count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             AS BIGINT) AS cents
         FROM orders
         GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         ORDER BY gid, status, priority""",

    "xq13_props_json" ->
      """SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) // 10
             AS k_decade,
           count(*) AS n,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS BIGINT) AS k_min,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS BIGINT) AS k_max
         FROM events GROUP BY 1, 2 ORDER BY event_type, k_decade""",

    "xq14_mad" ->
      """WITH dist AS (SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS cents,
             count(*) AS n
           FROM events GROUP BY 1, 2),
         tot AS (SELECT event_type, SUM(n) AS n_rows
           FROM dist GROUP BY 1),
         cum AS (SELECT event_type, cents, n,
             SUM(n) OVER (PARTITION BY event_type ORDER BY cents)
               AS cum
           FROM dist),
         med AS (SELECT event_type, MIN(cents) AS median_cents
           FROM cum JOIN tot USING (event_type)
           WHERE cum >= (n_rows + 1) // 2 GROUP BY event_type),
         devd AS (SELECT d.event_type,
             ABS(cents - median_cents) AS dev, SUM(n) AS n
           FROM dist d JOIN med USING (event_type) GROUP BY 1, 2),
         cum2 AS (SELECT event_type, dev, n,
             SUM(n) OVER (PARTITION BY event_type ORDER BY dev) AS cum
           FROM devd),
         mad AS (SELECT event_type, MIN(dev) AS mad_cents
           FROM cum2 JOIN tot USING (event_type)
           WHERE cum >= (n_rows + 1) // 2 GROUP BY event_type)
         SELECT event_type, median_cents, mad_cents,
           CAST(n_rows AS BIGINT) AS n_rows
         FROM med JOIN mad USING (event_type)
           JOIN tot USING (event_type)
         ORDER BY event_type""",

    "xq10_event_transitions" ->
      """WITH pairs AS (
           SELECT from_type, to_type, count(*) AS n FROM (
             SELECT event_type AS from_type,
               lead(event_type, 1) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS to_type
             FROM events)
           WHERE to_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n,
           CAST((1000 * n) // (sum(n) OVER (PARTITION BY from_type))
             AS BIGINT) AS p_mille
         FROM pairs ORDER BY from_type, to_type""",

    // same window sort, two leads; user support = distinct users
    // after the per-user dedup-count
    "xq20_trigram_sequences" ->
      """WITH tri AS (
           SELECT user_id, event_type AS t1,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
           FROM events
           WINDOW w AS (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id)),
         g AS (SELECT t1, t2, t3, user_id, count(*) AS k FROM tri
           WHERE t3 IS NOT NULL GROUP BY 1, 2, 3, 4)
       SELECT t1, t2, t3, count(*) AS user_support,
         CAST(sum(k) AS BIGINT) AS n_occurrences
       FROM g GROUP BY 1, 2, 3
       ORDER BY user_support DESC, t1, t2, t3 LIMIT 15"""
  )
}
