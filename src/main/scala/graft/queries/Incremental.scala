package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1 source predicates (S3, S5) and §2.10 incremental
  * batch semantics (T1–T5): watermark scans, late-data sweeps,
  * open-status re-fetch, dead-letter anti-joins. The checkpointed
  * runtime lives in `graft.incr`; these queries express the pure
  * dataflow over the events/orders testdata with fixed watermark
  * literals so the oracle can replay them.
  *
  * Scale: every one of these is a partition-prunable predicate (at
  * 100 TB the bronze layer is partitioned by ingest date, so a
  * `ts >= watermark` scan touches only new partitions).
  */
object Incremental {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  private val W1 = "2024-01-15 00:00:00"
  private val W2 = "2024-01-25 00:00:00"

  val queries: Map[String, Q] = Map(
    // S3 — incremental scan predicate (applied_after= pushdown,
    // api_client.py:569-573): only records past the watermark.
    "s3_incremental_scan" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("ts") >= lit(W1).cast("timestamp"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_new"),
          round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // S5 — error-classified fetch results (status taxonomy,
    // api_client.py:390-453): Either-style classification column +
    // quarantine counts, instead of exceptions.
    "s5_error_classification" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("fetch_class",
          when(col("event_type") === "error" && col("value") >= 50.0,
            lit("fatal"))
            .when(col("event_type") === "error", lit("warning"))
            .otherwise(lit("ok")))
        .groupBy(col("fetch_class"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("fetch_class"))
    }),

    // T1 — per-group high-watermark capture (form_api_last_access,
    // gateway.py:417-418): the max event time per group, truncated to
    // seconds (ns parquet vs µs Spark, see Tables.load).
    "t1_watermark_capture" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(date_trunc("second", max(col("ts"))).as("high_watermark"),
          count(lit(1)).as("n_seen"))
        .orderBy(col("event_type"))
    }),

    // T2 — late/changed-data sweep (canceled_after_completion second
    // sweep, api_client.py:586-595): normal incremental window UNION a
    // targeted re-sweep with an older watermark, deduped.
    "t2_late_data_sweep" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val normal = e.filter(col("ts") >= lit(W2).cast("timestamp"))
        .select(col("event_id"))
      val resweep = e.filter(col("event_type") === "error" &&
          col("ts") >= lit(W1).cast("timestamp"))
        .select(col("event_id"))
      normal.union(resweep).distinct().orderBy(col("event_id"))
    }),

    // T3 — open-status re-fetch set (non-terminal requests re-pulled
    // every run, gateway.py:497-501): open ids ∪ fresh outline ids.
    "t3_open_status_refetch" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val open = o.filter(!col("o_orderstatus").isin("F"))
        .select(col("o_orderkey"))
      val outline = o
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_orderkey"))
      open.union(outline).distinct().orderBy(col("o_orderkey"))
    }),

    // T5 — dead-letter-queue selective retry (failure records anti-
    // joined into the next run's work list, status.py:277-575): the
    // work list minus ids that already failed this generation.
    "t5_dlq_anti_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val failed = e.filter(col("event_type") === "error" &&
        col("value") >= 80.0).select(col("user_id")).distinct()
      val worklist = e.filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct()
      worklist.join(failed, Seq("user_id"), "left_anti")
        .orderBy(col("user_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "s3_incremental_scan" ->
      s"""SELECT event_type, count(*) AS n_new,
         round(sum(value),2) AS sum_value
         FROM events WHERE ts >= TIMESTAMP '$W1'
         GROUP BY event_type ORDER BY event_type""",
    "s5_error_classification" ->
      """SELECT fetch_class, count(*) AS n,
         count(DISTINCT user_id) AS n_users FROM (
           SELECT CASE
             WHEN event_type = 'error' AND value >= 50.0 THEN 'fatal'
             WHEN event_type = 'error' THEN 'warning'
             ELSE 'ok' END AS fetch_class, user_id
           FROM events)
         GROUP BY fetch_class ORDER BY fetch_class""",
    "t1_watermark_capture" ->
      """SELECT event_type,
         date_trunc('second', max(ts)) AS high_watermark,
         count(*) AS n_seen
         FROM events GROUP BY event_type ORDER BY event_type""",
    "t2_late_data_sweep" ->
      s"""SELECT event_id FROM events WHERE ts >= TIMESTAMP '$W2'
         UNION
         SELECT event_id FROM events
         WHERE event_type = 'error' AND ts >= TIMESTAMP '$W1'
         ORDER BY event_id""",
    "t3_open_status_refetch" ->
      """SELECT o_orderkey FROM orders WHERE o_orderstatus NOT IN ('F')
         UNION
         SELECT o_orderkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '2000-01-01'
         ORDER BY o_orderkey""",
    "t5_dlq_anti_join" ->
      """SELECT DISTINCT user_id FROM events
         WHERE event_type = 'purchase'
           AND user_id NOT IN (SELECT user_id FROM events
             WHERE event_type = 'error' AND value >= 80.0)
         ORDER BY user_id"""
  )
}
