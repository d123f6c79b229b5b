package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 sink semantics (K1–K5) re-expressed as pure-Spark
  * MERGE emulations. The reference does per-row SQLite
  * INSERT OR REPLACE / ON CONFLICT DO UPDATE; at 100 TB the same
  * semantics are a keyed shuffle: union old+new, window by the primary
  * key with source precedence, keep rank 1. One shuffle on the PK, no
  * driver involvement. (With a transactional table format this becomes
  * a real MERGE INTO; the dedup-window emulation below is
  * format-agnostic.)
  *
  * The "old" and "new" generations are derived deterministically from
  * the testdata so the DuckDB oracle can rebuild the identical inputs.
  */
object Upserts {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  val queries: Map[String, Q] = Map(
    // K1 — full-row upsert (INSERT OR REPLACE by PK, users.py:101-106):
    // new generation replaces the whole row; rows absent from new
    // survive from old.
    "k1_upsert_full_row" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val old = o.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), lit(0).as("src"))
      val neu = o.filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          round(col("o_totalprice") + 100000.0, 2).as("o_totalprice"),
          lit(1).as("src"))
      val w = Window.partitionBy(col("o_orderkey"))
        .orderBy(col("src").desc)
      old.unionByName(neu)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // K2 — partial-column upsert (ON CONFLICT DO UPDATE SET
    // col=excluded.col, _customized_items.py:130-136): update listed
    // columns from new, keep the rest from old. Left join + coalesce —
    // old is the driving side so unmatched keys pass through.
    "k2_upsert_partial" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val updates = o.filter(col("o_totalprice") > 300000.0)
        .select(col("o_orderkey").as("uk"), lit("X").as("new_status"))
      o.join(updates, col("o_orderkey") === col("uk"), "left")
        .select(col("o_orderkey"),
          coalesce(col("new_status"), col("o_orderstatus"))
            .as("o_orderstatus"),
          col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // K3 — insert-if-absent with NULL-safe key compare
    // (WHERE NOT EXISTS (... IS NULL AND ... IS NULL) OR ...,
    // users.py:114-126): left-anti join on `<=>` then union.
    "k3_insert_if_absent" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      // nullable key: nation 13 maps to NULL — the NULL key must dedup
      // against itself (SQLite's NULL-safe pattern), which plain
      // equality would not do.
      val existing = c.filter(col("c_custkey") <= 75)
        .select(nullif(col("c_nationkey"), lit(13)).as("k")).distinct()
      val incoming = c
        .select(nullif(col("c_nationkey"), lit(13)).as("k")).distinct()
      val toInsert = incoming.join(existing,
        incoming("k") <=> existing("k"), "left_anti")
      existing.select(col("k"), lit("kept").as("src"))
        .unionByName(toInsert.select(col("k"), lit("inserted").as("src")))
        .orderBy(col("k"), col("src"))
    }),

    // K4 — diff-delete / set reconciliation (delete child rows absent
    // from the new payload, users.py:128-135): semi-join old children
    // against the new child-key set ("replace children per parent").
    "k4_diff_delete" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val newPayload = l.filter(col("l_quantity") >= 10.0)
        .select(col("l_orderkey").as("nk"), col("l_linenumber").as("nl"),
          col("l_partkey").as("np"))
      l.join(newPayload,
          l("l_orderkey") === col("nk") && l("l_linenumber") === col("nl")
            && l("l_partkey") === col("np"),
          "left_semi")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_kept"),
          round(sum(col("l_quantity")), 2).as("qty_kept"))
        .orderBy(col("l_orderkey"))
    }),

    // K5 — raw-response sink with replace-on-conflict
    // (api_client.py:336-383: UNIQUE ... ON CONFLICT REPLACE): bronze
    // last-write-wins dedup keyed (api_type, key) by arrival time.
    "k5_lastwrite_dedup" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      e.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          round(col("value"), 6).as("value"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // K6 — SCD type-2 dimension history (the warehouse-side sink the
    // reference's replace-style sinks can't express): each user's
    // event-type stream becomes a versioned dimension — consecutive
    // identical values collapse, every actual change opens a
    // [valid_from, valid_to) version, the last version per key stays
    // open. Ordering key = (unix_micros, event_id) in BOTH engines
    // (events.ts is ns parquet; raw-ts order would diverge).
    "k6_scd2_history" -> ((s, dir) => {
      val log = t(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("event_type"))
      graft.operators.Upsert
        .scd2FromLog(log, "user_id", "event_type", "us", "event_id")
        // event_type makes the sort total: two same-microsecond
        // changes share valid_from but adjacent versions always differ
        .orderBy(col("user_id"), col("valid_from_us"), col("event_type"))
    }),

    // CDC merge-apply (the Debezium/Delta MERGE shape): a change log
    // of I/U/D ops collapses to final state — last op per key wins,
    // keys whose last op is a delete vanish. ONE shuffle on the key
    // with map-side partial max(struct) — never a window sort over
    // the log (the log is the 100 TB side; the state is the small
    // side). Ops derive deterministically from event_type.
    "k7_cdc_apply" -> ((s, dir) => {
      val log = t(s, dir, "events").select(
        col("user_id"),
        unix_micros(col("ts")).as("us"),
        col("event_id"),
        when(col("event_type") === "error", lit("D"))
          .when(col("event_type").isin("purchase", "signup"), lit("I"))
          .otherwise(lit("U")).as("op"),
        round(col("value") * 100).cast("long").as("cents"))
      log.groupBy(col("user_id")).agg(
          max(struct(col("us"), col("event_id"), col("op"),
            col("cents"))).as("f"),
          count(lit(1)).as("n_ops"))
        .filter(col("f.op") =!= "D")
        .select(col("user_id"), col("f.us").as("last_us"),
          col("n_ops"), col("f.cents").as("final_cents"))
        .orderBy(col("user_id"))
    }),

    // Point-in-time join against the SCD2 dimension k6 builds — the
    // temporal-correctness query a feature store runs ("which version
    // was active WHEN"): one deterministic probe instant per user,
    // matched to the version whose [valid_from, valid_to) contains
    // it. The equi key (user_id) carries the join — the interval
    // test is a residual conjunct, so this is a plain hash/merge
    // join at any scale, never a range scan; each probe matches at
    // most one version by construction.
    "k8_scd2_pit" -> ((s, dir) => {
      val log = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"))
      val dim = graft.operators.Upsert
        .scd2FromLog(log, "user_id", "event_type", "us", "event_id")
      val base = lit(1705320000000000L) // 2024-01-15T12:00:00Z µs
      val probes = t(s, dir, "events").select(col("user_id")).distinct()
        .select(col("user_id"),
          (base + pmod(col("user_id"), lit(86400L)) * 1000000L)
            .as("p_us"))
      probes.join(dim, Seq("user_id"))
        .filter(col("valid_from_us") <= col("p_us") &&
          (col("valid_to_us").isNull ||
            col("p_us") < col("valid_to_us")))
        .select(col("user_id"), col("p_us"),
          col("event_type").as("version_at_probe"),
          col("valid_from_us"))
        .orderBy(col("user_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    // last op per key by (us, event_id); delete-last keys drop out
    "k7_cdc_apply" ->
      """WITH log AS (
           SELECT user_id, epoch_us(ts) AS us, event_id,
             CASE WHEN event_type = 'error' THEN 'D'
               WHEN event_type IN ('purchase', 'signup') THEN 'I'
               ELSE 'U' END AS op,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         r AS (SELECT *, row_number() OVER (PARTITION BY user_id
               ORDER BY us DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_ops
           FROM log)
         SELECT user_id, us AS last_us, n_ops, cents AS final_cents
         FROM r WHERE rn = 1 AND op <> 'D' ORDER BY user_id""",
    "k1_upsert_full_row" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
           SELECT *, row_number() OVER (PARTITION BY o_orderkey
             ORDER BY src DESC) AS rn
           FROM (
             SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS src
             FROM orders
             UNION ALL
             SELECT o_orderkey, 'U', round(o_totalprice + 100000.0, 2),
               1 AS src
             FROM orders WHERE o_orderstatus = 'O'))
         WHERE rn = 1 ORDER BY o_orderkey""",
    "k2_upsert_partial" ->
      """SELECT o_orderkey,
         coalesce(u.new_status, o_orderstatus) AS o_orderstatus,
         o_totalprice
         FROM orders
         LEFT JOIN (SELECT o_orderkey AS uk, 'X' AS new_status
           FROM orders WHERE o_totalprice > 300000.0) u
           ON o_orderkey = u.uk
         ORDER BY o_orderkey""",
    "k3_insert_if_absent" ->
      """WITH existing AS (
           SELECT DISTINCT NULLIF(c_nationkey, 13) AS k FROM customer
           WHERE c_custkey <= 75),
         incoming AS (
           SELECT DISTINCT NULLIF(c_nationkey, 13) AS k FROM customer)
         SELECT k, 'kept' AS src FROM existing
         UNION ALL
         SELECT k, 'inserted' AS src FROM incoming i
         WHERE NOT EXISTS (SELECT 1 FROM existing e
           WHERE e.k IS NOT DISTINCT FROM i.k)
         ORDER BY k, src""",
    "k4_diff_delete" ->
      """SELECT l_orderkey, count(*) AS n_kept,
         round(sum(l_quantity),2) AS qty_kept
         FROM lineitem l
         WHERE EXISTS (SELECT 1 FROM lineitem n
           WHERE n.l_quantity >= 10.0 AND n.l_orderkey = l.l_orderkey
             AND n.l_linenumber = l.l_linenumber
             AND n.l_partkey = l.l_partkey)
         GROUP BY l_orderkey ORDER BY l_orderkey""",
    "k5_lastwrite_dedup" ->
      """SELECT user_id, event_type, event_id,
         round(value,6) AS value FROM (
           SELECT *, row_number() OVER (
             PARTITION BY user_id, event_type
             ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
           FROM events)
         WHERE rn = 1 ORDER BY user_id, event_type""",
    // change-detect (IS DISTINCT FROM lag) + interval assignment via
    // lead over the collapsed rows — the same two-window build
    "k6_scd2_history" ->
      """WITH log AS (SELECT user_id, epoch_us(ts) AS us, event_id,
             event_type FROM events),
         ch AS (SELECT user_id, us, event_id, event_type FROM (
             SELECT *, lag(event_type) OVER (PARTITION BY user_id
               ORDER BY us, event_id) AS prev,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY us, event_id) AS rn
             FROM log)
           WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
         v AS (SELECT user_id, event_type, us AS valid_from_us,
             lead(us) OVER (PARTITION BY user_id
               ORDER BY us, event_id) AS valid_to_us
           FROM ch)
         SELECT user_id, event_type, valid_from_us, valid_to_us,
           CAST(valid_to_us IS NULL AS INT) AS is_current
         FROM v ORDER BY user_id, valid_from_us, event_type""",
    // k6's versioning CTEs + one probe instant per user
    "k8_scd2_pit" ->
      """WITH log AS (SELECT user_id, epoch_us(ts) AS us, event_id,
             event_type FROM events),
         ch AS (SELECT user_id, us, event_id, event_type FROM (
             SELECT *, lag(event_type) OVER (PARTITION BY user_id
               ORDER BY us, event_id) AS prev,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY us, event_id) AS rn
             FROM log)
           WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
         v AS (SELECT user_id, event_type, us AS valid_from_us,
             lead(us) OVER (PARTITION BY user_id
               ORDER BY us, event_id) AS valid_to_us
           FROM ch),
         probes AS (SELECT DISTINCT user_id,
             1705320000000000 + (user_id % 86400) * 1000000 AS p_us
           FROM events)
       SELECT p.user_id, p.p_us, v.event_type AS version_at_probe,
         v.valid_from_us
       FROM probes p JOIN v ON v.user_id = p.user_id
         AND v.valid_from_us <= p.p_us
         AND (v.valid_to_us IS NULL OR p.p_us < v.valid_to_us)
       ORDER BY p.user_id"""
  )
}
