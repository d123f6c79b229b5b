package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.6 (windows/sorts/limits) and §2.7 (set operations). */
object WindowsSets {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  val queries: Map[String, Q] = Map(
    // W1 — multi-column output ordering (create_views.sql:363-364).
    // events.ts is ns in parquet (Spark truncates to µs, DuckDB keeps
    // ns) so the emitted timestamp is truncated to seconds in BOTH.
    "w1_order_by" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          date_trunc("second", col("ts")).as("ts_sec"))
        .orderBy(col("ts_sec"), col("event_id"))
    }),

    // W2 — ordered array element assembly (ORDER BY inside scalar
    // subquery, _expense.py:319-344): per-user event ids ordered by
    // time, emitted as a string (array columns don't hash portably).
    "w2_ordered_array" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val sorted = array_sort(collect_list(struct(
        col("ts").as("t"), col("event_id").as("i"))))
      e.groupBy(col("user_id"))
        .agg(concat_ws(",",
          transform(sorted, x => x.getField("i").cast("string")))
          .as("event_seq"))
        .orderBy(col("user_id"))
    }),

    // W3 — enumerate-on-write (`for i, x in enumerate(...)` →
    // item_index, _customized_items.py:129-136): real window row_number
    // replaces the reference's driver-side counter.
    "w3_enumerate_index" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_shipdate"), col("l_linenumber"))
      l.withColumn("item_index", row_number().over(w) - 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("item_index"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // W4 — top-k (absent from the reference; first-class here because
    // every training-data pipeline needs it). Spark plans orderBy+limit
    // as TakeOrderedAndProject: per-partition top-k then a k-row merge
    // on the driver — no global sort at 100 TB.
    "w4_topk_limit" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // W5 — rank-family window functions (ntile quartiles,
    // percent_rank, cume_dist) per return flag: the BI/feature-
    // binning surface W1-W4 doesn't cover. The float ranks are exact
    // rationals ((rank-1)/(n-1), peers/n) both engines compute
    // identically from the same total order; round(,9) guards the
    // compare. One shuffle on the partition key.
    "w5_rank_functions" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"), col("l_orderkey"),
          col("l_linenumber"))
      t(s, dir, "lineitem").filter(col("l_orderkey") < 200)
        .select(col("l_returnflag"), col("l_orderkey"),
          col("l_linenumber"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 9).as("pct_rank"),
          round(cume_dist().over(w), 9).as("cdist"))
        .orderBy(col("l_returnflag"), col("l_orderkey"),
          col("l_linenumber"))
    }),

    // U1 — UNION ALL of two branch scans
    // (_default_attachment_files.py:69).
    "u1_union_all" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val open = o.filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), lit("open").as("src"))
      val big = o.filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"), lit("big").as("src"))
      open.unionByName(big)
        .orderBy(col("o_orderkey"), col("src"))
    }),

    // U2 — id-set difference (resume logic: outline ∪ unfinished −
    // ignore, gateway.py:498-507). EXCEPT dedups in both engines; at
    // scale this is a shuffle on the id — exactly the left-anti join
    // Catalyst plans for Except.
    "u2_set_difference" -> ((s, dir) => {
      val open = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"))
      val returned = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o_orderkey"))
      open.except(returned).orderBy(col("o_orderkey"))
    }),

    // U3 — union-distinct of two API sweeps (normal + canceled,
    // api_client.py:575-595).
    "u3_union_distinct" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val sweep1 = e.filter(col("event_type") === "purchase")
        .select(col("user_id"))
      val sweep2 = e.filter(col("event_type") === "signup")
        .select(col("user_id"))
      sweep1.union(sweep2).distinct().orderBy(col("user_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "w1_order_by" ->
      """SELECT event_id, user_id, date_trunc('second', ts) AS ts_sec
         FROM events ORDER BY ts_sec, event_id""",
    "w2_ordered_array" ->
      """SELECT user_id,
         string_agg(CAST(event_id AS VARCHAR), ','
           ORDER BY epoch_us(ts), event_id) AS event_seq
         FROM events GROUP BY user_id ORDER BY user_id""",
    "w3_enumerate_index" ->
      """SELECT l_orderkey, l_linenumber,
         row_number() OVER (PARTITION BY l_orderkey
           ORDER BY l_shipdate, l_linenumber) - 1 AS item_index
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "w4_topk_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
    "w5_rank_functions" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber,
         ntile(4) OVER w AS quartile,
         round(percent_rank() OVER w, 9) AS pct_rank,
         round(cume_dist() OVER w, 9) AS cdist
         FROM lineitem WHERE l_orderkey < 200
         WINDOW w AS (PARTITION BY l_returnflag
           ORDER BY l_quantity, l_orderkey, l_linenumber)
         ORDER BY l_returnflag, l_orderkey, l_linenumber""",
    "u1_union_all" ->
      """SELECT o_orderkey, 'open' AS src FROM orders
         WHERE o_orderstatus = 'O'
         UNION ALL
         SELECT o_orderkey, 'big' AS src FROM orders
         WHERE o_totalprice > 400000.0
         ORDER BY o_orderkey, src""",
    "u2_set_difference" ->
      """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
         EXCEPT
         SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
         ORDER BY o_orderkey""",
    "u3_union_distinct" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
         UNION
         SELECT user_id FROM events WHERE event_type = 'signup'
         ORDER BY user_id"""
  )
}
