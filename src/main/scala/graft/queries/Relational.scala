package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operator coverage, one named query per operator ID in
  * SURVEY.md §2 (P/J/A classes), each expressed over the driver's
  * TPC-H-ish testdata so the DuckDB oracle can replay it.
  *
  * Conventions (driver contract):
  *  - every computed column is aliased identically in the DataFrame plan
  *    and the oracle SQL;
  *  - every query has a total deterministic ORDER BY (the oracle compare
  *    must not depend on Spark's partition order);
  *  - double aggregates are rounded to 2 decimals so the parallel
  *    (Spark) vs sequential (DuckDB) summation order can't flip a ULP.
  *
  * Scale notes are given per query: these run at sf0.001..0.1 locally
  * but are written for a 1000-executor cluster — dimension joins are
  * explicitly broadcast, aggregations rely on map-side partial
  * aggregation, and no query collects to the driver.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  val queries: Map[String, Q] = Map(
    // P1 — column projection with a derived column (create_views.sql:7-28
    // analog). Per-row arithmetic stays in whole-stage codegen; parquet
    // scan prunes to the 4 referenced columns.
    "p1_projection" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("net_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // P3 — equality filter on a constant (create_views.sql:467-468
    // analog). Filter is pushed to the parquet scan.
    "p3_eq_filter" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderstatus") === lit("O"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // P4 — IN-list filter (create_views.sql:335-336 analog).
    "p4_in_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // P5 — status anti-filter with a bound list (requests/_requests.py:
    // 240-248 analog: NOT IN over a status set).
    "p5_status_anti_filter" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(!col("o_orderstatus").isin("F"))
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // P6 — filter on a joined attribute (create_views.sql:274-275
    // analog: predicate evaluated after the join).
    "p6_filter_joined_attr" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
        .filter(col("c_mktsegment") === lit("BUILDING"))
        .select(col("o_orderkey"), col("c_name"))
        .orderBy(col("o_orderkey"))
    }),

    // P7 — theta-on-constant predicate inside the join condition
    // (create_views.sql:457-460 analog: LEFT JOIN ... ON key AND
    // attr='book'); rows that join but fail the constant get NULLs.
    "p7_join_const_pred" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      o.join(l,
          o("o_orderkey") === l("l_orderkey") &&
            l("l_returnflag") === lit("R"),
          "left")
        .groupBy(o("o_orderkey").as("o_orderkey"))
        .agg(count(l("l_orderkey")).as("n_returned"))
        .orderBy(col("o_orderkey"))
    }),

    // P8 — dynamic `WHERE id IN (?)` point-lookup list (users.py:204-206
    // analog). At scale this is a broadcast semi-join of the key list.
    "p8_dynamic_in_lookup" -> ((s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_custkey").isin(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L))
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
        .orderBy(col("c_custkey"))
    }),

    // J1 — left join fact→dimension (create_views.sql:25-28 analog).
    // Dimension explicitly broadcast: no shuffle of the fact side.
    "j1_left_join_dim" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
        .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("o_orderkey"))
    }),

    // J3 — chained multi-way left joins (create_views.sql:173-178
    // analog: requests→expense→ec). Snowflake chain region→nation→
    // customer, all broadcast (each dim ≪ fact).
    "j3_chained_left_joins" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
        .select(col("c_custkey"), col("n_name"), col("r_name"))
        .orderBy(col("c_custkey"))
    }),

    // J7 — double join of the same table under different constant
    // predicates (create_views.sql:455-460: fix_journals as book/pay).
    "j7_double_alias_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val lR = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .groupBy(col("l_orderkey").as("rk"))
        .agg(round(sum(col("l_quantity")), 2).as("qty_returned"))
      val lN = t(s, dir, "lineitem").filter(col("l_returnflag") === "N")
        .groupBy(col("l_orderkey").as("nk"))
        .agg(round(sum(col("l_quantity")), 2).as("qty_kept"))
      o.join(lR, o("o_orderkey") === lR("rk"), "left")
        .join(lN, o("o_orderkey") === lN("nk"), "left")
        .select(col("o_orderkey"), col("qty_returned"), col("qty_kept"))
        .orderBy(col("o_orderkey"))
    }),

    // J8 — equi join on a non-key string attribute with fan-out
    // tolerated, then re-grouped (create_views.sql:461-470 analog).
    "j8_nonkey_string_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      // nation name is non-unique on the customer side: classic fan-out
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "inner")
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("sum_bal"))
        .orderBy(col("n_name"))
    }),

    // J9 — inner join child→parent (create_views.sql:235-237 analog).
    "j9_inner_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"), "inner")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
        .orderBy(col("p_brand"))
    }),

    // J13 — FULL OUTER join (reconciliation reporting: keys present
    // on either side survive with nulls opposite), completing the
    // join-type surface next to inner/left/semi/anti. Two disjointly
    // filtered order slices ensure both null sides are exercised;
    // a shuffled hash/sort-merge join at scale — full-outer cannot
    // broadcast either side.
    "j13_full_outer_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("uk"), col("o_totalprice")
          .as("u_price"))
      val big = o.filter(col("o_totalprice") > 250000.0)
        .select(col("o_orderkey").as("bk"), col("o_orderstatus")
          .as("b_status"))
      urgent.join(big, col("uk") === col("bk"), "full_outer")
        .select(coalesce(col("uk"), col("bk")).as("o_orderkey"),
          col("u_price"), col("b_status"),
          (col("uk").isNotNull && col("bk").isNotNull).cast("int")
            .as("in_both"))
        .orderBy(col("o_orderkey"))
    }),

    // A1 — MAX(CASE WHEN idx=k THEN v END) pivot, the workhorse of every
    // CSV view (create_views.sql:309-323: 16 pivot columns keyed by
    // item_index). Explicit max(when(...)) per column keeps this a
    // single hash aggregate — no extra shuffle vs .pivot(), and
    // deterministic. Map-side partial agg makes this scale linearly.
    "a1_pivot_max_case" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val pivots = (1 to 4).map(k =>
        max(when(col("l_linenumber") === k, col("l_quantity")))
          .as(s"qty_$k"))
      l.groupBy(col("l_orderkey"))
        .agg(pivots.head, pivots.tail: _*)
        .orderBy(col("l_orderkey"))
    }),

    // A2 — ordered GROUP_CONCAT (view_request_approval_history,
    // create_views.sql:260-281: concat ordered by approved_date).
    // collect_list alone is nondeterministic after shuffle — the
    // ordering lives INSIDE the aggregation via array_sort on structs.
    "a2_ordered_string_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val sorted = array_sort(collect_list(struct(
        col("o_orderdate").as("d"), col("o_orderkey").as("k"))))
      o.groupBy(col("o_custkey"))
        .agg(concat_ws(", ",
          transform(sorted, x => x.getField("k").cast("string")))
          .as("order_history"))
        .orderBy(col("o_custkey"))
    }),

    // A4+A3 — COUNT(DISTINCT) guard + GROUP_CONCAT(DISTINCT) with NULL
    // sentinel (users.py:211-219). Sorted ascending so both engines
    // agree on concat order.
    "a3_distinct_string_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.groupBy(col("o_custkey"))
        .agg(
          countDistinct(col("o_orderstatus")).as("n_statuses"),
          concat_ws(",",
            array_sort(array_distinct(collect_list(col("o_orderstatus")))))
            .as("statuses"))
        .orderBy(col("o_custkey"))
    }),

    // A6 — GROUP BY with (redundant) multi-column keys
    // (create_views.sql:469-470 analog).
    "a6_groupby_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    })
  )

  val oracle: Map[String, String] = Map(
    "p1_projection" ->
      """SELECT l_orderkey, l_linenumber,
         l_extendedprice * (1.0 - l_discount) AS net_price
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "p3_eq_filter" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_orderstatus = 'O' ORDER BY o_orderkey""",
    "p4_in_filter" ->
      """SELECT l_returnflag, count(*) AS n_rows,
         round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem WHERE l_returnflag IN ('A','R')
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "p5_status_anti_filter" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         WHERE o_orderstatus NOT IN ('F') ORDER BY o_orderkey""",
    "p6_filter_joined_attr" ->
      """SELECT o_orderkey, c_name FROM orders
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING' ORDER BY o_orderkey""",
    "p7_join_const_pred" ->
      """SELECT o_orderkey, count(l_orderkey) AS n_returned
         FROM orders LEFT JOIN lineitem
           ON o_orderkey = l_orderkey AND l_returnflag = 'R'
         GROUP BY o_orderkey ORDER BY o_orderkey""",
    "p8_dynamic_in_lookup" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
         WHERE c_custkey IN (1,2,3,5,8,13,21,34) ORDER BY c_custkey""",
    "j1_left_join_dim" ->
      """SELECT o_orderkey, c_name, c_mktsegment FROM orders
         LEFT JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "j3_chained_left_joins" ->
      """SELECT c_custkey, n_name, r_name FROM customer
         LEFT JOIN nation ON c_nationkey = n_nationkey
         LEFT JOIN region ON n_regionkey = r_regionkey
         ORDER BY c_custkey""",
    "j7_double_alias_join" ->
      """SELECT o_orderkey, lr.qty_returned, ln.qty_kept
         FROM orders
         LEFT JOIN (SELECT l_orderkey AS rk,
             round(sum(l_quantity),2) AS qty_returned
           FROM lineitem WHERE l_returnflag='R' GROUP BY 1) lr
           ON o_orderkey = lr.rk
         LEFT JOIN (SELECT l_orderkey AS nk,
             round(sum(l_quantity),2) AS qty_kept
           FROM lineitem WHERE l_returnflag='N' GROUP BY 1) ln
           ON o_orderkey = ln.nk
         ORDER BY o_orderkey""",
    "j8_nonkey_string_join" ->
      """SELECT n_name, count(*) AS n_customers,
         round(sum(c_acctbal),2) AS sum_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "j9_inner_join" ->
      """SELECT p_brand, count(*) AS n_lines,
         round(sum(l_extendedprice),2) AS sum_price
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    "j13_full_outer_join" ->
      """SELECT coalesce(u.uk, b.bk) AS o_orderkey, u.u_price,
         b.b_status,
         CAST(u.uk IS NOT NULL AND b.bk IS NOT NULL AS INT) AS in_both
         FROM (SELECT o_orderkey AS uk, o_totalprice AS u_price
           FROM orders WHERE o_orderpriority = '1-URGENT') u
         FULL OUTER JOIN (SELECT o_orderkey AS bk,
             o_orderstatus AS b_status
           FROM orders WHERE o_totalprice > 250000.0) b
           ON u.uk = b.bk
         ORDER BY o_orderkey""",
    "a1_pivot_max_case" ->
      """SELECT l_orderkey,
         max(CASE WHEN l_linenumber=1 THEN l_quantity END) AS qty_1,
         max(CASE WHEN l_linenumber=2 THEN l_quantity END) AS qty_2,
         max(CASE WHEN l_linenumber=3 THEN l_quantity END) AS qty_3,
         max(CASE WHEN l_linenumber=4 THEN l_quantity END) AS qty_4
         FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""",
    "a2_ordered_string_agg" ->
      """SELECT o_custkey,
         string_agg(CAST(o_orderkey AS VARCHAR), ', '
           ORDER BY o_orderdate, o_orderkey) AS order_history
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "a3_distinct_string_agg" ->
      """SELECT o_custkey,
         count(DISTINCT o_orderstatus) AS n_statuses,
         string_agg(DISTINCT o_orderstatus, ','
           ORDER BY o_orderstatus) AS statuses
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "a6_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_price,
         round(avg(l_discount),6) AS avg_disc,
         count(*) AS n_rows
         FROM lineitem GROUP BY 1,2 ORDER BY 1,2"""
  )
}
