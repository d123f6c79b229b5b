package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4/§2.5 remainder: composite-key joins, view-stacked
  * joins, JSON-reassembly aggregation, dedup/merge semantics.
  */
object JoinsAggs {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  val queries: Map[String, Q] = Map(
    // J2 — inner + left join on a composite key (create_views.sql:37-42:
    // user_positions keyed (user_id, group_code)). Composite-key
    // aggregate re-joined to the fact on both columns; the aggregate and
    // the join share one shuffle key at scale.
    "j2_composite_key_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val agg = l.groupBy(col("l_orderkey").as("ak"), col("l_suppkey").as("sk"))
        .agg(round(sum(col("l_quantity")), 2).as("supp_qty"))
      l.join(agg,
          l("l_orderkey") === agg("ak") && l("l_suppkey") === agg("sk"),
          "inner")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
          col("supp_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // J4 — parent→child→grandchild chained left joins
    // (approval_process→approval_steps→approvers,
    // create_views.sql:194-199).
    "j4_parent_child_grandchild" -> ((s, dir) => {
      val r = t(s, dir, "region")
      val n = t(s, dir, "nation")
      val sp = t(s, dir, "supplier")
      r.join(n, r("r_regionkey") === n("n_regionkey"), "left")
        .join(sp, n("n_nationkey") === sp("s_nationkey"), "left")
        .select(col("r_name"), col("n_name"), col("s_name"))
        .orderBy(col("r_name"), col("n_name"), col("s_name"))
    }),

    // J5 — fact chain expense→specifics→rows (create_views.sql:215-220):
    // orders→lineitem→part, dims broadcast.
    "j5_fact_chain_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left")
        .join(broadcast(p), l("l_partkey") === p("p_partkey"), "left")
        .select(col("o_orderkey"), col("l_linenumber"), col("p_name"),
          col("l_quantity"))
        .orderBy(col("o_orderkey"), col("l_linenumber"))
    }),

    // J6 — fact joined to a named intermediate "view" DF
    // (create_views.sql:325-334: CSV views join view_request_details).
    // The view (customer+nation) is itself a broadcast join, then the
    // fact joins the view — views are plan fragments, never
    // materialized, exactly like the reference's virtual views.
    "j6_join_to_view" -> ((s, dir) => {
      val viewCustomer = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"), "left")
        .select(col("c_custkey"), col("c_name"), col("n_name"))
      t(s, dir, "orders")
        .join(broadcast(viewCustomer),
          col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_orderkey"), col("c_name"), col("n_name"))
        .orderBy(col("o_orderkey"))
    }),

    // J10+A7 — JSON-reassembly: children collected to an ordered JSON
    // array per parent, then ONE join to the parent (replaces the
    // reference's per-parent correlated subqueries, _expense.py:271-345).
    // Ints/strings only inside the JSON so both engines render
    // identically.
    "j10_json_reassembly_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val kids = l.groupBy(col("l_orderkey").as("k")).agg(
        to_json(transform(
          array_sort(collect_list(struct(
            col("l_linenumber").as("i"),
            col("l_partkey").as("p")))),
          x => struct(x.getField("i").as("i"), x.getField("p").as("p"))))
          .as("lines_json"))
      o.join(kids, o("o_orderkey") === col("k"), "left")
        .select(col("o_orderkey"), col("lines_json"))
        .orderBy(col("o_orderkey"))
    }),

    // A7 standalone — per-parent ordered JSON array build
    // (users.py:208-230 JSON_GROUP_ARRAY(JSON_OBJECT(...))).
    "a7_json_group_array" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.groupBy(col("o_custkey")).agg(
        to_json(transform(
          array_sort(collect_list(struct(
            col("o_orderkey").as("k"),
            col("o_orderstatus").as("st")))),
          x => struct(x.getField("k").as("k"), x.getField("st").as("st"))))
          .as("orders_json"))
        .orderBy(col("o_custkey"))
    }),

    // J11 — child-to-shared-registry inner join (file_associations JOIN
    // files, _customized_items.py:196-199): lineitem→supplier registry.
    "j11_registry_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val sp = t(s, dir, "supplier")
      l.join(broadcast(sp), l("l_suppkey") === sp("s_suppkey"), "inner")
        .select(col("l_orderkey"), col("l_linenumber"), col("s_name"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // J12 — master-document reassembly shape (MasterDocs.usersDoc,
    // users.py:185-266): parent + distinct-sorted scalar array +
    // ordered struct array + 1:1 nested object, each child built ONCE
    // and joined on the parent key — customer plays users, orders
    // plays user_groups/user_positions, nation plays the bank account.
    "j12_master_doc_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val n = t(s, dir, "nation")
      val prios = o.groupBy(col("o_custkey").as("k1")).agg(
        to_json(array_sort(collect_set(col("o_orderpriority"))))
          .as("prios_json"))
      val ords = o.groupBy(col("o_custkey").as("k2")).agg(
        to_json(transform(
          array_sort(collect_list(struct(
            col("o_orderkey").as("k"), col("o_orderstatus").as("st")))),
          x => struct(x.getField("k").as("k"),
            x.getField("st").as("st")))).as("orders_json"))
      c.join(prios, col("c_custkey") === col("k1"), "left")
        .join(ords, col("c_custkey") === col("k2"), "left")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"),
          "left")
        .select(col("c_custkey"), col("c_name"),
          coalesce(col("prios_json"), lit("[]")).as("prios_json"),
          coalesce(col("orders_json"), lit("[]")).as("orders_json"),
          to_json(struct(col("n_name").as("nm"),
            col("n_regionkey").as("rk"))).as("nation_json"))
        .orderBy(col("c_custkey"))
    }),

    // A5 — GROUP BY as first-per-key dedup (view_form_items,
    // create_views.sql:228-241). SQLite picks "some row"; we pin
    // determinism by taking min(struct(...)) — lexicographic over
    // every emitted column, same pick as an ORDER BY row_number
    // filter but with MAP-SIDE PARTIAL AGGREGATION instead of a full
    // per-key sort (the plan that survives a 100× scale-up).
    "a5_first_per_key" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      // (l_orderkey, l_linenumber) is NOT unique in the testdata — the
      // struct ordering must be total over every emitted column or the
      // first-row pick is engine-dependent.
      l.groupBy(col("l_orderkey"))
        .agg(min(struct(col("l_linenumber"), col("l_partkey"),
          col("l_quantity"))).as("m"))
        .select(col("l_orderkey"), col("m.l_partkey").as("l_partkey"),
          col("m.l_quantity").as("l_quantity"))
        .orderBy(col("l_orderkey"))
    }),

    // A8 — dedup by natural key with field-merge on duplicates
    // (_data_class.py:80-127: files/comments accumulators). Orderless
    // merge functions (max / count) so the result is shuffle-stable.
    "a8_natural_key_merge" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.groupBy(col("user_id"), col("event_type")).agg(
        round(max(col("value")), 6).as("merged_value"),
        count(lit(1)).as("n_occurrences"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // A9 — earliest-per-group semantics ("利用日 = earliest use_date",
    // create_views.sql:309-310): earliest order per customer plus the
    // attributes of that earliest row.
    "a9_earliest_per_group" -> ((s, dir) => {
      // min(struct) instead of a row_number window: same
      // deterministic earliest row, map-side partial aggregation (the
      // a5 optimization — one row per key reaches the shuffle)
      val o = t(s, dir, "orders")
      o.groupBy(col("o_custkey"))
        .agg(min(struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
        .select(col("o_custkey"), col("m.o_orderkey").as("o_orderkey"),
          col("m.o_orderdate").as("first_orderdate"))
        .orderBy(col("o_custkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "j2_composite_key_join" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, supp_qty
         FROM lineitem
         JOIN (SELECT l_orderkey AS ak, l_suppkey AS sk,
                 round(sum(l_quantity),2) AS supp_qty
               FROM lineitem GROUP BY 1,2) a
           ON l_orderkey = a.ak AND l_suppkey = a.sk
         ORDER BY l_orderkey, l_linenumber""",
    "j4_parent_child_grandchild" ->
      """SELECT r_name, n_name, s_name FROM region
         LEFT JOIN nation ON r_regionkey = n_regionkey
         LEFT JOIN supplier ON n_nationkey = s_nationkey
         ORDER BY r_name, n_name, s_name""",
    "j5_fact_chain_join" ->
      """SELECT o_orderkey, l_linenumber, p_name, l_quantity
         FROM orders
         LEFT JOIN lineitem ON o_orderkey = l_orderkey
         LEFT JOIN part ON l_partkey = p_partkey
         ORDER BY o_orderkey, l_linenumber""",
    "j6_join_to_view" ->
      """SELECT o_orderkey, v.c_name, v.n_name FROM orders
         LEFT JOIN (SELECT c_custkey, c_name, n_name FROM customer
                    LEFT JOIN nation ON c_nationkey = n_nationkey) v
           ON o_custkey = v.c_custkey
         ORDER BY o_orderkey""",
    "j10_json_reassembly_join" ->
      """SELECT o_orderkey, k.lines_json FROM orders
         LEFT JOIN (SELECT l_orderkey,
             to_json(list(struct_pack(i := l_linenumber, p := l_partkey)
               ORDER BY l_linenumber, l_partkey)) AS lines_json
           FROM lineitem GROUP BY l_orderkey) k
           ON o_orderkey = k.l_orderkey
         ORDER BY o_orderkey""",
    "a7_json_group_array" ->
      """SELECT o_custkey,
         to_json(list(struct_pack(k := o_orderkey, st := o_orderstatus)
           ORDER BY o_orderkey, o_orderstatus)) AS orders_json
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "j11_registry_join" ->
      """SELECT l_orderkey, l_linenumber, s_name FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         ORDER BY l_orderkey, l_linenumber""",
    "j12_master_doc_join" ->
      """SELECT c_custkey, c_name,
         coalesce(p.prios_json, '[]') AS prios_json,
         coalesce(k.orders_json, '[]') AS orders_json,
         to_json(struct_pack(nm := n_name, rk := n_regionkey))
           AS nation_json
         FROM customer
         LEFT JOIN (SELECT o_custkey,
             to_json(list(DISTINCT o_orderpriority
               ORDER BY o_orderpriority)) AS prios_json
           FROM orders GROUP BY o_custkey) p ON c_custkey = p.o_custkey
         LEFT JOIN (SELECT o_custkey,
             to_json(list(struct_pack(k := o_orderkey, st := o_orderstatus)
               ORDER BY o_orderkey, o_orderstatus)) AS orders_json
           FROM orders GROUP BY o_custkey) k ON c_custkey = k.o_custkey
         LEFT JOIN nation ON c_nationkey = n_nationkey
         ORDER BY c_custkey""",
    "a5_first_per_key" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM (
           SELECT *, row_number() OVER (PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
           FROM lineitem)
         WHERE rn = 1 ORDER BY l_orderkey""",
    "a8_natural_key_merge" ->
      """SELECT user_id, event_type,
         round(max(value),6) AS merged_value,
         count(*) AS n_occurrences
         FROM events GROUP BY 1,2 ORDER BY 1,2""",
    "a9_earliest_per_group" ->
      """SELECT o_custkey, o_orderkey, o_orderdate AS first_orderdate
         FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS rn FROM orders)
         WHERE rn = 1 ORDER BY o_custkey"""
  )
}
