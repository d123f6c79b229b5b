package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.8 scalar-function surface (F1–F10) and §2.9 exotic
  * rewrites (R1–R3). All per-row expressions stay inside whole-stage
  * codegen — no UDFs anywhere.
  */
object Scalars {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  val queries: Map[String, Q] = Map(
    // F1 — CASE WHEN value mapping (status→Japanese, create_views.sql:
    // 130-138: 6 branches + passthrough ELSE).
    "f1_case_map" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "O", lit("未完了"))
            .when(col("o_orderstatus") === "F", lit("完了"))
            .when(col("o_orderstatus") === "P", lit("進行中"))
            .otherwise(col("o_orderstatus")).as("status_ja"))
        .orderBy(col("o_orderkey"))
    }),

    // F2 — strftime with the reference's double-space format
    // (create_views.sql:143: '%Y/%m/%d  %H:%M:%S').
    "f2_strftime" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy/MM/dd  HH:mm:ss")
            .as("formatted_date"))
        .orderBy(col("o_orderkey"))
    }),

    // F3 — CAST(NULLIF(col,'') AS INTEGER): empty-string→NULL→int
    // (create_views.sql:104-116). The empty strings are synthesized
    // deterministically from order status.
    "f3_nullif_cast" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("raw_code",
          when(col("o_orderstatus") === "P", lit(""))
            .otherwise(col("o_orderkey").cast("string")))
        .select(col("o_orderkey"),
          nullif(col("raw_code"), lit("")).cast("long").as("parsed_code"))
        .orderBy(col("o_orderkey"))
    }),

    // F4 — currency-string parse: "123,456 円" → 123456
    // (create_views.sql:441-443: triple-REPLACE; here one regex, still
    // codegen'd). The currency string is synthesized round-trip so the
    // oracle can build the identical input.
    "f4_currency_parse" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("yen_text",
          concat(format_number(floor(col("o_totalprice")).cast("long"), 0),
            lit(" 円")))
        .select(col("o_orderkey"), col("yen_text"),
          regexp_replace(col("yen_text"), "[円, ]", "").cast("long")
            .as("amount"))
        .orderBy(col("o_orderkey"))
    }),

    // F5 — string concat with literal decoration
    // (create_views.sql:267-271: name || '（承認日時：' || ts || '）').
    "f5_concat_decorate" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(col("c_custkey"),
          concat(col("c_name"), lit("（残高："),
            floor(col("c_acctbal")).cast("long").cast("string"),
            lit("）")).as("decorated"))
        .orderBy(col("c_custkey"))
    }),

    // F6 — JSON object emission (json_object, _requests.py:138-179).
    // Ints/strings only so Spark and DuckDB render identically.
    "f6_json_object" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          to_json(struct(col("o_orderkey").as("k"),
            col("o_orderstatus").as("st"),
            col("o_orderpriority").as("pri"))).as("doc"))
        .orderBy(col("o_orderkey"))
    }),

    // F7 — JSON parse on read-back (json.loads, users.py:256-258):
    // extract a typed field from the events.props JSON string.
    "f7_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_value"))
        .orderBy(col("event_id"))
    }),

    // F8 — explicit casts at ingest (int()/bool(), users.py:106).
    // floor() before the long cast: Spark casts double→long by
    // truncation while DuckDB rounds, so the truncation is explicit.
    "f8_casts" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          floor(col("o_totalprice")).cast("long").as("price_int"),
          col("o_orderkey").cast("string").as("key_str"),
          (col("o_orderstatus") === "O").cast("boolean").as("is_open"),
          col("o_orderdate").cast("date").as("order_day"))
        .orderBy(col("o_orderkey"))
    }),

    // F9 — NULL-safe equality (`<=>`, users.py:118-125): two grouped
    // sets joined on a nullable key; the NULL group must match itself.
    "f9_nullsafe_eq_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.groupBy(nullif(col("o_orderstatus"), lit("P")).as("k1"))
        .agg(count(lit(1)).as("n_all"))
      val b = o.filter(col("o_totalprice") > 200000.0)
        .groupBy(nullif(col("o_orderstatus"), lit("P")).as("k2"))
        .agg(count(lit(1)).as("n_big"))
      a.join(b, col("k1") <=> col("k2"), "left")
        .select(col("k1"), col("n_all"), col("n_big"))
        .orderBy(col("k1"))
    }),

    // F10 — per-type unique-identifier extraction (get_unique_identifier,
    // gateway/_core.py:142-162): the key column depends on the record
    // type.
    "f10_key_extraction" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"),
          when(col("event_type") === "signup",
            concat(lit("u:"), col("user_id").cast("string")))
            .when(col("event_type") === "purchase",
              concat(lit("p:"), col("event_id").cast("string")))
            .otherwise(concat(lit("e:"), col("event_id").cast("string")))
            .as("unique_identifier"))
        .orderBy(col("event_id"))
    }),

    // R1 — repeat-each-row-N-times (the reference's ONLY recursive CTE,
    // _default_attachment_files.py:59-86, repeats a file row
    // `default_attachment` times). explode(array_repeat(...)) gives the
    // exact semantics with a generator instead of recursion — and it
    // runs distributed, unlike a recursive CTE.
    "r1_repeat_by_count" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          explode(array_repeat(col("l_partkey"), col("l_linenumber")))
            .as("repeated_part"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // R2 — non-recursive CTE as a named plan fragment
    // (_customized_items.py:172-233).
    "r2_cte_fragment" -> ((s, dir) => {
      val perCust = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_spent"))
      perCust.filter(col("n_orders") >= 3)
        .select(col("o_custkey"), col("n_orders"), col("total_spent"))
        .orderBy(col("o_custkey"))
    }),

    // R3 — 2-D nested array reassembly (table = array of arrays,
    // _customized_items.py:200-226), emitted as JSON text. Implements
    // the CORRECT correlation (the reference hardcodes
    // customized_item_id=1 — documented bug, SURVEY §7.4.6).
    "r3_nested_2d_json" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      // inner dimension: per (orderkey, suppkey) ordered part list
      val inner = l.groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(array_sort(collect_list(col("l_partkey"))).as("parts"))
      // outer dimension: per orderkey, rows ordered by suppkey
      inner.groupBy(col("l_orderkey"))
        .agg(to_json(transform(
          array_sort(collect_list(struct(
            col("l_suppkey").as("s"), col("parts").as("p")))),
          x => x.getField("p"))).as("table_json"))
        .orderBy(col("l_orderkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "f1_case_map" ->
      """SELECT o_orderkey,
         CASE o_orderstatus WHEN 'O' THEN '未完了' WHEN 'F' THEN '完了'
           WHEN 'P' THEN '進行中' ELSE o_orderstatus END AS status_ja
         FROM orders ORDER BY o_orderkey""",
    "f2_strftime" ->
      """SELECT o_orderkey,
         strftime(o_orderdate, '%Y/%m/%d  %H:%M:%S') AS formatted_date
         FROM orders ORDER BY o_orderkey""",
    "f3_nullif_cast" ->
      """SELECT o_orderkey,
         CAST(NULLIF(CASE WHEN o_orderstatus='P' THEN ''
           ELSE CAST(o_orderkey AS VARCHAR) END, '') AS BIGINT)
           AS parsed_code
         FROM orders ORDER BY o_orderkey""",
    "f4_currency_parse" ->
      """SELECT o_orderkey, yen_text,
         CAST(regexp_replace(yen_text, '[円, ]', '', 'g') AS BIGINT)
           AS amount
         FROM (SELECT o_orderkey,
           format('{:,}', CAST(floor(o_totalprice) AS BIGINT)) || ' 円'
             AS yen_text FROM orders)
         ORDER BY o_orderkey""",
    "f5_concat_decorate" ->
      """SELECT c_custkey,
         c_name || '（残高：' ||
           CAST(CAST(floor(c_acctbal) AS BIGINT) AS VARCHAR) || '）'
           AS decorated
         FROM customer ORDER BY c_custkey""",
    "f6_json_object" ->
      """SELECT o_orderkey,
         to_json(struct_pack(k := o_orderkey, st := o_orderstatus,
           pri := o_orderpriority)) AS doc
         FROM orders ORDER BY o_orderkey""",
    "f7_json_extract" ->
      """SELECT event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
         FROM events ORDER BY event_id""",
    "f8_casts" ->
      """SELECT o_orderkey,
         CAST(floor(o_totalprice) AS BIGINT) AS price_int,
         CAST(o_orderkey AS VARCHAR) AS key_str,
         o_orderstatus = 'O' AS is_open,
         CAST(o_orderdate AS DATE) AS order_day
         FROM orders ORDER BY o_orderkey""",
    "f9_nullsafe_eq_join" ->
      """SELECT a.k1, a.n_all, b.n_big
         FROM (SELECT NULLIF(o_orderstatus,'P') AS k1, count(*) AS n_all
               FROM orders GROUP BY 1) a
         LEFT JOIN (SELECT NULLIF(o_orderstatus,'P') AS k2,
               count(*) AS n_big
             FROM orders WHERE o_totalprice > 200000.0 GROUP BY 1) b
           ON a.k1 IS NOT DISTINCT FROM b.k2
         ORDER BY a.k1""",
    "f10_key_extraction" ->
      """SELECT event_id,
         CASE event_type
           WHEN 'signup' THEN 'u:' || CAST(user_id AS VARCHAR)
           WHEN 'purchase' THEN 'p:' || CAST(event_id AS VARCHAR)
           ELSE 'e:' || CAST(event_id AS VARCHAR) END
           AS unique_identifier
         FROM events ORDER BY event_id""",
    "r1_repeat_by_count" ->
      """SELECT l_orderkey, l_linenumber, repeated_part FROM (
           SELECT l_orderkey, l_linenumber,
             unnest(range(l_linenumber)) AS rep_i,
             l_partkey AS repeated_part
           FROM lineitem WHERE l_orderkey <= 100)
         ORDER BY l_orderkey, l_linenumber""",
    "r2_cte_fragment" ->
      """WITH per_cust AS (
           SELECT o_custkey, count(*) AS n_orders,
             round(sum(o_totalprice),2) AS total_spent
           FROM orders GROUP BY o_custkey)
         SELECT o_custkey, n_orders, total_spent FROM per_cust
         WHERE n_orders >= 3 ORDER BY o_custkey""",
    "r3_nested_2d_json" ->
      """SELECT l_orderkey,
         to_json(list(p ORDER BY s)) AS table_json
         FROM (SELECT l_orderkey, l_suppkey AS s,
                 list(l_partkey ORDER BY l_partkey) AS p
               FROM lineitem GROUP BY l_orderkey, l_suppkey)
         GROUP BY l_orderkey ORDER BY l_orderkey"""
  )
}
