package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining SURVEY §2 line items + the SQL-API surface: P2
  * passthrough views, the explicit A4 COUNT(DISTINCT) guard, queries
  * issued through `spark.sql` over registered temp views, and the
  * native `cosine_sim` expression exercised from SQL.
  */
object Extras {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  val queries: Map[String, Q] = Map(
    // P2 — `SELECT *` passthrough view with a constant filter
    // (view_立替精算・交通費(書式3-3.), create_views.sql:368-374).
    "p2_passthrough_view" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .orderBy(col("o_orderkey"))
    }),

    // A4 — COUNT(DISTINCT) guard (users.py:211,219), standalone.
    "a4_count_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
          countDistinct(col("l_partkey"), col("l_suppkey"))
            .as("n_part_supp"))
        .orderBy(col("l_returnflag"))
    }),

    // The spark.sql surface over registered temp views — same names
    // the DuckDB oracle uses, same SQL text runs on both engines
    // (§3.2: the reference's BI surface is plain SQL over views).
    "sql1_sql_surface" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql(
        """SELECT n_name, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name ORDER BY n_name""")
    }),

    // The native codegen'd CosineSimilarity expression called from
    // SQL (registered via GraftExtensions / register()) — §2.11's
    // custom-Expression surface.
    "sql2_native_cosine" -> ((s, dir) => {
      graft.expressions.CosineSimilarity.register(s)
      graft.Tables.registerAll(s, dir)
      s.sql(
        """SELECT e.vec_id AS neighbor_id,
           round(cosine_sim(q.embedding, e.embedding), 5) AS cos
           FROM embeddings q JOIN embeddings e
             ON q.vec_id = 0 AND e.vec_id <> 0
           ORDER BY cos DESC, neighbor_id LIMIT 15""")
    }),

    // The second native expression (fused-loop squared L2 with
    // doGenCode) through the same SQL surface; the DuckDB oracle
    // replays the identical index-ordered double accumulation.
    "sql3_native_l2" -> ((s, dir) => {
      graft.expressions.L2DistanceSq.register(s)
      graft.Tables.registerAll(s, dir)
      s.sql(
        """SELECT e.vec_id AS neighbor_id,
           round(l2_dist_sq(q.embedding, e.embedding), 5) AS d2
           FROM embeddings q JOIN embeddings e
             ON q.vec_id = 0 AND e.vec_id <> 0
           ORDER BY d2 ASC, neighbor_id LIMIT 15""")
    }),

    // The injected optimizer Rule (plans.BandLevenshtein) driven
    // end to end: a NAIVE fuzzy self-join — levenshtein <= 2 with no
    // hand-written banding — gets the free |Δlength| short-circuit
    // added by the optimizer (PlanShapeSpec asserts the injected
    // conjunct and its cheap-first position); the oracle checks the
    // rewrite changed nothing semantically.
    "sql4_auto_banded_lev" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_custkey") < 400)
        .select(col("c_custkey"), lower(col("c_name")).as("nm"))
      c.as("a").join(c.as("b"),
          col("a.c_custkey") < col("b.c_custkey") &&
            levenshtein(col("a.nm"), col("b.nm")) <= 2)
        .select(col("a.c_custkey").as("id_a"),
          col("b.c_custkey").as("id_b"),
          levenshtein(col("a.nm"), col("b.nm")).cast("long").as("d"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Native banded threshold Levenshtein (expressions.
    // LevenshteinWithin): lev_within(a,b,k) must be EXACTLY
    // levenshtein(a,b) <= k — the oracle recomputes the predicate
    // from the full distance, so any band/early-exit bug that admits
    // or drops a pair breaks the row set. The SQL route exercises the
    // SparkSessionExtensions registration; per-row work is
    // O(k·min(n,m)) instead of the builtin's O(n·m).
    "sql5_lev_within" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql("""
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        FROM (SELECT c_custkey, lower(c_name) AS nm FROM customer
              WHERE c_custkey < 400) a
        JOIN (SELECT c_custkey, lower(c_name) AS nm FROM customer
              WHERE c_custkey < 400) b
          ON a.c_custkey < b.c_custkey AND lev_within(a.nm, b.nm, 2)
        ORDER BY id_a, id_b""")
    }),

    // Declarative data-quality suite (operators.DataQuality — the
    // deequ/dbt-test expectation layer): key uniqueness, FK orphans,
    // null fraction, range, set membership — each ONE scan-side
    // aggregation emitting a (check, n_checked, n_violations) census
    // row; the publish gate is sum(n_violations)=0. The oracle
    // recomputes every census from first principles.
    "dq1_quality_suite" -> ((s, dir) => {
      import graft.operators.DataQuality._
      val o = graft.Tables.load(s, dir, "orders")
      val l = graft.Tables.load(s, dir, "lineitem")
      val e = graft.Tables.load(s, dir, "events")
      suite(Seq(
        uniqueKey(o, Seq("o_orderkey"), "orders_pk_unique"),
        uniqueKey(l, Seq("l_orderkey", "l_linenumber"),
          "lineitem_pk_unique"),
        fkOrphans(l, "l_orderkey", o, "o_orderkey",
          "lineitem_orderkey_fk"),
        nonNull(o, "o_custkey", "orders_custkey_nonnull"),
        inRange(e, "value", lit(0.0), lit(1000.0),
          "events_value_range"),
        inSet(o, "o_orderstatus", Seq("O", "F", "P"),
          "orders_status_domain")))
        .orderBy(col("check"))
    }),

    // Column profiling (operators.Profile): per-column row/null/
    // distinct counts + typed min/max rendered as text, ALL columns
    // in ONE aggregation job (multi-distinct via Expand); the oracle
    // recomputes each column's census independently.
    "ps1_profile" -> ((s, dir) => {
      graft.operators.Profile
        .profile(graft.Tables.load(s, dir, "lineitem"),
          Seq("l_orderkey", "l_linenumber", "l_returnflag",
            "l_shipdate"))
        .orderBy(col("column"))
    }),

    // Wide-table profiling path: approx_count_distinct (HLL++) instead
    // of the exact multi-distinct Expand — the Expand duplicates every
    // input row once per distinct-counted column, so a 500-column
    // profile pays 500x the scan; the sketch keeps it ONE no-Expand
    // pass. Sketch estimates can't be hash-compared, so the query
    // emits the exact census plus a flag that the estimate lands
    // within 3x the configured rsd (xs1's acceptance pattern); the
    // oracle expects the exact values and flag=1.
    "ps2_profile_approx" -> ((s, dir) => {
      val li = graft.Tables.load(s, dir, "lineitem")
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_shipdate")
      val exact = graft.operators.Profile.profile(li, cols)
      val approx = graft.operators.Profile
        .profile(li, cols, approx = true)
        .select(col("column"), col("n_distinct").as("nd_approx"))
      exact.join(approx, Seq("column"))
        .select(col("column"), col("n_rows"), col("n_null"),
          col("n_distinct"),
          (abs(col("nd_approx") - col("n_distinct")).cast("double") <=
            lit(0.15) * col("n_distinct").cast("double"))
            .cast("int").as("approx_ok"))
        .orderBy(col("column"))
    }),

    // Top-3 most frequent values per profiled column — the value
    // histogram half of the profile card. One unpivot scan + counts
    // with map-side combine; the per-column top-k window runs over
    // the post-agg (column, value) frame only.
    "ps3_topk_profile" -> ((s, dir) => {
      graft.operators.Profile.topValues(
        graft.Tables.load(s, dir, "orders"),
        Seq("o_orderstatus", "o_orderpriority", "o_custkey"), 3)
        .orderBy(col("column"), col("rk"))
    }),

    // Key-skew pre-flight (operators.SkewProbe): per candidate
    // partition key, exact per-key count order statistics + hot-key
    // share, computed on the frequency-of-frequencies frame — the
    // diagnosis a 100 TB job runs BEFORE picking its shuffle keys.
    "xq16_key_skew" -> ((s, dir) => {
      graft.operators.SkewProbe.keySkew(
        graft.Tables.load(s, dir, "events"),
        Seq("user_id", "event_type"))
        .orderBy(col("key_col"))
    })
  )

  val oracle: Map[String, String] = Map(
    // per-column census, typed min/max rendered as text
    "ps1_profile" ->
      """SELECT * FROM (
           SELECT 'l_orderkey' AS "column", count(*) AS n_rows,
             count(*) - count(l_orderkey) AS n_null,
             count(DISTINCT l_orderkey) AS n_distinct,
             CAST(min(l_orderkey) AS VARCHAR) AS min_val,
             CAST(max(l_orderkey) AS VARCHAR) AS max_val
           FROM lineitem
           UNION ALL
           SELECT 'l_linenumber', count(*),
             count(*) - count(l_linenumber),
             count(DISTINCT l_linenumber),
             CAST(min(l_linenumber) AS VARCHAR),
             CAST(max(l_linenumber) AS VARCHAR)
           FROM lineitem
           UNION ALL
           SELECT 'l_returnflag', count(*),
             count(*) - count(l_returnflag),
             count(DISTINCT l_returnflag),
             CAST(min(l_returnflag) AS VARCHAR),
             CAST(max(l_returnflag) AS VARCHAR)
           FROM lineitem
           UNION ALL
           SELECT 'l_shipdate', count(*),
             count(*) - count(l_shipdate),
             count(DISTINCT l_shipdate),
             CAST(min(l_shipdate) AS VARCHAR),
             CAST(max(l_shipdate) AS VARCHAR)
           FROM lineitem)
         ORDER BY "column"""",
    // exact census + the sketch-acceptance flag (xs1 pattern)
    "ps2_profile_approx" ->
      """SELECT * FROM (
           SELECT 'l_orderkey' AS "column", count(*) AS n_rows,
             count(*) - count(l_orderkey) AS n_null,
             count(DISTINCT l_orderkey) AS n_distinct, 1 AS approx_ok
           FROM lineitem
           UNION ALL
           SELECT 'l_partkey', count(*),
             count(*) - count(l_partkey),
             count(DISTINCT l_partkey), 1
           FROM lineitem
           UNION ALL
           SELECT 'l_suppkey', count(*),
             count(*) - count(l_suppkey),
             count(DISTINCT l_suppkey), 1
           FROM lineitem
           UNION ALL
           SELECT 'l_shipdate', count(*),
             count(*) - count(l_shipdate),
             count(DISTINCT l_shipdate), 1
           FROM lineitem)
         ORDER BY "column"""",
    "ps3_topk_profile" ->
      """SELECT * FROM (
           SELECT 'o_orderstatus' AS "column",
             row_number() OVER (ORDER BY count(*) DESC,
               CAST(o_orderstatus AS VARCHAR)) AS rk,
             CAST(o_orderstatus AS VARCHAR) AS value, count(*) AS n
           FROM orders WHERE o_orderstatus IS NOT NULL
           GROUP BY o_orderstatus
           UNION ALL
           SELECT 'o_orderpriority',
             row_number() OVER (ORDER BY count(*) DESC,
               CAST(o_orderpriority AS VARCHAR)),
             CAST(o_orderpriority AS VARCHAR), count(*)
           FROM orders WHERE o_orderpriority IS NOT NULL
           GROUP BY o_orderpriority
           UNION ALL
           SELECT 'o_custkey',
             row_number() OVER (ORDER BY count(*) DESC,
               CAST(o_custkey AS VARCHAR)),
             CAST(o_custkey AS VARCHAR), count(*)
           FROM orders WHERE o_custkey IS NOT NULL
           GROUP BY o_custkey)
         WHERE rk <= 3 ORDER BY "column", rk""",
    "xq16_key_skew" ->
      """WITH probe AS (
           SELECT 'user_id' AS key_col, CAST(user_id AS VARCHAR) AS k
           FROM events
           UNION ALL
           SELECT 'event_type', event_type FROM events),
         counts AS (SELECT key_col, k, count(*) AS c
           FROM probe GROUP BY 1, 2),
         fof AS (SELECT key_col, c, count(*) AS nk
           FROM counts GROUP BY 1, 2),
         tot AS (SELECT key_col, CAST(sum(nk) AS BIGINT) AS n_keys,
             CAST(sum(c * nk) AS BIGINT) AS n_rows,
             max(c) AS max_count
           FROM fof GROUP BY 1),
         cum AS (SELECT key_col, c, nk,
             SUM(nk) OVER (PARTITION BY key_col ORDER BY c) AS cum
           FROM fof),
         q AS (SELECT cum.key_col,
             MIN(CASE WHEN cum >= (50 * n_keys + 99) // 100
               THEN c END) AS p50_count,
             MIN(CASE WHEN cum >= (99 * n_keys + 99) // 100
               THEN c END) AS p99_count
           FROM cum JOIN tot USING (key_col) GROUP BY 1)
         SELECT key_col, n_keys, n_rows, max_count,
           p50_count, p99_count,
           CAST((1000 * max_count) // n_rows AS BIGINT)
             AS hot_share_mille
         FROM tot JOIN q USING (key_col)
         ORDER BY key_col""",
    // each census recomputed from first principles
    "dq1_quality_suite" ->
      """SELECT * FROM (
           SELECT 'orders_pk_unique' AS "check",
             count(*) AS n_checked,
             count(*) - count(DISTINCT o_orderkey) AS n_violations
           FROM orders
           UNION ALL
           SELECT 'lineitem_pk_unique', count(*),
             count(*) - count(DISTINCT (l_orderkey, l_linenumber))
           FROM lineitem
           UNION ALL
           SELECT 'lineitem_orderkey_fk', count(*),
             CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0
               END) AS BIGINT)
           FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey
             FROM orders) o ON o.o_orderkey = l.l_orderkey
           WHERE l.l_orderkey IS NOT NULL
           UNION ALL
           SELECT 'orders_custkey_nonnull', count(*),
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'events_value_range', count(*),
             CAST(sum(CASE WHEN value IS NOT NULL AND
               (value < 0.0 OR value > 1000.0) THEN 1 ELSE 0 END)
               AS BIGINT)
           FROM events
           UNION ALL
           SELECT 'orders_status_domain', count(*),
             CAST(sum(CASE WHEN o_orderstatus IS NOT NULL AND
               o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0
               END) AS BIGINT)
           FROM orders)
         ORDER BY "check"""",
    // the un-banded definition: full distance, then compare
    "sql5_lev_within" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
         FROM (SELECT c_custkey, lower(c_name) AS nm FROM customer
               WHERE c_custkey < 400) a
         JOIN (SELECT c_custkey, lower(c_name) AS nm FROM customer
               WHERE c_custkey < 400) b
           ON a.c_custkey < b.c_custkey
           AND levenshtein(a.nm, b.nm) <= 2
         ORDER BY id_a, id_b""",
    "p2_passthrough_view" ->
      """SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
         ORDER BY o_orderkey""",
    "a4_count_distinct" ->
      """SELECT l_returnflag,
         count(DISTINCT l_suppkey) AS n_suppliers,
         count(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "sql1_sql_surface" ->
      """SELECT n_name, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "sql2_native_cosine" ->
      """SELECT e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[],
           e.embedding::DOUBLE[]), 5) AS cos
         FROM embeddings q JOIN embeddings e
           ON q.vec_id = 0 AND e.vec_id <> 0
         ORDER BY cos DESC, neighbor_id LIMIT 15""",
    "sql3_native_l2" ->
      """SELECT e.vec_id AS neighbor_id,
         round(list_sum(list_transform(range(1, 65),
           i -> (q.embedding[i]::DOUBLE - e.embedding[i]::DOUBLE)
              * (q.embedding[i]::DOUBLE - e.embedding[i]::DOUBLE))), 5)
           AS d2
         FROM embeddings q JOIN embeddings e
           ON q.vec_id = 0 AND e.vec_id <> 0
         ORDER BY d2 ASC, neighbor_id LIMIT 15""",
    // the un-banded definition: the optimizer rewrite must be
    // semantically invisible
    "sql4_auto_banded_lev" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
         levenshtein(lower(a.c_name), lower(b.c_name))::BIGINT AS d
         FROM customer a JOIN customer b
           ON a.c_custkey < b.c_custkey
           AND levenshtein(lower(a.c_name), lower(b.c_name)) <= 2
         WHERE a.c_custkey < 400 AND b.c_custkey < 400
         ORDER BY id_a, id_b"""
  )
}
