package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregates every query module into the single map the driver
  * contract (`graft.SparkEntry`) exposes. Each module contributes
  * `queries` (name -> (spark, sfDir) => DataFrame) and `oracle`
  * (name -> equivalent DuckDB SQL); names must not collide.
  */
object Registry {
  type Q = (SparkSession, String) => DataFrame

  /** Flagship: a composite report in the shape of the reference's CSV
    * export views (`create_views.sql:293-338` — view_立替精算(書式3)):
    * fact→dim broadcast joins + constant IN filter + CASE status map +
    * 4-col MAX(CASE) pivot + ordered string-agg history + date_format,
    * over the TPC-H-ish testdata.
    */
  val flagship: Q = (s, dir) => {
    val o = graft.Tables.load(s, dir, "orders")
    val c = graft.Tables.load(s, dir, "customer")
    val n = graft.Tables.load(s, dir, "nation")
    val l = graft.Tables.load(s, dir, "lineitem")

    // per-order pivot of the first 4 line quantities (A1) + ordered
    // part-key history (A2); one shuffle on l_orderkey, partial aggs
    // map-side. At 100 TB this is the dominant shuffle and it's on the
    // join key we need anyway.
    val pivots = (1 to 4).map(k =>
      max(when(col("l_linenumber") === k, col("l_quantity")))
        .as(s"qty_$k"))
    val lagg = l.groupBy(col("l_orderkey")).agg(
      pivots.head,
      (pivots.tail :+
        concat_ws(", ", transform(
          array_sort(collect_list(struct(
            col("l_linenumber").as("i"), col("l_partkey").as("p")))),
          x => x.getField("p").cast("string"))).as("part_history")): _*)

    o.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"), "left")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
      .join(lagg, col("o_orderkey") === col("l_orderkey"), "left")
      .select(
        col("o_orderkey"),
        col("c_name"),
        col("n_name"),
        when(col("o_orderstatus") === "O", lit("open"))
          .when(col("o_orderstatus") === "F", lit("finished"))
          .when(col("o_orderstatus") === "P", lit("pending"))
          .otherwise(col("o_orderstatus")).as("status_ja"),
        date_format(col("o_orderdate"), "yyyy/MM/dd  HH:mm:ss")
          .as("ordered_at"),
        col("qty_1"), col("qty_2"), col("qty_3"), col("qty_4"),
        col("part_history"))
      .orderBy(col("o_orderkey"))
  }

  private val flagshipOracle: String =
    """SELECT o_orderkey, c_name, n_name,
       CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished'
         WHEN 'P' THEN 'pending' ELSE o_orderstatus END AS status_ja,
       strftime(o_orderdate, '%Y/%m/%d  %H:%M:%S') AS ordered_at,
       la.qty_1, la.qty_2, la.qty_3, la.qty_4, la.part_history
       FROM orders
       LEFT JOIN customer ON o_custkey = c_custkey
       LEFT JOIN nation ON c_nationkey = n_nationkey
       LEFT JOIN (
         SELECT l_orderkey,
           max(CASE WHEN l_linenumber=1 THEN l_quantity END) AS qty_1,
           max(CASE WHEN l_linenumber=2 THEN l_quantity END) AS qty_2,
           max(CASE WHEN l_linenumber=3 THEN l_quantity END) AS qty_3,
           max(CASE WHEN l_linenumber=4 THEN l_quantity END) AS qty_4,
           string_agg(CAST(l_partkey AS VARCHAR), ', '
             ORDER BY l_linenumber, l_partkey) AS part_history
         FROM lineitem GROUP BY l_orderkey) la
         ON o_orderkey = la.l_orderkey
       WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
       ORDER BY o_orderkey"""

  private val modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (Relational.queries, Relational.oracle),
    (JoinsAggs.queries, JoinsAggs.oracle),
    (WindowsSets.queries, WindowsSets.oracle),
    (Scalars.queries, Scalars.oracle),
    (Upserts.queries, Upserts.oracle),
    (Incremental.queries, Incremental.oracle),
    (StreamingBatch.queries, StreamingBatch.oracle),
    (TrainingData.queries, TrainingData.oracle),
    (Extras.queries, Extras.oracle),
    (ExtOps.queries, ExtOps.oracle),
    (Pipeline.queries, Pipeline.oracle),
    (Sketches.queries, Sketches.oracle),
    (TimeSeries.queries, TimeSeries.oracle),
    (LmOps.queries, LmOps.oracle),
    (Behavior.queries, Behavior.oracle),
    (Curation.queries, Curation.oracle),
    (Stats.queries, Stats.oracle),
    (Matching.queries, Matching.oracle)
  )

  lazy val all: Map[String, Q] = {
    val merged = modules.map(_._1).reduce(_ ++ _) +
      ("flagship_report" -> flagship)
    val dup = modules.flatMap(_._1.keys).groupBy(identity)
      .collect { case (k, v) if v.size > 1 => k }
    require(dup.isEmpty, s"duplicate query names: $dup")
    merged
  }

  lazy val oracle: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _) +
      ("flagship_report" -> flagshipOracle)
}
