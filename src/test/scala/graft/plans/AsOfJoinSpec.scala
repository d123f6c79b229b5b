package graft.plans

import graft.SparkSpec
import graft.operators.Joins
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The native as-of join (custom LogicalPlan + Strategy + merge-scan
  * SparkPlan): semantics pinned on crafted fixtures, plan shape
  * asserted, and equality with the composed union+window
  * `asofBackward` on a larger corpus.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private lazy val left = Seq(
    (1L, 7L, ts(0)), (2L, 7L, ts(10)), (3L, 7L, ts(30)),
    (4L, 8L, ts(5)), (5L, 9L, ts(5)))
    .toDF("event_id", "user_id", "ts")
  private lazy val right = Seq(
    (7L, ts(0), 1.0), (7L, ts(10), 2.0), (7L, ts(20), 3.0),
    (8L, ts(6), 9.0)) // user 8's only row is AFTER the probe; user 9 none
    .toDF("user_id", "s_ts", "v")

  private lazy val out = Joins.asofNative(left, right,
    "user_id", "ts", "s_ts", Seq("v"))

  test("backward semantics: latest right at-or-before, ties visible, " +
    "no-match rows null") {
    val got = out.orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) null
        else r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 1.0), // tie at ts(0) → visible (<=)
      (2L, 2.0), // ties with the 10:10 update
      (3L, 3.0), // 10:20 update carried to 10:30
      (4L, null), // user 8's row is in the future
      (5L, null))) // user 9 has no rows at all
  }

  test("the physical plan contains the custom AsOfJoin exec with " +
    "co-partitioned sorted children") {
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
  }

  test("matches the composed asofBackward on the events corpus") {
    val e = graft.Tables.load(spark, sf0001, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), round(col("value"), 6).as("sv"))
    val composed = Joins.asofBackward(purchases, signups,
      Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("sv")).orderBy("event_id").collect()
    val native = Joins.asofNative(purchases,
      signups.withColumnRenamed("ts", "s_ts"), "user_id", "ts", "s_ts",
      Seq("sv"))
      .select(col("event_id"), col("sv")).orderBy("event_id").collect()
    assert(native.toSeq == composed.toSeq)
  }

  test("self-as-of (both sides from one relation) survives " +
    "deduplication") {
    // regression: DeduplicateRelations rewrites duplicate exprIds in
    // the right branch; the node must only reference fresh aliases
    val e = Seq((1L, 7L, ts(10)), (2L, 7L, ts(20)))
      .toDF("event_id", "user_id", "ts")
    val r = Joins.asofNative(e,
      e.select(col("user_id"), col("ts").as("s_ts"),
        col("event_id").as("prev_id")),
      "user_id", "ts", "s_ts", Seq("prev_id"))
    assert(r.count() == 2)
  }

  test("non-64-bit key types are rejected with a clear error") {
    val bad = Seq((1, 1, ts(0))).toDF("event_id", "user_id", "ts")
    val err = intercept[IllegalArgumentException] {
      Joins.asofNative(bad, right, "user_id", "ts", "s_ts", Seq("v"))
    }
    assert(err.getMessage.contains("long/timestamp"))
  }
}
