package graft.operators

import graft.SparkSpec
import graft.incr.Incremental
import org.apache.spark.sql.functions._

/** K1–K5 sink semantics + T1–T6 incremental logic, mirroring the
  * reference's only stateful tests (test_status.py, test__tf_io.py).
  */
class UpsertIncrSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    ("a", "old", 1L), ("b", "old", 2L), ("c", "old", 3L)
  ).toDF("id", "val", "amount")

  test("K1 fullRow: update replaces whole row, insert appends, " +
    "untouched rows survive") {
    val updates = Seq(("b", "new", 20L), ("d", "new", 40L))
      .toDF("id", "val", "amount")
    val out = Upsert.fullRow(base, updates, Seq("id"))
      .orderBy("id").collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2)))
    assert(out.toSeq == Seq(("a", "old", 1L), ("b", "new", 20L),
      ("c", "old", 3L), ("d", "new", 40L)))
  }

  test("K1 fullRow is idempotent (re-apply same batch)") {
    val updates = Seq(("b", "new", 20L)).toDF("id", "val", "amount")
    val once = Upsert.fullRow(base, updates, Seq("id"))
    val twice = Upsert.fullRow(once, updates, Seq("id"))
    assert(once.orderBy("id").collect().toSeq ==
      twice.orderBy("id").collect().toSeq)
  }

  test("K1 fullRow: intra-batch duplicate key resolves " +
    "deterministically (payload tiebreak, not arbitrary max_by)") {
    val dup = Seq(("b", "zzz", 1L), ("b", "aaa", 2L))
      .toDF("id", "val", "amount")
    val got = (1 to 5).map { _ =>
      Upsert.fullRow(base, dup.repartition(4), Seq("id"))
        .filter($"id" === "b").collect()(0)
    }
    assert(got.distinct.size == 1, got.mkString(", "))
    // lexicographically-largest payload wins the tie
    assert(got.head.getString(1) == "zzz", got.head.toString)
  }

  test("K6 scd2FromLog: a key whose FIRST attribute is NULL keeps its " +
    "opening version (lag's null default must not swallow it)") {
    val log = Seq((1L, Option.empty[String], 10L, 1L),
      (1L, Some("A"), 20L, 2L)).toDF("k", "attr", "us", "tie")
    val out = Upsert.scd2FromLog(log, "k", "attr", "us", "tie")
      .orderBy("valid_from_us").collect()
      .map(r => (Option(r.getString(1)), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(out.toSeq == Seq((None, 10L, Some(20L)),
      (Some("A"), 20L, None)), out.toSeq)
  }

  test("saltedJoin rejects small-side-preserving join types") {
    val big = Seq((1L, "x")).toDF("k", "b")
    val small = Seq((1L, "y")).toDF("k", "s")
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(big, small, Seq("k"), 4, "right_outer")
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(big, small, Seq("k"), 4, "full_outer")
    }
    assert(Joins.saltedJoin(big, small, Seq("k"), 4).count() == 1)
  }

  test("asofBackward attaches the latest right row ATOMICALLY: a " +
    "null field of the newest row is not backfilled from older rows") {
    val right = Seq((1L, 10L, Some(1L), Some(2L)),
      (1L, 20L, Some(3L), Option.empty[Long]))
      .toDF("k", "rts", "a", "b")
    val left = Seq((1L, 30L)).toDF("k", "lts")
    val r = Joins.asofBackward(left, right, Seq("k"), "lts", "rts")
      .collect()(0)
    val (a, b) = (r.getAs[Any]("a"), r.getAs[Any]("b"))
    assert(a == 3L && b == null,
      s"must be the t=20 row verbatim (a=3, b=null), got a=$a b=$b")
  }

  test("asofBackward rejects right payload names colliding with left") {
    val right = Seq((1L, 10L, "p")).toDF("k", "rts", "v")
    val left = Seq((1L, 30L, "q")).toDF("k", "lts", "v")
    intercept[IllegalArgumentException] {
      Joins.asofBackward(left, right, Seq("k"), "lts", "rts")
    }
  }

  test("K2 partial: only listed columns change; unmatched keys insert " +
    "with null fill") {
    val updates = Seq(("b", "patched"), ("d", "fresh")).toDF("id", "val")
    val out = Upsert.partial(base, updates, Seq("id"), Seq("val"))
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.get(2))))
    assert(out.toSeq == Seq(
      ("a", "old", Some(1L)), ("b", "patched", Some(2L)),
      ("c", "old", Some(3L)), ("d", "fresh", None)))
  }

  test("K3 insertIfAbsent: NULL keys dedup against themselves " +
    "(users.py:118-125)") {
    val existing = Seq(Some("g1"), None).toDF("group_code")
    val incoming = Seq(Some("g1"), Some("g2"), None).toDF("group_code")
    val out = Upsert.insertIfAbsent(existing, incoming, Seq("group_code"))
    assert(out.count() == 3) // g1, NULL kept once; only g2 inserted
  }

  test("K4 reconcileChildren: children replaced per incoming parent, " +
    "other parents untouched") {
    val children = Seq(("p1", 1), ("p1", 2), ("p2", 1))
      .toDF("parent", "idx")
    val incoming = Seq(("p1", 9)).toDF("parent", "idx")
    val out = Upsert.reconcileChildren(children, incoming, Seq("parent"))
      .orderBy("parent", "idx").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    assert(out.toSeq == Seq(("p1", 9), ("p2", 1)))
  }

  test("K5 lastWriteWins keeps newest per key") {
    val rows = Seq(("k", 1L, "first"), ("k", 5L, "last"), ("j", 2L, "only"))
      .toDF("key", "ts", "payload")
    val out = Upsert.lastWriteWins(rows, Seq("key"), "ts")
      .orderBy("key").collect().map(r => (r.getString(0), r.getString(2)))
    assert(out.toSeq == Seq(("j", "only"), ("k", "last")))
  }

  test("K6 scd2FromLog: consecutive repeats collapse, changes open " +
    "versions with adjoining intervals, last version stays current") {
    // A,A,B,A — the repeat must NOT create a version; the A at t=40
    // MUST (it differs from its predecessor B)
    val log = Seq(
      ("u1", 10L, 1L, "A"), ("u1", 20L, 2L, "A"),
      ("u1", 30L, 3L, "B"), ("u1", 40L, 4L, "A"),
      ("u2", 15L, 5L, "X"))
      .toDF("key", "us", "eid", "attr")
    val out = Upsert.scd2FromLog(log, "key", "attr", "us", "eid")
      .orderBy("key", "valid_from_us").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4)))
    assert(out.toSeq == Seq(
      ("u1", "A", 10L, Some(30L), 0),
      ("u1", "B", 30L, Some(40L), 0),
      ("u1", "A", 40L, None, 1),
      ("u2", "X", 15L, None, 1)))
  }

  test("T1 watermarks: capture→commit keeps max per scope; re-commit " +
    "is a no-op; filter passes unseen scopes") {
    val batch1 = Seq(("f1", 100L), ("f1", 200L), ("f2", 50L))
      .toDF("form_id", "ts")
    val empty = Seq.empty[(String, Long)].toDF("scope_key", "watermark_ts")
    val wm1 = Incremental.commitWatermarks(empty,
      Incremental.captureWatermarks(batch1, "form_id", "ts"))
    assert(wm1.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("f1" -> 200L, "f2" -> 50L))
    val wm2 = Incremental.commitWatermarks(wm1,
      Incremental.captureWatermarks(batch1, "form_id", "ts"))
    assert(wm2.orderBy("scope_key").collect().toSeq ==
      wm1.orderBy("scope_key").collect().toSeq)

    val batch2 = Seq(("f1", 150L), ("f1", 300L), ("f3", 10L))
      .toDF("form_id", "ts")
    val fresh = Incremental.newerThanWatermark(batch2, wm1, "form_id", "ts")
    assert(fresh.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("f1", 300L), ("f3", 10L))) // 150 < 200 filtered; f3 unseen passes
  }

  test("T3 refetchTargets: outline ∪ open-status − ignore " +
    "(gateway.py:495-507)") {
    val outline = Seq("r1", "r2").toDF("id")
    val silver = Seq(("r3", "in_progress"), ("r4", "completed"),
      ("r2", "returned")).toDF("id", "status")
    val ignore = Seq("r1").toDF("id")
    val targets = Incremental.refetchTargets(outline, silver, ignore,
      "id", "status").collect().map(_.getString(0)).toSet
    assert(targets == Set("r2", "r3")) // r4 terminal, r1 ignored
  }

  test("T5 DLQ: failures dedup by (api, scope, item, phase); retry " +
    "planning drops exhausted items and flags retries") {
    val empty = Seq.empty[(String, String, String, String, String, Long)]
      .toDF("api_type", "scope_key", "item_id", "phase", "error", "ts")
    val f1 = Seq(("req", "f1", "r1", "fetch", "timeout", 1L),
      ("req", "f1", "r2", "fetch", "500", 1L))
      .toDF("api_type", "scope_key", "item_id", "phase", "error", "ts")
    val dlq1 = Incremental.recordFailures(empty, f1)
    assert(dlq1.count() == 2)
    // same key fails again later — replaces, not duplicates
    val f2 = Seq(("req", "f1", "r1", "fetch", "timeout2", 2L))
      .toDF("api_type", "scope_key", "item_id", "phase", "error", "ts")
    val dlq2 = Incremental.recordFailures(dlq1, f2)
    assert(dlq2.count() == 2)
    val r1Row = dlq2.filter(col("item_id") === "r1").collect().head
    assert(r1Row.getAs[String]("error") == "timeout2")
    // same-key repeat failure ACCUMULATES the attempt counter
    assert(r1Row.getAs[Long]("n_failures") == 2L)

    val work = Seq("r1", "r3").toDF("id")
    val planned = Incremental.planRetries(work, dlq2, "id", maxAttempts = 3)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(planned == Map("r1" -> true, "r3" -> false))
    // a THIRD same-phase failure reaches maxAttempts → quarantined,
    // even though the DLQ still holds a single row for the key
    val f3 = Seq(("req", "f1", "r1", "fetch", "timeout3", 3L))
      .toDF("api_type", "scope_key", "item_id", "phase", "error", "ts")
    val dlq3 = Incremental.recordFailures(dlq2, f3)
    assert(dlq3.filter(col("item_id") === "r1").collect()
      .head.getAs[Long]("n_failures") == 3L)
    val planned2 = Incremental.planRetries(work, dlq3, "id", maxAttempts = 3)
      .collect().map(_.getString(0)).toSet
    assert(planned2 == Set("r3"))
  }

  test("T4 phase ladder + T6 retry ladder") {
    assert(Incremental.isFuturePhase("BASIC_DATA", "FORM_DETAIL"))
    assert(!Incremental.isFuturePhase("FORM_DETAIL", "BASIC_DATA"))
    var slept = Seq.empty[Long]
    var calls = 0
    val out = Incremental.withRetryLadder(Seq(1L, 2L), d => slept :+= d) {
      () => { calls += 1
        if (calls < 3) throw new java.io.IOException("net"); "ok" }
    }
    assert(out == "ok" && calls == 3 && slept == Seq(1L, 2L))
  }
}
