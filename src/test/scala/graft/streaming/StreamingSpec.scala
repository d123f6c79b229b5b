package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured-Streaming twins driven through MemoryStream: the same
  * transforms as the batch queries, executed incrementally with
  * watermarks and keyed state.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  import EventStream._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumblingCounts over a stream matches the batch plan on the " +
    "same data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    try {
      mem.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(20), 1, "click", 2.0),
        Event(3, Timestamp.valueOf("2024-01-01 11:10:00"), 2, "view", 3.0))
      q.processAllAvailable()
      val got = spark.table("tumbling")
        .orderBy("bucket_start", "event_type").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      assert(got.toSeq == Seq(
        ("2024-01-01 10:00:00.0", "click", 2L),
        ("2024-01-01 11:00:00.0", "view", 1L)))
      // batch twin over identical rows
      val batch = tumblingCounts(Seq(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(20), 1, "click", 2.0),
        Event(3, Timestamp.valueOf("2024-01-01 11:10:00"), 2, "view", 3.0))
        .toDF()).orderBy("bucket_start", "event_type").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      assert(batch.toSeq == got.toSeq)
    } finally q.stop()
  }

  test("sessionCounts groups by 30-minute gaps") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionCounts(mem.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try {
      // user 1: 10:00,10:10 (one session), 11:30 (new session)
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 1.0),
        Event(3, Timestamp.valueOf("2024-01-01 11:30:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("sessions").orderBy("session_start")
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      assert(got.toSeq == Seq((1L, 2L), (1L, 1L)))
    } finally q.stop()
  }

  test("runningUserCounts keeps per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = runningUserCounts(mem.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode("update").start()
    try {
      mem.addData(Event(1, ts(0), 7, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Event(2, ts(1), 7, "click", 1.0),
        Event(3, ts(2), 8, "view", 1.0))
      q.processAllAvailable()
      val got = spark.table("running").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // user 7 counted 1 in batch 1, then 2 cumulative in batch 2
      assert(got == Set((7L, 1L), (7L, 2L), (8L, 1L)))
    } finally q.stop()
  }

  test("append mode + watermark EVICTS late events: a row older than " +
    "the watermark is dropped, closed windows emit exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val agg = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("user_id"), col("n"))
    val q = agg.writeStream.format("memory").queryName("evict")
      .outputMode("append").start()
    try {
      // window [10:00,10:10): one event
      mem.addData(Event(1, ts(5), 1, "click", 1.0))
      q.processAllAvailable()
      // advance the watermark past 10:10 → the window closes and emits
      mem.addData(Event(2, ts(30), 1, "click", 1.0))
      q.processAllAvailable()
      // LATE event inside the closed window — must be evicted, the
      // emitted count must not change and no duplicate row may appear
      mem.addData(Event(3, ts(2), 1, "click", 1.0))
      q.processAllAvailable()
      // close the second window too
      mem.addData(
        Event(4, Timestamp.valueOf("2024-01-01 11:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("evict").orderBy("w_start").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
      assert(got.toSeq == Seq(
        ("2024-01-01 10:00:00.0", 1L, 1L), // late event NOT counted
        ("2024-01-01 10:30:00.0", 1L, 1L)))
    } finally q.stop()
  }

  test("dedupFirstSeen keeps only the first (user_id, event_type) " +
    "occurrence across micro-batches (st4 streaming twin)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = dedupFirstSeen(mem.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 1, "click", 2.0), // same key, same batch → drop
        Event(3, ts(2), 2, "view", 3.0))
      q.processAllAvailable()
      mem.addData(Event(4, ts(3), 1, "click", 4.0)) // next batch → drop
      q.processAllAvailable()
      val got = spark.table("dedup_stream").orderBy("event_id")
        .collect().map(_.getLong(0))
      assert(got.toSeq == Seq(1L, 3L))
    } finally q.stop()
  }

  test("gapSessions: late events extend session start, sessions close " +
    "only once the watermark passes (flatMapGroupsWithState; ts3 twin)") {
    implicit val sqlCtx = spark.sqlContext
    def at(hour: Int, minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")
    val mem = MemoryStream[Event]
    val q = gapSessions(mem.toDS(), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("gap_sessions")
      .outputMode("append").start()
    try {
      // batch 1: one user-1 session 10:00-10:10 → watermark 08:10
      mem.addData(
        Event(1, at(10, 0), 1, "click", 1.0),
        Event(2, at(10, 10), 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("gap_sessions").count() == 0,
        "nothing may close while the watermark sits at 08:10")
      // batch 2: a LATE but in-watermark event at 09:50 must extend
      // the session's START (the single-session-state bug emitted
      // start=10:00 for it); plus a gap-separated event at 13:00.
      // The watermark then advances to 11:00 and the engine's timeout
      // sweep closes session 1 (close point 10:40) — with the
      // late-extended start and duration.
      mem.addData(
        Event(3, at(9, 50), 1, "click", 1.0),
        Event(4, at(13, 0), 1, "click", 1.0))
      q.processAllAvailable()
      val afterLate = spark.table("gap_sessions")
        .collect().map(r => (r.getTimestamp(1), r.getLong(2), r.getLong(3)))
      assert(afterLate.toSeq == Seq((at(9, 50), 3L, 1200L)))
      // batch 3: user 2 advances the watermark to 21:00 → user-1's
      // remaining session (close point 13:30) times out too
      mem.addData(Event(5, at(23, 0), 2, "click", 1.0))
      q.processAllAvailable()
      val closed = spark.table("gap_sessions")
        .filter(col("user_id") === 1).orderBy(col("session_start"))
        .collect().map(r => (r.getTimestamp(1), r.getLong(2), r.getLong(3)))
      assert(closed.toSeq == Seq((at(9, 50), 3L, 1200L),
        (at(13, 0), 1L, 0L)))
    } finally q.stop()
  }

  test("mergeSink resumes from its checkpoint exactly-once across " +
    "query restarts: committed batches never re-apply, new ones do") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-ck").toString
    val target = s"$base/target"
    val mem = MemoryStream[Event]
    def start() = EventStream.mergeSink(
      mem.toDF().select(col("event_id").as("k"),
        col("event_type").as("v"), col("ts")),
      target, s"$base/ck", Seq("k"), "ts").start()
    val q1 = start()
    mem.addData(Event(1, ts(0), 1, "a", 1.0),
      Event(2, ts(1), 1, "b", 1.0))
    q1.processAllAvailable(); q1.stop()
    // restart from the SAME checkpoint: batch 1 is committed — only
    // the new data may be applied (a re-apply would resurrect "b"
    // over the newer "b2" ... and double-merge keys)
    mem.addData(Event(2, ts(5), 1, "b2", 1.0),
      Event(3, ts(6), 1, "c", 1.0))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val got = spark.read.parquet(target).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a"), (2L, "b2"), (3L, "c")),
      got.mkString(";"))
  }

  test("mergeSink crash-replay: a batch whose commit marker is lost " +
    "is RE-DELIVERED on restart and re-applies idempotently") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-ck-replay").toString
    val target = s"$base/target"
    val mem = MemoryStream[Event]
    def start(ck: String) = EventStream.mergeSink(
      mem.toDF().select(col("event_id").as("k"),
        col("event_type").as("v"), col("ts")),
      target, ck, Seq("k"), "ts").start()
    val q1 = start(s"$base/ck")
    mem.addData(Event(1, ts(0), 1, "a", 1.0),
      Event(2, ts(1), 1, "b", 1.0))
    q1.processAllAvailable(); q1.stop()
    val committed = spark.read.parquet(target).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(committed.toSeq == Seq((1L, "a"), (2L, "b")))
    // CRASH SIMULATION: the batch's data reached the table but the
    // engine died before writing the commit marker — the restart
    // checkpoint is a faithful copy of the crashed run's state MINUS
    // commits/0 (a copy, not an in-place delete: the engine treats
    // files vanishing under a live path as concurrent tampering). On
    // restart, Structured Streaming finds offsets/0 without commits/0
    // and RE-EXECUTES epoch 0 over the same offset range. This is the
    // exactly-once contract's hard case: the sink sees the SAME batch
    // twice and the table must not change (merge idempotency), which
    // checkpoint-resume tests never exercise.
    val src = java.nio.file.Paths.get(s"$base/ck")
    val dst = java.nio.file.Paths.get(s"$base/ck-crashed")
    java.nio.file.Files.walk(src).forEach { p =>
      val rel = src.relativize(p).toString
      // drop the marker AND its LocalFileSystem checksum sidecar — a
      // stale .crc makes the replayed commit write fail as a phantom
      // "file already exists"
      if (rel != "commits/0" && rel != "commits/.0.crc")
        java.nio.file.Files.copy(p, dst.resolve(src.relativize(p)),
          java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
    }
    assert(!java.nio.file.Files.exists(dst.resolve("commits/0")) &&
      java.nio.file.Files.exists(dst.resolve("offsets/0")),
      "crash checkpoint must hold offsets/0 but no commits/0")
    val q2 = start(s"$base/ck-crashed")
    q2.processAllAvailable()
    val replayed = spark.read.parquet(target).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(replayed.toSeq == committed.toSeq,
      s"re-delivered epoch changed the table: ${replayed.mkString(";")}")
    // and the stream CONTINUES: a genuinely new epoch applies on top
    mem.addData(Event(2, ts(5), 1, "b2", 1.0),
      Event(3, ts(6), 1, "c", 1.0))
    q2.processAllAvailable(); q2.stop()
    val got = spark.read.parquet(target).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a"), (2L, "b2"), (3L, "c")),
      got.mkString(";"))
  }

  test("versionedSink crash-replay: a re-delivered epoch publishes NO " +
    "duplicate version — exactly-once without idempotent merges") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Snapshots
    val base = java.nio.file.Files
      .createTempDirectory("graft-vsink").toString
    val table = s"$base/table"
    val mem = MemoryStream[Event]
    def start(ck: String) = EventStream.versionedSink(
      mem.toDF().select(col("event_id").as("k"),
        col("event_type").as("v")), table, ck).start()
    val q1 = start(s"$base/ck")
    mem.addData(Event(1, ts(0), 1, "a", 1.0))
    q1.processAllAvailable(); q1.stop()
    assert(Snapshots.latestVersion(spark, table) == 1L)
    // crash copy missing commits/0 (+ its .crc): epoch 0 re-delivers
    val src = java.nio.file.Paths.get(s"$base/ck")
    val dst = java.nio.file.Paths.get(s"$base/ck-crashed")
    java.nio.file.Files.walk(src).forEach { p =>
      val rel = src.relativize(p).toString
      if (rel != "commits/0" && rel != "commits/.0.crc")
        java.nio.file.Files.copy(p, dst.resolve(src.relativize(p)),
          java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
    }
    val q2 = start(s"$base/ck-crashed")
    q2.processAllAvailable()
    // an APPEND batch re-applied would double the row; the epoch
    // fence must instead leave the version log untouched
    assert(Snapshots.latestVersion(spark, table) == 1L,
      "re-delivered epoch must not publish a new version")
    assert(Snapshots.read(spark, table).count() == 1L)
    // the stream continues: a new epoch publishes v2
    mem.addData(Event(2, ts(5), 1, "b", 1.0))
    q2.processAllAvailable(); q2.stop()
    assert(Snapshots.latestVersion(spark, table) == 2L)
    assert(Snapshots.read(spark, table).orderBy("k").collect()
      .map(_.getString(1)).toSeq == Seq("b"))
    // direct fence check: same epoch re-commits as Left, no version
    val again = Snapshots.commitWithEpoch(spark,
      Seq((9L, "dup")).toDF("k", "v"), table, 1L)
    assert(again.isLeft && Snapshots.latestVersion(spark, table) == 2L)
  }

  test("windowTopK emits a window's ranked types ONLY once the " +
    "watermark closes it; ranks are deterministic on ties") {
    implicit val sqlCtx = spark.sqlContext
    def at(hour: Int, minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")
    val mem = MemoryStream[Event]
    val q = windowTopK(mem.toDS(), windowMs = 3600 * 1000L, k = 2)
      .writeStream.format("memory").queryName("win_topk")
      .outputMode("append").start()
    try {
      // window 10:00-11:00 — click×3, view×2, error×2 (tie with view)
      mem.addData(
        Event(1, at(10, 0), 1, "click", 1.0),
        Event(2, at(10, 5), 2, "click", 1.0),
        Event(3, at(10, 10), 3, "view", 1.0),
        Event(4, at(10, 20), 1, "error", 1.0),
        Event(5, at(10, 30), 2, "view", 1.0),
        Event(6, at(10, 40), 3, "error", 1.0),
        Event(7, at(10, 50), 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("win_topk").count() == 0,
        "window still open: nothing may emit")
      // watermark = max ts − 2h; 14:00 moves it to 12:00 > 11:00
      mem.addData(Event(8, at(14, 0), 9, "view", 1.0))
      q.processAllAvailable()
      val got = spark.table("win_topk").orderBy("rank")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getInt(3)))
      // top-2 of {click:3, error:2, view:2}: tie broken error<view
      assert(got.toSeq == Seq(
        (at(10, 0), "click", 3L, 1),
        (at(10, 0), "error", 2L, 2)))
    } finally q.stop()
  }

  test("enrich joins the stream to a static dim without state (st5 " +
    "streaming twin)") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "AUTOMOBILE"), (2L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
    val mem = MemoryStream[Event]
    val q = enrich(mem.toDF(), dim)
      .select(col("event_id"), col("c_mktsegment"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 2, "view", 2.0),
        Event(3, ts(2), 99, "view", 3.0)) // no dim row → inner-dropped
      q.processAllAvailable()
      val got = spark.table("enriched").orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq == Seq((1L, "AUTOMOBILE"), (2L, "BUILDING")))
    } finally q.stop()
  }

  test("followupJoin pairs clicks with purchases inside the 10-minute " +
    "window only (st6 streaming twin, stream-stream join)") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = followupJoin(clicks.toDF(), purchases.toDF())
      .select(col("click_id"), col("p_ts"))
      .writeStream.format("memory").queryName("followups")
      .outputMode("append").start()
    try {
      clicks.addData(Event(1, ts(0), 7, "click", 1.0))
      purchases.addData(
        Event(10, ts(5), 7, "purchase", 9.0), // inside window → joins
        Event(11, ts(20), 7, "purchase", 9.0), // outside 10 min → no
        Event(12, ts(5), 8, "purchase", 9.0)) // other user → no
      q.processAllAvailable()
      val got = spark.table("followups").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1)))
      assert(got.toSeq == Seq((1L, ts(5))))
    } finally q.stop()
  }

  test("followupJoinLeft emits unmatched clicks with nulls ONLY " +
    "after the watermark proves no purchase can arrive") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = followupJoinLeft(clicks.toDF(), purchases.toDF())
      .select(col("click_id"), col("p_ts"))
      .writeStream.format("memory").queryName("followups_left")
      .outputMode("append").start()
    try {
      clicks.addData(
        Event(1, ts(0), 7, "click", 1.0), // will match
        Event(2, ts(0), 8, "click", 1.0)) // never matches
      purchases.addData(Event(10, ts(5), 7, "purchase", 9.0))
      q.processAllAvailable()
      val early = spark.table("followups_left").collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(1))))
      // matched row emits promptly; the unmatched click must NOT have
      // emitted a null row yet — no proof that nothing is coming
      assert(early.toSeq == Seq((1L, Some(ts(5)))))
      // advance both watermarks far past click 2's join window
      // (watermark = max event ts - 30 min > ts(0) + 10 min)
      clicks.addData(Event(3, ts(120), 9, "click", 1.0))
      purchases.addData(Event(11, ts(120), 9, "purchase", 9.0))
      q.processAllAvailable()
      val late = spark.table("followups_left").collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(1)))).toSet
      // click 2 has now been evicted from state as a null-padded row
      assert(late.contains((2L, None)), late.toString)
    } finally q.stop()
  }

  test("mergeSink applies last-write-wins per micro-batch (K5 " +
    "streaming twin); replay-idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-merge")
    val target = dir.resolve("table").toString
    val ckpt = dir.resolve("ckpt").toString
    val mem = MemoryStream[Event]
    val q = mergeSink(mem.toDF(), target, ckpt,
      Seq("user_id", "event_type"), "ts").start()
    try {
      mem.addData(Event(1, ts(0), 1, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Event(2, ts(5), 1, "click", 9.0)) // newer, same key
      q.processAllAvailable()
      val rows = spark.read.parquet(target)
        .select("user_id", "event_type", "value").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      assert(rows.toSeq == Seq((1L, "click", 9.0)))
    } finally q.stop()
  }

  test("anomalies: a spike vs running history is flagged, steady flow " +
    "is not, and state carries across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.anomalies(mem.toDS())
      .writeStream.format("memory").queryName("anom")
      .outputMode("append").start()
    try {
      // batch 1: 12 steady clicks (10.00 ± 0.05) — builds history; no
      // event has 10 priors AND a 3-sigma deviation
      mem.addData((0 until 12).map(i =>
        Event(i.toLong, ts(i), 1, "click", 10.0 + (i % 3) * 0.05)): _*)
      q.processAllAvailable()
      assert(spark.table("anom").count() == 0,
        "steady traffic must not flag")
      // batch 2: state carried — the spike tests against 12 priors
      mem.addData(
        Event(100, ts(20), 1, "click", 500.0),
        Event(101, ts(21), 1, "click", 10.05))
      q.processAllAvailable()
      val got = spark.table("anom").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      // only the spike flags; 101 tests against history that now
      // CONTAINS the spike (huge variance) so it stays quiet
      assert(got.toSeq == Seq((100L, "click", 12L)))
    } finally q.stop()
  }

  test("cusumDrift: steady flow stays quiet; a level shift alarms " +
    "after the integer CUSUM crosses the scaled threshold, resets, " +
    "and re-alarms at a steady cadence") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // warmup 5 @ 10.00 -> ref = (5, 5000); slack 0.50, threshold 3.00
    // shift to 12.00: per-event increment 5*1200-5000-250 = 750,
    // lim = 1500 -> alarms on the 3rd, 6th shifted event (2250 > 1500)
    val q = EventStream.cusumDrift(mem.toDS(), warmup = 5L,
        slackCents = 50L, thresholdCents = 300L)
      .writeStream.format("memory").queryName("drift")
      .outputMode("append").start()
    try {
      mem.addData((0 until 10).map(i =>
        Event(i.toLong, ts(i), 1, "click", 10.0)): _*)
      q.processAllAvailable()
      assert(spark.table("drift").count() == 0, "steady must not alarm")
      mem.addData((10 until 16).map(i =>
        Event(i.toLong, ts(i), 1, "click", 12.0)): _*)
      q.processAllAvailable()
      val got = spark.table("drift").collect()
        .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).sorted
      assert(got.toSeq == Seq((12L, "up", 2250L), (15L, "up", 2250L)),
        got.mkString(","))
      // downward shift through the SAME state: 8.00 gives the
      // mirrored increment 5000-4000-250 = 750 on the S- side
      mem.addData((16 until 19).map(i =>
        Event(i.toLong, ts(i), 1, "click", 8.0)): _*)
      q.processAllAvailable()
      val dn = spark.table("drift").collect()
        .map(r => (r.getLong(0), r.getString(2))).filter(_._2 == "down")
      assert(dn.toSeq == Seq((18L, "down")), dn.mkString(","))
    } finally q.stop()
  }

  test("anomalies: a 50k-event single-key batch folds through the " +
    "bounded reorder buffer — same rows as the exact sort, O(bound) " +
    "not O(batch) held per key") {
    implicit val sqlCtx = spark.sqlContext
    // one hot key, timestamps emitted OUT of order with displacement
    // ≤ 64 (block-reversed in chunks of 64 — worst case 63 positions):
    // a tiny maxReorder=64 must still reproduce the exact-sort rows,
    // proving the buffer (not residual full materialization) does the
    // ordering. Values: steady 10.00 with deterministic spikes.
    val n = 50000
    val ordered = (0 until n).map { i =>
      val v = if (i % 5000 == 2500) 500.0 else 10.0 + (i % 3) * 0.05
      Event(i.toLong, ts(i), 1, "click", v)
    }
    val shuffled = ordered.grouped(64).flatMap(_.reverse).toSeq
    // oracle: fold in exact order with the same integer moments
    var (on, os) = (0L, 0L); var oq = BigInt(0)
    val expected = Seq.newBuilder[Long]
    ordered.foreach { e =>
      val x = math.round(e.value * 100)
      val lhs = BigInt(on) * x - os
      if (on >= 10 && lhs * lhs > 9 * (BigInt(on) * oq - BigInt(os) * os))
        expected += e.event_id
      on += 1; os += x; oq += BigInt(x) * x
    }
    val mem = MemoryStream[Event]
    // coalesce(1) pins the group-iterator order to insertion order so
    // the planted ≤63-position displacement is what the buffer sees
    // (multi-partition interleave would make the bound nondeterministic
    // in a unit test; real sources own their ordering contract)
    val q = EventStream.anomalies(mem.toDS().coalesce(1), maxReorder = 64)
      .writeStream.format("memory").queryName("anom_big")
      .outputMode("append").start()
    try {
      mem.addData(shuffled: _*)
      q.processAllAvailable()
      val got = spark.table("anom_big").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got.nonEmpty, "fixture should flag its planted spikes")
      assert(got == expected.result().sorted,
        s"got ${got.size} rows vs expected ${expected.result().size}")
    } finally q.stop()
  }
}
