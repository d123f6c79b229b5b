package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDir(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("behv").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def at(min: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("ts7: a planted 3-sigma spike is flagged, steady traffic is not") {
    // 19 steady values 10.00±0.05 and one 1000.00 spike, all within
    // one 24 h window of type 'a'
    val steady = (0 until 19).map(i =>
      (i.toLong, at(i), 1L, "a", 10.0 + (i % 3) * 0.05))
    val dir = eventsDir(steady :+ (99L, at(30), 1L, "a", 1000.0))
    val out = Behavior.queries("ts7_rolling_anomaly")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(out.contains(99L), "spike not flagged")
    assert(!out.exists(_ < 19L), s"steady events misflagged: $out")
  }

  test("xq9: cohort week 0 counts every user; returns land in week k") {
    val wk = 7 * 24 * 60
    def atMin(m: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + m * 60000L)
    val rows = Seq(
      (1L, atMin(0), 1L, "a", 1.0),       // u1 cohort w, returns w+1
      (2L, atMin(wk + 5), 1L, "a", 1.0),
      (3L, atMin(10), 2L, "a", 1.0))      // u2 cohort w only
    val out = Behavior.queries("xq9_retention_cohorts")(
        spark, eventsDir(rows))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L) == 2L, "week 0 must count both users")
    assert(out(1L) == 1L, "week 1 must count the returning user")
  }

  test("xq14: MAD is the exact lower median of |x - median|, and an " +
    "outlier that wrecks stddev barely moves it") {
    // type 'a': values 1..9 (median 5, deviations 0,1,1,2,2,3,3,4,4
    // -> MAD 2); type 'b': same but with a huge outlier replacing 9
    val a = (1 to 9).map(i => (i.toLong, at(i), 1L, "a", i.toDouble))
    val b = (1 to 8).map(i => (20L + i, at(i), 1L, "b", i.toDouble)) :+
      (40L, at(20), 1L, "b", 100000.0)
    val out = Behavior.queries("xq14_mad")(spark, eventsDir(a ++ b))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    graft.operators.ManagedCache.releaseAll()
    assert(out("a") == ((500L, 200L, 9L)), out.toString)
    // b: median 5 (lower median of 1..8 + outlier), deviations
    // 0,1,1,2,2,3,3,4 and 99995 -> lower median dev = 2
    assert(out("b") == ((500L, 200L, 9L)), out.toString)
  }

  test("xq10: transition counts and per-mille shares are exact") {
    val rows = Seq(
      (1L, at(1), 1L, "a", 1.0), (2L, at(2), 1L, "b", 1.0),
      (3L, at(3), 1L, "a", 1.0), (4L, at(4), 1L, "b", 1.0),
      (5L, at(5), 1L, "a", 1.0), (6L, at(6), 1L, "c", 1.0))
    val out = Behavior.queries("xq10_event_transitions")(
        spark, eventsDir(rows))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // a→b twice, a→c once (p 666/333), b→a twice (1000)
    assert(out(("a", "b")) == (2L, 666L))
    assert(out(("a", "c")) == (1L, 333L))
    assert(out(("b", "a")) == (2L, 1000L))
  }

  test("xq20: user support counts distinct users, not occurrences — " +
    "a twice-repeating user and a once-user give support 2, occ 3") {
    // u1: a b c a b c  -> trigrams abc, bca, cab, abc (abc twice)
    // u2: a b c        -> abc once
    val rows = Seq("a", "b", "c", "a", "b", "c").zipWithIndex.map {
      case (t, i) => (i.toLong, at(i), 1L, t, 1.0)
    } ++ Seq("a", "b", "c").zipWithIndex.map {
      case (t, i) => (10L + i, at(i), 2L, t, 1.0)
    }
    val out = Behavior.queries("xq20_trigram_sequences")(
        spark, eventsDir(rows)).collect()
    val top = out.head
    assert((top.getString(0), top.getString(1), top.getString(2),
      top.getLong(3), top.getLong(4)) == (("a", "b", "c", 2L, 3L)),
      top.toString)
    assert(out.tail.forall(_.getLong(3) == 1L), out.mkString(","))
  }
}
