package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SaltedWindow invariants: value-identity with the unsalted window
  * (including across bucket boundaries and under planted key skew)
  * and the bounded-partition property that makes it scale.
  */
class SaltedWindowSpec extends SparkSpec {
  import spark.implicits._

  private val W = 1000L // 1 ms window/bucket in "us" units

  /** Deterministic skewed stream: one hot key holds 90% of the rows,
    * timestamps scattered non-monotonically across 40 buckets,
    * duplicate timestamps included (range-frame tie semantics). */
  private def skewed(n: Int) = (1 to n).map { i =>
    val key = if (i % 10 != 0) "hot" else s"cold${i % 3}"
    val us = ((i.toLong * 2654435761L) % (40 * W)).abs
    (i.toLong, key, us, (i % 97).toLong)
  }.toDF("id", "k", "us", "v").repartition(7)

  test("salted trailing aggregates equal the unsalted window under " +
    "90% single-key skew, boundary rows and ties included") {
    val df = skewed(4000)
    val plain = Window.partitionBy($"k").orderBy($"us")
      .rangeBetween(-W, 0L)
    val expected = df.select($"id",
        count(lit(1)).over(plain).as("n"), sum($"v").over(plain).as("s"))
      .orderBy($"id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = SaltedWindow.trailing(df, Seq("k"), "us", W)(w => Seq(
        count(lit(1)).over(w).as("n"), sum($"v").over(w).as("s")))
      .select($"id", $"n", $"s")
      .orderBy($"id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 4000)
    assert(got.toSeq == expected.toSeq)
  }

  test("salting bounds the largest window partition by two buckets of " +
    "one key — the property that caps task size under skew") {
    val df = skewed(4000)
    // unsalted: the hot key's partition is its whole stream
    val hotTotal = df.filter($"k" === "hot").count()
    assert(hotTotal >= 3500, s"fixture lost its skew: $hotTotal")
    // salted: rows per (k, bucket) incl. the echo = own bucket rows +
    // previous bucket's carry-in ≤ 2 × max single-bucket population
    val bucketed = df.withColumn("b",
      call_function("div", $"us", lit(W)))
    val perBucket = bucketed.groupBy($"k", $"b").count()
      .agg(max($"count")).as[Long].head()
    val maxSalted = perBucket * 2
    assert(maxSalted * 4 < hotTotal,
      s"salting must shrink the hot task: 2×bucket=$maxSalted vs " +
        s"unsalted=$hotTotal (40 buckets planted)")
  }

  test("rows in the first bucket (no preceding bucket) and an empty " +
    "frame edge behave identically to the unsalted window") {
    // 3 rows at us < W plus one isolated row far away: trailing frames
    // are pure prefixes; the isolated row sees only itself
    val df = Seq((1L, "a", 10L, 5L), (2L, "a", 20L, 7L),
      (3L, "a", 900L, 11L), (4L, "a", 10 * W + 1, 13L))
      .toDF("id", "k", "us", "v")
    val got = SaltedWindow.trailing(df, Seq("k"), "us", W)(w =>
        Seq(sum($"v").over(w).as("s")))
      .orderBy($"id").select($"s").as[Long].collect()
    assert(got.toSeq == Seq(5L, 12L, 23L, 13L))
  }

  test("seeded-random differential sweep: salted == unsalted across " +
    "window widths, key counts, and clustering shapes") {
    val rnd = new scala.util.Random(0xC0FFEE)
    for (trial <- 1 to 6) {
      val wUs = Seq(7L, 100L, 1000L, 86400L)(trial % 4)
      val nKeys = 1 + rnd.nextInt(4)
      val n = 300 + rnd.nextInt(700)
      // mix of clustered runs (bursts near a bucket boundary) and
      // uniform scatter; duplicates and zero timestamps included
      val rows = (1 to n).map { i =>
        val us =
          if (rnd.nextBoolean()) {
            val boundary = (1 + rnd.nextInt(10)).toLong * wUs
            math.max(0L, boundary + rnd.nextInt(21) - 10)
          } else rnd.nextLong(40 * wUs)
        (i.toLong, s"k${rnd.nextInt(nKeys)}", us,
          rnd.nextInt(1000).toLong)
      }.toDF("id", "k", "us", "v").repartition(5)
      val plain = Window.partitionBy($"k").orderBy($"us")
        .rangeBetween(-wUs, 0L)
      val expected = df2seq(rows.select($"id",
        count(lit(1)).over(plain).as("n"),
        sum($"v").over(plain).as("s"),
        max($"v").over(plain).as("m")))
      val got = df2seq(SaltedWindow.trailing(rows, Seq("k"), "us", wUs)(
        w => Seq(count(lit(1)).over(w).as("n"),
          sum($"v").over(w).as("s"), max($"v").over(w).as("m")))
        .select($"id", $"n", $"s", $"m"))
      assert(got == expected, s"trial $trial (wUs=$wUs nKeys=$nKeys)")
    }
  }

  private def df2seq(df: org.apache.spark.sql.DataFrame) =
    df.orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

  test("negative order values are covered too: truncating-div buckets " +
    "still put every trailing frame within (own bucket + carry-in)") {
    // rows straddling zero and negative bucket boundaries, duplicates
    // included — frames reach across the trunc-div plateau at zero
    // and across negative multiples of W
    val df = Seq(
      (1L, "a", -2500L, 1L), (2L, "a", -2001L, 2L), (3L, "a", -2000L, 3L),
      (4L, "a", -1500L, 4L), (5L, "a", -999L, 5L), (6L, "a", -500L, 6L),
      (7L, "a", -1L, 7L), (8L, "a", 0L, 8L), (9L, "a", 499L, 9L),
      (10L, "a", 999L, 10L), (11L, "a", 1000L, 11L), (12L, "a", -500L, 13L))
      .toDF("id", "k", "us", "v")
    val plain = Window.partitionBy($"k").orderBy($"us")
      .rangeBetween(-W, 0L)
    val expected = df.select($"id",
        count(lit(1)).over(plain).as("n"), sum($"v").over(plain).as("s"))
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = SaltedWindow.trailing(df, Seq("k"), "us", W)(w => Seq(
        count(lit(1)).over(w).as("n"), sum($"v").over(w).as("s")))
      .select($"id", $"n", $"s").orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("a non-long order column is rejected") {
    val df = Seq((1, "a", 1.5, 2L)).toDF("id", "k", "us", "v")
    intercept[IllegalArgumentException] {
      SaltedWindow.trailing(df, Seq("k"), "us", W)(w =>
        Seq(count(lit(1)).over(w).as("n")))
    }
  }
}
