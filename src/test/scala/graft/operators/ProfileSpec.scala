package graft.operators

import graft.SparkSpec

/** Profile: exact vs approx distinct-count modes.
  *
  * The exact mode plans the multi-distinct aggregate through Expand
  * (one input-row duplicate per distinct-counted column) — fine for
  * narrow catalogs, quadratic-ish shuffle for wide ones. The approx
  * mode (HLL++) must (a) stay within the sketch's error bound and
  * (b) plan WITHOUT Expand, so a 500-column profile stays one pass.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = (1 to 2000).map { i =>
    (i.toLong, (i % 97).toLong,
      if (i % 10 == 0) null else s"s${i % 450}")
  }.toDF("id", "grp", "s")

  test("exact profile: census matches hand counts") {
    val p = Profile.profile(fixture, Seq("id", "grp", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(1) == 2000L)      // n_rows
    assert(p("id").getLong(2) == 0L)         // n_null
    assert(p("id").getLong(3) == 2000L)      // n_distinct
    assert(p("grp").getLong(3) == 97L)
    assert(p("s").getLong(2) == 200L)        // every 10th null
    // s values s0..s449, but r ≡ 0 (mod 10) only occurs at i ≡ 0
    // (mod 10) positions (450 ≡ 0 mod 10), which are all null →
    // 450 - 45 distinct survive
    assert(p("s").getLong(3) == 405L)
    assert(p("id").getString(4) == "1" && p("id").getString(5) == "2000")
  }

  test("approx profile: distinct within rsd bound, same census otherwise") {
    val exact = Profile.profile(fixture, Seq("id", "grp", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val appr = Profile.profile(fixture, Seq("id", "grp", "s"),
      approx = true).collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("id", "grp", "s")) {
      // non-distinct stats are identical in both modes
      assert(appr(c).getLong(1) == exact(c).getLong(1))
      assert(appr(c).getLong(2) == exact(c).getLong(2))
      assert(appr(c).getString(4) == exact(c).getString(4))
      assert(appr(c).getString(5) == exact(c).getString(5))
      // HLL++ at rsd=0.05: allow 3 sigma
      val e = exact(c).getLong(3).toDouble
      val a = appr(c).getLong(3).toDouble
      assert(math.abs(a - e) <= math.max(3.0, 0.15 * e),
        s"$c: approx $a vs exact $e")
    }
  }

  test("topValues: per-column top-k with deterministic tie-break, " +
    "nulls excluded, strings for every type") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("x", Some(1L)), ("x", Some(1L)), ("x", Some(2L)),
      ("y", Some(2L)), ("y", None), ("z", Some(2L)))
      .toDF("s", "v")
    val got = Profile.topValues(df, Seq("s", "v"), 2)
      .orderBy(col("column"), col("rk"))
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.getString(2), r.getLong(3))).toSeq
    // s: x×3, y×2 (z drops at k=2); v: 2×3, 1×2; the null v is
    // excluded from the census entirely
    assert(got == Seq(("s", 1, "x", 3L), ("s", 2, "y", 2L),
      ("v", 1, "2", 3L), ("v", 2, "1", 2L)), got.toString)
  }

  test("approx profile plans without Expand; exact plans with it") {
    val cols = Seq("id", "grp", "s")
    def planOf(approx: Boolean): String = {
      val distinctAgg: String => org.apache.spark.sql.Column =
        if (approx)
          c => org.apache.spark.sql.functions
            .approx_count_distinct(org.apache.spark.sql.functions.col(c))
        else c => org.apache.spark.sql.functions
          .countDistinct(org.apache.spark.sql.functions.col(c))
      val aggs = cols.map(distinctAgg)
      fixture.agg(aggs.head, aggs.tail: _*)
        .queryExecution.executedPlan.toString
    }
    assert(planOf(approx = false).contains("Expand"))
    assert(!planOf(approx = true).contains("Expand"))
  }
}
