package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JaroWinkler: pinned against DuckDB's `jaro_winkler_similarity`
  * outputs (probed values below were read off DuckDB directly), the
  * oracle engine er1 replays in. Covers the three semantic corners
  * the replay depends on: the 0.7 boost threshold, INTEGER halving of
  * transpositions, and the zero-on-empty convention — plus codegen vs
  * interpreted parity and the SQL surface.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  // (a, b, duckdb jaro_winkler_similarity(a, b))
  private val pinned = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    // integer transposition halving: 3 mismatched matched positions
    // must count as t=1 (0.9444…), not t=1.5 (0.9166…)
    ("abcdef", "bcadef", 0.9444444444444445),
    // jaro 2/3 < 0.7 ⇒ NO prefix boost despite the 4-char prefix
    ("abcdXXXX", "abcdYYYY", 0.6666666666666666),
    // boost applied above threshold (jaro 0.7083), common prefix 2
    ("ab", "abcdefghijklmnop", 0.7666666666666667),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("abc", "", 0.0),
    // window 0 for short strings: transposed pair scores 0
    ("ab", "ba", 0.0))

  test("matches DuckDB jaro_winkler_similarity bit-for-bit") {
    pinned.foreach { case (a, b, want) =>
      val got = JaroWinkler.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want),
        s"jw($a, $b) = $got, duckdb says $want")
    }
  }

  test("codegen path agrees with the static compute") {
    val df = pinned.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val rows = df.select($"a", $"b",
      graft.expressions.JaroWinkler($"a", $"b").as("jw")).collect()
    rows.foreach { r =>
      val want = pinned.find(p => p._1 == r.getString(0) &&
        p._2 == r.getString(1)).get._3
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(want))
    }
  }

  test("SQL surface + null propagation") {
    val got = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw, " +
        "jaro_winkler(CAST(NULL AS STRING), 'x') AS n").collect()(0)
    assert(got.getDouble(0) == 0.9611111111111111)
    assert(got.isNullAt(1))
  }

  test("code points, not UTF-16 chars: astral symbols are one unit") {
    // "𝕒b" vs "𝕒c": 2 code points each (the first is a surrogate
    // pair); m=1, window=0 ⇒ jaro=(1/2+1/2+1)/3=2/3
    val got = JaroWinkler.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("𝕒b"),
      org.apache.spark.unsafe.types.UTF8String.fromString("𝕒c"))
    assert(math.abs(got - 2.0 / 3.0) < 1e-15)
  }
}
