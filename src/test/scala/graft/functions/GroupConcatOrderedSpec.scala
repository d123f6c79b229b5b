package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The ordered-GROUP_CONCAT aggregator's order and null contracts:
  * string keys sort lexicographically (documented), byLongKey makes
  * lexicographic == numeric for any long (negatives included), null
  * values are skipped like string_agg, and a null sort key orders
  * LAST — DuckDB's string_agg(... ORDER BY) NULLS LAST default, so an
  * oracle replays groups with null keys identically — instead of
  * NPE-ing the task.
  */
class GroupConcatOrderedSpec extends SparkSpec {
  import spark.implicits._

  test("byLongKey: numeric order survives the string buffer — " +
    "2 before 10, negatives before positives") {
    val df = Seq((1L, 10L, "ten"), (1L, 2L, "two"), (1L, -3L, "neg"),
      (1L, 0L, "zero")).toDF("g", "k", "v")
    val out = df.groupBy($"g")
      .agg(GroupConcatOrdered.byLongKey($"k", $"v", ",").as("s"))
      .collect()(0).getString(1)
    assert(out == "neg,zero,two,ten", out)
    // the raw string-key form documents the lexicographic trap
    val lex = df.groupBy($"g")
      .agg(GroupConcatOrdered($"k", $"v", ",").as("s"))
      .collect()(0).getString(1)
    assert(lex == "neg,zero,ten,two", s"string order expected: $lex")
  }

  test("null values are skipped (string_agg semantics); a null sort " +
    "key orders last (DuckDB NULLS LAST) and never NPEs the task") {
    val df = Seq((1L, Some("b"), Some("second")),
      (1L, Some("a"), None),
      (1L, None, Some("keyless"))).toDF("g", "k", "v")
    val out = df.groupBy($"g")
      .agg(GroupConcatOrdered($"k", $"v", ",").as("s"))
      .collect()(0).getString(1)
    assert(out == "second,keyless", out)
  }
}
