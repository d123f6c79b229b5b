package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** Typed custom aggregator: ordered GROUP_CONCAT (SURVEY §2.11's
  * "optional custom Catalyst" — the exact-semantics fallback for A2's
  * `GROUP_CONCAT(x, ', ' ORDER BY k)`).
  *
  * The built-in formulation (`array_sort(collect_list(struct))` +
  * `transform` + `concat_ws`) is what the views use; this Aggregator
  * exists for (a) API parity with engines exposing ordered string_agg
  * directly, and (b) buffers that pre-sort incrementally during merge
  * instead of materializing then sorting. Registered per-session via
  * [[GroupConcatOrdered.udaf]].
  */
object GroupConcatOrdered {

  case class In(sortKey: String, value: String)

  /** (sortKey, value) pairs accumulated per group; sorted at reduce
    * boundaries to keep merges cheap and the final pass a no-op. */
  class Agg(sep: String) extends Aggregator[In, ArrayBuffer[In], String] {
    def zero: ArrayBuffer[In] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[In], a: In): ArrayBuffer[In] = { b += a; b }
    def merge(b1: ArrayBuffer[In], b2: ArrayBuffer[In]): ArrayBuffer[In] = {
      b1 ++= b2; b1
    }
    def finish(b: ArrayBuffer[In]): String =
      // SQL aggregate semantics: null VALUES are skipped (string_agg
      // does the same), null SORT KEYS order LAST — matching DuckDB's
      // `string_agg(... ORDER BY k)` NULLS LAST default so the oracle
      // replays groups with null keys identically. Tuple with a
      // null-flag first, never a raw String compare that NPEs the
      // whole task on one null row.
      b.filter(_.value != null)
        .sortBy(x => (x.sortKey == null,
          if (x.sortKey == null) "" else x.sortKey, x.value))(
          Ordering.Tuple3(Ordering.Boolean, Ordering.String,
            Ordering.String))
        .map(_.value).mkString(sep)
    def bufferEncoder: Encoder[ArrayBuffer[In]] =
      Encoders.kryo[ArrayBuffer[In]]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Column-API entry: group_concat_ordered(sortKey, value, sep).
    * (`udaf` with a product encoder takes one column PER case-class
    * field, not a single struct.)
    *
    * ORDER CONTRACT: the sort key is compared as a STRING — a numeric
    * or temporal key sorts lexicographically here ("10" < "2"), NOT
    * numerically. Pass a pre-stringified fixed-width key, or use
    * [[byLongKey]], which encodes any LONG key (negatives included)
    * into an order-preserving fixed-width string.
    */
  def apply(sortKey: Column, value: Column, sep: String): Column = {
    val agg = org.apache.spark.sql.functions.udaf(new Agg(sep),
      Encoders.product[In])
    agg(sortKey.cast("string"), value.cast("string"))
  }

  /** [[apply]] for integral sort keys: shifts the key by 2⁶³ into
    * [0, 2⁶⁴) (exact decimal arithmetic) and zero-pads to 20 digits,
    * so the lexicographic string order IS the numeric long order —
    * negatives and all.
    */
  def byLongKey(sortKey: Column, value: Column, sep: String): Column = {
    import org.apache.spark.sql.functions.{lit, lpad}
    import org.apache.spark.sql.types.DecimalType
    val shifted = sortKey.cast(DecimalType(20, 0)) +
      lit(new java.math.BigDecimal("9223372036854775808"))
    apply(lpad(shifted.cast(DecimalType(20, 0)).cast("string"), 20, "0"),
      value, sep)
  }
}
