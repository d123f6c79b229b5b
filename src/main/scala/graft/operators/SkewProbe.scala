package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-skew diagnosis — the pre-flight check before committing a
  * join/groupBy/partition key at scale: per candidate key column, the
  * per-key row-count distribution summarized as exact order
  * statistics plus the hot-key share. A key whose p99/p50 ratio or
  * max-share is extreme needs salting (SaltedWindow / xj2's salted
  * join) or AQE skew handling BEFORE the job ships, not after the
  * 3-day straggler.
  *
  * Shape per column: one count aggregation keyed on the candidate
  * (map-side combine), then every further step runs on the
  * FREQUENCY-OF-FREQUENCIES distribution — (count, #keys-with-count)
  * — whose size is bounded by the number of DISTINCT per-key counts,
  * tiny even at 100 TB. Percentiles are the exact cumulative-crossing
  * trick (xq6/xq14), never a sort of the keys.
  */
object SkewProbe {

  /** One census row per key column: key cardinality, total rows,
    * max/p50/p99 per-key counts, and the hottest key's per-mille
    * share of all rows.
    */
  def keySkew(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    keyCols.map { kc =>
      val counts = df.groupBy(col(kc).cast("string").as("k"))
        .agg(count(lit(1)).as("c"))
      // frequency-of-frequencies: #keys per distinct per-key count
      val fof = ManagedCache.persist(
        counts.groupBy(col("c")).agg(count(lit(1)).as("nk")))
      val tot = fof.agg(sum(col("nk")).as("n_keys"),
        sum(col("c") * col("nk")).as("n_rows"),
        max(col("c")).as("max_count"))
      def pct(p: Int): org.apache.spark.sql.Column =
        min(when(col("cum") >= call_function("div",
          lit(p.toLong) * col("n_keys") + lit(99L), lit(100L)),
          col("c")))
      // the global-order window here is DELIBERATE and bounded: it
      // runs over the frequency-of-frequencies frame, whose row count
      // is the number of DISTINCT per-key counts (hundreds at any
      // scale), never over keys or rows — the single-partition
      // exchange moves a frame that fits in one cache line's worth of
      // pages. (PlanShapeSpec whitelists the consuming query with
      // exactly this bound.)
      val quant = fof
        .withColumn("cum", sum(col("nk")).over(Window.orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(tot))
        .agg(pct(50).as("p50_count"), pct(99).as("p99_count"))
      tot.crossJoin(broadcast(quant))
        .select(lit(kc).as("key_col"), col("n_keys"), col("n_rows"),
          col("max_count"), col("p50_count"), col("p99_count"),
          call_function("div", lit(1000L) * col("max_count"),
            col("n_rows")).as("hot_share_mille"))
    }.reduce(_ unionByName _)
  }
}
