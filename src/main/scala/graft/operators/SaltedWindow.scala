package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Skew-safe trailing range windows over raw event streams.
  *
  * `Window.partitionBy(key).orderBy(ts).rangeBetween(-W, 0)` is the
  * natural rolling-aggregate shape, but when `key` is low-cardinality
  * (an event type, a source label) EVERY row of a hot key sorts in ONE
  * task — the whole stream of that key serializes through a single
  * executor, which is exactly the plan that cannot survive a 100×
  * scale-up no matter how fast it looks at test SF.
  *
  * The fix is the classic time-bucket salt with a one-bucket carry-in:
  *
  *   - bucket every row by `floor(us / W)` (bucket width = the window
  *     length, so a trailing window of length W can only reach the
  *     current bucket and the one before it);
  *   - ECHO each row into the NEXT bucket (flagged, contributes to
  *     frames there but emits no output row);
  *   - run the identical range frame partitioned by
  *     `(keys…, bucket)` — every row the true trailing frame can
  *     reach is now present in the row's partition, so the aggregate
  *     values are EXACTLY those of the unsalted window;
  *   - drop the echo rows.
  *
  * Cost: the window shuffle carries 2× the rows (each row appears in
  * its own bucket and as next-bucket carry-in), but the partition key
  * gains time-bucket cardinality: the largest task sorts at most two
  * buckets of one key (≈ 2·W of wall-clock data) instead of the key's
  * entire history. That 2× is the standard price of unbounded
  * horizontal scale here, and partial map-side combine does not apply
  * to range frames anyway.
  *
  * Correctness requires only that the frame is trailing with length
  * ≤ the bucket width — asserted, along with the order column's LONG
  * type (the only checks `trailing` performs). The order column may
  * be ANY long, negative included: truncating `div` still yields a
  * monotone step function whose plateaus are intervals of width ≥ W
  * with boundaries only at multiples of W (the plateau around zero is
  * the two adjacent intervals merged), so a trailing frame of length
  * W crosses at most one boundary and is always covered by the row's
  * bucket plus the previous bucket's echo.
  */
object SaltedWindow {

  private val bucketCol = "__swin_bucket"
  private val echoCol = "__swin_echo"

  /** Append trailing-window aggregates to `df`.
    *
    * @param df       input frame (raw facts; any columns)
    * @param partCols logical partition keys (may be low-cardinality —
    *                 that is the point)
    * @param usCol    LONG epoch-microsecond order column (any sign)
    * @param windowUs trailing frame length in microseconds; also the
    *                 salt bucket width
    * @param aggs     builds the aggregate columns from the provided
    *                 WindowSpec, each pre-aliased (`count(...).over(w)
    *                 .as("n")`)
    * @return `df`'s columns plus the aggregate columns, one output row
    *         per input row, values identical to the unsalted
    *         `Window.partitionBy(partCols).orderBy(usCol)
    *         .rangeBetween(-windowUs, 0)`
    */
  def trailing(df: DataFrame, partCols: Seq[String], usCol: String,
      windowUs: Long)(aggs: WindowSpec => Seq[Column]): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    require(df.schema(usCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"$usCol must be LONG epoch microseconds")
    val bucket = call_function("div", col(usCol), lit(windowUs))
    // ONE scan: each row explodes into (own bucket, echo in the next
    // bucket) — a union of two branches would read the source twice,
    // which at 100 TB doubles the dominant cost (the scan) for no
    // semantic difference
    val pairCol = "__swin_pair"
    val expanded = df
      .withColumn(pairCol, explode(array(
        struct(bucket.as("b"), lit(false).as("e")),
        struct((bucket + 1).as("b"), lit(true).as("e")))))
      .withColumn(bucketCol, col(s"$pairCol.b"))
      .withColumn(echoCol, col(s"$pairCol.e"))
    val w = Window
      .partitionBy(partCols.map(col) :+ col(bucketCol): _*)
      .orderBy(col(usCol))
      .rangeBetween(-windowUs, 0L)
    expanded
      .select(df.columns.map(col) ++ (col(echoCol) +: aggs(w)): _*)
      .filter(!col(echoCol))
      .drop(echoCol)
  }
}
