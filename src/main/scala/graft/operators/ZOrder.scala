package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional file
  * pruning. Sorting 100 TB by one column gives perfect min/max
  * pruning on that column and NONE on any other; sorting by the
  * interleaved-bit Z-value gives ~sqrt pruning on BOTH dimensions —
  * the standard layout for fact tables queried by more than one key
  * (Delta/Iceberg expose the same idea as OPTIMIZE ZORDER BY).
  *
  * Everything is Column algebra (statically unrolled shifts — stays
  * inside whole-stage codegen): quantize each dimension to `bits`
  * levels between its observed min/max, then interleave the bits.
  */
object ZOrder {

  /** Interleave the low `bits` bits of x (even positions) and y (odd
    * positions) into a single Morton key. Inputs must already be
    * non-negative quantized longs < 2^bits. */
  def interleave2(x: Column, y: Column, bits: Int): Column = {
    // 30 keeps both 1L << bits in quantize and the 2*bits-wide key in
    // long range with headroom
    require(bits > 0 && bits <= 30, s"bits must be in [1,30], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, j) =>
      acc +
        shiftleft(shiftrightunsigned(x.cast("long"), j)
          .bitwiseAND(lit(1L)), 2 * j) +
        shiftleft(shiftrightunsigned(y.cast("long"), j)
          .bitwiseAND(lit(1L)), 2 * j + 1)
    }
  }

  /** Three-way Morton interleave: x at bit positions 0,3,6…, y at
    * 1,4,7…, z at 2,5,8… — the 3-column ZORDER BY. Each dimension
    * gets ~cube-root pruning on conjunctive ranges; `bits ≤ 20`
    * keeps the 3·bits-wide key in long range. Inputs must already be
    * non-negative quantized longs < 2^bits (compose with
    * [[quantize]]). */
  def interleave3(x: Column, y: Column, z: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 20, s"bits must be in [1,20], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, j) =>
      acc +
        shiftleft(shiftrightunsigned(x.cast("long"), j)
          .bitwiseAND(lit(1L)), 3 * j) +
        shiftleft(shiftrightunsigned(y.cast("long"), j)
          .bitwiseAND(lit(1L)), 3 * j + 1) +
        shiftleft(shiftrightunsigned(z.cast("long"), j)
          .bitwiseAND(lit(1L)), 3 * j + 2)
    }
  }

  /** Linear min/max quantization of a numeric column to [0, 2^bits). */
  def quantize(c: Column, cMin: Double, cMax: Double, bits: Int): Column = {
    require(bits > 0 && bits <= 30, s"bits must be in [1,30], got $bits")
    val span = math.max(cMax - cMin, Double.MinPositiveValue)
    least(lit((1L << bits) - 1), greatest(lit(0L),
      floor((c.cast("double") - cMin) / span * (1L << bits)).cast("long")))
  }

  /** Write `df` as `numFiles` parquet files clustered on the Z-curve
    * of (xCol, yCol). One pass to collect the 4 quantization bounds
    * (an agg of 4 scalars — never the data), one range-partitioned
    * sort-write. Readers then prune files via parquet column min/max
    * on BOTH xCol and yCol. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      path: String, numFiles: Int, bits: Int = 12): Unit = {
    val b = df.agg(min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double")).head()
    // empty input (or an all-null cluster column) has no bounds: min/
    // max are null and getDouble would NPE — write the empty/unsorted
    // frame or fail with a named cause instead
    if (b.isNullAt(0) || b.isNullAt(2)) {
      require(df.isEmpty,
        s"writeZOrdered: $xCol/$yCol entirely NULL — cannot cluster")
      df.write.mode("overwrite").parquet(path)
      return
    }
    val zkey = interleave2(
      quantize(col(xCol), b.getDouble(0), b.getDouble(1), bits),
      quantize(col(yCol), b.getDouble(2), b.getDouble(3), bits), bits)
    df.withColumn("__z", zkey)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
