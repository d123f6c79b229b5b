package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running (prefix) sum in a global sort order — the
  * scalable replacement for `Window.orderBy(...)` with no partition
  * key, which Spark executes on a SINGLE task and which therefore
  * cannot work at 100 TB.
  *
  * Classic two-pass scheme:
  *   1. range-partition the rows by the order key, sort within each
  *      partition (Spark's sort machinery — spills, codegen);
  *   2. aggregate one subtotal PER PARTITION (a few hundred rows,
  *      collected to the driver — bounded by the partition count,
  *      never by the data) and turn them into per-partition starting
  *      offsets;
  *   3. per-partition window cumsum + broadcast offset.
  *
  * The result is independent of where the range partitioner happens
  * to place its boundaries (offsets are computed from the actual
  * totals), so it is deterministic even though `repartitionByRange`
  * samples.
  */
object PrefixSum {

  /** Adds `cumCol` = running sum of `valueCol` over the global order
    * defined by `orderCols` (which must be a total order — add a
    * unique tiebreaker column if needed).
    */
  def withRunningSum(df: DataFrame, orderCols: Seq[String],
      valueCol: String, cumCol: String): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val reserved = Seq("__pid", "__part_offset")
    require(!reserved.exists(df.columns.contains),
      s"column names $reserved are reserved")

    val parted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    parted.cache()

    // pass 1: per-partition subtotals — O(numPartitions) rows
    val totals = parted.groupBy(col("__pid"))
      .agg(coalesce(sum(col(valueCol).cast("long")), lit(0L)).as("t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsetOf: Map[Int, Long] = {
      var acc = 0L
      totals.map { case (pid, t) =>
        val entry = pid -> acc; acc += t; entry
      }.toMap
    }

    // pass 2: local cumsum + the partition's starting offset
    val offsetExpr = offsetOf.foldLeft(lit(0L)) {
      case (acc, (pid, off)) =>
        when(col("__pid") === pid, lit(off)).otherwise(acc)
    }
    val w = Window.partitionBy(col("__pid"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted
      .withColumn(cumCol,
        sum(col(valueCol)).over(w) + offsetExpr)
      .drop("__pid")
  }

  /** Adds `outCol` = max of `valueCol` over all rows STRICTLY BEFORE
    * the current one in the global order (null for the first row) —
    * the same two-pass scheme with the max monoid. The exclusive
    * frame is what dominance-style operators (2D skyline) need:
    * "best value among everything that sorts earlier".
    */
  def withRunningMaxBefore(df: DataFrame, orderCols: Seq[String],
      valueCol: String, outCol: String): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val reserved = Seq("__pid", "__local_before")
    require(!reserved.exists(df.columns.contains),
      s"column names $reserved are reserved")

    val parted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    parted.cache()

    val totals = parted.groupBy(col("__pid"))
      .agg(max(col(valueCol).cast("long")).as("t"))
      .collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1)
    // offset for partition p = max over all earlier partitions
    val offsetOf: Map[Int, Option[Long]] = {
      var acc: Option[Long] = None
      totals.map { case (pid, t) =>
        val entry = pid -> acc
        acc = (acc.toSeq ++ t.toSeq).reduceOption(_ max _); entry
      }.toMap
    }

    val offsetExpr = offsetOf.foldLeft(lit(null).cast("long")) {
      case (acc, (pid, off)) =>
        when(col("__pid") === pid,
          off.map(lit(_).cast("long")).getOrElse(lit(null).cast("long")))
          .otherwise(acc)
    }
    val w = Window.partitionBy(col("__pid"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .withColumn("__local_before", max(col(valueCol).cast("long")).over(w))
      // greatest() skips nulls: null only when BOTH the local prefix
      // and every earlier partition are empty — i.e. the first row
      .withColumn(outCol, greatest(col("__local_before"), offsetExpr))
      .drop("__pid", "__local_before")
  }
}
