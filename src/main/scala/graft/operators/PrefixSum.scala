package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Distributed running (prefix) aggregates in a global sort order —
  * the scalable replacement for `Window.orderBy(...)` with no
  * partition key, which Spark executes on a SINGLE task and which
  * therefore cannot work at 100 TB.
  *
  * Classic two-pass scheme:
  *   1. range-partition the rows by the order key, sort within each
  *      partition (Spark's sort machinery — spills, codegen);
  *   2. aggregate one subtotal PER PARTITION (a few hundred rows,
  *      collected to the driver — bounded by the partition count,
  *      never by the data) and turn them into per-partition starting
  *      offsets;
  *   3. per-partition window pass + the broadcast offset.
  *
  * The result is independent of where the range partitioner happens
  * to place its boundaries (offsets are computed from the actual
  * subtotals), so it is deterministic even though `repartitionByRange`
  * samples.
  *
  * Values are accumulated as LONG; a non-integral value column is
  * rejected rather than silently truncated.
  */
object PrefixSum {

  private val integral = Set[org.apache.spark.sql.types.DataType](
    ByteType, ShortType, IntegerType, LongType)

  /** steps 1+2: partitioned/sorted frame with __pid, and the ordered
    * per-partition subtotals of `aggOf(valueCol)` (None = all-null). */
  private def twoPassSetup(df: DataFrame, orderCols: Seq[String],
      valueCol: String, aggOf: Column => Column):
      (DataFrame, Array[(Int, Option[Long])]) = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(!df.columns.contains("__pid"), "column name __pid is reserved")
    val vType = df.schema(valueCol).dataType
    require(integral.contains(vType),
      s"$valueCol must be an integral type, got ${vType.simpleString}")
    val parted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    // both passes read this frame; at scale you'd persist to disk-only
    // storage level (kept simple here — the caller's action drains it)
    parted.cache()
    val totals = parted.groupBy(col("__pid"))
      .agg(aggOf(col(valueCol).cast("long")).as("t"))
      .collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1)
    (parted, totals)
  }

  /** when-chain translating __pid to its Option[Long] offset. */
  private def offsetExpr(offsets: Map[Int, Option[Long]]): Column =
    offsets.foldLeft(lit(null).cast("long")) {
      case (acc, (pid, off)) =>
        when(col("__pid") === pid,
          off.map(lit(_).cast("long")).getOrElse(lit(null).cast("long")))
          .otherwise(acc)
    }

  private def localWindow(orderCols: Seq[String], lastRow: Long) =
    Window.partitionBy(col("__pid"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, lastRow)

  /** Adds `cumCol` = running sum of `valueCol` (inclusive of the
    * current row) over the global order defined by `orderCols` (which
    * must be a total order — add a unique tiebreaker if needed). */
  def withRunningSum(df: DataFrame, orderCols: Seq[String],
      valueCol: String, cumCol: String): DataFrame = {
    val (parted, totals) = twoPassSetup(df, orderCols, valueCol,
      v => coalesce(sum(v), lit(0L)))
    val offsets: Map[Int, Option[Long]] = {
      var acc = 0L
      totals.map { case (pid, t) =>
        val entry = pid -> Some(acc); acc += t.getOrElse(0L); entry
      }.toMap
    }
    parted
      .withColumn(cumCol,
        sum(col(valueCol)).over(localWindow(orderCols, 0)) +
          coalesce(offsetExpr(offsets), lit(0L)))
      .drop("__pid")
  }

  /** Adds `outCol` = max of `valueCol` over all rows STRICTLY BEFORE
    * the current one in the global order (null for the first row) —
    * the exclusive frame dominance-style operators (2D skyline) need:
    * "best value among everything that sorts earlier". */
  def withRunningMaxBefore(df: DataFrame, orderCols: Seq[String],
      valueCol: String, outCol: String): DataFrame = {
    val (parted, totals) = twoPassSetup(df, orderCols, valueCol, max)
    val offsets: Map[Int, Option[Long]] = {
      var acc: Option[Long] = None
      totals.map { case (pid, t) =>
        val entry = pid -> acc
        acc = (acc.toSeq ++ t.toSeq).reduceOption(_ max _); entry
      }.toMap
    }
    parted
      .withColumn("__local_before",
        max(col(valueCol).cast("long")).over(localWindow(orderCols, -1)))
      // greatest() skips nulls: null only when BOTH the local prefix
      // and every earlier partition are empty — i.e. the first row
      .withColumn(outCol,
        greatest(col("__local_before"), offsetExpr(offsets)))
      .drop("__pid", "__local_before")
  }
}
