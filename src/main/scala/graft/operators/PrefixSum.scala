package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
import org.apache.spark.storage.StorageLevel

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
  *   3. per-partition window pass + the per-partition offset, mapped
  *      in via a BROADCAST JOIN on a tiny (pid, offset) frame. A
  *      when-chain keyed on __pid would be O(#partitions) deep — at
  *      thousands of shuffle partitions that blows the 64KB codegen
  *      method limit and falls back to interpreted evaluation; the
  *      broadcast join stays flat at any partition count.
  *
  * The result is independent of where the range partitioner happens
  * to place its boundaries (offsets are computed from the actual
  * subtotals), so it is deterministic even though `repartitionByRange`
  * samples.
  *
  * The range-partitioned frame is read by both passes, so it is
  * persisted — `storageLevel` controls where (default
  * MEMORY_AND_DISK; pass DISK_ONLY for frames near executor-memory
  * size). Persisting also pins the __pid assignment: without it a
  * cache-less recompute between pass 1 and pass 2 would rerun the
  * range sampling, and a nondeterministic input could then map rows
  * to different pids than the collected subtotals. Every persisted
  * frame is tracked; call [[unpersistAll]] once the consuming action
  * has drained the result (harness drivers do this between queries)
  * to release the storage.
  *
  * Values are accumulated as LONG; a non-integral value column is
  * rejected rather than silently truncated.
  */
object PrefixSum {

  private val integral = Set[org.apache.spark.sql.types.DataType](
    ByteType, ShortType, IntegerType, LongType)

  /** Release every frame [[twoPassSetup]] has persisted (delegates to
    * the shared [[ManagedCache]] registry). Safe to call once the
    * actions consuming the returned DataFrames have completed;
    * results not yet drained would recompute (correct, just slower).
    */
  def unpersistAll(): Unit = ManagedCache.releaseAll()

  /** steps 1+2: partitioned/sorted frame with __pid, and the ordered
    * per-partition subtotals of `aggOf(valueCol)` (None = all-null). */
  private def twoPassSetup(df: DataFrame, orderCols: Seq[String],
      valueCol: String, aggOf: Column => Column,
      storageLevel: StorageLevel):
      (DataFrame, Array[(Int, Option[Long])]) = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(!df.columns.contains("__pid"), "column name __pid is reserved")
    require(!df.columns.contains("__off"), "column name __off is reserved")
    val vType = df.schema(valueCol).dataType
    require(integral.contains(vType),
      s"$valueCol must be an integral type, got ${vType.simpleString}")
    val parted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    ManagedCache.persist(parted, storageLevel)
    val totals = parted.groupBy(col("__pid"))
      .agg(aggOf(col(valueCol).cast("long")).as("t"))
      .collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1)
    (parted, totals)
  }

  /** Maps each row's __pid to its Option[Long] offset as column
    * `__off`, via a broadcast hash join against the tiny per-partition
    * offset table — flat in the plan regardless of partition count. */
  private def joinOffsets(parted: DataFrame,
      offsets: Seq[(Int, Option[Long])]): DataFrame = {
    val spark = parted.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("__off_pid", "__off")
    parted
      .join(broadcast(offDf), col("__pid") === col("__off_pid"), "left")
      .drop("__off_pid")
  }

  private def localWindow(orderCols: Seq[String], lastRow: Long) =
    Window.partitionBy(col("__pid"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, lastRow)

  /** Adds `cumCol` = running sum of `valueCol` (inclusive of the
    * current row) over the global order defined by `orderCols` (which
    * must be a total order — add a unique tiebreaker if needed). */
  def withRunningSum(df: DataFrame, orderCols: Seq[String],
      valueCol: String, cumCol: String,
      storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : DataFrame = {
    val (parted, totals) = twoPassSetup(df, orderCols, valueCol,
      v => coalesce(sum(v), lit(0L)), storageLevel)
    val offsets: Seq[(Int, Option[Long])] = {
      var acc = 0L
      totals.toSeq.map { case (pid, t) =>
        val entry = pid -> Some(acc); acc += t.getOrElse(0L); entry
      }
    }
    joinOffsets(parted, offsets)
      .withColumn(cumCol,
        sum(col(valueCol)).over(localWindow(orderCols, 0)) +
          coalesce(col("__off"), lit(0L)))
      .drop("__pid", "__off")
  }

  /** Adds `outCol` = max of `valueCol` over all rows STRICTLY BEFORE
    * the current one in the global order (null for the first row) —
    * the exclusive frame dominance-style operators (2D skyline) need:
    * "best value among everything that sorts earlier". */
  def withRunningMaxBefore(df: DataFrame, orderCols: Seq[String],
      valueCol: String, outCol: String,
      storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : DataFrame = {
    val (parted, totals) = twoPassSetup(df, orderCols, valueCol, max,
      storageLevel)
    val offsets: Seq[(Int, Option[Long])] = {
      var acc: Option[Long] = None
      totals.toSeq.map { case (pid, t) =>
        val entry = pid -> acc
        acc = (acc.toSeq ++ t.toSeq).reduceOption(_ max _); entry
      }
    }
    joinOffsets(parted, offsets)
      .withColumn("__local_before",
        max(col(valueCol).cast("long")).over(localWindow(orderCols, -1)))
      // greatest() skips nulls: null only when BOTH the local prefix
      // and every earlier partition are empty — i.e. the first row
      .withColumn(outCol,
        greatest(col("__local_before"), col("__off")))
      .drop("__pid", "__local_before", "__off")
  }
}
