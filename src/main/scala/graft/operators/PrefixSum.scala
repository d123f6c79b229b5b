package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{JoinedRow, SpecificInternalRow, UnsafeProjection}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Distributed running (prefix) aggregates in a global sort order —
  * the scalable replacement for `Window.orderBy(...)` with no
  * partition key, which Spark executes on a SINGLE task and which
  * therefore cannot work at 100 TB.
  *
  * Classic two-pass scheme, ONE shuffle total:
  *   1. range-partition the rows by the order key, sort within each
  *      partition (Spark's sort machinery — spills, codegen) — the
  *      only exchange in the operator;
  *   2. aggregate one subtotal PER PARTITION (a few hundred rows,
  *      collected to the driver — bounded by the partition count,
  *      never by the data) and turn them into per-partition starting
  *      offsets;
  *   3. a NARROW per-partition scan (`mapPartitionsWithIndex`) over
  *      the already-sorted frame folds the running aggregate with the
  *      partition's offset from the closure. Earlier shapes paid for
  *      this step: a `Window.partitionBy(__pid)` plans an extra
  *      `Exchange hashpartitioning(__pid)` + full re-sort (a second
  *      shuffle of ALL the data), and mapping offsets with a
  *      when-chain builds an O(#partitions) CaseWhen that falls out
  *      of codegen at thousands of shuffle partitions. The narrow
  *      scan has neither: no second exchange, no re-sort, no
  *      partition-count-sized expression — the per-row work is one
  *      accumulator update.
  *
  * The result is independent of where the range partitioner happens
  * to place its boundaries (offsets are computed from the actual
  * subtotals), so it is deterministic even though `repartitionByRange`
  * samples.
  *
  * Both passes read the range-partitioned frame, so it is persisted —
  * `storageLevel` controls where (default MEMORY_AND_DISK; pass
  * DISK_ONLY for frames near executor-memory size). Persisting also
  * pins the partition layout: without it a recompute between pass 1
  * and pass 2 would rerun the range sampling, and a nondeterministic
  * input could then map rows to different partitions than the
  * collected subtotals. Every persisted frame is tracked; call
  * [[unpersistAll]] once the consuming action has drained the result
  * (harness drivers do this between queries) to release the storage.
  *
  * Values are accumulated as LONG; a non-integral value column is
  * rejected rather than silently truncated.
  */
object PrefixSum {

  private val integral = Set[org.apache.spark.sql.types.DataType](
    ByteType, ShortType, IntegerType, LongType)

  /** Release every frame [[twoPassSetup]] has persisted (delegates to
    * the shared [[ManagedCache]] registry). Call ONLY after the
    * actions consuming the returned DataFrames have completed: an
    * undrained PrefixSum result would recompute the range partitioning
    * with FRESH boundary sampling, and over a nondeterministic input
    * the new layout can diverge from the already-collected offsets —
    * wrong prefixes, not just slower (see [[ManagedCache.releaseAll]]).
    */
  def unpersistAll(): Unit = ManagedCache.releaseAll()

  /** steps 1+2: the persisted range-partitioned sorted frame, and the
    * per-partition subtotals of `aggOf(valueCol)` for EACH value
    * column, indexed by physical partition id (None = partition has
    * no non-null value for that column). Partitions the aggregation
    * saw no rows for (empty after the range split) are absent from
    * the map and contribute nothing. One implementation serves both
    * the N-column running sums and the single-column running max —
    * the pass-1/pass-2 contract (persist pins the sampled range
    * partitioning for both the totals action and the fold) lives
    * HERE only.
    */
  private def twoPassSetup(df: DataFrame, orderCols: Seq[String],
      valueCols: Seq[String], aggOf: Column => Column,
      storageLevel: StorageLevel):
      (DataFrame, Array[(Int, Array[Option[Long]])]) = {
    require(valueCols.nonEmpty, "need at least one value column")
    require(orderCols.nonEmpty, "need at least one order column")
    valueCols.foreach { v =>
      val t = df.schema(v).dataType
      require(integral.contains(t),
        s"$v must be an integral type, got ${t.simpleString}")
    }
    val parted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    ManagedCache.persist(parted, storageLevel)
    val aggs = aggOf(col(valueCols.head).cast("long")).as("t0") +:
      valueCols.tail.zipWithIndex.map { case (v, i) =>
        aggOf(col(v).cast("long")).as(s"t${i + 1}") }
    val totals = parted
      .groupBy(spark_partition_id().as("__pid"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getInt(0) -> valueCols.indices.map(i =>
        if (r.isNullAt(i + 1)) None else Some(r.getLong(i + 1))).toArray)
      .sortBy(_._1)
    (parted, totals)
  }

  /** step 3: narrow per-partition fold over the sorted frame. `seed`
    * gives each partition its starting state from the offset table;
    * `step` consumes (state, value-or-null-as-MinValue-flag) and emits
    * (next state, output cell). The output column is appended as LONG.
    *
    * The fold runs at the InternalRow level (`queryExecution.toRdd` +
    * `UnsafeProjection`), never leaving Tungsten format: the earlier
    * `df.rdd` + `createDataFrame` shape deserialized every row to a
    * boxed external Row and re-encoded it — a ~3× per-row constant
    * that is pure linear CPU at 100 TB. The offset table is
    * O(#partitions) and rides the task closure.
    */
  private def narrowScan(parted: DataFrame, outCol: String,
      seedOf: Int => Option[Long],
      step: (Option[Long], Option[Long]) => (Option[Long], Option[Long]),
      valueCol: String): DataFrame = {
    val schema = parted.schema
    val vIdx = schema.fieldIndex(valueCol)
    val vType = schema(valueCol).dataType
    val outSchema = StructType(schema.fields :+
      StructField(outCol, LongType, nullable = true))
    val outTypes = outSchema.fields.map(_.dataType)
    val rdd = parted.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      val extra = new SpecificInternalRow(Seq(LongType))
      val read: InternalRow => Long = vType match {
        case ByteType    => r => r.getByte(vIdx).toLong
        case ShortType   => r => r.getShort(vIdx).toLong
        case IntegerType => r => r.getInt(vIdx).toLong
        case _           => r => r.getLong(vIdx)
      }
      var state = seedOf(pid)
      it.map { row =>
        val v = if (row.isNullAt(vIdx)) None else Some(read(row))
        val (next, out) = step(state, v)
        state = next
        out match {
          case Some(x) => extra.setLong(0, x)
          case None    => extra.setNullAt(0)
        }
        // proj reuses one UnsafeRow buffer — the contract every Spark
        // operator iterator already follows (consumers copy if they
        // buffer), same as Spark's own projection-based scans
        proj(joined(row, extra)): InternalRow
      }
    }
    org.apache.spark.sql.GraftColumnBridge
      .internalCreateDataFrame(parted.sparkSession, rdd, outSchema)
  }

  /** Adds `cumCol` = running sum of `valueCol` (inclusive of the
    * current row) over the global order defined by `orderCols` (which
    * must be a total order — add a unique tiebreaker if needed). Rows
    * whose value is null leave the running total unchanged; a row
    * before any non-null value in the GLOBAL order has a null running
    * sum (matching `sum(...) over (rows unbounded preceding)`).
    */
  def withRunningSum(df: DataFrame, orderCols: Seq[String],
      valueCol: String, cumCol: String,
      storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : DataFrame =
    // one-line delegation: the N-column fold with N=1 is exactly this
    // operator (same type check, same null-until-first-non-null seed
    // handoff, same narrow InternalRow fold) — two copies of the seed
    // logic would have to be kept in sync by hand
    withRunningSums(df, orderCols, Seq(valueCol -> cumCol),
      storageLevel)

  /** Multi-column [[withRunningSum]]: N running sums over ONE
    * range-partition + sort (the expensive part is shared; each extra
    * column is one more long accumulator in the narrow fold). Null
    * values leave that column's running total unchanged; its cum is
    * null until the first non-null in the global prefix. `pairs` maps
    * valueCol -> cumCol.
    */
  def withRunningSums(df: DataFrame, orderCols: Seq[String],
      pairs: Seq[(String, String)],
      storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : DataFrame = {
    val (parted, totals) = twoPassSetup(df, orderCols,
      pairs.map(_._1), v => sum(v), storageLevel)
    val seeds: Map[Int, Array[Option[Long]]] = {
      val acc = Array.fill[Option[Long]](pairs.size)(None)
      totals.map { case (pid, t) =>
        val entry = pid -> acc.clone()
        pairs.indices.foreach { i =>
          acc(i) = t(i).map(_ + acc(i).getOrElse(0L)).orElse(acc(i))
        }
        entry
      }.toMap
    }
    // narrow fold, N accumulators (the InternalRow mechanics of
    // narrowScan generalized to one appended LONG per value column)
    val schema = parted.schema
    val vIdx = pairs.map(p => schema.fieldIndex(p._1)).toArray
    val vTyp = vIdx.map(i => schema.fields(i).dataType)
    val outSchema = StructType(schema.fields ++
      pairs.map(p => StructField(p._2, LongType, nullable = true)))
    val outTypes = outSchema.fields.map(_.dataType)
    val n = pairs.size
    val rdd = parted.queryExecution.toRdd.mapPartitionsWithIndex {
      (pid, it) =>
        val proj = UnsafeProjection.create(outTypes)
        val joined = new JoinedRow
        val extra = new SpecificInternalRow(Seq.fill(n)(LongType))
        val read: Array[InternalRow => Long] = vTyp.zipWithIndex.map {
          case (ByteType, k)    => (r: InternalRow) => r.getByte(vIdx(k)).toLong
          case (ShortType, k)   => (r: InternalRow) => r.getShort(vIdx(k)).toLong
          case (IntegerType, k) => (r: InternalRow) => r.getInt(vIdx(k)).toLong
          case (_, k)           => (r: InternalRow) => r.getLong(vIdx(k))
        }
        val state = seeds.getOrElse(pid,
          Array.fill[Option[Long]](n)(None)).clone()
        it.map { row =>
          var k = 0
          while (k < n) {
            if (!row.isNullAt(vIdx(k))) {
              state(k) = Some(state(k).getOrElse(0L) + read(k)(row))
            }
            state(k) match {
              case Some(x) => extra.setLong(k, x)
              case None    => extra.setNullAt(k)
            }
            k += 1
          }
          proj(joined(row, extra)): InternalRow
        }
    }
    org.apache.spark.sql.GraftColumnBridge
      .internalCreateDataFrame(parted.sparkSession, rdd, outSchema)
  }

  /** Adds `outCol` = max of `valueCol` over all rows STRICTLY BEFORE
    * the current one in the global order (null when no earlier row
    * has a non-null value) — the exclusive frame dominance-style
    * operators (2D skyline) need: "best value among everything that
    * sorts earlier".
    */
  def withRunningMaxBefore(df: DataFrame, orderCols: Seq[String],
      valueCol: String, outCol: String,
      storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : DataFrame = {
    val (parted, totals) = twoPassSetup(df, orderCols, Seq(valueCol),
      v => max(v), storageLevel)
    val seeds: Map[Int, Option[Long]] = {
      var acc: Option[Long] = None
      totals.map { case (pid, t) =>
        val entry = pid -> acc
        acc = (acc.toSeq ++ t(0).toSeq).reduceOption(_ max _)
        entry
      }.toMap
    }
    narrowScan(parted, outCol,
      pid => seeds.getOrElse(pid, None),
      (state, v) => {
        val out = state
        val next = (state.toSeq ++ v.toSeq).reduceOption(_ max _)
        (next, out)
      },
      valueCol)
  }
}
