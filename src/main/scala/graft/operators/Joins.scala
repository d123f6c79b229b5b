package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond Spark's built-in set, composed from
  * primitives (preference (a) of the extension ladder: composition
  * before custom strategies — SURVEY §2.11/§4).
  */
object Joins {

  /** As-of (backward) join: for every left row, attach the single
    * latest right row with `right.ts <= left.ts` for the same key.
    *
    * Implementation is the scalable union+window pattern, NOT a range
    * cross-join: tag both sides, union, sort per key by (ts, side),
    * and carry the last-seen right payload forward with
    * `last(ignoreNulls)` over the running window. One shuffle on the
    * key, state bounded by the window frame — works at any skew of
    * left:right ratio (a per-key right-broadcast would not).
    *
    * @param left      probe side (keeps all rows)
    * @param right     reference side (its non-key/ts columns get
    *                  attached; pre-project to what you need)
    * @param keys      equi-key columns (same names both sides)
    * @param leftTs    event-time column on the left
    * @param rightTs   event-time column on the right
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    val rightPayload = right.columns
      .filterNot(c => keys.contains(c) || c == rightTs).toSeq
    // the left's ts column travels as __ts — excluding it here keeps
    // the union schema unambiguous when leftTs == rightTs == "ts"
    val leftPayload = left.columns
      .filterNot(c => keys.contains(c) || c == leftTs).toSeq
    // same contract asofNative requires: a shared payload name would
    // produce a duplicate-column select and fail far away inside
    // unionByName with no hint that the right side must be pre-renamed
    val collide = rightPayload.toSet.intersect(left.columns.toSet)
    require(collide.isEmpty,
      s"right payload names must not collide with left columns: " +
        s"${collide.mkString(", ")} (pre-rename the right side)")

    val taggedRight = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side")) ++
        rightPayload.map(col) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side")) ++
        rightPayload.map(c =>
          lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftPayload.map(col): _*)

    // right rows sort before left rows at equal ts (side 0 < 1), so a
    // right update AT the probe timestamp is visible — matching
    // standard ASOF (<=) semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the latest right row as ONE struct, never column-by-
    // column last(ignoreNulls): per-column carry would overwrite a
    // legitimately NULL field of the latest right row with an older
    // row's value — stitching together a row that exists on neither
    // side. The struct is non-null exactly for right rows (left rows
    // contribute null), so ignoreNulls skips probe rows while a right
    // row's null FIELDS ride along intact.
    val unioned = taggedRight.unionByName(taggedLeft)
    val carried =
      if (rightPayload.isEmpty) unioned
      else {
        val packed = unioned.withColumn("__rp",
          last(when(col("__side") === 0,
            struct(rightPayload.map(col): _*)),
            ignoreNulls = true).over(w))
        rightPayload.foldLeft(packed) { (df, c) =>
          df.withColumn(c, col("__rp").getField(c))
        }.drop("__rp")
      }
    carried.filter(col("__side") === 1)
      .drop("__side")
      .withColumnRenamed("__ts", leftTs)
  }

  /** Native as-of (backward) join via the custom plan
    * (`graft.plans.AsOfJoinNode` → `AsOfJoinExec`): same semantics as
    * `asofBackward` (latest right with `right.ts <= left.ts` per key,
    * ties visible), but executed as a single merge scan over
    * co-partitioned sorted children — no union, no window buffer.
    * Requires the session to carry `GraftExtensions` (GraftSession
    * does) and 64-bit key/time columns (long / timestamp); right
    * payload column names must not collide with left columns.
    */
  def asofNative(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val lp = left.queryExecution.analyzed
    // re-alias the right side with FRESH exprIds: when both inputs
    // derive from the same relation (self-as-of), the analyzer's
    // DeduplicateRelations rewrites the right branch's duplicate
    // attribute ids but cannot remap them inside a custom node — so
    // the node must only reference ids that are never ambiguous
    val rp0 = right.queryExecution.analyzed
    val rAliases = rp0.output.map(a => Alias(a, a.name)())
    val rp = Project(rAliases, rp0)
    val rOut = rAliases.map(_.toAttribute)
    def lattr(name: String) = lp.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not found in ${lp.output.map(_.name)}"))
    def rattr(name: String) = rOut.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not found in ${rOut.map(_.name)}"))
    val ok = Set[org.apache.spark.sql.types.DataType](LongType,
      TimestampType)
    Seq(lattr(key), rattr(key), lattr(leftTs), rattr(rightTs))
      .foreach(a => require(ok.contains(a.dataType),
        s"asofNative needs long/timestamp key+time, ${a.name} is " +
          a.dataType.simpleString))
    require(!payload.exists(left.columns.contains),
      "right payload names must not collide with left columns")
    GraftColumnBridge.ofRows(left.sparkSession,
      graft.plans.AsOfJoinNode(lp, rp, lattr(key), rattr(key),
        lattr(leftTs), rattr(rightTs), payload.map(rattr)))
  }

  /** Skew-safe equi join: salt the skewed (big) side into
    * `saltFactor` sub-keys and explode the small side across all
    * salts, so one hot key spreads over `saltFactor` reducers. Use
    * when AQE's skew handling can't kick in (e.g. non-shuffle
    * operators downstream) or the skew is known up front.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // the small side is EXPLODED saltFactor×, so any join type that
    // preserves it (right/full outer) would emit a null-padded row per
    // unmatched salted COPY — up to saltFactor spurious rows per small
    // key. Only big-side-preserving shapes are sound.
    val okTypes = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(okTypes.contains(joinType.toLowerCase.replaceAll("\\s", "")),
      s"saltedJoin preserves only the big side; joinType '$joinType' " +
        "would emit spurious rows for exploded small-side copies")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor))
        .cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Binned (bucketed) range join: match each point row to every
    * interval row whose [start, end] contains it, WITHOUT the O(n·m)
    * cross product a naive `BETWEEN` theta-join plans. Both sides map
    * their time axis onto integer bins of `binWidth` (same unit as
    * `binOf`'s output): each point lands in exactly ONE bin; each
    * interval is exploded to every bin it overlaps. The join is then a
    * plain equi-join on the bin (shuffle-partitionable, AQE-skew-
    * handled) followed by the exact containment filter. No distinct
    * needed — a point's unique bin means each (interval, point) pair
    * is produced at most once.
    *
    * Scale: cost is |points| + Σ interval_bins instead of |points| ×
    * |intervals|; pick `binWidth` near the median interval length so
    * most intervals explode to ≤ 2 bins. Skewed bins (a hot day)
    * split further under AQE.
    *
    * `binOf` maps a time column to a LONG axis position (e.g.
    * `datediff(c, lit("1992-01-01"))` for day resolution); it must be
    * monotone non-decreasing in the time value.
    */
  def rangeJoinBinned(points: DataFrame, pointTs: String,
      intervals: DataFrame, startTs: String, endTs: String,
      binOf: Column => Column, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"point/interval column names must be disjoint, both have: $shared")
    // pure LONG floor-division: Spark's `/` promotes to double, whose
    // 53-bit mantissa would silently mis-bin axis values beyond 2^53
    // (a microsecond epoch is already ~2^50, so the cliff is reachable
    // for a generic axis). Truncate-then-adjust rather than the
    // (x - pmod(x, w)) form: the subtraction there underflows for x
    // within binWidth of Long.MinValue, while q = x div w and
    // r = x - q*w never leave the long range for any x and w > 0.
    val bin = (c: Column) => {
      val x = binOf(c).cast("long")
      val w = lit(binWidth)
      val q = call_function("div", x, w)
      when(x - q * w < 0, q - 1).otherwise(q)
    }
    val p = points.withColumn("__bin", bin(col(pointTs)))
    val iv = intervals.withColumn("__bin",
      explode(sequence(bin(col(startTs)), bin(col(endTs)))))
    p.join(iv, Seq("__bin")).drop("__bin")
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
  }
}
