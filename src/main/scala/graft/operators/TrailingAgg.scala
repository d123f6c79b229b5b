package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trailing range-window moments in LINEAR work, via boundary-marker
  * prefix sums.
  *
  * Spark evaluates a sliding range frame
  * (`rangeBetween(-W, 0)`) by RE-AGGREGATING the whole in-window
  * buffer for every row — aggregate functions carry no retract path,
  * so a trailing count/sum costs O(Σ frame sizes) = O(n·w̄) where w̄
  * is the mean rows-per-window. [[SaltedWindow.trailing]] fixes the
  * skew (one hot key no longer serializes through one task) but not
  * that per-row recompute: at 10× the event density each task pays
  * 100× (measured on the sf0.5/sf1 scale-up sets: ts7 wall time grew
  * ~quadratically with per-day density). This operator replaces the
  * window entirely:
  *
  *   - every input row contributes `(1, 1 if x non-null, x, x²)` at
  *     time `t` (the non-null census reproduces the window sum's
  *     NULL-on-all-null-frame semantics);
  *   - per row, two zero-contribution PHANTOMS are planted: `hi` at
  *     `(t, tie=+1)` and `lo` at `(t−W, tie=−1)`;
  *   - ONE global multi-column running sum over the order
  *     `(keys…, t, tie, id)` ([[PrefixSum.withRunningSums]]: one
  *     range-partition + sort, no low-cardinality Window partition,
  *     no single-partition exchange) gives each phantom the running
  *     `(Σ1, Σx, Σx²)` at its position;
  *   - `hi − lo` per id is EXACTLY the trailing frame's aggregate:
  *     `hi` sits after every peer at `t` (range frames include peers),
  *     `lo` sits before any row at `t−W` (the lower bound is
  *     inclusive). Key changes can't bleed: both phantoms of an id
  *     share the key prefix, so any earlier-key totals cancel in the
  *     difference.
  *
  * Cost: 3n rows through one range sort + a groupBy(id) over the 2n
  * phantoms — O(n log n) total, independent of window density. The
  * crossover vs [[SaltedWindow.trailing]] is w̄ ≈ a few hundred rows
  * per window; below that the single-sort window is cheaper, above it
  * this wins unboundedly (at 100 TB event densities, w̄ is millions).
  *
  * Accumulators are LONG (the PrefixSum contract); overflow bounds
  * are the caller's — for cents-scaled values, Σx² fits to ~10⁹ rows
  * per key-window.
  */
object TrailingAgg {

  /** The pre-shuffle stage: ONE scan, each row exploded into its
    * three roles — the contribution at `t`, the hi phantom at
    * `(t, +1)`, the lo phantom at `(t−W, −1)`. A union of three
    * branches would read the source three times, which at 100 TB
    * triples the dominant cost (the scan). Phantoms contribute
    * nothing (null never moves a running sum) and only READ; carry
    * columns ride the hi phantom alone so the shuffle doesn't triple
    * their bytes. `private[graft]`-visible so the plan guard (which
    * lives in `graft.queries`) can assert the one-scan/one-Generate
    * shape directly.
    */
  private[graft] def staged(df: DataFrame, keys: Seq[String],
      usCol: String, idCol: String, xCol: String, windowUs: Long,
      carry: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    val nullL = lit(null).cast("long")
    val x = col(xCol).cast("long")
    // xn counts NON-NULL x in the frame: the window form's sum(x) is
    // NULL (not 0) when every x in the frame is null, so the
    // difference pass needs the non-null census to reproduce that
    val xn = when(col(xCol).isNull, nullL).otherwise(lit(1L))
    val role = explode(array(
      struct(col(usCol).as("t"), lit(0).as("tie"),
        lit(1L).as("x1"), xn.as("xn"), x.as("xs"), (x * x).as("xq")),
      struct(col(usCol).as("t"), lit(1).as("tie"),
        nullL.as("x1"), nullL.as("xn"), nullL.as("xs"),
        nullL.as("xq")),
      struct((col(usCol) - windowUs).as("t"), lit(-1).as("tie"),
        nullL.as("x1"), nullL.as("xn"), nullL.as("xs"),
        nullL.as("xq"))))
    df.select(kc ++ Seq(col(idCol).as("__id"),
        role.as("__r")) ++ carry.map(col): _*)
      .select(kc ++ Seq(col("__id"),
        col("__r.t").as("__t"), col("__r.tie").as("__tie"),
        col("__r.x1").as("__x1"), col("__r.xn").as("__xn"),
        col("__r.xs").as("__xs"), col("__r.xq").as("__xq")) ++
        carry.map(c =>
          when(col("__r.tie") === 1, col(c)).as(c)): _*)
  }

  /** Trailing `(count, Σx, Σx²)` over `(keys…, [t−W, t])` — the
    * rolling-moments shape (anomaly z-scores, rolling variance).
    *
    * @param df     input frame
    * @param keys   logical partition keys (low-cardinality is fine)
    * @param usCol  LONG epoch-microsecond order column
    * @param idCol  globally unique row id (join-back key)
    * @param xCol   integral value column
    * @param windowUs trailing frame length in microseconds, inclusive
    *                 both ends — identical semantics to
    *                 `rangeBetween(-windowUs, 0)`
    * @param carry  columns to carry through to the output (beyond
    *               keys and id)
    * @return one row per input row: idCol, keys…, carry…, n, s, q
    */
  def countSumSq(df: DataFrame, keys: Seq[String], usCol: String,
      idCol: String, xCol: String, windowUs: Long,
      carry: Seq[String] = Nil): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    require(df.schema(usCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"$usCol must be LONG epoch microseconds")
    // reject, don't truncate: staged() casts x to long BEFORE the
    // fold, so without this guard a double x would silently floor
    // (PrefixSum's own integral check never sees the raw column)
    val xType = df.schema(xCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(xType),
      s"$xCol must be an integral type, got ${xType.simpleString}")
    val cums = PrefixSum.withRunningSums(
      staged(df, keys, usCol, idCol, xCol, windowUs, carry),
      keys ++ Seq("__t", "__tie", "__id"),
      Seq("__x1" -> "__c1", "__xn" -> "__cn",
        "__xs" -> "__cs", "__xq" -> "__cq"))
    def side(tie: Int, c: String) =
      coalesce(max(when(col("__tie") === tie, col(c))), lit(0L))
    // sum semantics over the frame: NULL when no non-null x is in it
    // (exactly the window form), the long difference otherwise
    val nn = side(1, "__cn") - side(-1, "__cn")
    def sumOrNull(c: String): Column =
      when(nn === 0L, lit(null).cast("long"))
        .otherwise(side(1, c) - side(-1, c))
    val aggCols: Seq[Column] =
      keys.map(k => first(col(k)).as(k)) ++
        carry.map(c => first(col(c), ignoreNulls = true).as(c)) ++
        Seq(
          (side(1, "__c1") - side(-1, "__c1")).as("n"),
          sumOrNull("__cs").as("s"),
          sumOrNull("__cq").as("q"))
    cums.filter(col("__tie") =!= 0)
      .groupBy(col("__id").as(idCol))
      .agg(aggCols.head, aggCols.tail: _*)
  }
}
