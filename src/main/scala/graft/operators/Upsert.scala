package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE-style upsert library implementing the reference's four sink
  * semantics (SURVEY §2.2) as pure DataFrame transforms — the Spark
  * rewrite of SQLite `INSERT OR REPLACE` / `ON CONFLICT DO UPDATE` /
  * `WHERE NOT EXISTS` / diff-delete.
  *
  * Scale: every operation is one shuffle on the primary key (the
  * window/groupBy and the join share the key). With a transactional
  * table format these become real MERGE INTO statements; this
  * emulation is format-agnostic and idempotent — re-running a batch
  * yields the same result, which the incremental engine (graft.incr)
  * relies on.
  */
object Upsert {

  /** K1 — full-row upsert (INSERT OR REPLACE by PK, users.py:101-106):
    * rows in `updates` replace same-key rows in `base` wholesale.
    * Both sides must share a schema.
    */
  def fullRow(base: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame = {
    // max_by(payload, ord), not a row_number window: same winner
    // (updates beat base per key), but partial aggregation halves the
    // shuffled rows — at most one survivor per key per map task. The
    // ordering key carries the payload as a TIEBREAK: an intra-batch
    // duplicate key (two update rows for one PK — normal in CDC
    // batches) ties on __src alone, and a bare max_by would pick an
    // arbitrary survivor per execution, breaking the idempotency the
    // incremental engine relies on; with the payload in the ordering
    // the winner is the lexicographically-largest row — deterministic
    // for the same data.
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val dataCols = base.columns.filterNot(keys.contains).toSeq
    val payload = struct(dataCols.map(col): _*)
    tagged.groupBy(keys.map(col): _*)
      .agg(max_by(payload, struct(col("__src"), payload)).as("__m"))
      .select(base.columns.toSeq.map(c =>
        if (keys.contains(c)) col(c) else col(s"__m.$c").as(c)): _*)
  }

  /** K2 — partial-column upsert (ON CONFLICT DO UPDATE SET
    * col=excluded.col, _customized_items.py:130-136): only
    * `updateCols` change; other columns keep their base values; keys
    * present only in `updates` are inserted (missing non-update
    * columns null).
    */
  def partial(base: DataFrame, updates: DataFrame, keys: Seq[String],
      updateCols: Seq[String]): DataFrame = {
    val u = updates.select((keys ++ updateCols).map(col): _*)
      .withColumnsRenamed(updateCols.map(c => c -> s"__u_$c").toMap)
      .withColumn("__matched", lit(true))
    val joined = base.join(u, keys, "full_outer")
    val merged = updateCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c,
        when(col("__matched"), col(s"__u_$c")).otherwise(col(c)))
    }
    merged.drop((updateCols.map(c => s"__u_$c") :+ "__matched"): _*)
  }

  /** K3 — insert-if-absent with NULL-safe key compare
    * (users.py:114-126): `incoming` rows whose key has no NULL-safe
    * match in `base` are appended.
    */
  def insertIfAbsent(base: DataFrame, incoming: DataFrame,
      keys: Seq[String]): DataFrame = {
    val cond = keys.map(k => base(k) <=> incoming(k)).reduce(_ && _)
    val fresh = incoming.join(base, cond, "left_anti")
    base.unionByName(fresh)
  }

  /** K4 — diff-delete / child-set reconciliation (users.py:128-135,
    * _expense.py:184-193): for every parent present in `incoming`,
    * the child set becomes exactly incoming's; parents absent from
    * incoming keep their old children. This is the
    * "replace-children-per-parent" superset of the reference's
    * partially-implemented deletes (SURVEY §7.4.4).
    */
  def reconcileChildren(base: DataFrame, incoming: DataFrame,
      parentKeys: Seq[String]): DataFrame = {
    val parents = incoming.select(parentKeys.map(col): _*).distinct()
    val untouched = base.join(parents, parentKeys, "left_anti")
    untouched.unionByName(incoming)
  }

  /** K5 — last-write-wins dedup for the bronze raw-response sink
    * (api_client.py:154-177 UNIQUE ON CONFLICT REPLACE): keep the
    * newest row per key by `orderCol` (ties broken by all remaining
    * columns for determinism).
    */
  def lastWriteWins(df: DataFrame, keys: Seq[String],
      orderCol: String): DataFrame = {
    // the ordering tuple (orderCol, then every remaining column)
    // contains the whole payload, so max(struct) both PICKS the newest
    // row and CARRIES it — one partial-aggregating shuffle, no
    // per-key sort. Struct comparison ranks null fields lowest, which
    // matches the previous desc-nulls-last ordering.
    val nonKey = df.columns.filterNot(keys.contains).toSeq
    val ordFields = orderCol +: nonKey.filterNot(_ == orderCol)
    df.groupBy(keys.map(col): _*)
      .agg(max(struct(ordFields.map(col): _*)).as("__m"))
      .select(df.columns.toSeq.map(c =>
        if (keys.contains(c)) col(c) else col(s"__m.$c").as(c)): _*)
  }

  /** SCD type-2 history from a change log (K6): collapse consecutive
    * identical attribute values per key (only ACTUAL changes open a
    * version) and assign [valid_from, valid_to) validity intervals —
    * valid_to = the next version's valid_from, null while current.
    * The change-detect and interval windows share one partition key,
    * so the whole build is a single shuffle on `keyCol` with two
    * in-partition sorts (the second over the collapsed — much
    * smaller — row set). Null-safe on the attribute (`<=>`), and the
    * caller supplies an integer event-time column (`usCol`, e.g.
    * unix_micros) plus a tie-break so the ordering is total and
    * engine-portable (raw ns timestamps would order differently
    * across engines).
    */
  def scd2FromLog(log: DataFrame, keyCol: String, attrCol: String,
      usCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(usCol), col(tieCol))
    log
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // the rn==1 escape matters when a key's FIRST attribute value is
      // NULL: lag's default is also null, null <=> null is true, and
      // the null-safe no-change filter alone would drop the key's
      // opening version from the history
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
      .drop("__rn")
      .withColumn("valid_to_us", lead(col(usCol), 1).over(w))
      .select(col(keyCol), col(attrCol),
        col(usCol).as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.cast("int").as("is_current"))
  }
}
