package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Incremental maintenance for keyed materialized views.
  *
  * The reference keeps every view virtual and recomputes it per ODBC
  * query (`create_views.sql` — all `CREATE VIEW`); at 100 TB a
  * materialized view refreshed per ingest batch replaces that, and
  * recomputing the WHOLE view per batch is the thing that doesn't
  * scale. `refreshKeyed` rebuilds only the rows whose key appeared in
  * the batch's change set:
  *
  *   next = materialized ⟕̸ changed   (anti-join: untouched rows kept)
  *        ∪ view ⋉ changed           (semi-join: changed keys rebuilt)
  *
  * Inserts, updates, and deletes all fall out of the same two joins —
  * a deleted key simply has no rows on the recompute side. Both joins
  * are against the (small) change-key set, so they broadcast; the
  * view recompute is lazy and Catalyst pushes the semi-join's key
  * filter into the view's fact-side scan, so the rebuild reads a
  * batch-sized slice, not the corpus.
  */
object IncrementalView {

  def refreshKeyed(materialized: DataFrame, view: DataFrame,
      keyCol: String, changedKeys: DataFrame): DataFrame = {
    require(changedKeys.columns.toSeq == Seq(keyCol),
      s"changedKeys must have exactly one column named $keyCol, " +
        s"got ${changedKeys.columns.mkString(",")}")
    materialized.join(changedKeys, Seq(keyCol), "left_anti")
      .unionByName(view.join(changedKeys, Seq(keyCol), "left_semi"))
  }

  /** Join-delta refresh: a view whose rows combine MULTIPLE source
    * tables must be refreshed when ANY of them changes — e.g. a
    * request-details view is stale when only its child expense table
    * took a batch. Each source contributes its batch's changed rows
    * plus the name of the column in those rows that carries (or
    * renames to) the view key — the FK path. CDC batches carry full
    * rows, so a child-table delta names its parent directly; deeper
    * paths (grandchild tables) pre-join their delta to the
    * intermediate table before calling this and hand in the resulting
    * frame.
    *
    * Affected view keys = the union of every delta's mapped keys,
    * de-duplicated; rows with a null FK (orphans) touch no view row
    * and are dropped. The union stays change-batch-sized, so the
    * semi/anti joins in [[refreshKeyed]] broadcast exactly as in the
    * single-source case — the view recompute still reads a
    * batch-sized slice of each fact table, never the corpus.
    *
    * @param deltas (changedRows, fkCol) per changed source table:
    *               `changedRows(fkCol)` is the view key this source
    *               row affects
    */
  def refreshMultiKeyed(materialized: DataFrame, view: DataFrame,
      keyCol: String, deltas: Seq[(DataFrame, String)]): DataFrame = {
    require(deltas.nonEmpty, "need at least one source delta")
    val changedKeys = deltas
      .map { case (rows, fkCol) =>
        rows.select(col(fkCol).as(keyCol)).filter(col(keyCol).isNotNull)
      }
      .reduce(_.unionByName(_))
      .distinct()
    refreshKeyed(materialized, view, keyCol, changedKeys)
  }

  /** ADDITIVE delta merge — the rebuild-free maintenance shape for
    * views whose measures are all sums/counts: when a batch carries
    * per-key measure DELTAS (Δsum, Δcount — CDC old/new pairs reduce
    * to this), the next view state is
    *
    *   next = materialized ⟕ deltaAgg  →  measure + coalesce(Δ, 0)
    *
    * — one broadcast left join, NO semi/anti rebuild and NO read of
    * any fact table at all (contrast [[refreshKeyed]], which re-reads
    * a batch-sized fact slice). This is the O(|batch|) refresh the
    * self-maintainable-view literature promises for SUM/COUNT
    * aggregates; it cannot express MIN/MAX retractions or key
    * deletions — route those through [[refreshKeyed]].
    *
    * `deltaAgg` columns: `keyCol` plus `delta_<measure>` for each
    * measure to adjust, and every `delta_<measure>` must name an
    * existing view column (checked — a typo would otherwise silently
    * apply no delta). This variant ASSUMES update-only batches: a
    * delta key absent from the view is silently dropped by the left
    * join (checking would force an eager action inside a lazy
    * transform) — inserts and deletes change row membership and must
    * route through [[refreshKeyed]].
    */
  def refreshAdditive(materialized: DataFrame, keyCol: String,
      deltaAgg: DataFrame): DataFrame = {
    val measures = deltaAgg.columns.filter(_.startsWith("delta_"))
      .map(_.stripPrefix("delta_")).toSeq
    require(measures.nonEmpty, "deltaAgg needs delta_<measure> columns")
    val missing = measures.filterNot(materialized.columns.contains)
    require(missing.isEmpty,
      s"delta columns name no view measure: " +
        missing.map("delta_" + _).mkString(", "))
    val joined = materialized.join(
      org.apache.spark.sql.functions.broadcast(deltaAgg),
      Seq(keyCol), "left")
    joined.select(materialized.columns.toSeq.map { c =>
      if (measures.contains(c))
        (col(c) + org.apache.spark.sql.functions
          .coalesce(col(s"delta_$c"),
            org.apache.spark.sql.functions.lit(0L))).as(c)
      else col(c)
    }: _*)
  }

  /** Algebraic delta JOIN — maintain a materialized A ⋈ B under
    * APPEND-ONLY batches without any view key and without re-reading
    * the materialized join at all:
    *
    *   Δ(A ⋈ B) = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
    *
    * with A, B the PRE-batch states; appending the returned rows
    * brings the view current. This is the classic incremental-join
    * identity the keyed rebuild ([[refreshKeyed]]) cannot match when
    * the join has no stable key or the view is too large to semi/anti
    * re-scan. Both deltas are batch-sized, so every term broadcasts a
    * delta side — the two old-state scans are each driven by a
    * broadcast hash join on the batch's keys, and Catalyst prunes
    * them to the join columns; nothing ever shuffles the big tables.
    * Updates/deletes need retraction semantics (signed multiplicities)
    * — out of scope here; route keyed workloads with deletions
    * through [[refreshKeyed]].
    */
  def deltaJoin(aOld: DataFrame, aDelta: DataFrame, bOld: DataFrame,
      bDelta: DataFrame, joinKeys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    broadcast(aDelta).join(bOld, joinKeys)
      .unionByName(aOld.join(broadcast(bDelta), joinKeys))
      .unionByName(broadcast(aDelta).join(bDelta, joinKeys))
  }
}
