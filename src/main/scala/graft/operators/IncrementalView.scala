package graft.operators

import org.apache.spark.sql.DataFrame

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
}
