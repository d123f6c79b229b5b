package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns a
  * near-duplicate PAIR list (dd2/dd3/dd4) into the cluster "drop
  * list" a dedup pipeline actually applies: one keeper per component,
  * everything else dropped. The reference stops at pair emission; a
  * 100 TB training-data pipeline needs the closure, because near-dup
  * relations are not transitive pair-by-pair (A~B, B~C but not A~C
  * must still collapse to ONE keeper).
  *
  * Algorithm: iterative min-label propagation to a fixpoint. Each
  * round is one shuffle keyed on vertex id (join + map-side-partial
  * `min` aggregate); rounds needed = component diameter, which for
  * near-dup graphs is tiny (duplicate families are cliques-ish, 2-4
  * hops). Per-round `localCheckpoint` truncates lineage so the plan
  * does not grow with iterations — the standard shape that scales to
  * the large-star/small-star variant (Kiveris et al., "Connected
  * Components in MapReduce", SoCC'14) if diameters ever grow.
  */
object ConnectedComponents {

  /** Label every vertex with the minimum vertex id reachable from it.
    *
    * @param vertices one column `id` (long) — every vertex, including
    *                 isolated ones (they become their own component)
    * @param edges    columns `src`, `dst` — undirected pairs, any
    *                 orientation, duplicates tolerated
    * @return (id, component) with component = min id in the component
    */
  def minLabel(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 25): DataFrame = {
    // symmetrize once: propagation below only follows src -> dst.
    // Both orientations ride ONE explode over a single evaluation of
    // `edges` (GraphEdges.symmetrize) — the union-of-two-selects form
    // evaluates the edge pipeline TWICE (upstream of dd11 that
    // pipeline is the full LSH band join + exact verify; the double
    // run measured ~20 s of pure waste at 1M docs).
    val sym = GraphEdges.symmetrize(edges, "src", "dst")
      .distinct()
      .localCheckpoint(true)

    // Iterate ONLY over edge-touched vertices: an isolated vertex is
    // its own component by construction and can never change, yet a
    // full-vertex loop re-shuffles and re-checkpoints every one of
    // them each round. On a dedup graph the near-dup families touch a
    // tiny fraction of the corpus (sf1: ~500 of 1M docs), so the
    // per-round state shrinks by orders of magnitude; isolates attach
    // at the end with ONE left join (comp = own id). Semantics are
    // unchanged: active is vertices ∩ edge endpoints, so endpoints
    // outside `vertices` still don't propagate.
    val verts = vertices.select(col("id")).distinct()
      .localCheckpoint(true)
    val active = verts.join(
      sym.select(col("src").as("id")).distinct(), Seq("id"), "semi")
    val init = active.select(col("id"), col("id").as("comp"))
    // per-round checkpoint + observed change counter both come from
    // the shared Fixpoint harness (this loop was its prototype)
    val labels = Fixpoint.iterate(init,
      changed = sum(when(col("comp") =!= col("prev"), 1L).otherwise(0L)),
      project = Seq("id", "comp"), maxIter = maxIter) { (labels, _) =>
      // min over neighbours' labels, one shuffle on dst
      val nbrMin = sym.join(labels, sym("src") === labels("id"))
        .groupBy(sym("dst").as("nid"))
        .agg(min(col("comp")).as("nbr_comp"))
      labels.join(nbrMin, labels("id") === col("nid"), "left")
        .select(labels("id").as("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp")))
            .as("comp"),
          col("comp").as("prev"))
    }.frame
    verts.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** The dedup closure: (doc_id, cluster_id, is_keeper) where keeper =
    * the minimum doc_id of each component — deterministic canonical
    * pick, no RNG.
    */
  def dedupClusters(vertices: DataFrame, edges: DataFrame): DataFrame =
    minLabel(vertices, edges)
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"),
        (col("id") === col("comp")).cast("int").as("is_keeper"))
}
