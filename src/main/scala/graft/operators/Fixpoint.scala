package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Run-to-convergence harness for iterative dataframe algorithms —
  * the loop shape [[ConnectedComponents]] proved out, generalized so
  * every iterative graph/state operator shares ONE set of scale
  * invariants instead of re-inventing them:
  *
  *  - each round materializes exactly ONCE via eager
  *    `localCheckpoint`, truncating lineage so the physical plan
  *    stays O(1) per round instead of growing with the iteration
  *    count (50-round PageRank would otherwise compile a 50-deep
  *    plan and eventually blow analysis/codegen);
  *  - the convergence signal rides THAT SAME job as an observed
  *    metric (`Dataset.observe`) — a separate `count()` action would
  *    re-run the whole round's work a second time;
  *  - rounds are bounded by `maxIter` with an explicit converged
  *    flag, so a pathological input degrades to a diagnosable
  *    "did not converge" instead of an infinite job stream.
  *
  * The oracle-replayable 2-round unrolled twins of these algorithms
  * live in queries/ExtOps (xg1/xg3/xg4); the operators below are the
  * unbounded versions a 100 TB run would call (10–50 rounds).
  */
object Fixpoint {

  final case class Result(frame: DataFrame, rounds: Int,
      converged: Boolean)

  /** Iterate `step` from `init` until the `changed` aggregate
    * (evaluated over each round's OUTPUT rows) observes 0, or
    * `maxIter` rounds elapse. `project` names the state columns
    * carried into the next round (helper columns like `prev` are
    * dropped after the convergence read).
    */
  def iterate(init: DataFrame, changed: Column, project: Seq[String],
      maxIter: Int, requireConverged: Boolean = true)
      (step: (DataFrame, Int) => DataFrame): Result = {
    require(maxIter >= 1, "maxIter must be >= 1")
    val runId = java.util.UUID.randomUUID().toString.take(8)
    var cur = init.localCheckpoint(true)
    var delta = Long.MaxValue
    var rounds = 0
    while (delta != 0L && rounds < maxIter) {
      val obs = new Observation(s"fixpoint_${runId}_$rounds")
      val next = step(cur, rounds)
        .observe(obs, changed.as("changed"))
        .localCheckpoint(true)
      delta = obs.get("changed") match {
        case null => 0L // empty frame: aggregate over zero rows
        case n: java.lang.Long => n.longValue()
      }
      if (sys.env.contains("GRAFT_FIXPOINT_TRACE"))
        System.err.println(s"[fixpoint $runId] round=$rounds changed=$delta")
      cur = if (project.isEmpty) next else next.select(project.map(col): _*)
      rounds += 1
    }
    if (requireConverged) require(delta == 0L,
      s"fixpoint did not converge in $maxIter rounds")
    Result(cur, rounds, delta == 0L)
  }

  /** Fixpoint for MONOTONE-SHRINKING states (peeling, pruning):
    * converged when a round's output row count equals the previous
    * round's. For a step that only ever drops rows, equal counts ⇒
    * identical state, so this needs no `prev` column join at all —
    * the count observation is free on the materialization job.
    */
  def iterateMonotone(init: DataFrame, maxIter: Int,
      requireConverged: Boolean = true)
      (step: (DataFrame, Int) => DataFrame): Result = {
    require(maxIter >= 1, "maxIter must be >= 1")
    val runId = java.util.UUID.randomUUID().toString.take(8)
    var cur = init.localCheckpoint(true)
    var prevN = -1L
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIter) {
      val obs = new Observation(s"fixmono_${runId}_$rounds")
      val next = step(cur, rounds)
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint(true)
      val n = obs.get("n") match {
        case null => 0L
        case v: java.lang.Long => v.longValue()
      }
      converged = n == prevN
      prevN = n
      cur = next
      rounds += 1
    }
    if (requireConverged) require(converged,
      s"monotone fixpoint did not converge in $maxIter rounds")
    Result(cur, rounds, converged)
  }
}

/** Unbounded (run-to-convergence) variants of the graph operators
  * whose 2-round oracle twins live in queries/ExtOps. All state
  * frames stay O(|V|) or shrink monotonically; per-round shuffles
  * key on node ids — the same partitioning every round.
  */
object GraphIterations {

  /** Fixed-point-arithmetic PageRank (damping 17/20, nano-units —
    * bit-stable integer math, same scheme as xg1) iterated until no
    * node's rank moves by more than `tolNano`. `edges` is a directed
    * (src, dst) pair list in which EVERY node must appear as a src
    * (symmetrize first for undirected graphs — dangling nodes are the
    * caller's modeling decision, not silently patched here).
    * Returns (node_id, r) in nano-rank units.
    *
    * `seedFilter` switches to PERSONALIZED PageRank (topic-sensitive,
    * Haveliwala 2002 — xg7's unbounded twin): all teleport mass lands
    * on the nodes the predicate selects, so converged ranks measure
    * proximity to that seed set. None = uniform teleport (classic).
    */
  /** Shared rank-iteration prep (power + push variants): distinct
    * directed edges, PERSISTED out-degrees and degree-joined edge
    * list, and the seed-count 1-row frame. A seed predicate matching
    * no out-degree node would make every rank div(SCALE, 0) = NULL
    * and the run would "converge" to an all-null frame — the n=0 row
    * trips raise_error at broadcast-build time instead. One
    * implementation so the cache discipline and the loud-empty
    * contract cannot drift between the two algorithms.
    */
  private def prepRankGraph(edges: DataFrame,
      seedFilter: Option[Column => Column], who: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val deg = ManagedCache.persist(
      e.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val withDeg = ManagedCache.persist(e.join(deg, Seq("src")))
    val nn = seedFilter.fold(deg)(f => deg.filter(f(col("src"))))
      .agg(count(lit(1)).as("n0"))
      .select(when(col("n0") > 0, col("n0")).otherwise(raise_error(
        concat(lit(s"$who: seed set is empty — seedFilter " +
          "matches no node with out-degree > 0")))).as("n"))
    (deg, withDeg, nn)
  }

  def pageRankConverged(edges: DataFrame, tolNano: Long = 1000L,
      maxIter: Int = 50,
      seedFilter: Option[Column => Column] = None): Fixpoint.Result = {
    val SCALE = 1000000000L
    val (deg, withDeg, nn) =
      prepRankGraph(edges, seedFilter, "pageRankConverged")
    val ind: Column => Column = seedFilter.getOrElse(_ => lit(true))
    val r0 = deg.select(col("src").as("node_id"))
      .crossJoin(broadcast(nn))
      .select(col("node_id"),
        when(ind(col("node_id")),
          call_function("div", lit(SCALE), col("n")))
          .otherwise(lit(0L)).as("r"))
    Fixpoint.iterate(r0,
      changed = sum(when(abs(col("r") - col("prev")) > tolNano, 1L)
        .otherwise(0L)),
      project = Seq("node_id", "r"), maxIter = maxIter) { (cur, _) =>
      val sv = withDeg
        .join(cur.select(col("node_id").as("src"), col("r")), Seq("src"))
        .select(col("dst"),
          call_function("div", col("r"), col("deg")).as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("sv"))
      // left join against the node spine: a node with no in-edges
      // decays to the base teleport term instead of vanishing
      cur.join(sv.withColumnRenamed("dst", "node_id"),
          Seq("node_id"), "left")
        .crossJoin(broadcast(nn))
        .select(col("node_id"),
          (when(ind(col("node_id")),
            call_function("div", lit(3L) * SCALE, lit(20L) * col("n")))
            .otherwise(lit(0L)) +
            call_function("div",
              lit(17L) * coalesce(col("sv"), lit(0L)), lit(20L)))
            .as("r"),
          col("r").as("prev"))
    }
  }

  /** Forward-push personalized PageRank (Andersen–Chung–Lang 2006,
    * "Local graph partitioning using PageRank vectors" — the batch
    * variant: every over-threshold node pushes each round). Same
    * teleport split as [[pageRankConverged]] (damping 17/20 ⇒
    * teleport 3/20) and the same nano-unit integer arithmetic, so the
    * two converge to the same fixpoint as `epsNano → 0`; the payoff
    * is WHERE the work happens. Power iteration joins the FULL edge
    * list against the full rank vector every round (~|E| shuffle rows
    * × rounds). Push keeps per-node (settled `p`, residual `r`) and
    * each round joins edges against only the FRONTIER — nodes with
    * `r > epsNano·deg` — so once the residual disperses below
    * threshold the edge join shrinks toward zero rows. For a
    * seed-local query on a 100 TB graph the frontier never grows past
    * the seed neighborhood, which is the whole point: cost scales
    * with the answer's support, not the graph.
    *
    * Each push settles `3/20·r(u)` into `p(u)` and spreads
    * `17/20·r(u)/deg(u)` along each out-edge (integer `div`,
    * truncation dust simply stays un-pushed — determinism over exact
    * mass conservation, same trade as xg1). Converged when no node is
    * over threshold; `p` then approximates the PPR vector within
    * `epsNano·deg(v)` per node (ACL Thm 1). `edges` contract matches
    * [[pageRankConverged]]: directed pairs, every node present as a
    * src. Returns (node_id, deg, p, r) — rank by `p`.
    */
  def pprPushConverged(edges: DataFrame, epsNano: Long = 10L,
      maxIter: Int = 200,
      seedFilter: Column => Column): Fixpoint.Result = {
    val SCALE = 1000000000L
    val (deg, withDeg, nn) =
      prepRankGraph(edges, Some(seedFilter), "pprPushConverged")
    val overCap = col("r") > col("deg") * epsNano
    val st0 = deg.select(col("src").as("node_id"), col("deg"))
      .crossJoin(broadcast(nn))
      .select(col("node_id"), col("deg"), lit(0L).as("p"),
        when(seedFilter(col("node_id")),
          call_function("div", lit(SCALE), col("n")))
          .otherwise(lit(0L)).as("r"))
    Fixpoint.iterate(st0,
      changed = sum(when(overCap, 1L).otherwise(0L)),
      project = Seq("node_id", "deg", "p", "r"),
      maxIter = maxIter) { (cur, _) =>
      val frontier = cur.filter(overCap)
        .select(col("node_id").as("src"), col("r").as("fr"))
      val inc = withDeg.join(frontier, Seq("src"))
        .select(col("dst"), call_function("div",
          lit(17L) * col("fr"), lit(20L) * col("deg")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inc"))
      cur.join(inc.withColumnRenamed("dst", "node_id"),
          Seq("node_id"), "left")
        .select(col("node_id"), col("deg"),
          (col("p") + when(overCap,
            call_function("div", lit(3L) * col("r"), lit(20L)))
            .otherwise(lit(0L))).as("p"),
          (when(overCap, lit(0L)).otherwise(col("r")) +
            coalesce(col("inc"), lit(0L))).as("r"))
    }
  }

  /** Deterministic label propagation (most-frequent neighbor label,
    * ties to the MINIMUM label — xg3's rule) iterated until no label
    * changes. `edges` must be symmetrized. Returns (node, lbl).
    *
    * Pure SYNCHRONOUS updates (`waves = 1, retention = false`,
    * exactly xg3's unrolled rule) provably 2-cycle on bipartite
    * structure — both sides swap labels forever — so non-convergence
    * within `maxIter` is reported via the flag, not an exception.
    * Two independent oscillation brakes, composable:
    *
    *  - `retention = true`: each node's OWN current label joins its
    *    vote (self-loops in the voting edge set — the lazy-dynamics
    *    variant). Breaks tie-swaps on small motifs (a lone pair both
    *    sees {own, other} and resolves to the same min), but on large
    *    tie-dominated graphs the min labels themselves keep hopping
    *    sides, so retention ALONE can still oscillate (measured: on
    *    the part↔supplier graph every node flips every round).
    *  - `waves = k > 1`: SEMI-SYNCHRONOUS update in the style the LPA
    *    literature prescribes (update one color class of a proper
    *    coloring at a time). Each round runs k sweeps; sweep w
    *    recomputes votes from the CURRENT state but applies them only
    *    to nodes with `node % k == w`, so later classes see earlier
    *    classes' fresh labels. With the engine's side-tagged even/odd
    *    node encoding (xg4's convention), `waves = 2` makes the
    *    residue classes a PROPER 2-coloring of any bipartite graph —
    *    no two adjacent nodes co-update, which removes the swap cycle
    *    entirely. Each sweep's vote is restricted to edges INTO its
    *    class (`dst % k == w`), so a full round shuffles the same
    *    ~|E| vote rows as one synchronous sweep — k× the jobs, not
    *    k× the data. Sweeps after the first read a checkpointed
    *    frame: the class state feeds both the join spine and the next
    *    vote, and leaving that self-reference unmaterialized makes
    *    size-stats estimation multiply through the duplicated subtree
    *    (observed: minutes of BigInteger math at planning time).
    *
    * For residue classes that are NOT a proper coloring (general
    * graphs), waves still help (fewer simultaneous neighbors) but
    * guarantee nothing — the converged flag stays the honest signal.
    */
  def labelPropagationConverged(edges: DataFrame, maxIter: Int = 30,
      retention: Boolean = true, waves: Int = 1): Fixpoint.Result = {
    require(waves >= 1, "waves must be >= 1")
    val base = edges.select(col("src"), col("dst")).distinct()
    val nodes = base.select(col("src").as("node")).distinct()
    val e = ManagedCache.persist(
      if (retention)
        base.unionByName(
          nodes.select(col("node").as("src"), col("node").as("dst")))
      else base)
    val l0 = nodes.select(col("node"), col("node").as("lbl"))
    // one sweep: recompute votes for nodes in residue class w (all
    // nodes when waves == 1) from `cur`, apply; other nodes keep
    def sweep(cur: DataFrame, w: Int): DataFrame = {
      val ew = if (waves == 1) e
        else e.filter(pmod(col("dst"), lit(waves.toLong)) === w)
      val nxt = ew.join(cur.select(col("node").as("src"),
          col("lbl").as("slbl")), Seq("src"))
        .groupBy(col("dst"), col("slbl"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("dst"))
        .agg(min(struct((-col("n")).as("neg"), col("slbl").as("l")))
          .as("best"))
        .select(col("dst").as("node"), col("best.l").as("newLbl"))
      // right join against the label spine: nodes outside the class
      // (or isolated under pure-sync) keep their label
      nxt.join(cur, Seq("node"), "right")
        .select(col("node"),
          coalesce(col("newLbl"), col("lbl")).as("lbl"))
    }
    Fixpoint.iterate(l0,
      changed = sum(when(col("lbl") =!= col("prev"), 1L).otherwise(0L)),
      project = Seq("node", "lbl"), maxIter = maxIter,
      requireConverged = false) { (cur, _) =>
      var st = sweep(cur, 0)
      for (w <- 1 until waves) st = sweep(st.localCheckpoint(true), w)
      st.join(cur.select(col("node"), col("lbl").as("prev")),
        Seq("node"))
    }
  }

  /** k-core: peel nodes of degree < k until none remain — a monotone
    * edge-shrink, so convergence is the free row-count fixpoint (no
    * prev-state join). Works on any undirected pair list (a node may
    * appear on either side). Returns the surviving edge list.
    *
    * `disjointSides = true` declares that the u- and v-side node id
    * spaces never overlap (a bipartite graph with side-tagged ids —
    * the even/odd encoding xg4 uses). A node's degree is then just
    * its count on ITS OWN side, so each round runs two per-side
    * aggregations (map-side combine shrinks each shuffle to ~|V|
    * rows, and the |V|-sized keep frames become AQE-broadcastable —
    * the surviving-edge joins need no e-side exchange) instead of
    * shuffling the 2|E|-row u∪v union. The general path stays the
    * union shape — with overlapping sides a per-side count would
    * undercount every node that appears on both.
    */
  def kcoreConverged(edges: DataFrame, k: Int, maxIter: Int = 100,
      disjointSides: Boolean = false): Fixpoint.Result = {
    val e0 = edges.select(col("u"), col("v")).distinct()
    Fixpoint.iterateMonotone(e0, maxIter) { (e, _) =>
      if (disjointSides) {
        val keepU = e.groupBy(col("u"))
          .agg(count(lit(1)).as("du"))
          .filter(col("du") >= k).select(col("u"))
        val keepV = e.groupBy(col("v"))
          .agg(count(lit(1)).as("dv"))
          .filter(col("dv") >= k).select(col("v"))
        e.join(keepU, Seq("u")).join(keepV, Seq("v"))
      } else {
        val keep = e.select(col("u").as("n"))
          .union(e.select(col("v").as("n")))
          .groupBy(col("n")).agg(count(lit(1)).as("d"))
          .filter(col("d") >= k).select(col("n"))
        e.join(keep.withColumnRenamed("n", "u"), Seq("u"))
          .join(keep.withColumnRenamed("n", "v"), Seq("v"))
      }
    }
  }
}
