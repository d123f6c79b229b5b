package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Convergence + lineage-bound behavior of the shared Fixpoint
  * harness and the unbounded graph variants whose 2-round oracle
  * twins live in queries/ExtOps (xg1/xg3/xg4).
  */
class FixpointSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("pageRankConverged: a regular cycle is stationary from the " +
    "uniform start (exact ranks, 1 round); a star separates hub from " +
    "leaves and converges well inside maxIter") {
    // 4-cycle: every node deg 2 — uniform IS the fixpoint
    val cyc = GraphIterations.pageRankConverged(
      sym(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))), tolNano = 0L)
    assert(cyc.converged && cyc.rounds == 1, s"${cyc.rounds}")
    val ranks = cyc.frame.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks.values.toSet == Set(250000000L), ranks.toString)

    // star: hub 0 ↔ leaves 1..4. Synchronous PR on a star OSCILLATES
    // with decay 0.85/round, so a tol of t nano is reached after
    // ~ln(gap/t)/0.1625 rounds — 0.1% of mass lands near round 35
    val star = GraphIterations.pageRankConverged(
      sym((1L to 4L).map(i => (0L, i))), tolNano = 1000000L,
      maxIter = 60)
    assert(star.converged && star.rounds > 2 && star.rounds < 60,
      s"rounds=${star.rounds}")
    val sr = star.frame.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sr(0L) > sr(1L) * 2, sr.toString)
    assert((1L to 4L).map(sr).toSet.size == 1, "leaves must tie")
    // total rank mass conserved up to tol + integer-division dust
    assert(math.abs(sr.values.sum - 1000000000L) < 5000000L)
  }

  test("pageRankConverged with a seed filter (personalized): mass " +
    "concentrates around the seed; a far node ranks below a near one") {
    // path 0-1-2-3-4 symmetrized, seed {0}: rank must decay with
    // distance from the seed
    // a path is bipartite: synchronous PR oscillates between parity
    // classes with 0.85/round decay, so reaching tol t needs
    // ~ln(1e9/t)/0.1625 rounds — 100k nano lands near round 57
    val ppr = GraphIterations.pageRankConverged(
      sym(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))),
      tolNano = 100000L, maxIter = 90,
      seedFilter = Some(n => n === 0L))
    assert(ppr.converged, s"rounds=${ppr.rounds}")
    val r = ppr.frame.collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // note: the seed's NEIGHBOR may outrank the degree-1 seed (it
    // absorbs the seed's entire outflow) — correct PPR behavior; the
    // provable shape is decay with distance beyond the neighbor and
    // seed above everything at distance ≥ 2
    assert(r(1L) > r(2L) && r(2L) > r(3L) && r(3L) > r(4L), r.toString)
    assert(r(0L) > r(2L) && r(0L) > 3L * r(4L), r.toString)
    // mass conserved up to tol + integer dust
    assert(math.abs(r.values.sum - 1000000000L) < 10000000L)
  }

  test("pprPushConverged agrees with power-iteration PPR on ranking " +
    "(same fixpoint, ACL error bound) and the residual frontier " +
    "actually empties") {
    // two 4-cliques bridged by one edge, seed in clique A: push and
    // power iteration must agree that clique-A nodes outrank clique-B
    val cliqueA = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val cliqueB = for (i <- 4L to 7L; j <- 4L to 7L if i < j) yield (i, j)
    val g = sym(cliqueA ++ cliqueB ++ Seq((3L, 4L)))
    val seeds: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      n => n === 0L
    val pow = GraphIterations.pageRankConverged(g, tolNano = 1000L,
      maxIter = 90, seedFilter = Some(seeds))
    val push = GraphIterations.pprPushConverged(g, epsNano = 100L,
      seedFilter = seeds)
    assert(pow.converged && push.converged,
      s"pow=${pow.rounds} push=${push.rounds}")
    val pr = pow.frame.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val pu = push.frame.collect()
      .map(x => x.getLong(0) -> (x.getLong(2), x.getLong(3))).toMap
    // converged ⇒ every residual at or below eps·deg
    assert(pu.values.forall { case (_, r) => r <= 100L * 6L }, pu.toString)
    // identical rank ORDER on the full node set (ties none by design)
    val powOrder = pr.toSeq.sortBy { case (n, r) => (-r, n) }.map(_._1)
    val pushOrder = pu.toSeq
      .sortBy { case (n, (p, _)) => (-p, n) }.map(_._1)
    assert(powOrder == pushOrder, s"pow=$powOrder push=$pushOrder")
    // seed-side concentration: min clique-A settled mass beats max B
    assert((0L to 3L).map(n => pu(n)._1).min >
      (4L to 7L).map(n => pu(n)._1).max, pu.toString)
    // settled + residual mass never exceeds the injected SCALE, and
    // most mass is settled by convergence (truncation only loses)
    val total = pu.values.map { case (p, r) => p + r }.sum
    assert(total <= 1000000000L && total > 900000000L, total.toString)
  }

  test("pprPushConverged rejects an empty seed set loudly") {
    val ex = intercept[Exception] {
      GraphIterations.pprPushConverged(
        sym(Seq((0L, 1L), (1L, 2L))),
        seedFilter = n => n === 999L).frame.collect()
    }
    def msgs2(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs2(e.getCause))
    assert(msgs2(ex).exists(_.contains("seed set is empty")), ex.toString)
  }

  test("pageRankConverged rejects an empty seed set loudly instead " +
    "of 'converging' to an all-null rank frame") {
    val ex = intercept[Exception] {
      GraphIterations.pageRankConverged(
        sym(Seq((0L, 1L), (1L, 2L))),
        maxIter = 3, seedFilter = Some(n => n === 999L)).frame.collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("seed set is empty")), ex.toString)
  }

  test("labelPropagationConverged: two planted cliques settle on " +
    "their min labels and stop changing — under both the pure-sync " +
    "xg3 rule and the retention default") {
    val k4 = for {
      base <- Seq(0L, 10L); i <- 0 to 3; j <- (i + 1) to 3
    } yield (base + i, base + j)
    for (ret <- Seq(false, true)) {
      val r = GraphIterations.labelPropagationConverged(sym(k4),
        retention = ret)
      assert(r.converged && r.rounds >= 2, s"ret=$ret rounds=${r.rounds}")
      val lbl = r.frame.collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert((0L to 3L).map(lbl).toSet == Set(0L), s"ret=$ret $lbl")
      assert((10L to 13L).map(lbl).toSet == Set(10L), s"ret=$ret $lbl")
    }
  }

  test("labelPropagationConverged: the pure-sync variant 2-cycles " +
    "on a bipartite oscillator (flagged, not an exception); the " +
    "retention default CONVERGES on the same input") {
    // nodes 0,1 with one edge: under synchronous update the labels
    // swap forever (0 adopts 1's, 1 adopts 0's)
    val sync = GraphIterations.labelPropagationConverged(
      sym(Seq((0L, 1L))), maxIter = 6, retention = false)
    assert(!sync.converged && sync.rounds == 6)
    // retention: both see the tied multiset {0, 1} and resolve to the
    // same min — node 1 adopts 0, node 0 keeps 0, fixed point
    val ret = GraphIterations.labelPropagationConverged(
      sym(Seq((0L, 1L))), maxIter = 6)
    assert(ret.converged, s"rounds=${ret.rounds}")
    val lbl = ret.frame.collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(lbl(0L) == lbl(1L), lbl.toString)
  }

  test("labelPropagationConverged retention converges on a larger " +
    "bipartite graph where pure-sync oscillates, and both sides " +
    "agree on one community label") {
    // complete bipartite K_{3,3}: the canonical LPA oscillator
    val k33 = for (u <- 0L to 2L; v <- 10L to 12L) yield (u, v)
    val sync = GraphIterations.labelPropagationConverged(
      sym(k33), maxIter = 8, retention = false)
    assert(!sync.converged)
    val ret = GraphIterations.labelPropagationConverged(
      sym(k33), maxIter = 20)
    assert(ret.converged, s"rounds=${ret.rounds}")
    val lbls = ret.frame.collect().map(_.getLong(1)).toSet
    assert(lbls.size == 1, s"one community expected: $lbls")
  }

  test("labelPropagationConverged waves=2 on a parity-encoded " +
    "complete bipartite graph: single-wave pure-sync oscillates, the " +
    "two-wave semi-sync (parity = the proper 2-coloring) converges " +
    "to one community") {
    // side-tagged ids, xg4's convention: side A = evens {0,2,4},
    // side B = odds {1,3,5}; complete bipartite
    val kp = for (u <- Seq(0L, 2L, 4L); v <- Seq(1L, 3L, 5L)) yield (u, v)
    val sync = GraphIterations.labelPropagationConverged(
      sym(kp), maxIter = 8, retention = false)
    assert(!sync.converged)
    for (ret <- Seq(false, true)) {
      val sw = GraphIterations.labelPropagationConverged(
        sym(kp), maxIter = 10, retention = ret, waves = 2)
      assert(sw.converged, s"ret=$ret rounds=${sw.rounds}")
      val lbls = sw.frame.collect().map(_.getLong(1)).toSet
      assert(lbls.size == 1, s"ret=$ret one community expected: $lbls")
    }
  }

  test("kcoreConverged peels a tail one node per round (the " +
    "multi-round case a fixed unroll would get wrong) and keeps the " +
    "clique intact") {
    // K5 on 0..4 plus a path tail 4-5-6-7; k=2: the tail peels from
    // the end, ONE node per round — needs 3 peel rounds + 1 confirm
    val k5 = for (i <- 0 to 4; j <- (i + 1) to 4) yield (i.toLong, j.toLong)
    val edges = (k5 ++ Seq((4L, 5L), (5L, 6L), (6L, 7L))).toDF("u", "v")
    val r = GraphIterations.kcoreConverged(edges, k = 2)
    assert(r.converged && r.rounds >= 4, s"rounds=${r.rounds}")
    val left = r.frame.collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(left.length == 10, left.mkString(","))
    assert(left.forall { case (u, v) => u <= 4 && v <= 4 })
    // k above the clique degree empties the graph and still converges
    val gone = GraphIterations.kcoreConverged(edges, k = 5)
    assert(gone.converged && gone.frame.count() == 0)
  }

  test("iterate: maxIter exhaustion throws by default; " +
    "requireConverged=false returns the flag") {
    val init = Seq(0L).toDF("x")
    // step that never stabilizes: x alternates 0/1
    def step(df: org.apache.spark.sql.DataFrame, i: Int) =
      df.select((lit(1L) - col("x")).as("x"), col("x").as("prev"))
    intercept[IllegalArgumentException] {
      Fixpoint.iterate(init,
        changed = sum(when(col("x") =!= col("prev"), 1L).otherwise(0L)),
        project = Seq("x"), maxIter = 3)(step)
    }
    val r = Fixpoint.iterate(init,
      changed = sum(when(col("x") =!= col("prev"), 1L).otherwise(0L)),
      project = Seq("x"), maxIter = 3, requireConverged = false)(step)
    assert(!r.converged && r.rounds == 3)
  }

  test("kcore disjointSides per-side peel equals the union-degree " +
    "path on a bipartite side-tagged graph") {
    // even/odd side tagging (the xg4 encoding): u ids even, v ids odd
    // — a dense block that survives k=3 plus pendant edges that peel
    val dense = for (p <- 0L until 6L; s <- 0L until 4L
      if (p + s) % 2 == 0 || p < 3) yield (p * 2, s * 2 + 1)
    val pendants = Seq((100L, 1L), (102L, 3L), (0L, 101L))
    val edges = (dense ++ pendants).toDF("u", "v")
    val viaUnion = GraphIterations.kcoreConverged(edges, k = 3)
    val viaSides = GraphIterations.kcoreConverged(edges, k = 3,
      disjointSides = true)
    assert(viaUnion.converged && viaSides.converged)
    val a = viaUnion.frame.orderBy($"u", $"v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = viaSides.frame.orderBy($"u", $"v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b, s"union=$a per-side=$b")
    assert(a.nonEmpty, "fixture should retain a 3-core")
  }

  test("the lineage bound holds: a 12-round monotone peel keeps the " +
    "final plan O(1)-deep (no growth with iteration count)") {
    // path 0-1-…-12, k=1 trivially keeps everything? No: k=2 —
    // endpoints peel one per round from both ends, ~6 rounds; use a
    // 25-node path so the loop runs 12 rounds
    val path = (0L until 25L).map(i => (i, i + 1)).toDF("u", "v")
    val r = GraphIterations.kcoreConverged(path, k = 2, maxIter = 40)
    assert(r.converged && r.rounds >= 12, s"rounds=${r.rounds}")
    assert(r.frame.count() == 0) // a pure path has no 2-core
    // localCheckpoint per round ⇒ the final frame's logical plan is a
    // scan of the checkpointed RDD, not a 12-join tower
    val planDepth = r.frame.queryExecution.optimizedPlan.toString()
      .linesIterator.size
    assert(planDepth < 10, s"plan unexpectedly deep:\n$planDepth lines")
  }
}
