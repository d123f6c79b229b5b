package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{GraphIterations, ManagedCache}

/** Dev harness: time the run-to-convergence graph operators (the
  * paths a production job would call — unbounded rounds, unlike the
  * 2-round oracle twins xg1/xg3/xg4) on the same part↔supplier
  * bipartite graph those queries build from a sf dir.
  *
  *   java … graft.tools.FixpointBench [sfDir] [passes]
  *
  * Prints one line per (op, pass): rounds to convergence, rows, secs.
  */
object FixpointBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(sys.error("pass <sfDir> or set SPARK_GRAFT_SF_DIR"))
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def lineitem = graft.Tables.load(spark, sfDir, "lineitem")
    def bipartite: DataFrame = {
      val fwd = lineitem.select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      graft.operators.GraphEdges.symmetrize(fwd, "src", "dst")
    }

    val ops: Seq[(String, () => (Long, Int, Boolean))] = Seq(
      "pagerank_converged" -> (() => {
        val r = GraphIterations.pageRankConverged(bipartite,
          tolNano = 1000L, maxIter = 50)
        (r.frame.count(), r.rounds, r.converged)
      }),
      "ppr_converged" -> (() => {
        // personalized: teleport to the 10 lowest part ids (even,
        // < 20 under the side-tagged encoding)
        val r = GraphIterations.pageRankConverged(bipartite,
          tolNano = 1000L, maxIter = 50,
          seedFilter = Some(n => pmod(n, lit(2)) === 0 && n < 20))
        (r.frame.count(), r.rounds, r.converged)
      }),
      "ppr_push" -> (() => {
        // same seed set as ppr_converged, via forward push: the edge
        // join touches only the over-threshold frontier each round
        val r = GraphIterations.pprPushConverged(bipartite,
          epsNano = sys.env.getOrElse("FIXBENCH_PPR_EPS", "10").toLong,
          seedFilter = n => pmod(n, lit(2)) === 0 && n < 20)
        (r.frame.count(), r.rounds, r.converged)
      }),
      "ppr_quality" -> (() => {
        // quality check, not a timing row: top-50 overlap between the
        // power-iteration PPR ranks and the push approximation
        val seeds: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
          n => pmod(n, lit(2)) === 0 && n < 20
        val pow = GraphIterations.pageRankConverged(bipartite,
          tolNano = 1000L, maxIter = 50, seedFilter = Some(seeds))
        val push = GraphIterations.pprPushConverged(bipartite,
          epsNano = sys.env.getOrElse("FIXBENCH_PPR_EPS", "10").toLong,
          seedFilter = seeds)
        def top50(df: DataFrame, c: String) = df
          .orderBy(col(c).desc, col("node_id")).limit(50)
          .select(col("node_id")).collect().map(_.getLong(0))
        val a = top50(pow.frame, "r")
        val b = top50(push.frame, "p")
        val overlap = a.toSet.intersect(b.toSet).size
        println(s"[fixbench] ppr_quality: top50 overlap=$overlap/50 " +
          s"top10_exact=${a.take(10).sameElements(b.take(10))}")
        (overlap.toLong, push.rounds, push.converged)
      }),
      "lpa_converged" -> (() => {
        // the graph is side-tagged even/odd, so waves=2 updates on a
        // proper 2-coloring — semi-sync, guaranteed oscillation-free
        val r = GraphIterations.labelPropagationConverged(bipartite,
          maxIter = sys.env.getOrElse("FIXBENCH_LPA_MAXITER", "30").toInt,
          waves = 2)
        (r.frame.count(), r.rounds, r.converged)
      }),
      "kcore_converged_union" -> (() => {
        val e = lineitem.select((col("l_partkey") * 2).as("u"),
          (col("l_suppkey") * 2 + 1).as("v"))
        val r = GraphIterations.kcoreConverged(e, k = 4)
        (r.frame.count(), r.rounds, r.converged)
      }),
      "kcore_converged_perside" -> (() => {
        val e = lineitem.select((col("l_partkey") * 2).as("u"),
          (col("l_suppkey") * 2 + 1).as("v"))
        val r = GraphIterations.kcoreConverged(e, k = 4,
          disjointSides = true)
        (r.frame.count(), r.rounds, r.converged)
      }))

    val only = sys.env.get("FIXBENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    for ((name, run) <- ops if only.forall(_.exists(name.startsWith));
        pass <- 1 to passes) {
      val t0 = System.nanoTime()
      val (rows, rounds, conv) = run()
      val dt = (System.nanoTime() - t0) / 1e9
      ManagedCache.releaseAll()
      println(f"[fixbench] $name%-24s pass $pass: $dt%7.2fs  " +
        f"rounds=$rounds%-3d rows=$rows%-9d converged=$conv")
    }
    spark.stop()
  }
}
