package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants of the approximate operators that have no SQL
  * oracle (ann2 LSH, ann3 IVF): scores must agree exactly with the
  * brute-force path on shared pairs, and the search space restriction
  * must hold.
  */
class ExtOpsSpec extends SparkSpec {

  test("ann3 IVF: results come only from probed cells, cos matches " +
    "brute force, ranks are consistent") {
    val ivf = ExtOps.queries("ann3_ivf_ann")(spark, sf0001)
      .cache()
    val rows = ivf.collect()
    assert(rows.nonEmpty)
    // per query at most 5 results, ranked 1..n without gaps
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks == (1 to ranks.size))
      // at most 2 distinct cells probed
      assert(rs.map(_.getAs[Int]("cell")).distinct.length <= 2)
    }
    // cos values must equal the brute-force scorer on the same pairs
    val brute = TrainingData.queries("ann1_cosine_topk")(spark, sf0001)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    val joined = ivf.select(col("query_id"), col("neighbor_id"),
        col("cos").as("ivf_cos"))
      .join(brute, Seq("query_id", "neighbor_id"))
    val disagreements = joined
      .filter(col("ivf_cos") =!= col("cos")).count()
    assert(disagreements == 0)
    ivf.unpersist()
  }

  test("ann6 PQ: full result set, dense ranks, ADC distances " +
    "non-negative and monotone within each query") {
    val pq = ExtOps.queries("ann6_pq_adc")(spark, sf0001).collect()
    assert(pq.nonEmpty)
    pq.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq ==
        (1 to rs.length))
      val dists = byRank.map(_.getAs[Long]("adist_micros")).toSeq
      assert(dists.forall(_ >= 0L))
      assert(dists == dists.sorted)
      // self never returned as its own neighbor
      assert(rs.forall(r =>
        r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id")))
    }
    graft.operators.ManagedCache.releaseAll()
  }
}
