package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-bucket capping for LSH-style band joins.
  *
  * A band-bucket self-join is quadratic PER BUCKET: a pathological
  * bucket (boilerplate shingles, near-identical templated docs) with
  * b members yields b·(b-1)/2 candidate pairs before any verification
  * filter runs — one 100k-doc bucket is 5·10⁹ candidates on a single
  * key, a guaranteed straggler task at 100 TB no matter how cheap the
  * verify conjuncts are. The cap bounds that: buckets with more than
  * `cap` members are EXCLUDED from the join and returned as an
  * explicit accounting frame — never silently dropped. Callers
  * surface the accounting in their output (dd10 emits
  * n_hot_buckets/hot_docs, oracle-pinned to zero at test SFs) or
  * route over-cap buckets to a different strategy (e.g. exact
  * clustering on the bucket's members).
  *
  * Shuffle shape: the bucket-size aggregation partitions by the SAME
  * key as the candidate self-join, so the exchange is reusable, and
  * the over-cap set is at most |rows|/cap buckets — broadcast-sized
  * by construction, so the exclusion is a broadcast anti join, not
  * another shuffle of the big table.
  */
object HotBuckets {

  /** The rows of `banded` whose bucket has at most `cap` members,
    * plus the excluded buckets' `(bandCol, bucket_n)` accounting
    * frame. Use directly when the self-join must carry extra columns
    * (e.g. a signature for in-join verification) — the join itself
    * stays the caller's.
    */
  def filterOverCap(banded: DataFrame, bandCol: String,
      cap: Int): (DataFrame, DataFrame) = {
    require(cap > 1, s"cap must exceed 1, got $cap")
    val sizes = banded.groupBy(col(bandCol))
      .agg(count(lit(1)).as("bucket_n"))
    val overCap = sizes.filter(col("bucket_n") > cap)
    val safe = banded.join(broadcast(overCap.select(col(bandCol))),
      Seq(bandCol), "left_anti")
    (safe, overCap)
  }

  /** Candidate pairs `(id_a, id_b)` (id_a < id_b, distinct) from a
    * bucket-membership table, joining only within buckets of at most
    * `cap` members. Returns (candidates, overCap) where overCap is
    * the excluded buckets' `(bandCol, bucket_n)` accounting frame.
    */
  def cappedCandidates(banded: DataFrame, idCol: String,
      bandCol: String, cap: Int): (DataFrame, DataFrame) = {
    val (safe, overCap) = filterOverCap(banded, bandCol, cap)
    val cand = safe.as("a").join(safe.as("b"),
        col(s"a.$bandCol") === col(s"b.$bandCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    (cand, overCap)
  }
}
