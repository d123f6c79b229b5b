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
    // NULL band keys never form a bucket: a null key can't equi-join
    // with anything (the candidate self-join drops it anyway), and a
    // left_anti exclusion never matches NULL — so counting nulls here
    // would report rows as "excluded" that the anti join in fact
    // keeps. Null-keyed rows are therefore ALWAYS kept and never
    // appear in the accounting frame.
    val sizes = banded.filter(col(bandCol).isNotNull)
      .groupBy(col(bandCol))
      .agg(count(lit(1)).as("bucket_n"))
    val overCap = sizes.filter(col("bucket_n") > cap)
    val safe = banded.join(broadcast(overCap.select(col(bandCol))),
      Seq(bandCol), "left_anti")
    (safe, overCap)
  }

  /** filterOverCap with the cap computed IN-PLAN as a discrete
    * quantile of the bucket-size distribution: keep buckets whose
    * size is at most `cap_n` = the smallest size s whose cumulative
    * bucket count reaches ceil(qNum/qDen · n_buckets); exclude
    * strictly-larger buckets. A fixed absolute cap cannot follow a
    * degree distribution that shifts with data scale (a cap that
    * bites at SF 0.1 excludes nothing — or everything — at SF 100);
    * the quantile form is scale-free and still fully deterministic:
    * the threshold is a pure VALUE cut (no tie-order dependence) and
    * the quantile rank is computed in exact integer arithmetic
    * (ceil(qNum·n/qDen) = (qNum·n + qDen − 1) div qDen), so an
    * external oracle replays it bit-for-bit.
    *
    * Shuffle shape: one aggregation over `banded` keyed by the
    * bucket (the same partitioning the caller's bucket join needs);
    * everything after is bucket-CENSUS-sized — the size histogram
    * (≤ distinct sizes rows) and its cdf via a broadcast ≤-join of
    * the histogram with itself — and the hot-bucket set joins back
    * as a broadcast anti join, so the quantile costs no extra
    * big-table shuffle.
    *
    * Returns (safe rows of `banded`, excluded `(bandCol, bucket_n)`
    * accounting frame, 1-row `(cap_n, n_buckets)` threshold frame).
    */
  def filterOverQuantile(banded: DataFrame, bandCol: String,
      qNum: Int, qDen: Int): (DataFrame, DataFrame, DataFrame) = {
    require(qNum > 0 && qDen > qNum,
      s"quantile must be a proper fraction, got $qNum/$qDen")
    // Same NULL contract as filterOverCap: null band keys are kept,
    // never counted — a null "bucket" would skew the quantile AND be
    // unexcludable by the anti join below (NULL never equi-matches),
    // making safe/hot accounting disagree.
    val sizes = banded.filter(col(bandCol).isNotNull)
      .groupBy(col(bandCol))
      .agg(count(lit(1)).as("bucket_n"))
    val hist = sizes.groupBy(col("bucket_n"))
      .agg(count(lit(1)).as("n_at"))
    val tot = sizes.agg(count(lit(1)).as("n_buckets"))
    val cdf = hist.as("h")
      .join(broadcast(hist.select(col("bucket_n").as("bn2"),
        col("n_at").as("na2"))), col("bn2") <= col("h.bucket_n"))
      .groupBy(col("h.bucket_n").as("bucket_n"))
      .agg(sum(col("na2")).as("cum"))
    val thr = cdf.crossJoin(broadcast(tot))
      .filter(col("cum") >= call_function("div",
        lit(qNum.toLong) * col("n_buckets") + lit((qDen - 1).toLong),
        lit(qDen.toLong)))
      .agg(min(col("bucket_n")).as("cap_n"))
      .crossJoin(broadcast(tot))
    val hot = sizes.crossJoin(broadcast(thr.select(col("cap_n"))))
      .filter(col("bucket_n") > col("cap_n"))
      .select(col(bandCol), col("bucket_n"))
    // NO broadcast hint on the hot set, unlike filterOverCap: the cap
    // variant's exclusion is |rows|/cap-bounded by construction, but
    // a quantile exclusion is ~(1-q)·n_buckets — q=1/2 on a billion
    // buckets would force-collect half of them to the driver. Let the
    // planner (AQE) pick: tight quantiles still broadcast dynamically,
    // loose ones degrade to a shuffled anti join instead of an OOM.
    val safe = banded.join(hot.select(col(bandCol)),
      Seq(bandCol), "left_anti")
    (safe, hot, thr)
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

  /** Representative-star routing for over-cap buckets — the
    * "different strategy" hot buckets degrade to instead of being
    * dropped. Within each excluded bucket, members are sub-grouped by
    * a fine discriminator (`discCol`, e.g. the FULL sketch signature
    * where the bucket key was one band of it) and each sub-group
    * emits STAR edges (min-id representative ↔ every other member):
    * linear in the bucket's membership where the quadratic self-join
    * the cap prevented was b·(b−1)/2, yet connectivity-equivalent for
    * dedup-closure consumers — any clique the all-pairs join would
    * have produced inside a sub-group is spanned by its star. Pairs
    * come back as `(id_a, id_b)` with id_a < id_b (the representative
    * is the group min), distinct across buckets/bands.
    *
    * Shuffle shape: hot-bucket rows are selected by a broadcast semi
    * join (the over-cap set is |rows|/cap-bounded), and the rep
    * aggregation + self-equi-join key on (bucket, discriminator) —
    * co-partitioned, never all-pairs.
    */
  def routeOverCapStar(banded: DataFrame, idCol: String,
      bandCol: String, discCol: String,
      overCap: DataFrame): DataFrame = {
    val hotRows = banded.join(broadcast(overCap.select(col(bandCol))),
      Seq(bandCol), "left_semi")
    val reps = hotRows.groupBy(col(bandCol), col(discCol))
      .agg(min(col(idCol)).as("__rep"))
    hotRows.join(reps, Seq(bandCol, discCol))
      .filter(col(idCol) =!= col("__rep"))
      .select(col("__rep").as("id_a"), col(idCol).as("id_b"))
      .distinct()
  }
}
