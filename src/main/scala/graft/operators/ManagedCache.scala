package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Tracked persistence for intra-query working sets (sketch tables,
  * range-partitioned frames) that are read more than once inside ONE
  * query's DAG. A bare `.cache()` in a query builder leaks one cached
  * copy per invocation for the lifetime of the session (CacheManager
  * entries are never GC'd) — a harness that runs the query repeatedly
  * (Bench) accumulates them. The real fix is the REGISTRY: every
  * persist is tracked so the driver releases everything with one
  * [[releaseAll]] once the consuming action has drained. The
  * StorageLevel parameter (MEMORY_AND_DISK default, same as
  * `Dataset.cache()`) is there so corpus-sized frames can opt down to
  * DISK_ONLY explicitly.
  */
object ManagedCache {

  private val persisted =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Persist `df` at `level` and track it for [[releaseAll]]. If the
    * plan is ALREADY cached (Dataset.storageLevel consults the
    * session CacheManager by plan, not by Dataset identity), the
    * persist call itself is skipped: re-persisting a cached plan only
    * logs CacheManager's "Asked to cache already cached data" and
    * re-registers churn — and the frame is NOT re-tracked either
    * (tracking is only for caches this registry itself created):
    *  - a plan cached through an untracked bare `.cache()` belongs to
    *    whoever cached it — adopting it would let a process-global
    *    releaseAll drop a frame another component deliberately pinned
    *    for session lifetime (pass `adopt = true` to opt in when the
    *    caller KNOWS it owns the foreign cache);
    *  - a plan this registry already persisted is already queued —
    *    re-adding it each call would grow the queue without bound in
    *    a persist-per-iteration loop.
    * A storage-level mismatch — the existing cache holds a different
    * level than the caller asked for — is surfaced with a WARN rather
    * than silently honored, because the cheaper level (e.g.
    * MEMORY_ONLY when MEMORY_AND_DISK was requested) can evict under
    * pressure where the requested one would have spilled.
    */
  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
      adopt: Boolean = false): DataFrame = {
    val existing = df.storageLevel
    if (existing == StorageLevel.NONE) {
      df.persist(level)
      persisted.add(df)
    } else {
      if (existing != level)
        log.warn(s"plan already cached at $existing; requested $level " +
          "is NOT applied (Spark caches are keyed by plan) — the " +
          "existing level stays in effect until releaseAll")
      if (adopt && !persisted.contains(df)) persisted.add(df)
    }
    df
  }

  /** Unpersist every tracked frame. Call ONLY once the actions
    * consuming the dependent results have completed. For most frames
    * an undrained result merely recomputes (slower but correct), but
    * NOT for [[PrefixSum]]: its persisted range-partitioned frame pins
    * the sampled partition layout that its collected per-partition
    * offsets were computed against — a recompute re-runs the range
    * sampling, and over a nondeterministic input the new layout can
    * diverge from the offsets, silently corrupting prefix values. The
    * registry is also process-global: releaseAll from one component
    * drops frames a concurrently-running query still pins. Current
    * call sites (Bench/Verify/PlanAudit) release strictly between
    * queries, after the consuming action; keep that discipline.
    *
    * The unpersist BLOCKS until the blocks are actually dropped: the
    * earlier async release let block removal race the NEXT query's
    * re-persist of the same plan — CacheManager re-registered the
    * entry while the executor-side drop was still in flight ("Asked
    * to cache already cached data"), and back-to-back bench passes of
    * cache-heavy queries (xg1) degraded 2.8→10.3 s pass-to-pass
    * under the orphaned half-dropped blocks. A between-queries pause
    * is exactly where a deterministic memory floor is worth the
    * synchronous wait. */
  def releaseAll(): Unit = {
    var df = persisted.poll()
    while (df != null) {
      df.unpersist(blocking = true)
      df = persisted.poll()
    }
  }
}
