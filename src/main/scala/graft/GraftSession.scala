package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration — the
  * one place the scale knobs live, documented per setting. `local[N]`
  * for tests/bench; on a cluster the same settings apply with
  * shuffle.partitions sized to ~2-3× total cores (or left to AQE
  * coalescing).
  *
  * WARNING: `getOrCreate` returns any pre-existing session UNCHANGED —
  * builder confs (including the extensions that register `cosine_sim`)
  * are silently dropped. Embedders with an existing session should set
  * `spark.sql.extensions=graft.expressions.GraftExtensions` at session
  * creation, or call `CosineSimilarity.register(spark)` explicitly.
  */
object GraftSession {

  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
      shufflePartitions: Option[Int] = None): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      // match parallelism, not the 200 default — at 100 TB, size so a
      // post-shuffle partition is 100-500 MB (AQE coalescing handles
      // the rest)
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.getOrElse(
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt).toString)
      // AQE: runtime re-plan — skew-join splitting + partition
      // coalescing are the safety net under data we didn't profile
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // AQE sizes post-shuffle partitions by BYTES
      // (parallelismFirst targets bytes/parallelism but floors at
      // minPartitionSize = 1 MB), which is blind to compute density:
      // a 1-2 MB exchange of candidate-pair ids feeding an
      // array-intersect verification join coalesces to ONE task and
      // serializes seconds of per-row compute (measured in
      // dd10/dd20). 64 KB keeps such compute-dense small shuffles at
      // session parallelism; at scale shuffles are GB-sized and the
      // floor never binds, so this is not a local-only tuning — it
      // only moves stages whose bytes are trivial either way.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "64k")
      // 128 MB scan splits: parquet row-group sized, keeps task count
      // proportional to data volume
      .config("spark.sql.files.maxPartitionBytes", 128 * 1024 * 1024L)
      // determinism contract: all timestamps UTC (F2's 'localtime' is
      // an explicit Views parameter instead)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is INT64 TIMESTAMP(NANOS) parquet — read as raw
      // long (Tables.load converts to µs). Baked in at session build:
      // Tables.load's runtime conf.set alone races with concurrent
      // schema inference threads that snapshot SQLConf before it runs
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // native expressions available in SQL everywhere
      .config("spark.sql.extensions",
        "graft.expressions.GraftExtensions")

  def create(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
