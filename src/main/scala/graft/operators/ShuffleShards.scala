package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SimilarityFunctions.md5hash60

/** Deterministic global shuffle + fixed sharding for training-data
  * export — the step between a curated corpus and the data loader.
  * Training wants documents in a reproducible pseudo-random order,
  * split into a fixed number of shards a loader fleet can claim
  * independently (the WebDataset/tfrecord consumption pattern), and
  * it wants the SAME corpus + salt to produce the SAME shards on any
  * cluster, any partition count, any day: resumable runs, debuggable
  * loss spikes ("what was in shard 17 around step 40k?"), and
  * splits that never depend on Spark's physical parallelism.
  *
  * Both decisions are pure Column arithmetic on the oracle-portable
  * md5-60 hash (`functions/SimilarityFunctions.md5hash60` — any
  * engine with md5() replays them bit-for-bit):
  *   shard(id)  = md5_60("<salt>:<id>")  mod numShards
  *   order(id)  = md5_60("<salt>:o:<id>")  (ties by id)
  * One shuffle (repartition on the shard id), an in-task sort, no
  * driver state — at 100 TB this is a single pass whose layout is
  * identical from 32 cores to 1000 executors.
  */
object ShuffleShards {

  /** The shuffled-and-sharded plan: input rows tagged with `_shard`
    * and `_ord`, physically clustered one-task-per-shard and sorted
    * in the deterministic within-shard order. */
  def shardPlan(df: DataFrame, idCol: String, numShards: Int,
      salt: String = "shard"): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    // the two managed columns must not silently overwrite user data
    // (mirrors SnapshotLogSource's _version guard): a corpus that
    // already owns _shard/_ord would be corrupted by withColumn, and
    // the determinism contract ("same corpus + salt ⇒ same shards")
    // would silently change meaning
    require(!df.columns.contains("_shard") && !df.columns.contains("_ord"),
      "shardPlan: input already has a _shard or _ord column — " +
        "these names are managed by the shard export; rename them")
    val id: Column = col(idCol).cast("string")
    df.withColumn("_shard",
        pmod(md5hash60(concat(lit(s"$salt:"), id)), lit(numShards)))
      .withColumn("_ord", md5hash60(concat(lit(s"$salt:o:"), id)))
      .repartition(numShards, col("_shard"))
      .sortWithinPartitions(col("_shard"), col("_ord"), col(idCol))
  }

  /** Write the corpus as `_shard=N` directories (one file per shard:
    * each shard is one task after the repartition), rows inside each
    * file in the deterministic order. Returns the per-shard census
    * (shard, rows) read back from the written tree. */
  def writeShards(spark: SparkSession, df: DataFrame, idCol: String,
      outDir: String, numShards: Int,
      salt: String = "shard"): DataFrame = {
    shardPlan(df, idCol, numShards, salt)
      .write.mode("overwrite").partitionBy("_shard").parquet(outDir)
    spark.read.parquet(outDir)
      .groupBy(col("_shard")).agg(count(lit(1)).as("rows"))
      .orderBy(col("_shard"))
  }
}
