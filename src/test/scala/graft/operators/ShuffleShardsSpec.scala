package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic shuffle-shard export: same corpus + salt = same
  * shards and same within-shard order at ANY parallelism; the written
  * tree is one file per shard with rows physically in the
  * deterministic order.
  */
class ShuffleShardsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("shard assignment and order are parallelism-independent and " +
    "salt-sensitive") {
    val ids = (0L until 500L).map(Tuple1(_)).toDF("doc_id")
    def vector(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      ShuffleShards.shardPlan(df, "doc_id", 8)
        .select("doc_id", "_shard", "_ord").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val a = vector(ids.repartition(1))
    val b = vector(ids.repartition(13))
    assert(a == b, "shard/order vector depends on physical layout")
    // a different salt reshuffles
    val c = ShuffleShards.shardPlan(ids, "doc_id", 8, salt = "other")
      .select("doc_id", "_shard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(c != a.map(t => (t._1, t._2)), "salt had no effect")
    // every shard is populated and roughly balanced (hash uniformity)
    val sizes = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.keySet == (0L until 8L).toSet)
    assert(sizes.values.min > 30 && sizes.values.max < 100, sizes)
  }

  test("writeShards lands one file per shard with rows in the " +
    "deterministic order; a rewrite is identical") {
    val dir = freshDir("graft-shards")
    val docs = (0L until 300L).map(k => (k, s"text-$k")).toDF("doc_id", "text")
    val census = ShuffleShards.writeShards(spark, docs, "doc_id",
      dir, numShards = 4).collect().map(r =>
      (r.getAs[Number](0).longValue, r.getLong(1))).toSeq
    assert(census.map(_._2).sum == 300L && census.size == 4)
    val f = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    (0 until 4).foreach { sh =>
      val files = f.listStatus(
        new org.apache.hadoop.fs.Path(s"$dir/_shard=$sh"))
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
          && !s.getPath.getName.startsWith("."))
      assert(files.length == 1, s"shard $sh has ${files.length} files")
      // within-file physical order == the deterministic (_ord, id) order
      val rows = spark.read.parquet(files.head.getPath.toString)
        .select("doc_id", "_ord").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.sortBy(t => (t._2, t._1)).toSeq == rows.toSeq,
        s"shard $sh rows not in deterministic order")
    }
    // full rewrite reproduces the same per-shard id sequences
    val dir2 = freshDir("graft-shards2")
    ShuffleShards.writeShards(spark, docs.repartition(7), "doc_id",
      dir2, numShards = 4)
    def seqs(d: String) = (0 until 4).map { sh =>
      spark.read.parquet(s"$d/_shard=$sh").select("doc_id")
        .collect().map(_.getLong(0)).toSeq
    }
    assert(seqs(dir) == seqs(dir2))
  }

  test("an input corpus that already owns _shard or _ord is refused " +
    "loudly — the managed columns never overwrite user data") {
    import spark.implicits._
    val withShard = Seq((1L, 9L)).toDF("doc_id", "_shard")
    val e1 = intercept[IllegalArgumentException] {
      ShuffleShards.shardPlan(withShard, "doc_id", 4)
    }
    assert(e1.getMessage.contains("_shard"))
    val withOrd = Seq((1L, 9L)).toDF("doc_id", "_ord")
    val e2 = intercept[IllegalArgumentException] {
      ShuffleShards.shardPlan(withOrd, "doc_id", 4)
    }
    assert(e2.getMessage.contains("_ord"))
  }
}
