package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once change-feed mirroring (Snapshots.mirrorAppends): the
  * destination's epoch fence is the consumer offset, so every crash
  * point — before a commit, between rename and publish, after
  * publish — replays to the same destination state, and a vacuumed
  * source gap fails loudly instead of silently dropping a batch.
  */
class MirrorSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def batch(lo: Long, hi: Long): DataFrame =
    (lo until hi).map(k => (k, s"s$k")).toDF("k", "s")

  test("mirror catches up version by version, is idempotent when " +
    "caught up, and picks up only new versions after") {
    val src = freshDir("graft-msrc")
    val dst = freshDir("graft-mdst")
    Snapshots.commit(spark, batch(0, 10), src)
    Snapshots.commit(spark, batch(10, 25), src)
    val done = Snapshots.mirrorAppends(spark, src, dst,
      _.filter(col("k") % 2 === 0))
    assert(done == Seq(1L, 2L))
    assert(Snapshots.lastEpoch(spark, dst).contains(2L))
    // the destination is an append LOG — totals via the ranged replay
    assert(Snapshots.readAppendsSince(spark, dst, 0L).count() == 13,
      "evens in [0,25)")
    // caught up: nothing to do, destination unchanged
    assert(Snapshots.mirrorAppends(spark, src, dst,
      _.filter(col("k") % 2 === 0)).isEmpty)
    assert(Snapshots.latestVersion(spark, dst) == 2L)
    // one new source version → exactly one new mirror commit
    Snapshots.commit(spark, batch(25, 31), src)
    val more = Snapshots.mirrorAppends(spark, src, dst,
      _.filter(col("k") % 2 === 0))
    assert(more == Seq(3L))
    assert(Snapshots.readAppendsSince(spark, dst, 0L).count() == 16)
  }

  test("a crash mid-run resumes exactly-once: committed batches are " +
    "fenced out, the failed one re-commits") {
    val src = freshDir("graft-mcsrc")
    val dst = freshDir("graft-mcdst")
    Snapshots.commit(spark, batch(0, 5), src)
    Snapshots.commit(spark, batch(5, 9), src)
    Snapshots.commit(spark, batch(9, 14), src)
    // the "consumer" dies while transforming source v2: v1 is already
    // committed downstream
    var calls = 0
    val boom = intercept[RuntimeException] {
      Snapshots.mirrorAppends(spark, src, dst, { df =>
        calls += 1
        if (calls == 2) throw new RuntimeException("consumer crash")
        df
      })
    }
    assert(boom.getMessage == "consumer crash")
    assert(Snapshots.lastEpoch(spark, dst).contains(1L))
    // retry: v1 is fenced (not re-applied), v2 and v3 commit once
    val resumed = Snapshots.mirrorAppends(spark, src, dst)
    assert(resumed == Seq(2L, 3L))
    val ks = Snapshots.readAppendsSince(spark, dst, 0L)
      .select("k").collect().map(_.getLong(0)).sorted
    assert(ks.toSeq == (0L until 14L), "duplicate or lost rows")
  }

  test("a vacuumed source gap fails loudly instead of skipping") {
    val src = freshDir("graft-mvsrc")
    val dst = freshDir("graft-mvdst")
    Snapshots.commit(spark, batch(0, 5), src)
    Snapshots.commit(spark, batch(5, 9), src)
    Snapshots.commit(spark, batch(9, 14), src)
    Snapshots.vacuum(spark, src, keepLast = 1)
    val e = intercept[IllegalStateException] {
      Snapshots.mirrorAppends(spark, src, dst)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("restore reinstates an old version as a NEW commit: linear " +
    "history, sidecars carried, epoch markers dropped") {
    val dir = freshDir("graft-restore")
    Snapshots.commitWithStats(spark, batch(0, 10), dir,
      statsCols = Seq("k"), bloomCols = Seq("k"))
    Snapshots.commit(spark, batch(0, 3), dir)    // the "bad" overwrite
    val nv = Snapshots.restore(spark, dir, 1L)
    assert(nv == 3L && Snapshots.latestVersion(spark, dir) == 3L)
    assert(Snapshots.read(spark, dir).count() == 10L)
    // the bad version stays time-travelable
    assert(Snapshots.read(spark, dir, 2L).count() == 3L)
    // sidecars came along: pruning + point lookup work on v3
    val (_, ps) = Snapshots.readPruned(spark, dir, "k", 0, 0, 3L)
    assert(ps.filesRead + ps.filesSkipped > 0)
    val (_, bl) = Snapshots.readPointLookup(spark, dir, "k", "5", 3L)
    assert(bl.filesRead >= 1)
    // restoring an epoch-marked version drops the marker: the fence
    // must not see the restored commit as that epoch
    val d2 = freshDir("graft-restep")
    assert(Snapshots.commitWithEpoch(spark, batch(0, 4), d2, 1L).isRight)
    assert(Snapshots.commitWithEpoch(spark, batch(4, 8), d2, 2L).isRight)
    Snapshots.restore(spark, d2, 1L)
    assert(Snapshots.lastEpoch(spark, d2).contains(2L))
  }

  test("batches conform to the source's latest schema before the " +
    "transform — old versions replay with typed NULLs") {
    val src = freshDir("graft-messrc")
    val dst = freshDir("graft-mesdst")
    Snapshots.commit(spark, (0L until 4L).map(k => (k, s"s$k"))
      .toDF("k", "s"), src)
    Snapshots.commit(spark, (4L until 8L).map(k => (k, s"s$k", k * 10))
      .toDF("k", "s", "extra"), src)
    Snapshots.mirrorAppends(spark, src, dst)
    val rows = Snapshots.read(spark, dst, 1).select("k", "extra")
      .collect()
    assert(rows.forall(_.isNullAt(1)),
      "v1 batch must carry a typed NULL for the added column")
    assert(Snapshots.read(spark, dst, 2)
      .select("extra").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(40L, 50L, 60L, 70L))
  }
}
