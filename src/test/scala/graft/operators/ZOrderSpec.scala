package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: correctness of the Morton key, and the pruning
  * property that justifies it — a selective predicate on the SECOND
  * dimension skips most files under Z-order layout but no files under
  * single-column-sorted layout.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave2 matches hand-computed Morton codes") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("x", "y")
      .select(ZOrder.interleave2($"x", $"y", 4).as("z"))
      .collect().map(_.getLong(0))
    // (5,3): x bits 1,0,1,0 at even positions 0,2,4,6 -> 1 + 16;
    //        y bits 1,1,0,0 at odd positions 1,3,5,7 -> 2 + 8; z = 27
    assert(rows.toSeq == Seq(0L, 1L, 2L, 3L, 27L))
  }

  test("interleave3 matches hand-computed 3-way Morton codes and " +
    "is a bijection on the cube") {
    val rows = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L),
      (0L, 0L, 1L), (1L, 1L, 1L), (5L, 3L, 2L))
      .toDF("x", "y", "w")
      .select(ZOrder.interleave3($"x", $"y", $"w", 4).as("z"))
      .collect().map(_.getLong(0))
    // (5,3,2): x bits 1,0,1,0 at 0,3,6,9 -> 1 + 64;
    //          y bits 1,1,0,0 at 1,4,7,10 -> 2 + 16;
    //          w bits 0,1,0,0 at 2,5,8,11 -> 32; z = 115
    assert(rows.toSeq == Seq(0L, 1L, 2L, 4L, 7L, 115L))
    // bijection over the full 8x8x8 cube
    val n = spark.range(512)
      .select(($"id" % 8).as("x"), (($"id" / 8) % 8).cast("long").as("y"),
        ($"id" / 64).cast("long").as("w"))
      .select(ZOrder.interleave3($"x", $"y", $"w", 3).as("z"))
      .distinct().count()
    assert(n == 512L)
  }

  test("quantize clamps to [0, 2^bits)") {
    val q = Seq(-1.0, 0.0, 50.0, 100.0, 200.0).toDF("v")
      .select(ZOrder.quantize($"v", 0.0, 100.0, 4).as("q"))
      .collect().map(_.getLong(0))
    assert(q.forall(x => x >= 0 && x < 16))
    assert(q(0) == 0 && q(4) == 15)
  }

  test("z-order layout prunes on the second dimension; x-sort does not") {
    // uniform 64x64 grid of points
    val pts = spark.range(4096)
      .select(($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))
    val zDir = "/tmp/graft_test_zorder/z"
    val xDir = "/tmp/graft_test_zorder/x"
    ZOrder.writeZOrdered(pts, "x", "y", zDir, numFiles = 16)
    pts.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(xDir)

    // per-file y ranges, as a parquet reader's min/max stats would see
    def filesMatchingYSlice(dir: String): (Long, Long) = {
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min($"y").as("y0"), max($"y").as("y1"))
      val total = stats.count()
      // slice y in [8, 11] — 1/16th of the y domain
      val matching = stats.filter($"y0" <= 11 && $"y1" >= 8).count()
      (matching, total)
    }
    val (zMatch, zTotal) = filesMatchingYSlice(zDir)
    val (xMatch, xTotal) = filesMatchingYSlice(xDir)
    assert(zTotal == 16 && xTotal == 16)
    // x-sorted files all span the full y domain — nothing prunes
    assert(xMatch == xTotal, s"x-sort unexpectedly pruned: $xMatch")
    // z-ordered files cover y locally — at least half must prune
    assert(zMatch * 2 <= zTotal,
      s"z-order pruned too little: $zMatch of $zTotal files match")
    // layout must not lose or duplicate rows
    assert(spark.read.parquet(zDir).count() == 4096)
  }
}
