package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ParallelismSpec extends AnyFunSuite {
  private lazy val spark = graft.GraftSession
    .builder(master = "local[4]").getOrCreate()

  test("fanOut widens a narrow frame to defaultParallelism and " +
      "preserves the row multiset") {
    import spark.implicits._
    val narrow = (1 to 1000).toDF("x").coalesce(1)
    assert(Parallelism.planParts(narrow) == 1)
    val wide = Parallelism.fanOut(narrow)
    assert(Parallelism.planParts(wide) ==
      spark.sparkContext.defaultParallelism)
    assert(wide.agg(sum($"x"), count(lit(1))).head() ==
      narrow.agg(sum($"x"), count(lit(1))).head())
  }

  test("fanOut keyed form hash-partitions and is a no-op on an " +
      "already-wide frame") {
    import spark.implicits._
    val narrow = (1 to 100).map(i => (i % 7, i)).toDF("k", "x")
      .coalesce(1)
    val keyed = Parallelism.fanOut(narrow, col("k"))
    assert(Parallelism.planParts(keyed) ==
      spark.sparkContext.defaultParallelism)
    // same key → same partition: each k lands whole
    val spread = keyed
      .select(col("k"), org.apache.spark.sql.functions
        .spark_partition_id().as("p"))
      .distinct().groupBy(col("k")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(spread == 1L)
    val wide = narrow.repartition(16)
    assert(Parallelism.fanOut(wide) eq wide)
  }
}
