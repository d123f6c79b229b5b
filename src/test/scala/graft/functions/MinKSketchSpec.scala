package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** MinKSketch = the k smallest DISTINCT values, regardless of input
  * order, duplication, or partitioning — checked against a brute-force
  * sorted-distinct reference on seeded random data, plus the KMV
  * estimator identities the xs7 query builds on.
  */
class MinKSketchSpec extends SparkSpec {
  import spark.implicits._

  test("sketch equals brute-force k smallest distinct, any partitioning") {
    val rnd = new Random(42)
    // heavy duplication (values mod 500) so dedup is load-bearing
    val vals = Seq.fill(5000)(rnd.nextLong(1L << 40) % 500 + 1000)
    val expected = vals.distinct.sorted.take(64)
    for (parts <- Seq(1, 7)) {
      val df = vals.toDF("h").repartition(parts)
      val got = df.agg(MinKSketch(col("h"), 64).as("sk"))
        .head().getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("groups smaller than k return the whole distinct set, sorted") {
    val df = Seq(("a", 5L), ("a", 3L), ("a", 5L), ("a", 9L), ("b", 1L))
      .toDF("g", "h")
    val got = df.groupBy(col("g"))
      .agg(MinKSketch(col("h"), 64).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") == Seq(3L, 5L, 9L))
    assert(got("b") == Seq(1L))
  }

  test("union-of-sketches k-min equals sketch of union (KMV closure)") {
    val rnd = new Random(7)
    val a = Seq.fill(2000)(rnd.nextLong(1L << 50))
    val b = Seq.fill(2000)(rnd.nextLong(1L << 50))
    val skA = a.toDF("h").agg(MinKSketch(col("h"), 64)).head().getSeq[Long](0)
    val skB = b.toDF("h").agg(MinKSketch(col("h"), 64)).head().getSeq[Long](0)
    val fromSketches = (skA ++ skB).distinct.sorted.take(64)
    val direct = (a ++ b).distinct.sorted.take(64)
    assert(fromSketches == direct)
  }
}
