package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TrailingAgg must emit EXACTLY the values of
  * `Window.partitionBy(keys).orderBy(us).rangeBetween(-W, 0)` —
  * differential against both the raw window and SaltedWindow on the
  * frames where the boundary conventions bite: peers at the same
  * timestamp, rows exactly W apart (lower bound inclusive), key
  * changes adjacent in the global order, and negative times.
  */
class TrailingAggSpec extends SparkSpec {
  import spark.implicits._

  private val W = 100L

  private def frame(rows: Seq[(Long, String, Long, Long)]): DataFrame =
    rows.toDF("id", "k", "us", "x")

  private def viaWindow(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("k").orderBy("us")
      .rangeBetween(-W, Window.currentRow)
    df.select(col("id"), col("k"), col("x"),
      count(lit(1)).over(w).as("n"),
      sum(col("x")).over(w).as("s"),
      sum(col("x") * col("x")).over(w).as("q"))
  }

  private def viaTrailing(df: DataFrame): DataFrame =
    TrailingAgg.countSumSq(df, Seq("k"), "us", "id", "x", W,
      carry = Seq("x"))
      .select(col("id"), col("k"), col("x"), col("n"), col("s"),
        col("q"))

  private def diff(df: DataFrame): Unit = {
    val a = viaWindow(df).orderBy("id").collect().toSeq
    val b = viaTrailing(df).orderBy("id").collect().toSeq
    assert(a == b, s"window:\n${a.mkString("\n")}\n" +
      s"trailing:\n${b.mkString("\n")}")
  }

  test("boundary inclusivity: a row exactly W earlier is IN the frame") {
    diff(frame(Seq((1L, "a", 0L, 5L), (2L, "a", W, 7L),
      (3L, "a", W + 1, 1L))))
  }

  test("peers: all rows at the same timestamp see each other") {
    diff(frame(Seq((1L, "a", 50L, 1L), (2L, "a", 50L, 2L),
      (3L, "a", 50L, 4L), (4L, "a", 149L, 8L), (5L, "a", 151L, 16L))))
  }

  test("key isolation: adjacent keys in the global order never bleed") {
    diff(frame(Seq((1L, "a", 10L, 100L), (2L, "b", 10L, 3L),
      (3L, "b", 11L, 5L), (4L, "c", 10L, 7L))))
  }

  test("negative and straddle-zero timestamps") {
    diff(frame(Seq((1L, "a", -150L, 1L), (2L, "a", -60L, 2L),
      (3L, "a", -50L, 4L), (4L, "a", 0L, 8L), (5L, "a", 40L, 16L))))
  }

  test("randomized differential, dense ties, two keys") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 400L).map(i =>
      (i, if (rnd.nextBoolean()) "a" else "b",
        rnd.nextInt(300).toLong, rnd.nextInt(50).toLong))
    diff(frame(rows))
  }

  test("null values: all-null frames yield NULL sums (not 0), " +
    "mixed frames skip nulls — exactly the window form") {
    val df = Seq[(Long, String, Long, Option[Long])](
      // key 'a': x null everywhere → s/q NULL on every row, n counts
      (1L, "a", 10L, None), (2L, "a", 40L, None),
      // key 'b': null-prefix, then values, then a null inside the
      // frame (must not advance s/q but must count in n)
      (3L, "b", 0L, None), (4L, "b", 50L, Some(5L)),
      (5L, "b", 90L, None), (6L, "b", 120L, Some(7L)),
      // key 'c': value falls OUT of the frame, frame becomes all-null
      (7L, "c", 0L, Some(9L)), (8L, "c", 200L, None))
      .toDF("id", "k", "us", "x")
    val a = viaWindow(df).orderBy("id").collect().toSeq
    val b = viaTrailing(df).orderBy("id").collect().toSeq
    assert(a == b, s"window:\n${a.mkString("\n")}\n" +
      s"trailing:\n${b.mkString("\n")}")
    // pin the semantics directly, not just differentially
    val r8 = b.last
    assert(r8.getLong(3) == 1L && r8.isNullAt(4) && r8.isNullAt(5),
      s"all-null frame must have n=1, s=NULL, q=NULL: $r8")
  }

  test("agrees with SaltedWindow.trailing on the same frame") {
    val rnd = new scala.util.Random(7)
    val df = frame((1L to 300L).map(i =>
      (i, "hot", rnd.nextInt(1000).toLong, rnd.nextInt(9).toLong)))
    val sw = SaltedWindow.trailing(df, Seq("k"), "us", W)(w => Seq(
        count(lit(1)).over(w).as("n"),
        sum(col("x")).over(w).as("s"),
        sum(col("x") * col("x")).over(w).as("q")))
      .select(col("id"), col("k"), col("x"), col("n"), col("s"),
        col("q")).orderBy("id").collect().toSeq
    val ta = viaTrailing(df).orderBy("id").collect().toSeq
    assert(sw == ta)
  }
}
