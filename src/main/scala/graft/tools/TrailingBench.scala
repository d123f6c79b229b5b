package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness: time the two trailing-moments implementations —
  * SaltedWindow (sliding range frame, O(n·w̄) per-row re-aggregation)
  * vs TrailingAgg (boundary-marker prefix sums, O(n log n)) — on the
  * same events frame, asserting identical anomaly counts. Used for
  * the ROUNDLOG crossover table.
  *
  *   java … graft.tools.TrailingBench <sfDir> [passes]
  */
object TrailingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(sys.error("pass <sfDir> or set SPARK_GRAFT_SF_DIR"))
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val W = 86400L * 1000000L

    def ev = graft.Tables.load(spark, sfDir, "events")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("x", round(col("value") * 100).cast("long"))
      .select(col("event_id"), col("event_type"), col("us"), col("x"))

    def finish(df: org.apache.spark.sql.DataFrame): Long = {
      val n = df.filter(col("n") >= 10)
        .withColumn("dev",
          col("n").cast("decimal(38,0)") * col("x") - col("s"))
        .filter(col("dev") * col("dev") >
          lit(9L).cast("decimal(38,0)") *
            (col("n").cast("decimal(38,0)") * col("q") -
              col("s").cast("decimal(38,0)") * col("s")))
        .count()
      graft.operators.ManagedCache.releaseAll()
      n
    }

    var nSalted = -1L; var nPrefix = -1L
    (1 to passes).foreach { i =>
      val t0 = System.nanoTime()
      nSalted = finish(graft.operators.SaltedWindow.trailing(
        ev, Seq("event_type"), "us", W)(w => Seq(
          count(lit(1)).over(w).as("n"),
          sum(col("x")).over(w).as("s"),
          sum(col("x") * col("x")).over(w).as("q"))))
      val tS = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      nPrefix = finish(graft.operators.TrailingAgg.countSumSq(
        ev, Seq("event_type"), "us", "event_id", "x", W,
        carry = Seq("x")))
      val tP = (System.nanoTime() - t1) / 1e9
      println(f"[trailing] pass $i: salted_window=$tS%.2fs " +
        f"prefix_sum=$tP%.2fs anomalies=$nSalted/$nPrefix")
    }
    require(nSalted == nPrefix,
      s"implementations disagree: $nSalted vs $nPrefix")
    spark.stop()
  }
}
