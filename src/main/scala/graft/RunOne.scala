package graft

/** Dev harness: run ONE `SparkEntry.queries` entry by name against a
  * sf dir, time N passes, optionally print the formatted plan.
  *
  *   java … graft.RunOne <queryName> [sfDir] [passes] [explain]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = (if (args.length > 1) Some(args(1)) else sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(sys.error("pass <sfDir> or set SPARK_GRAFT_SF_DIR"))
    val passes = if (args.length > 2) args(2).toInt else 3
    val explain = args.contains("explain")
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (explain) fn(spark, sfDir).explain("formatted")
    (1 to passes).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.operators.ManagedCache.releaseAll()
      println(f"[runone] $name pass $i: $dt%.2fs ($n rows)")
    }
    spark.stop()
  }
}
