package graft.tools

/** Dev tool: warm-run a single registered query three times against a
  * testdata dir (`Probe <query_name> <sfDir>`) to separate execution
  * cost from session/planning overhead — Bench times each query once,
  * cold, which hides where the seconds actually go.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0); val dir = args(1)
    graft.Tables.names.foreach(n => graft.Tables.load(spark, dir, n).count())
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
