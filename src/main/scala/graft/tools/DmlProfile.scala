package graft.tools

import org.apache.spark.sql.functions._

/** Dev profiler for the snapshot-DML statement chain: replays xq43's
  * exact statement sequence with a wall timer per statement, twice
  * (cold + warm), so per-statement cost — not just per-query cost —
  * is visible. Usage: DmlProfile <sfDir>
  */
object DmlProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DmlProfile <sfDir>")
    val dir = args(0)
    val s = graft.GraftSession.builder().getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.operators.Snapshots
    // per-statement job accounting: how much of the wall was Spark
    // jobs (and how many), the rest being driver-side work
    val jobCount = new java.util.concurrent.atomic.AtomicLong
    val jobNanos = new java.util.concurrent.atomic.AtomicLong
    val jobStarts =
      new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStarts.put(j.jobId, System.nanoTime())
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = jobStarts.remove(j.jobId)
          if (t0 != 0L) {
            jobCount.incrementAndGet()
            jobNanos.addAndGet(System.nanoTime() - t0)
          }
        }
      })
    def timed[T](what: String)(f: => T): T = {
      jobCount.set(0); jobNanos.set(0)
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(50) // let job-end events drain
      println(f"[dml] $what%-28s $wall%6.2fs  jobs=${jobCount.get}%2d " +
        f"jobTime=${jobNanos.get / 1e9}%5.2fs")
      r
    }
    (1 to 2).foreach { round =>
      println(s"=== round $round ===")
      val base = graft.Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").cast("long").as("k"),
          pmod(col("l_orderkey"), lit(8)).cast("long").as("bucket"),
          col("l_quantity").cast("long").as("qty"))
        .repartition(col("bucket"))
      val tmp = System.getProperty("java.io.tmpdir", "/tmp")
      val store = new java.io.File(tmp,
        s"graft-dmlprof-${java.util.UUID.randomUUID()}").getAbsolutePath
      val hfs = new org.apache.hadoop.fs.Path(store)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      try {
        timed("commitWithStats") {
          Snapshots.commitWithStats(s, base, store,
            statsCols = Seq("k"), partitionByCols = Seq("bucket"))
        }
        timed("big deleteWhereMor") {
          Snapshots.deleteWhereMor(s, store, pmod(col("k"), lit(3)) === 0)
        }
        Seq(1L, 2L, 5L, 7L, 11L).foreach { kv =>
          timed(s"point delete k=$kv") {
            Snapshots.deleteWhereMor(s, store,
              col("k") === kv && col("bucket") === kv % 8)
          }
        }
        timed("final read+agg") {
          Snapshots.read(s, store)
            .agg(count(lit(1)).as("n"), sum(col("qty")).as("sq")).head()
        }
      } finally {
        hfs.delete(new org.apache.hadoop.fs.Path(store), true); ()
      }
    }
    s.stop()
  }
}
