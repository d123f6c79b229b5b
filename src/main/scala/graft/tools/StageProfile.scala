package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev profiler: run ONE registered query warm and print every
  * stage's wall time, task count, and the max/median task time — the
  * fastest way to spot a single-task stage (an unsplittable one-file
  * scan absorbing all the per-row compute) or a straggler without the
  * Spark UI, which the bench environment keeps disabled.
  *
  *   StageProfile <queryName> [sfDir]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = (if (args.length > 1) Some(args(1)) else sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(sys.error("pass <sfDir> or set SPARK_GRAFT_SF_DIR"))
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.names.foreach(n =>
      graft.Tables.load(spark, dir, n).count())
    val fn = graft.SparkEntry.queries(name)
    fn(spark, dir).count() // warm pass: codegen + footer caches
    graft.operators.ManagedCache.releaseAll()
    // (stageId, name, tasks, wallMs, maxTaskMs, sumTaskMs)
    val stages =
      mutable.ArrayBuffer[(Int, String, Int, Long, Long, Long)]()
    val taskMs = mutable.Map[Int, mutable.ArrayBuffer[Long]]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        taskMs.getOrElseUpdate(t.stageId, mutable.ArrayBuffer.empty) +=
          t.taskInfo.duration
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {
          a <- si.completionTime; b <- si.submissionTime
        } yield a - b).getOrElse(0L)
        val ts = taskMs.getOrElse(si.stageId, mutable.ArrayBuffer(0L))
        // the scheduler-level stage name is always the collect
        // callsite; the RDD scopes name the OPERATORS the stage runs
        val ops = si.rddInfos.sortBy(_.id).flatMap(_.scope)
          .map(_.name).distinct.mkString(">")
        stages += ((si.stageId,
          ops.take(90), si.numTasks, wall, ts.max, ts.sum))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    graft.operators.ManagedCache.releaseAll()
    Thread.sleep(500)
    println(f"[stageprofile] $name total=$dt%.2fs stages=${stages.size}%d")
    stages.sortBy(-_._4).take(40).foreach {
      case (id, nm, nt, wall, mx, sum) =>
        println(f"[stage] $id%4d wall=$wall%6dms tasks=$nt%4d " +
          f"maxTask=$mx%6dms sumTask=$sum%7dms  $nm")
    }
    spark.stop()
  }
}
