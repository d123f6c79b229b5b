package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: sweep EVERY registered query's physical plan for the
  * scale anti-patterns (true cartesian products, single-partition
  * exchanges) and print the offenders — the whole-registry version
  * of PlanAudit's per-query report. `PlanShapeSpec`'s global guard
  * runs the same sweep with the documented whitelist.
  */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(sys.error("pass <sfDir> or set SPARK_GRAFT_SF_DIR"))
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach {
      case (name, fn) =>
        try {
          val p = fn(spark, dir).queryExecution
            .explainString(ExplainMode.fromString("formatted"))
          val cart = p.contains("CartesianProduct")
          val sp = p.contains("Exchange SinglePartition")
          if (cart || sp)
            println(s"$name cartesian=$cart singlePartition=$sp")
        } catch {
          case e: Throwable =>
            println(s"$name ERROR ${e.getClass.getSimpleName}")
        }
        graft.operators.ManagedCache.releaseAll()
    }
    println("SCAN_DONE")
    spark.stop()
  }
}
