package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for selected queries and
  * greps the physical plan for the scale-relevant properties —
  * PushedFilters reaching the parquet scan, broadcast joins on
  * dimension tables, whole-stage codegen coverage, and shuffle
  * (Exchange) counts.
  *
  *   PlanAudit [queryName ...]    (defaults to a headline set)
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      sys.error("set SPARK_GRAFT_SF_DIR"))
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "flagship_report", "p3_eq_filter", "j1_left_join_dim",
      "a1_pivot_max_case", "a5_first_per_key", "w4_topk_limit",
      "dd2_minhash_lsh", "dd3_ngram_jaccard", "ann1_cosine_topk",
      "ann2_lsh_ann", "ann3_ivf_ann", "j12_master_doc_join",
      "dd6_dedup_clusters", "px3_decontaminate", "xj3_asof_native",
      "ts1_resample_locf", "xs3_bloom_join", "xj4_range_join",
      "px4_pack_sequences", "ann4_kmeans", "dd8_fuzzy_edit",
      "ts3_sessionize", "xs4_heavy_hitters")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // run THIS plan first (toRdd, not count() — count() builds a
      // different QueryExecution): under AQE the pre-execution explain
      // shows an unfinalized AdaptiveSparkPlan with no codegen ids and
      // possibly different join strategies — the audit must read the
      // plan that actually executed
      val executed =
        try { df.queryExecution.toRdd.count(); true }
        catch { case scala.util.control.NonFatal(e) =>
          println(s"WARN $name failed to execute (${e.getClass.getSimpleName}: " +
            s"${e.getMessage}) — stats below are from the UNEXECUTED plan")
          false
        }
      graft.operators.ManagedCache.releaseAll()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // adaptive explain prints Final AND Initial plan TREES before
      // the per-operator details: count tree-level operators (joins,
      // exchanges) only in the plan that ran, but keep the full text
      // for the detail-section metrics (codegen ids, PushedFilters)
      val tree = if (plan.contains("== Initial Plan =="))
        plan.substring(0, plan.indexOf("== Initial Plan ==")) else plan
      val nExchange = "Exchange".r.findAllIn(tree).size
      val nBroadcast = "BroadcastHashJoin".r.findAllIn(tree).size
      val nCodegen = "codegen id : (\\d+)".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size
      val pushed = plan.linesIterator
        .filter(l => l.contains("PushedFilters") && !l.contains("[]"))
        .size
      println(s"\n========== $name ==========" +
        (if (executed) "" else " [UNEXECUTED]"))
      println(s"exchanges=$nExchange broadcastJoins=$nBroadcast " +
        s"codegenStages=$nCodegen scansWithPushedFilters=$pushed")
      if (args.nonEmpty) println(plan)
      else println(plan.linesIterator
        .filter(l => l.matches("^\\(\\d+\\) .*") ||
          l.contains("PushedFilters") || l.contains("ReadSchema"))
        .take(60).mkString("\n"))
    }
    spark.stop()
  }
}
