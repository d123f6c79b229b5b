package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: injects graft's native
  * expressions into every session built with
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) — or
  *   spark.sql.extensions=graft.expressions.GraftExtensions
  *
  * (the extension-injection route, preferred over per-session
  * `register` because it survives session cloning and applies to
  * thrift/connect sessions too).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("l2_dist_sq"),
      new ExpressionInfo(classOf[L2DistanceSq].getName, "l2_dist_sq"),
      (exprs: Seq[Expression]) => L2DistanceSq(exprs(0), exprs(1))))
    // whole-operator extension: plans graft.plans.AsOfJoinNode onto
    // the native merge-scan AsOfJoinExec
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
