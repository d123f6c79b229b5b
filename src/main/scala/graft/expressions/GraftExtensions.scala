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
  import GraftExtensions.{binaryBuilder, ternaryBuilder, unaryBuilder}

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      binaryBuilder("cosine_sim", CosineSimilarity(_, _))))
    ext.injectFunction((
      FunctionIdentifier("l2_dist_sq"),
      new ExpressionInfo(classOf[L2DistanceSq].getName, "l2_dist_sq"),
      binaryBuilder("l2_dist_sq", L2DistanceSq(_, _))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName,
        "nfc_normalize"),
      unaryBuilder("nfc_normalize", UnicodeNormalize(_, "NFC"))))
    ext.injectFunction((
      FunctionIdentifier("nfkc_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName,
        "nfkc_normalize"),
      unaryBuilder("nfkc_normalize", UnicodeNormalize(_, "NFKC"))))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      binaryBuilder("jaro_winkler", JaroWinkler(_, _))))
    ext.injectFunction((
      FunctionIdentifier("lev_within"),
      new ExpressionInfo(classOf[LevenshteinWithin].getName,
        "lev_within"),
      ternaryBuilder("lev_within", LevenshteinWithin(_, _, _))))
    // whole-operator extension: plans graft.plans.AsOfJoinNode onto
    // the native merge-scan AsOfJoinExec
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // optimizer extension: auto-band levenshtein(a,b) <= k predicates
    // with the free |length(a)-length(b)| <= k short-circuit
    ext.injectOptimizerRule(_ => graft.plans.BandLevenshtein)
    // read-path extension: parquet relations over a directory carrying
    // a _stats.json manifest get manifest-consulting file listing —
    // plain spark.read.parquet(versionDir).filter(...) skips files
    ext.injectOptimizerRule(_ => graft.plans.StatsPruneRule)
    // metadata-only aggregates: whole-table count(*)/min/max over a
    // manifest-carrying directory answer from _stats.json as a
    // LocalRelation — no file scan at all
    ext.injectOptimizerRule(_ => graft.plans.StatsAggRule)
    // SQL INSERT INTO / INSERT OVERWRITE on USING-snapshot tables —
    // MAIN resolution batch, deliberately: DataSourceAnalysis (which
    // runs before any injected post-hoc rule) would otherwise lower
    // the statement into a write INTO the published version directory
    ext.injectResolutionRule(s => graft.plans.SnapshotInsertRule(s))
    // per-query freshness for catalog snapshot tables: a cached
    // relation whose served version lags the store head is rebuilt
    // (runs BEFORE the DML rewrite so merge sources are fresh too)
    ext.injectPostHocResolutionRule(s =>
      graft.plans.SnapshotFreshnessRule(s))
    // SQL DML on USING-snapshot tables: resolved DELETE/UPDATE/MERGE
    // statements rewrite onto the conflict-detected library DML
    // (post-hoc: the analyzer has already resolved the target through
    // the connector relation by the time this runs)
    ext.injectPostHocResolutionRule(s => graft.plans.SnapshotDmlRule(s))
    // delegating SQL parser: VERSION/TIMESTAMP AS OF on snapshot
    // tables (Spark's analyzer refuses them for V1 relations),
    // VACUUM / OPTIMIZE [PURGE | ZORDER BY] / DESCRIBE HISTORY —
    // everything else delegates verbatim
    ext.injectParser((session, delegate) =>
      new graft.plans.SnapshotSqlParser(session, delegate))
  }
}

object GraftExtensions {
  /** Arity-validated builder for a binary SQL function: wrong argument
    * counts raise the standard WRONG_NUM_ARGS AnalysisException naming
    * the function, not an IndexOutOfBoundsException from `exprs(1)`. */
  private[expressions] def binaryBuilder(name: String,
      make: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 2)
      org.apache.spark.sql.GraftColumnBridge
        .wrongNumArgs(name, 2, exprs.length)
    make(exprs(0), exprs(1))
  }

  private[expressions] def ternaryBuilder(name: String,
      make: (Expression, Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 3)
      org.apache.spark.sql.GraftColumnBridge
        .wrongNumArgs(name, 3, exprs.length)
    make(exprs(0), exprs(1), exprs(2))
  }

  private[expressions] def unaryBuilder(name: String,
      make: Expression => Expression): Seq[Expression] => Expression = {
    exprs =>
      if (exprs.length != 1)
        org.apache.spark.sql.GraftColumnBridge
          .wrongNumArgs(name, 1, exprs.length)
      make(exprs(0))
  }
}
