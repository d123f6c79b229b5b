package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made `Column.expr` / `classic.ExpressionUtils`
  * `private[sql]`; the established extension-library workaround is a
  * tiny bridge object inside the `org.apache.spark.sql` package (the
  * same technique Spark-ecosystem libraries use to expose typed
  * expressions as Columns).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** The standard analysis error for a SQL function called with the
    * wrong argument count (`private[sql]` QueryCompilationErrors) —
    * so `l2_dist_sq(a)` fails with a proper AnalysisException naming
    * the function instead of an IndexOutOfBoundsException. */
  def wrongNumArgs(name: String, expected: Int, actual: Int): Nothing =
    throw org.apache.spark.sql.errors.QueryCompilationErrors
      .wrongNumArgsError(name, Seq(expected), actual)

  /** DataFrame from a custom LogicalPlan (`Dataset.ofRows` is
    * `private[sql]` in Spark 4) — the entry point for custom logical
    * operators like `graft.plans.AsOfJoinNode`. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** DataFrame over an InternalRow RDD without the external-Row
    * round-trip (`SparkSession.internalCreateDataFrame` is
    * `private[sql]`). Rows MUST already be UnsafeRows (e.g. from an
    * `UnsafeProjection`); callers keep per-partition scans inside
    * Tungsten format instead of boxing through `df.rdd` +
    * `createDataFrame`. */
  def internalCreateDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Streaming-tagged variant — what a v1 streaming `Source` must
    * return from `getBatch` (MicroBatchExecution asserts
    * `isStreaming`; the standard custom-source idiom wraps the batch
    * plan's `toRdd` this way, exactly like FileStreamSource). */
  def internalCreateStreamingDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
