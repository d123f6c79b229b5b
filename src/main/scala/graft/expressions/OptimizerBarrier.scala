package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that the optimizer must treat as non-deterministic.
  *
  * Purpose: pin an expensive expression to the exact plan position it
  * was written at. Catalyst pushes a deterministic predicate through
  * any operator whose grouping/projection the predicate is expressible
  * over — so `groupBy(a, b).agg(...).withColumn("s", f(a, b))
  * .filter(s >= t)` gets `f` pushed back through the aggregate into
  * the join below it, and the "evaluate f once per distinct (a, b)"
  * dedup the aggregate exists for is silently defeated (measured in
  * er1: jaro_winkler back in the join condition, once per candidate
  * pair instead of once per distinct name pair). Marking the wrapped
  * expression non-deterministic forbids the optimizer from reordering,
  * duplicating, or pushing predicates past it (the guide's §4.4
  * pattern for expensive UDFs), while evaluation stays the plain
  * child value — the RESULT is deterministic in fact, so retried
  * tasks reproduce identical output.
  *
  * Use sparingly: non-determinism also blocks legitimate pushdown of
  * OTHER predicates past the projection that contains it. Wrap only
  * the expensive kernel whose placement you are defending.
  */
case class OptimizerBarrier(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "barrier"

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object OptimizerBarrier {
  /** Column-API entry point. */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val eu = org.apache.spark.sql.GraftColumnBridge
    eu.column(OptimizerBarrier(eu.expression(c)))
  }
}
