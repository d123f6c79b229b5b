package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: squared L2 distance between two vector
  * columns (`array<float>` or `array<double>` on either side),
  * accumulated in double in index order.
  *
  * The k-means assign step evaluates k of these per row per iteration;
  * the higher-order form (`aggregate(zip_with(v,c,(a,b)=>(a-b)*(a-b)))`)
  * allocates an intermediate array per comparison and runs interpreted
  * lambdas, while this is one fused `doGenCode` loop that inlines into
  * whole-stage codegen. Index-ordered accumulation keeps results
  * bit-identical to the HOF form and to DuckDB's
  * `list_sum(list_transform(...))` replay, so swapping it into an
  * oracle-checked query changes nothing but speed.
  */
case class L2DistanceSq(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType) = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2_dist_sq expects array<float|double> on both sides, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_dist_sq"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // HOF parity (zip_with + aggregate): mismatched lengths null-pad and
  // a null element nulls the whole sum — so the fused form returns
  // null for ragged or null-holding vectors instead of a confidently
  // small distance
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (fx, fy) = (isFloat(left), isFloat(right))
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xi - yi
      acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      def get(arr: String, idx: String, float: Boolean) =
        if (float) s"(double) $arr.getFloat($idx)"
        else s"$arr.getDouble($idx)"
      s"""
        |int $n = $a.numElements();
        |if ($b.numElements() != $n) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $acc = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
        |      ${ev.isNull} = true; break;
        |    }
        |    double $d = ${get(a, i, isFloat(left))} -
        |      ${get(b, i, isFloat(right))};
        |    $acc += $d * $d;
        |  }
        |  if (!${ev.isNull}) ${ev.value} = $acc;
        |}
      """.stripMargin
    })

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object L2DistanceSq {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column = {
    val eu = org.apache.spark.sql.GraftColumnBridge
    eu.column(L2DistanceSq(eu.expression(a), eu.expression(b)))
  }

  /** Register `l2_dist_sq` for SQL use on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_dist_sq",
      GraftExtensions.binaryBuilder("l2_dist_sq", L2DistanceSq(_, _)),
      "built-in")
}
