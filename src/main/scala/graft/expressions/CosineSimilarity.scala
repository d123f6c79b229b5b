package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two
  * `array<float>` embedding columns, accumulated in double.
  *
  * This is the §2.11-style custom Expression the ANN path wants: the
  * higher-order-function formulation
  * (`aggregate(zip_with(a,b,*))/sqrt(...)`) allocates three
  * intermediate arrays per row and evaluates interpreted lambdas; this
  * expression is one fused loop with `doGenCode`, so it inlines into
  * whole-stage codegen next to the surrounding filter/project.
  *
  * Semantics match SimilarityFunctions.cosineHof exactly: elements
  * cast to double before multiply, sums accumulated in index order —
  * so oracle comparisons (DuckDB `list_cosine_similarity` over
  * DOUBLE[]) agree to the last rounded digit. Mismatched lengths and
  * null elements yield NULL (the HOF's zip_with pads ragged arrays
  * with null and any null element nulls the aggregate — a silent
  * common-prefix number here would be confidently wrong, the same
  * contract L2DistanceSq pins); empty/zero vectors yield NaN (same
  * as the HOF form: 0/0).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // manual type check: ExpectsInputTypes needs AbstractDataType, which
  // is private[sql] in Spark 4
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<float>, array<float>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        |int $n = $a.numElements();
        |if ($b.numElements() != $n) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
        |      ${ev.isNull} = true; break;
        |    }
        |    double $xi = (double) $a.getFloat($i);
        |    double $yi = (double) $b.getFloat($i);
        |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        |  }
        |  if (!${ev.isNull}) {
        |    ${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
        |  }
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object CosineSimilarity {
  /** Column-API entry point (Spark 4: Column↔Expression bridging goes
    * through the GraftColumnBridge shim). */
  def apply(a: Column, b: Column): Column = {
    val eu = org.apache.spark.sql.GraftColumnBridge
    eu.column(CosineSimilarity(eu.expression(a), eu.expression(b)))
  }

  /** Register `cosine_sim` for SQL use on an existing session (the
    * no-extensions path; GraftExtensions injects it at session build).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      GraftExtensions.binaryBuilder("cosine_sim", CosineSimilarity(_, _)),
      "built-in")
}
