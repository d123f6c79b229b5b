package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: Unicode normalization (NFC / NFKC /
  * NFD / NFKD) of a string column via `java.text.Normalizer` — the
  * text-canonicalization step a training-data pipeline runs BEFORE
  * hashing/dedup, so that "café" composed and "café" decomposed (or an
  * NFKC-foldable fullwidth/ligature form) collide instead of slipping
  * past exact and MinHash dedup as distinct byte strings.
  *
  * No UDF: this inlines into whole-stage codegen next to the
  * tokenizer/hash expressions around it. The common case — text
  * already in normal form, true for ~all crawled ASCII/English — is a
  * zero-allocation fast path: `Normalizer.isNormalized` is a scan, and
  * the input UTF8String is returned as-is (safe: every sink either
  * copies bytes into an UnsafeRow or reads before the next row
  * overwrite). Only non-normal rows pay String materialization +
  * recompose.
  *
  * The NFC form is oracle-checkable against DuckDB's
  * `nfc_normalize()` (tx12); NFKC/NFD/NFKD have no DuckDB twin and
  * are spec-verified (NativeExprSpec: ligature/fullwidth folds,
  * combining-mark composition, interpreted-vs-codegen parity).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  @transient private lazy val normForm: Normalizer.Form =
    Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        if (Seq("NFC", "NFKC", "NFD", "NFKD").contains(form))
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"unicode_normalize form must be NFC|NFKC|NFD|NFKD, got $form")
      case t => TypeCheckResult.TypeCheckFailure(
        s"${prettyName} expects a string column, got ${t.simpleString}")
    }

  override def dataType: DataType = child.dataType
  override def prettyName: String = s"${form.toLowerCase}_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, normForm)) input
    else UTF8String.fromString(Normalizer.normalize(s, normForm))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val formRef = s"java.text.Normalizer.Form.$form"
      s"""
        |String $s = $c.toString();
        |${ev.value} = java.text.Normalizer.isNormalized($s, $formRef)
        |  ? $c
        |  : org.apache.spark.unsafe.types.UTF8String.fromString(
        |      java.text.Normalizer.normalize($s, $formRef));
      """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object UnicodeNormalize {
  /** Column-API entry points. */
  def nfc(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    of(c, "NFC")
  def nfkc(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    of(c, "NFKC")
  def of(c: org.apache.spark.sql.Column,
      form: String): org.apache.spark.sql.Column = {
    val eu = org.apache.spark.sql.GraftColumnBridge
    eu.column(UnicodeNormalize(eu.expression(c), form))
  }
}
