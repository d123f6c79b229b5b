package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity: `jaro_winkler(a, b)` ∈ [0, 1].
  *
  * Standard parameters, chosen to replay bit-for-bit in DuckDB's
  * `jaro_winkler_similarity` (probed empirically — see ErSpec):
  * match window `max(⌊max(n,m)/2⌋−1, 0)`; transpositions = mismatched
  * matched positions / 2 with INTEGER division (DuckDB on
  * 'abcdef'/'bcadef' → 0.9444, i.e. t=⌊3/2⌋, not 1.5); Winkler boost
  * `p=0.1` over the common prefix capped at 4, applied only when the
  * Jaro score exceeds 0.7; either side empty → 0.0. The final sum is
  * evaluated in the same order DuckDB uses —
  * `(m/n + m/m' + (m−t)/m) / 3` — so identical IEEE doubles come out
  * of both engines and a `round(x, 6)` agrees on every pair.
  *
  * Unit is the Unicode CODE POINT (like the builtin `levenshtein` and
  * DuckDB), not the UTF-16 char.
  *
  * Reference behavior: the reference engine normalizes and joins
  * free-text name fields when reassembling masters
  * (`jobcan_di/database/users.py:185-266`); fuzzy matching
  * of those name fields is the ER extension here. The hot loop is a
  * static call from generated Java, so blocked ER predicates stay
  * inside whole-stage codegen.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      // `_: StringType`: Spark 4 string types carry a collation id and
      // the stable-identifier pattern rejects collated columns the
      // code-point algorithm handles identically
      case (_: StringType, _: StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val mod = s"${JaroWinkler.getClass.getName}.MODULE$$"
      s"${ev.value} = $mod.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(l, r)
}

object JaroWinkler {
  /** Column-API entry point (Spark 4: Column↔Expression bridging goes
    * through the GraftColumnBridge shim). */
  def apply(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val eu = org.apache.spark.sql.GraftColumnBridge
    eu.column(JaroWinkler(eu.expression(a), eu.expression(b)))
  }

  /** Static so generated code can call it directly. */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString.codePoints().toArray
    val t = b.toString.codePoints().toArray
    val n = s.length; val m = t.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && t(j) == s(i)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // mismatched positions between the two matched sequences
    var mism = 0
    var si = 0; var tj = 0
    i = 0
    while (i < matches) {
      while (!sMatch(si)) si += 1
      while (!tMatch(tj)) tj += 1
      if (s(si) != t(tj)) mism += 1
      si += 1; tj += 1
      i += 1
    }
    val tr = mism / 2 // integer halving, matching DuckDB
    val md = matches.toDouble
    val jaro = (md / n + md / m + (matches - tr) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(n, m)) &&
        s(prefix) == t(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
