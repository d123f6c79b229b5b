package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native threshold Levenshtein: `lev_within(a, b, k)` ⇔
  * `levenshtein(a, b) <= k`, computed with the banded dynamic program
  * (Ukkonen 1985): only the 2k+1 diagonal band of the edit matrix is
  * evaluated, with an early exit as soon as the whole band exceeds k.
  *
  * Complexity O(k·min(n,m)) instead of the full-matrix O(n·m) the
  * `levenshtein(a,b) <= k` formulation pays (Spark computes the exact
  * distance, then compares — the threshold can't reach the builtin).
  * For the fuzzy-dedup shape (dd8: banded length/prefix blocking then
  * distance ≤ 9 on ~10²-char strings) the band does ~9/100ths of the
  * cell work, and mismatching pairs exit after the first k+1 rows.
  *
  * Semantics match `levenshtein(a,b) <= k` exactly: unit = Unicode
  * CODE POINT (surrogate pairs count once, like the builtin and
  * DuckDB's levenshtein); k < 0 yields false; null in ⇒ null out.
  * The hot loop lives in [[LevenshteinWithin.compute]], called from
  * both the interpreted and the generated path — `doGenCode` emits a
  * static call, so the expression stays inside whole-stage codegen
  * without duplicating the DP in Java-source form.
  */
case class LevenshteinWithin(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  // `_: StringType`, not the StringType object: Spark 4 string types
  // carry a collation id and the stable-identifier pattern rejects
  // collated columns the code-point DP handles identically
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (_: StringType, _: StringType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"lev_within expects (string, string, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "lev_within"

  override def nullSafeEval(a: Any, b: Any, k: Any): Any =
    LevenshteinWithin.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, k) => {
      // the Scala object's MODULE$ field — stable from generated Java
      // regardless of static-forwarder emission
      val mod = s"${LevenshteinWithin.getClass.getName}.MODULE$$"
      s"${ev.value} = $mod.compute($a, $b, $k);"
    })

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression = copy(f, s, t)
}

object LevenshteinWithin {

  /** Banded DP. Static so generated code can call it directly. */
  def compute(a: UTF8String, b: UTF8String, kRaw: Int): Boolean = {
    if (kRaw < 0) return false
    // code points, not chars: a surrogate pair is ONE edit unit
    val s = a.toString.codePoints().toArray
    val t = b.toString.codePoints().toArray
    val (x, y) = if (s.length <= t.length) (s, t) else (t, s)
    val n = x.length; val m = y.length
    // clamp BEFORE the band arithmetic: distance never exceeds the
    // longer length, and an un-clamped huge k makes i + k wrap
    // negative (the band loop silently skips, then arraycopy gets a
    // negative length) — lev_within(s, t, Int.MaxValue) must just be
    // `true`, like the plain levenshtein comparison it replaces
    val k = math.min(kRaw, m)
    if (m - n > k) return false
    if (n == 0) return m <= k
    // prev(j) = edit distance for (i-1, j); band j ∈ [i-k, i+k]
    val INF = Int.MaxValue / 2
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var j = 0
    while (j <= math.min(m, k)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      cur(lo - 1) = if (lo - 1 == 0) i else INF
      var best = cur(lo - 1)
      j = lo
      while (j <= hi) {
        val sub = (if (j - 1 <= i - 1 + k && j - 1 >= i - 1 - k)
          prev(j - 1) else INF) +
          (if (x(i - 1) == y(j - 1)) 0 else 1)
        val del = (if (j <= i - 1 + k) prev(j) else INF) + 1
        val ins = cur(j - 1) + 1
        val v = math.min(sub, math.min(del, ins))
        cur(j) = v
        if (v < best) best = v
        j += 1
      }
      if (best > k) return false // whole band over budget: early exit
      System.arraycopy(cur, math.max(0, lo - 1), prev,
        math.max(0, lo - 1), hi - math.max(0, lo - 1) + 1)
      i += 1
    }
    prev(m) <= k
  }
}
