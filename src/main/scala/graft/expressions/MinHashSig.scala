package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: k-element MinHash signature of a
  * string-shingle array — `minhash[i] = min over shingles of
  * xxhash64(i, shingle)`, exactly the semantics of
  * `SimilarityFunctions.minhashSignatureHof` (whose seed column is an
  * INT, so the chained hash is `hashString(s, hashInt(i, 42))`).
  *
  * The HOF formulation (`aggregate` over `zip_with` against a
  * `sequence(0, k-1)`) allocates a k-element array per shingle per row
  * and interprets three nested lambdas; this is one fused loop over a
  * k-slot accumulator with `doGenCode` — the map-side hot loop of
  * corpus-scale MinHash dedup, and (being one compact expression) it
  * also planning/codegen-compiles in milliseconds where the unrolled
  * HOF tree does not.
  *
  * Empty or null input → null, matching the HOF's
  * `when(size <= 0, null)` guard.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0, s"k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<string>, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true

  /** The k per-slot seed values `xxhash64(i, 42)` are constants of the
    * expression — computed once here instead of n_shingles × k times
    * inside the innermost loop (the map-side hot path of corpus-scale
    * dedup). Transient: recomputed cheaply after task deserialization.
    */
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(k)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val acc = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      // a null shingle matches xxhash64(seed, NULL): the null child is
      // skipped, leaving hashInt(i, 42) — not an NPE
      val s = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
      var i = 0
      while (i < k) {
        val seeded = seeds(i)
        val h = if (s == null) seeded else XXH64.hashUTF8String(s, seeded)
        if (h < acc(i)) acc(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    val utf8 = classOf[UTF8String].getName
    // the k seed constants ride along as a broadcast-once reference
    // object instead of being rehashed n_shingles × k times per row
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val sd = ctx.freshName("sd")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      s"""
        |int $n = $c.numElements();
        |if ($n == 0) {
        |  ${ev.isNull} = true;
        |} else {
        |  long[] $sd = $seedsRef;
        |  long[] $acc = new long[$k];
        |  java.util.Arrays.fill($acc, Long.MAX_VALUE);
        |  for (int $j = 0; $j < $n; $j++) {
        |    $utf8 $s = $c.isNullAt($j) ? null : $c.getUTF8String($j);
        |    for (int $i = 0; $i < $k; $i++) {
        |      long $h = $sd[$i];
        |      if ($s != null) $h = $xxh.hashUTF8String($s, $h);
        |      if ($h < $acc[$i]) $acc[$i] = $h;
        |    }
        |  }
        |  ${ev.value} = new $gad($acc);
        |}
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression):
      Expression = copy(child = newChild)
}

object MinHashSig {
  /** Column-API entry point. */
  def apply(shingles: Column, k: Int): Column = {
    val eu = org.apache.spark.sql.GraftColumnBridge
    eu.column(MinHashSig(eu.expression(shingles), k))
  }
}
