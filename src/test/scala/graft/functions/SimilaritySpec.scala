package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.{SimilarityFunctions => SF, TextFunctions => TF}

/** Planted-duplicate correctness for the sketch-based operators that
  * have no SQL oracle (dd2 MinHash+LSH, dd4 SimHash, ann2 bucketed
  * ANN). Determinism is part of the contract: all sketches are
  * hash-seeded, so every assertion is exact, not probabilistic.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away " +
      "into the deep green forest near the old stone bridge"
  private val nearDup = base.replace("lazy", "sleepy") // 1-token edit
  private val unrelated =
    "completely different content about spark query engines shuffle " +
      "partitions catalyst optimizer tungsten codegen execution plans"

  private def docs = Seq(
    (0L, base), (1L, base), (2L, nearDup), (3L, unrelated)
  ).toDF("doc_id", "text")

  test("minhash: identical docs have identical signatures") {
    val sig = docs.select($"doc_id",
      SF.minhashSignature(TF.wordShingles($"text", 2), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig(0L) == sig(1L))
    assert(sig(0L) != sig(3L))
    assert(sig(0L).size == 16)
  }

  test("lsh bands: exact duplicates collide on every band, " +
    "near-dups on at least one, unrelated docs on none") {
    val banded = docs.select($"doc_id",
      explode(SF.lshBands(
        SF.minhashSignature(TF.wordShingles($"text", 2), 16), 8, 2))
        .as("band"))
    val pairs = banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("da"), $"b.doc_id".as("db")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(pairs((0L, 1L)) == 8) // identical: all 8 bands
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)),
      "near-duplicate must collide on at least one band")
    assert(!pairs.contains((0L, 3L)) && !pairs.contains((1L, 3L)) &&
      !pairs.contains((2L, 3L)), "unrelated doc must not collide")
  }

  test("simhash: identical→0 hamming, near-dup close, unrelated far") {
    val sh = docs.select($"doc_id",
      SF.simhash64(TF.wordShingles($"text", 2)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(0L), sh(1L)) == 0)
    assert(ham(sh(0L), sh(2L)) < ham(sh(0L), sh(3L)),
      s"near-dup ${ham(sh(0L), sh(2L))} must beat unrelated ${ham(sh(0L), sh(3L))}")
    assert(ham(sh(0L), sh(2L)) <= 16)
  }

  test("cosine: exact on hand-computed vectors; identical vectors hit 1") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.6f, 0.8f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cos = vecs.as("a").join(vecs.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id",
        round(SF.cosine($"a.embedding", $"b.embedding"), 9).as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cos((0L, 1L)) == 1.0)
    assert(cos((0L, 2L)) == 0.0)
    // 0.6f/0.8f are not exactly representable in float32 — the cast to
    // double carries the float rounding, so compare at float precision
    assert(math.abs(cos((0L, 3L)) - 0.6) < 1e-7)
  }

  test("hyperplane buckets: deterministic and identical vectors share " +
    "a bucket") {
    val vecs = Seq(
      (0L, Array.tabulate(64)(i => math.sin(i).toFloat)),
      (1L, Array.tabulate(64)(i => math.sin(i).toFloat)),
      (2L, Array.tabulate(64)(i => math.cos(i * 3).toFloat))
    ).toDF("vec_id", "embedding")
    val b1 = vecs.select($"vec_id",
      SF.hyperplaneBucket($"embedding", 4).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = vecs.select($"vec_id",
      SF.hyperplaneBucket($"embedding", 4).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2, "buckets must be reproducible across runs")
    assert(b1(0L) == b1(1L))
    assert(b1.values.forall(b => b >= 0 && b < 16))
  }

  test("arithmetic hyperplane bucket matches the hand-computed " +
    "sign-of-projection, and equals the SQL-oracle formula") {
    val v = Array.tabulate(8)(i => (0.1f * (i + 1)) * (if (i % 2 == 0) 1 else -1))
    def w(p: Int, d: Int): Int = ((d * (p + 1) + p) % 5) - 2
    val expected = (0 until 4).map { p =>
      val proj = v.zipWithIndex.map { case (x, d) => x.toDouble * w(p, d) }.sum
      if (proj > 0) 1L << p else 0L
    }.reduce(_ | _)
    val got = Seq((0L, v)).toDF("vec_id", "embedding")
      .select(SF.arithmeticHyperplaneBucket($"embedding", 4).as("b"))
      .collect().head.getLong(0)
    assert(got == expected, s"bucket $got != hand-computed $expected")
    // the 4 weight patterns must be genuinely distinct (a mod-3
    // scheme would repeat plane 0 at plane 3)
    val patterns = (0 until 4).map(p => (0 until 10).map(d => w(p, d)))
    assert(patterns.distinct.size == 4, s"planes repeat: $patterns")
    // beyond 4 planes the multipliers repeat mod 5 → refuse
    intercept[IllegalArgumentException] {
      SF.arithmeticHyperplaneBucket($"embedding", 5)
    }
    // simhashBlocks: nBlocks=1 would wrap (1L<<64)==1 → refuse
    intercept[IllegalArgumentException] {
      SF.simhashBlocks($"embedding", 1)
    }
    // bits < nBlocks (e.g. bits=0) would make the block width 0 and
    // every block_val 0 → candidate join degenerates to cross product
    intercept[IllegalArgumentException] {
      SF.simhashBlocks($"embedding", 2, 0)
    }
  }

  test("simhash blocks: 8 blocks reconstruct the signature, and a " +
    "pair within hamming 7 shares at least one block (pigeonhole)") {
    val a = 0x123456789abcdef0L
    // flip 7 bits spread over 7 different blocks — worst case for the
    // old single-byte bucket, guaranteed caught by the 8-block join
    val b = a ^ 0x0101010101010100L ^ 0x0000000000000001L
    assert(java.lang.Long.bitCount(a ^ b) == 8) // 8 flips → adjust
    val c = a ^ 0x0101010101010100L // 7 flips, 7 distinct blocks
    assert(java.lang.Long.bitCount(a ^ c) == 7)
    val df = Seq((1L, a), (2L, c)).toDF("doc_id", "sig")
      .select($"doc_id", $"sig",
        explode(SF.simhashBlocks($"sig", 8)).as("blk"))
    // blocks reconstruct the signature
    val rebuilt = df.groupBy($"doc_id", $"sig")
      .agg(sum(expr("shiftleft(blk.block_val, cast(blk.block_id * 8 as int))"))
        .as("re"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(rebuilt.forall { case (sig, re) => sig == re })
    // hamming-7 pair collides on ≥1 block
    val pairs = df.as("x").join(df.as("y"),
        $"x.blk" === $"y.blk" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id", $"y.doc_id").distinct().count()
    assert(pairs == 1L, "hamming-7 pair must share a block")
  }

  test("shingles guard short docs (sequence(1,0) would be descending)") {
    val tiny = Seq((0L, "ab"), (1L, ""), (2L, "one two")).toDF("doc_id", "text")
    val rows = tiny.select($"doc_id",
      TF.shingles($"text", 5).as("c5"),
      TF.wordShingles($"text", 3).as("w3")).collect()
      .map(r => r.getLong(0) -> (r.getSeq[String](1), r.getSeq[String](2)))
      .toMap
    assert(rows(0L)._1.isEmpty && rows(0L)._2.isEmpty) // 2 chars, 1 token
    assert(rows(1L)._1.isEmpty && rows(1L)._2.isEmpty) // empty doc
    // "one two": 7 chars → char-5-grams exist; 2 tokens → no 3-gram
    assert(rows(2L)._1 == Seq("one t", "ne tw", "e two"))
    assert(rows(2L)._2.isEmpty)
  }

  test("BPE primitives: spaced round-trip, greedy overlap merge, " +
    "consecutive pairs all merge") {
    import graft.functions.{TextFunctions => TF}
    import spark.implicits._
    val df = Seq("low", "aaa", "abab").toDF("w")
      .select(col("w"), TF.bpeSpaced(col("w")).as("s"))
    val toks = df.select(col("w"),
      TF.bpeTokens(col("s")).as("t")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(toks("low") == Seq("l", "o", "w", "</w>"))
    // greedy left-to-right: "aaa" + (a,a) -> [aa, a, </w>], NOT [a, aa]
    val merged = df.select(col("w"),
        TF.bpeTokens(TF.bpeMerge(col("s"), "a", "a")).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(merged("aaa") == Seq("aa", "a", "</w>"))
    // consecutive non-overlapping pairs must BOTH merge (the
    // shared-boundary case a naive single-space encoding gets wrong)
    val ab = df.select(col("w"),
        TF.bpeTokens(TF.bpeMerge(col("s"), "a", "b")).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(ab("abab") == Seq("ab", "ab", "</w>"))
    // chained merge: (a,b) then (ab,ab)
    val chained = df.filter(col("w") === "abab")
      .select(TF.bpeTokens(TF.bpeMerge(
        TF.bpeMerge(col("s"), "a", "b"), "ab", "ab")).as("t"))
      .collect()(0).getSeq[String](0)
    assert(chained == Seq("abab", "</w>"))
  }
}
