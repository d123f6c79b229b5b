package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native codegen expressions: L2DistanceSq must be bit-identical to
  * the higher-order-function formulation it replaces (same index-
  * ordered double accumulation), handle mixed float/double element
  * types, and type-check through the SQL surface.
  */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet(s"$sf0001/embeddings.parquet").limit(50).cache()

  test("l2_dist_sq equals the zip_with+aggregate HOF form, bit for bit") {
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".as("qv"))
    val both = emb.crossJoin(broadcast(q)).select(
      L2DistanceSq($"embedding", $"qv").as("native"),
      aggregate(zip_with($"embedding", $"qv",
          (a, b) => (a.cast("double") - b.cast("double")) *
            (a.cast("double") - b.cast("double"))),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
  }

  test("l2_dist_sq nulls on ragged or null-holding vectors, like the HOF") {
    val df = Seq(
      (Seq[Option[Float]](Some(1f)), Seq[Option[Float]](Some(1f), Some(2f))),
      (Seq[Option[Float]](Some(1f), None), Seq[Option[Float]](Some(1f), Some(2f))),
      (Seq[Option[Float]](Some(1f), Some(2f)), Seq[Option[Float]](Some(1f), Some(2f))))
      .toDF("a", "b")
    val got = df.select(
        L2DistanceSq($"a", $"b").as("native"),
        aggregate(zip_with($"a", $"b",
            (x, y) => (x.cast("double") - y.cast("double")) *
              (x.cast("double") - y.cast("double"))),
          lit(0.0), (acc, v) => acc + v).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"native=${r.get(0)} hof=${r.get(1)}")
    }
    assert(got(0).isNullAt(0) && got(1).isNullAt(0) && !got(2).isNullAt(0))
  }

  test("cosine_sim nulls on ragged or null-holding vectors, like " +
    "l2_dist_sq — never a confidently-wrong common-prefix number") {
    val df = Seq(
      (Seq[Option[Float]](Some(1f)), Seq[Option[Float]](Some(1f), Some(2f))),
      (Seq[Option[Float]](Some(1f), None), Seq[Option[Float]](Some(1f), Some(2f))),
      (Seq[Option[Float]](Some(3f), Some(4f)), Seq[Option[Float]](Some(3f), Some(4f))))
      .toDF("a", "b")
    val got = df.select(CosineSimilarity($"a", $"b")).collect()
    assert(got(0).isNullAt(0), "ragged must be NULL")
    assert(got(1).isNullAt(0), "null element must be NULL")
    assert(math.abs(got(2).getDouble(0) - 1.0) < 1e-12)
  }

  test("lev_within survives a huge k (band arithmetic must clamp, " +
    "not wrap): equals the plain comparison") {
    val r = spark.sql(
      "SELECT lev_within('a', 'b', 2147483647), " +
        "lev_within('kitten', 'sitting', 2147483646)").collect()(0)
    assert(r.getBoolean(0) && r.getBoolean(1))
  }

  test("minhash_sig tolerates null shingles, matching the HOF") {
    import graft.functions.{SimilarityFunctions => SF}
    val df = Seq(Seq[Option[String]](Some("a b"), None, Some("b c")))
      .toDF("sh")
    val r = df.select(SF.minhashSignature($"sh", 8).as("native"),
      SF.minhashSignatureHof($"sh", 8).as("hof")).collect()(0)
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
  }

  test("l2_dist_sq accepts mixed float/double sides") {
    val d = emb.select($"embedding",
      transform($"embedding", x => x.cast("double")).as("emb_d"))
      .select(L2DistanceSq($"embedding", $"emb_d").as("d2"))
      .collect().map(_.getDouble(0))
    assert(d.forall(_ == 0.0))
  }

  test("minhash_sig is bit-identical to the HOF formulation; empty -> null") {
    import graft.functions.{SimilarityFunctions => SF, TextFunctions => TF}
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .limit(100)
      .select($"doc_id", TF.wordShingles($"text", 2).as("sh"))
    val both = docs.select(
        SF.minhashSignature($"sh", 16).as("native"),
        SF.minhashSignatureHof($"sh", 16).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
    val empty = Seq(Seq.empty[String]).toDF("sh")
      .select(SF.minhashSignature($"sh", 4).as("sig")).collect()
    assert(empty(0).isNullAt(0))
  }

  test("wrong arity raises an AnalysisException naming the function, not an index error") {
    L2DistanceSq.register(spark)
    CosineSimilarity.register(spark)
    emb.createOrReplaceTempView("emb_ar")
    for (fn <- Seq("l2_dist_sq", "cosine_sim")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $fn(embedding) FROM emb_ar").collect()
      }
      assert(e.getMessage.contains(fn), e.getMessage)
    }
  }

  test("l2_dist_sq rejects non-array inputs through SQL analysis") {
    L2DistanceSq.register(spark)
    emb.createOrReplaceTempView("emb_ne")
    val e = intercept[Exception] {
      spark.sql("SELECT l2_dist_sq(vec_id, embedding) FROM emb_ne")
        .collect()
    }
    assert(e.getMessage.contains("l2_dist_sq") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("lev_within agrees with levenshtein(a,b) <= k on seeded random " +
    "string pairs at every k, including the early-exit regimes") {
    val rnd = new scala.util.Random(42)
    def word(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val pairs = Seq.tabulate(300) { i =>
      val a = word(2 + rnd.nextInt(18))
      // half the pairs are edits of a (near), half independent (far)
      val b = if (i % 2 == 0) word(rnd.nextInt(20))
        else a.patch(rnd.nextInt(a.length - 1),
          word(rnd.nextInt(3)), rnd.nextInt(2))
      (a, b)
    }
    val df = pairs.toDF("a", "b")
    for (k <- Seq(0, 1, 2, 5, 9)) {
      val B = org.apache.spark.sql.GraftColumnBridge
      val got = df.select(
        B.column(LevenshteinWithin(B.expression(col("a")),
          B.expression(col("b")), B.expression(lit(k)))).as("w"),
        (levenshtein(col("a"), col("b")) <= k).as("e")).collect()
      got.zip(pairs).foreach { case (r, (a, b)) =>
        assert(r.getBoolean(0) == r.getBoolean(1),
          s"k=$k a='$a' b='$b': within=${r.getBoolean(0)} " +
            s"exact=${r.getBoolean(1)}")
      }
    }
  }

  test("lev_within edge semantics: empties, k=0 equality, negative k " +
    "false, surrogate pairs are one edit, nulls propagate") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(LevenshteinWithin.compute(u(""), u(""), 0))
    assert(LevenshteinWithin.compute(u(""), u("abc"), 3))
    assert(!LevenshteinWithin.compute(u(""), u("abc"), 2))
    assert(LevenshteinWithin.compute(u("same"), u("same"), 0))
    assert(!LevenshteinWithin.compute(u("same"), u("sane"), 0))
    assert(!LevenshteinWithin.compute(u("a"), u("b"), -1))
    // U+1D11E (musical G clef) is a surrogate pair: ONE substitution
    assert(LevenshteinWithin.compute(u("a𝄞b"), u("axb"), 1))
    val r = Seq((null.asInstanceOf[String], "x"))
      .toDF("a", "b")
      .selectExpr("a", "b").createOrReplaceTempView("lw_null")
    val row = spark.sql(
      "SELECT lev_within(a, b, 1) FROM lw_null").collect()(0)
    assert(row.isNullAt(0))
  }

  test("lev_within registers through spark.sql.extensions and " +
    "rejects wrong arity") {
    val n = spark.sql(
      "SELECT lev_within('kitten', 'sitting', 3) AS ok, " +
        "lev_within('kitten', 'sitting', 2) AS no").collect()(0)
    assert(n.getBoolean(0) && !n.getBoolean(1)) // distance is 3
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT lev_within('a', 'b')").collect()
    }
    assert(e.getMessage.contains("lev_within"), e.getMessage)
  }

  test("unicode_normalize: NFC composes, NFKC folds, nulls pass, " +
    "already-normal text round-trips identically") {
    val composed = "caf\u00e9"
    val decomposed = "cafe\u0301"
    val compat = "\ufb01le \uff21" // fi-ligature + fullwidth A
    val rows = Seq(Some(decomposed), Some(composed), Some(compat),
      Some("plain ascii"), None).toDF("s")
    val got = rows.select(col("s"),
        UnicodeNormalize.nfc(col("s")).as("nfc"),
        UnicodeNormalize.nfkc(col("s")).as("nfkc"))
      .collect()
    assert(got(0).getString(1) == composed)
    assert(got(0).getString(2) == composed)
    assert(got(1).getString(1) == composed)
    // NFC leaves compatibility chars alone; NFKC folds them
    assert(got(2).getString(1) == compat)
    assert(got(2).getString(2) == "file A")
    assert(got(3).getString(1) == "plain ascii")
    assert(got(4).isNullAt(1) && got(4).isNullAt(2))
    // interpreted eval agrees with the codegen path above
    val expr = UnicodeNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal
        .create(decomposed), "NFC")
    assert(expr.eval(null).toString == composed)
  }

  test("nfc_normalize/nfkc_normalize register through " +
    "SparkSessionExtensions with arity checking") {
    Seq(("x", "cafe\u0301")).toDF("k", "s")
      .createOrReplaceTempView("un_sql")
    val r = spark.sql(
      "SELECT nfc_normalize(s) AS n, nfkc_normalize(s) AS nk " +
        "FROM un_sql").collect()(0)
    assert(r.getString(0) == "caf\u00e9")
    assert(r.getString(1) == "caf\u00e9")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT nfc_normalize(s, s) FROM un_sql").collect()
    }
    assert(e.getMessage.contains("nfc_normalize"), e.getMessage)
  }
}
