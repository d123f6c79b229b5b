package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-data behavior checks for the retrieval/matching module
  * (the three-SF DuckDB replay is the numeric gate; these pin the
  * semantics a replay can't see — ranking direction, blocking reach,
  * weight bias, hand-computed LM scores).
  */
class MatchingSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("match").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("ir1: tf raises and length normalization lowers the score") {
    val dir = docsDir(Seq(
      (1L, "spark spark spark"),
      (2L, "spark " + Seq.fill(60)("filler").mkString(" ")),
      (3L, "nothing relevant here")))
    val out = Matching.queries("ir1_bm25")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(out.keySet == Set(1L, 2L), "only term-hitting docs retrieved")
    assert(out(1L) > out(2L),
      s"3×tf short doc must outrank 1×tf long doc: $out")
  }

  test("er1: same-block near-identical names match, cross-block never") {
    val dir = java.nio.file.Files.createTempDirectory("er").toString
    Seq((1L, "red widget"), (2L, "red widget"), (3L, "red widgets"),
      (4L, "blue bolt"))
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val rows = Matching.queries("er1_entity_pairs")(spark, dir)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    // (1,2) exact at band 1.0; (1,3) and (2,3) at jw 0.98 (jaro
    // 0.9697, prefix-4 boost); 'blue bolt' in its own block → no pair
    assert(rows.toSet == Set((1.0, 1L, 33L), (0.98, 2L, 99L)), rows.toSeq)
  }

  test("px15: selection is deterministic and weight-biased") {
    val heavy = (0 until 110).map(i => (i.toLong, "h" * 5000))
    val light = (200 until 250).map(i => (i.toLong, "x"))
    val dir = docsDir(heavy ++ light)
    val q = Matching.queries("px15_weighted_sample")(spark, dir)
    val sel = q.collect().map(_.getLong(0)).toSet
    assert(sel.size == 100)
    val nHeavy = sel.count(_ < 200L)
    // weights 5000 vs 1: P(any 1-char doc beating a heavy doc's
    // priority) is tiny; demand a near-total heavy sweep
    assert(nHeavy >= 98, s"weighted sample ignored weights: $nHeavy")
    assert(q.collect().map(_.getLong(0)).toSet == sel, "not deterministic")
  }

  test("px16: rare sources upsample, common ones downsample, size holds") {
    val dir = java.nio.file.Files.createTempDirectory("tmix").toString
    ((0 until 900).map(i => (i.toLong, "big")) ++
      (1000 until 1100).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
      .withColumn("text", lit("x")).withColumn("lang", lit("en"))
      .withColumn("n_chars", lit(1L))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Matching.queries("px16_temperature_resample")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    // α=0.7: q_big≈0.823 ⇒ rate≈0.91 (downsample); q_small≈0.177 ⇒
    // rate≈1.77 (upsample); resampled total stays ≈ corpus size
    assert(out("big")._2 < 1.0 && out("small")._2 > 1.0, out.toString)
    val total = out.values.map(_._3).sum
    assert(math.abs(total - 1000L) < 50, s"resampled total $total")
    assert(math.abs(out("small")._3 - 177L) < 25, out("small").toString)
  }

  test("rankedTopK: score-desc order, doc_id tiebreak, k cutoff") {
    val df = Seq((10L, 1.0), (11L, 3.0), (12L, 3.0), (13L, 2.0),
      (14L, 0.5)).toDF("doc_id", "sc")
    val out = Matching.rankedTopK(df, "sc", 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // ties at 3.0 break on doc_id; 14 misses the k=3 cut
    assert(out.toSeq == Seq((11L, 1L, 3.0), (12L, 2L, 3.0),
      (13L, 3L, 2.0)), out.toSeq)
  }

  test("ir2: both-arm docs outrank single-arm docs; rrf hand-checked") {
    val dir = docsDir(Seq(
      (1L, "spark spark spark"), (2L, "spark"), (3L, "nothing here")))
    Seq((0L, Seq(1f, 0f, 0f), 0), (1L, Seq(0f, 0f, 1f), 0),
      (2L, Seq(1f, 0f, 0f), 0), (3L, Seq(0.5f, 0.5f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // lex: 1→rank1, 2→rank2; sem (vs vec0): 2→rank1 (cos 1),
    // 3→rank2 (0.70711), 1→rank3 (0). Fused: doc2 = 1/62+1/61,
    // doc1 = 1/61+1/63, doc3 = 1/62 — doc2 > doc1 > doc3.
    val out = Matching.queries("ir2_hybrid_rrf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq(2L, 1L, 3L), out.toSeq)
    assert(out(0)._2 ==
      BigDecimal(1.0 / 62 + 1.0 / 61)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      out.toSeq)
  }

  test("tx25: hand-computed add-one bigram score") {
    val dir = docsDir(Seq((7L, "a b a b")))
    val r = Matching.queries("tx25_bigram_lm")(spark, dir).collect()(0)
    // bigrams (a,b),(b,a),(a,b); c2(a,b)=2 c2(b,a)=1; c1(a)=2 c1(b)=1;
    // V=2 ⇒ avg_lp = (ln(3/4) + ln(2/3) + ln(3/4)) / 3 = −0.3269
    assert(r.getLong(0) == 7L)
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == -0.3269, r.toString)
  }
}
