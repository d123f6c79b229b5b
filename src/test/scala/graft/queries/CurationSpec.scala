package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-fixture semantics for the round-10 curation operators.
  * (Oracle parity at all SFs is the driver's check; these pin the
  * operator-level contracts on corpora built to exercise them.)
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def asDocs(rows: Seq[(Long, String)]) =
    rows.map { case (id, text) =>
      (id, text, "en", "src", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  private def writeTmp(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-curation").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dd17: a doc sharing an 8-token span with another scores the " +
    "shared shingles; fully unique docs score 0") {
    val span = (1 to 8).map(i => s"shared$i").mkString(" ")
    val docs = asDocs(Seq(
      1L -> s"$span alpha beta gamma delta epsilon zeta eta theta",
      2L -> s"prefix one two three four five six seven $span",
      3L -> "only unique words appear in this third document here now"))
    val dir = writeTmp(docs)
    val got = Curation.queries("dd17_substring_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    graft.operators.ManagedCache.releaseAll()
    // doc1: 9 shingles (16 tokens), exactly 1 duplicated (the shared
    // span aligns at one position in each doc); doc3: all unique
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(3L)._3 == 0L, s"unique doc must score 0: $got")
    assert(byId(1L)._3 > 0L && byId(2L)._3 > 0L,
      s"span sharers must score > 0: $got")
    // doc1 has 16 tokens -> 9 shingles; 1 dup -> 1000/9 = 111
    assert(byId(1L) == ((1L, 9L, 111L)), s"$got")
  }

  test("tx21: a token concentrated in one doc outranks corpus-wide " +
    "stopwords there") {
    val docs = asDocs(Seq(
      1L -> "the the the zebra zebra quantum",
      2L -> "the the common words here",
      3L -> "the other common doc text"))
    val dir = writeTmp(docs)
    val got = Curation.queries("tx21_tfidf_keywords")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getString(2)))
    graft.operators.ManagedCache.releaseAll()
    val doc1 = got.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    // 'zebra': tf=2, df=1 -> score 2*3=6; 'the': tf=3, df=3 -> 3*1=3;
    // 'quantum': tf=1, df=1 -> 3
    assert(doc1.head == "zebra", s"doc1 top keyword: $doc1")
    assert(doc1.length == 3)
  }

  test("px11: the sketch threshold drops roughly the shortest " +
    "quartile, never a doc at or above the threshold bucket") {
    // 100 docs with token counts 1..100 (n_chars = 4*nt keeps the
    // estimator exact); p25 lands in the bucket holding nt=25
    val docs = (1 to 100).map(i =>
      (i.toLong, "x", "en", "s1", 4L * i - 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = writeTmp(docs)
    val got = Curation.queries("px11_percentile_prune")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    graft.operators.ManagedCache.releaseAll()
    assert(got.size == 1)
    val (_, thrLo, nTotal, nKept) = got.head
    assert(nTotal == 100L)
    // the log-bucket threshold is the bucket FLOOR at the p25 rank —
    // within one bucket width (<= 2^-3 relative) below exact 25
    assert(thrLo >= 20L && thrLo <= 25L, s"thr_lo=$thrLo")
    assert(nKept == 100L - thrLo + 1, s"thr=$thrLo kept=$nKept")
  }

  test("dd18: source pairs sharing an opening 8-token span are " +
    "paired once per fingerprint; within-source dupes never pair") {
    val opener = (1 to 8).map(i => s"tpl$i").mkString(" ")
    val rows = Seq(
      (1L, s"$opener unique tail one two three", "web"),
      (2L, s"$opener different ending here now", "book"),
      (3L, s"$opener third corpus copy", "wiki"),
      (4L, "totally different opening span for this one", "web"),
      (5L, "totally different opening span for this one", "web"))
    val docs = rows.map { case (id, text, src) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = writeTmp(docs)
    val got = Curation.queries("dd18_cross_source_overlap")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // the shared opener pairs all 3 sources; docs 4+5 share a
    // fingerprint but ONE source — no pair row
    assert(got.keySet == Set(("book", "web"), ("book", "wiki"),
      ("web", "wiki")), got.toString)
    assert(got.values.forall(_ == ((1L, 3L))), got.toString)
  }

  test("tx23: token/type/hapax counts and per-mille ratios are exact") {
    val docs = asDocs(Seq(
      1L -> "a a a b b c",        // src: 6 tokens, 3 types, 1 hapax
      2L -> "a d"))               // +2 tokens; d is a new hapax
    val dir = writeTmp(docs)
    val got = Curation.queries("tx23_vocab_census")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // corpus: tokens 8, types {a,b,c,d} = 4, hapax {c,d} = 2
    assert(got == Seq(("src", 8L, 4L, 2L, 500L, 500L)), got.toString)
  }

  test("k9: version diff classifies removed/changed/unchanged exactly " +
    "from the deterministic derivation") {
    val docs = (1 to 20).map(i =>
      (i.toLong, s"doc $i", "en", "s", 100L + i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = writeTmp(docs)
    val got = Curation.queries("k9_snapshot_diff")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // v1 = ids 1..20 except 9, 19 (18 docs); v2 drops 7, 14;
    // %5==0 surviving in both versions: 5, 10, 15, 20 change
    assert(got == Map("removed" -> 2L, "changed" -> 4L,
      "unchanged" -> 12L), got.toString)
  }

  test("xq15: pair support and integer lift are exact on planted " +
    "baskets") {
    val rows = Seq(
      // u1..u3: {click, buy}; u4: {click}; u5: {buy, view}
      (1L, 1L, "click"), (2L, 1L, "buy"),
      (3L, 2L, "click"), (4L, 2L, "buy"),
      (5L, 3L, "click"), (6L, 3L, "buy"),
      (7L, 4L, "click"), (8L, 5L, "buy"), (9L, 5L, "view"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-xq15").toString
    rows.map { case (eid, uid, t) =>
      (eid, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), uid, t,
        1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Curation.queries("xq15_cooccurrence")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    graft.operators.ManagedCache.releaseAll()
    // N=5 users; n_click=4, n_buy=4, n_view=1; (buy,click): n_ab=3,
    // lift = 1000*3*5/(4*4) = 937; (buy,view): 1000*1*5/4 = 1250
    assert(got == Map(("buy", "click") -> ((3L, 937L)),
      ("buy", "view") -> ((1L, 1250L))), got.toString)
  }

  test("ts8: week-over-week deltas are exact per-mille, including " +
    "negative weeks (both engines truncate toward zero)") {
    def atWeek(w: Int, i: Int) = new java.sql.Timestamp(
      (w.toLong * 7 * 86400 + i * 60) * 1000L)
    // type 'a': 4, 2, 6 events in weeks 0,1,2 → deltas -500, +2000
    val rows = (0 until 4).map(i => (i, 0, i)) ++
      (0 until 2).map(i => (10 + i, 1, i)) ++
      (0 until 6).map(i => (20 + i, 2, i))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ts8").toString
    rows.map { case (eid, w, i) =>
      (eid.toLong, atWeek(w, i), 1L, "a", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Curation.queries("ts8_period_over_period")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got.toSeq == Seq((0L, 4L, None), (1L, 2L, Some(-500L)),
      (2L, 6L, Some(2000L))), got.mkString(","))
  }

  test("px12: group-aware splitting has ZERO fingerprint leakage by " +
    "construction; both policies conserve the corpus") {
    val opener = (1 to 8).map(i => s"shared$i").mkString(" ")
    // 30 docs sharing one opening span + 30 unique docs, two sources
    val rows = (1 to 30).map(i =>
      (i.toLong, s"$opener tail variant number $i", if (i % 2 == 0) "a" else "b")) ++
      (31 to 60).map(i =>
        (i.toLong, s"completely unique document body $i with words ${i * 7}", "a"))
    val docs = rows.map { case (id, text, src) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = writeTmp(docs)
    val got = Curation.queries("px12_train_val_split")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    graft.operators.ManagedCache.releaseAll()
    assert(got.forall(_._6 == 0L),
      s"group-aware split must never leak: $got")
    assert(got.map(_._3).sum == 60L && got.map(_._4).sum == 60L,
      "both policies must assign every doc exactly once")
    // 30 docs share ONE fingerprint: under the naive doc-hash policy
    // they scatter across splits with overwhelming probability
    assert(got.head._5 >= 1L,
      s"planted 30-doc fingerprint should leak under naive split: $got")
  }

  test("ann7: recall is 200*hits per-mille, hits bounded by k, and " +
    "every hit really is in the exact top-5") {
    val got = Curation.queries("ann7_recall_eval")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.operators.ManagedCache.releaseAll()
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(got.forall { case (_, h, rm) => h >= 0 && h <= 5 && rm == 200 * h },
      got.mkString(","))
  }

  test("tx22: chunks cover every token exactly, overlap by 8, and " +
    "the final short chunk ends at nt") {
    val nt = 100
    val docs = asDocs(Seq(
      1L -> (1 to nt).map(i => s"t$i").mkString(" "),
      2L -> "tiny doc"))
    val dir = writeTmp(docs)
    val got = Curation.queries("tx22_chunk_overlap")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    // chunks at stride 24: starts 0,24,48,72 (72+32 >= 100) — 4 chunks
    assert(d1.map(_._3).toSeq == Seq(0L, 24L, 48L, 72L))
    assert(d1.map(_._4).toSeq == Seq(32L, 56L, 80L, 100L))
    // every consecutive pair overlaps by C-S = 8 tokens
    assert(d1.toSeq.sliding(2).forall {
      case Seq(a, b) => a._4 - b._3 == 8L
      case _ => true
    })
    // the first token witness matches the slice position
    assert(d1.map(_._5).toSeq == Seq("t1", "t25", "t49", "t73"))
    // a sub-chunk doc yields exactly one whole-doc chunk
    val d2 = got.filter(_._1 == 2L)
    assert(d2.map(t => (t._3, t._4)).toSeq == Seq((0L, 2L)))
  }
}
