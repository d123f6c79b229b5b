package graft.queries

import graft.SparkSpec
import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** Invariant specs for the pipeline composites — the oracle gate
  * checks engine-vs-engine equality; these pin the SEMANTICS on
  * crafted fixtures (planted duplicates, known funnels, degenerate
  * docs) where the expected answer is known by construction.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("dd6 clusters are the transitive closure: A~B, B~C with no " +
    "direct A~C still collapse to one keeper") {
    // doc 1 and 3 share nothing directly; both overlap doc 2
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "epsilon zeta eta theta iota kappa lambda mu"),
      (4L, "totally different words entirely here now"))
      .toDF("doc_id", "text")
    val p = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.wordShingles(col("text"), 2))
        .as("sh"))
    val counts = p.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val edges = p.as("a").join(p.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
      .agg(count(lit(1)).as("ni"))
      .join(counts.select(col("doc_id").as("src"), col("n").as("na")),
        Seq("src"))
      .join(counts.select(col("doc_id").as("dst"), col("n").as("nb")),
        Seq("dst"))
      .filter(col("ni").cast("double") /
        (col("na") + col("nb") - col("ni")).cast("double") >= 0.3)
      .select(col("src"), col("dst"))
    val got = ConnectedComponents.dedupClusters(
      docs.select(col("doc_id").as("id")), edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(got == Set((1L, 1L, 1), (2L, 1L, 0), (3L, 1L, 0),
      (4L, 4L, 1)))
  }

  test("sx1 stratified sampling is reproducible and respects strata " +
    "rates roughly") {
    val q = Pipeline.queries("sx1_stratified_sample")
    val a = q(spark, sf0001).collect()
    val b = q(spark, sf0001).collect()
    assert(a.toSeq == b.toSeq, "hash sampling must be deterministic")
    // en is sampled at 10%, the rest at 50% — across any corpus the
    // en keep-rate must be well below the others'
    val byLang = a.groupBy(_.getString(1)).map { case (k, v) =>
      k -> v.length }
    val total = graft.Tables.load(spark, sf0001, "documents")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = byLang.getOrElse("en", 0).toDouble / total("en")
    val otherKept = (byLang - "en").values.sum.toDouble
    val otherTotal = (total - "en").values.sum.toDouble
    assert(enRate < otherKept / otherTotal,
      s"en rate $enRate should be far below ${otherKept / otherTotal}")
  }

  test("px3 flags a planted eval near-duplicate and ignores clean docs") {
    // doc 3 (train) is a copy of doc 1 (eval, doc_id < 10)
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (11L, "one two three four five six seven eight nine ten"),
      (12L, "completely unrelated text with different tokens here ok"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("px3_docs")
    val grams = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.wordShingles(col("text"), 5))
        .as("gram"))
    val evalG = grams.filter(col("doc_id") < 10)
      .select(col("gram")).distinct().withColumn("hit", lit(1))
    val out = grams.filter(col("doc_id") >= 10)
      .join(broadcast(evalG), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
      .select(col("doc_id"),
        (col("n_hit").cast("double") / col("n_grams") >= 0.5)
          .cast("int").as("flagged"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(11L -> 1, 12L -> 0))
  }

  test("ts1 LOCF fills interior gaps with the last value and marks " +
    "them filled") {
    val out = TimeSeries.queries("ts1_resample_locf")(spark, sf0001)
    val rows = out.collect()
    // gap rows exist, every gap row carries a non-null carried value
    val filled = rows.filter(_.getInt(3) == 1)
    assert(filled.nonEmpty, "the event stream must have hour gaps")
    assert(filled.forall(!_.isNullAt(2)),
      "LOCF must carry a value into every gap after the first hour")
    // per user, the carried value equals the previous hour's value
    val byUser = rows.groupBy(_.getLong(0))
    byUser.values.foreach { rs =>
      val sorted = rs.sortBy(_.getString(1))
      sorted.sliding(2).foreach {
        case Array(prev, cur) if cur.getInt(3) == 1 =>
          assert(cur.getDouble(2) == prev.getDouble(2),
            s"gap hour must carry previous value: $prev -> $cur")
        case _ => ()
      }
    }
  }

  test("xs3 bloom filter has zero false negatives by construction") {
    val out = Sketches.queries("xs3_bloom_join")(spark, sf0001)
      .collect().head
    assert(out.getLong(out.fieldIndex("n_missed")) == 0L)
    assert(out.getLong(out.fieldIndex("n_candidates")) >=
      out.getLong(out.fieldIndex("n_exact")))
  }

  test("px2 funnel stages are monotonically non-increasing") {
    val ns = Pipeline.queries("px2_prep_funnel")(spark, sf0001)
      .collect().map(_.getLong(2))
    assert(ns.length == 5)
    assert(ns.sliding(2).forall { case Array(a, b) => b <= a },
      s"funnel must shrink: ${ns.toSeq}")
  }

  test("dd13 removes corpus-wide duplicate chunks, keeps the first " +
    "occurrence by (doc_id, chunk_idx), and partial tail chunks " +
    "participate") {
    val dir = java.nio.file.Files
      .createTempDirectory("dd13fix").toString
    Seq(
      (0L, "a b c d e f g h i j k l m n o p"), // both chunks original
      (1L, "a b c d e f g h x y"), // chunk0 dups doc0; tail "x y" kept
      (2L, "i j k l m n o p"), // whole doc dups doc0's chunk1
      (3L, "x y")) // dups doc1's TAIL chunk (later (doc_id,ci) loses)
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = TrainingData.queries("dd13_chunk_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (0L, "a b c d e f g h i j k l m n o p", 2L, 0L),
      (1L, "x y", 2L, 1L),
      (2L, "", 1L, 1L),
      (3L, "", 1L, 1L)))
  }
}
