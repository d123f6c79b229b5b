package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit-level invariants for the LM-pipeline ops (the oracle drive
  * checks value fidelity; these check the properties the oracle can't
  * see: conservation, bounds, and scale-shape guards).
  */
class LmOpsSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) =
    LmOps.queries(name)(spark, sf0001)

  test("tx20 packing conserves tokens: bin totals sum to corpus tokens") {
    val packed = run("tx20_sequence_packing")
      .groupBy($"source").agg(sum($"n_tokens").as("packed"))
    val direct = graft.Tables.load(spark, sf0001, "documents")
      .select($"source",
        call_function("div", $"n_chars" + lit(3L), lit(4L)).as("nt"))
      .filter($"nt" >= 1)
      .groupBy($"source").agg(sum($"nt").as("direct"))
    val joined = packed.join(direct, Seq("source")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r =>
      assert(r.getAs[Long]("packed") == r.getAs[Long]("direct"),
        s"token leak in ${r.getAs[String]("source")}"))
  }

  test("tx20 packing: every bin except the last is exactly full") {
    val bins = run("tx20_sequence_packing")
      .orderBy($"source", $"bin").collect()
      .groupBy(_.getAs[String]("source"))
    bins.foreach { case (src, rows) =>
      rows.init.foreach(r =>
        assert(r.getAs[Long]("n_tokens") == 2048L,
          s"$src bin ${r.getAs[Long]("bin")} not full"))
      assert(rows.last.getAs[Long]("n_tokens") <= 2048L)
    }
  }

  test("xs8 quantiles: estimates within the 2^-3 relative error bound") {
    val est = run("xs8_hdr_quantiles").collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select($"source",
        call_function("div", $"n_chars" + lit(3L), lit(4L))
          .cast("double").as("nt"))
    val exact = docs.groupBy($"source").agg(
        expr("percentile(nt, 0.5)").as("p50"),
        expr("percentile(nt, 0.99)").as("p99"))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(est.nonEmpty && est.keySet == exact.keySet)
    for ((src, e) <- est; x = exact(src); q <- Seq("p50", "p99")) {
      val v = e.getAs[Double](q); val ex = x.getAs[Double](q)
      // bucket width ≤ 2^-3 of value; interpolated-vs-rank adds slack
      assert(math.abs(v - ex) <= 0.15 * ex + 1.0,
        s"$src $q: sketch $v vs exact $ex")
    }
  }

  test("tx19 bigram LM: higher-probability doc scores above a rare one") {
    // planted corpus: 'a b' dominates; a doc of rare bigrams must
    // score lower (smoothed probabilities reflect corpus counts)
    val docs = (Seq.fill(20)("a b") ++ Seq("q r s t"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("lmops").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = LmOps.queries("tx19_bigram_lm")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("avg_p_nano")).toMap
    assert(out(0L) > out(20L),
      s"common bigram ${out(0L)} should outscore rare ${out(20L)}")
    assert(out.values.forall(v => v > 0 && v <= 1000000000L))
  }

  test("tx19/tx20/xs8 plans: no cartesian product, no boxed rdd bridge") {
    for (q <- Seq("tx19_bigram_lm", "tx20_sequence_packing",
        "xs8_hdr_quantiles")) {
      val plan = run(q).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q has a cartesian")
    }
  }
}
