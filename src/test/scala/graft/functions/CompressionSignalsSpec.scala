package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompressionSignalsSpec extends SparkSpec {
  import spark.implicits._

  // genuinely varied prose (a template-repeated "sentence i" corpus
  // deflates like spam, not like language — measured 72‰ vs this
  // paragraph's ~586‰)
  private val prose =
    "Training data pipelines filter documents by how well they " +
    "compress, because natural language occupies a characteristic " +
    "band of redundancy. Machine generated boilerplate collapses to " +
    "almost nothing under deflate, while encrypted or random " +
    "payloads barely shrink at all. Engineers who build corpus " +
    "curation systems therefore measure the compressed size of " +
    "every document against its raw length, keeping only those " +
    "whose ratio suggests ordinary human writing. The approach is " +
    "cheap, requires no model, and runs in a single pass over the " +
    "corpus, which matters when the input is measured in hundreds " +
    "of terabytes rather than megabytes. Different genres land in " +
    "slightly different places: legal text repeats formulaic " +
    "phrases, chat logs carry short bursts of novelty, and code " +
    "mixes rigid syntax with free identifiers, yet all of them " +
    "stay far from the degenerate extremes the filter removes."

  // deterministic high-entropy printable junk (~6.5 bits/char)
  private val junk = (0 until 4000).map(i =>
    (33 + (((i * 2654435761L) ^ (i * 40503L >> 5)) % 90)).toChar)
    .mkString

  private val docs = Seq(
    (1L, prose),
    (2L, "spam spam spam " * 200),                       // repetition
    (3L, junk),
    (4L, ""), (5L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("deflate ratio separates prose, repetition, and junk") {
    val r = CompressionSignals.deflateRatio(docs, "text")
      .collect().map(x => x.getAs[Long]("doc_id") ->
        x.getAs[Long]("deflate_ratio_mille")).toMap
    assert(r(2L) < 150L, s"repetition must crush: ${r(2L)}")
    assert(r(1L) > 300L && r(1L) < 800L,
      s"prose ${r(1L)} must sit in the natural band")
    assert(r(3L) > 800L, s"high-entropy text must resist: ${r(3L)}")
    assert(r(4L) == 0L && r(5L) == 0L)
  }

  test("deflate ratio is deterministic and the band filter keeps prose") {
    val a = CompressionSignals.deflateRatio(docs, "text")
      .orderBy("doc_id").collect().toSeq
    val b = CompressionSignals.deflateRatio(docs.repartition(3), "text")
      .orderBy("doc_id").collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq),
      "per-row signal must not depend on partitioning")
    val kept = CompressionSignals
      .compressionBandFilter(docs, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(2L) && !kept.contains(3L))
  }

  test("plan stays a single mapPartitions over the scan — no shuffle") {
    val plan = CompressionSignals.deflateRatio(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
