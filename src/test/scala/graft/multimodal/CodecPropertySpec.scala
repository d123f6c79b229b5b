package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded-random property tests for the byte-level codecs: many
  * random inputs per law, fixed seed so failures reproduce. These
  * check the DECODERS against independently-built JVM byte layouts
  * (ByteBuffer, not the repo's own synthesis helpers) and the BPE
  * merge against a direct list-walking reference — a shared bug in
  * synth+decode can't cancel out here.
  */
class CodecPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(0xC0DEC5L)

  private def canonicalWav(samples: Array[Short]): Array[Byte] = {
    val d = ByteBuffer.allocate(samples.length * 2)
      .order(ByteOrder.LITTLE_ENDIAN)
    samples.foreach(d.putShort)
    val bb = ByteBuffer.allocate(44 + samples.length * 2)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1)
      .putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
      .put(d.array())
    bb.array()
  }

  test("wavPcm16 decodes ByteBuffer-built PCM exactly, for random " +
    "sample vectors incl. extremes and the empty chunk") {
    val cases = (Array[Short]() +:
      Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue) +:
      (1 to 30).map(_ => Array.fill(rnd.nextInt(40) + 1)(
        rnd.nextInt(65536).toShort)).toSeq).zipWithIndex
    val df = cases.map { case (s, i) => (i.toLong, canonicalWav(s)) }
      .toDF("id", "payload")
    val got = df.select($"id", Multimodal.wavPcm16($"payload").as("sm"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    cases.foreach { case (s, i) =>
      assert(got(i.toLong) == s.map(_.toLong).toSeq,
        s"case $i (${s.take(5).mkString(",")}...)")
    }
  }

  test("bpeMerge equals a direct greedy list walk on random {a,b,c} " +
    "token sequences and random pairs") {
    def reference(toks: List[String], a: String,
        b: String): List[String] = toks match {
      case x :: y :: rest if x == a && y == b =>
        (a + b) :: reference(rest, a, b)
      case x :: rest => x :: reference(rest, a, b)
      case Nil => Nil
    }
    val alpha = Vector("a", "b", "c")
    val cases = (1 to 40).map { i =>
      val toks = List.fill(rnd.nextInt(12) + 1)(
        alpha(rnd.nextInt(alpha.size)))
      val pair = (alpha(rnd.nextInt(alpha.size)),
        alpha(rnd.nextInt(alpha.size)))
      (i.toLong, toks, pair._1, pair._2)
    }
    // pairs vary per case but bpeMerge takes literal pair strings —
    // group the cases by their 9 possible pairs, one plan per pair
    val byPair = cases.groupBy(c => (c._3, c._4))
    byPair.foreach { case ((a, b), cs) =>
      val sub = cs.map { case (i, toks, _, _) =>
        (i, " " + toks.mkString("  ") + " ")
      }.toDF("id", "spaced")
      val got = sub.select($"id", graft.functions.TextFunctions
          .bpeTokens(graft.functions.TextFunctions
            .bpeMerge($"spaced", a, b)).as("t"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      cs.foreach { case (i, toks, _, _) =>
        assert(got(i) == reference(toks, a, b),
          s"pair ($a,$b) over $toks")
      }
    }
  }

  test("jpegMeta recovers arbitrary geometry and COM lengths from " +
    "jpegSynth streams (beyond the oracle's mod schedule)") {
    val cases = (1 to 30).map { i =>
      (i.toLong, rnd.nextInt(65000) + 1, rnd.nextInt(65000) + 1,
        rnd.nextInt(200) + 1)
    }
    val df = cases.toDF("doc_id", "h", "w", "n")
      .select(col("doc_id"), col("h"), col("w"), col("n"),
        Multimodal.jpegSynth(col("h"), col("w"), col("n"))
          .as("payload"))
    val got = Multimodal.jpegMeta(df.select("doc_id", "payload"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Int]("n_segments"), r.getAs[Int]("header_bytes")))
      .toMap
    cases.foreach { case (id, h, w, n) =>
      assert(got(id) == ((w, h, 4, 47 + n)), s"case $id h=$h w=$w n=$n")
    }
  }
}
