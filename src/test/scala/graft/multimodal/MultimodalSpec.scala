package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing over synthetic blobs (decoders are deterministic
  * stubs — the schema/batch/partitioning contracts are what's real and
  * tested here).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromDocuments(
    graft.Tables.load(spark, sf0001, "documents").limit(20))

  test("fromDocuments builds the opaque-binary media table") {
    val row = media.orderBy("media_id").collect().head
    assert(row.getAs[Array[Byte]]("payload").nonEmpty)
    assert(row.getAs[String]("source_uri").startsWith("synthetic://"))
  }

  test("byteMetadata is pure column algebra (no decode, no shuffle)") {
    val meta = media.select(col("media_id"),
      Multimodal.byteMetadata(col("payload")).as("m"))
      .select("media_id", "m.n_bytes", "m.magic_hex", "m.content_hash")
    val rows = meta.orderBy("media_id").collect()
    assert(rows.forall(_.getInt(1) > 0)) // octet_length is IntegerType
    assert(rows.map(_.getLong(3)).distinct.length == rows.length)
  }

  test("decodeImages drops the payload, returns typed metadata, " +
    "and is deterministic") {
    val d1 = Multimodal.decodeImages(media).orderBy("media_id").collect()
    val d2 = Multimodal.decodeImages(media).orderBy("media_id").collect()
    assert(d1.toSeq == d2.toSeq, "stub decode must be deterministic")
    assert(!d1.head.schema.fieldNames.contains("payload"))
    val meta = d1.head.getStruct(d1.head.fieldIndex("image_meta"))
    assert(meta.getInt(0) >= 64 && meta.getInt(1) >= 64)
    assert(Seq("png", "jpeg", "webp").contains(meta.getString(2)))
  }

  test("embedImages feeds the existing ANN operators") {
    import graft.functions.{SimilarityFunctions => SF}
    val emb = Multimodal.embedImages(media)
    assert(emb.select(size(col("embedding"))).collect()
      .forall(_.getInt(0) == 16))
    // pseudo-embeddings flow into the same bucket/cosine operators
    val bucketed = emb.select(col("media_id"),
      SF.hyperplaneBucket(col("embedding"), 4).as("bucket"))
    assert(bucketed.collect().forall { r =>
      r.getLong(1) >= 0 && r.getLong(1) < 16 })
  }

  test("sampleFrames explodes one blob into indexed frame rows") {
    val frames = Multimodal.sampleFrames(media, everyK = 2,
      frameBytes = 64)
    val perDoc = frames.groupBy("media_id").count()
    assert(perDoc.collect().forall(_.getLong(1) >= 1))
    assert(frames.select("frame_index").distinct().count() >= 2)
    // frame indexes are the every-k subsequence
    val idx = frames.filter(col("media_id") === 6)
      .select("frame_index").collect().map(_.getInt(0)).sorted
    assert(idx.forall(_ % 2 == 0))
  }
}
