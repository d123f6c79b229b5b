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

  test("wavMeta parses a REAL PCM WAV header built with ByteBuffer " +
    "(independent of the in-plan encoder), rejects garbage") {
    // canonical 44-byte header: stereo, 44100 Hz, 16-bit, 1 s of data
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataBytes = 44100 * 2 * 2
    bb.put("RIFF".getBytes); bb.putInt(36 + dataBytes)
    bb.put("WAVE".getBytes); bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(2); bb.putInt(44100)
    bb.putInt(44100 * 2 * 2); bb.putShort(4); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataBytes)
    val rows = Seq((1L, bb.array()), (2L, "not a wav at all".getBytes))
      .toDF("id", "payload")
      .select(col("id"), Multimodal.wavMeta(col("payload")).as("m"))
      .orderBy("id").collect()
    val m = rows.head.getStruct(1)
    assert(m.getLong(0) == 1L)      // PCM
    assert(m.getLong(1) == 2L)      // channels
    assert(m.getLong(2) == 44100L)  // sample rate
    assert(m.getLong(3) == 16L)     // bits
    assert(m.getLong(4) == dataBytes.toLong)
    assert(m.getLong(5) == 1000L)   // duration
    assert(rows(1).isNullAt(1), "garbage payload must decode to null")
  }

  test("wavHeader → wavMeta round-trips every field") {
    val meta = Seq((3L, 180000L)).toDF("id", "n")
      .select(Multimodal.wavMeta(Multimodal.wavHeader(
        lit(1L), lit(16000L), lit(16L), col("n"))).as("m"))
      .collect().head.getStruct(0)
    assert(meta.getLong(1) == 1L && meta.getLong(2) == 16000L)
    assert(meta.getLong(4) == 180000L)
    // 180000 bytes / (16000 Hz * 1 ch * 2 B) = 5.625 s
    assert(meta.getLong(5) == 5625L)
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

  test("decodeImages(realDecoder): decodes an actual PNG header via " +
    "ImageIO and null-structs garbage payloads") {
    import spark.implicits._
    // a real 5x3 PNG rendered in-memory
    val img = new java.awt.image.BufferedImage(5, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(2, 1, 0xff8800)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val garbage = "definitely not an image".getBytes("UTF-8")
    val media = Seq(
      (1L, "image", png, "mem://png"),
      (2L, "image", garbage, "mem://junk"))
      .toDF("media_id", "kind", "payload", "source_uri")
    val out = Multimodal.decodeImages(media, realDecoder = true)
      .orderBy("media_id").collect()
    val ok = out(0).getStruct(out(0).fieldIndex("image_meta"))
    assert(ok.getInt(0) == 5 && ok.getInt(1) == 3)
    assert(ok.getString(2) == "png")
    assert(ok.getLong(3) == png.length.toLong)
    val bad = out(1).getStruct(out(1).fieldIndex("image_meta"))
    assert(bad.isNullAt(0) && bad.isNullAt(1) && bad.isNullAt(2))
    assert(bad.getLong(3) == garbage.length.toLong)
  }

  test("thumbnailImages(realDecoder): real PNG pixel decode + resize " +
    "with an independently computed pixel oracle") {
    // 100x60 source with a known pattern; the expected thumb pixels
    // are computed from the PATTERN FUNCTION, not from the image, so
    // the assert covers decode + nearest-neighbour geometry + hashing
    // end-to-end. PNG is lossless, so pattern round-trips exactly.
    def pattern(x: Int, y: Int): Int =
      ((x * 2 & 0xff) << 16) | ((y * 3 & 0xff) << 8) | ((x + y) & 0xff)
    val (w, h) = (100, 60)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pattern(x, y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val media = Seq((1L, "image", png, "mem://png"),
        (2L, "image", "junk".getBytes("UTF-8"), "mem://junk"))
      .toDF("media_id", "kind", "payload", "source_uri")
    val out = Multimodal
      .thumbnailImages(media, maxW = 32, maxH = 32, realDecoder = true)
      .orderBy("media_id").collect()
    val t = out(0).getStruct(out(0).fieldIndex("thumb"))
    // scale = min(32/100, 32/60) = 0.32 -> 32 x 19
    val (tw, th) = (32, 19)
    assert(t.getInt(0) == tw && t.getInt(1) == th,
      s"got ${t.getInt(0)}x${t.getInt(1)}")
    var expHash = 1125899906842597L
    for (y <- 0 until th; x <- 0 until tw)
      expHash = expHash * 31 + pattern(x * w / tw, y * h / th)
    assert(t.getLong(2) == expHash, "pixel hash diverged from the " +
      "independently computed nearest-neighbour oracle")
    // the emitted PNG body decodes back to exactly those pixels
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(t.getAs[Array[Byte]](4)))
    assert(back.getWidth == tw && back.getHeight == th)
    for (y <- 0 until th; x <- 0 until tw)
      assert((back.getRGB(x, y) & 0xFFFFFF) ==
        pattern(x * w / tw, y * h / th))
    val bad = out(1).getStruct(out(1).fieldIndex("thumb"))
    assert(bad.isNullAt(0) && bad.isNullAt(4))
  }

  test("thumbnailImages(realDecoder) handles JPEG and never upscales") {
    val img = new java.awt.image.BufferedImage(40, 20,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 20; x <- 0 until 40)
      img.setRGB(x, y, ((x * 6) << 16) | ((y * 12) << 8))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val media = Seq((1L, "image", baos.toByteArray, "mem://jpg"))
      .toDF("media_id", "kind", "payload", "source_uri")
    // box larger than the source: no upscale, dims pass through
    val rows = Multimodal
      .thumbnailImages(media, maxW = 64, maxH = 64, realDecoder = true)
      .collect()
    val t = rows(0).getStruct(rows(0).fieldIndex("thumb"))
    assert(t.getInt(0) == 40 && t.getInt(1) == 20)
    // decode is deterministic: same payload, same pixel hash
    val again = Multimodal
      .thumbnailImages(media, maxW = 64, maxH = 64, realDecoder = true)
      .collect()(0).getStruct(rows(0).fieldIndex("thumb"))
    assert(again.getLong(2) == t.getLong(2))
  }

  test("thumbnailImages stub keeps the schema contract on synthetic blobs") {
    val out = Multimodal.thumbnailImages(media, maxW = 64, maxH = 64)
      .orderBy("media_id").collect()
    assert(!out.head.schema.fieldNames.contains("payload"))
    val t = out.head.getStruct(out.head.fieldIndex("thumb"))
    assert(t.getInt(0) >= 1 && t.getInt(0) <= 64 &&
      t.getInt(1) >= 1 && t.getInt(1) <= 64)
    assert(!t.isNullAt(2) && t.isNullAt(3) && t.isNullAt(4))
  }

  test("gifFrameTable demuxes a hand-built animated GIF: global color " +
    "table, extension blocks, local color table, sub-block chains") {
    // built with ByteBuffer, independent of the in-plan gifAnimated
    // builder, and exercising every skip path the walker has
    val bos = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => bos.write(x & 0xff))
    bos.write("GIF89a".getBytes("US-ASCII"))
    b(10, 0, 20, 0)          // 10 x 20 logical screen (LE)
    b(0x91)                  // GCT present, 2^(1+1)=4 entries
    b(0, 0)                  // bg, aspect
    (1 to 4 * 3).foreach(_ => b(0xAB)) // global color table
    b(0x21, 0xF9, 4, 0, 0, 0, 0, 0)    // graphic control extension
    // frame 0: 8x6 at (1,2), no LCT, data split over TWO sub-blocks
    b(0x2C, 1, 0, 2, 0, 8, 0, 6, 0, 0x00, 0x02)
    b(3, 0x11, 0x22, 0x33, 2, 0x44, 0x55, 0)
    b(0x21, 0xFE, 5); bos.write("hello".getBytes); b(0)  // comment ext
    // frame 1: 4x4 at (0,0), LOCAL color table (2^(0+1)=2 entries)
    b(0x2C, 0, 0, 0, 0, 4, 0, 4, 0, 0x80)
    (1 to 2 * 3).foreach(_ => b(0xCD))
    b(0x02, 4, 1, 2, 3, 4, 0)
    b(0x3B)
    val gif = bos.toByteArray
    val media = Seq((7L, "video", gif, "mem://gif"),
        (8L, "video", "not a gif".getBytes("UTF-8"), "mem://junk"))
      .toDF("media_id", "kind", "payload", "source_uri")
    val out = Multimodal.gifFrameTable(media)
      .orderBy("media_id", "frame_index").collect()
    assert(out.length == 2, s"expected 2 frames, got ${out.length}")
    val f0 = out(0)
    assert(f0.getLong(0) == 7L && f0.getInt(f0.fieldIndex("frame_index")) == 0)
    assert(f0.getInt(f0.fieldIndex("x")) == 1 &&
      f0.getInt(f0.fieldIndex("y")) == 2)
    assert(f0.getInt(f0.fieldIndex("width")) == 8 &&
      f0.getInt(f0.fieldIndex("height")) == 6)
    assert(f0.getLong(f0.fieldIndex("data_bytes")) == 5L) // 3 + 2
    val f1 = out(1)
    assert(f1.getInt(f1.fieldIndex("frame_index")) == 1)
    assert(f1.getInt(f1.fieldIndex("width")) == 4 &&
      f1.getLong(f1.fieldIndex("data_bytes")) == 4L)
    // truncated container: frames before the cut still demux
    val cut = java.util.Arrays.copyOfRange(gif, 0, gif.length - 15)
    val partial = Multimodal.gifFrameTable(
      Seq((9L, "video", cut, "mem://cut"))
        .toDF("media_id", "kind", "payload", "source_uri")).collect()
    assert(partial.length == 1 &&
      partial(0).getInt(partial(0).fieldIndex("width")) == 8)
    // cut MID-SUB-BLOCK (length byte survives, its data doesn't): the
    // frame AT the cut is dropped — never emitted with data_bytes
    // counting bytes that don't exist
    val midCut = java.util.Arrays.copyOfRange(gif, 0, gif.length - 4)
    val p2 = Multimodal.gifFrameTable(
      Seq((10L, "video", midCut, "mem://midcut"))
        .toDF("media_id", "kind", "payload", "source_uri")).collect()
    assert(p2.length == 1 &&
      p2(0).getInt(p2(0).fieldIndex("width")) == 8, p2.mkString(","))
  }

  test("lzwDecode: hand-computed stream with compound codes, KwKwK, " +
    "and a width change decodes to the exact pixel sequence") {
    // min code size 2: clear=4, eoi=5, first entry=6, width starts 3.
    // Code sequence 4,1,2,6,8,3,5 hand-decoded:
    //   1 → [1]; 2 → [2] add 6="12"; 6 → [1,2] add 7="21";
    //   8 (== next entry: KwKwK) → [1,2,1] add 8="121";
    //   3 → [3] add 9; 5 = EOI.
    // Width bumps 3→4 when the dict reaches 8 (after code 6), so the
    // bit stream mixes widths; LSB-first packing gives 8C 8C 53.
    val data = Array(0x8C, 0x8C, 0x53).map(_.toByte)
    val px = Multimodal.lzwDecode(2, data, maxPixels = 100)
    assert(px.toSeq == Seq(1, 2, 1, 2, 1, 2, 1, 3), px.toSeq)
    // truncated stream: decode yields the pixels before the cut,
    // never a failure (one byte holds clear + code 1; code 2 needs
    // bits 6-8 and the cut leaves only 6-7)
    val cut = Multimodal.lzwDecode(2, data.take(1), maxPixels = 100)
    assert(cut.toSeq == Seq(1), cut.toSeq)
    // maxPixels caps allocation for forged geometry
    val capped = Multimodal.lzwDecode(2, data, maxPixels = 3)
    assert(capped.toSeq == Seq(1, 2, 1))
    // garbage: a compound code right after clear stops cleanly
    val junk = Multimodal.lzwDecode(2, Array(0xFF.toByte, 0xFF.toByte), 10)
    assert(junk.length <= 2)
  }

  test("gifFramePixels round-trips a REAL ImageIO-encoded GIF: " +
    "decoded indices map through the color table to the source RGB") {
    // a 64x48 dither-free indexed image: ImageIO's GIF writer emits a
    // genuinely compressed LZW stream (compound codes, dictionary past
    // 256 entries, 9+ bit widths) — none of which the in-plan
    // synthesis twin exercises
    val (w, h) = (64, 48)
    // explicit sRGB gray palette: TYPE_BYTE_GRAY would round-trip
    // through a linear colorspace and shift values in getRGB
    val ramp = (0 until 256).map(_.toByte).toArray
    val icm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w) {
      val g = (x * 3 + y * 5) % 256
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    // the JDK GIF writer interlaces under MODE_DEFAULT — disable so
    // the code stream is row-major and comparable positionally
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    val gif = bos.toByteArray
    val out = Multimodal.gifFramePixels(
      Seq((1L, "video", gif, "mem://imageio"))
        .toDF("media_id", "kind", "payload", "source_uri")).collect()
    assert(out.length == 1, s"expected one frame, got ${out.length}")
    val f = out.head
    assert(f.getInt(f.fieldIndex("width")) == w &&
      f.getInt(f.fieldIndex("height")) == h)
    assert(f.getInt(f.fieldIndex("n_pixels")) == w * h,
      s"decoded ${f.getInt(f.fieldIndex("n_pixels"))} of ${w * h} px")
    // independent decode for the value check: indices through the
    // file's GLOBAL color table must reproduce the source pixels
    val packed = gif(10) & 0xff
    assert((packed & 0x80) != 0, "writer should emit a global table")
    val gctN = 1 << ((packed & 7) + 1)
    def rgbAt(i: Int): Int =
      ((gif(13 + 3 * i) & 0xff) << 16) | ((gif(14 + 3 * i) & 0xff) << 8) |
        (gif(15 + 3 * i) & 0xff)
    // re-walk the container here (sub-block reassembly) so the spec
    // checks lzwDecode against ImageIO end-to-end, not via checksums
    var pos = 13 + 3 * gctN
    while ((gif(pos) & 0xff) == 0x21) { // skip extensions
      pos += 2
      while ((gif(pos) & 0xff) != 0) pos += 1 + (gif(pos) & 0xff)
      pos += 1
    }
    assert((gif(pos) & 0xff) == 0x2c, "image descriptor expected")
    val ipacked = gif(pos + 9) & 0xff
    assert((ipacked & 0x40) == 0, "writer should not interlace")
    pos += 10
    if ((ipacked & 0x80) != 0) pos += 3 * (1 << ((ipacked & 7) + 1))
    val mcs = gif(pos) & 0xff
    pos += 1
    val dataBos = new java.io.ByteArrayOutputStream()
    while ((gif(pos) & 0xff) != 0) {
      dataBos.write(gif, pos + 1, gif(pos) & 0xff)
      pos += 1 + (gif(pos) & 0xff)
    }
    val px = Multimodal.lzwDecode(mcs, dataBos.toByteArray, w * h)
    assert(px.length == w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val idx = px(y * w + x)
      assert(idx >= 0 && idx < gctN, s"index $idx outside table")
      assert(rgbAt(idx) == (img.getRGB(x, y) & 0xFFFFFF),
        s"pixel ($x,$y): palette ${rgbAt(idx)} vs image " +
          s"${img.getRGB(x, y) & 0xFFFFFF}")
    }
  }

  test("gifAnimatedPixels → gifFramePixels: in-plan synthesis decodes " +
    "to the formula, geometry masked to 16 bits") {
    val media = Seq((1L, 5, 4, 2), (2L, 65536 + 7, 3, 1))
      .toDF("media_id", "w", "h", "n")
      .select(col("media_id"), lit("video").as("kind"),
        Multimodal.gifAnimatedPixels(col("w"), col("h"), col("n"),
          (i, p) => col("media_id") * 2 + i * 3 + p).as("payload"),
        lit("mem://synth").as("source_uri"))
    val out = Multimodal.gifFramePixels(media)
      .orderBy("media_id", "frame_index").collect()
    assert(out.length == 3, out.mkString(";"))
    val f0 = out(0) // media 1, frame 0 (synthesis i=1): px p = 5 + p
    assert(f0.getInt(f0.fieldIndex("n_pixels")) == 20)
    assert(f0.getLong(f0.fieldIndex("px_sum")) ==
      (0 until 20).map(p => (5 + p) % 128).sum)
    assert(f0.getLong(f0.fieldIndex("px_wsum")) ==
      (0 until 20).map(p => ((5 + p) % 128).toLong * p).sum)
    // 65543 wraps to 7 wide, not a corrupt descriptor byte
    val g = out(2)
    assert(g.getInt(g.fieldIndex("width")) == 7 &&
      g.getInt(g.fieldIndex("height")) == 3)
    assert(g.getInt(g.fieldIndex("n_pixels")) == 21)
  }

  test("aviFrameTable demuxes a hand-built AVI: avih geometry, movi " +
    "walk, rec nesting, JUNK/idx1 skips, odd-size padding, truncation") {
    // ByteBuffer-built, independent of the in-plan aviContainer
    val bos = new java.io.ByteArrayOutputStream()
    def w(bs: Array[Byte]): Unit = bos.write(bs)
    def cc(s: String): Unit = w(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = w(java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array())
    val avih = new Array[Byte](56)
    val ab = java.nio.ByteBuffer.wrap(avih)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ab.putInt(0, 40000); ab.putInt(16, 3)
    ab.putInt(32, 320); ab.putInt(36, 240)
    // movi body: 00dc(5 bytes + pad), JUNK(4), rec [01wb(4)], 00dc(6)
    val moviBody = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("00dc".getBytes); b.write(Array[Byte](5, 0, 0, 0))
      b.write(Array[Byte](1, 2, 3, 4, 5, 0)) // odd size -> pad byte
      b.write("JUNK".getBytes); b.write(Array[Byte](4, 0, 0, 0))
      b.write(Array[Byte](9, 9, 9, 9))
      b.write("LIST".getBytes); b.write(Array[Byte](16, 0, 0, 0))
      b.write("rec ".getBytes)
      b.write("01wb".getBytes); b.write(Array[Byte](4, 0, 0, 0))
      b.write(Array[Byte](7, 7, 7, 7))
      b.write("00dc".getBytes); b.write(Array[Byte](6, 0, 0, 0))
      b.write(Array[Byte](1, 1, 2, 2, 3, 3))
      b.toByteArray
    }
    cc("RIFF"); le32(4 + 8 + 68 + 8 + 4 + moviBody.length + 8 + 4)
    cc("AVI ")
    cc("LIST"); le32(68); cc("hdrl")
    cc("avih"); le32(56); w(avih)
    cc("LIST"); le32(4 + moviBody.length); cc("movi"); w(moviBody)
    cc("idx1"); le32(4); w(Array[Byte](0, 0, 0, 0)) // index: skipped
    val avi = bos.toByteArray
    val out = Multimodal.aviFrameTable(
      Seq((5L, "video", avi, "mem://avi"),
          (6L, "video", "RIFFnope".getBytes("US-ASCII"), "mem://junk"))
        .toDF("media_id", "kind", "payload", "source_uri"))
      .orderBy("media_id", "frame_index").collect()
    assert(out.length == 3, out.mkString(";"))
    def f(i: Int, name: String) = out(i).get(out(i).fieldIndex(name))
    assert(f(0, "chunk_type") == "dc" && f(0, "size") == 5L)
    assert(f(0, "avi_width") == 320 && f(0, "avi_height") == 240)
    // movi data starts at 12 + 76 + 12 = 100; first chunk data at 108
    assert(f(0, "offset") == 108L, out(0).toString)
    // rec -nested audio chunk: stream 1, type wb, after 00dc(5+pad)
    // at 108+5+1 -> JUNK at 114+8+4=126... 01wb data at 126+12+8=146
    assert(f(1, "stream_id") == 1 && f(1, "chunk_type") == "wb")
    assert(f(1, "offset") == 108L + 5 + 1 + 8 + 4 + 8 + 4 + 8)
    assert(f(2, "chunk_type") == "dc" && f(2, "size") == 6L)
    // truncation mid-chunk: frames before the cut survive
    val cut = java.util.Arrays.copyOfRange(avi, 0, avi.length - 30)
    val p = Multimodal.aviFrameTable(
      Seq((7L, "video", cut, "mem://cut"))
        .toDF("media_id", "kind", "payload", "source_uri")).collect()
    assert(p.nonEmpty && p.length < 3)
  }

  test("aviFramePixels decodes REAL JPEG and BMP frames from a " +
    "hand-built MJPEG-style AVI; audio chunks null out") {
    def encode(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(10, 7,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 7; x <- 0 until 10)
        img.setRGB(x, y, ((x * 20) << 16) | ((y * 30) << 8) | 40)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try javax.imageio.ImageIO.write(img, fmt, ios) finally ios.close()
      bos.toByteArray
    }
    // expected sums from an INDEPENDENT decode of the same encoded
    // bytes (JPEG is lossy — the sum must match the decoder's view)
    def sumOf(bytes: Array[Byte]): Long = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      (for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        yield (img.getRGB(x, y) & 0xFFFFFF).toLong).sum
    }
    val jpeg = encode("jpg")
    val bmp = encode("bmp")
    val bos = new java.io.ByteArrayOutputStream()
    def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = bos.write(java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array())
    def chunk(id: String, data: Array[Byte]): Unit = {
      cc(id); le32(data.length); bos.write(data)
      if (data.length % 2 == 1) bos.write(0)
    }
    val pad = (n: Int) => n + (n & 1)
    val moviSz = 4 + (8 + pad(jpeg.length)) + (8 + 12) + (8 + pad(bmp.length))
    cc("RIFF"); le32(4 + 8 + 68 + 8 + moviSz); cc("AVI ")
    cc("LIST"); le32(68); cc("hdrl")
    chunk("avih", new Array[Byte](56))
    cc("LIST"); le32(moviSz); cc("movi")
    chunk("00dc", jpeg)
    chunk("01wb", new Array[Byte](12)) // audio: no decode attempt
    chunk("00dc", bmp)
    val out = Multimodal.aviFramePixels(
      Seq((1L, "video", bos.toByteArray, "mem://mjpeg"))
        .toDF("media_id", "kind", "payload", "source_uri"))
      .orderBy("frame_index").collect()
    assert(out.length == 3, out.mkString(";"))
    def g(i: Int, n: String) = out(i).get(out(i).fieldIndex(n))
    assert(g(0, "chunk_type") == "dc" && g(0, "img_width") == 10 &&
      g(0, "img_height") == 7)
    assert(g(0, "pixel_sum") == sumOf(jpeg), s"${g(0, "pixel_sum")}")
    assert(g(1, "chunk_type") == "wb" && out(1).isNullAt(
      out(1).fieldIndex("pixel_sum")))
    assert(g(2, "pixel_sum") == sumOf(bmp))
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

  test("jpegMeta walks a REAL ImageIO-encoded JPEG (geometry, SOF " +
    "kind, height-first) and degrades on garbage") {
    val img = new java.awt.image.BufferedImage(37, 23,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val media = Seq(
        (1L, "image", baos.toByteArray, "mem://jpg"),
        (2L, "image", Array[Byte](1, 2, 3, 4), "mem://junk"))
      .toDF("media_id", "kind", "payload", "source_uri")
    val out = Multimodal.jpegMeta(media).orderBy("media_id").collect()
    val r = out(0)
    assert(r.getAs[Int]("width") == 37 && r.getAs[Int]("height") == 23)
    // JDK writer emits baseline SOF0
    assert(r.getAs[Int]("sof_marker") == 0xc0)
    assert(r.getAs[Int]("n_components") == 3)
    assert(r.getAs[Int]("n_segments") >= 4) // APP0+DQT+SOF+DHT+SOS
    assert(r.getAs[Int]("header_bytes") > 0 &&
      r.getAs[Int]("header_bytes") <= baos.size)
    val junk = out(1)
    assert(junk.getAs[Int]("n_segments") == 0 &&
      junk.getAs[Int]("sof_marker") == -1)
  }

  test("pngMeta walks a REAL ImageIO-encoded PNG (chunk table, IHDR " +
    "geometry, IDAT sum) and degrades on garbage / truncation") {
    val img = new java.awt.image.BufferedImage(41, 19,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(3, 5, 0x123456) // non-trivial IDAT content
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val real = baos.toByteArray
    val media = Seq(
        (1L, "image", real, "mem://png"),
        (2L, "image", Array[Byte](1, 2, 3, 4), "mem://junk"),
        // signature + IHDR claiming 13 data bytes but truncated mid-
        // chunk: walker must stop with zero chunks, no throw
        (3L, "image", real.take(20), "mem://trunc"))
      .toDF("media_id", "kind", "payload", "source_uri")
    val out = Multimodal.pngMeta(media).orderBy("media_id").collect()
    val r = out(0)
    assert(r.getAs[Int]("width") == 41 && r.getAs[Int]("height") == 19)
    assert(r.getAs[Int]("bit_depth") == 8)
    // JDK writer emits truecolor (2) for TYPE_INT_RGB
    assert(r.getAs[Int]("color_type") == 2)
    assert(r.getAs[Int]("n_chunks") >= 3) // IHDR + IDAT... + IEND
    assert(r.getAs[Int]("has_iend") == 1)
    assert(r.getAs[Long]("idat_bytes") > 0)
    assert(r.getAs[Long]("walked_bytes") == real.length)
    assert(out(1).getAs[Int]("n_chunks") == 0 &&
      out(1).getAs[Int]("width") == -1)
    assert(out(2).getAs[Int]("n_chunks") == 0 &&
      out(2).getAs[Int]("has_iend") == 0)
  }

  test("pngSynth → pngMeta round-trip matches the arithmetic contract") {
    val media = Seq((7L, "image")).toDF("media_id", "kind")
      .select(col("media_id"), col("kind"),
        Multimodal.pngSynth(lit(640), lit(480), lit(3), lit(25))
          .as("payload"))
    val r = Multimodal.pngMeta(media).head()
    assert(r.getAs[Int]("n_chunks") == 5) // IHDR + 3 IDAT + IEND
    assert(r.getAs[Int]("width") == 640 &&
      r.getAs[Int]("height") == 480)
    assert(r.getAs[Int]("bit_depth") == 8 &&
      r.getAs[Int]("color_type") == 0)
    assert(r.getAs[Long]("idat_bytes") == 75L)
    assert(r.getAs[Long]("walked_bytes") == 8L + 25 + 3 * 37 + 12)
  }

  test("jpegMeta: truncated SOF degrades (no throw), fill FF bytes " +
    "before markers are skipped per T.81 B.1.1.2") {
    // SOI + SOF0 claiming len=2 (no geometry payload): must not read
    // past the end, and the short segment still counts
    val truncated = Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x02)
      .map(_.toByte)
    // SOI + fill FF + APP0(len=4) + EOI: the padding FF must not be
    // parsed as a length-carrying 0xFF marker
    val padded = Array(0xff, 0xd8, 0xff, 0xff, 0xe0, 0x00, 0x04,
      0x00, 0x00, 0xff, 0xd9).map(_.toByte)
    val media = Seq((1L, "image", truncated, "mem://trunc"),
        (2L, "image", padded, "mem://fill"))
      .toDF("media_id", "kind", "payload", "source_uri")
    val out = Multimodal.jpegMeta(media).orderBy("media_id").collect()
    assert(out(0).getAs[Int]("n_segments") == 1)
    assert(out(0).getAs[Int]("sof_marker") == -1) // geometry unread
    assert(out(0).getAs[Int]("width") == -1)
    assert(out(1).getAs[Int]("n_segments") == 1) // APP0 found
    assert(out(1).getAs[Int]("header_bytes") == padded.length)
  }

  // ---- POSIX ustar ----

  /** Hand-built 512-byte ustar header with a REAL checksum —
    * independent of both the walker and the in-plan synthesis.
    */
  private def tarHeader(name: String, size: Long, typeflag: Char,
      base256: Boolean = false): Array[Byte] = {
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)
    put(100, "0000644 "); put(108, "0000000 "); put(116, "0000000 ")
    if (base256) { // GNU/pax binary size: high bit + BE payload
      h(124) = 0x80.toByte
      var v = size; var i = 135
      while (i > 124) { h(i) = (v & 0xff).toByte; v >>= 8; i -= 1 }
    } else put(124, "%011o".format(size))
    put(136, "00000000000 ")
    h(156) = typeflag.toByte
    put(257, "ustar"); put(263, "00")
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = h.map(_ & 0xff).sum
    put(148, "%06o".format(sum)); h(154) = 0; h(155) = ' '.toByte
    h
  }

  private def tarOf(parts: Array[Byte]*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    parts.foreach(bos.write)
    bos.write(new Array[Byte](1024)) // two terminating zero blocks
    bos.toByteArray
  }

  private def pad512(data: Array[Byte]): Array[Byte] =
    java.util.Arrays.copyOf(data,
      ((data.length + 511) / 512) * 512)

  private def walkTar(id: Long, bytes: Array[Byte]) =
    Multimodal.tarEntries(
      Seq((id, "archive", bytes, "mem://tar"))
        .toDF("media_id", "kind", "payload", "source_uri"))
      .orderBy("entry_index").collect()

  test("tarEntries walks a hand-built ustar archive: names, sizes, " +
    "offsets, validated checksums; dirs carry no data") {
    val d1 = "hello tar".getBytes("US-ASCII")
    val t = tarOf(
      tarHeader("a/file1.txt", d1.length.toLong, '0'), pad512(d1),
      tarHeader("a/dir/", 0L, '5'),
      tarHeader("a/file2.bin", 600L, '0'), pad512(new Array[Byte](600)))
    val out = walkTar(1L, t)
    assert(out.length == 3, out.mkString(";"))
    def f(i: Int, n: String) = out(i).get(out(i).fieldIndex(n))
    assert(f(0, "name") == "a/file1.txt" && f(0, "size") == 9L)
    assert(f(0, "data_offset") == 512L && f(0, "chksum_ok") == 1)
    assert(f(1, "name") == "a/dir/" && f(1, "typeflag") == "5")
    assert(f(1, "data_offset") == 512L + 512 + 512)
    assert(f(2, "size") == 600L && f(2, "chksum_ok") == 1)
    assert(f(2, "data_offset") == 512L * 4)
    assert(out.forall(_.getAs[Int]("is_ustar") == 1))
  }

  test("tarEntries: link entries advance by header only, base-256 " +
    "sizes parse, corrupt NUL-name header does not end the walk") {
    // hard link with a (bogus but spec-legal) nonzero size field:
    // POSIX says no data blocks follow — the next header is adjacent
    val t1 = tarOf(
      tarHeader("linked", 700L, '1'),
      tarHeader("after.txt", 3L, '0'), pad512("abc".getBytes))
    val o1 = walkTar(1L, t1)
    assert(o1.length == 2, o1.mkString(";"))
    assert(o1(1).getAs[String]("name") == "after.txt")
    // link header at 0 with NO data blocks -> next header at 512,
    // whose data starts at 1024
    assert(o1(1).getAs[Long]("data_offset") == 512L + 512)
    // base-256 binary size (>8 GiB files use this; here a small one
    // so the data fits): 1000 bytes, parsed from the BE payload
    val t2 = tarOf(
      tarHeader("big.bin", 1000L, '0', base256 = true),
      pad512(new Array[Byte](1000)))
    val o2 = walkTar(2L, t2)
    assert(o2.length == 1 && o2(0).getAs[Long]("size") == 1000L)
    assert(o2(0).getAs[Int]("chksum_ok") == 1)
    // corrupt header whose name starts with NUL but whose block is
    // NOT all zero: must not terminate — the later entry survives
    val corrupt = tarHeader("x", 0L, '0')
    corrupt(0) = 0
    val t3 = tarOf(corrupt, tarHeader("ok.txt", 0L, '0'))
    val o3 = walkTar(3L, t3)
    assert(o3.length == 2, o3.mkString(";"))
    assert(o3(0).getAs[Int]("chksum_ok") == 0) // name byte changed
    assert(o3(1).getAs[String]("name") == "ok.txt")
    assert(o3(1).getAs[Int]("chksum_ok") == 1)
    // truncation mid-data: the complete header before the cut stays
    val full = tarOf(tarHeader("t.bin", 600L, '0'),
      pad512(new Array[Byte](600)))
    val o4 = walkTar(4L, java.util.Arrays.copyOfRange(full, 0, 700))
    assert(o4.length == 1 && o4(0).getAs[String]("name") == "t.bin")
  }

  test("zipEntries walks a REAL ZipOutputStream archive (incl. an " +
    "EOCD comment forcing the backward scan); garbage yields empty") {
    def realZip(comment: Option[String]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      comment.foreach(z.setComment)
      for ((name, body) <- Seq(
          ("a.txt", "hello zip"), ("dir/b.bin", "0123456789abcdef"))) {
        val bytes = body.getBytes("US-ASCII")
        val e = new java.util.zip.ZipEntry(name)
        e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(bytes.length)
        val c = new java.util.zip.CRC32(); c.update(bytes)
        e.setCrc(c.getValue)
        z.putNextEntry(e); z.write(bytes); z.closeEntry()
      }
      z.close(); bos.toByteArray
    }
    for ((cm, id) <- Seq((None, 1L),
        (Some("trailing comment, 40 bytes of it....."), 2L))) {
      val out = Multimodal.zipEntries(
        Seq((id, "archive", realZip(cm), "mem://zip"))
          .toDF("media_id", "kind", "payload", "source_uri"))
        .orderBy("entry_index").collect()
      assert(out.length == 2, s"comment=$cm: ${out.mkString(";")}")
      def f(i: Int, n: String) = out(i).get(out(i).fieldIndex(n))
      assert(f(0, "name") == "a.txt" && f(0, "uncomp_size") == 9L)
      assert(f(0, "method") == 0 && f(0, "local_offset") == 0L)
      assert(f(1, "name") == "dir/b.bin" && f(1, "uncomp_size") == 16L)
      assert(out.forall(_.getAs[Int]("local_sig_ok") == 1))
      // CRC the walker indexes must equal the one the JDK computed
      val c = new java.util.zip.CRC32()
      c.update("hello zip".getBytes("US-ASCII"))
      assert(f(0, "crc32") == c.getValue)
    }
    val junk = Multimodal.zipEntries(
      Seq((3L, "archive", "PK no dice".getBytes("US-ASCII"),
        "mem://junk"))
        .toDF("media_id", "kind", "payload", "source_uri")).collect()
    assert(junk.isEmpty)
  }

  test("zipShard synthesis round-trips through zipEntries: offsets, " +
    "sizes, crc mix, local signature probes") {
    val df = Seq(9L).toDF("doc_id").select(col("doc_id"),
      Multimodal.zipShard(lit(3), i => lit(20L) + i * 10L)
        .as("payload"))
    val out = Multimodal.zipEntries(df).orderBy("entry_index").collect()
    assert(out.length == 3, out.mkString(";"))
    def f(i: Int, n: String) = out(i).get(out(i).fieldIndex(n))
    // sizes 30, 40, 50; entry j at sum of (30+6+sz) of predecessors
    assert((0 until 3).forall(i => f(i, "name") == s"f${i + 1}.bin"))
    assert(f(0, "uncomp_size") == 30L && f(0, "local_offset") == 0L)
    assert(f(1, "local_offset") == 36L + 30)
    assert(f(2, "local_offset") == 36L + 30 + 36 + 40)
    assert(out.forall(_.getAs[Int]("local_sig_ok") == 1))
    assert(f(1, "crc32") == (40L * 2654435761L) % 4294967296L)
  }

  test("tiffPages walks a REAL ImageIO multi-page TIFF (both pages, " +
    "real geometry); BE header + garbage handled") {
    val bos = new java.io.ByteArrayOutputStream()
    val w = javax.imageio.ImageIO
      .getImageWritersByFormatName("tiff").next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    for ((iw, ih) <- Seq((31, 17), (23, 11))) {
      val img = new java.awt.image.BufferedImage(iw, ih,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      w.writeToSequence(new javax.imageio.IIOImage(img, null, null),
        null)
    }
    w.endWriteSequence(); ios.close()
    val tiff = bos.toByteArray
    val out = Multimodal.tiffPages(
      Seq((1L, "image", tiff, "mem://tiff"))
        .toDF("media_id", "kind", "payload", "source_uri"))
      .orderBy("page_index").collect()
    assert(out.length == 2, out.mkString(";"))
    def f(i: Int, n: String) = out(i).get(out(i).fieldIndex(n))
    assert(f(0, "width") == 31L && f(0, "height") == 17L)
    assert(f(1, "width") == 23L && f(1, "height") == 11L)
    assert(f(1, "next_ifd") == 0L)
    // the JDK TIFF writer emits big-endian; both orders must decode
    assert(out.forall(r => Set("II", "MM")
      .contains(r.getAs[String]("byte_order"))))
    // hand-built BIG-endian single-page header: "MM", 42, IFD at 8,
    // one SHORT width entry (inline value in the FIRST two bytes)
    val bb = java.nio.ByteBuffer.allocate(8 + 2 + 12 + 4)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
    bb.putShort(1) // one entry
    bb.putShort(256).putShort(3).putInt(1).putShort(640).putShort(0)
    bb.putInt(0)
    val beOut = Multimodal.tiffPages(
      Seq((2L, "image", bb.array(), "mem://be"))
        .toDF("media_id", "kind", "payload", "source_uri")).collect()
    assert(beOut.length == 1)
    assert(beOut(0).getAs[String]("byte_order") == "MM")
    assert(beOut(0).getAs[Long]("width") == 640L)
    assert(beOut(0).getAs[Long]("height") == -1L) // tag absent
    val junk = Multimodal.tiffPages(
      Seq((3L, "image", "IIxxnotiff".getBytes("US-ASCII"), "mem://j"))
        .toDF("media_id", "kind", "payload", "source_uri")).collect()
    assert(junk.isEmpty)
  }

  test("tiffPages: multi-count tags hold an OFFSET, not a value — " +
    "RGB BitsPerSample (count=3) reports -1, never the offset") {
    // real ImageIO RGB TIFF: BitsPerSample is written with count=3
    val bos = new java.io.ByteArrayOutputStream()
    val w = javax.imageio.ImageIO
      .getImageWritersByFormatName("tiff").next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    w.setOutput(ios)
    val img = new java.awt.image.BufferedImage(19, 13,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    w.write(img); ios.close(); w.dispose()
    val out = Multimodal.tiffPages(
      Seq((1L, "image", bos.toByteArray, "mem://rgb"))
        .toDF("media_id", "kind", "payload", "source_uri")).collect()
    assert(out.length == 1, out.mkString(";"))
    assert(out(0).getAs[Long]("width") == 19L)
    assert(out(0).getAs[Long]("height") == 13L)
    assert(out(0).getAs[Long]("bits_per_sample") == -1L,
      s"count=3 BitsPerSample must be absent, got ${out(0)}")
    // hand-built LE page whose width entry declares count=2: the
    // value field is then an offset and must not leak into width
    val bb = java.nio.ByteBuffer.allocate(8 + 2 + 12 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    bb.putShort(1)
    bb.putShort(256).putShort(3).putInt(2).putShort(640).putShort(641)
    bb.putInt(0)
    val le = Multimodal.tiffPages(
      Seq((2L, "image", bb.array(), "mem://cnt2"))
        .toDF("media_id", "kind", "payload", "source_uri")).collect()
    assert(le.length == 1 && le(0).getAs[Long]("width") == -1L)
  }

  test("tiffMulti synthesis round-trips through tiffPages: chained " +
    "IFD offsets, geometry, terminator") {
    val df = Seq(5L).toDF("doc_id").select(col("doc_id"),
      Multimodal.tiffMulti(lit(3), i => lit(200) + i,
        i => lit(90) + i * 3).as("payload"))
    val out = Multimodal.tiffPages(df).orderBy("page_index").collect()
    assert(out.length == 3, out.mkString(";"))
    def f(i: Int, n: String) = out(i).get(out(i).fieldIndex(n))
    (0 until 3).foreach { i =>
      assert(f(i, "width") == 201L + i && f(i, "height") == 93L + i * 3)
      assert(f(i, "ifd_offset") == 8L + i * 54)
      assert(f(i, "bits_per_sample") == 8L)
    }
    assert(f(2, "next_ifd") == 0L && f(1, "next_ifd") == 8L + 2 * 54)
  }

  test("tarShard synthesis round-trips through tarEntries: the " +
    "in-plan Column-algebra checksum matches the walker's byte sum") {
    val df = Seq(7L).toDF("doc_id").select(col("doc_id"),
      Multimodal.tarShard(lit(4),
        i => concat(lit("s/f"), i.cast("string"), lit(".txt")),
        i => i * lit(250) - 100, // 150, 400, 650, 900
        i => when(i === 2, lit("5")).otherwise(lit("0")))
        .as("payload"))
    val out = Multimodal.tarEntries(df).orderBy("entry_index").collect()
    assert(out.length == 4, out.mkString(";"))
    def f(i: Int, n: String) = out(i).get(out(i).fieldIndex(n))
    (0 until 4).foreach { i =>
      assert(f(i, "chksum_ok") == 1, s"entry $i checksum")
      assert(f(i, "is_ustar") == 1)
      assert(f(i, "name") == s"s/f${i + 1}.txt")
    }
    assert(f(0, "size") == 150L && f(1, "size") == 0L) // dir -> 0
    assert(f(2, "size") == 650L && f(3, "size") == 900L)
    assert(f(0, "data_offset") == 512L)
    // 150 -> 512 data; dir -> 0; 650 -> 1024
    assert(f(1, "data_offset") == 512L + 512 + 512)
    assert(f(2, "data_offset") == 512L + 512 + 512 + 512)
    assert(f(3, "data_offset") == 512L + 512 + 512 + 512 + 1024 + 512)
  }

  test("mp4Boxes walks a hand-built ISO-BMFF tree: DFS depths, " +
    "largesize (size=1), to-EOF (size=0), mvhd fields") {
    import java.nio.ByteBuffer
    def box(t: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length).put(t.getBytes("US-ASCII")).put(body)
      b.array
    }
    val mvBody = {
      val b = ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0).putInt(90000).putInt(7200)
      b.array // rest zeros
    }
    val moov = box("moov", box("mvhd", mvBody))
    // largesize box: size field 1, 64-bit size after the type
    val uuid = {
      val b = ByteBuffer.allocate(20)
      b.putInt(1).put("uuid".getBytes("US-ASCII")).putLong(20L)
        .putInt(0xdeadbeef)
      b.array
    }
    // to-EOF box: size field 0
    val mdat = {
      val b = ByteBuffer.allocate(8 + 24)
      b.putInt(0).put("mdat".getBytes("US-ASCII"))
      b.array
    }
    val ftyp = box("ftyp", "isom    "
      .getBytes("US-ASCII"))
    val payload = ftyp ++ moov ++ uuid ++ mdat
    val out = Multimodal.mp4Boxes(
      Seq((1L, "video", payload, "mem://mp4"))
        .toDF("media_id", "kind", "payload", "source_uri"))
      .orderBy("box_index").collect()
    def f(i: Int, n: String) = out(i).get(out(i).fieldIndex(n))
    assert(out.map(r => (r.getAs[String]("box_type"),
      r.getAs[Int]("depth"))).toSeq ==
      Seq(("ftyp", 0), ("moov", 0), ("mvhd", 1), ("uuid", 0),
        ("mdat", 0)))
    assert(f(0, "offset") == 0L && f(0, "box_size") == 16L)
    assert(f(1, "box_size") == 116L)          // 8 + mvhd 108
    assert(f(2, "offset") == 24L && f(2, "box_size") == 108L)
    assert(f(2, "timescale") == 90000L && f(2, "duration") == 7200L)
    assert(f(3, "box_size") == 20L)           // largesize honored
    assert(f(4, "offset") == payload.length - 32L &&
      f(4, "box_size") == 32L)                // size=0 → to EOF

    // garbage: no throw, no rows; truncated second box keeps ftyp
    val junk = Multimodal.mp4Boxes(
      Seq((2L, "video", "not a container".getBytes, "m"),
        (3L, "video", ftyp ++ Array[Byte](0, 0, 0, 99, 'm', 'o'), "m"))
        .toDF("media_id", "kind", "payload", "source_uri")).collect()
    assert(junk.count(_.getAs[Long]("media_id") == 2L) == 0)
    val t3 = junk.filter(_.getAs[Long]("media_id") == 3L)
    assert(t3.map(_.getAs[String]("box_type")).toSeq == Seq("ftyp"))
  }

  test("mp4Shard synthesis round-trips through mp4Boxes: full DFS " +
    "tree as offset arithmetic on (nTraks, mdatLen)") {
    val df = Seq(5L).toDF("doc_id").select(col("doc_id"),
      Multimodal.mp4Shard(lit(2), lit(600L), lit(1234L), lit(40L))
        .as("payload"))
    val out = Multimodal.mp4Boxes(df).orderBy("box_index").collect()
    def f(i: Int, n: String) = out(i).get(out(i).fieldIndex(n))
    assert(out.map(r => (r.getAs[String]("box_type"),
      r.getAs[Int]("depth"))).toSeq ==
      Seq(("ftyp", 0), ("moov", 0), ("mvhd", 1), ("trak", 1),
        ("tkhd", 2), ("trak", 1), ("tkhd", 2), ("mdat", 0)))
    assert(f(1, "box_size") == 116L + 200L)
    assert(f(2, "timescale") == 600L && f(2, "duration") == 1234L)
    assert(f(3, "offset") == 132L && f(5, "offset") == 232L)
    assert(f(4, "offset") == 140L && f(4, "box_size") == 92L)
    assert(f(7, "offset") == 332L && f(7, "box_size") == 48L)
  }

  test("ebmlElements walks hand-built EBML: multi-byte VINT ids and " +
    "sizes, DFS depths, uint surfacing; invalid VINT / overrun end " +
    "the level cleanly") {
    def hx(h: String): Array[Byte] = h.replaceAll("\\s", "")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // Info master (4-byte id, 1-byte size) holding TimestampScale
    // (3-byte id, 1-byte size, 2-byte value 0x0102 = 258)
    val good = hx("1549A966 86  2AD7B1 82 0102")
    val out = Multimodal.ebmlElements(
      Seq((1L, "video", good, "mem://ebml"))
        .toDF("media_id", "kind", "payload", "source_uri"))
      .orderBy("elem_index").collect()
    assert(out.map(r => (r.getAs[String]("elem_id"),
      r.getAs[Int]("depth"), r.getAs[Long]("offset"),
      r.getAs[Long]("header_len"), r.getAs[Long]("data_size"),
      r.getAs[Long]("uint_val"))).toSeq ==
      Seq(("1549A966", 0, 0L, 5L, 6L, -1L),
        ("2AD7B1", 1, 5L, 4L, 2L, 258L)))

    // 2-byte size VINT on the master (0x4006 = 6), same children
    val twoByte = hx("1549A966 4006  2AD7B1 82 0102")
    val o2 = Multimodal.ebmlElements(
      Seq((1L, "video", twoByte, "mem://ebml"))
        .toDF("media_id", "kind", "payload", "source_uri"))
      .orderBy("elem_index").collect()
    assert(o2.map(r => (r.getAs[String]("elem_id"),
      r.getAs[Long]("header_len"))).toSeq ==
      Seq(("1549A966", 6L), ("2AD7B1", 4L)))

    // malformed: zero first byte (invalid VINT) after one good
    // element keeps the prefix; a size overrunning the buffer stops
    // before emitting; garbage emits nothing but never throws
    val zeroTail = hx("D7 81 05  00 81 01")
    val o3 = Multimodal.ebmlElements(
      Seq((1L, "t", zeroTail, "m"),
        (2L, "t", hx("D7 8F 01"), "m"),        // size 15 > remaining
        (3L, "t", hx("FF"), "m"))              // lone id, no size
        .toDF("media_id", "kind", "payload", "source_uri")).collect()
    val m1 = o3.filter(_.getAs[Long]("media_id") == 1L)
    assert(m1.map(r => (r.getAs[String]("elem_id"),
      r.getAs[Long]("uint_val"))).toSeq == Seq(("D7", 5L)))
    assert(o3.count(_.getAs[Long]("media_id") == 2L) == 0)
    assert(o3.count(_.getAs[Long]("media_id") == 3L) == 0)
  }

  test("flacBlocks unpacks hand-built bit-packed STREAMINFO (44.1k " +
    "stereo 16-bit), honors the last-flag chain, and survives " +
    "truncation / garbage") {
    def hx(h: String): Array[Byte] = h.replaceAll("\\s", "")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // sr=44100 -> bytes 0A C4 4; ch=2 -> (2-1)<<1; bps=16 -> 15:
    // b12 = 0x40|0x02|0x00 = 42, b13 = 0xF0, total = 0x12345
    val si = hx("664C6143 00 000022 1000 1000 000000 000000" +
      " 0AC442 F0 00012345" + "00" * 16)
    val padLast = hx("81 000004 00000000")
    val out = Multimodal.flacBlocks(
      Seq((1L, "audio", si ++ padLast, "mem://flac"))
        .toDF("media_id", "kind", "payload", "source_uri"))
      .orderBy("block_index").collect()
    assert(out.length == 2, out.mkString(","))
    val s0 = out(0)
    assert((s0.getAs[Int]("block_type"), s0.getAs[Int]("is_last"),
      s0.getAs[Long]("block_len"), s0.getAs[Long]("sample_rate"),
      s0.getAs[Long]("n_channels"), s0.getAs[Long]("bits_per_sample"),
      s0.getAs[Long]("total_samples")) ==
      ((0, 0, 34L, 44100L, 2L, 16L, 0x12345L)), s0.toString)
    assert(out(1).getAs[Int]("block_type") == 1 &&
      out(1).getAs[Int]("is_last") == 1)
    // truncated mid-block: the complete prefix (nothing here) only;
    // garbage magic: no rows, no throw
    val junk = Multimodal.flacBlocks(Seq(
        (2L, "a", si.take(20), "m"),
        (3L, "a", "not flac at all".getBytes("UTF-8"), "m"))
      .toDF("media_id", "kind", "payload", "source_uri")).collect()
    assert(junk.isEmpty, junk.mkString(","))
  }

  test("flacShard synthesis round-trips through flacBlocks: packed " +
    "fields recovered exactly, padding chain and last-flag correct") {
    val df = Seq(7L).toDF("doc_id").select(col("doc_id"),
      Multimodal.flacShard(lit(32000L), lit(1), lit(24),
        lit(5000000000L), lit(2)).as("payload"))
    val out = Multimodal.flacBlocks(df).orderBy("block_index").collect()
    assert(out.length == 3)
    val s0 = out(0)
    assert((s0.getAs[Long]("sample_rate"), s0.getAs[Long]("n_channels"),
      s0.getAs[Long]("bits_per_sample"),
      s0.getAs[Long]("total_samples"), s0.getAs[Int]("is_last")) ==
      ((32000L, 1L, 24L, 5000000000L, 0)), s0.toString)
    assert(out.map(_.getAs[Int]("is_last")).toSeq == Seq(0, 0, 1))
    assert(out.map(_.getAs[Int]("block_type")).toSeq == Seq(0, 1, 1))
  }

  test("sniffFormat routes every synthesized family from its magic " +
    "bytes — GIF, WAV, MP4, EBML, ZIP, tar, TIFF, JPEG, PNG, BMP — " +
    "and degrades to unknown on garbage / null / short") {
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val cases: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "gif" -> Multimodal.gifHeader(lit(10L), lit(10L), lit(128L)),
      "wav" -> Multimodal.wavHeader(lit(1), lit(8000), lit(16), lit(4)),
      "mp4" -> Multimodal.mp4Shard(lit(1), lit(600L), lit(10L), lit(4L)),
      "ebml" -> Multimodal.ebmlShard(lit(1), lit(77L)),
      "avi" -> Multimodal.aviContainer(lit(4L), lit(3L), lit(2L),
        lit(40000L), _ => lit(8)),
      "flac" -> Multimodal.flacShard(lit(44100L), lit(2), lit(16),
        lit(1000L), lit(1)),
      "zip" -> Multimodal.zipShard(lit(1), _ => lit(4)),
      "tar" -> Multimodal.tarShard(lit(1),
        i => concat(lit("f"), i.cast("string")), _ => lit(4),
        _ => lit("0")),
      "tiff" -> Multimodal.tiffMulti(lit(1), _ => lit(4L), _ => lit(3L)),
      "jpeg" -> Multimodal.jpegSynth(lit(4L), lit(4L), lit(2L)),
      "png" -> lit(baos.toByteArray),
      "bmp" -> Multimodal.bmpGray(4, 3, (_, _) => lit(7)),
      "unknown" -> lit("plain text, no magic".getBytes("UTF-8")))
    val got = cases.zipWithIndex.map { case ((want, payload), i) =>
      val out = Seq(i).toDF("i")
        .select(Multimodal.sniffFormat(payload).as("f"))
        .collect().head.getString(0)
      want -> out
    }
    assert(got.forall { case (w, g) => w == g },
      got.filter(t => t._1 != t._2).mkString(","))
    val edge = Seq(0).toDF("i").select(
      Multimodal.sniffFormat(lit(null).cast("binary")).as("a"),
      Multimodal.sniffFormat(lit(Array[Byte](1, 2))).as("b"))
      .collect().head
    assert(edge.getString(0) == "unknown" && edge.getString(1) == "unknown")
  }

  test("ebmlShard synthesis round-trips through ebmlElements: the " +
    "full matroska-shaped tree as offset arithmetic on (n, ts)") {
    val df = Seq(9L).toDF("doc_id").select(col("doc_id"),
      Multimodal.ebmlShard(lit(2), lit(1000777L)).as("payload"))
    val out = Multimodal.ebmlElements(df).orderBy("elem_index").collect()
    assert(out.map(r => (r.getAs[String]("elem_id"),
      r.getAs[Int]("depth"), r.getAs[Long]("offset"))).toSeq ==
      Seq(("1A45DFA3", 0, 0L), ("4286", 1, 5L), ("4282", 1, 9L),
        ("18538067", 0, 20L), ("1549A966", 1, 26L), ("2AD7B1", 2, 31L),
        ("1654AE6B", 1, 39L), ("AE", 2, 45L), ("D7", 3, 47L),
        ("9C", 3, 50L), ("AE", 2, 53L), ("D7", 3, 55L), ("9C", 3, 58L)))
    def f(i: Int, n: String) = out(i).get(out(i).fieldIndex(n))
    assert(f(3, "data_size") == 35L)           // 19 + 8*2
    assert(f(5, "uint_val") == 1000777L)
    assert(f(8, "uint_val") == 1L && f(11, "uint_val") == 2L)
  }
}
