package graft

import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal plumbing: schema, determinism, and feature sanity of the
  * partition-batched extractor (decode step stubbed — see Multimodal). */
class MultimodalSpec extends SparkSpec {

  test("withBlob: binary payload + metadata struct") {
    val b = Multimodal.withBlob(Tables.documents(spark, sf0), "text")
    assert(b.schema("payload").dataType.typeName == "binary")
    val meta = b.select("media_meta.mime", "media_meta.n_bytes", "media_meta.digest").head()
    assert(meta.getString(0) == "text/plain")
    assert(meta.getLong(1) > 0)
    assert(meta.getString(2).length == 32)
  }

  test("extractFeatures: deterministic, schema'd, entropy within [0,8]") {
    val blobs = Multimodal.withBlob(Tables.documents(spark, sf0), "text")
    val f1 = Multimodal.extractFeatures(blobs, "doc_id", "payload").orderBy("doc_id").collect()
    val f2 = Multimodal.extractFeatures(blobs, "doc_id", "payload").orderBy("doc_id").collect()
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == Tables.documents(spark, sf0).count())
    assert(f1.forall { r =>
      val e = r.getDouble(3)
      e >= 0.0 && e <= 8.0 && r.getLong(1) > 0 && r.getInt(4) >= 64 && r.getInt(5) >= 64
    })
  }

  test("frameSample: short payloads clip at the end, empty payloads drop") {
    import spark.implicits._
    val docs = Seq((1L, "tiny"), (2L, ""), (3L, "x" * 100)).toDF("doc_id", "text")
    val out = Multimodal.frameSample(
        Multimodal.withBlob(docs, "text"), "doc_id", "payload", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // empty payload contributes no frames; others exactly 4 each
    assert(out.count(_._1 == 2L) == 0)
    assert(out.count(_._1 == 1L) == 4 && out.count(_._1 == 3L) == 4)
    // "tiny" = 4 bytes: offsets 1,2,3,4 (1-based), windows clip to the end
    val tiny = out.filter(_._1 == 1L).sortBy(_._2)
    assert(tiny.map(_._3).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(tiny.head._4 == "74696E79") // hex("tiny"), clipped at 4 bytes
    assert(tiny.last._4 == "79")       // last frame = final byte only
  }

  test("bmpField kernel: little-endian header parse, top-down sign, magic sniff") {
    import graft.functions.TextHashes
    import java.nio.{ByteBuffer, ByteOrder}
    // handcrafted header — independent of the Column-side synthesis
    def bmp(w: Int, h: Int, bpp: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(54 + 3).order(ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(57).putInt(0).putInt(54)
      bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(bpp.toShort)
      bb.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
      bb.put(Array[Byte](1, 2, 3))
      bb.array()
    }
    assert(TextHashes.bmpField(bmp(640, 480, 24), 0) == 640)
    assert(TextHashes.bmpField(bmp(640, 480, 24), 1) == 480)
    assert(TextHashes.bmpField(bmp(640, 480, 24), 2) == 24)
    assert(TextHashes.bmpField(bmp(7, -1080, 8), 1) == -1080) // top-down raw
    assert(TextHashes.bmpField(bmp(640, 480, 24), 3) == 57)   // declared bfSize
    assert(TextHashes.bmpField("BMnot-a-real-header".getBytes, 0) == TextHashes.NOT_BMP)
    assert(TextHashes.bmpField("plain text payload that is longer than fifty-four bytes....".getBytes, 0) == TextHashes.NOT_BMP)
  }

  test("decode flags truncated payloads: declared bfSize > bytes on hand") {
    import spark.implicits._
    import java.nio.{ByteBuffer, ByteOrder}
    def bmpDeclaring(size: Int, payloadBytes: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(54 + payloadBytes).order(ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
      bb.putInt(40).putInt(640).putInt(480).putShort(1).putShort(24)
      bb.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
      bb.put(Array.fill[Byte](payloadBytes)(7))
      bb.array()
    }
    val rows = Seq(
      (1L, bmpDeclaring(54 + 100, 3), "image/bmp"),  // header claims 100 pixel bytes, 3 present
      (2L, bmpDeclaring(54 + 3, 3), "image/bmp"),    // intact
      (3L, "plain text far longer than a bmp header would ever need here".getBytes, "text/plain"))
      .toDF("doc_id", "payload", "mime")
    val out = Multimodal.decode(rows, "doc_id", "payload", "mime")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(7), "declared size past the payload must flag truncated")
    assert(out(1L).getInt(3) == 640, "dims still reported — the flag carries the honesty")
    assert(!out(2L).getBoolean(7), "intact bmp is not truncated")
    assert(!out(3L).getBoolean(7), "stub path never claims truncation")
  }

  test("synthesizeBmp + decode: JVM parse returns the planted dims; stub for text") {
    import spark.implicits._
    val docs = Seq((3L, "pixel-bytes-here"), (21L, "topdown"), (4L, "not an image"))
      .toDF("doc_id", "text")
    val out = Multimodal.decode(
        Multimodal.synthesizeBmp(docs, "doc_id", "text"), "doc_id", "payload", "mime")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 3: bmp, w=16+3%497=19, h=16+3%293=19, bottom-up, bpp=8 (odd id)
    assert(out(3L).getString(2) == "bmp" && out(3L).getInt(3) == 19 &&
      out(3L).getInt(4) == 19 && !out(3L).getBoolean(5) && out(3L).getInt(6) == 8)
    assert(out(3L).getLong(8) == 54L + "pixel-bytes-here".length)
    assert(!out(3L).getBoolean(7), "synthesized bmp declares its exact size")
    // doc 21: divisible by 21 → stored top-down (negative height field)
    assert(out(21L).getString(2) == "bmp" && out(21L).getBoolean(5) &&
      out(21L).getInt(4) == 16 + 21 % 293)
    // doc 4: text/plain → stub dims, no decode
    assert(out(4L).getString(2) == "stub" && out(4L).getString(1) == "text/plain" &&
      out(4L).getInt(3) >= 64 && out(4L).getInt(6) == 0)
  }

  test("ImageCodec kernels: synth round-trips through ImageIO; corrupt bytes fall to sentinel") {
    import graft.functions.ImageCodec
    for (id <- Seq(0L, 1L, 2L, 41L, 42L, 43L, 420L)) {
      val bytes = ImageCodec.synthImage(id)
      (id % 4) match {
        case 3 => // video: no still-image reader claims any container;
          // id%8==3 is a real AVI, id%16==7 a real MP4 box tree,
          // id%16==15 the planted unknown (EBML magic)
          assert(ImageCodec.imageField(bytes, 2) == ImageCodec.NOT_IMAGE)
          val isAvi = graft.functions.VideoCodec.aviField(bytes, 0) !=
            graft.functions.VideoCodec.NOT_AVI
          assert(isAvi == (id % 8 == 3))
          val isMp4 = graft.functions.Mp4Codec.mp4Field(bytes, 0) !=
            graft.functions.Mp4Codec.NOT_MP4
          assert(isMp4 == (id % 16 == 7))
        case k =>
          assert(ImageCodec.imageField(bytes, 2) == k + 1) // 1 png, 2 jpeg, 3 gif
          assert(ImageCodec.imageField(bytes, 0) == 8 + id % 97)
          assert(ImageCodec.imageField(bytes, 1) == 8 + id % 53)
          if (k != 1) { // lossless only: JPEG pixel values are decoder-dependent
            val want = (((id % 256) << 16) | (((id / 3) % 256) << 8) | ((id / 7) % 256)).toInt
            assert(ImageCodec.imagePixel0(bytes) == want)
          }
      }
    }
    // magic matches but the payload is truncated garbage -> sentinel, not a throw
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 0, 0)
    assert(ImageCodec.imageField(corrupt, 0) == ImageCodec.NOT_IMAGE)
    assert(ImageCodec.imagePixel0(corrupt) == -1)
    assert(ImageCodec.imageField("plain text payload".getBytes("UTF-8"), 2) == ImageCodec.NOT_IMAGE)
  }

  test("decodeMedia: per-row magic dispatch, header dims, lossless pixel check, real video") {
    val docs = Tables.documents(spark, sf0).select(org.apache.spark.sql.functions.col("doc_id"))
    val media = Multimodal.synthesizeMedia(docs, "doc_id")
    val out = Multimodal.decodeMedia(media, "doc_id", "payload", "mime")
      .orderBy("doc_id").collect()
    assert(out.length == docs.count())
    out.foreach { r =>
      val id = r.getLong(0)
      val codec = r.getString(2)
      (id % 4) match {
        case 0 => assert(codec == "png" && r.getInt(5) ==
          (((id % 256) << 16) | (((id / 3) % 256) << 8) | ((id / 7) % 256)).toInt)
        case 1 => assert(codec == "jpeg" && r.isNullAt(5))
        case 2 => assert(codec == "gif" && !r.isNullAt(5))
        case _ if id % 8 == 3 => // real MJPEG/AVI: container dims, lossy → no pixel0
          assert(codec == "mjpeg" && r.isNullAt(5))
        case _ if id % 16 == 7 => // real ISO-BMFF: tkhd dims, no pixels by design
          assert(codec == "mp4" && r.isNullAt(5))
        case _ => assert(codec == "stub" && r.getInt(3) == 0 && r.getInt(4) == 0)
      }
      if (id % 4 < 3 || id % 8 == 3 || id % 16 == 7) {
        assert(r.getInt(3) == 8 + id % 97)
        assert(r.getInt(4) == 8 + id % 53)
      }
    }
  }

  test("VideoCodec: synth AVI round-trips the RIFF walk; frames decode via ImageIO") {
    import graft.functions.{ImageCodec, VideoCodec}
    for (id <- Seq(3L, 11L, 19L, 427L)) {
      val avi = VideoCodec.synthAvi(id)
      val nf = (2 + id % 4).toInt
      assert(VideoCodec.aviField(avi, 0) == 8 + id % 97)
      assert(VideoCodec.aviField(avi, 1) == 8 + id % 53)
      assert(VideoCodec.aviField(avi, 2) == nf, "declared frame count")
      val frames = VideoCodec.splitFrames(avi)
      assert(frames.length == nf, "movi 00dc chunk count")
      for ((f, k) <- frames.zipWithIndex) {
        assert(ImageCodec.imageField(f, 2) == 2, "frame is a JPEG")
        assert(ImageCodec.imageField(f, 0) == 8 + id % 97 + k)
        assert(ImageCodec.imageField(f, 1) == 8 + id % 53)
      }
    }
    // non-AVI bytes: sentinel / empty, never a throw — including a
    // truncated RIFF whose declared sizes run past the buffer
    assert(VideoCodec.aviField("not a container".getBytes("UTF-8"), 0) == VideoCodec.NOT_AVI)
    assert(VideoCodec.splitFrames(Array[Byte]('R', 'I', 'F', 'F', 9, 0, 0, 0)).isEmpty)
    val truncated = VideoCodec.synthAvi(3L).take(64)
    assert(VideoCodec.splitFrames(truncated).isEmpty)
  }

  test("resizePlan: aspect preserved, never upscales, dims at least 1") {
    import spark.implicits._
    val docs = Seq((1L, "abcdef"), (2L, "z")).toDF("doc_id", "text")
    val out = Multimodal.resizePlan(
        Multimodal.withBlob(docs, "text"), "doc_id", "payload", 64)
      .collect()
    out.foreach { r =>
      val (sw, sh) = (r.getInt(1), r.getInt(2))
      val (ow, oh) = (r.getInt(4), r.getInt(5))
      val s = r.getDouble(3)
      assert(s <= 1.0 && ow >= 1 && oh >= 1 && ow <= 64 && oh <= 64)
      assert(ow <= sw && oh <= sh) // never upscale
    }
  }

  test("Mp4Codec: synth round-trips the box walk; truncation and EBML fall to sentinel") {
    import graft.functions.Mp4Codec
    for (id <- Seq(7L, 23L, 103L, 1007L)) {
      val b = Mp4Codec.synthMp4(id)
      assert(Mp4Codec.mp4Field(b, 0) == 8 + id % 97)
      assert(Mp4Codec.mp4Field(b, 1) == 8 + id % 53)
      assert(Mp4Codec.mp4Field(b, 2) == Mp4Codec.Timescale)
      assert(Mp4Codec.mp4Field(b, 3) == (1 + id % 240) * Mp4Codec.Timescale)
      assert(Mp4Codec.mp4Field(b, 4) == 3) // ftyp + moov + mdat
      // truncated mid-moov: sentinel, not a throw or a garbage read
      val cut = java.util.Arrays.copyOfRange(b, 0, 40)
      assert(Mp4Codec.mp4Field(cut, 0) == Mp4Codec.NOT_MP4)
      assert(Mp4Codec.mp4Field(Mp4Codec.synthUnknown(id), 0) == Mp4Codec.NOT_MP4)
      assert(graft.functions.VideoCodec.aviField(b, 0) ==
        graft.functions.VideoCodec.NOT_AVI, "AVI reader must not claim MP4 bytes")
    }
  }
}
