package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM MJPEG/AVI video container codec — retires the last multimodal
  * stub (r11 verdict #7). No video *codec* ships in the JDK, but MJPEG
  * needs none: an AVI (RIFF) container whose `movi` chunks are ordinary
  * JPEG frames, each decodable by the JDK's own ImageIO reader
  * ([[ImageCodec]]). The write path here builds a spec-shaped AVI
  * (RIFF/hdrl/avih/strl/movi, little-endian sizes, even-byte chunk
  * padding); the read path is an independent RIFF chunk walk. Agreement
  * between the two — and between the container header dims and the
  * per-frame ImageIO decode — is what the arithmetic oracle checks.
  *
  * Scale shape: [[aviField]] reads only the header chunks (O(header)
  * probe, like ImageCodec's dim probes); [[aviFrames]] is the per-row
  * container→frames splitter a `posexplode` fans out, keeping the whole
  * frame table inside one codegen projection with zero shuffle.
  */
object VideoCodec {

  /** Sentinel for "not an AVI container" (mirrors [[ImageCodec.NOT_IMAGE]]). */
  final val NOT_AVI: Int = Int.MinValue

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Build a valid AVI wrapping MJPEG frames for `id`: `2 + id%4` frames,
    * frame k a solid `(8+id%97+k) × (8+id%53)` JPEG (ImageIO.write — the
    * same independent encoder the still-image differential uses) with RGB
    * `(id%256, (id/3)%256, (id/7)%256)`. Dims/counts are pure doc_id
    * arithmetic so a SQL oracle predicts every decoded field. */
  def synthAvi(id: Long): Array[Byte] = {
    val nf = (2 + id % 4).toInt
    val w0 = (8 + id % 97).toInt
    val h0 = (8 + id % 53).toInt
    val rgb = (((id % 256) << 16) | (((id / 3) % 256) << 8) | ((id / 7) % 256)).toInt
    val frames = (0 until nf).map { k =>
      val im = new java.awt.image.BufferedImage(w0 + k, h0,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h0) {
        var x = 0; while (x < w0 + k) { im.setRGB(x, y, rgb); x += 1 }; y += 1
      }
      val out = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", out)
      out.toByteArray
    }
    wrapAvi(frames, w0, h0)
  }

  /** Frames per near-dup-group video ([[synthAviGroup]]). */
  final val GroupVideoFrames: Int = 4

  /** Video near-dup GROUP synthesis (r15 — the video leg of the dedup
    * family): an AVI whose [[GroupVideoFrames]] frame chunks carry PNG
    * payloads in the [[PerceptualHash.synthPatternPng]] style (the
    * container's RIFF walk is payload-agnostic and [[PerceptualHash
    * .dhash]] decodes each frame losslessly, keeping the whole pixel
    * chain replayable by the SQL oracle — JPEG frames would not be).
    * Groups of three (`g = id/3`): frame f's 36×32 texture is the
    * xor-of-primes spatial hash with the frame index mixed in as a
    * fourth xor term (`⊕ f·15485863` — xor, not addition, for the same
    * anti-translation reason synthPatternPng documents), avalanche-read
    * from high product bits. Variant `v = id%3 ∈ {1,2}` brightens cell
    * (v, v) of FRAME v by +8 — a single-frame local edit, so
    * base↔variant total signature Hamming stays ≤ 3 while cross-group
    * signatures sit near Hamming 128 (4 frames × ~32). */
  def synthAviGroup(id: Long): Array[Byte] = {
    val g = id / 3
    val v = (id % 3).toInt
    val w = 36
    val h = 32
    val frames = (0 until GroupVideoFrames).map { f =>
      val plane = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val t = (g * 73856093L) ^ (x * 19349663L) ^ (y * 83492791L) ^
            (f * 15485863L)
          val z = t & 0x7FFFFFFFL
          var lum = (((z * 2654435761L) >> 21) & 0xFF).toInt
          if (v > 0 && f == v && x / 4 == v && y / 4 == v) lum = (lum + 8) % 256
          plane(y * w + x) = lum.toByte
          x += 1
        }
        y += 1
      }
      PerceptualHash.encodePngRgbGray(w, h, plane)
    }
    wrapAvi(frames, w, h)
  }

  private def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
    val padded = if (payload.length % 2 == 1) payload :+ 0.toByte else payload
    val bb = ByteBuffer.allocate(8 + padded.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(fourcc(cc)).putInt(payload.length).put(padded)
    bb.array()
  }

  private def list(listType: String, body: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(fourcc("LIST")).putInt(4 + body.length).put(fourcc(listType)).put(body)
    bb.array()
  }

  /** Wrap frame payloads in a spec-shaped AVI container
    * (RIFF/hdrl/avih/strl/movi, little-endian sizes, even-byte padding). */
  private def wrapAvi(frames: Seq[Array[Byte]], w0: Int, h0: Int): Array[Byte] = {
    val nf = frames.length
    val avih = { // MainAVIHeader: 56 bytes, all uint32le
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(33333) // dwMicroSecPerFrame (~30 fps)
        .putInt(0).putInt(0).putInt(0)
        .putInt(nf)    // dwTotalFrames
        .putInt(0)
        .putInt(1)     // dwStreams
        .putInt(0)
        .putInt(w0).putInt(h0)
        .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
      bb.array()
    }
    val strh = { // AVIStreamHeader: 56 bytes
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(fourcc("vids")).put(fourcc("MJPG"))
        .putInt(0).putInt(0).putInt(0)
        .putInt(1)   // dwScale
        .putInt(30)  // dwRate
        .putInt(0)
        .putInt(nf)  // dwLength (frames)
        .putInt(0).putInt(-1).putInt(0)
        .putShort(0).putShort(0)
        .putShort(w0.toShort).putShort(h0.toShort) // rcFrame
      bb.array()
    }
    val strf = { // BITMAPINFOHEADER: 40 bytes
      val bb = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(w0).putInt(h0)
        .putShort(1).putShort(24)
        .put(fourcc("MJPG"))
        .putInt(w0 * h0 * 3)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      bb.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    val bb = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(fourcc("RIFF")).putInt(body.length).put(body)
    bb.array()
  }

  private def isAvi(b: Array[Byte]): Boolean =
    b.length >= 24 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  private def u32le(b: Array[Byte], off: Int): Long =
    if (off + 4 > b.length) -1L
    else ((b(off) & 0xFFL)) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def cc(b: Array[Byte], off: Int): String =
    if (off + 4 > b.length) ""
    else new String(b, off, 4, "US-ASCII")

  /** Walk the chunks of a LIST body `[start, end)`, invoking `f(fourcc,
    * payloadOff, payloadLen)` per chunk (LIST children are passed with
    * fourcc = their list type and the body after it). Truncation-safe: a
    * declared size past `end` stops the walk instead of reading garbage. */
  private def walk(b: Array[Byte], start: Int, end: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var off = start
    while (off + 8 <= end) {
      val id = cc(b, off)
      val len = u32le(b, off + 4)
      if (len < 0 || off + 8 + len > end) return
      if (id == "LIST" && len >= 4)
        f(cc(b, off + 8), off + 12, (len - 4).toInt)
      else
        f(id, off + 8, len.toInt)
      off += 8 + len.toInt
      if (len % 2 == 1) off += 1 // chunks are even-aligned
    }
  }

  /** Locate the `avih` header payload offset, or -1. */
  private def findAvih(b: Array[Byte]): Int = {
    if (!isAvi(b)) return -1
    var found = -1
    walk(b, 12, math.min(b.length, 12 + u32le(b, 4).toInt - 4)) {
      case ("hdrl", off, len) =>
        walk(b, off, off + len) {
          case ("avih", aOff, aLen) if aLen >= 40 && found < 0 => found = aOff
          case _ => ()
        }
      case _ => ()
    }
    found
  }

  /** Header-only container probe. `which`: 0 = width, 1 = height,
    * 2 = declared total frames (avih), 3 = ACTUAL `00dc` frame chunk count
    * (a movi walk — still O(container directory), no pixel decode).
    * Returns [[NOT_AVI]] when the bytes are not a RIFF/AVI container or
    * the header is corrupt/truncated. */
  def aviField(bytes: Array[Byte], which: Int): Int = {
    val a = findAvih(bytes)
    if (a < 0) return NOT_AVI
    which match {
      case 0 => u32le(bytes, a + 32).toInt // dwWidth
      case 1 => u32le(bytes, a + 36).toInt // dwHeight
      case 2 => u32le(bytes, a + 16).toInt // dwTotalFrames
      case 3 => splitFrames(bytes).length
      case _ => NOT_AVI
    }
  }

  /** Catalyst kernel shape of [[splitFrames]]: `StaticInvoke` hands array
    * results back as internal `ArrayData` (binary elements stay plain
    * byte arrays), same convention as [[TextHashes.minhash]]. */
  def aviFrames(bytes: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      splitFrames(bytes).asInstanceOf[Array[Any]])

  /** Split the container into its frame payloads (the `00dc` chunk bytes —
    * for MJPEG each is a standalone JPEG, decodable by
    * [[ImageCodec.imageField]]/[[ImageCodec.imagePixel0]]). Empty array
    * for non-AVI bytes, so a mixed-corpus `posexplode` silently drops
    * non-video rows. */
  def splitFrames(bytes: Array[Byte]): Array[Array[Byte]] = {
    if (!isAvi(bytes)) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    walk(bytes, 12, math.min(bytes.length, 12 + u32le(bytes, 4).toInt - 4)) {
      case ("movi", off, len) =>
        walk(bytes, off, off + len) {
          case ("00dc", fOff, fLen) if fLen > 0 =>
            out += java.util.Arrays.copyOfRange(bytes, fOff, fOff + fLen)
          case _ => ()
        }
      case _ => ()
    }
    out.toArray
  }
}

/** Pure-JVM ISO-BMFF (MP4) METADATA codec — upgrades the planted `ftyp`
  * rows from the stub fallback to a real header probe (round 12). No MP4
  * *video* codec ships in the JDK, so pixels stay undecodable, but the
  * container metadata that a curation pipeline actually filters on —
  * track dimensions, timescale, duration — lives in plain big-endian
  * boxes (`moov`/`mvhd`, `trak`/`tkhd`) and needs no codec at all. The
  * write path builds a spec-shaped box tree (ftyp + moov(mvhd, trak(tkhd))
  * + mdat); the read path is an independent box walk; the unknown-codec
  * FALLBACK path stays exercised by planted EBML-magic rows
  * ([[synthUnknown]]) that nothing here parses.
  *
  * Scale shape: [[mp4Field]] touches only the box headers — an O(header)
  * probe inside one codegen projection, like [[VideoCodec.aviField]]. */
object Mp4Codec {

  /** Sentinel for "not an MP4 container" (mirrors [[VideoCodec.NOT_AVI]]). */
  final val NOT_MP4: Int = Int.MinValue

  /** Movie timescale used by [[synthMp4]] (units per second). */
  final val Timescale: Int = 600

  private def cc4(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Deterministic dims/duration for `id` — same dim arithmetic as the
    * still-image synthesizer so the oracle shares one formula. */
  def widthOf(id: Long): Int = (8 + id % 97).toInt
  def heightOf(id: Long): Int = (8 + id % 53).toInt
  def durationOf(id: Long): Int = (1 + id % 240).toInt * Timescale

  /** A minimal structurally-valid MP4: `ftyp` + `moov`(`mvhd` v0 +
    * `trak`(`tkhd` v0)) + a small `mdat`. All sizes/fields big-endian per
    * ISO/IEC 14496-12; tkhd width/height are 16.16 fixed point. */
  def synthMp4(id: Long): Array[Byte] = {
    val mvhd = ByteBuffer.allocate(108)
    mvhd.putInt(108).put(cc4("mvhd"))
      .putInt(0)                    // version + flags
      .putInt(0).putInt(0)          // creation, modification
      .putInt(Timescale)
      .putInt(durationOf(id))
      .putInt(0x00010000)           // rate 1.0
      .putShort(0x0100.toShort)     // volume 1.0
      .putShort(0)
      .putLong(0L)                  // reserved
      .putInt(0x00010000).putInt(0).putInt(0) // unity matrix
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0) // predefined
      .putInt(2)                    // next track id
    val tkhd = ByteBuffer.allocate(92)
    tkhd.putInt(92).put(cc4("tkhd"))
      .putInt(7)                    // version 0, flags: enabled|in-movie|in-preview
      .putInt(0).putInt(0)          // creation, modification
      .putInt(1)                    // track id
      .putInt(0)                    // reserved
      .putInt(durationOf(id))
      .putLong(0L)                  // reserved
      .putShort(0).putShort(0)      // layer, alternate group
      .putShort(0).putShort(0)      // volume (video: 0), reserved
      .putInt(0x00010000).putInt(0).putInt(0) // unity matrix
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
      .putInt(widthOf(id) << 16)    // 16.16 fixed
      .putInt(heightOf(id) << 16)
    val trak = ByteBuffer.allocate(100)
    trak.putInt(100).put(cc4("trak")).put(tkhd.array())
    val moov = ByteBuffer.allocate(8 + 108 + 100)
    moov.putInt(8 + 108 + 100).put(cc4("moov")).put(mvhd.array()).put(trak.array())
    val mdatPayload = Array.tabulate[Byte](16)(i => ((id + i) % 251).toByte)
    val out = ByteBuffer.allocate(20 + moov.capacity() + 8 + 16)
    out.putInt(20).put(cc4("ftyp")).put(cc4("isom")).putInt(0x200).put(cc4("isom"))
      .put(moov.array())
      .putInt(8 + 16).put(cc4("mdat")).put(mdatPayload)
    out.array()
  }

  /** A planted UNKNOWN container (EBML/Matroska magic + id-derived bytes):
    * no codec in this engine parses it, so it keeps the documented stub
    * fallback path exercised now that MP4 probes for real. */
  def synthUnknown(id: Long): Array[Byte] = {
    val out = ByteBuffer.allocate(16)
    out.putInt(0x1A45DFA3) // EBML magic
    // OR the high bit into each byte of the id-derived words: non-ASCII
    // filler can never spell a four-character box type ("ftyp" etc.), so
    // the unknown blob can't coincidentally pass mp4Field's container
    // check for ids congruent to a box-type word (r12 advice).
    out.putInt(((id % 0x7FFFFFFF).toInt) | 0x80808080)
      .putInt((((id * 31) % 0x7FFFFFFF).toInt) | 0x80808080)
    out.putInt(0)
    out.array()
  }

  private def u32be(b: Array[Byte], off: Int): Long =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.BIG_ENDIAN).getInt.toLong & 0xFFFFFFFFL

  private def typeAt(b: Array[Byte], off: Int): String =
    new String(b, off + 4, 4, "US-ASCII")

  /** Walk sibling boxes in [start, end); calls `f(type, boxStart, size)`. */
  private def walkBoxes(b: Array[Byte], start: Int, end: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var off = start
    while (off + 8 <= end) {
      val size = u32be(b, off)
      if (size < 8 || off + size > end) return // corrupt/truncated: stop
      f(typeAt(b, off), off, size.toInt)
      off += size.toInt
    }
  }

  private def findBox(b: Array[Byte], start: Int, end: Int, want: String): Int = {
    var found = -1
    walkBoxes(b, start, end) { (t, off, _) => if (t == want && found < 0) found = off }
    found
  }

  /** Header-only metadata probe. `which`: 0 = track width (integer part),
    * 1 = track height, 2 = movie timescale, 3 = movie duration,
    * 4 = top-level box count. Returns [[NOT_MP4]] unless the bytes start
    * with a well-formed `ftyp` and carry the queried box intact. */
  def mp4Field(bytes: Array[Byte], which: Int): Int = {
    if (bytes.length < 16 || typeAt(bytes, 0) != "ftyp") return NOT_MP4
    if (which == 4) {
      var n = 0
      walkBoxes(bytes, 0, bytes.length)((_, _, _) => n += 1)
      return n
    }
    val moov = findBox(bytes, 0, bytes.length, "moov")
    if (moov < 0) return NOT_MP4
    val moovEnd = moov + u32be(bytes, moov).toInt
    which match {
      case 2 | 3 =>
        val mvhd = findBox(bytes, moov + 8, moovEnd, "mvhd")
        // bound by the box's own DECLARED size, not the file length — an
        // undersized mvhd followed by a sibling box would otherwise read
        // the sibling's bytes as fields (r12 review)
        if (mvhd < 0 || u32be(bytes, mvhd) < 32 || mvhd + 28 > bytes.length) NOT_MP4
        else if ((bytes(mvhd + 8) & 0xFF) != 0) NOT_MP4 // v1 (64-bit) unsupported
        else u32be(bytes, mvhd + (if (which == 2) 20 else 24)).toInt
      case 0 | 1 =>
        val trak = findBox(bytes, moov + 8, moovEnd, "trak")
        if (trak < 0) return NOT_MP4
        val trakEnd = trak + u32be(bytes, trak).toInt
        val tkhd = findBox(bytes, trak + 8, trakEnd, "tkhd")
        if (tkhd < 0 || u32be(bytes, tkhd) < 92 || tkhd + 92 > bytes.length) NOT_MP4
        else if ((bytes(tkhd + 8) & 0xFF) != 0) NOT_MP4
        else (u32be(bytes, tkhd + (if (which == 0) 84 else 88)) >> 16).toInt
      case _ => NOT_MP4
    }
  }
}
