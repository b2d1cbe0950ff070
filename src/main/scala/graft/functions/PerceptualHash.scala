package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Perceptual image hashing (dHash) over REAL decoded pixels — the image
  * leg of the near-dedup family (reference analogue: the extension mandate;
  * text/embedding near-dup live in `operators/Dedup.scala` /
  * `operators/Similarity.scala`).
  *
  * dHash (difference hash): average-pool the luminance plane onto a 9×8
  * grid, then emit one bit per horizontally adjacent cell pair
  * (`cell[x] > cell[x+1]`) — 8 comparisons × 8 rows = 64 bits. Resizes,
  * recompressions and small local edits move cell AVERAGES only slightly,
  * so near-duplicate images land within a few bits of each other while
  * unrelated images differ in ~32 — the standard web-scale image dedup
  * signature (same family as the winnowing/SimHash text signatures).
  *
  * Engineering contract with the DuckDB oracle:
  *   - the hash is exposed as TWO unsigned 32-bit halves (`[lo, hi]`),
  *     never one signed 64-bit value — banding extracts 16-bit bands and
  *     Hamming sums `bit_count(xor)` per half, all of which stay inside
  *     non-negative BIGINT arithmetic in both engines;
  *   - pooling compares integer SUMS cross-multiplied by cell pixel
  *     counts (never floating-point averages), so the bit pattern is
  *     bit-reproducible by integer SQL;
  *   - luminance is the plain `r+g+b` sum — replayable, and monotone in
  *     brightness like the BT.601 weights a production kernel would use.
  *
  * All kernels are `StaticInvoke` codegen expressions ([[GraftFunctions]]):
  * the whole decode→pool→hash pass is one narrow projection inside
  * whole-stage codegen, zero shuffle — at 100 TB the hash pass is
  * embarrassingly parallel and the only shuffle in image dedup is the
  * banded candidate join on (band, 16-bit value).
  */
object PerceptualHash {

  final val GRID_W = 9 // 9 pooled columns -> 8 horizontal comparisons
  final val GRID_H = 8

  /** dHash of a decodable still image as `[lo32, hi32]` (each in
    * [0, 2^32)); bit `cy*8+cx` of the 64-bit hash (lo carries rows 0-3) is
    * set iff pooled cell (cx,cy) outweighs its right neighbour. Returns an
    * EMPTY array when no codec claims the bytes or the frame is smaller
    * than the pooling grid — callers filter on `size = 2`, mirroring the
    * NOT_IMAGE sentinel of the header probes. */
  /** Decode any claimed image to its `(w, h, r+g+b luminance)` plane —
    * pure-JVM PNG fast path (Inflater + filter undo, CRC-verified, ~5×
    * cheaper than the ImageIO dispatch for the dominant web format;
    * identical luminance by PNG losslessness, differentially spec-locked)
    * with ImageIO fallback for everything the strict parser declines
    * (other formats, interlaced, 16-bit, palette, gray, bad CRC,
    * truncation). Null when no codec claims the bytes. Shared by
    * [[dhash]] and [[dhash128]]. */
  private def decodeLum(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val fast = pngLuma(bytes)
    if (fast != null) fast
    else {
      val im = ImageCodec.readImage(bytes)
      if (im == null) return null
      val iw = im.getWidth
      val ih = im.getHeight
      val l = new Array[Int](iw * ih)
      var py = 0
      while (py < ih) {
        var px = 0
        while (px < iw) {
          val rgb = im.getRGB(px, py)
          l(py * iw + px) =
            ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
          px += 1
        }
        py += 1
      }
      (iw, ih, l)
    }
  }

  def dhash(bytes: Array[Byte]): ArrayData = {
    val dec = decodeLum(bytes)
    if (dec == null) return new GenericArrayData(Array.emptyLongArray)
    val (w, h, lum) = dec
    if (w < GRID_W || h < GRID_H) return new GenericArrayData(Array.emptyLongArray)
    // Integer luminance sums + pixel counts per pooled cell. Cell bounds
    // are floor(px*GRID/w): exact integer pooling for any dims (cells
    // differ by at most one pixel row/col in size; the comparison below
    // cross-multiplies counts so unequal cells stay integer-exact).
    val sums = new Array[Long](GRID_W * GRID_H)
    val cnts = new Array[Long](GRID_W * GRID_H)
    var py = 0
    while (py < h) {
      val cy = py * GRID_H / h
      val rowOff = py * w
      var px = 0
      while (px < w) {
        val cx = px * GRID_W / w
        val i = cy * GRID_W + cx
        sums(i) += lum(rowOff + px)
        cnts(i) += 1
        px += 1
      }
      py += 1
    }
    var lo = 0L
    var hi = 0L
    var cy = 0
    while (cy < GRID_H) {
      var cx = 0
      while (cx < GRID_W - 1) {
        val a = cy * GRID_W + cx
        val b = a + 1
        // avg(a) > avg(b) without division: sums fit 36 bits (255*3 per
        // pixel x <2^24 pixels/cell), counts 24 bits — no overflow
        if (sums(a) * cnts(b) > sums(b) * cnts(a)) {
          val bit = cy * (GRID_W - 1) + cx
          if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
        }
        cx += 1
      }
      cy += 1
    }
    new GenericArrayData(Array(lo, hi))
  }

  final val GRID_H128 = 16 // 16 pooled rows -> 8 x 16 = 128 comparison bits

  /** 128-bit dHash as FOUR unsigned 32-bit words `[w0..w3]` — the
    * wide-signature SCALE PATH for banded image near-dedup (r15): the
    * 64-bit hash's exact-for-Hamming-≤3 banding needs 16-bit bands, whose
    * 65 536-value space birthday-collides into Θ(n²/2¹⁶) spurious
    * candidates past ~10⁶ images (measured on the video leg's x64 rung
    * before its fix). Doubling the pooled rows (9×16 grid, 8 comparisons
    * × 16 rows) doubles signature length, so exact-≤3 banding uses FOUR
    * 32-BIT bands — collision space 2³², candidates ∝ true near-dup
    * density to ~10⁹ images. Same decode, same integer cross-multiplied
    * pooling, same empty-array sentinel; bit `cy·8+cx` lives in word
    * `cy/4` at position `(cy%4)·8+cx`. Finer vertical pooling also
    * sharpens discrimination (synth corpus: in-group ≤4 bits, cross-group
    * ≥49 — measured before shipping). */
  def dhash128(bytes: Array[Byte]): ArrayData = {
    val dec = decodeLum(bytes)
    if (dec == null) return new GenericArrayData(Array.emptyLongArray)
    val (w, h, lum) = dec
    if (w < GRID_W || h < GRID_H128)
      return new GenericArrayData(Array.emptyLongArray)
    val sums = new Array[Long](GRID_W * GRID_H128)
    val cnts = new Array[Long](GRID_W * GRID_H128)
    var py = 0
    while (py < h) {
      val cy = py * GRID_H128 / h
      val rowOff = py * w
      var px = 0
      while (px < w) {
        val cx = px * GRID_W / w
        val i = cy * GRID_W + cx
        sums(i) += lum(rowOff + px)
        cnts(i) += 1
        px += 1
      }
      py += 1
    }
    val words = new Array[Long](4)
    var cy = 0
    while (cy < GRID_H128) {
      var cx = 0
      while (cx < GRID_W - 1) {
        val a = cy * GRID_W + cx
        val b = a + 1
        if (sums(a) * cnts(b) > sums(b) * cnts(a))
          words(cy / 4) |= 1L << ((cy % 4) * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    new GenericArrayData(words)
  }

  /** Strict pure-JVM PNG luminance decoder for [[dhash]]'s fast path:
    * returns `(w, h, lum)` with `lum(y*w+x) = r+g+b`, or null when the
    * bytes are anything but a clean non-interlaced 8-bit truecolor PNG —
    * chunk structure, consumed-chunk CRCs and the EXACT inflated byte
    * count are all verified, so the fast path accepts a (near-)subset of
    * what ImageIO accepts and every decline falls back. Filters 0-4
    * (None/Sub/Up/Average/Paeth) are undone per the spec; losslessness
    * makes the luminance plane byte-identical to ImageIO's
    * (PerceptualHashSpec locks the differential). */
  private[graft] def pngLuma(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    if (bytes == null || bytes.length < 45) return null
    // PNG signature
    val sig = Array[Int](0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    var k = 0
    while (k < 8) { if ((bytes(k) & 0xFF) != sig(k)) return null; k += 1 }
    def u32(o: Int): Long =
      ((bytes(o) & 0xFFL) << 24) | ((bytes(o + 1) & 0xFFL) << 16) |
        ((bytes(o + 2) & 0xFFL) << 8) | (bytes(o + 3) & 0xFFL)
    def crcOk(typeOff: Int, dataLen: Int): Boolean = {
      val c = new java.util.zip.CRC32()
      c.update(bytes, typeOff, 4 + dataLen)
      c.getValue == u32(typeOff + 4 + dataLen)
    }
    var off = 8
    var w = 0; var h = 0; var colorType = -1
    val idat = new ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd) {
      if (off + 12 > bytes.length) return null
      val len = u32(off)
      if (len > bytes.length - off - 12) return null
      val dlen = len.toInt
      val ctype = new String(bytes, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      ctype match {
        case "IHDR" =>
          if (dlen != 13 || !crcOk(off + 4, dlen)) return null
          w = u32(off + 8).toInt
          h = u32(off + 12).toInt
          val bitDepth = bytes(off + 16) & 0xFF
          colorType = bytes(off + 17) & 0xFF
          val interlace = bytes(off + 20) & 0xFF
          // strict scope: 8-bit truecolor(2) only, no interlace. Gray
          // (colorType 0) is deliberately DECLINED: ImageIO gamma-maps
          // gray->sRGB (238 raw -> 247 via getRGB), so a raw-byte gray
          // fast path would diverge from the ImageIO fallback and break
          // the identical-luminance differential contract — gray PNGs
          // fall back to ImageIO instead.
          if (bitDepth != 8 || colorType != 2 ||
            interlace != 0 || w <= 0 || h <= 0 ||
            w.toLong * h > 64L * 1024 * 1024) return null
        case "IDAT" =>
          if (!crcOk(off + 4, dlen)) return null
          idat.write(bytes, off + 8, dlen)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped (their CRCs unconsumed)
      }
      off += 12 + dlen
    }
    if (colorType < 0) return null
    val bpp = if (colorType == 2) 3 else 1
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return null // truncated stream
        got += n
      }
      // the scanline grid must account for EVERY inflated byte
      if (got != raw.length || inf.inflate(new Array[Byte](1)) != 0) return null
    } catch { case _: java.util.zip.DataFormatException => return null }
    finally inf.end()
    // undo filters in place (row r data at raw[r*(stride+1)+1 ..])
    var r = 0
    while (r < h) {
      val base = r * (stride + 1)
      val filter = raw(base) & 0xFF
      if (filter > 4) return null
      var i = 0
      while (i < stride) {
        val x = raw(base + 1 + i) & 0xFF
        val a = if (i >= bpp) raw(base + 1 + i - bpp) & 0xFF else 0
        val b = if (r > 0) raw(base - stride + i) & 0xFF else 0
        val c = if (r > 0 && i >= bpp) raw(base - stride + i - bpp) & 0xFF else 0
        val rec = filter match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(base + 1 + i) = (rec & 0xFF).toByte
        i += 1
      }
      r += 1
    }
    val lum = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val base = y * (stride + 1) + 1
      var x = 0
      while (x < w) {
        lum(y * w + x) =
          if (colorType == 2)
            (raw(base + 3 * x) & 0xFF) + (raw(base + 3 * x + 1) & 0xFF) +
              (raw(base + 3 * x + 2) & 0xFF)
          else 3 * (raw(base + x) & 0xFF)
        x += 1
      }
      y += 1
    }
    (w, h, lum)
  }

  /** Deterministic synthetic PNG corpus for the image-dedup differential
    * (the harness ships no real media — same pattern as
    * [[ImageCodec.synthImage]]): docs come in groups of three (`g = id/3`),
    * a 36×32 grayscale texture whose per-pixel value is a SPATIAL-HASH
    * byte: `t = (g·73856093) ⊕ (x·19349663) ⊕ (y·83492791)` (the classic
    * xor-of-primes spatial hash), capped to 31 bits, then avalanche-mixed
    * with Knuth's multiplicative constant and read from HIGH product bits
    * (`(z·2654435761) >> 21` mod 256). The xor mixing is deliberate:
    * anything of the form f(a(g) + b(x,y)) — squares, multiplicative
    * hashes of a LINEAR index included — makes group g+1's image a
    * TRANSLATED copy of group g's (31·(−4) + 17·15 = 131 moved the whole
    * texture by (4,−15) in an earlier draft), and dHash correlates under
    * translation, planting O(n²/shift) spurious cross-group near-dup
    * pairs; the xor form admits no such translation, so cross-group
    * hashes sit near Hamming 32 while every arithmetic stays inside
    * non-overflowing BIGINT for the SQL oracle (DuckDB multiplication
    * ERRORS on 64-bit overflow rather than wrapping — full 64-bit mixers
    * are not replayable). Variants `v = id%3 ∈ {1,2}` brighten exactly
    * one pooled cell (cell (v,v)) by +8 — a small local edit, so in-group
    * pairs sit within a couple of Hamming bits. 36 = 4·9 and 32 = 4·8
    * make every pooled cell an exact 4×4 block, which the SQL oracle
    * replays with integer `x//4` grouping. Encoded by the repo's own
    * minimal PNG writer ([[encodePngGray]], r14 — ImageIO.write cost more
    * than the hash itself); [[dhash]] decodes with [[pngLuma]], and the
    * two-codec independence moves into PerceptualHashSpec, where ImageIO
    * READS these bytes and must agree pixel-for-pixel with both. */
  def synthPatternPng(id: Long): Array[Byte] = {
    val g = id / 3
    val v = (id % 3).toInt
    val w = 36
    val h = 32
    val plane = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val t = (g * 73856093L) ^ (x * 19349663L) ^ (y * 83492791L)
        val z = t & 0x7FFFFFFFL
        var lum = (((z * 2654435761L) >> 21) & 0xFF).toInt
        if (v > 0 && x / 4 == v && y / 4 == v) lum = (lum + 8) % 256
        plane(y * w + x) = lum.toByte
        x += 1
      }
      y += 1
    }
    encodePngRgbGray(w, h, plane)
  }

  /** Minimal spec-compliant PNG encoder (truecolor type 2 with r=g=b,
    * 8-bit, filter 0, one IDAT): the synthesis half of the image corpus.
    * The JDK's ImageIO.write dominated the image-dedup bench rows (~2 ms
    * per 36×32 frame — more than the whole hash), and the harness only
    * needs VALID PNG bytes for the given pixels, not the JDK's bytes.
    * Truecolor deliberately, NOT grayscale color type 0: ImageIO decodes
    * gray PNGs into a linear-gray color model whose getRGB applies a
    * gray→sRGB gamma (238 reads back as 247), which would silently skew
    * the ImageIO fallback against the oracle's raw bytes — truecolor
    * round-trips exactly. Independence of the codec paths survives in
    * PerceptualHashSpec: ImageIO READS these bytes and must agree
    * pixel-for-pixel with [[pngLuma]], so an encoder bug cannot pass
    * silently. */
  private[graft] def encodePngRgbGray(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(64 + w * h)
    out.write(Array[Int](0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte).toArray)
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length))
      val tb = ctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val c = new java.util.zip.CRC32()
      c.update(tb); c.update(data)
      out.write(tb); out.write(data); out.write(be32(c.getValue))
    }
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0))
    val stride = 3 * w
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      // raw(y*(stride+1)) = 0: filter None
      var x = 0
      while (x < w) {
        val g = gray(y * w + x)
        val o = y * (stride + 1) + 1 + 3 * x
        raw(o) = g; raw(o + 1) = g; raw(o + 2) = g
        x += 1
      }
      y += 1
    }
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zout = new ByteArrayOutputStream(raw.length / 2)
    while (!d.finished()) zout.write(buf, 0, d.deflate(buf))
    d.end()
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
