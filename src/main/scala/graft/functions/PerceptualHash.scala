package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

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
  def dhash(bytes: Array[Byte]): ArrayData = {
    val im = ImageCodec.readImage(bytes)
    if (im == null) return new GenericArrayData(Array.emptyLongArray)
    val w = im.getWidth
    val h = im.getHeight
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
      var px = 0
      while (px < w) {
        val cx = px * GRID_W / w
        val rgb = im.getRGB(px, py)
        val lum = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        val i = cy * GRID_W + cx
        sums(i) += lum
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
    * replays with integer `x//4` grouping. Encoded via `ImageIO.write`
    * (the JDK PNG ENCODER); [[dhash]] decodes through the independent
    * READER path — the same two-codec-path differential as
    * `q_mm_decode_imageio`. */
  def synthPatternPng(id: Long): Array[Byte] = {
    val g = id / 3
    val v = (id % 3).toInt
    val w = 36
    val h = 32
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val t = (g * 73856093L) ^ (x * 19349663L) ^ (y * 83492791L)
        val z = t & 0x7FFFFFFFL
        var lum = (((z * 2654435761L) >> 21) & 0xFF).toInt
        if (v > 0 && x / 4 == v && y / 4 == v) lum = (lum + 8) % 256
        im.setRGB(x, y, lum * 0x010101)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(im, "png", out)
    out.toByteArray
  }
}
