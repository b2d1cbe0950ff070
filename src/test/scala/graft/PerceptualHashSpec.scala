package graft

import graft.functions.PerceptualHash
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** dHash kernel semantics + the banded image near-dedup operator. */
class PerceptualHashSpec extends SparkSpec {

  private def hashOf(bytes: Array[Byte]): Option[(Long, Long)] = {
    val a = PerceptualHash.dhash(bytes)
    if (a.numElements() == 2) Some((a.getLong(0), a.getLong(1))) else None
  }

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("dhash: deterministic, halves fit u32, rejects non-images and tiny frames") {
    val png = PerceptualHash.synthPatternPng(12L)
    val h1 = hashOf(png).get
    assert(h1 == hashOf(PerceptualHash.synthPatternPng(12L)).get)
    assert(h1._1 >= 0L && h1._1 < (1L << 32) && h1._2 >= 0L && h1._2 < (1L << 32))
    assert(hashOf("not an image".getBytes).isEmpty)
    // 4x4 GIF decodes but is below the 9x8 pooling grid
    val tiny = {
      val im = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "gif", out)
      out.toByteArray
    }
    assert(hashOf(tiny).isEmpty)
  }

  test("dhash: invariant to global brightness shift, sensitive to structure") {
    // +20 brightness everywhere (clamped away from wrap) flips no comparison
    def gray(f: (Int, Int) => Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(36, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 36) {
        val l = math.min(200, math.max(0, f(x, y)))
        im.setRGB(x, y, l * 0x010101)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", out)
      out.toByteArray
    }
    val base = (x: Int, y: Int) => (x * 37 + y * 91) % 180
    val h = hashOf(gray(base)).get
    assert(hashOf(gray((x, y) => base(x, y) + 20)).get == h)
    assert(hamming(hashOf(gray((x, y) => base(y % 36, x % 32))).get, h) > 8)
  }

  test("dhash: pools any dims (same texture at 2x scale keeps the hash)") {
    def at(w: Int, h: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        // texture sampled in GRID units so scaling preserves pooled cells
        val l = ((x * 9 / w) * 53 + (y * 8 / h) * 29) % 256
        im.setRGB(x, y, l * 0x010101)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", out)
      out.toByteArray
    }
    assert(hashOf(at(36, 32)).get == hashOf(at(72, 64)).get)
    assert(hashOf(at(45, 40)).get == hashOf(at(90, 80)).get) // non-multiple dims
  }

  test("synthetic corpus: variants stay within Hamming 3, groups well separated") {
    val g0 = (0 to 2).map(i => hashOf(PerceptualHash.synthPatternPng(i.toLong)).get)
    assert(hamming(g0(0), g0(1)) <= 3 && hamming(g0(0), g0(2)) <= 3)
    val others = (1 to 40).map(g => hashOf(PerceptualHash.synthPatternPng(g * 3L)).get)
    assert(others.forall(o => hamming(g0(0), o) > 3))
  }

  test("dhashPairs: finds exactly the in-group near-dup pairs on sf0.001") {
    import graft.functions.{GraftFunctions => GF}
    GF.register(spark)
    val imgs = graft.core.Tables.documents(spark, sf0)
      .select(col("doc_id"), GF.synthPatternPng(col("doc_id")).as("payload"))
    val pairs = Dedup.dhashPairs(imgs, "doc_id", "payload").collect()
    assert(pairs.nonEmpty)
    // banding is exact for Hamming <= 3: no pair exceeds the threshold and
    // every emitted pair is da < db with both docs in the same triple-group
    assert(pairs.forall(r => r.getAs[Int]("hamming") <= 3))
    assert(pairs.forall(r => r.getAs[Long]("da") < r.getAs[Long]("db")))
    assert(pairs.forall(r => r.getAs[Long]("da") / 3 == r.getAs[Long]("db") / 3))
    // recall: a large majority of groups must surface at least one pair
    val nGroups = pairs.map(_.getAs[Long]("da") / 3).distinct.length
    val total = graft.core.Tables.documents(spark, sf0).count() / 3
    assert(nGroups >= total * 9 / 10, s"$nGroups of $total groups paired")
  }

  test("pngLuma fast path: luminance plane byte-identical to ImageIO on " +
      "the synth corpus; declines non-PNG, truncation and bit flips") {
    // differential: the pure-JVM decoder vs the ImageIO reference
    for (id <- 0L until 300L) {
      val bytes = PerceptualHash.synthPatternPng(id)
      val fast = PerceptualHash.pngLuma(bytes)
      assert(fast != null, s"fast path must accept the JDK-encoded PNG (id=$id)")
      val (w, h, lum) = fast
      val im = graft.functions.ImageCodec.readImage(bytes)
      assert(w == im.getWidth && h == im.getHeight)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = im.getRGB(x, y)
        val ref = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        assert(lum(y * w + x) == ref, s"id=$id px($x,$y)")
      }
    }
    // non-PNG formats decline (fall back to ImageIO inside dhash)
    for (id <- 0L until 12L) {
      val media = graft.functions.ImageCodec.synthImage(id)
      if ((id % 4) != 0) // 1 jpeg, 2 gif, 3 unknown — not PNG
        assert(PerceptualHash.pngLuma(media) == null, s"id=$id must decline")
    }
    // corruption: truncation and a data bit flip must be declined, never
    // mis-decoded (the CRC/exact-count strictness contract)
    val ok = PerceptualHash.synthPatternPng(7L)
    assert(PerceptualHash.pngLuma(ok.take(ok.length - 9)) == null, "truncated")
    val flipped = ok.clone()
    flipped(60) = (flipped(60) ^ 0x10).toByte // inside IDAT data
    assert(PerceptualHash.pngLuma(flipped) == null, "bit flip must fail CRC")
  }

  test("pngLuma declines grayscale (colorType 0) PNGs — ImageIO gamma-maps " +
      "gray->sRGB, so a raw-byte gray fast path would break the " +
      "identical-luminance differential; dhash still hashes them via ImageIO") {
    // a real colorType-0 PNG via ImageIO (TYPE_BYTE_GRAY encodes as gray)
    val im = new java.awt.image.BufferedImage(36, 32,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 32; x <- 0 until 36)
      im.getRaster.setSample(x, y, 0, (x * 37 + y * 91) % 200)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", out)
    val bytes = out.toByteArray
    // confirm it really is colorType 0 (offset 8+4+4+4+4+1+... : IHDR data
    // starts at 16; colorType is IHDR byte 9 -> absolute offset 25)
    assert((bytes(25) & 0xFF) == 0, "fixture must be a colorType-0 PNG")
    assert(PerceptualHash.pngLuma(bytes) == null, "gray PNG must decline")
    // and dhash still produces a hash through the ImageIO fallback, equal to
    // the hash of the gamma-corrected RGB rendering of the same pixels
    val a = PerceptualHash.dhash(bytes)
    assert(a.numElements() == 2, "dhash must fall back to ImageIO for gray")
    val rgbIm = new java.awt.image.BufferedImage(36, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 36)
      rgbIm.setRGB(x, y, im.getRGB(x, y))
    val out2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgbIm, "png", out2)
    val b = PerceptualHash.dhash(out2.toByteArray)
    assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1),
      "gray fallback hash must match the ImageIO-rendered RGB twin")
  }
}
