package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{ImageIO, ImageReader}

/** Real image decode via the JDK's own `javax.imageio` readers (PNG, JPEG,
  * GIF, BMP ship with every JDK — no external codec libs, zero egress).
  * This narrows the multimodal decode stub to video only: every still-image
  * format a training-data pipeline commonly meets decodes for real.
  *
  * Scale shape: format dispatch is a pure byte-magic sniff (no reader
  * involved for non-media rows — the common case in a mixed corpus), and
  * `ImageReader` instances are cached per thread per format, so a 100 TB
  * scan constructs O(threads × formats) readers, not O(rows). Header-only
  * probes (`imageField`) call `reader.getWidth/getHeight(0)`, which read
  * just the header — no pixel decode, no full-payload pass. All kernels are
  * exposed as `StaticInvoke` Catalyst expressions (see [[GraftFunctions]]),
  * keeping the projection inside whole-stage codegen.
  */
object ImageCodec {

  // ImageIO's default stream cache backs every Image{Input,Output}Stream
  // with a disk temp file — created and deleted PER ROW, and fatal on a
  // read-only or full java.io.tmpdir. Memory-cache streams keep the whole
  // path heap-only (payloads here are already in-memory byte arrays).
  ImageIO.setUseCache(false)

  /** Sentinel for "no image format claimed these bytes" (mirrors
    * [[TextHashes.NOT_BMP]]). */
  final val NOT_IMAGE: Int = Int.MinValue

  /** Byte-magic sniff — the per-row dispatch cost for non-media payloads.
    * Returns the ImageIO format name, or null when no known still-image
    * magic matches. */
  private def sniff(b: Array[Byte]): String = {
    if (b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 && (b(2) & 0xFF) == 0xFF) "jpeg"
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "gif"
    else if (b.length >= 54 && b(0) == 'B' && b(1) == 'M') "bmp"
    else null
  }

  private def formatCode(fmt: String): Int = fmt match {
    case "png" => 1
    case "jpeg" => 2
    case "gif" => 3
    case "bmp" => 4
    case _ => NOT_IMAGE
  }

  /** Per-thread reader cache: ImageReader is stateful (not thread-safe) but
    * reusable via setInput — the documented pattern for bulk decode. */
  private val readers = new ThreadLocal[java.util.HashMap[String, ImageReader]] {
    override def initialValue(): java.util.HashMap[String, ImageReader] =
      new java.util.HashMap[String, ImageReader]()
  }

  private def withReader[A](bytes: Array[Byte])(f: ImageReader => A): Option[A] = {
    val fmt = sniff(bytes)
    if (fmt == null) return None
    val cache = readers.get()
    var r = cache.get(fmt)
    if (r == null) {
      val it = ImageIO.getImageReadersByFormatName(fmt)
      if (!it.hasNext) return None
      r = it.next()
      cache.put(fmt, r)
    }
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      r.setInput(iis)
      try Some(f(r))
      catch { case _: Exception => None } // magic matched but header/pixels corrupt
      finally r.reset() // detach from the stream we are about to close
    } finally iis.close()
  }

  /** Header-only probe. `which`: 0 = width, 1 = height, 2 = format code
    * (1 png, 2 jpeg, 3 gif, 4 bmp). Returns [[NOT_IMAGE]] when no reader
    * claims the bytes or the header is corrupt — callers fall through to
    * the video/unknown stub. Reads ONLY the header (`getWidth(0)` — no
    * pixel decode), so probing a 100 MB media blob costs header bytes. */
  def imageField(bytes: Array[Byte], which: Int): Int =
    withReader(bytes) { r =>
      which match {
        case 0 => r.getWidth(0)
        case 1 => r.getHeight(0)
        case 2 => formatCode(r.getFormatName.toLowerCase(java.util.Locale.ROOT))
        case _ => NOT_IMAGE
      }
    }.getOrElse(NOT_IMAGE)

  /** Full pixel decode of frame 0; returns the top-left pixel's RGB (24-bit,
    * 0xRRGGBB) or -1 when undecodable. Deterministic for lossless formats
    * (PNG/GIF); JPEG pixel values are decoder-dependent, so callers gate
    * this to lossless codecs when an exact oracle replays it. */
  def imagePixel0(bytes: Array[Byte]): Int =
    withReader(bytes) { r => r.read(0).getRGB(0, 0) & 0xFFFFFF }.getOrElse(-1)

  /** Full frame-0 pixel decode through the cached per-thread readers, or
    * null when no still-image codec claims the bytes (the [[PerceptualHash]]
    * entry point — same dispatch + reader reuse as the header probes, so a
    * 100 TB hash pass constructs O(threads × formats) readers). */
  def readImage(bytes: Array[Byte]): BufferedImage =
    withReader(bytes) { r => r.read(0) }.orNull

  /** Deterministic media synthesis for the decode differential (the harness
    * tables carry no real media). `id % 4`: 0 → PNG, 1 → JPEG, 2 → GIF —
    * a solid `8+id%97 × 8+id%53` image filled with RGB
    * `(id%256, (id/3)%256, (id/7)%256)`, ENCODED by `ImageIO.write` (the
    * write path) and later decoded by the reader path above — two
    * independent codec paths whose agreement the arithmetic oracle checks;
    * 3 → video: a REAL MJPEG/AVI container ([[VideoCodec.synthAvi]] —
    * id%8==3) or a minimal MP4 `ftyp` box (id%8==7 — the deliberate
    * unknown-codec row that keeps the stub FALLBACK path exercised: no MP4
    * codec ships in the JDK, and a mixed corpus always contains formats
    * the engine cannot decode). */
  def synthImage(id: Long): Array[Byte] = {
    (id % 4) match {
      case 3 if id % 8 == 3 => VideoCodec.synthAvi(id)
      case 3 if id % 16 == 7 => Mp4Codec.synthMp4(id) // real box tree (r12)
      case 3 => Mp4Codec.synthUnknown(id) // id%16==15: the stub-fallback row
      case k =>
        val w = (8 + id % 97).toInt
        val h = (8 + id % 53).toInt
        val rgb = (((id % 256) << 16) | (((id / 3) % 256) << 8) | ((id / 7) % 256)).toInt
        val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) { var x = 0; while (x < w) { im.setRGB(x, y, rgb); x += 1 }; y += 1 }
        val out = new ByteArrayOutputStream()
        ImageIO.write(im, Seq("png", "jpg", "gif")(k.toInt), out)
        out.toByteArray
    }
  }
}
