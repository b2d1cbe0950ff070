package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM WAV (RIFF/WAVE, 16-bit PCM) codec: deterministic synthesis
  * ([[synthWav]]) plus an INDEPENDENT chunk-walk parser ([[wavField]],
  * [[wavSumSq]]) — the audio leg of the multimodal surface (the same
  * synthesize-AND-independently-parse differential contract as
  * [[ImageCodec]]/[[VideoCodec]]/[[Mp4Codec]]: every decoded field is
  * predicted by doc_id arithmetic in the SQL oracle, so a defect in either
  * the writer's chunk layout or the reader's offsets hash-mismatches).
  *
  * Synthesis parameters, all id-derived:
  *   - sample rate: 8000 / 16000 / 44100 Hz by `id % 3`
  *   - channels: `1 + id % 2`; bits: 16 (PCM)
  *   - frames per channel: `50 + id % 200`
  *   - interleaved sample j: `((id*31 + j*17) % 2001) - 1000`
  * A junk `LIST` chunk is planted between `fmt ` and `data` so the parser
  * must genuinely WALK chunks (a reader that assumes `data` at a fixed
  * offset fails the differential).
  *
  * Scale shape: both kernels are `StaticInvoke`s inside whole-stage
  * codegen — O(bytes) per row, zero shuffle, no temp files; a 100 TB
  * audio corpus probes as a single embarrassingly-parallel scan. */
object AudioCodec {

  /** Sentinel for "not a RIFF/WAVE container" (mirrors Mp4Codec.NOT_MP4). */
  final val NOT_WAV: Int = Int.MinValue

  def synthWav(id: Long): Array[Byte] = {
    val rate = (id % 3) match { case 0 => 8000; case 1 => 16000; case _ => 44100 }
    val channels = (1 + id % 2).toInt
    val frames = (50 + id % 200).toInt
    val nSamples = frames * channels
    val dataBytes = nSamples * 2
    val junk = 12 // planted LIST chunk payload size
    val riffSize = 4 + (8 + 16) + (8 + junk) + (8 + dataBytes)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(rate)
    buf.putInt(rate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort) // block align
    buf.putShort(16) // bits per sample
    buf.put("LIST".getBytes("US-ASCII")).putInt(junk)
    var i = 0
    while (i < junk) { buf.put((0x80 | (i & 0x7f)).toByte); i += 1 }
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var j = 0
    while (j < nSamples) {
      buf.putShort((((id * 31 + j * 17) % 2001) - 1000).toShort)
      j += 1
    }
    buf.array()
  }

  /** Locates a chunk by fourcc via a generic RIFF walk; returns
    * (payloadOffset, payloadSize) or null. */
  private def findChunk(b: Array[Byte], fourcc: String): Array[Int] = {
    if (b.length < 12) return null
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    if (bb.getInt(0) != 0x46464952 /* RIFF */ ||
        bb.getInt(8) != 0x45564157 /* WAVE */) return null
    val want = ByteBuffer.wrap(fourcc.getBytes("US-ASCII"))
      .order(ByteOrder.LITTLE_ENDIAN).getInt(0)
    var off = 12
    while (off + 8 <= b.length) {
      val id = bb.getInt(off)
      val sz = bb.getInt(off + 4)
      if (sz < 0 || off + 8 + sz > b.length) return null
      if (id == want) return Array(off + 8, sz)
      off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    null
  }

  /** which: 0 = sample rate, 1 = channels, 2 = bits/sample,
    * 3 = frames (data bytes / block align), 4 = duration ms
    * (frames*1000/rate, truncating), 5 = peak |sample|.
    * Returns [[NOT_WAV]] when the container or needed chunk is absent. */
  def wavField(b: Array[Byte], which: Int): Int = {
    val fmt = findChunk(b, "fmt ")
    if (fmt == null || fmt(1) < 16) return NOT_WAV
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val channels = bb.getShort(fmt(0) + 2).toInt
    val rate = bb.getInt(fmt(0) + 4)
    val block = bb.getShort(fmt(0) + 12).toInt
    val bits = bb.getShort(fmt(0) + 14).toInt
    which match {
      case 0 => rate
      case 1 => channels
      case 2 => bits
      case _ =>
        val data = findChunk(b, "data")
        if (data == null || block <= 0 || rate <= 0) return NOT_WAV
        val frames = data(1) / block
        which match {
          case 3 => frames
          case 4 => (frames * 1000L / rate).toInt
          case 5 =>
            var peak = 0
            var off = data(0)
            val end = data(0) + data(1)
            while (off + 1 < end) {
              val v = bb.getShort(off).toInt
              val a = if (v < 0) -v else v
              if (a > peak) peak = a
              off += 2
            }
            peak
          case _ => NOT_WAV
        }
    }
  }

  /** Exact sum of squared samples (integer — bit-for-bit reproducible by
    * the SQL oracle's analytic replay; the RMS numerator). −1 if not WAV. */
  def wavSumSq(b: Array[Byte]): Long = {
    val data = findChunk(b, "data")
    if (data == null) return -1L
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    var acc = 0L
    var off = data(0)
    val end = data(0) + data(1)
    while (off + 1 < end) {
      val v = bb.getShort(off).toLong
      acc += v * v
      off += 2
    }
    acc
  }
}
