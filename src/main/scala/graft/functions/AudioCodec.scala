package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

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

  /** Frames per synthesized near-dup-group clip: [[FpWindows]] windows of
    * exactly 8 frames each, so the oracle's window of sample j is j/8. */
  final val GroupFrames: Int = 520

  /** Fingerprint windows (65 energies → 64 adjacent-comparison bits). */
  final val FpWindows: Int = 65

  /** Near-dup GROUP synthesis (the audio leg of the dedup family, r14):
    * mono 8000 Hz 16-bit PCM, [[GroupFrames]] frames, base signal keyed by
    * the GROUP id (`id/3`) through the xor-of-primes + Knuth-avalanche
    * spatial hash (the `ImageCodec.synthPatternPng` pattern — a LINEAR
    * congruential base was tried first and produced ~7k cross-group
    * Hamming-≤3 collisions on 500 docs, because an additive offset only
    * rotates the residue sequence and adjacent-window energy comparisons
    * survive rotation; the avalanche de-correlates groups to the expected
    * ~zero): sample j =
    * `(((id/3)·73856093 xor j·19349663) % 2³¹) · 2654435761 >> 21) % 2001 − 1000`.
    * Variant k = `id % 3` > 0 adds +100 to every sample of window `13·k`
    * (frames [104k, 104k+8)) — a localized loudness edit, the audio
    * analogue of [[PerceptualHash.synthPatternPng]]'s single-cell edit: it
    * can move only the two fingerprint bits adjacent to that window, so
    * base↔variant Hamming ≤ 2 BY CONSTRUCTION while cross-group
    * fingerprints are pseudo-random (expected Hamming ≈ 32). Same planted
    * LIST chunk as [[synthWav]] so the parse path still walks chunks. */
  def synthWavGroup(id: Long): Array[Byte] = {
    val rate = 8000
    val frames = GroupFrames
    val g = id / 3
    val k = (id % 3).toInt
    val dataBytes = frames * 2
    val junk = 12
    val riffSize = 4 + (8 + 16) + (8 + junk) + (8 + dataBytes)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(1) // mono
    buf.putInt(rate)
    buf.putInt(rate * 2)
    buf.putShort(2) // block align
    buf.putShort(16)
    buf.put("LIST".getBytes("US-ASCII")).putInt(junk)
    var i = 0
    while (i < junk) { buf.put((0x80 | (i & 0x7f)).toByte); i += 1 }
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var j = 0
    while (j < frames) {
      val m = ((g * 73856093L) ^ (j * 19349663L)) % 2147483648L
      var v = ((m * 2654435761L >> 21) % 2001L - 1000L).toInt
      if (k > 0 && j / 8 == 13 * k) v += 100
      buf.putShort(v.toShort)
      j += 1
    }
    buf.array()
  }

  /** 64-bit audio fingerprint over the decoded PCM (chromaprint-shaped,
    * integer-exact): frames split into [[FpWindows]] equal-occupancy
    * windows (window of frame f = `f·65/frames`, truncating), per-window
    * energy = Σ sample² across all channels (exact integer), bit i =
    * `e(i+1) > e(i)` for i = 0..63, packed as two u32 halves `[lo, hi]`
    * (bit i of `lo` for i < 32, bit i−32 of `hi` otherwise) — the same
    * (lo, hi) signature contract as [[PerceptualHash.dhash]], so the
    * banded-LSH pairing is shared. Empty array when the container is not
    * WAV or has fewer than 65 frames (callers filter on `size = 2`).
    * A loudness edit confined to one window moves only the ≤ 2 bits that
    * compare against that window — the property that makes Hamming
    * distance a near-dup measure for locally-edited audio. */
  def audioFp(b: Array[Byte]): ArrayData = {
    val fmt = findChunk(b, "fmt ")
    val data = findChunk(b, "data")
    if (fmt == null || fmt(1) < 16 || data == null)
      return new GenericArrayData(Array.emptyLongArray)
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val channels = bb.getShort(fmt(0) + 2).toInt
    val block = bb.getShort(fmt(0) + 12).toInt
    val bits = bb.getShort(fmt(0) + 14).toInt
    // the frame loop below consumes channels*2 bytes per frame, which is
    // only the declared frame size for 16-bit PCM; an 8-bit WAV (block ==
    // channels) would read 2x the data chunk and run off the buffer —
    // decline to the empty sentinel instead
    if (block <= 0 || channels <= 0 || bits != 16 || block != channels * 2)
      return new GenericArrayData(Array.emptyLongArray)
    val frames = data(1) / block
    if (frames < FpWindows) return new GenericArrayData(Array.emptyLongArray)
    val e = new Array[Long](FpWindows)
    var f = 0
    var off = data(0)
    while (f < frames) {
      val w = (f.toLong * FpWindows / frames).toInt
      var c = 0
      while (c < channels) {
        val v = bb.getShort(off).toLong
        e(w) += v * v
        off += 2
        c += 1
      }
      f += 1
    }
    var lo = 0L
    var hi = 0L
    var i = 0
    while (i < 64) {
      val bit = if (e(i + 1) > e(i)) 1L else 0L
      if (i < 32) lo |= bit << i else hi |= bit << (i - 32)
      i += 1
    }
    new GenericArrayData(Array(lo, hi))
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
