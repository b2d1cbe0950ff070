package graft

import graft.functions.AudioCodec
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM WAV codec: synthesis AND independent chunk-walk parse agree
  * with the analytic (doc_id-arithmetic) prediction — the same
  * differential contract the q_mm_audio oracle checks end-to-end. */
class AudioCodecSpec extends AnyFunSuite {

  private def predict(id: Long): (Int, Int, Int, Int, Int, Long) = {
    val rate = (id % 3) match { case 0 => 8000; case 1 => 16000; case _ => 44100 }
    val ch = (1 + id % 2).toInt
    val frames = (50 + id % 200).toInt
    var peak = 0; var sumsq = 0L
    var j = 0
    while (j < frames * ch) {
      val v = (((id * 31 + j * 17) % 2001) - 1000).toInt
      val a = math.abs(v)
      if (a > peak) peak = a
      sumsq += v.toLong * v
      j += 1
    }
    (rate, ch, frames, (frames * 1000L / rate).toInt, peak, sumsq)
  }

  test("parse recovers every synthesized field across a spread of ids") {
    for (id <- Seq(0L, 1L, 2L, 3L, 7L, 199L, 200L, 4409L, 123456L)) {
      val b = AudioCodec.synthWav(id)
      val (rate, ch, frames, durMs, peak, sumsq) = predict(id)
      assert(AudioCodec.wavField(b, 0) == rate, s"rate id=$id")
      assert(AudioCodec.wavField(b, 1) == ch, s"channels id=$id")
      assert(AudioCodec.wavField(b, 2) == 16, s"bits id=$id")
      assert(AudioCodec.wavField(b, 3) == frames, s"frames id=$id")
      assert(AudioCodec.wavField(b, 4) == durMs, s"duration id=$id")
      assert(AudioCodec.wavField(b, 5) == peak, s"peak id=$id")
      assert(AudioCodec.wavSumSq(b) == sumsq, s"sumsq id=$id")
    }
  }

  test("the planted LIST chunk forces a genuine walk (data is not at a fixed offset)") {
    val b = AudioCodec.synthWav(5L)
    // fixed-offset readers would land on the LIST chunk: verify 'LIST'
    // precedes 'data' in the byte stream
    val s = new String(b, "ISO-8859-1")
    val li = s.indexOf("LIST"); val da = s.indexOf("data")
    assert(li >= 0 && da > li)
  }

  test("non-WAV bytes are sentinel, not garbage") {
    val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    assert(AudioCodec.wavField(junk, 0) == AudioCodec.NOT_WAV)
    assert(AudioCodec.wavSumSq(junk) == -1L)
    // truncated container: RIFF header only
    assert(AudioCodec.wavField(AudioCodec.synthWav(9L).take(12), 0) == AudioCodec.NOT_WAV)
    // a declared chunk size running past the buffer must not be read
    val b = AudioCodec.synthWav(9L)
    assert(AudioCodec.wavField(b.take(b.length - 4), 5) == AudioCodec.NOT_WAV)
  }

  test("audioFp declines non-16-bit PCM instead of over-reading the data chunk") {
    // a structurally valid 8-bit mono PCM WAV: block align == channels == 1,
    // so the old channels*2-bytes-per-frame loop would read 2x the data
    // bytes and run off the buffer; the fix returns the empty sentinel
    val frames = 200 // > FpWindows so only the bits gate can decline it
    val buf = java.nio.ByteBuffer.allocate(44 + frames)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + frames)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1)       // PCM
    buf.putShort(1)       // mono
    buf.putInt(8000)      // rate
    buf.putInt(8000)      // byte rate
    buf.putShort(1)       // block align (1 byte/frame)
    buf.putShort(8)       // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(frames)
    for (j <- 0 until frames) buf.put((j % 251).toByte)
    val wav8 = buf.array()
    assert(AudioCodec.wavField(wav8, 2) == 8, "fixture must declare 8 bits")
    assert(AudioCodec.wavField(wav8, 3) == frames)
    assert(AudioCodec.audioFp(wav8).numElements() == 0,
      "8-bit PCM must yield the empty sentinel, not an out-of-bounds read")
  }
}
