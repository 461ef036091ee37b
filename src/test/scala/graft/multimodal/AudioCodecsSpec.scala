package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import javax.sound.sampled._

/** Compressed-audio decode: G.711 μ-law/A-law cross-validated against
  * the JDK's own javax.sound converters over EVERY code point, IMA
  * ADPCM against an independently hand-stepped reference sequence. */
class AudioCodecsSpec extends AnyFunSuite {

  /** WAV container with the given compressed encoding holding bytes
    * 0..255, written by the JDK's own WAVE writer (which stamps the
    * correct format tag: 7 for ULAW, 6 for ALAW). */
  private def g711Wav(enc: AudioFormat.Encoding): Array[Byte] = {
    val codes = Array.tabulate[Byte](256)(i => i.toByte)
    val fmt = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(codes), fmt, codes.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The JDK's reference expansion of the same 256 codes to 16-bit PCM. */
  private def jdkExpand(enc: AudioFormat.Encoding): Array[Short] = {
    val codes = Array.tabulate[Byte](256)(i => i.toByte)
    val src = new AudioInputStream(new java.io.ByteArrayInputStream(codes),
      new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false), codes.length.toLong)
    val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val pcm = AudioSystem.getAudioInputStream(pcmFmt, src)
    val bytes = pcm.readAllBytes()
    Array.tabulate[Short](bytes.length / 2)(j =>
      ((bytes(j * 2) & 0xff) | (bytes(j * 2 + 1) << 8)).toShort)
  }

  test("ulaw: every code point matches the JDK converter, through the real WAV container") {
    val Some((rate, ch, decoded)) = Multimodal.audioSamples(g711Wav(AudioFormat.Encoding.ULAW))
    assert(rate == 8000 && ch == 1 && decoded.length == 256)
    assert(decoded.toSeq == jdkExpand(AudioFormat.Encoding.ULAW).toSeq)
  }

  test("alaw: every code point matches the JDK converter, through the real WAV container") {
    val Some((rate, ch, decoded)) = Multimodal.audioSamples(g711Wav(AudioFormat.Encoding.ALAW))
    assert(rate == 8000 && ch == 1 && decoded.length == 256)
    assert(decoded.toSeq == jdkExpand(AudioFormat.Encoding.ALAW).toSeq)
  }

  /** Hand-built IMA ADPCM WAV: fmt tag 0x11, mono, blockAlign 20
    * (4-byte header + 16 data bytes = 32 nibbles -> 33 samples). */
  private def imaWav(pred: Short, index: Int, data: Array[Byte],
                     channels: Int = 1, blockAlign: Int = 20): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff); bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff) }
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    val headers = channels * 4
    val dataLen = headers + data.length
    bos.write("RIFF".getBytes); w32(4 + 26 + 8 + dataLen); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); w32(20)
    w16(0x11); w16(channels); w32(8000); w32(4055) // nominal byte rate
    w16(blockAlign); w16(4); w16(2)
    w16(1 + (blockAlign - headers) * 2 / channels) // samplesPerBlock
    bos.write("data".getBytes); w32(dataLen)
    (0 until channels).foreach { _ => w16(pred & 0xffff); bos.write(index); bos.write(0) }
    bos.write(data)
    bos.toByteArray
  }

  // nibbles 0..15 then 15..0, packed low-nibble-first
  private val rampNibbles: Array[Byte] = {
    val nibs = (0 until 16) ++ (15 to 0 by -1)
    nibs.grouped(2).map { case Seq(lo, hi) => (lo | (hi << 4)).toByte }.toArray
  }

  test("IMA ADPCM: mono block decodes to the independently hand-stepped reference") {
    // expected values stepped through the published IMA tables by a
    // separate (non-Scala) reference implementation
    val expected = Seq[Short](1000, 1002, 1008, 1018, 1029, 1043, 1065, 1101,
      1177, 1166, 1136, 1091, 1034, 967, 867, 694, 339, -426, -1849, -3983,
      -6539, -8943, -10504, -11356, -11614, -8094, -1552, 8254, 20001, 31055,
      32767, 32767, 32767)
    val Some((rate, ch, decoded)) =
      Multimodal.audioSamples(imaWav(1000, 10, rampNibbles))
    assert(rate == 8000 && ch == 1)
    assert(decoded.toSeq == expected)
  }

  test("IMA ADPCM: stereo blocks interleave exactly as two mono decodes") {
    // per-channel references via the already-verified mono path
    val Some((_, _, ref0)) = Multimodal.audioSamples(imaWav(100, 5, rampNibbles.take(4), blockAlign = 8))
    val Some((_, _, ref1)) = Multimodal.audioSamples(imaWav(-2000, 30, rampNibbles.slice(4, 8), blockAlign = 8))
    // stereo container by hand: headers (100,5), (-2000,30); then one
    // 4-byte group for ch0, one for ch1
    val bos = new java.io.ByteArrayOutputStream()
    def w16(o: java.io.ByteArrayOutputStream, v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    def w32(o: java.io.ByteArrayOutputStream, v: Int): Unit = { w16(o, v & 0xffff); w16(o, (v >> 16) & 0xffff) }
    bos.write("RIFF".getBytes); w32(bos, 4 + 26 + 8 + 16); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); w32(bos, 20)
    w16(bos, 0x11); w16(bos, 2); w32(bos, 8000); w32(bos, 8110)
    w16(bos, 16); w16(bos, 4); w16(bos, 2); w16(bos, 9)
    bos.write("data".getBytes); w32(bos, 16)
    w16(bos, 100); bos.write(5); bos.write(0)
    w16(bos, -2000 & 0xffff); bos.write(30); bos.write(0)
    bos.write(rampNibbles.take(4)); bos.write(rampNibbles.slice(4, 8))
    val Some((rate, ch, decoded)) = Multimodal.audioSamples(bos.toByteArray)
    assert(rate == 8000 && ch == 2)
    assert(decoded.length == ref0.length + ref1.length)
    assert(decoded.zipWithIndex.filter(_._2 % 2 == 0).map(_._1).toSeq == ref0.toSeq)
    assert(decoded.zipWithIndex.filter(_._2 % 2 == 1).map(_._1).toSeq == ref1.toSeq)
  }

  test("IMA ADPCM: short final block decodes complete groups only, never throws") {
    // mono data region: 4-byte header + 6 data bytes against blockAlign
    // 20 — one complete 4-byte group (8 samples) + 2 leftover bytes that
    // must be ignored, not over-read
    val region = new Array[Byte](10)
    region(0) = (1000 & 0xff).toByte; region(1) = ((1000 >> 8) & 0xff).toByte
    region(2) = 10 // index
    rampNibbles.take(6).copyToArray(region, 4)
    val full = AudioCodecs.decodeIma(region, 0, 10, channels = 1, blockAlign = 20)
    assert(full.length == 1 + 8) // header sample + one group
    val wholeBlock = imaWav(1000, 10, rampNibbles)
    val Some((_, _, reference)) = Multimodal.audioSamples(wholeBlock)
    assert(full.toSeq == reference.take(9).toSeq) // same prefix as the full decode
  }

  test("decodeFeatures: compressed WAV features derive from decoded samples, not container bytes") {
    val wav = g711Wav(AudioFormat.Encoding.ULAW)
    val Some((_, _, samples)) = Multimodal.audioSamples(wav)
    val sampleBytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      sampleBytes(i * 2) = (v & 0xff).toByte
      sampleBytes(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    assert(Multimodal.decodeFeatures(wav, 8).toSeq ==
      Multimodal.decodeStub(sampleBytes, 8).toSeq)
    assert(Multimodal.decodeFeatures(wav, 8).toSeq !=
      Multimodal.decodeStub(wav, 8).toSeq)
  }
}
