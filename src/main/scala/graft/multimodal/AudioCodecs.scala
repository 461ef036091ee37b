package graft.multimodal

/** Pure-JVM decoders for COMPRESSED audio codings inside RIFF/WAVE
  * containers — the real-codec step of the multimodal plane (ref:
  * ORION treats media payloads as opaque bytes; a training-data
  * pipeline needs the decode to featurize them):
  *
  *  - ITU-T G.711 μ-law (WAVE format tag 7) and A-law (tag 6):
  *    8-bit logarithmic companding, 2:1 vs 16-bit PCM. The expansion
  *    formulas are the classic segment/mantissa tables; the spec
  *    cross-validates every code point against the JDK's own
  *    `javax.sound.sampled` ULAW/ALAW converters.
  *  - IMA/DVI ADPCM (tag 0x11): 4-bit adaptive differential coding,
  *    4:1. Block layout: a 4-byte header per channel (int16 predictor,
  *    uint8 step index, reserved), then 4-byte nibble groups (8
  *    samples, low nibble first) cycling round-robin through the
  *    channels.
  *
  * All decoders are allocation-lean straight-line byte code — safe in
  * the `mapPartitions` feature-extraction hot path — and total:
  * malformed trailing bytes truncate the output rather than throw,
  * matching the fallback contract of [[Multimodal.decodePixels]].
  */
object AudioCodecs {

  /** G.711 μ-law byte (0-255) → linear 16-bit sample. */
  def ulawToLinear(code: Int): Short = {
    val u = ~code & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
  }

  /** G.711 A-law byte (0-255) → linear 16-bit sample. */
  def alawToLinear(code: Int): Short = {
    val a = code ^ 0x55
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else { t += 0x108; if (seg > 1) t <<= seg - 1 }
    (if ((a & 0x80) != 0) t else -t).toShort
  }

  /** IMA ADPCM step-size table (IMA ADPCM Reference, 1992; 89 entries). */
  private val imaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Step-index adjustment per 4-bit code. */
  private val imaIndex: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** Advance one IMA state (predictor, index) by one 4-bit code;
    * returns the packed (clampedPredictor, clampedIndex). */
  @inline private def imaStep1(pred: Int, idx: Int, nib: Int): (Int, Int) = {
    val step = imaStep(idx)
    var diff = step >> 3
    if ((nib & 4) != 0) diff += step
    if ((nib & 2) != 0) diff += step >> 1
    if ((nib & 1) != 0) diff += step >> 2
    var p = if ((nib & 8) != 0) pred - diff else pred + diff
    if (p > 32767) p = 32767 else if (p < -32768) p = -32768
    var i = idx + imaIndex(nib)
    if (i < 0) i = 0 else if (i > 88) i = 88
    (p, i)
  }

  /** Decode an IMA ADPCM WAVE data region into interleaved 16-bit
    * samples. `blockAlign` is the container's nBlockAlign; the final
    * block may be short, in which case only its complete 4-byte
    * nibble groups decode (truncation, never a throw). */
  def decodeIma(payload: Array[Byte], dataOff: Int, dataBytes: Int,
                channels: Int, blockAlign: Int): Array[Short] = {
    val headerBytes = 4 * channels
    if (channels <= 0 || blockAlign < headerBytes) return new Array[Short](0)
    val out = new scala.collection.mutable.ArrayBuffer[Short]()
    var off = dataOff
    val end = dataOff + math.min(dataBytes, payload.length - dataOff)
    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    while (off + headerBytes <= end) {
      val blockLen = math.min(blockAlign, end - off)
      var c = 0
      while (c < channels) {
        val h = off + 4 * c
        pred(c) = ((payload(h) & 0xff) | (payload(h + 1) << 8)).toShort.toInt
        idx(c) = math.min(88, math.max(0, payload(h + 2) & 0xff))
        c += 1
      }
      // complete rounds of one 4-byte group per channel
      val rounds = (blockLen - headerBytes) / (4 * channels)
      val perChannel = 1 + rounds * 8
      val base = out.length
      out.sizeHint(base + perChannel * channels)
      out ++= new Array[Short](perChannel * channels)
      c = 0
      while (c < channels) { out(base + c) = pred(c).toShort; c += 1 }
      var r = 0
      while (r < rounds) {
        c = 0
        while (c < channels) {
          val g = off + headerBytes + (r * channels + c) * 4
          var b = 0
          while (b < 4) {
            val byte = payload(g + b) & 0xff
            val (p1, i1) = imaStep1(pred(c), idx(c), byte & 0x0f)
            val (p2, i2) = imaStep1(p1, i1, (byte >> 4) & 0x0f)
            val s = 1 + r * 8 + b * 2
            out(base + s * channels + c) = p1.toShort
            out(base + (s + 1) * channels + c) = p2.toShort
            pred(c) = p2; idx(c) = i2
            b += 1
          }
          c += 1
        }
        r += 1
      }
      off += blockAlign
    }
    out.toArray
  }
}
