package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    import spark.implicits._
    Multimodal.fromText(
      Seq((1L, "hello multimodal world"), (2L, "x"), (3L, "")).toDF("id", "text"),
      "id", "text", kind = "image")
  }

  test("media schema: binary payload + typed metadata") {
    assert(media.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    assert(media.select(col("meta.codec")).head().getString(0) == "utf8-stub")
  }

  test("feature extraction: fixed dim, deterministic, empty-safe") {
    val f1 = Multimodal.extractFeatures(media, featureDim = 8).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getSeq[Float](r.fieldIndex("features"))).toMap
    val f2 = Multimodal.extractFeatures(media, featureDim = 8).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getSeq[Float](r.fieldIndex("features"))).toMap
    assert(f1(1L).length == 8)
    assert(f1(1L) == f2(1L)) // deterministic stub
    assert(f1(3L).forall(_ == 0.0f)) // empty payload → zero features
  }

  test("batched iteration: batch boundaries don't change results") {
    val big = Multimodal.fromText(
      {
        import spark.implicits._
        (1L to 100L).map(i => (i, s"document number $i with some payload text")).toDF("id", "text")
      }, "id", "text")
    val b1 = Multimodal.extractFeatures(big, featureDim = 4, batchSize = 7).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getSeq[Float](r.fieldIndex("features"))).toMap
    val b2 = Multimodal.extractFeatures(big, featureDim = 4, batchSize = 100).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getSeq[Float](r.fieldIndex("features"))).toMap
    assert(b1 == b2)
    assert(b1.size == 100)
  }

  test("imageHeader parses real PNG and JPEG dimensions (ImageIO-written fixtures)") {
    def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      bos.toByteArray
    }
    assert(Multimodal.imageHeader(imageBytes("png", 5, 3)) == Some((5, 3, "png")))
    assert(Multimodal.imageHeader(imageBytes("png", 640, 480)) == Some((640, 480, "png")))
    assert(Multimodal.imageHeader(imageBytes("jpg", 7, 11)) == Some((7, 11, "jpeg")))
    assert(Multimodal.imageHeader(imageBytes("jpg", 320, 200)) == Some((320, 200, "jpeg")))
    assert(Multimodal.imageHeader("not an image".getBytes) == None)
    assert(Multimodal.imageHeader(Array.emptyByteArray) == None)
    assert(Multimodal.imageHeader(null) == None)
    // truncated JPEG (SOI only) must not loop or throw
    assert(Multimodal.imageHeader(Array(0xff.toByte, 0xd8.toByte)) == None)
    // spec-legal 0xFF fill bytes before the SOF0 marker (B.1.1.2): the
    // walk must step over them one at a time, not read them as a segment
    val filled = Array(0xff, 0xd8, 0xff, 0xff, 0xc0, 0x00, 0x0b, 0x08,
      0x00, 0x10, 0x00, 0x20).map(_.toByte)
    assert(Multimodal.imageHeader(filled) == Some((0x20, 0x10, "jpeg")))
    // EOI with no frame header terminates cleanly
    val eoiOnly = Array(0xff, 0xd8, 0xff, 0xd9, 0, 0, 0, 0, 0, 0, 0, 0, 0).map(_.toByte)
    assert(Multimodal.imageHeader(eoiOnly) == None)
  }

  test("withImageMeta fills meta from real headers, keeps stub meta otherwise") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(9, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rows = Seq(
      (1L, "image", bos.toByteArray),
      (2L, "image", "plain text payload".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
      .withColumn("meta", struct(lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"), lit(null).cast("long").as("duration_ms"),
        lit("utf8-stub").as("codec")))
    val out = Multimodal.withImageMeta(rows).select("media_id", "meta.*").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)), r.getString(4))).toMap
    assert(out(1L) == ((Some(9), Some(4), "png")))
    assert(out(2L) == ((None, None, "utf8-stub")))
  }

  test("audioHeader parses real WAV metadata (AudioSystem-written fixtures)") {
    def wavBytes(rate: Float, channels: Int, nFrames: Int): Array[Byte] = {
      import javax.sound.sampled._
      val fmt = new AudioFormat(rate, 16, channels, true, false)
      val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
      pcm.indices.foreach(i => pcm(i) = ((i * 37) & 0xff).toByte)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // 8000 Hz mono, 4000 frames → 500 ms
    assert(Multimodal.audioHeader(wavBytes(8000f, 1, 4000)) ==
      Some((8000, 1, 16, 500L)))
    // 44100 Hz stereo, 44100 frames → 1000 ms
    assert(Multimodal.audioHeader(wavBytes(44100f, 2, 44100)) ==
      Some((44100, 2, 16, 1000L)))
    assert(Multimodal.audioHeader("RIFFxxxxNOPE".getBytes ++ new Array[Byte](40)) == None)
    assert(Multimodal.audioHeader("too short".getBytes) == None)
    assert(Multimodal.audioHeader(null) == None)
  }

  /** Hand-built MP3 frames against the public ISO/IEC 11172-3 header
    * layout — header bytes + zero-filled frame body of the exact length
    * the header fields imply, so the walker's advance is what's tested. */
  private def mp3Frames(header: Array[Int], frameLen: Int, n: Int): Array[Byte] = {
    val frame = new Array[Byte](frameLen)
    header.indices.foreach(i => frame(i) = header(i).toByte)
    Array.fill(n)(frame).flatten
  }

  test("mp3Header: CBR MPEG1 Layer III frame walk, exact duration") {
    // 0xFF 0xFB: sync + MPEG1 + Layer III + no CRC; 0x90: 128 kbps,
    // 44100 Hz, no padding; 0x40: joint stereo → 2 channels
    // frame = 144·128000/44100 = 417 bytes, 1152 samples/frame
    val b = mp3Frames(Array(0xff, 0xfb, 0x90, 0x40), 417, 3)
    assert(Multimodal.mp3Header(b) == Some((44100, 2, 128, 3 * 1152 * 1000L / 44100)))
  }

  test("mp3Header: MPEG2.5 mono low-rate + ID3v2 skip + ID3v1 trailer") {
    // 0xE3: MPEG2.5 + Layer III; 0x88: 64 kbps idx (V2 table), 8000 Hz;
    // 0xC0: mono. frame = 72·64000/8000 = 576 bytes, 576 samples/frame
    val frames = mp3Frames(Array(0xff, 0xe3, 0x88, 0xc0), 576, 2)
    assert(Multimodal.mp3Header(frames) == Some((8000, 1, 64, 144L)))
    // ID3v2 prefix (syncsafe size 0x100 = 256-byte body) and ID3v1 trailer
    val id3v2 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0x02, 0x00) ++
      new Array[Byte](256)
    val id3v1 = "TAG".getBytes("US-ASCII") ++ new Array[Byte](125)
    assert(Multimodal.mp3Header(id3v2 ++ frames ++ id3v1) == Some((8000, 1, 64, 144L)))
  }

  test("mp3Header: padding bit lengthens the frame by one byte") {
    // same CBR frame with the padding bit set → 418-byte frames
    val b = mp3Frames(Array(0xff, 0xfb, 0x92, 0x40), 418, 2)
    assert(Multimodal.mp3Header(b) == Some((44100, 2, 128, 2 * 1152 * 1000L / 44100)))
  }

  test("mp3Header: VBR duration sums actual per-frame samples") {
    // one 128 kbps frame then one 64 kbps frame (idx 5 → 0x50), both
    // 44100 Hz stereo: durations add even though frame lengths differ
    val f128 = mp3Frames(Array(0xff, 0xfb, 0x90, 0x40), 417, 1)
    val f64 = mp3Frames(Array(0xff, 0xfb, 0x50, 0x40), 144 * 64000 / 44100, 1)
    assert(Multimodal.mp3Header(f128 ++ f64) ==
      Some((44100, 2, 128, 2 * 1152 * 1000L / 44100)))
  }

  test("mp3Header: duration uses each frame's OWN sample rate") {
    // a 44100 Hz frame then a 32000 Hz frame (rate idx 10 → 0x98), both
    // 128 kbps stereo: 1152/44100 + 1152/32000 = 26.122 + 36 ms = 62 ms,
    // NOT 2·1152/44100 = 52 ms (the old first-frame-rate shortcut)
    val f441 = mp3Frames(Array(0xff, 0xfb, 0x90, 0x40), 417, 1)
    val f320 = mp3Frames(Array(0xff, 0xfb, 0x98, 0x40), 144 * 128000 / 32000, 1)
    val expected = (1152L * 1000000L / 44100 + 1152L * 1000000L / 32000) / 1000L
    assert(Multimodal.mp3Header(f441 ++ f320) == Some((44100, 2, 128, expected)))
  }

  test("mp3Header: only RECOGNIZED trailers after a valid frame are tolerated") {
    // APE / Lyrics3 / ID3v1 tags and zero padding (optionally leading
    // into a tag) end the walk cleanly; metadata for the frames stands
    val good = mp3Frames(Array(0xff, 0xfb, 0x90, 0x40), 417, 2)
    val dur = 2 * 1152 * 1000L / 44100
    assert(Multimodal.mp3Header(good ++ "APETAGEX0000".getBytes) ==
      Some((44100, 2, 128, dur)))
    assert(Multimodal.mp3Header(good ++ "LYRICSBEGINxyz".getBytes) ==
      Some((44100, 2, 128, dur)))
    assert(Multimodal.mp3Header(good ++ Array[Byte](0, 0, 0, 0, 0)) ==
      Some((44100, 2, 128, dur)))
    assert(Multimodal.mp3Header(good ++ Array[Byte](0, 0) ++ "APETAGEX".getBytes) ==
      Some((44100, 2, 128, dur)))
    // UNRECOGNIZED residue is mid-stream corruption or truncation at a
    // non-0xFF byte — it must refuse, not silently understate duration
    assert(Multimodal.mp3Header(good ++ "garbage!".getBytes) == None)
    assert(Multimodal.mp3Header(good ++ Array[Byte](0, 0, 42)) == None)
  }

  test("mp3Header: corrupt / foreign / reserved-field payloads reject") {
    assert(Multimodal.mp3Header(null) == None)
    assert(Multimodal.mp3Header("not audio at all".getBytes) == None)
    // reserved version (bits 01), free-format bitrate (idx 0), bad rate idx
    assert(Multimodal.mp3Header(mp3Frames(Array(0xff, 0xeb, 0x90, 0x40), 417, 1)) == None)
    assert(Multimodal.mp3Header(mp3Frames(Array(0xff, 0xfb, 0x00, 0x40), 417, 1)) == None)
    assert(Multimodal.mp3Header(mp3Frames(Array(0xff, 0xfb, 0x9c, 0x40), 417, 1)) == None)
    // valid first frame, then bytes that still carry the 11-bit frame
    // sync but parse invalid: a corrupted header, not a trailer — refuse
    val good = mp3Frames(Array(0xff, 0xfb, 0x90, 0x40), 417, 1)
    assert(Multimodal.mp3Header(good ++ mp3Frames(Array(0xff, 0xfb, 0x00, 0x40), 8, 1)) == None)
    // a stray sync word inside arbitrary binary must not read as audio:
    // ID3v2 size pointing past the payload rejects too
    val lyingId3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f)
    assert(Multimodal.mp3Header(lyingId3 ++ good) == None)
  }

  test("withAudioMeta recognizes MP3 alongside WAV") {
    import spark.implicits._
    val mp3 = mp3Frames(Array(0xff, 0xfb, 0x90, 0x40), 417, 3)
    val rows = Seq((1L, "audio", mp3)).toDF("media_id", "kind", "payload")
      .withColumn("meta", struct(lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"), lit(null).cast("long").as("duration_ms"),
        lit(null).cast("string").as("codec")))
    val r = Multimodal.withAudioMeta(rows).select("meta.duration_ms", "meta.codec").head()
    assert(r.getLong(0) == 3 * 1152 * 1000L / 44100 && r.getString(1) == "mp3")
  }

  test("withAudioMeta fills duration/codec from real WAV headers only") {
    import spark.implicits._
    import javax.sound.sampled._
    val fmt = new AudioFormat(16000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](16000 * 2)), fmt, 16000L)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val rows = Seq(
      (1L, "audio", bos.toByteArray),
      (2L, "audio", "not audio".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
      .withColumn("meta", struct(lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"), lit(null).cast("long").as("duration_ms"),
        lit("raw-stub").as("codec")))
    val out = Multimodal.withAudioMeta(rows).select("media_id", "meta.*").collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)), r.getString(4))).toMap
    assert(out(1L) == ((Some(1000L), "wav")))
    assert(out(2L) == ((None, "raw-stub")))
  }

  test("resize stub contracts payload and metadata by the factor") {
    val resized = Multimodal.resizeStub(media.filter(col("media_id") === 1L), factor = 2)
    val r = resized.head()
    // "hello multimodal world" = 22 bytes → every 2nd byte = 11
    assert(r.getAs[Array[Byte]]("payload").length == 11)
  }

  test("frame sampling: stride windows over payload bytes") {
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 1L),
      frameBytes = 4, stride = 2)
    // payload "hello multimodal world" = 22 bytes; 22/(4*2)=2 frames
    assert(frames.count() == 2)
    assert(frames.select(max(length(col("frame_payload")))).head().getInt(0) <= 4)
  }

  private val mmRes = new java.io.File("src/test/resources/multimodal").getAbsolutePath
  private def fixture(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$mmRes/$name"))

  // fixture pattern: pixel(x,y) = (10x+y, 100+5x, 200-7y) over a 4x3 image
  private def expectedPx(x: Int, y: Int): Seq[Int] = Seq(10 * x + y, 100 + 5 * x, 200 - 7 * y)

  test("decodePixels: bottom-up 24-bit BMP yields exact top-down RGB") {
    val Some((w, h, rgb)) = Multimodal.decodePixels(fixture("sample_4x3.bmp"))
    assert((w, h) == ((4, 3)))
    for (y <- 0 until 3; x <- 0 until 4) {
      val d = (y * 4 + x) * 3
      assert(Seq(rgb(d) & 0xff, rgb(d + 1) & 0xff, rgb(d + 2) & 0xff) == expectedPx(x, y),
        s"pixel ($x,$y)")
    }
  }

  test("decodePixels: top-down BMP (negative height) decodes identically") {
    val Some((w1, h1, a)) = Multimodal.decodePixels(fixture("sample_4x3_topdown.bmp"))
    val Some((w2, h2, b)) = Multimodal.decodePixels(fixture("sample_4x3.bmp"))
    assert((w1, h1) == ((w2, h2)) && a.toSeq == b.toSeq)
  }

  test("decodePixels: P6 PPM with comment decodes to the same pixels as the BMP") {
    val Some((w1, h1, a)) = Multimodal.decodePixels(fixture("sample_4x3.ppm"))
    val Some((w2, h2, b)) = Multimodal.decodePixels(fixture("sample_4x3.bmp"))
    assert((w1, h1) == ((w2, h2)) && a.toSeq == b.toSeq)
  }

  test("decodePixels: BMP row padding bytes are ignored (3x3, stride 12)") {
    val Some((w, h, rgb)) = Multimodal.decodePixels(fixture("sample_3x3_padded.bmp"))
    assert((w, h) == ((3, 3)))
    for (y <- 0 until 3; x <- 0 until 3) {
      val d = (y * 3 + x) * 3
      assert(Seq(rgb(d) & 0xff, rgb(d + 1) & 0xff, rgb(d + 2) & 0xff) == expectedPx(x, y))
    }
  }

  test("pixelMeans: exact channel means on the checked-in fixture") {
    assert(Multimodal.pixelMeans(fixture("sample_4x3.bmp")) == Some((16.0, 107.5, 193.0)))
    assert(Multimodal.pixelMeans(fixture("sample_4x3.ppm")) == Some((16.0, 107.5, 193.0)))
    assert(Multimodal.pixelMeans("not an image".getBytes("UTF-8")) == None)
  }

  test("decodePixels: truncated and foreign payloads reject cleanly") {
    val bmp = fixture("sample_4x3.bmp")
    assert(Multimodal.decodePixels(bmp.take(53)) == None)  // truncated header
    assert(Multimodal.decodePixels(bmp.take(60)) == None)  // truncated pixels
    assert(Multimodal.decodePixels("P6 oops".getBytes) == None)
    assert(Multimodal.decodePixels("P6 4 3 99999 ".getBytes) == None) // maxval > 255
    assert(Multimodal.decodePixels(null) == None)
  }

  test("decodeFeatures: same image in BMP and PPM containers -> identical features") {
    val fb = Multimodal.decodeFeatures(fixture("sample_4x3.bmp"), 8)
    val fp = Multimodal.decodeFeatures(fixture("sample_4x3.ppm"), 8)
    assert(fb.toSeq == fp.toSeq) // container-invariant: features come from PIXELS
    // while the raw BYTES of the two files differ, so the stub would diverge
    assert(Multimodal.decodeStub(fixture("sample_4x3.bmp"), 8).toSeq !=
      Multimodal.decodeStub(fixture("sample_4x3.ppm"), 8).toSeq)
    // non-image payloads keep the stub path
    val txt = "plain text payload".getBytes("UTF-8")
    assert(Multimodal.decodeFeatures(txt, 8).toSeq == Multimodal.decodeStub(txt, 8).toSeq)
  }

  private def pngBytes(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodePixels: PNG (JDK ImageIO path) decodes to the same pixels as the BMP fixture") {
    val png = pngBytes(4, 3, (x, y) => (10 * x + y, 100 + 5 * x, 200 - 7 * y))
    val Some((w1, h1, a)) = Multimodal.decodePixels(png)
    val Some((w2, h2, b)) = Multimodal.decodePixels(fixture("sample_4x3.bmp"))
    assert((w1, h1) == ((w2, h2)) && a.toSeq == b.toSeq)
    assert(Multimodal.pixelMeans(png) == Some((16.0, 107.5, 193.0)))
  }

  test("decodePixels: JPEG (JDK ImageIO path) recovers dims and approximate means") {
    // 64x64 solid color: chroma subsampling cannot shift a constant image far
    val img = new java.awt.image.BufferedImage(64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) img.setRGB(x, y, (100 << 16) | (150 << 8) | 200)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val Some((w, h, _)) = Multimodal.decodePixels(bos.toByteArray)
    assert((w, h) == ((64, 64)))
    val Some((r, g, b)) = Multimodal.pixelMeans(bos.toByteArray)
    assert(math.abs(r - 100) < 4 && math.abs(g - 150) < 4 && math.abs(b - 200) < 4)
  }

  test("decodePixels: truncated PNG rejects cleanly, text payloads skip the ImageIO probe") {
    val png = pngBytes(4, 3, (x, y) => (10 * x + y, 100 + 5 * x, 200 - 7 * y))
    assert(Multimodal.decodePixels(png.take(30)) == None)
    assert(Multimodal.decodePixels("just some text, not an image at all".getBytes) == None)
  }

  test("audioSamples: 16-bit PCM WAV round-trips exact sample values") {
    import javax.sound.sampled._
    // 100 samples of a deterministic ramp, written through the JDK encoder
    val samples = Array.tabulate[Short](100)(i => ((i * 321) - 16000).toShort)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcm(i * 2) = (v & 0xff).toByte; pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val Some((rate, ch, decoded)) = Multimodal.audioSamples(bos.toByteArray)
    assert(rate == 8000 && ch == 1)
    assert(decoded.toSeq == samples.toSeq)
  }

  test("audioSamples: non-PCM / truncated / foreign payloads reject cleanly") {
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(new Array[Byte](200)), fmt, 100L)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    assert(Multimodal.audioSamples(wav.take(40)) == None)   // truncated header
    assert(Multimodal.audioSamples(wav.take(60)) == None)   // truncated data
    assert(Multimodal.audioSamples("not audio".getBytes) == None)
    assert(Multimodal.audioSamples(null) == None)
  }

  test("decodeFeatures: WAV features come from PCM samples, not container bytes") {
    import javax.sound.sampled._
    val pcm = Array.tabulate[Byte](200)(i => (i * 7).toByte)
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    def wav(extraHeader: Boolean): Array[Byte] = {
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, 100L)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val w = wav(false)
    val f = Multimodal.decodeFeatures(w, 8)
    // features equal the stub over the raw PCM bytes (header stripped)...
    assert(f.toSeq == Multimodal.decodeStub(pcm, 8).toSeq)
    // ...and differ from the stub over the whole container
    assert(f.toSeq != Multimodal.decodeStub(w, 8).toSeq)
  }

  test("decodePixels: GIF (JDK ImageIO path) matches the JDK reader pixel-for-pixel") {
    // NOTE: the JDK\'s own GIF WRITER is unfaithful on small images (rows
    // shift/drop colors — observed on this JDK), so the assertion is
    // against ImageIO\'s READER on the same bytes: our wrapper must agree
    // with the reference decode exactly, whatever the encoder produced.
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val gif = bos.toByteArray
    val Some((w, h, rgb)) = Multimodal.decodePixels(gif)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    assert((w, h) == ((ref.getWidth, ref.getHeight)))
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      val p = ref.getRGB(x, y)
      assert(Seq(rgb(d) & 0xff, rgb(d + 1) & 0xff, rgb(d + 2) & 0xff) ==
        Seq((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff))
    }
  }

  // --- adversarial payload hardening: crafted/corrupt headers must reject
  // cleanly (None), never hang a task or throw out of the decode path ---

  private def le32(b: Array[Byte], o: Int, v: Long): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }

  test("audio chunk walk: unsigned chunk sizes can't loop forever or walk backwards") {
    // RIFF....WAVE then a chunk declaring size 0xFFFFFFF8 — the old Int
    // step was 8 + (-8) + 0 = 0, an infinite loop; 0xFFFFFFF7 stepped 0 via
    // the odd-pad; mid-range values drove i negative and crashed.
    for (sz <- Seq(0xFFFFFFF8L, 0xFFFFFFF7L, 0x80000000L, 0x7FFFFFFFL)) {
      val b = new Array[Byte](44)
      "RIFF".getBytes.copyToArray(b, 0); le32(b, 4, 36)
      "WAVE".getBytes.copyToArray(b, 8)
      "JUNK".getBytes.copyToArray(b, 12); le32(b, 16, sz)
      val done = java.util.concurrent.Executors.newSingleThreadExecutor()
      val fut = done.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean =
          Multimodal.audioHeader(b).isEmpty && Multimodal.audioSamples(b).isEmpty
      })
      assert(fut.get(10, java.util.concurrent.TimeUnit.SECONDS)) // terminates, rejects
      done.shutdown()
    }
  }

  test("audio chunk walk: a real WAV after a large-size junk chunk still stops cleanly") {
    // junk chunk declares a size past the payload end: walk must stop at
    // the boundary (no fmt/data found -> None), not wrap or scan garbage
    val b = new Array[Byte](64)
    "RIFF".getBytes.copyToArray(b, 0); le32(b, 4, 56)
    "WAVE".getBytes.copyToArray(b, 8)
    "JUNK".getBytes.copyToArray(b, 12); le32(b, 16, 1000)
    assert(Multimodal.audioHeader(b).isEmpty && Multimodal.audioSamples(b).isEmpty)
  }

  test("BMP decode: width near 2^31/3 can't overflow stride into a tiny allocation") {
    // 58-byte payload, width 0x55555556: Int stride overflowed to 4, the
    // bounds check passed, and the pixel allocation went negative/tiny
    val b = new Array[Byte](58)
    b(0) = 'B'; b(1) = 'M'
    le32(b, 10, 54) // pixel offset
    le32(b, 14, 40) // dib size
    le32(b, 18, 0x55555556L) // width
    le32(b, 22, 2)  // height
    b(28) = 24      // bpp
    le32(b, 30, 0)  // BI_RGB
    assert(Multimodal.decodePixels(b).isEmpty) // rejects, no throw
    val minH = b.clone(); le32(minH, 22, 0x80000000L) // height = Int.MinValue
    assert(Multimodal.decodePixels(minH).isEmpty)
  }

  test("PPM decode: dimension products that overflow Int reject instead of mis-sizing") {
    // 65536 * 21846 * 3 overflows Int to a SMALL POSITIVE value — the old
    // check passed and returned rgb shorter than w*h*3 (NaN means later)
    val smallPos = s"P6 65536 21846 255\n".getBytes ++ new Array[Byte](100)
    assert(Multimodal.decodePixels(smallPos).isEmpty)
    val negative = s"P6 100000 100000 255\n".getBytes ++ new Array[Byte](100)
    assert(Multimodal.decodePixels(negative).isEmpty)
    val hugeField = s"P6 99999999999 2 255\n".getBytes ++ new Array[Byte](100)
    assert(Multimodal.decodePixels(hugeField).isEmpty) // parse-time cap
    assert(Multimodal.pixelMeans(smallPos).isEmpty)    // no divide-by-zero path
  }
}
