package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Real pure-JVM media codecs (D12): PCM-16 WAV and 24-bit BMP decode /
  * encode / feature / resample round-trips, and the kernel dispatch in
  * Multimodal (real codecs for uncompressed containers, FNV stub only
  * for compressed payloads).
  */
class MediaCodecSpec extends AnyFunSuite {

  private def sine(n: Int, freq: Double, amp: Float, rate: Int = 8000) =
    Array.tabulate(n)(i => (amp * math.sin(2 * math.Pi * freq * i / rate)).toFloat)

  test("WAV PCM-16 encode/decode round-trips within quantization error") {
    val s = sine(512, 440.0, 0.5f)
    val wav = MediaCodec.decodeWav(MediaCodec.encodeWavPcm16(s, 8000))
    assert(wav.sampleRate == 8000 && wav.channels == 1)
    assert(wav.samples.length == 512)
    val maxErr = s.zip(wav.samples).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 1.0f / 32767 + 1e-6f, s"quantization error $maxErr")
  }

  test("energy envelope tracks amplitude; silence is zero") {
    val loud = MediaCodec.wavEnergyEnvelope(sine(800, 440, 0.8f), 8)
    val quiet = MediaCodec.wavEnergyEnvelope(sine(800, 440, 0.1f), 8)
    assert(loud.length == 8 && quiet.length == 8)
    assert(loud.sum > 4 * quiet.sum, s"loud=${loud.sum} quiet=${quiet.sum}")
    // RMS of a full-cycle sine ≈ amp/√2 in every window
    assert(loud.forall(e => math.abs(e - 0.8 / math.sqrt(2)) < 0.1))
    assert(MediaCodec.wavEnergyEnvelope(new Array[Float](640), 8).forall(_ == 0f))
  }

  test("WAV resample preserves duration and shape") {
    val bytes = MediaCodec.encodeWavPcm16(sine(800, 200, 0.5f), 8000)
    val down = MediaCodec.decodeWav(MediaCodec.resampleWav(bytes, 4000))
    assert(down.sampleRate == 4000)
    assert(math.abs(down.samples.length - 400) <= 1, s"${down.samples.length}")
    // energy is invariant under resampling
    val e0 = MediaCodec.wavEnergyEnvelope(sine(800, 200, 0.5f), 4).sum
    val e1 = MediaCodec.wavEnergyEnvelope(down.samples, 4).sum
    assert(math.abs(e0 - e1) < 0.05 * e0)
  }

  test("BMP 24-bit encode/decode round-trips exactly (incl. row padding)") {
    // width 3 forces a non-trivial 4-byte row pad (3*3=9 → stride 12)
    val rgb = Array.tabulate(3 * 5 * 3)(i => ((i * 37) % 256).toByte)
    val img = MediaCodec.Bmp(3, 5, rgb)
    val back = MediaCodec.decodeBmp(MediaCodec.encodeBmp(img))
    assert(back.width == 3 && back.height == 5)
    assert(back.rgb.toSeq == rgb.toSeq)
  }

  test("grayscale histogram is normalized and luminance-ordered") {
    def flat(v: Int, w: Int = 8, h: Int = 8) =
      MediaCodec.Bmp(w, h, Array.fill(w * h * 3)(v.toByte))
    val dark = MediaCodec.bmpGrayHistogram(flat(10), 8)
    val bright = MediaCodec.bmpGrayHistogram(flat(245 - 256), 8) // 245 as byte
    assert(math.abs(dark.sum - 1.0f) < 1e-5 && math.abs(bright.sum - 1.0f) < 1e-5)
    assert(dark(0) == 1.0f, s"dark mass in bin 0: ${dark.toSeq}")
    assert(bright(7) == 1.0f, s"bright mass in bin 7: ${bright.toSeq}")
  }

  test("BMP resize: dims change, constant color survives, output is valid BMP") {
    val img = MediaCodec.Bmp(6, 4, Array.fill(6 * 4 * 3)(77.toByte))
    val resized = MediaCodec.resizeBmp(MediaCodec.encodeBmp(img), 10, 7)
    val back = MediaCodec.decodeBmp(resized)
    assert(back.width == 10 && back.height == 7)
    assert(back.rgb.forall(_ == 77.toByte))
  }

  test("corrupt containers degrade to stub features, never hang or crash the scan") {
    // negative chunk size: the old walk advanced by zero forever
    val evil = "RIFFxxxxWAVE".getBytes("US-ASCII") ++
      "junk".getBytes ++ Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte)
    assert(MediaCodec.isWav(evil))
    intercept[IllegalArgumentException] { MediaCodec.decodeWav(evil) }
    assert(Multimodal.decodeToFeatures(evil, 8).length == 8) // stub fallback
    // oversized data chunk
    val truncated = MediaCodec.encodeWavPcm16(sine(100, 100, 0.5f), 8000).take(60)
    intercept[IllegalArgumentException] { MediaCodec.decodeWav(truncated) }
    assert(Multimodal.decodeToFeatures(truncated, 8).length == 8)
    // a BMP header lying about its dimensions
    val bmp = MediaCodec.encodeBmp(MediaCodec.Bmp(4, 4, new Array[Byte](48)))
    bmp(18) = 0xff.toByte; bmp(19) = 0xff.toByte // width := huge
    intercept[IllegalArgumentException] { MediaCodec.decodeBmp(bmp) }
    assert(Multimodal.decodeToFeatures(bmp, 8).length == 8)
    // text that merely starts with "BM" is NOT dispatched as an image
    val textish = "BMove along, just text".getBytes("UTF-8")
    assert(!MediaCodec.isBmp(textish))
    // resize on a corrupt payload degrades to the proportional stub
    assert(Multimodal.resizeKernel(truncated, 4, 4, 8, 8).nonEmpty)
  }

  test("stereo resample interpolates per channel (no crosstalk)") {
    // L channel constant 0.5, R channel constant -0.25: any cross-channel
    // interpolation would pull values toward each other
    val frames = 200
    val interleaved = Array.tabulate(frames * 2)(i =>
      if (i % 2 == 0) 0.5f else -0.25f)
    val bytes = MediaCodec.encodeWavPcm16(interleaved, 8000, channels = 2)
    val down = MediaCodec.decodeWav(MediaCodec.resampleWav(bytes, 4000))
    assert(down.channels == 2)
    assert(down.samples.length % 2 == 0)
    val (l, r) = down.samples.zipWithIndex.partition(_._2 % 2 == 0)
    assert(l.map(_._1).forall(v => math.abs(v - 0.5f) < 0.01), "left constant")
    assert(r.map(_._1).forall(v => math.abs(v + 0.25f) < 0.01), "right constant")
    // empty data chunk resamples to an empty (valid) wav, no crash
    val empty = MediaCodec.encodeWavPcm16(Array.empty, 8000)
    assert(MediaCodec.decodeWav(MediaCodec.resampleWav(empty, 4000))
      .samples.isEmpty)
  }

  test("Multimodal kernel dispatch: real codecs for WAV/BMP, stub for the rest") {
    val wavBytes = MediaCodec.encodeWavPcm16(sine(400, 300, 0.6f), 8000)
    val wavFeat = Multimodal.decodeToFeatures(wavBytes, 8)
    assert(wavFeat.forall(_ >= 0f) && wavFeat.sum > 0.5f,
      "wav features are RMS energies")
    val bmp = MediaCodec.encodeBmp(
      MediaCodec.Bmp(4, 4, Array.fill(48)(128.toByte)))
    val bmpFeat = Multimodal.decodeToFeatures(bmp, 8)
    assert(math.abs(bmpFeat.sum - 1.0f) < 1e-5, "bmp features are a histogram")
    val stubFeat = Multimodal.decodeToFeatures("mp4-ish".getBytes, 8)
    assert(stubFeat.exists(_ < 0f), "stub features span [-1,1]")
    // resize dispatch round-trips through the real codecs
    val rw = Multimodal.resizeKernel(wavBytes, 400, 1, 20, 10)
    assert(MediaCodec.decodeWav(rw).sampleRate == 8000 * 20 * 10 / 400)
    val rb = Multimodal.resizeKernel(bmp, 4, 4, 9, 3)
    assert(MediaCodec.decodeBmp(rb).width == 9)
  }

  private def gradient(w: Int, h: Int): MediaCodec.Bmp = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      rgb(p) = (x * 37 % 256).toByte
      rgb(p + 1) = (y * 53 % 256).toByte
      rgb(p + 2) = ((x + y) * 11 % 256).toByte
    }
    MediaCodec.Bmp(w, h, rgb)
  }

  test("PNG encode/decode round-trips exactly through the JDK's ImageIO") {
    val img = gradient(13, 7)
    val png = MediaCodec.encodePng(img)
    assert(MediaCodec.isJdkImage(png) && !MediaCodec.isBmp(png))
    val back = MediaCodec.decodeImage(png)
    assert(back.width == 13 && back.height == 7)
    assert(back.rgb.toSeq == img.rgb.toSeq, "PNG is lossless: exact pixels")
  }

  test("JPEG decodes for real: dimensions exact, pixels close (lossy)") {
    // smooth gradient — JPEG's DCT murders wrap-around edges, so the
    // closeness assertion needs a low-frequency image
    val img = {
      val rgb = new Array[Byte](16 * 16 * 3)
      for (y <- 0 until 16; x <- 0 until 16) {
        val p = (y * 16 + x) * 3
        rgb(p) = (x * 255 / 15).toByte
        rgb(p + 1) = (y * 255 / 15).toByte
        rgb(p + 2) = 128.toByte
      }
      MediaCodec.Bmp(16, 16, rgb)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val bi = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) {
      val s = (y * 16 + x) * 3
      bi.setRGB(x, y, ((img.rgb(s) & 0xff) << 16) |
        ((img.rgb(s + 1) & 0xff) << 8) | (img.rgb(s + 2) & 0xff))
    }
    javax.imageio.ImageIO.write(bi, "jpg", bos)
    val jpg = bos.toByteArray
    assert(MediaCodec.isJdkImage(jpg))
    val back = MediaCodec.decodeImage(jpg)
    assert(back.width == 16 && back.height == 16)
    val meanErr = img.rgb.zip(back.rgb)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble /
      img.rgb.length
    assert(meanErr < 16, s"JPEG is lossy but must stay recognizable: $meanErr")
    // features flow through the REAL image path (normalized histogram),
    // not the FNV stub (which has negative entries)
    val feat = Multimodal.decodeToFeatures(jpg, 8)
    assert(math.abs(feat.sum - 1.0f) < 1e-5 && feat.forall(_ >= 0f))
  }

  test("compressed-image resize decodes, resizes, re-encodes lossless PNG") {
    val png = MediaCodec.encodePng(gradient(12, 8))
    val out = Multimodal.resizeKernel(png, 12, 8, 6, 4)
    val back = MediaCodec.decodeImage(out)
    assert(back.width == 6 && back.height == 4)
    // nearest-neighbor on a PNG source matches the BMP-path result
    val viaBmp = MediaCodec.resizeRgb(gradient(12, 8), 6, 4)
    assert(back.rgb.toSeq == viaBmp.rgb.toSeq)
  }

  test("truncated JPEG quarantines to stub features, never crashes the scan") {
    val img = gradient(16, 16)
    val png = MediaCodec.encodePng(img)
    val broken = png.take(24) // valid magic, unreadable body
    assert(MediaCodec.isJdkImage(broken))
    val feat = Multimodal.decodeToFeatures(broken, 8)
    assert(feat.length == 8, "stub fallback produced features")
    assert(feat.exists(_ < 0f), "fallback is the FNV stub, not a zero histogram")
  }

  test("MP4 container: minimal box tree round-trips duration/tracks/resolution") {
    val tracks = Seq(
      MediaCodec.TrackMeta("vide", 640, 480, 7500L),
      MediaCodec.TrackMeta("soun", 0, 0, 7400L))
    val payload = "opaque codec payload".getBytes("UTF-8")
    val mp4 = MediaCodec.encodeMinimalMp4(tracks, payload)
    assert(MediaCodec.isMp4(mp4) && !MediaCodec.isMkv(mp4))
    val meta = MediaCodec.parseMp4(mp4)
    assert(meta.container == "mp4")
    assert(meta.durationMs == 7500L) // mvhd carries max track duration
    assert(meta.tracks.map(_.kind) == Seq("vide", "soun"))
    val v = meta.tracks.head
    assert(v.width == 640 && v.height == 480 && v.durationMs == 7500L)
    // corrupt size is an error, not a hang
    val broken = mp4.clone(); broken(0) = 0x7f
    intercept[Exception](MediaCodec.parseMp4(broken))
  }

  test("MKV container: EBML tree round-trips duration/tracks/resolution") {
    val tracks = Seq(
      MediaCodec.TrackMeta("vide", 1280, 720, 0L),
      MediaCodec.TrackMeta("soun", 0, 0, 0L))
    val mkv = MediaCodec.encodeMinimalMkv(tracks, 12345L)
    assert(MediaCodec.isMkv(mkv) && !MediaCodec.isMp4(mkv))
    val meta = MediaCodec.parseMkv(mkv)
    assert(meta.container == "mkv")
    assert(meta.durationMs == 12345L)
    assert(meta.tracks.map(_.kind) == Seq("vide", "soun"))
    assert(meta.tracks.head.width == 1280 && meta.tracks.head.height == 720)
  }

  test("MP4: version-1 boxes, 64-bit largesize, size==0 (ISO 14496-12)") {
    def u16(v: Int) = Array((v >>> 8).toByte, v.toByte)
    def u32(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def u64(v: Long) = u32(v >>> 32) ++ u32(v & 0xffffffffL)
    def box(t: String, body: Array[Byte]) =
      u32(body.length + 8L) ++ t.getBytes ++ body
    def largebox(t: String, body: Array[Byte]) = // size==1 → 64-bit largesize
      u32(1L) ++ t.getBytes ++ u64(body.length + 16L) ++ body
    val z = (n: Int) => new Array[Byte](n)
    // version-1 full boxes carry 64-bit creation/modification/duration
    val mvhd = box("mvhd", Array[Byte](1, 0, 0, 0) ++ u64(0) ++ u64(0) ++
      u32(1000L) ++ u64(4321L) ++ z(80))
    val tkhd = box("tkhd", Array[Byte](1, 0, 0, 7) ++ u64(0) ++ u64(0) ++
      u32(1L) ++ z(4) ++ u64(4321L) ++ z(8) ++ u16(0) ++ u16(0) ++ u16(0) ++
      u16(0) ++ z(36) ++ u32(320L << 16) ++ u32(240L << 16))
    val mdhd = box("mdhd", Array[Byte](1, 0, 0, 0) ++ u64(0) ++ u64(0) ++
      u32(1000L) ++ u64(4321L) ++ u16(0x55c4) ++ u16(0))
    val hdlr = box("hdlr", z(8) ++ "vide".getBytes ++ z(12) ++ Array[Byte](0))
    val ftyp = box("ftyp", "isom".getBytes ++ u32(0x200L) ++ "isommp41".getBytes)
    val moov = largebox("moov",
      mvhd ++ box("trak", tkhd ++ box("mdia", mdhd ++ hdlr)))
    val mdat = u32(0L) ++ "mdat".getBytes ++ z(5) // size==0 → runs to EOF
    val meta = MediaCodec.parseMp4(ftyp ++ moov ++ mdat)
    assert(meta.durationMs == 4321L)
    assert(meta.tracks == Seq(MediaCodec.TrackMeta("vide", 320, 240, 4321L)))
    // a truncated largesize header is corrupt, not misparsed
    val shortLarge = ftyp ++ u32(1L) ++ "moov".getBytes ++ u32(0L)
    intercept[Exception](MediaCodec.parseMp4(shortLarge))
  }

  test("MKV: unknown-size Segment (streamed files) extends to end of file") {
    val mkv = MediaCodec.encodeMinimalMkv(
      Seq(MediaCodec.TrackMeta("vide", 64, 48, 0L)), 777L)
    // overwrite the Segment's size VINT with the all-ones unknown marker
    val idIdx = mkv.indexOfSlice(Seq(0x18, 0x53, 0x80, 0x67).map(_.toByte))
    assert(idIdx >= 0)
    val szOff = idIdx + 4
    val first = mkv(szOff) & 0xff
    var len = 1
    while ((first & (0x80 >>> (len - 1))) == 0) len += 1
    mkv(szOff) = (mkv(szOff) | (0xff >>> len)).toByte
    for (i <- 1 until len) mkv(szOff + i) = 0xff.toByte
    val meta = MediaCodec.parseMkv(mkv)
    assert(meta.durationMs == 777L)
    assert(meta.tracks.map(t => (t.kind, t.width, t.height)) ==
      Seq(("vide", 64, 48)))
    // but an unknown-size LEAF (TimestampScale) is a parse error
    val bad = MediaCodec.encodeMinimalMkv(Seq.empty, 1L)
    val tsIdx = bad.indexOfSlice(Seq(0x2a, 0xd7, 0xb1).map(_.toByte))
    assert(tsIdx >= 0)
    bad(tsIdx + 3) = 0xff.toByte // 1-byte VINT, all value bits set
    intercept[Exception](MediaCodec.parseMkv(bad))
  }

  test("probeKernel routes every payload type to real container metadata") {
    // mp4
    val mp4 = MediaCodec.encodeMinimalMp4(
      Seq(MediaCodec.TrackMeta("vide", 320, 240, 2000L)), Array[Byte](1, 2))
    val pm = Multimodal.probeKernel(1L, "video/mp4", mp4)
    assert(pm.container == "mp4" && pm.duration_ms == 2000L &&
      pm.video_width == 320 && pm.n_tracks == 1)
    // mkv
    val mkv = MediaCodec.encodeMinimalMkv(
      Seq(MediaCodec.TrackMeta("vide", 320, 240, 0L)), 2500L)
    val pk = Multimodal.probeKernel(2L, "video/x-matroska", mkv)
    assert(pk.container == "mkv" && pk.duration_ms == 2500L &&
      pk.video_height == 240)
    // wav: 8000 samples at 8 kHz = 1000 ms
    val wav = MediaCodec.encodeWavPcm16(new Array[Float](8000), 8000)
    val pw = Multimodal.probeKernel(3L, "audio/wav", wav)
    assert(pw.container == "wav" && pw.duration_ms == 1000L)
    // bmp
    val bmp = MediaCodec.encodeBmp(gradient(10, 6))
    val pb = Multimodal.probeKernel(4L, "image/bmp", bmp)
    assert(pb.container == "bmp" && pb.video_width == 10 && pb.video_height == 6)
    // png via ImageIO header
    val png = MediaCodec.encodePng(gradient(8, 4))
    val pp = Multimodal.probeKernel(5L, "image/png", png)
    assert(pp.container == "image" && pp.video_width == 8)
    // garbage quarantines
    assert(Multimodal.probeKernel(6L, "x", Array[Byte](9, 9, 9)).container
      == "unknown")
  }

  test("MP3 frame-header walk: duration/bitrate without decode, ID3v2 skipped, garbage refused") {
    import graft.operators.{MediaCodec, Multimodal}
    // 38 MPEG1 Layer III frames at 128 kbps / 44100 Hz ≈ 38·1152/44100 s
    val mp3 = MediaCodec.encodeSilentMp3(38, 128, 44100)
    val m = MediaCodec.parseMp3(mp3)
    assert(m.version == 1 && m.frames == 38 && m.sampleRate == 44100 &&
      m.bitrateKbps == 128)
    assert(m.durationMs == 38L * 1152 * 1000 / 44100)
    // an ID3v2 tag is skipped by its syncsafe size, frames unchanged
    val tagged = MediaCodec.encodeSilentMp3(38, 128, 44100, id3Bytes = 300)
    assert(MediaCodec.parseMp3(tagged) == m)
    assert(MediaCodec.isMp3(tagged) && MediaCodec.isMp3(mp3))
    // probeKernel surfaces it as an mp3 probe row with the duration
    val pr = Multimodal.probeKernel(7L, "audio/mpeg", tagged)
    assert(pr.container == "mp3" && pr.duration_ms == m.durationMs &&
      pr.n_tracks == 1)
    // VBR: mixed frame bitrates average (64+192)/2 = 128
    val vbr = MediaCodec.encodeSilentMp3(10, 64, 44100) ++
      MediaCodec.encodeSilentMp3(10, 192, 44100)
    assert(MediaCodec.parseMp3(vbr).bitrateKbps == 128)
    // a bare 0xFFEx in binary noise is NOT an mp3 (first frame must
    // parse and fit), and an ID3 tag alone is not one either
    assert(!MediaCodec.isMp3(Array[Byte](0xff.toByte, 0xfb.toByte, 9, 9)))
    assert(!MediaCodec.isMp3(Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 0)))
    // truncated mid-frame: the walk stops at the last COMPLETE frame
    val cut = MediaCodec.parseMp3(mp3.take(mp3.length - 10))
    assert(cut.frames == 37)
  }

  test("AAC ADTS header walk: duration/bitrate/channels without decode") {
    import graft.operators.{MediaCodec, Multimodal}
    // 43 LC frames at 48000 Hz stereo: 43·1024/48000 s
    val aac = MediaCodec.encodeSilentAdts(43, 48000, 2)
    val m = MediaCodec.parseAdts(aac)
    assert(m.frames == 43 && m.sampleRate == 48000 && m.channels == 2 &&
      m.profile == "LC")
    assert(m.durationMs == 43L * 1024 * 1000 / 48000)
    // bitrate = bytes·8/duration (263-byte frames)
    assert(m.bitrateKbps == aac.length * 8 / m.durationMs)
    assert(MediaCodec.isAdts(aac))
    val pr = Multimodal.probeKernel(8L, "audio/aac", aac)
    assert(pr.container == "aac" && pr.duration_ms == m.durationMs)
    // ADTS sync is 0xFFF with layer 00 — an MP3 stream (layer bits 01)
    // must NOT probe as aac, nor vice versa
    val mp3 = MediaCodec.encodeSilentMp3(5, 128, 44100)
    assert(!MediaCodec.isAdts(mp3))
    assert(!MediaCodec.isMp3(aac))
    // truncated mid-frame stops at the last complete frame; garbage refused
    assert(MediaCodec.parseAdts(aac.take(aac.length - 5)).frames == 42)
    assert(!MediaCodec.isAdts(Array[Byte](0xff.toByte, 0xf1.toByte, 9, 9)))
  }

  test("FLAC STREAMINFO: exact duration from the mandatory first block") {
    import graft.operators.{MediaCodec, Multimodal}
    val flac = MediaCodec.encodeFlacStreamInfo(44100, 2, 16, 441000L)
    val m = MediaCodec.parseFlac(flac)
    assert(m.sampleRate == 44100 && m.channels == 2 &&
      m.bitsPerSample == 16 && m.totalSamples == 441000L &&
      m.durationMs == 10000L)
    val pr = Multimodal.probeKernel(9L, "audio/flac", flac)
    assert(pr.container == "flac" && pr.duration_ms == 10000L)
    // a >32-bit sample count survives the 36-bit field
    val big = MediaCodec.parseFlac(
      MediaCodec.encodeFlacStreamInfo(96000, 8, 24, 0x1_2345_6789L))
    assert(big.totalSamples == 0x1_2345_6789L && big.channels == 8)
    assert(!MediaCodec.isFlac("fLaX-not-flac".getBytes ++ new Array[Byte](40)))
  }

  test("H.264 SPS parse: display resolution/profile via exp-Golomb, crop exact") {
    import graft.operators.{MediaCodec, Multimodal}
    // multiple-of-16 size: no crop rectangle
    val sps = MediaCodec.encodeH264Sps(1280, 720)
    assert(MediaCodec.parseH264Sps(sps)
      .contains(MediaCodec.H264Meta(66, 30, 1280, 720)))
    // 1920x1080: 1088 coded rows, bottom crop 8 = 2 crop units
    val hd = MediaCodec.encodeH264Sps(1920, 1080, profile = 66, level = 40)
    assert(MediaCodec.parseH264Sps(hd)
      .contains(MediaCodec.H264Meta(66, 40, 1920, 1080)))
    // probeKernel surfaces it as an h264 video row
    val pr = Multimodal.probeKernel(10L, "video/h264", hd)
    assert(pr.container == "h264" && pr.video_width == 1920 &&
      pr.video_height == 1080)
    // a start code leading to a non-SPS NAL or garbage yields None
    assert(MediaCodec.parseH264Sps(
      Array[Byte](0, 0, 0, 1, 0x61, 9, 9, 9, 9)).isEmpty)
    assert(MediaCodec.parseH264Sps(
      Array[Byte](0, 0, 1, 0x67, 0x42.toByte)).isEmpty) // truncated SPS
    assert(!MediaCodec.isAnnexB(Array[Byte](9, 9, 9, 9, 9)))
    // exp-Golomb run overflow: an SPS body of all-zero bits reads >30
    // leading zeros on the first ue() — it must yield None, never a
    // bogus resolution from the (1 << 32) - 1 = 0 Int wrap the old cap
    // computed (the "garbage never misparses" contract)
    val allZeros = Array[Byte](0, 0, 0, 1, 0x67, 0x42, 0, 30) ++
      Array.fill[Byte](16)(0)
    assert(MediaCodec.parseH264Sps(allZeros).isEmpty)
  }
}
