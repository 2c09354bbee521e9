package graft.operators

/** Media codecs for SURVEY §2.D12, all real and in-JVM: RIFF/WAVE PCM-16
  * audio and 24-bit uncompressed BMP images are plain headers over raw
  * samples/pixels decoded by hand; compressed IMAGES (JPEG/PNG/GIF/TIFF)
  * decode through the JDK's own ImageIO (java.desktop, headless-safe —
  * no external media library involved). Compressed audio/video METADATA
  * is real with no codec: MP3 and AAC-ADTS frame-header walks (duration/
  * bitrate/channels), FLAC STREAMINFO, and the H.264 SPS bit parse
  * (display resolution/profile/level via exp-Golomb). Only the
  * compressed FRAME DECODE (MP3/AAC/H.264) remains stubbed in
  * `Multimodal`: the JDK ships no codec for those and this environment
  * has no media libraries.
  *
  * All functions are deterministic, allocation-bounded, and run
  * per-row inside executors (no driver involvement, no shared state).
  */
object MediaCodec {

  // ---- RIFF/WAVE (PCM 16-bit) -------------------------------------------

  case class Wav(sampleRate: Int, channels: Int, samples: Array[Float])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Decode PCM-16 WAV: walk the RIFF chunks for fmt + data; samples
    * normalized to [-1, 1], channels interleaved as stored. Chunk sizes
    * are VALIDATED against the buffer — a corrupt/hostile header must
    * throw (callers fall back), never loop forever or read out of
    * bounds.
    */
  def decodeWav(b: Array[Byte]): Wav = {
    require(isWav(b), "not a RIFF/WAVE payload")
    var pos = 12
    var rate = 0; var channels = 0; var bits = 0
    var samples: Array[Float] = null
    while (pos + 8 <= b.length) {
      val id = new String(b, pos, 4, "US-ASCII")
      val size = le32(b, pos + 4)
      require(size >= 0 && pos + 8 + size.toLong <= b.length,
        s"chunk '$id' size $size exceeds payload (${b.length} bytes)")
      if (id == "fmt ") {
        require(size >= 16, s"fmt chunk too short: $size")
        require(le16(b, pos + 8) == 1, "only PCM (format 1) supported")
        channels = le16(b, pos + 10)
        rate = le32(b, pos + 12)
        bits = le16(b, pos + 22)
        require(bits == 16, s"only 16-bit PCM supported, got $bits")
      } else if (id == "data") {
        val n = size / 2
        samples = new Array[Float](n)
        var i = 0
        while (i < n) {
          samples(i) = le16(b, pos + 8 + 2 * i).toShort / 32768.0f
          i += 1
        }
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(samples != null && rate > 0 && channels > 0,
      "missing fmt/data chunk")
    Wav(rate, channels, samples)
  }

  def encodeWavPcm16(samples: Array[Float], sampleRate: Int,
                     channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def put(o: Int, s: String): Unit = {
      var i = 0; while (i < s.length) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def p16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(o: Int, v: Int): Unit = { p16(o, v & 0xffff); p16(o + 2, v >>> 16) }
    put(0, "RIFF"); p32(4, 36 + dataLen); put(8, "WAVE")
    put(12, "fmt "); p32(16, 16); p16(20, 1); p16(22, channels)
    p32(24, sampleRate); p32(28, sampleRate * channels * 2)
    p16(32, channels * 2); p16(34, 16)
    put(36, "data"); p32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      val v = math.max(-1.0f, math.min(1.0f, samples(i)))
      p16(44 + 2 * i, math.round(v * 32767.0f))
      i += 1
    }
    out
  }

  /** RMS energy envelope: the signal split into `dim` equal windows,
    * one root-mean-square amplitude per window — a real, widely used
    * audio summary feature (what a VAD or loudness normalizer bins on).
    */
  def wavEnergyEnvelope(samples: Array[Float], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (samples.isEmpty) return out
    val step = math.max(1, samples.length / dim)
    var d = 0
    while (d < dim) {
      val from = d * step
      val to = if (d == dim - 1) samples.length else math.min(samples.length, from + step)
      var acc = 0.0; var i = from
      while (i < to) { acc += samples(i).toDouble * samples(i); i += 1 }
      out(d) = if (to > from) math.sqrt(acc / (to - from)).toFloat else 0.0f
      d += 1
    }
    out
  }

  /** Linear-interpolation resample to a new sample rate — the audio
    * analog of an image resize. PER CHANNEL over the interleaved frames:
    * interpolating across the raw array would mix left into right.
    */
  def resampleWav(b: Array[Byte], newRate: Int): Array[Byte] = {
    val w = decodeWav(b)
    val ch = math.max(1, w.channels)
    val frames = w.samples.length / ch
    if (frames == 0) return encodeWavPcm16(Array.empty, newRate, w.channels)
    val outFrames = math.max(1, (frames.toLong * newRate / w.sampleRate).toInt)
    val out = new Array[Float](outFrames * ch)
    var c = 0
    while (c < ch) {
      var i = 0
      while (i < outFrames) {
        val src = i.toDouble * (frames - 1) / math.max(1, outFrames - 1)
        val lo = src.toInt
        val hi = math.min(frames - 1, lo + 1)
        val frac = (src - lo).toFloat
        out(i * ch + c) =
          w.samples(lo * ch + c) * (1 - frac) + w.samples(hi * ch + c) * frac
        i += 1
      }
      c += 1
    }
    encodeWavPcm16(out, newRate, w.channels)
  }

  // ---- BMP (24-bit uncompressed) ----------------------------------------

  case class Bmp(width: Int, height: Int, rgb: Array[Byte]) // row-major, top-down

  /** Strict enough to be a DISPATCH predicate over arbitrary binary
    * columns: magic + BITMAPINFOHEADER size + single plane + 24 bpp, so
    * a text payload that merely starts with "BM" never routes here.
    */
  def isBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B' && b(1) == 'M' &&
      le32(b, 14) == 40 && le16(b, 26) == 1 && le16(b, 28) == 24

  private def bmpRowStride(w: Int): Int = (w * 3 + 3) & ~3

  /** Decode 24-bpp uncompressed BMP (the standard bottom-up row order and
    * 4-byte row padding handled); output is top-down RGB. Header fields
    * are VALIDATED against the buffer — corrupt dims/offsets throw
    * (callers fall back) instead of overflowing allocations or reads.
    */
  def decodeBmp(b: Array[Byte]): Bmp = {
    require(isBmp(b), "not a BMP payload")
    val dataOff = le32(b, 10)
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    require(le32(b, 30) == 0, "only uncompressed BMP supported")
    require(w > 0 && h > 0 && w <= (1 << 15) && h <= (1 << 15),
      s"implausible BMP dimensions ${w}x$h")
    require(dataOff >= 54 &&
      dataOff.toLong + bmpRowStride(w).toLong * h <= b.length,
      s"BMP pixel data (offset $dataOff, ${w}x$h) exceeds payload ${b.length}")
    val stride = bmpRowStride(w)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      var x = 0
      while (x < w) {
        val s = dataOff + srcRow * stride + x * 3
        val d = (y * w + x) * 3
        rgb(d) = b(s + 2); rgb(d + 1) = b(s + 1); rgb(d + 2) = b(s) // BGR→RGB
        x += 1
      }
      y += 1
    }
    Bmp(w, h, rgb)
  }

  def encodeBmp(img: Bmp): Array[Byte] = {
    val stride = bmpRowStride(img.width)
    val dataLen = stride * img.height
    val out = new Array[Byte](54 + dataLen)
    def p16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(o: Int, v: Int): Unit = { p16(o, v & 0xffff); p16(o + 2, v >>> 16) }
    out(0) = 'B'; out(1) = 'M'
    p32(2, 54 + dataLen); p32(10, 54); p32(14, 40)
    p32(18, img.width); p32(22, img.height) // positive = bottom-up
    p16(26, 1); p16(28, 24); p32(30, 0); p32(34, dataLen)
    var y = 0
    while (y < img.height) {
      val dstRow = img.height - 1 - y
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        val d = 54 + dstRow * stride + x * 3
        out(d) = img.rgb(s + 2); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Normalized grayscale histogram over `dim` luminance bins — a real
    * image summary feature (what perceptual near-dup filters bin on).
    */
  def bmpGrayHistogram(img: Bmp, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val n = img.width * img.height
    if (n == 0) return out
    var i = 0
    while (i < n) {
      val r = img.rgb(3 * i) & 0xff
      val g = img.rgb(3 * i + 1) & 0xff
      val bl = img.rgb(3 * i + 2) & 0xff
      val lum = (r * 299 + g * 587 + bl * 114) / 1000 // ITU-R BT.601
      out(math.min(dim - 1, lum * dim / 256)) += 1.0f
      i += 1
    }
    var d = 0
    while (d < dim) { out(d) /= n; d += 1 }
    out
  }

  /** Nearest-neighbor resize of a decoded RGB grid. */
  def resizeRgb(img: Bmp, w: Int, h: Int): Bmp = {
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val sy = math.min(img.height - 1, y * img.height / h)
      var x = 0
      while (x < w) {
        val sx = math.min(img.width - 1, x * img.width / w)
        val s = (sy * img.width + sx) * 3
        val d = (y * w + x) * 3
        rgb(d) = img.rgb(s); rgb(d + 1) = img.rgb(s + 1); rgb(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    Bmp(w, h, rgb)
  }

  /** Nearest-neighbor resize producing a valid BMP of the new size. */
  def resizeBmp(b: Array[Byte], w: Int, h: Int): Array[Byte] =
    encodeBmp(resizeRgb(decodeBmp(b), w, h))

  // ---- compressed images via the JDK's own ImageIO -----------------------
  // JPEG/PNG/GIF/TIFF/WBMP readers ship WITH the JDK (java.desktop,
  // headless-safe) — no external media library needed, so these formats
  // get REAL decode, not the stub. Only compressed AUDIO (MP3/AAC) and
  // VIDEO (H.264) remain stubbed: the JDK carries no codec for those.

  /** Magic-number sniff for the formats ImageIO decodes out of the box
    * (BMP excluded — the pure-JVM decoder above owns it).
    */
  def isJdkImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) || // JPEG
      ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||      // PNG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||                // GIF
      (b(0) == 'I' && b(1) == 'I' && b(2) == 0x2a && b(3) == 0) ||                 // TIFF LE
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 0x2a))                   // TIFF BE

  /** Decode any ImageIO-supported payload to the shared RGB grid.
    * Undecodable/corrupt payloads throw IllegalArgumentException like
    * the strict pure-JVM decoders, so callers quarantine identically.
    */
  def decodeImage(b: Array[Byte]): Bmp = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      catch { case e: java.io.IOException =>
        throw new IllegalArgumentException(s"undecodable image: ${e.getMessage}") }
    require(img != null, "undecodable image payload")
    val w = img.getWidth; val h = img.getHeight
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val d = (y * w + x) * 3
        rgb(d) = ((p >> 16) & 0xff).toByte
        rgb(d + 1) = ((p >> 8) & 0xff).toByte
        rgb(d + 2) = (p & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Bmp(w, h, rgb)
  }

  /** Lossless PNG encode of an RGB grid (ImageIO's PNG writer). */
  def encodePng(img: Bmp): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        bi.setRGB(x, y, ((img.rgb(s) & 0xff) << 16) |
          ((img.rgb(s + 1) & 0xff) << 8) | (img.rgb(s + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    bos.toByteArray
  }

  /** Resize a compressed image; the result is PNG (deterministic,
    * lossless — re-encoding JPEG would add generation loss).
    */
  def resizeImage(b: Array[Byte], w: Int, h: Int): Array[Byte] =
    encodePng(resizeRgb(decodeImage(b), w, h))

  // ---- MP4 / ISO-BMFF container (ISO 14496-12 box structure) ------------
  // Container-LEVEL only: the box tree (ftyp/moov/mvhd/trak/tkhd/mdia/
  // mdhd/hdlr/mdat) carries real duration / resolution / track metadata
  // with no codec involved — so track probing is REAL even though frame
  // decode (H.264 et al.) stays stubbed (no codec in the JDK).

  case class TrackMeta(kind: String, width: Int, height: Int,
                       durationMs: Long)
  case class ContainerMeta(container: String, durationMs: Long,
                           tracks: Seq[TrackMeta])

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  /** Build a structurally valid minimal MP4: ftyp + moov(mvhd +
    * trak(tkhd + mdia(mdhd + hdlr)) per track) + mdat(payload). All
    * sizes/fields per the ISO base-media spec; no sample tables (this is
    * a metadata container, the honest boundary without a codec).
    */
  def encodeMinimalMp4(tracks: Seq[TrackMeta], payload: Array[Byte]): Array[Byte] = {
    def box(tpe: String, body: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + body.length)
      val n = out.length
      out(0) = (n >>> 24).toByte; out(1) = (n >>> 16).toByte
      out(2) = (n >>> 8).toByte; out(3) = n.toByte
      for (i <- 0 until 4) out(4 + i) = tpe.charAt(i).toByte
      System.arraycopy(body, 0, out, 8, body.length)
      out
    }
    def u32(v: Long): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def u16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)
    val zeros = (n: Int) => new Array[Byte](n)
    // identity transform matrix (fixed-point, as every muxer writes it)
    val matrix = u32(0x10000L) ++ zeros(12) ++ u32(0x10000L) ++ zeros(12) ++
      u32(0x40000000L)
    val timescale = 1000L // 1 tick = 1 ms
    val durMax = if (tracks.isEmpty) 0L else tracks.map(_.durationMs).max
    val ftyp = box("ftyp",
      "isom".getBytes ++ u32(0x200L) ++ "isommp41".getBytes)
    val mvhd = box("mvhd", zeros(4) ++ u32(0) ++ u32(0) ++ u32(timescale) ++
      u32(durMax) ++ u32(0x10000L) ++ u16(0x0100) ++ zeros(10) ++ matrix ++
      zeros(24) ++ u32(tracks.size + 1L))
    val traks = tracks.zipWithIndex.map { case (t, i) =>
      val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7) ++ u32(0) ++ u32(0) ++
        u32(i + 1L) ++ zeros(4) ++ u32(t.durationMs) ++ zeros(8) ++
        u16(0) ++ u16(0) ++ u16(if (t.kind == "soun") 0x0100 else 0) ++
        u16(0) ++ matrix ++ u32(t.width.toLong << 16) ++
        u32(t.height.toLong << 16))
      val mdhd = box("mdhd", zeros(4) ++ u32(0) ++ u32(0) ++ u32(timescale) ++
        u32(t.durationMs) ++ u16(0x55c4 /* und */) ++ u16(0))
      val hdlr = box("hdlr", zeros(8) ++ t.kind.getBytes ++ zeros(12) ++
        Array[Byte](0))
      box("trak", tkhd ++ box("mdia", mdhd ++ hdlr))
    }
    val moov = box("moov", mvhd ++ traks.flatten.toArray)
    ftyp ++ moov ++ box("mdat", payload)
  }

  /** Walk the box tree and extract container metadata. Tolerant of
    * unknown boxes (skipped by size), intolerant of corrupt sizes.
    * Full ISO 14496-12 size encoding: size==1 means a 64-bit largesize
    * follows the type, size==0 means the box runs to the end of its
    * container; mvhd/tkhd branch on the version byte because version 1
    * widens the time fields to 64 bits.
    */
  def parseMp4(b: Array[Byte]): ContainerMeta = {
    require(isMp4(b), "not an ISO-BMFF file (no ftyp)")
    var durationMs = 0L
    val tracks = Seq.newBuilder[TrackMeta]
    def walk(off: Long, end: Long, path: List[String]): Unit = {
      var o = off
      while (o + 8 <= end) {
        val size32 = be32(b, o.toInt)
        val tpe = new String(b, o.toInt + 4, 4, "ISO-8859-1")
        val (size, hdr) =
          if (size32 == 1L) {
            require(o + 16 <= end, s"corrupt largesize box at $o")
            (be64(b, o.toInt + 8), 16L)
          } else if (size32 == 0L) (end - o, 8L)
          else (size32, 8L)
        require(size >= hdr && o + size <= end, s"corrupt box size at $o")
        val body = (o + hdr).toInt
        tpe match {
          case "moov" | "trak" | "mdia" => walk(body, o + size, tpe :: path)
          case "mvhd" =>
            val v = b(body) & 0xff
            val (ts, dur) =
              if (v == 1) (be32(b, body + 20), be64(b, body + 24))
              else (be32(b, body + 12), be32(b, body + 16))
            if (ts > 0) durationMs = dur * 1000 / ts
          case "tkhd" =>
            // width/height are the last two 16.16 fields of the box
            val w = (be32(b, (o + size - 8).toInt) >>> 16).toInt
            val h = (be32(b, (o + size - 4).toInt) >>> 16).toInt
            val v = b(body) & 0xff
            val dur = if (v == 1) be64(b, body + 28) else be32(b, body + 20)
            tracks += TrackMeta("trak", w, h, dur) // kind patched by hdlr
          case "hdlr" =>
            val kind = new String(b, body + 8, 4, "ISO-8859-1")
            val done = tracks.result()
            if (done.nonEmpty) {
              tracks.clear()
              tracks ++= done.init :+ done.last.copy(kind = kind)
            }
          case _ => // skip (mdat, ftyp payload, unknown)
        }
        o += size
      }
    }
    walk(0L, b.length.toLong, Nil)
    ContainerMeta("mp4", durationMs, tracks.result())
  }

  // ---- Matroska / EBML container (matroska.org spec) --------------------

  def isMkv(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
      (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3

  /** EBML VINT encode for element SIZES (length-marker bit + value). */
  private def vint(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && v >= (1L << (7 * len)) - 1) len += 1
    val out = new Array[Byte](len)
    var x = v | (1L << (7 * len))
    var i = len - 1
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>>= 8; i -= 1 }
    out
  }

  private def ebml(id: Array[Byte], body: Array[Byte]): Array[Byte] =
    id ++ vint(body.length.toLong) ++ body

  private def uintBytes(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && (v >>> (8 * len)) != 0) len += 1
    Array.tabulate(len)(i => ((v >>> (8 * (len - 1 - i))) & 0xff).toByte)
  }

  /** Build a minimal Matroska file: EBML header (DocType matroska) +
    * Segment(Info(TimestampScale, Duration) + Tracks(TrackEntry*)).
    */
  def encodeMinimalMkv(tracks: Seq[TrackMeta], durationMs: Long): Array[Byte] = {
    def id(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray
    val header = ebml(id(0x1a, 0x45, 0xdf, 0xa3),
      ebml(id(0x42, 0x82), "matroska".getBytes) ++ // DocType
        ebml(id(0x42, 0x87), uintBytes(4)) ++      // DocTypeVersion
        ebml(id(0x42, 0x85), uintBytes(2)))        // DocTypeReadVersion
    val info = ebml(id(0x15, 0x49, 0xa9, 0x66),
      ebml(id(0x2a, 0xd7, 0xb1), uintBytes(1000000L)) ++ // ns per tick = 1ms
        ebml(id(0x44, 0x89), { // Duration as float64 ticks
          val bits = java.lang.Double.doubleToLongBits(durationMs.toDouble)
          Array.tabulate(8)(i => ((bits >>> (8 * (7 - i))) & 0xff).toByte)
        }))
    val trackEntries = tracks.zipWithIndex.map { case (t, i) =>
      val video =
        if (t.kind == "vide")
          ebml(id(0xe0), ebml(id(0xb0), uintBytes(t.width.toLong)) ++
            ebml(id(0xba), uintBytes(t.height.toLong)))
        else Array.emptyByteArray
      ebml(id(0xae),
        ebml(id(0xd7), uintBytes(i + 1L)) ++ // TrackNumber
          ebml(id(0x83), uintBytes(if (t.kind == "vide") 1L else 2L)) ++
          video)
    }
    val trackEl = ebml(id(0x16, 0x54, 0xae, 0x6b), trackEntries.flatten.toArray)
    header ++ ebml(id(0x18, 0x53, 0x80, 0x67), info ++ trackEl)
  }

  /** Walk the EBML tree and extract container metadata. */
  def parseMkv(b: Array[Byte]): ContainerMeta = {
    require(isMkv(b), "not an EBML/Matroska file")
    // read an EBML id (leading-ones length) or size VINT at off
    def readId(off: Int): (Long, Int) = {
      val first = b(off) & 0xff
      var len = 1
      while (len <= 4 && (first & (0x80 >>> (len - 1))) == 0) len += 1
      var v = 0L
      for (i <- 0 until len) v = (v << 8) | (b(off + i) & 0xffL)
      (v, len)
    }
    // returns (value, lenBytes, isUnknownSize) — the all-ones VINT is the
    // Matroska "unknown size" marker streamed Segments commonly use
    def readSize(off: Int): (Long, Int, Boolean) = {
      val first = b(off) & 0xff
      var len = 1
      while (len <= 8 && (first & (0x80 >>> (len - 1))) == 0) len += 1
      require(off + len <= b.length, s"truncated size VINT at $off")
      var v = (first & (0xff >>> len)).toLong
      for (i <- 1 until len) v = (v << 8) | (b(off + i) & 0xffL)
      (v, len, v == (1L << (7 * len)) - 1)
    }
    def readUint(off: Int, n: Int): Long = {
      require(n >= 1 && n <= 8, s"uint width $n out of range at $off")
      var v = 0L
      for (i <- 0 until n) v = (v << 8) | (b(off + i) & 0xffL)
      v
    }
    var tsScaleNs = 1000000L
    var durTicks = 0.0
    val tracks = Seq.newBuilder[TrackMeta]
    var kind = ""; var w = 0; var h = 0
    def flushTrack(): Unit = if (kind.nonEmpty) {
      tracks += TrackMeta(kind, w, h, 0L); kind = ""; w = 0; h = 0
    }
    def walk(off: Int, end: Int): Unit = {
      var o = off
      while (o < end) {
        val (idv, idLen) = readId(o)
        require(o + idLen <= end, s"truncated element id at $o")
        val (szRaw, szLen, unknown) = readSize(o + idLen)
        val body = o + idLen + szLen
        val isMaster = idv == 0x18538067L || idv == 0x1549A966L ||
          idv == 0x1654AE6BL || idv == 0xE0L || idv == 0xAEL
        // unknown-size is only legal on master elements: extend to the
        // enclosing container's end, per the Matroska spec
        require(!unknown || isMaster, s"unknown-size VINT on leaf at $o")
        val sz: Long = if (unknown) (end - body).toLong else szRaw
        require(sz >= 0 && body.toLong + sz <= end,
          s"corrupt element size at $o")
        val stop = (body.toLong + sz).toInt // safe: bounded by end (an Int)
        idv match {
          case 0x18538067L | 0x1549A966L | 0x1654AE6BL | 0xE0L =>
            walk(body, stop) // Segment / Info / Tracks / Video
          case 0xAEL => // TrackEntry
            flushTrack(); walk(body, stop)
          case 0x2AD7B1L => tsScaleNs = readUint(body, sz.toInt)
          case 0x4489L =>
            durTicks =
              if (sz == 4) java.lang.Float.intBitsToFloat(
                readUint(body, 4).toInt).toDouble
              else java.lang.Double.longBitsToDouble(readUint(body, 8))
          case 0x83L =>
            kind = if (readUint(body, sz.toInt) == 1L) "vide" else "soun"
          case 0xB0L => w = readUint(body, sz.toInt).toInt
          case 0xBAL => h = readUint(body, sz.toInt).toInt
          case _ => // skip
        }
        o = stop
      }
    }
    walk(0, b.length)
    flushTrack()
    ContainerMeta("mkv", (durTicks * tsScaleNs / 1e6).toLong, tracks.result())
  }

  // ---- MP3 frame headers: metadata WITHOUT decode (round 14) -------------
  // An MPEG audio stream is a sequence of self-describing frames, each
  // opening with an 11-bit sync and a 4-byte header carrying version /
  // layer / bitrate / samplerate indices — duration and average bitrate
  // come from WALKING the headers, no codec required (the frame DECODE
  // stays environment-limited: the JDK ships no MP3 codec). An ID3v2 tag
  // at the start is skipped by its declared syncsafe size. Layer III
  // only (that is what ".mp3" means); free-format (bitrate index 0) and
  // reserved indices stop the walk — headers must never misparse
  // garbage into a duration.

  /** (mpegVersion: 1|2|25, frames, durationMs, avgBitrateKbps,
    * sampleRate) from a frame-header walk. VBR streams average
    * per-frame bitrates, which is what players report.
    */
  case class Mp3Meta(version: Int, frames: Int, durationMs: Long,
                     bitrateKbps: Int, sampleRate: Int)

  private def id3v2Size(b: Array[Byte]): Int =
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
      // syncsafe u28 (7 bits per byte) + the 10-byte tag header
      10 + (((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
            ((b(8) & 0x7f) << 7) | (b(9) & 0x7f))
    else 0

  private def isFrameSync(b: Array[Byte], o: Int): Boolean =
    o + 3 < b.length && (b(o) & 0xff) == 0xff && (b(o + 1) & 0xe0) == 0xe0

  def isMp3(b: Array[Byte]): Boolean = {
    val o = id3v2Size(b)
    (o > 10 || isFrameSync(b, o)) && {
      // an ID3 tag alone is not an MP3: the first frame header must
      // parse (guards against random 0xFFEx bytes in binary payloads)
      val m = parseMp3(b)
      m.frames > 0
    }
  }

  // bitrate kbps by index for Layer III: MPEG1 row, MPEG2/2.5 row
  private val Br1 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Br2 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val Sr1 = Array(44100, 48000, 32000)

  def parseMp3(b: Array[Byte]): Mp3Meta = {
    var o = id3v2Size(b)
    var frames = 0
    var samples = 0L
    var kbpsSum = 0L
    var sr0 = 0
    var ver0 = 0
    var done = false
    while (!done && isFrameSync(b, o)) {
      val b1 = b(o + 1) & 0xff; val b2 = b(o + 2) & 0xff
      val verBits = (b1 >> 3) & 3   // 0=MPEG2.5, 2=MPEG2, 3=MPEG1
      val layer = (b1 >> 1) & 3     // 1 = Layer III
      val brIdx = (b2 >> 4) & 15
      val srIdx = (b2 >> 2) & 3
      val padding = (b2 >> 1) & 1
      if (layer != 1 || verBits == 1 || brIdx == 0 || brIdx == 15 ||
          srIdx == 3) done = true
      else {
        val mpeg1 = verBits == 3
        val kbps = (if (mpeg1) Br1 else Br2)(brIdx)
        val sr = Sr1(srIdx) / (verBits match {
          case 3 => 1; case 2 => 2; case _ => 4
        })
        val spf = if (mpeg1) 1152 else 576 // samples per Layer III frame
        val size = spf / 8 * kbps * 1000 / sr + padding
        if (size <= 4 || o + size > b.length) done = true
        else {
          frames += 1; samples += spf; kbpsSum += kbps
          sr0 = sr
          ver0 = verBits match { case 3 => 1; case 2 => 2; case _ => 25 }
          o += size
        }
      }
    }
    if (frames == 0) Mp3Meta(0, 0, 0L, 0, 0)
    else Mp3Meta(ver0, frames, samples * 1000L / sr0,
      (kbpsSum / frames).toInt, sr0)
  }

  /** A valid Layer III frame sequence with silent payloads — the spec's
    * planting tool (the same role encodeMinimalMp4 plays for
    * containers): `frames` frames at `kbps`/`sampleRate`, optional
    * ID3v2 prefix.
    */
  def encodeSilentMp3(frames: Int, kbps: Int, sampleRate: Int,
                      id3Bytes: Int = 0): Array[Byte] = {
    val brIdx = Br1.indexOf(kbps)
    val srIdx = Sr1.indexOf(sampleRate)
    require(brIdx > 0 && srIdx >= 0, "MPEG1 Layer III table values only")
    val size = 1152 / 8 * kbps * 1000 / sampleRate
    val out = new java.io.ByteArrayOutputStream()
    if (id3Bytes > 0) {
      val body = id3Bytes - 10
      out.write(Array[Byte]('I', 'D', '3', 3, 0, 0,
        ((body >> 21) & 0x7f).toByte, ((body >> 14) & 0x7f).toByte,
        ((body >> 7) & 0x7f).toByte, (body & 0x7f).toByte))
      out.write(new Array[Byte](body))
    }
    (0 until frames).foreach { _ =>
      val f = new Array[Byte](size)
      f(0) = 0xff.toByte
      f(1) = 0xfb.toByte // MPEG1, Layer III, no CRC
      f(2) = ((brIdx << 4) | (srIdx << 2)).toByte // no padding
      out.write(f)
    }
    out.toByteArray
  }

  // ---- AAC ADTS frame headers (round 14) ---------------------------------
  // ADTS (ISO/IEC 13818-7 §6.2) wraps each AAC access unit in a
  // self-describing 7/9-byte header: 12-bit sync 0xFFF, layer 00, then
  // profile / sampling-frequency-index / channel-config / 13-bit frame
  // length. Same deal as MP3: duration, bitrate, channels come from
  // WALKING headers; the AAC frame DECODE stays environment-limited.
  // reference probe surface: src/mysql/metadata.rs has no media probe —
  // this extends graft's D12 ffprobe-shaped superset.

  case class AdtsMeta(frames: Int, durationMs: Long, bitrateKbps: Int,
                      sampleRate: Int, channels: Int, profile: String)

  private val AdtsSr = Array(96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)
  private val AacProfiles = Array("Main", "LC", "SSR", "LTP")

  private def isAdtsSync(b: Array[Byte], o: Int): Boolean =
    o + 6 < b.length && (b(o) & 0xff) == 0xff && (b(o + 1) & 0xf6) == 0xf0

  def isAdts(b: Array[Byte]): Boolean =
    isAdtsSync(b, 0) && parseAdts(b).frames > 0

  def parseAdts(b: Array[Byte]): AdtsMeta = {
    var o = 0
    var frames = 0
    var samples = 0L
    var payloadBytes = 0L
    var sr0 = 0; var ch0 = 0; var prof0 = 0
    var done = false
    while (!done && isAdtsSync(b, o)) {
      val crcAbsent = (b(o + 1) & 1) == 1
      val profile = (b(o + 2) >> 6) & 3
      val srIdx = (b(o + 2) >> 2) & 0xf
      val channelCfg = ((b(o + 2) & 1) << 2) | ((b(o + 3) >> 6) & 3)
      val frameLen = ((b(o + 3) & 3) << 11) | ((b(o + 4) & 0xff) << 3) |
        ((b(o + 5) >> 5) & 7)
      val rdb = (b(o + 6) & 3) + 1 // raw_data_blocks_in_frame + 1
      val hdr = if (crcAbsent) 7 else 9
      // reserved srIdx or a frame shorter than its own header is garbage,
      // never a duration
      if (srIdx >= AdtsSr.length || frameLen <= hdr ||
          o + frameLen > b.length) done = true
      else {
        frames += 1
        samples += 1024L * rdb
        payloadBytes += frameLen
        sr0 = AdtsSr(srIdx); ch0 = channelCfg; prof0 = profile
        o += frameLen
      }
    }
    if (frames == 0) AdtsMeta(0, 0L, 0, 0, 0, "")
    else {
      val durMs = samples * 1000L / sr0
      AdtsMeta(frames, durMs,
        (payloadBytes * 8 / math.max(1L, durMs)).toInt,
        sr0, ch0, AacProfiles(prof0))
    }
  }

  /** Valid ADTS frame sequence with zeroed payloads — the planting tool
    * (LC profile, CRC absent).
    */
  def encodeSilentAdts(frames: Int, sampleRate: Int, channels: Int,
                       payloadPerFrame: Int = 256): Array[Byte] = {
    val srIdx = AdtsSr.indexOf(sampleRate)
    require(srIdx >= 0 && channels >= 1 && channels <= 7,
      "ADTS table sample rates / channel configs only")
    val frameLen = 7 + payloadPerFrame
    val out = new java.io.ByteArrayOutputStream()
    (0 until frames).foreach { _ =>
      val f = new Array[Byte](frameLen)
      f(0) = 0xff.toByte
      f(1) = 0xf1.toByte // MPEG-4, layer 00, CRC absent
      f(2) = ((1 << 6) | (srIdx << 2) | (channels >> 2)).toByte // LC
      f(3) = (((channels & 3) << 6) | ((frameLen >> 11) & 3)).toByte
      f(4) = ((frameLen >> 3) & 0xff).toByte
      f(5) = (((frameLen & 7) << 5) | 0x1f).toByte // buffer fullness hi
      f(6) = 0xfc.toByte // fullness lo, 1 raw data block
      out.write(f)
    }
    out.toByteArray
  }

  // ---- FLAC STREAMINFO (round 14) ----------------------------------------
  // A FLAC stream opens with "fLaC" and a mandatory 34-byte STREAMINFO
  // metadata block (RFC 9639 §8.2): 20-bit sample rate, 3-bit
  // channels-1, 5-bit bps-1, 36-bit total samples — exact duration with
  // no frame walk at all.

  case class FlacMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
                      totalSamples: Long, durationMs: Long)

  def isFlac(b: Array[Byte]): Boolean =
    b.length >= 42 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' &&
      b(3) == 'C' && (b(4) & 0x7f) == 0 && // first block is STREAMINFO
      (((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)) == 34

  def parseFlac(b: Array[Byte]): FlacMeta = {
    require(isFlac(b), "not a FLAC stream")
    val o = 8 // STREAMINFO body; min/max blocksize+framesize occupy 10 bytes
    val sr = ((b(o + 10) & 0xff) << 12) | ((b(o + 11) & 0xff) << 4) |
      ((b(o + 12) & 0xff) >> 4)
    val ch = ((b(o + 12) >> 1) & 7) + 1
    val bps = (((b(o + 12) & 1) << 4) | ((b(o + 13) & 0xff) >> 4)) + 1
    val total = ((b(o + 13) & 0xfL) << 32) | (be32(b, o + 14) & 0xffffffffL)
    FlacMeta(sr, ch, bps, total,
      if (sr == 0) 0L else total * 1000L / sr)
  }

  /** "fLaC" + STREAMINFO (+ empty payload) — the planting tool. */
  def encodeFlacStreamInfo(sampleRate: Int, channels: Int,
                           bitsPerSample: Int,
                           totalSamples: Long): Array[Byte] = {
    val out = new Array[Byte](42)
    Array[Byte]('f', 'L', 'a', 'C', 0x80.toByte, 0, 0, 34)
      .copyToArray(out) // 0x80: last-metadata-block flag + type 0
    val o = 8
    out(o) = 0x10; out(o + 1) = 0; out(o + 2) = 0x10; out(o + 3) = 0
    val sr20 = sampleRate & 0xfffff
    out(o + 10) = ((sr20 >> 12) & 0xff).toByte
    out(o + 11) = ((sr20 >> 4) & 0xff).toByte
    out(o + 12) = (((sr20 & 0xf) << 4) | ((channels - 1) << 1) |
      ((bitsPerSample - 1) >> 4)).toByte
    out(o + 13) = ((((bitsPerSample - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf)).toByte
    out(o + 14) = ((totalSamples >> 24) & 0xff).toByte
    out(o + 15) = ((totalSamples >> 16) & 0xff).toByte
    out(o + 16) = ((totalSamples >> 8) & 0xff).toByte
    out(o + 17) = (totalSamples & 0xff).toByte
    out
  }

  // ---- H.264 SPS: resolution/profile WITHOUT decode (round 14) -----------
  // An H.264 elementary stream's sequence parameter set (NAL type 7)
  // carries the coded picture size in macroblocks plus a crop rectangle
  // (ITU-T H.264 §7.3.2.1.1). Parsing it is pure exp-Golomb bit reading —
  // the real display resolution, profile, and level of a video payload
  // with no decoder. Frame DECODE stays environment-limited.

  case class H264Meta(profile: Int, level: Int, width: Int, height: Int)

  /** MSB-first bit reader over an RBSP (emulation-prevention bytes
    * already stripped).
    */
  private final class BitReader(b: Array[Byte]) {
    private var pos = 0
    def u(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val byte = b(pos >> 3) & 0xff
        v = (v << 1) | ((byte >> (7 - (pos & 7))) & 1)
        pos += 1; i += 1
      }
      v
    }
    def ue(): Int = { // Exp-Golomb: leadingZeros zeros, 1, leadingZeros bits
      var zeros = 0
      while (u(1) == 0) {
        zeros += 1
        // ≥31 leading zeros cannot encode a non-negative Int ue(v):
        // (1 << 31) - 1 + u(31) wraps (the old cap computed (1 << 32) - 1
        // = 0 and returned garbage bits as a value). Malformed ⇒ throw;
        // parseH264Sps's NonFatal handler yields None (the "garbage
        // never misparses" contract). zeros = 30 is the largest run with
        // no overflow anywhere: (2^30 - 1) + (2^30 - 1) < 2^31.
        if (zeros > 30)
          throw new IllegalArgumentException("exp-golomb run overflow")
      }
      (1 << zeros) - 1 + (if (zeros == 0) 0 else u(zeros))
    }
    def se(): Int = { // signed: k -> ceil(k/2) with alternating sign
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
  }

  private def stripEmulation(b: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(to - from)
    var i = from
    while (i < to) {
      if (i + 2 < to && b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 3) {
        out.write(0); out.write(0); i += 3 // drop the 0x03
      } else { out.write(b(i)); i += 1 }
    }
    out.toByteArray
  }

  def isAnnexB(b: Array[Byte]): Boolean =
    b.length >= 5 && b(0) == 0 && b(1) == 0 &&
      (b(2) == 1 || (b(2) == 0 && b(3) == 1))

  /** Find and parse the first SPS NAL in an Annex-B stream; None when no
    * start code leads to a parseable SPS (garbage never misparses into a
    * resolution — scaling-list profiles are walked per spec, truncated
    * streams throw inside and return None).
    */
  def parseH264Sps(b: Array[Byte]): Option[H264Meta] = {
    if (!isAnnexB(b)) return None
    var i = 0
    while (i + 4 < b.length) {
      val sc3 = b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1
      val sc4 = i + 5 < b.length && b(i) == 0 && b(i + 1) == 0 &&
        b(i + 2) == 0 && b(i + 3) == 1
      if (sc3 || sc4) {
        val nalStart = i + (if (sc3) 3 else 4)
        if ((b(nalStart) & 0x1f) == 7) {
          // NAL end = next start code or EOF
          var j = nalStart + 1
          var end = b.length
          while (j + 2 < b.length && end == b.length) {
            if (b(j) == 0 && b(j + 1) == 0 &&
                (b(j + 2) == 1 || b(j + 2) == 0)) end = j
            j += 1
          }
          return try Some(parseSpsRbsp(stripEmulation(b, nalStart + 1, end)))
          catch { case scala.util.control.NonFatal(_) => None }
        }
        i = nalStart
      } else i += 1
    }
    None
  }

  private def parseSpsRbsp(rbsp: Array[Byte]): H264Meta = {
    val r = new BitReader(rbsp)
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    val level = r.u(8)
    r.ue() // seq_parameter_set_id
    var chromaIdc = 1 // 4:2:0 unless the high-profile branch says else
    if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
          .contains(profile)) {
      chromaIdc = r.ue()
      if (chromaIdc == 3) r.u(1) // separate_colour_plane_flag
      r.ue(); r.ue() // bit_depth_{luma,chroma}_minus8
      r.u(1) // qpprime_y_zero_transform_bypass
      if (r.u(1) == 1) { // seq_scaling_matrix_present
        val lists = if (chromaIdc == 3) 12 else 8
        var li = 0
        while (li < lists) {
          if (r.u(1) == 1) { // scaling_list_present
            val size = if (li < 6) 16 else 64
            var last = 8; var next = 8; var k = 0
            while (k < size) {
              if (next != 0) next = (last + r.se() + 256) % 256
              if (next != 0) last = next
              k += 1
            }
          }
          li += 1
        }
      }
    }
    r.ue() // log2_max_frame_num_minus4
    val pocType = r.ue()
    if (pocType == 0) r.ue()
    else if (pocType == 1) {
      r.u(1); r.se(); r.se()
      val n = r.ue()
      var k = 0
      while (k < n) { r.se(); k += 1 }
    }
    r.ue() // max_num_ref_frames
    r.u(1) // gaps_in_frame_num_value_allowed
    val widthMbs = r.ue() + 1
    val heightMapUnits = r.ue() + 1
    val frameMbsOnly = r.u(1)
    if (frameMbsOnly == 0) r.u(1) // mb_adaptive_frame_field
    r.u(1) // direct_8x8_inference
    var cropL = 0; var cropR = 0; var cropT = 0; var cropB = 0
    if (r.u(1) == 1) { cropL = r.ue(); cropR = r.ue(); cropT = r.ue(); cropB = r.ue() }
    // crop units (§7.4.2.1.1): 4:2:0 → x2; x(2-frame_mbs_only) vertically
    val (cux, cuy) = chromaIdc match {
      case 0 => (1, 2 - frameMbsOnly)
      case 1 => (2, 2 * (2 - frameMbsOnly))
      case 2 => (2, 2 - frameMbsOnly)
      case _ => (1, 2 - frameMbsOnly)
    }
    H264Meta(profile, level,
      widthMbs * 16 - cux * (cropL + cropR),
      (2 - frameMbsOnly) * heightMapUnits * 16 - cuy * (cropT + cropB))
  }

  /** Minimal Baseline-profile SPS NAL (Annex-B) for a given display
    * size — the planting tool. Non-multiple-of-16 sizes get the right
    * crop rectangle, so parseH264Sps round-trips exactly.
    */
  def encodeH264Sps(width: Int, height: Int, profile: Int = 66,
                    level: Int = 30): Array[Byte] = {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0,
      "4:2:0 crop units are 2 luma samples")
    val bits = new scala.collection.mutable.ArrayBuffer[Int]()
    def u(v: Int, n: Int): Unit = { var i = n - 1; while (i >= 0) { bits += ((v >> i) & 1); i -= 1 } }
    def ue(v: Int): Unit = {
      val k = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(k)
      u(0, len - 1); u(k, len)
    }
    val wMbs = (width + 15) / 16
    val hMbs = (height + 15) / 16
    // 4:2:0 frame-coded crop units (§7.4.2.1.1): SubWidthC=2,
    // SubHeightC·(2-frame_mbs_only) = 2
    val cropR = (wMbs * 16 - width) / 2
    val cropB = (hMbs * 16 - height) / 2
    u(profile, 8); u(0, 8); u(level, 8)
    ue(0) // sps_id
    ue(0) // log2_max_frame_num_minus4
    ue(0) // pic_order_cnt_type 0
    ue(0) //   log2_max_pic_order_cnt_lsb_minus4
    ue(1) // max_num_ref_frames
    u(0, 1) // gaps_in_frame_num
    ue(wMbs - 1); ue(hMbs - 1)
    u(1, 1) // frame_mbs_only
    u(1, 1) // direct_8x8_inference
    if (cropR > 0 || cropB > 0) { u(1, 1); ue(0); ue(cropR); ue(0); ue(cropB) }
    else u(0, 1)
    u(1, 1) // rbsp_stop_one_bit
    while (bits.length % 8 != 0) bits += 0
    val raw = bits.grouped(8)
      .map(g => g.foldLeft(0)((a, bit) => (a << 1) | bit).toByte).toArray
    // emulation prevention: 00 00 0x -> 00 00 03 0x inside the NAL
    val body = new java.io.ByteArrayOutputStream()
    var zeros = 0
    raw.foreach { byte =>
      if (zeros >= 2 && (byte & 0xfc) == 0) { body.write(3); zeros = 0 }
      if (byte == 0) zeros += 1 else zeros = 0
      body.write(byte)
    }
    Array[Byte](0, 0, 0, 1, 0x67) ++ body.toByteArray // NAL type 7, nri 3
  }
}
