package graft.operators

/** Pure-JVM media codecs — no external library, so the sandbox
  * constraint ("no image/audio codecs installed") does not apply and
  * [[Multimodal]]'s decode path is REAL for every format here:
  * byte-format parses (RIFF/WAVE PCM, uncompressed 24-bit BMP), the
  * G.711 µ-law compander, QOI (run-length/index/delta), and PNG —
  * actual DEFLATE entropy coding via `java.util.zip`, which IS zlib.
  * Transform-coded formats (JPEG/MP3/H.264) still enter through the
  * [[Multimodal.Decoder]] trait and need a real codec behind it.
  *
  * Decoders are strict-but-total: any malformed payload (bad magic,
  * truncated chunk, unsupported variant) returns None — never throws —
  * matching the reference's per-record error-channel philosophy
  * (`flink/stream_to_star.py:284-298` drops the record, keeps the
  * stream).
  */
object MediaCodecs {

  // ---------------------------------------------------------------------
  // WAV (RIFF/WAVE, PCM integer)
  // ---------------------------------------------------------------------

  /** Decoded PCM audio: samples are interleaved 16-bit, `sumSq` is the
    * EXACT integer Σ sample² over all channels (Long cannot overflow
    * below ~2^31 samples), so downstream RMS math is a fixed-shape
    * double expression any engine replays. */
  final case class WavData(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           nSamplesPerChannel: Long, sumSq: Long) {
    /** Whole milliseconds, integer division — engine-exact. */
    def durationMs: Long =
      if (sampleRate <= 0) 0L else nSamplesPerChannel * 1000L / sampleRate
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** 16-bit PCM little-endian encoder (mono or interleaved multichannel;
    * `samples.length` must be a multiple of `channels`). Canonical
    * 44-byte header + data chunk. */
  def encodeWav(samples: Array[Short], sampleRate: Int, channels: Int = 1): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      "samples must interleave a whole number of frames")
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)                       // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2)         // byte rate
      .putShort((channels * 2).toShort)          // block align
      .putShort(16.toShort)                      // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => out.putShort(s))
    out.array()
  }

  /** Chunk walk returning (audioFormat, channels, rate, bits, dataOffset,
    * dataLength) — accepts PCM-16 (format 1) and µ-law-8 (format 7, the
    * G.711 telephony codec); anything else is malformed. */
  private def parseWavLayoutFmt(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int, Int)] = {
    if (bytes == null || bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'))
      return None
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (format, channels, rate, bits)
    var data: Option[(Int, Int)] = None          // (offset, length)
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = u32(bytes, pos + 4)
      if (len < 0 || pos + 8 + len > bytes.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val audioFormat = u16(bytes, pos + 8)
          if (audioFormat != 1 && audioFormat != 7) return None
          fmt = Some((audioFormat, u16(bytes, pos + 10),
            u32(bytes, pos + 12).toInt, u16(bytes, pos + 22)))
        case "data" => data = Some((pos + 8, len.toInt))
        case _ => ()                           // skip LIST/fact/...
      }
      pos += 8 + len.toInt + (len.toInt & 1)   // odd chunks pad one byte
    }
    (fmt, data) match {
      case (Some((f, ch, rate, bits)), Some((off, dlen)))
          if ch >= 1 && rate > 0 &&
            ((f == 1 && bits == 16 && dlen % (2 * ch) == 0) ||
             (f == 7 && bits == 8 && dlen % ch == 0)) =>
        Some((f, ch, rate, bits, off, dlen))
      case _ => None
    }
  }

  /** One chunk walk shared by [[decodeWav]] and [[wavWindowSumSq]]:
    * (channels, rate, bits, dataOffset, dataLength) of a valid PCM-16
    * RIFF/WAVE payload, or None on anything malformed. */
  private def parseWavLayout(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int)] =
    parseWavLayoutFmt(bytes).collect {
      case (1, ch, rate, bits, off, dlen) => (ch, rate, bits, off, dlen)
    }

  // ---------------------------------------------------------------------
  // G.711 µ-law — a REAL lossy audio codec in pure integer arithmetic
  // (the telephony standard): 16-bit linear → 8-bit companded and back.
  // Both directions are closed-form integer formulas, so an engine-
  // external oracle can replay encode ∘ decode exactly.
  // ---------------------------------------------------------------------

  /** Linear 16-bit → µ-law byte (G.711: bias 0x84, clip 32635, 3-bit
    * exponent by leading-bit position, 4-bit mantissa, ones' complement). */
  def mulawEncode(s: Short): Byte = {
    var x = s.toInt
    val sign = if (x < 0) { x = -x; 0x80 } else 0
    if (x > 32635) x = 32635
    x += 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (x & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (x >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | mant)).toByte
  }

  /** µ-law byte → linear 16-bit (the exact inverse expansion). */
  def mulawDecode(b: Byte): Short = {
    val u = (~b) & 0xff
    val exp = (u >> 4) & 7
    val mant = u & 0x0f
    val t = (((mant << 3) + 0x84) << exp) - 0x84
    (if ((u & 0x80) != 0) -t else t).toShort
  }

  /** Encode samples as a format-7 (µ-law) RIFF/WAVE payload — one byte
    * per sample, the real 2:1 companded container a telephony corpus
    * ships in. */
  def encodeWavMulaw(samples: Array[Short], sampleRate: Int,
                     channels: Int = 1): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      "samples must interleave a whole number of frames")
    val dataLen = samples.length
    val out = java.nio.ByteBuffer.allocate(44 + dataLen + (dataLen & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen + (dataLen & 1))
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(7.toShort)                       // µ-law
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels)             // byte rate
      .putShort(channels.toShort)                // block align
      .putShort(8.toShort)                       // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => out.put(mulawEncode(s)))
    out.array()
  }

  /** Decode a µ-law payload: every byte expands through [[mulawDecode]]
    * and the returned WavData carries the LINEAR-domain energy — the
    * numbers a feature pipeline wants, not the companded codes. PCM-16
    * payloads are rejected here (route them through [[decodeWav]]). */
  def decodeWavMulaw(bytes: Array[Byte]): Option[WavData] =
    parseWavLayoutFmt(bytes).collect {
      case (7, ch, rate, bits, off, dlen) =>
        var i = off
        var sumSq = 0L
        while (i < off + dlen) {
          val s = mulawDecode(bytes(i)).toLong
          sumSq += s * s
          i += 1
        }
        WavData(rate, ch, bits, dlen.toLong / ch, sumSq)
    }

  /** RIFF chunk-walking decoder: accepts any chunk order, skips unknown
    * chunks (LIST/INFO/fact/...) including RIFF's odd-size pad byte;
    * requires PCM (format tag 1) at 16 bits. Returns None on anything
    * malformed — wrong magic, truncated chunk, missing fmt/data,
    * unsupported encoding. */
  def decodeWav(bytes: Array[Byte]): Option[WavData] =
    parseWavLayout(bytes).map { case (ch, rate, bits, off, dlen) =>
      var i = off
      var sumSq = 0L
      while (i + 1 < off + dlen) {
        val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toLong
        sumSq += s * s
        i += 2
      }
      WavData(rate, ch, bits, dlen.toLong / (2 * ch), sumSq)
    }

  /** Per-window exact energy over the PCM stream: fold the data chunk
    * into windows of `winFrames` frames (all channels summed together,
    * last window partial) and return each window's (sample count,
    * Σ sample²) — the frame-level feature pass an audio training
    * pipeline runs (VAD thresholds, energy curricula, silence trims)
    * without ever materializing float samples. Same strict-but-total
    * contract as [[decodeWav]]. */
  def wavWindowSumSq(bytes: Array[Byte],
                     winFrames: Int): Option[(WavData, Array[(Long, Long)])] = {
    require(winFrames >= 1, "winFrames must be positive")
    // single pass: the shared layout walk locates the data chunk, the
    // windowed scan below is the only sample traversal, and the
    // whole-stream sumSq is the sum of the window sums it produces
    parseWavLayout(bytes).map { case (ch, rate, bits, dOff, dLen) =>
      val nFrames = dLen.toLong / (2 * ch)
      // Long window math: winFrames near Int.MaxValue ('one window = the
      // whole clip') must not wrap perWin/nWins negative
      val perWinL = winFrames.toLong * ch
      val perWin = math.min(perWinL, math.max(1L, nFrames * ch)).toInt
      val nWins = ((nFrames * ch + perWin - 1) / perWin).toInt
      val out = new Array[(Long, Long)](nWins)
      var total = 0L
      var w = 0
      var i = dOff
      while (w < nWins) {
        var n = 0L; var ss = 0L
        val end = math.min(dOff + dLen, i + perWin * 2)
        while (i + 1 < end) {
          val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toLong
          ss += s * s; n += 1; i += 2
        }
        out(w) = (n, ss); total += ss; w += 1
      }
      (WavData(rate, ch, bits, nFrames, total), out)
    }
  }

  /** Zero-crossing count + peak amplitude over the PCM stream, one pass:
    * a crossing is counted at sample j when sign(s_j) differs from
    * sign(s_{j-ch}) — the previous sample of the SAME channel, so
    * interleaved stereo never counts inter-channel flips — with
    * "negative vs non-negative" as the sign split (0 groups with
    * positive, the usual DSP convention; integer-exact, no epsilon).
    * Peak is max |s| over all channels. The (crossings, peak, frames)
    * triple is the voiced/unvoiced + clipping screen an audio ingest
    * runs next to [[wavWindowSumSq]]'s energy pass. */
  def wavZeroCross(bytes: Array[Byte]): Option[(WavData, Long, Long)] =
    parseWavLayout(bytes).map { case (ch, rate, bits, off, dlen) =>
      var i = off
      var sumSq = 0L
      var crossings = 0L
      var peak = 0L
      val prev = new Array[Long](ch)
      val seen = new Array[Boolean](ch)
      var c = 0
      while (i + 1 < off + dlen) {
        val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toLong
        sumSq += s * s
        if (s > peak) peak = s
        if (-s > peak) peak = -s
        if (seen(c) && ((prev(c) < 0) != (s < 0))) crossings += 1
        prev(c) = s; seen(c) = true
        c += 1; if (c == ch) c = 0
        i += 2
      }
      (WavData(rate, ch, bits, dlen.toLong / (2 * ch), sumSq), crossings, peak)
    }

  /** Exact DFT power at selected bins over channel 0 of the PCM stream —
    * the frequency-domain screen beside [[wavZeroCross]]'s time-domain
    * one (dominant-tone detection, hum/DC screening, bandwidth checks)
    * without an FFT library: per requested bin k (of an N-point DFT,
    * N = frame count), re_k = Σ_n s_n·w_c and im_k = Σ_n s_n·w_s.
    *
    * Determinism: the trig weights are quantized ONCE to integer
    * micro-units — w = round(cos(−2·π·k·n / N)·1e6) half-away-from-zero
    * — so each term is an exact integer product (|s|·1e6 ≤ 3.3e10; the
    * running sum stays far inside a long for any realistic clip) and
    * the fold is order-free integer addition. Any engine that computes
    * the same once-rounded weights replays re/im bit-for-bit; cos/sin
    * themselves are the only libm call, rounded at 1e-6 granularity
    * exactly like every ln in the text operators.
    *
    * Returns per bin (k, re, im) in micro-units (divide by 1e6 for
    * sample units); the returned WavData's sumSq covers CHANNEL 0 only
    * (the analyzed stream), unlike [[decodeWav]]'s all-channel energy.
    * Cost O(N·bins) per asset, one sample pass per bin set, zero
    * allocation beyond the result. */
  // (k, N) → quantized weight tables. Clips cluster on a handful of frame
  // counts and bin sets, so the tables amortize to ~zero; the size cap
  // keeps a pathological every-N-distinct corpus from pinning memory
  // (past it, weights are computed inline — identical values, just slower).
  private val dftWeightCache =
    new java.util.concurrent.ConcurrentHashMap[Long, (Array[Long], Array[Long])]()
  private val dftCachedElems = new java.util.concurrent.atomic.AtomicLong(0)
  // total cached LONGS across all tables (~64 MB at the cap) — an entry
  // COUNT cap alone would let a few minute-long clips pin gigabytes
  private val dftCacheMaxElems = 8L << 20

  private def w6(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  private def dftWeights(k: Int, n: Int): (Array[Long], Array[Long]) = {
    def build: (Array[Long], Array[Long]) = {
      val c = new Array[Long](n); val s = new Array[Long](n)
      var i = 0
      while (i < n) {
        val theta = -2.0 * math.Pi * k * i / n
        c(i) = w6(Math.cos(theta)); s(i) = w6(Math.sin(theta))
        i += 1
      }
      (c, s)
    }
    if (dftCachedElems.get + 2L * n > dftCacheMaxElems) build
    else dftWeightCache.computeIfAbsent((k.toLong << 32) | n, _ => {
      dftCachedElems.addAndGet(2L * n); build
    })
  }

  def wavDftBins(bytes: Array[Byte], bins: Seq[Int]): Option[(WavData, Array[(Int, Long, Long)])] = {
    require(bins.nonEmpty && bins.forall(_ >= 0), "bins must be non-negative")
    parseWavLayout(bytes).flatMap { case (ch, rate, bits, off, dlen) =>
      val nFramesL = dlen.toLong / (2 * ch)
      // exactness bound: each re/im term is <= 32767·1e6 ≈ 3.28e10, so a
      // signed-long accumulator holds ~2.8e8 frames (~1.75 h at 44.1 kHz)
      // before wrapping SILENTLY — longer clips return None (strict but
      // total) instead of an ok=1 garbage magnitude
      if (nFramesL > 280L * 1000 * 1000) return None
      val nFrames = nFramesL.toInt
      var sumSq = 0L
      val out = new Array[(Int, Long, Long)](bins.size)
      var b = 0
      while (b < bins.size) {
        val k = bins(b)
        val (wc, ws) = if (nFrames > 0) dftWeights(k, nFrames)
          else (Array.empty[Long], Array.empty[Long])
        var re = 0L; var im = 0L
        var n = 0
        var i = off
        while (n < nFrames) {
          val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toLong
          if (b == 0) sumSq += s * s // whole-stream energy once, ch-0 only
          re += s * wc(n)
          im += s * ws(n)
          n += 1
          i += 2 * ch // channel 0 of interleaved frames
        }
        out(b) = (k, re, im)
        b += 1
      }
      Some((WavData(rate, ch, bits, nFrames.toLong, sumSq), out))
    }
  }

  // ---------------------------------------------------------------------
  // BMP (BITMAPINFOHEADER, 24 bpp, uncompressed)
  // ---------------------------------------------------------------------

  /** Decoded image: pixels row-major TOP-DOWN, packed 0xRRGGBB. */
  final case class BmpData(width: Int, height: Int, pixels: Array[Int]) {
    def r(x: Int, y: Int): Int = (pixels(y * width + x) >> 16) & 0xff
    def g(x: Int, y: Int): Int = (pixels(y * width + x) >> 8) & 0xff
    def b(x: Int, y: Int): Int = pixels(y * width + x) & 0xff
    /** Exact integer channel sums (r, g, b) for engine-portable means. */
    def channelSums: (Long, Long, Long) = {
      var (sr, sg, sb) = (0L, 0L, 0L)
      pixels.foreach { p =>
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      }
      (sr, sg, sb)
    }
  }

  /** 24-bit uncompressed BMP encoder: BITMAPFILEHEADER +
    * BITMAPINFOHEADER(40), bottom-up rows, each padded to 4 bytes —
    * the canonical layout every viewer reads. `px(x, y)` returns packed
    * 0xRRGGBB with (0,0) the TOP-LEFT pixel. */
  def encodeBmp(width: Int, height: Int, px: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "dimensions must be positive")
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataLen = (rowBytes + pad) * height
    val out = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putShort(0).putShort(0).putInt(54)                  // pixel offset
    out.putInt(40).putInt(width).putInt(height)            // positive = bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(dataLen)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)       // 72 dpi, no palette
    var y = height - 1                                     // bottom row first
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val p = px(x, y)
        out.put((p & 0xff).toByte)                         // B
          .put(((p >> 8) & 0xff).toByte)                   // G
          .put(((p >> 16) & 0xff).toByte)                  // R
        x += 1
      }
      var i = 0
      while (i < pad) { out.put(0.toByte); i += 1 }
      y -= 1
    }
    out.array()
  }

  /** Decoder for the layout [[encodeBmp]] writes plus the common
    * variants: top-down rows (negative height) and any pixel-data offset
    * the file header declares. 24 bpp uncompressed only; anything else
    * (palette, RLE, 32 bpp, truncated data) returns None. */
  def decodeBmp(bytes: Array[Byte]): Option[BmpData] = {
    if (bytes == null || bytes.length < 54) return None
    if (!(bytes(0) == 'B' && bytes(1) == 'M')) return None
    val pixOff = u32(bytes, 10).toInt
    val hdrSize = u32(bytes, 14).toInt
    if (hdrSize < 40) return None
    val width = u32(bytes, 18).toInt
    val rawHeight = u32(bytes, 22).toInt
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val planes = u16(bytes, 26)
    val bpp = u16(bytes, 28)
    val compression = u32(bytes, 30)
    if (width <= 0 || height <= 0 || planes != 1 || bpp != 24 || compression != 0L)
      return None
    // ALL size arithmetic in Long: a crafted header with width near
    // Int.MaxValue overflows Int rowBytes/stride into passing the bounds
    // check and then throws on array allocation — the never-throws
    // contract requires the overflow itself to be unrepresentable here
    val rowBytesL = width.toLong * 3
    val strideL = rowBytesL + (4 - rowBytesL % 4) % 4
    val nPixelsL = width.toLong * height
    if (pixOff < 54 || pixOff.toLong + strideL * height > bytes.length ||
        nPixelsL > Int.MaxValue)
      return None
    val stride = strideL.toInt
    val pixels = new Array[Int](nPixelsL.toInt)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      var x = 0
      val base = pixOff + srcRow * stride
      while (x < width) {
        val b = bytes(base + x * 3) & 0xff
        val g = bytes(base + x * 3 + 1) & 0xff
        val r = bytes(base + x * 3 + 2) & 0xff
        pixels(y * width + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    Some(BmpData(width, height, pixels))
  }

  /** Nearest-neighbor resize with the integer index map
    * `src = (dst * srcDim) div dstDim` — the floor form both engines
    * compute exactly, so a resized image's pixel content is
    * closed-form-checkable from the source formula. */
  def resizeNearest(img: BmpData, outW: Int, outH: Int): BmpData = {
    require(outW > 0 && outH > 0, "target dims must be positive")
    val px = new Array[Int](outW * outH)
    var j = 0
    while (j < outH) {
      val sy = (j.toLong * img.height / outH).toInt
      var i = 0
      while (i < outW) {
        val sx = (i.toLong * img.width / outW).toInt
        px(j * outW + i) = img.pixels(sy * img.width + sx)
        i += 1
      }
      j += 1
    }
    BmpData(outW, outH, px)
  }

  // ---------------------------------------------------------------------
  // QOI (Quite OK Image, qoiformat.org) — a REAL modern LOSSLESS image
  // codec with actual compression machinery (run-length, a 64-slot seen-
  // pixel index, small-delta ops), fully deterministic pure-JVM integer
  // code. Losslessness is the oracle hook: synth → encode → decode must
  // reproduce the closed-form pixels bit-for-bit, so the whole codec is
  // checkable against the same formulas the BMP path uses.
  // ---------------------------------------------------------------------

  /** Encode row-major 0xRRGGBB pixels (alpha fixed 255, 3-channel sRGB)
    * with the standard greedy op order: RUN → INDEX → DIFF → LUMA → RGB. */
  def encodeQoi(width: Int, height: Int, px: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "dims must be positive")
    val out = new java.io.ByteArrayOutputStream(14 + width * height + 8)
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    be32(width); be32(height)
    out.write(3)  // channels
    out.write(0)  // colorspace: sRGB
    val index = new Array[Int](64) // packed 0xAARRGGBB, zero-initialized
    var prev = 0xff000000 // r=g=b=0, a=255
    var run = 0
    var j = 0
    while (j < height) {
      var i = 0
      while (i < width) {
        val rgb = px(i, j) & 0xffffff
        val cur = 0xff000000 | rgb
        if (cur == prev) {
          run += 1
          if (run == 62) { out.write(0xc0 | (run - 1)); run = 0 }
        } else {
          if (run > 0) { out.write(0xc0 | (run - 1)); run = 0 }
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          val slot = (r * 3 + g * 5 + b * 7 + 255 * 11) % 64
          if (index(slot) == cur) out.write(slot) // QOI_OP_INDEX
          else {
            index(slot) = cur
            val pr = (prev >> 16) & 0xff; val pg = (prev >> 8) & 0xff; val pb = prev & 0xff
            val dr = r - pr; val dg = g - pg; val db = b - pb
            if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 && db >= -2 && db <= 1)
              out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)) // DIFF
            else {
              val drg = dr - dg; val dbg = db - dg
              if (dg >= -32 && dg <= 31 && drg >= -8 && drg <= 7 &&
                  dbg >= -8 && dbg <= 7) {                               // LUMA
                out.write(0x80 | (dg + 32)); out.write(((drg + 8) << 4) | (dbg + 8))
              } else { out.write(0xfe); out.write(r); out.write(g); out.write(b) }
            }
          }
          prev = cur
        }
        i += 1
      }
      j += 1
    }
    if (run > 0) out.write(0xc0 | (run - 1))
    (0 until 7).foreach(_ => out.write(0)); out.write(1) // end marker
    out.toByteArray
  }

  /** Decode a 3-or-4-channel QOI payload to [[BmpData]] (alpha dropped);
    * None on bad magic, truncation, or a pixel-count mismatch. */
  def decodeQoi(bytes: Array[Byte]): Option[BmpData] = {
    if (bytes == null || bytes.length < 22) return None
    if (!(bytes(0) == 'q' && bytes(1) == 'o' && bytes(2) == 'i' && bytes(3) == 'f'))
      return None
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    val w = be32(4); val h = be32(8)
    val ch = bytes(12) & 0xff
    // bound each dimension BEFORE multiplying: w,h are raw 32-bit reads,
    // so w*h on crafted headers would overflow Long past the area guard
    // (the decodeBmp hardening, applied here too)
    if (w <= 0 || h <= 0 || w > 64000000L || h > 64000000L ||
        w * h > 64000000L || (ch != 3 && ch != 4)) return None
    val n = (w * h).toInt
    val px = new Array[Int](n)
    val index = new Array[Int](64)
    var r = 0; var g = 0; var b = 0; var a = 255
    var out = 0
    var pos = 14
    val end = bytes.length - 8 // the 8-byte end marker
    while (out < n && pos < end) {
      val b1 = bytes(pos) & 0xff; pos += 1
      if (b1 == 0xfe) {          // RGB
        if (pos + 3 > end) return None
        r = bytes(pos) & 0xff; g = bytes(pos + 1) & 0xff; b = bytes(pos + 2) & 0xff
        pos += 3
      } else if (b1 == 0xff) {   // RGBA
        if (pos + 4 > end) return None
        r = bytes(pos) & 0xff; g = bytes(pos + 1) & 0xff; b = bytes(pos + 2) & 0xff
        a = bytes(pos + 3) & 0xff
        pos += 4
      } else (b1 >> 6) match {
        case 0 =>                // INDEX
          val v = index(b1 & 0x3f)
          a = (v >>> 24) & 0xff; r = (v >> 16) & 0xff; g = (v >> 8) & 0xff; b = v & 0xff
        case 1 =>                // DIFF
          r = (r + ((b1 >> 4) & 3) - 2) & 0xff
          g = (g + ((b1 >> 2) & 3) - 2) & 0xff
          b = (b + (b1 & 3) - 2) & 0xff
        case 2 =>                // LUMA
          if (pos + 1 > end) return None
          val b2 = bytes(pos) & 0xff; pos += 1
          val dg = (b1 & 0x3f) - 32
          g = (g + dg) & 0xff
          r = (r + dg + ((b2 >> 4) & 0x0f) - 8) & 0xff
          b = (b + dg + (b2 & 0x0f) - 8) & 0xff
        case _ =>                // RUN
          val run = (b1 & 0x3f) + 1
          if (out + run > n) return None
          var k = 0
          while (k < run) { px(out) = (r << 16) | (g << 8) | b; out += 1; k += 1 }
          // the run repeats the PREVIOUS pixel: nothing else to do
      }
      // every non-RUN op emits exactly one pixel and updates the index
      // (RUN already emitted its repeats above and changes no state)
      if ((b1 >> 6) != 3 || b1 == 0xfe || b1 == 0xff) {
        if (out >= n) return None
        px(out) = (r << 16) | (g << 8) | b; out += 1
        index((r * 3 + g * 5 + b * 7 + a * 11) % 64) =
          (a << 24) | (r << 16) | (g << 8) | b
      }
    }
    if (out != n) return None
    Some(BmpData(w.toInt, h.toInt, px))
  }

  // ---------------------------------------------------------------------
  // PNG (ISO/IEC 15948 / RFC 2083) — the ubiquitous DEFLATE-compressed
  // lossless image format, and the first REAL entropy-coded codec in this
  // file: java.util.zip's Deflater/Inflater IS zlib (LZ77 + Huffman), so
  // nothing here is a stub. Decode scope: every depth×type combination
  // the spec allows — gray 1/2/4/8/16, truecolor 8/16, palette (PLTE)
  // 1/2/4/8, truecolor+alpha 8/16 — in BOTH interlace methods (Adam7
  // decodes per-pass through the same filter machinery) — palette and
  // progressive PNGs are endemic in crawl data and must not silently
  // vanish from multimodal stats.
  // ---------------------------------------------------------------------

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def pngChunk(out: java.io.ByteArrayOutputStream, typ: String,
                       data: Array[Byte]): Unit = {
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    be32(data.length)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb, 0, 4)
    out.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32
    crc.update(tb); crc.update(data)
    be32(crc.getValue.toInt)
  }

  /** Paeth predictor (PNG spec §9.4) — exact integer form. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode row-major 0xRRGGBB pixels as an 8-bit truecolor PNG with the
    * libpng heuristic: per row, try all five filters and keep the one
    * minimizing Σ|signed filtered byte| — so real encodes exercise every
    * unfilter path, and round-trip tests prove all of them. IDAT is split
    * at 8 KiB so decoders must handle multi-chunk streams (ours does). */
  def encodePng(width: Int, height: Int, px: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "dims must be positive")
    val bpp = 3
    val stride = width * bpp
    val raw = new Array[Byte]((1 + stride) * height)
    val prior = new Array[Byte](stride)   // unfiltered previous row
    val cur = new Array[Byte](stride)
    val cand = new Array[Byte](stride)
    val best = new Array[Byte](stride)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = px(x, y)
        cur(x * 3) = ((p >> 16) & 0xff).toByte
        cur(x * 3 + 1) = ((p >> 8) & 0xff).toByte
        cur(x * 3 + 2) = (p & 0xff).toByte
        x += 1
      }
      var bestF = 0; var bestScore = Long.MaxValue
      var f = 0
      while (f < 5) {
        var score = 0L
        var i = 0
        while (i < stride && score < bestScore) {
          val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
          val b = if (y > 0) prior(i) & 0xff else 0
          val c = if (y > 0 && i >= bpp) prior(i - bpp) & 0xff else 0
          val v = f match {
            case 0 => cur(i) & 0xff
            case 1 => (cur(i) & 0xff) - a
            case 2 => (cur(i) & 0xff) - b
            case 3 => (cur(i) & 0xff) - (a + b) / 2
            case _ => (cur(i) & 0xff) - paeth(a, b, c)
          }
          val sb = v.toByte
          cand(i) = sb
          score += math.abs(sb.toInt)
          i += 1
        }
        if (i == stride && score < bestScore) {
          bestScore = score; bestF = f
          System.arraycopy(cand, 0, best, 0, stride)
        }
        f += 1
      }
      raw(y * (1 + stride)) = bestF.toByte
      System.arraycopy(best, 0, raw, y * (1 + stride) + 1, stride)
      System.arraycopy(cur, 0, prior, 0, stride)
      y += 1
    }
    wrapPng(width, height, depth = 8, colorType = 2, raw, palette = null)
  }

  /** Encode 0xRRGGBB pixels as an ADAM7-INTERLACED 8-bit truecolor PNG
    * (spec §8.2): seven pass sub-images, each filtered per row with the
    * same five-filter heuristic as [[encodePng]] — filter context (a/b/c
    * bytes) is PER PASS, exactly the boundary the decoder must respect.
    * Sub-8×8 images legitimately produce empty passes with no scanlines. */
  def encodePngAdam7(width: Int, height: Int, px: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "dims must be positive")
    val bpp = 3
    val passes = Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val out = new java.io.ByteArrayOutputStream()
    passes.foreach { case (x0, y0, dx, dy) =>
      val wp = math.max(0, (width - x0 + dx - 1) / dx)
      val hp = math.max(0, (height - y0 + dy - 1) / dy)
      if (wp > 0 && hp > 0) {
        val stride = wp * bpp
        val prior = new Array[Byte](stride)
        val cur = new Array[Byte](stride)
        val cand = new Array[Byte](stride)
        val best = new Array[Byte](stride)
        var y = 0
        while (y < hp) {
          var x = 0
          while (x < wp) {
            val p = px(x0 + x * dx, y0 + y * dy)
            cur(x * 3) = ((p >> 16) & 0xff).toByte
            cur(x * 3 + 1) = ((p >> 8) & 0xff).toByte
            cur(x * 3 + 2) = (p & 0xff).toByte
            x += 1
          }
          var bestF = 0; var bestScore = Long.MaxValue
          var f = 0
          while (f < 5) {
            var score = 0L
            var i = 0
            while (i < stride && score < bestScore) {
              val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
              val b = if (y > 0) prior(i) & 0xff else 0
              val c = if (y > 0 && i >= bpp) prior(i - bpp) & 0xff else 0
              val v = f match {
                case 0 => cur(i) & 0xff
                case 1 => (cur(i) & 0xff) - a
                case 2 => (cur(i) & 0xff) - b
                case 3 => (cur(i) & 0xff) - (a + b) / 2
                case _ => (cur(i) & 0xff) - paeth(a, b, c)
              }
              cand(i) = v.toByte
              score += math.abs(v.toByte.toInt)
              i += 1
            }
            if (i == stride && score < bestScore) {
              bestScore = score; bestF = f
              System.arraycopy(cand, 0, best, 0, stride)
            }
            f += 1
          }
          out.write(bestF)
          out.write(best, 0, stride)
          System.arraycopy(cur, 0, prior, 0, stride)
          y += 1
        }
      }
    }
    wrapPng(width, height, depth = 8, colorType = 2, out.toByteArray,
      palette = null, interlaced = true)
  }

  /** zlib-deflate `raw` and frame it as IHDR [+PLTE] +IDAT(8 KiB splits)
    * +IEND. */
  private def wrapPng(width: Int, height: Int, depth: Int, colorType: Int,
                      raw: Array[Byte], palette: Array[Int],
                      interlaced: Boolean = false): Array[Byte] = {
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zout = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!defl.finished()) {
      val n = defl.deflate(buf)
      zout.write(buf, 0, n)
    }
    defl.end()
    val z = zout.toByteArray
    val out = new java.io.ByteArrayOutputStream(z.length + 128)
    out.write(PngSig, 0, 8)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(depth.toByte).put(colorType.toByte)
    ihdr.put(0.toByte).put(0.toByte)               // deflate, filter method 0
    ihdr.put((if (interlaced) 1 else 0).toByte)    // interlace method
    pngChunk(out, "IHDR", ihdr.array())
    if (palette != null) {
      val plte = new Array[Byte](palette.length * 3)
      var k = 0
      while (k < palette.length) {
        plte(3 * k) = ((palette(k) >> 16) & 0xff).toByte
        plte(3 * k + 1) = ((palette(k) >> 8) & 0xff).toByte
        plte(3 * k + 2) = (palette(k) & 0xff).toByte
        k += 1
      }
      pngChunk(out, "PLTE", plte)
    }
    var off = 0
    while (off < z.length) {              // multi-IDAT split
      val n = math.min(8192, z.length - off)
      pngChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, off, off + n))
      off += n
    }
    if (z.isEmpty) pngChunk(out, "IDAT", Array.emptyByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Encode an indexed-color PNG: `palette` of 0xRRGGBB entries (≤ 256,
    * and ≤ 2^depth for `depth` ∈ {1,2,4,8}), `idx(x, y)` the palette
    * index per pixel. Sub-byte indices pack MSB-first within each
    * scanline byte (spec §7.2); rows use filter 0 (filters rarely help
    * index planes — the adaptive heuristic lives in [[encodePng]]). */
  def encodePngPaletted(width: Int, height: Int, palette: Array[Int],
                        idx: (Int, Int) => Int, depth: Int = 8): Array[Byte] = {
    require(width > 0 && height > 0, "dims must be positive")
    require(depth == 1 || depth == 2 || depth == 4 || depth == 8,
      "palette depth must be 1, 2, 4 or 8")
    require(palette.nonEmpty && palette.length <= 256 &&
      palette.length <= (1 << depth), "palette size out of range for depth")
    val stride = (width * depth + 7) / 8
    val raw = new Array[Byte]((1 + stride) * height)
    var y = 0
    while (y < height) {
      val rowOff = y * (1 + stride) + 1    // filter byte stays 0
      var x = 0
      while (x < width) {
        val v = idx(x, y)
        require(v >= 0 && v < palette.length, s"index $v out of palette")
        val bitPos = x * depth
        val shift = 8 - depth - (bitPos & 7)
        raw(rowOff + (bitPos >> 3)) =
          (raw(rowOff + (bitPos >> 3)) | (v << shift)).toByte
        x += 1
      }
      y += 1
    }
    wrapPng(width, height, depth, colorType = 3, raw, palette)
  }

  /** Encode a grayscale PNG at `depth` ∈ {1,2,4,8}: `level(x, y)` returns
    * the gray LEVEL in [0, 2^depth) (not an 8-bit value — the decoder
    * scales levels to 0..255 as level·255/(2^depth−1), per the spec's
    * sample-depth rescaling). Rows use filter 0. */
  def encodePngGray(width: Int, height: Int, depth: Int,
                    level: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "dims must be positive")
    require(depth == 1 || depth == 2 || depth == 4 || depth == 8,
      "gray depth must be 1, 2, 4 or 8")
    val stride = (width * depth + 7) / 8
    val raw = new Array[Byte]((1 + stride) * height)
    var y = 0
    while (y < height) {
      val rowOff = y * (1 + stride) + 1    // filter byte stays 0
      var x = 0
      while (x < width) {
        val v = level(x, y)
        require(v >= 0 && v < (1 << depth), s"level $v out of range for depth")
        val bitPos = x * depth
        val shift = 8 - depth - (bitPos & 7)
        raw(rowOff + (bitPos >> 3)) =
          (raw(rowOff + (bitPos >> 3)) | (v << shift)).toByte
        x += 1
      }
      y += 1
    }
    wrapPng(width, height, depth, colorType = 0, raw, palette = null)
  }

  /** Encode 16-bit-per-sample PNG (gray when `gray16`, else truecolor):
    * `sample(x, y)` returns the 0xRRGGBB (or replicated gray) 8-bit
    * pixel, widened to 16 bits as (v<<8)|v — the exact inverse of the
    * decoder's high-byte reduction, so encode→decode round-trips
    * bit-for-bit on the 8-bit values. */
  def encodePng16(width: Int, height: Int, px: (Int, Int) => Int,
                  gray16: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, "dims must be positive")
    val channels = if (gray16) 1 else 3
    val stride = width * channels * 2
    val raw = new Array[Byte]((1 + stride) * height)
    var y = 0
    while (y < height) {
      val rowOff = y * (1 + stride) + 1    // filter byte stays 0
      var x = 0
      while (x < width) {
        val p = px(x, y)
        val o = rowOff + x * channels * 2
        if (gray16) {
          val v = p & 0xff
          raw(o) = v.toByte; raw(o + 1) = v.toByte
        } else {
          var ci = 0
          while (ci < 3) {
            val v = (p >> (16 - 8 * ci)) & 0xff
            raw(o + 2 * ci) = v.toByte; raw(o + 2 * ci + 1) = v.toByte
            ci += 1
          }
        }
        x += 1
      }
      y += 1
    }
    wrapPng(width, height, depth = 16, colorType = if (gray16) 0 else 2,
      raw, palette = null)
  }

  /** Decode a PNG to [[BmpData]] (gray replicated to RGB, alpha dropped,
    * 16-bit samples reduced to their high byte, palette indices resolved
    * through PLTE). Supported depth×type matrix (PNG spec §11.2.2): gray
    * 1/2/4/8/16, truecolor 8/16, palette 1/2/4/8, truecolor+alpha 8/16 —
    * in BOTH interlace methods: progressive (Adam7, spec §8.2) images
    * decode by running the same filter-reconstruction per PASS
    * sub-image and scattering pixels onto the 8×8 pass grid. Chunk CRCs
    * are VERIFIED — a flipped payload bit is detected, not silently
    * decoded. None on any malformed framing (out-of-range palette index,
    * missing PLTE, misplaced chunks); never throws. */
  def decodePng(bytes: Array[Byte]): Option[BmpData] = {
    if (bytes == null || bytes.length < 8 + 25) return None
    var i = 0
    while (i < 8) { if (bytes(i) != PngSig(i)) return None; i += 1 }
    var pos = 8
    var w = 0L; var h = 0L; var colorType = -1; var depth = 0
    var interlaced = false
    var sawIhdr = false; var sawIend = false; var sawIdat = false
    var palette: Array[Int] = null
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new java.util.zip.CRC32
    while (pos + 12 <= bytes.length && !sawIend) {
      val len = u32be(bytes, pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > bytes.length) return None
      val dataOff = pos + 8
      val dataLen = len.toInt
      crc.reset()
      crc.update(bytes, pos + 4, 4 + dataLen)
      if ((crc.getValue & 0xffffffffL) != u32be(bytes, dataOff + dataLen))
        return None
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (sawIhdr || dataLen != 13) return None
          sawIhdr = true
          w = u32be(bytes, dataOff); h = u32be(bytes, dataOff + 4)
          depth = bytes(dataOff + 8) & 0xff
          colorType = bytes(dataOff + 9) & 0xff
          val (comp, filt, inter) = (bytes(dataOff + 10) & 0xff,
            bytes(dataOff + 11) & 0xff, bytes(dataOff + 12) & 0xff)
          // bound each dim BEFORE multiplying (the decodeBmp hardening)
          if (w <= 0 || h <= 0 || w > 64000000L || h > 64000000L ||
              w * h > 64000000L) return None
          val okCombo = colorType match {
            case 0     => depth == 1 || depth == 2 || depth == 4 ||
                          depth == 8 || depth == 16
            // type 4 = gray+alpha (masks/icons are common crawl assets)
            case 2 | 4 | 6 => depth == 8 || depth == 16
            case 3     => depth == 1 || depth == 2 || depth == 4 || depth == 8
            case _     => false
          }
          if (!okCombo || comp != 0 || filt != 0 || inter > 1) return None
          interlaced = inter == 1
        case "PLTE" =>
          // exactly one, before IDAT, 1..256 RGB triplets; PLTE on a
          // grayscale image is a spec error (§11.2.3)
          if (!sawIhdr || sawIdat || palette != null || colorType == 0 ||
              dataLen == 0 || dataLen % 3 != 0 || dataLen > 768) return None
          palette = new Array[Int](dataLen / 3)
          var k = 0
          while (k < palette.length) {
            palette(k) = ((bytes(dataOff + 3 * k) & 0xff) << 16) |
              ((bytes(dataOff + 3 * k + 1) & 0xff) << 8) |
              (bytes(dataOff + 3 * k + 2) & 0xff)
            k += 1
          }
        case "IDAT" =>
          if (!sawIhdr) return None
          sawIdat = true
          idat.write(bytes, dataOff, dataLen)
        case "IEND" => sawIend = true
        case _ => // ancillary (tEXt, pHYs, gAMA, …) — skip
          if (!sawIhdr) return None
      }
      pos = dataOff + dataLen + 4
    }
    if (!sawIhdr || !sawIend) return None
    if (colorType == 3 && palette == null) return None
    val channels = colorType match {
      case 0 | 3 => 1; case 2 => 3; case 4 => 2; case _ => 4 }
    val bitsPp = depth * channels               // bits per pixel ≤ 64
    val width = w.toInt; val height = h.toInt
    // Adam7 pass grid (x0, y0, dx, dy) per spec §8.2; non-interlaced
    // decodes as ONE full-frame pass through the identical machinery
    val passes: Array[(Int, Int, Int, Int)] =
      if (!interlaced) Array((0, 0, 1, 1))
      else Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
      val (x0, y0, dx, dy) = p
      (math.max(0, (width - x0 + dx - 1) / dx),
        math.max(0, (height - y0 + dy - 1) / dy))
    }
    // empty passes (sub-8px images) contribute NO scanlines (spec §8.2)
    val rawLen = passes.map { p =>
      val (wp, hp) = passDims(p)
      if (wp == 0 || hp == 0) 0L
      else (1L + (wp.toLong * bitsPp + 7) / 8) * hp
    }.sum
    if (rawLen > Int.MaxValue) return None
    val raw = new Array[Byte](rawLen.toInt)
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !infl.finished()) {
        val n = infl.inflate(raw, got, raw.length - got)
        // Zero progress without finishing means the stream can never
        // complete: truncated input (needsInput) OR a preset-dictionary
        // stream (FDICT set → needsDictionary, where needsInput stays
        // false and the loop would spin forever). Either way: reject.
        if (n == 0 && !infl.finished()) return None
        got += n
      }
      // a correct stream yields EXACTLY the filtered-scanline byte count
      if (got != raw.length || !(infl.finished() ||
          infl.inflate(new Array[Byte](1)) == 0 && infl.finished()))
        return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally infl.end()
    val px = new Array[Int](width * height)
    // filters operate on BYTES at a pixel's byte distance; for sub-byte
    // pixels that distance is one byte (spec §9.2)
    val fbpp = math.max(1, bitsPp / 8)
    val sampleStep = depth / 8                  // 0 for sub-byte
    var base = 0                                // pass start within raw
    var pi = 0
    while (pi < passes.length) {
      val (x0, y0, dx, dy) = passes(pi)
      val (wp, hp) = passDims(passes(pi))
      if (wp > 0 && hp > 0) {
        val stride = (wp * bitsPp + 7) / 8
        var y = 0
        while (y < hp) {
          val rowOff = base + y * (1 + stride) + 1
          val filter = raw(rowOff - 1) & 0xff
          if (filter > 4) return None
          var i2 = 0
          while (i2 < stride) {
            val priorOff = rowOff - 1 - stride // previous row's recon'd bytes
            val a = if (i2 >= fbpp) raw(rowOff + i2 - fbpp) & 0xff else 0
            val b = if (y > 0) raw(priorOff + i2) & 0xff else 0
            val c = if (y > 0 && i2 >= fbpp) raw(priorOff + i2 - fbpp) & 0xff else 0
            val recon = filter match {
              case 0 => raw(rowOff + i2) & 0xff
              case 1 => ((raw(rowOff + i2) & 0xff) + a) & 0xff
              case 2 => ((raw(rowOff + i2) & 0xff) + b) & 0xff
              case 3 => ((raw(rowOff + i2) & 0xff) + (a + b) / 2) & 0xff
              case _ => ((raw(rowOff + i2) & 0xff) + paeth(a, b, c)) & 0xff
            }
            raw(rowOff + i2) = recon.toByte // in place: next bytes read recon'd
            i2 += 1
          }
          var x = 0
          while (x < wp) {
            var rgb = 0
            if (depth < 8) {               // gray 1/2/4 or palette 1/2/4
              val bitPos = x * depth
              val shift = 8 - depth - (bitPos & 7)
              val v = (raw(rowOff + (bitPos >> 3)) >> shift) & ((1 << depth) - 1)
              if (colorType == 3) {
                if (v >= palette.length) return None
                rgb = palette(v)
              } else {                     // scale to full 8-bit range
                val s = v * 255 / ((1 << depth) - 1)
                rgb = (s << 16) | (s << 8) | s
              }
            } else {
              // 8-bit sample = the byte; 16-bit sample = its HIGH byte
              // (big-endian — the standard 16→8 reduction)
              val o = rowOff + x * channels * sampleStep
              colorType match {
                // gray (+alpha, ignored like type 6's): first sample is luma
                case 0 | 4 => val v = raw(o) & 0xff; rgb = (v << 16) | (v << 8) | v
                case 3 =>
                  val v = raw(o) & 0xff
                  if (v >= palette.length) return None
                  rgb = palette(v)
                case _ =>
                  rgb = ((raw(o) & 0xff) << 16) |
                    ((raw(o + sampleStep) & 0xff) << 8) |
                    (raw(o + 2 * sampleStep) & 0xff)
              }
            }
            px((y0 + y * dy) * width + (x0 + x * dx)) = rgb
            x += 1
          }
          y += 1
        }
        base += (1 + stride) * hp
      }
      pi += 1
    }
    Some(BmpData(width, height, px))
  }

  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  // =========================================================================
  // GIF (real LZW) — the remaining endemic crawl-image container after
  // BMP/QOI/PNG. GIF87a writer, 87a/89a reader (89a extension blocks are
  // skipped), global+local color tables, interlace, variable-width LZW
  // with clear-code resets and deferred-clear tolerance. Same contract as
  // decodePng: STRICT BUT TOTAL — None on any malformed payload, never
  // throws, never hangs, output bounded by the declared w×h.
  // Format: GIF87a spec (CompuServe, 1987) / RFC-adjacent W3C GIF89a note.
  // Reference repo treats media as opaque blobs (no codec surface to cite).
  // =========================================================================

  /** Interlace pass schedule: (first row, row step) per GIF spec. */
  private val GifPasses = Array((0, 8), (4, 8), (2, 4), (1, 2))

  /** Encode a GIF87a image. `palette` = packed 0xRRGGBB colors (1..256);
    * `index(x, y)` returns the palette index of the TOP-LEFT-origin
    * pixel. Real variable-width LZW with dictionary resets at 4096
    * codes, so arbitrarily large frames encode correctly. */
  def encodeGif(width: Int, height: Int, palette: Array[Int],
                index: (Int, Int) => Int,
                interlaced: Boolean = false): Array[Byte] =
    encodeGifFrames(width, height, palette, Seq(index), interlaced,
      delayCs = 0)

  /** Multi-frame (animated) GIF89a: each frame gets a Graphic Control
    * Extension carrying `delayCs` (centiseconds) and its own
    * LZW-compressed image. One frame with delay 0 degrades to the
    * plain-87a layout [[encodeGif]] emits. */
  def encodeGifFrames(width: Int, height: Int, palette: Array[Int],
                      frames: Seq[(Int, Int) => Int],
                      interlaced: Boolean = false,
                      delayCs: Int = 4): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
      "dims must fit u16")
    require(width.toLong * height <= 64L * 1024 * 1024,
      "pixel count over the 64M cap (the decoder's bomb bound)")
    require(palette.nonEmpty && palette.length <= 256, "palette size 1..256")
    require(frames.nonEmpty, "at least one frame")
    require(delayCs >= 0 && delayCs <= 0xffff, "delay must fit u16")
    val animated = frames.length > 1
    // GCT size is 2^(N+1); LZW min code size covers the table and is >= 2
    var gctBits = 1
    while ((1 << gctBits) < palette.length) gctBits += 1
    val tableSize = 1 << gctBits
    val mcs = math.max(2, gctBits)
    val out = new java.io.ByteArrayOutputStream()
    def u16le(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write((if (animated) "GIF89a" else "GIF87a").getBytes("US-ASCII"))
    u16le(width); u16le(height)
    out.write(0x80 | (7 << 4) | (gctBits - 1)) // GCT present, 8-bit color res
    out.write(0)                               // background color index
    out.write(0)                               // aspect ratio
    var i = 0
    while (i < tableSize) {
      val c = if (i < palette.length) palette(i) else 0
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
      i += 1
    }
    frames.foreach { index =>
      if (animated) {                          // GCE: delay, no transparency
        out.write(0x21); out.write(0xf9); out.write(4)
        out.write(0); u16le(delayCs); out.write(0); out.write(0)
      }
      out.write(0x2c)                          // image descriptor
      u16le(0); u16le(0); u16le(width); u16le(height)
      out.write(if (interlaced) 0x40 else 0x00) // no LCT
      out.write(mcs)
      // pixel indices in STORED row order (interlace permutes rows on disk)
      val rows: Seq[Int] =
        if (interlaced) GifPasses.toIndexedSeq.flatMap { case (f, s) => f until height by s }
        else 0 until height
      val data = new Array[Byte](width * height)
      var p = 0
      rows.foreach { y =>
        var x = 0
        while (x < width) {
          val v = index(x, y)
          require(v >= 0 && v < tableSize, s"index $v out of color table")
          data(p) = v.toByte; p += 1; x += 1
        }
      }
      writeGifLzw(out, data, mcs)
    }
    out.write(0x3b)                            // trailer
    out.toByteArray
  }

  /** LZW-compress `data` (LSB-first bit packing) and emit it as
    * 255-byte sub-blocks + terminator. */
  private def writeGifLzw(out: java.io.ByteArrayOutputStream,
                          data: Array[Byte], mcs: Int): Unit = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val body = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nbits = 0; var codeWidth = mcs + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << nbits; nbits += codeWidth
      while (nbits >= 8) { body.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
    }
    var dict = new java.util.HashMap[Long, Integer]()
    var next = eoi + 1
    emit(clear)
    var cur = data(0) & 0xff
    var p = 1
    while (p < data.length) {
      val k = data(p) & 0xff
      val key = (cur.toLong << 8) | k
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        emit(cur)
        if (next <= 4095) {
          dict.put(key, Integer.valueOf(next)); next += 1
          // grow when the decoder's mirrored table reaches 2^width
          // (its `next` trails ours by one — see decodeGif)
          if (next == (1 << codeWidth) + 1 && codeWidth < 12) codeWidth += 1
        } else {
          emit(clear)
          dict = new java.util.HashMap[Long, Integer]()
          next = eoi + 1; codeWidth = mcs + 1
        }
        cur = k
      }
      p += 1
    }
    emit(cur)
    // the decoder ADDS one more entry after reading that final data code
    // (the encoder has nothing to pair it with — the stream ended), and
    // if its `next` lands exactly on 2^width it grows before reading the
    // NEXT code: mirror the phantom add so EOI is written at the width
    // the decoder will read it with (caught by MediaSpec's boundary
    // round-trip — (x+y)&3 on 5×4 at mcs=2 ends on next == 16 == 2^4)
    if (next == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
    emit(eoi)
    if (nbits > 0) body.write((acc & 0xff).toInt)
    val enc = body.toByteArray
    var off = 0
    while (off < enc.length) {
      val n = math.min(255, enc.length - off)
      out.write(n); out.write(enc, off, n); off += n
    }
    out.write(0)                               // block terminator
  }

  final case class GifMeta(width: Int, height: Int, nFrames: Long,
                           animated: Boolean, interlaced: Boolean)

  /** Structural metadata WITHOUT decoding pixels: canvas dims, frame
    * count (animated-GIF detection — a crawl pipeline's poster-frame /
    * video-ish routing signal), interlace flag of the first frame. Walks
    * every block — extensions skipped, each frame's LZW sub-blocks
    * skipped by length — and requires a clean trailer; None on any
    * malformed framing. Cost is O(container bytes), no LZW work. */
  def gifMeta(bytes: Array[Byte]): Option[GifMeta] = {
    if (bytes == null || bytes.length < 14) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    var pos = 6
    def avail(n: Int): Boolean = pos + n <= bytes.length
    def u16(): Int = { val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8); pos += 2; v }
    if (!avail(7)) return None
    val w = u16(); val h = u16()
    val packed = bytes(pos) & 0xff; pos += 3
    if ((packed & 0x80) != 0) {
      val n = 3 * (1 << ((packed & 7) + 1))
      if (!avail(n)) return None
      pos += n
    }
    var frames = 0L
    var firstInterlaced = false
    def skipSubBlocks(): Boolean = {
      var len = -1
      while (len != 0) {
        if (!avail(1)) return false
        len = bytes(pos) & 0xff; pos += 1
        if (len > 0) { if (!avail(len)) return false; pos += len }
      }
      true
    }
    while (true) {
      if (!avail(1)) return None
      val intro = bytes(pos) & 0xff; pos += 1
      intro match {
        case 0x21 =>
          if (!avail(1)) return None
          pos += 1
          if (!skipSubBlocks()) return None
        case 0x2c =>
          if (!avail(9)) return None
          pos += 8
          val ipacked = bytes(pos) & 0xff; pos += 1
          if (frames == 0) firstInterlaced = (ipacked & 0x40) != 0
          if ((ipacked & 0x80) != 0) {
            val n = 3 * (1 << ((ipacked & 7) + 1))
            if (!avail(n)) return None
            pos += n
          }
          if (!avail(1)) return None
          pos += 1                             // LZW min code size
          if (!skipSubBlocks()) return None
          frames += 1
        case 0x3b =>
          if (frames == 0) return None
          return Some(GifMeta(w, h, frames, frames > 1, firstInterlaced))
        case _ => return None
      }
    }
    None
  }

  /** Decode the FIRST image frame of a GIF87a/89a payload to pixels.
    * Handles global AND local color tables, interlace, 89a extension
    * blocks (skipped), variable-width LZW with clear codes, the KwKwK
    * self-referencing case, and deferred clears (full table keeps
    * decoding at 12 bits until a clear arrives). Returns None on any
    * structural violation: bad signature, truncated sub-blocks, codes
    * beyond the table, or pixel output ≠ the descriptor's w×h. Frames
    * after the first (animation) are ignored — feature extraction reads
    * the poster frame. */
  def decodeGif(bytes: Array[Byte]): Option[BmpData] = {
    if (bytes == null || bytes.length < 14) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    var pos = 6
    def avail(n: Int): Boolean = pos + n <= bytes.length
    def u16(): Int = { val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8); pos += 2; v }
    if (!avail(7)) return None
    u16(); u16()                               // logical screen dims (canvas)
    val packed = bytes(pos) & 0xff; pos += 3   // packed, bg index, aspect
    var table: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 7) + 1)
      if (!avail(3 * n)) return None
      table = Array.tabulate(n) { i =>
        val o = pos + 3 * i
        ((bytes(o) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) | (bytes(o + 2) & 0xff)
      }
      pos += 3 * n
    }
    // walk blocks to the first image descriptor, skipping extensions
    var guard = 0
    while (guard < 4096) {
      guard += 1
      if (!avail(1)) return None
      val intro = bytes(pos) & 0xff; pos += 1
      intro match {
        case 0x21 =>                           // extension: label + sub-blocks
          if (!avail(1)) return None
          pos += 1
          var len = -1
          while (len != 0) {
            if (!avail(1)) return None
            len = bytes(pos) & 0xff; pos += 1
            if (len > 0) { if (!avail(len)) return None; pos += len }
          }
        case 0x2c =>                           // image descriptor
          if (!avail(9)) return None
          u16(); u16()                         // left, top (frame offset)
          val w = u16(); val h = u16()
          val ipacked = bytes(pos) & 0xff; pos += 1
          if (w <= 0 || h <= 0) return None
          if (w.toLong * h > 64L * 1024 * 1024) return None // bomb cap
          val interlaced = (ipacked & 0x40) != 0
          var colors = table
          if ((ipacked & 0x80) != 0) {         // local color table wins
            val n = 1 << ((ipacked & 7) + 1)
            if (!avail(3 * n)) return None
            colors = Array.tabulate(n) { i =>
              val o = pos + 3 * i
              ((bytes(o) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) | (bytes(o + 2) & 0xff)
            }
            pos += 3 * n
          }
          if (colors == null) return None
          if (!avail(1)) return None
          val mcs = bytes(pos) & 0xff; pos += 1
          // spec caps the LZW min code size at 8 (256-color tables);
          // accepting 9..11 would let root codes 256..2047 truncate to a
          // byte in the index buffer — silent pixel corruption
          if (mcs < 2 || mcs > 8) return None
          return decodeGifLzw(bytes, pos, w, h, mcs, interlaced, colors)
        case 0x3b => return None               // trailer before any image
        case _ => return None
      }
    }
    None
  }

  /** LZW-decode one image's sub-block stream into BmpData. */
  private def decodeGifLzw(bytes: Array[Byte], start: Int, w: Int, h: Int,
                           mcs: Int, interlaced: Boolean,
                           colors: Array[Int]): Option[BmpData] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    // dictionary as prefix/suffix arrays; roots are their own suffix
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = eoi + 1
    var codeWidth = mcs + 1
    val nPix = w * h
    val idxOut = new Array[Byte](nPix)
    var got = 0
    var pos = start
    var blockLeft = 0
    var acc = 0L; var nbits = 0
    var prev = -1
    val stack = new Array[Byte](4096)
    var done = false
    while (!done) {
      // refill the bit buffer across sub-block boundaries
      while (nbits < codeWidth) {
        if (blockLeft == 0) {
          if (pos >= bytes.length) return None
          blockLeft = bytes(pos) & 0xff; pos += 1
          if (blockLeft == 0) return None      // terminator before EOI code
        }
        if (pos >= bytes.length) return None
        acc |= (bytes(pos) & 0xffL) << nbits; nbits += 8; pos += 1; blockLeft -= 1
      }
      val code = (acc & ((1L << codeWidth) - 1)).toInt
      acc >>= codeWidth; nbits -= codeWidth
      if (code == clear) {
        next = eoi + 1; codeWidth = mcs + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev == -1) {
        if (code >= clear) return None         // first code must be a root
        if (got >= nPix) return None
        idxOut(got) = code.toByte; got += 1
        prev = code
      } else {
        if (code > next || (code == next && next > 4095)) return None
        // materialize the string for `code` (KwKwK: prev's string + its head)
        var sp = 0
        var c = if (code == next) prev else code
        while (c >= clear) {                   // walk the chain to the root
          if (sp >= 4096) return None          // corrupt self-referencing chain
          stack(sp) = suffix(c); sp += 1; c = prefix(c)
        }
        if (c >= clear) return None
        val head = c.toByte
        val extra = if (code == next) 1 else 0
        if (got + 1 + sp + extra > nPix) return None
        idxOut(got) = head; got += 1
        while (sp > 0) { sp -= 1; idxOut(got) = stack(sp); got += 1 }
        if (code == next) { idxOut(got) = head; got += 1 }
        if (next <= 4095) {
          prefix(next) = prev; suffix(next) = head; next += 1
          if (next == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        prev = code
      }
    }
    if (got != nPix) return None
    // map stored row order back to raster order, then indices to colors
    val px = new Array[Int](nPix)
    val rows: Seq[Int] =
      if (interlaced) GifPasses.toIndexedSeq.flatMap { case (f, s) => f until h by s }
      else 0 until h
    var r = 0
    rows.foreach { y =>
      var x = 0
      while (x < w) {
        val ix = idxOut(r * w + x) & 0xff
        if (ix >= colors.length) return None
        px(y * w + x) = colors(ix)
        x += 1
      }
      r += 1
    }
    Some(BmpData(w, h, px))
  }

  // ---------------------------------------------------------------------
  // JPEG — the dominant web image format, via the JDK's javax.imageio
  // (public knowledge, pure-JVM, present in every Java 17 runtime). The
  // pipeline contracts are the same as the hand-built codecs: decode
  // never throws (None on anything malformed), the 64M-pixel bomb cap
  // holds, pixels land in [[BmpData]]'s packed-RGB layout. Unlike
  // BMP/QOI/PNG/GIF this codec is LOSSY — consumers that need
  // bit-exactness (the lossless round-trip oracles) stay on the
  // lossless containers; the perceptual-hash family tolerates the loss
  // by construction (fixtures keep every aHash/dHash comparison far
  // from its threshold, see synthJpegBmpPairAssets).
  // ---------------------------------------------------------------------

  /** Decode a JPEG payload to [[BmpData]]. None on: null/short input,
    * wrong magic (SOI 0xFFD8), imageio failure of any kind, or
    * dimensions over the 64M-pixel bomb cap (checked BEFORE full decode
    * via the header-only reader, so a dimension bomb never allocates). */
  def decodeJpeg(bytes: Array[Byte]): Option[BmpData] = {
    if (bytes == null || bytes.length < 3) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    try {
      // MemoryCache stream, NOT ImageIO.createImageInputStream: the
      // factory honors ImageIO.getUseCache() (default true) and backs
      // every stream with a NEW TEMP FILE — at 32 decode threads the
      // create/delete churn in java.io.tmpdir serializes on the
      // filesystem (measured r18: q270's 11× run-to-run spread). The
      // payloads are KB-sized byte arrays; caching them in memory is
      // strictly cheaper and semantically identical.
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val (w, h) = (reader.getWidth(0), reader.getHeight(0))
          if (w <= 0 || h <= 0 || w.toLong * h > 64000000L) return None
          val img = reader.read(0)
          val px = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              px(y * w + x) = img.getRGB(x, y) & 0xffffff
              x += 1
            }
            y += 1
          }
          Some(BmpData(w, h, px))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch {
      // NonFatal, not Throwable: a malformed stream surfaces as
      // IIOException/IllegalArgumentException/etc. and must yield None,
      // but OutOfMemoryError or InterruptedException are executor-level
      // failures that masking as "undecodable image" would hide.
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Encode a synthetic image as REAL JPEG bytes at an explicit quality
    * (0..1) — the fixture-side encoder ([[encodeBmp]]'s convention:
    * `px(x, y)` returns packed 0xRRGGBB, (0,0) top-left). */
  def encodeJpeg(width: Int, height: Int, px: (Int, Int) => Int,
                 quality: Float = 0.9f): Array[Byte] = {
    require(width > 0 && height > 0, "dimensions must be positive")
    require(width.toLong * height <= 64000000L,
      "pixel count over the 64M cap (the decoder's bomb bound)")
    require(quality > 0f && quality <= 1f, "quality in (0, 1]")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, px(x, y) & 0xffffff); x += 1 }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    // MemoryCache stream for the same reason as decodeJpeg's reader: the
    // ImageIO factory would back this with a temp FILE per encode
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  // ---------------------------------------------------------------------
  // WebP — container PROBE only (variant + dimensions + alpha), no pixel
  // decode. The deliberate scope (SURVEY §7.4 #6): lossy VP8 is a
  // DCT/loop-filter video codec (the JPEG-by-hand class, out of scope
  // exactly as JPEG was until javax.imageio covered it — the JDK has no
  // WebP reader); lossless VP8L's entropy core is implementable in
  // principle (prefix codes + LZ77 + color cache, the gzip/PNG shape),
  // but a CORRECT decoder requires normative constant tables (the
  // 120-entry distance neighbor map, the 14 predictor-mode formulas,
  // the cross-color 3.5-bit fixed-point semantics) that cannot be
  // verified in this zero-egress sandbox — and a codec transcribed from
  // imperfect memory would silently mis-decode real files, violating
  // the family's decode-never-lies contract (BMP/QOI/PNG/GIF/WAV were
  // built from fully-known layouts; JPEG delegated to the JDK). The
  // HEADER layouts below are simple fixed-width fields and carry no
  // such risk; probing gives a pipeline typed routing (count/segment/
  // quarantine WebP assets, dimensions for layout stats) without
  // claiming pixels it cannot produce.
  // ---------------------------------------------------------------------

  /** Container classification by magic bytes — the typed routing the
    * [[graft.operators.Multimodal.imageAHashSniff]] dispatch applies
    * inline, exposed as a total function for inventory/quarantine
    * stages: `bmp` (BM), `qoi`, `png`, `gif`, `jpeg` (SOI), `webp`
    * (RIFF…WEBP), `wav` (RIFF…WAVE), or `unknown`. Magic-byte only —
    * a sniff names the container, [[probeWebp]]/the decoders validate
    * it. Length guards are PER-BRANCH (the r16 ADVICE finding): a
    * magic that fits the payload classifies even when the payload is
    * shorter than the 12 bytes the RIFF forms need — a truncated
    * 2-byte `BM` prefix is still routed `bmp` (and left for the
    * decoder to reject), while a 10-byte RIFF head stays `unknown`
    * because its discriminating form tag is missing. */
  def sniffContainer(bytes: Array[Byte]): String = {
    if (bytes == null) return "unknown"
    def ascii(i: Int, s: String): Boolean =
      i + s.length <= bytes.length &&
        s.indices.forall(j => bytes(i + j) == s(j).toByte)
    def b(i: Int): Int =
      if (i < bytes.length) bytes(i) & 0xff else -1
    if (ascii(0, "BM")) "bmp"
    else if (ascii(0, "qoif")) "qoi"
    else if (b(0) == 0x89 && ascii(1, "PNG")) "png"
    else if (ascii(0, "GIF8")) "gif"
    else if (b(0) == 0xff && b(1) == 0xd8) "jpeg"
    else if (ascii(0, "RIFF") && ascii(8, "WEBP")) "webp"
    else if (ascii(0, "RIFF") && ascii(8, "WAVE")) "wav"
    else "unknown"
  }

  /** One probed WebP container: variant `lossless` (VP8L), `lossy`
    * (VP8) or `extended` (VP8X); canvas width/height; whether the
    * header declares alpha. */
  final case class WebpInfo(variant: String, width: Int, height: Int,
                            alpha: Boolean)

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u24le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)
  private def u32le(b: Array[Byte], i: Int): Long =
    (u16le(b, i).toLong | (u16le(b, i + 2).toLong << 16)) & 0xffffffffL

  /** Probe a WebP payload. None on: short input, wrong RIFF/WEBP magic,
    * an unknown first chunk, a declared chunk size past the payload, a
    * bad VP8L signature byte / nonzero version, a lossy frame that is
    * not a keyframe or lacks the VP8 start code, or dimensions outside
    * (0, 16384] (VP8/VP8L's 14-bit field bound; VP8X's 24-bit canvas is
    * bounded by the same cap here — a larger canvas is a bomb signal
    * for this pipeline, the 64M-pixel convention). */
  def probeWebp(bytes: Array[Byte]): Option[WebpInfo] = {
    // 25 = the minimal probe-able container: RIFF head (20) + the
    // 5-byte VP8L header; the per-variant chunkLen floors below imply
    // the deeper reads are in-bounds (chunkLen <= len - 20)
    if (bytes == null || bytes.length < 25) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
          bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'E' &&
          bytes(10) == 'B' && bytes(11) == 'P')) return None
    val fourcc = new String(bytes, 12, 4, java.nio.charset.StandardCharsets.US_ASCII)
    val chunkLen = u32le(bytes, 16)
    if (chunkLen > bytes.length.toLong - 20L) return None
    val p = 20 // first chunk payload offset
    fourcc match {
      case "VP8L" =>
        // signature 0x2f, then LSB-first: 14b width-1, 14b height-1,
        // 1b alpha hint, 3b version (must be 0)
        if (chunkLen < 5 || (bytes(p) & 0xff) != 0x2f) return None
        val v = u32le(bytes, p + 1)
        if (((v >> 29) & 0x7L) != 0L) return None
        val w = ((v & 0x3fffL) + 1L).toInt
        val h = (((v >> 14) & 0x3fffL) + 1L).toInt
        Some(WebpInfo("lossless", w, h, alpha = ((v >> 28) & 1L) == 1L))
      case "VP8 " =>
        // 3-byte frame tag (bit 0 = frame type, 0 = keyframe), then the
        // keyframe start code 9D 01 2A, then 16-bit LE width/height with
        // the upper 2 bits a scaling hint (masked off here)
        if (chunkLen < 10) return None
        if ((bytes(p) & 0x01) != 0) return None // inter frame: no dims
        if (!((bytes(p + 3) & 0xff) == 0x9d && (bytes(p + 4) & 0xff) == 0x01 &&
              (bytes(p + 5) & 0xff) == 0x2a)) return None
        val w = u16le(bytes, p + 6) & 0x3fff
        val h = u16le(bytes, p + 8) & 0x3fff
        if (w < 1 || h < 1) return None
        Some(WebpInfo("lossy", w, h, alpha = false))
      case "VP8X" =>
        // 1 flags byte (bit 4 = alpha), 3 reserved, 24-bit LE canvas
        // width-1 and height-1
        if (chunkLen < 10) return None
        val w = u24le(bytes, p + 4) + 1
        val h = u24le(bytes, p + 7) + 1
        if (w > 16384 || h > 16384) return None // bomb cap (see scaladoc)
        Some(WebpInfo("extended", w, h, alpha = (bytes(p) & 0x10) != 0))
      case _ => None
    }
  }

  /** Fixture-side WebP header writer — emits exactly the layouts
    * [[probeWebp]] parses (golden tests pin the byte layout itself, so
    * the pair can't drift into a private dialect silently). `variant`:
    * 0 = VP8L, 1 = VP8 keyframe, 2 = VP8X. Payload past the header is
    * deterministic filler (a probe never reads it). */
  def encodeWebpHeader(variant: Int, width: Int, height: Int,
                       alpha: Boolean, fillerLen: Int = 12): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= 16384 && height <= 16384,
      "dims in [1, 16384]")
    // VP8 keyframes store the RAW dimension in 14 bits (VP8L stores
    // dim-1), so the lossy variant's representable range is [1, 16383]
    // — 16384 would silently wrap to 0 (the r16 review finding)
    require(variant != 1 || (width <= 16383 && height <= 16383),
      "VP8 (lossy) dims in [1, 16383]")
    val body = new java.io.ByteArrayOutputStream()
    variant match {
      case 0 =>
        body.write(0x2f)
        val v = ((width - 1).toLong & 0x3fffL) |
          (((height - 1).toLong & 0x3fffL) << 14) |
          ((if (alpha) 1L else 0L) << 28)
        (0 until 4).foreach(i => body.write(((v >> (8 * i)) & 0xffL).toInt))
      case 1 =>
        body.write(0x00); body.write(0x00); body.write(0x00) // keyframe tag
        body.write(0x9d); body.write(0x01); body.write(0x2a)
        body.write(width & 0xff); body.write((width >> 8) & 0x3f)
        body.write(height & 0xff); body.write((height >> 8) & 0x3f)
      case 2 =>
        body.write(if (alpha) 0x10 else 0x00)
        body.write(0); body.write(0); body.write(0)
        val w1 = width - 1; val h1 = height - 1
        body.write(w1 & 0xff); body.write((w1 >> 8) & 0xff); body.write((w1 >> 16) & 0xff)
        body.write(h1 & 0xff); body.write((h1 >> 8) & 0xff); body.write((h1 >> 16) & 0xff)
      case other => throw new IllegalArgumentException(s"variant $other")
    }
    (0 until fillerLen).foreach(i => body.write((i * 37 + variant) & 0xff))
    val chunk = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    val riffLen = 4 + 8 + chunk.length // 'WEBP' + chunk header + payload
    (0 until 4).foreach(i => out.write((riffLen >> (8 * i)) & 0xff))
    out.write('W'); out.write('E'); out.write('B'); out.write('P')
    val cc = variant match { case 0 => "VP8L"; case 1 => "VP8 "; case _ => "VP8X" }
    cc.foreach(c => out.write(c))
    (0 until 4).foreach(i => out.write((chunk.length >> (8 * i)) & 0xff))
    out.write(chunk, 0, chunk.length)
    out.toByteArray
  }

  // ---------------------------------------------------------------------
  // JPEG EXIF (APP1) probe — orientation + dimensions WITHOUT a pixel
  // decode (the r16 verdict's #5 item; the probeWebp shape): the
  // segment walk reads SOF dimensions and the APP1 Exif TIFF IFD0
  // orientation tag, both fixed-width bounded header reads. Public
  // layouts: ISO/IEC 10918-1 marker segments, EXIF 2.x / TIFF 6.0 IFDs.
  // ---------------------------------------------------------------------

  /** One probed JPEG: frame dimensions (from SOF0/1/2), the EXIF
    * orientation (1..8; 1 = upright, the spec default when no valid
    * Exif APP1 is present), and whether a valid Exif APP1 was parsed. */
  final case class JpegInfo(width: Int, height: Int, orientation: Int,
                            hasExif: Boolean)

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** Orientation from an Exif APP1 payload (`b[off, off+len)`, starting
    * at the `Exif\u0000\u0000` identifier): byte-order probe (II/MM),
    * TIFF magic 42, IFD0 entry walk for tag 0x0112 (SHORT, count 1).
    * None on ANY bounds/shape violation — a corrupt EXIF is ignored,
    * never guessed at. */
  private def exifOrientation(b: Array[Byte], off: Int, len: Int): Option[Int] = {
    if (len < 14) return None
    if (!(b(off) == 'E' && b(off + 1) == 'x' && b(off + 2) == 'i' &&
          b(off + 3) == 'f' && b(off + 4) == 0 && b(off + 5) == 0)) return None
    val t = off + 6 // TIFF header base
    val end = off + len
    if (t + 8 > end) return None
    val little =
      if (b(t) == 'I' && b(t + 1) == 'I') true
      else if (b(t) == 'M' && b(t + 1) == 'M') false
      else return None
    def u16(i: Int): Int =
      if (little) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32(i: Int): Long =
      if (little) u16(i).toLong | (u16(i + 2).toLong << 16)
      else (u16(i).toLong << 16) | u16(i + 2).toLong
    if (u16(t + 2) != 42) return None
    val ifd = u32(t + 4)
    if (ifd < 8 || t + ifd + 2 > end) return None
    val e0 = t + ifd.toInt
    val n = u16(e0)
    if (n > 256 || e0 + 2 + n * 12 > end) return None
    var i = 0
    while (i < n) {
      val e = e0 + 2 + i * 12
      if (u16(e) == 0x0112 && u16(e + 2) == 3 && u32(e + 4) == 1L) {
        val v = u16(e + 8) // SHORT count 1 sits in the value field's
                           // first two bytes, byte-order applied
        return if (v >= 1 && v <= 8) Some(v) else None
      }
      i += 1
    }
    None
  }

  /** Probe a JPEG payload by walking its marker segments. None on:
    * null/short input, missing SOI, a desynced walk (a non-FF where a
    * marker must start), a declared segment length past the payload, or
    * no SOF before SOS/EOI (dimensions are the probe's contract).
    * A corrupt Exif APP1 downgrades to `hasExif = false`, orientation
    * 1 — the decode-never-lies rule applied to metadata: report only
    * what parsed. Walk is bounded (≤ 1024 segments). */
  def probeJpeg(bytes: Array[Byte]): Option[JpegInfo] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    var p = 2
    var orientation = 1
    var hasExif = false
    var segs = 0
    while (p + 4 <= bytes.length && segs < 1024) {
      segs += 1
      if ((bytes(p) & 0xff) != 0xff) return None
      // ISO 10918-1 B.1.1.2: any number of 0xFF FILL bytes may pad
      // the space before a marker — skip to the last FF of the run (a
      // padded camera file is valid, not a desync; the r17 review
      // finding)
      while (p + 2 < bytes.length && (bytes(p + 1) & 0xff) == 0xff) p += 1
      val marker = bytes(p + 1) & 0xff
      if (marker == 0xd8 || marker == 0x01 ||
          (marker >= 0xd0 && marker <= 0xd7)) {
        p += 2 // standalone markers carry no length
      } else if (marker == 0xd9 || marker == 0xda) {
        return None // EOI / SOS before any SOF: no dimensions
      } else {
        if (p + 4 > bytes.length) return None // fill run ate the length
        val segLen = u16be(bytes, p + 2)
        if (segLen < 2 || p + 2 + segLen > bytes.length) return None
        if (marker == 0xe1)
          exifOrientation(bytes, p + 4, segLen - 2).foreach { o =>
            if (!hasExif) { orientation = o; hasExif = true } // first wins
          }
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          if (segLen < 7) return None
          val h = u16be(bytes, p + 5)
          val w = u16be(bytes, p + 7)
          if (w < 1 || h < 1) return None
          return Some(JpegInfo(w, h, orientation, hasExif))
        }
        p += 2 + segLen
      }
    }
    None
  }

  /** Fixture-side Exif APP1 segment writer (FF E1, length, Exif id,
    * TIFF header, a one-entry IFD0 holding Orientation) — emits exactly
    * the layout [[probeJpeg]] parses, in either byte order. */
  def encodeExifApp1(orientation: Int, bigEndian: Boolean): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, "orientation in [1,8]")
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit =
      if (bigEndian) { w8(v >> 8); w8(v) } else { w8(v); w8(v >> 8) }
    def w32(v: Int): Unit =
      if (bigEndian) { w16(v >>> 16); w16(v) } else { w16(v); w16(v >>> 16) }
    // Exif identifier
    "Exif".foreach(c => w8(c))
    w8(0); w8(0)
    // TIFF header
    if (bigEndian) { w8('M'); w8('M') } else { w8('I'); w8('I') }
    w16(42); w32(8)
    // IFD0: 1 entry, Orientation (0x0112, SHORT, count 1), no next IFD
    w16(1)
    w16(0x0112); w16(3); w32(1)
    w16(orientation); w16(0) // value field: SHORT + 2 pad bytes
    w32(0)
    val payload = out.toByteArray
    val seg = new java.io.ByteArrayOutputStream()
    seg.write(0xff); seg.write(0xe1)
    val len = payload.length + 2
    seg.write((len >> 8) & 0xff); seg.write(len & 0xff)
    seg.write(payload, 0, payload.length)
    seg.toByteArray
  }

  /** Splice a marker segment immediately after SOI — how real cameras
    * place APP1, and how the fixture turns a plain [[encodeJpeg]]
    * payload into an EXIF-carrying one without re-encoding pixels. */
  def spliceAfterSoi(jpeg: Array[Byte], segment: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG (no SOI)")
    val out = new Array[Byte](jpeg.length + segment.length)
    out(0) = jpeg(0); out(1) = jpeg(1)
    System.arraycopy(segment, 0, out, 2, segment.length)
    System.arraycopy(jpeg, 2, out, 2 + segment.length, jpeg.length - 2)
    out
  }

  /** Recover the UPRIGHT image from stored pixels + their EXIF
    * orientation (EXIF 2.x §4.6.4: the value names where the stored 0th
    * row/column sit visually — 1 upright, 2 mirror-H, 3 rotate 180,
    * 4 mirror-V, 5 transpose, 6 rotate stored 90° CW to display,
    * 7 transverse, 8 rotate 90° CCW). Out-of-range values return the
    * input unchanged (the spec-default leniency). Each arm below is the
    * display transform written as a source-coordinate map; MediaSpec
    * pins `orientPixels(inverseOrient(img, o), o) == img` for all
    * eight values on a non-square asymmetric image, so the pair cannot
    * drift. */
  def orientPixels(img: BmpData, orientation: Int): BmpData = {
    val (w, h) = (img.width, img.height)
    orientation match {
      case 2 => remap(img, w, h)((x, y) => (w - 1 - x, y))
      case 3 => remap(img, w, h)((x, y) => (w - 1 - x, h - 1 - y))
      case 4 => remap(img, w, h)((x, y) => (x, h - 1 - y))
      case 5 => remap(img, h, w)((x, y) => (y, x))
      case 6 => remap(img, h, w)((x, y) => (y, h - 1 - x))
      case 7 => remap(img, h, w)((x, y) => (w - 1 - y, h - 1 - x))
      case 8 => remap(img, h, w)((x, y) => (w - 1 - y, x))
      case _ => img
    }
  }

  /** The stored grid a camera writing `orientation` would emit for an
    * UPRIGHT image — [[orientPixels]]' exact inverse (fixture side).
    * Mirrors/transposes are involutions; the two rotations swap. */
  def inverseOrient(img: BmpData, orientation: Int): BmpData = {
    val (w, h) = (img.width, img.height)
    orientation match {
      case 2 => remap(img, w, h)((x, y) => (w - 1 - x, y))
      case 3 => remap(img, w, h)((x, y) => (w - 1 - x, h - 1 - y))
      case 4 => remap(img, w, h)((x, y) => (x, h - 1 - y))
      case 5 => remap(img, h, w)((x, y) => (y, x))
      case 6 => remap(img, h, w)((x, y) => (w - 1 - y, x))
      case 7 => remap(img, h, w)((x, y) => (w - 1 - y, h - 1 - x))
      case 8 => remap(img, h, w)((x, y) => (y, h - 1 - x))
      case _ => img
    }
  }

  /** Build an (ow×oh) image whose (x,y) reads the source at `src(x,y)`
    * — the shared kernel of the eight orientation transforms. */
  private def remap(img: BmpData, ow: Int, oh: Int)
                   (src: (Int, Int) => (Int, Int)): BmpData = {
    val px = new Array[Int](ow * oh)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val (sx, sy) = src(x, y)
        px(y * ow + x) = img.pixels(sy * img.width + sx)
        x += 1
      }
      y += 1
    }
    BmpData(ow, oh, px)
  }
}
