package graft

import graft.operators.{MediaCodecs, Multimodal}
import org.apache.spark.sql.functions._

/** Real codec-free media decode: RIFF/WAVE PCM and 24-bpp BMP parsers.
  * Golden byte arrays are constructed BY HAND (not via the encoder), so
  * an encoder/decoder pair sharing a cancelling bug cannot pass. */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  // ---- WAV ----

  test("wav: hand-built golden bytes decode exactly (incl. a skipped LIST chunk)") {
    // 2 samples [100, -200], mono, 8000 Hz, with a 6-byte LIST chunk
    // between fmt and data (chunk walking + odd-size padding: len 5 pads
    // to 6)
    val bb = java.nio.ByteBuffer.allocate(44 + 14 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 14 + 4).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("LIST".getBytes).putInt(5).put(Array[Byte](1, 2, 3, 4, 5)).put(0.toByte)
    bb.put("data".getBytes).putInt(4).putShort(100).putShort(-200)
    val got = MediaCodecs.decodeWav(bb.array()).get
    assert(got.sampleRate === 8000 && got.channels === 1 && got.bitsPerSample === 16)
    assert(got.nSamplesPerChannel === 2L)
    assert(got.sumSq === 100L * 100 + 200L * 200)
    assert(got.durationMs === 2000L / 8000)
  }

  test("wav: encode/decode round-trip incl. stereo; malformed payloads -> None") {
    val samples = Array.tabulate(300)(i => ((i * 37) % 1001 - 500).toShort)
    val mono = MediaCodecs.decodeWav(MediaCodecs.encodeWav(samples, 16000)).get
    assert(mono.nSamplesPerChannel === 300L && mono.sampleRate === 16000)
    assert(mono.sumSq === samples.map(s => s.toLong * s).sum)
    val stereo = MediaCodecs.decodeWav(MediaCodecs.encodeWav(samples, 16000, 2)).get
    assert(stereo.channels === 2 && stereo.nSamplesPerChannel === 150L)
    assert(stereo.sumSq === mono.sumSq, "sumSq covers all channels")

    assert(MediaCodecs.decodeWav(null).isEmpty)
    assert(MediaCodecs.decodeWav(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaCodecs.decodeWav("RIFFxxxxNOPE".getBytes ++ new Array[Byte](40)).isEmpty)
    val good = MediaCodecs.encodeWav(samples, 16000)
    assert(MediaCodecs.decodeWav(good.take(50)).isEmpty, "truncated data chunk")
    val nonPcm = good.clone; nonPcm(20) = 2 // format tag 2 (ADPCM)
    assert(MediaCodecs.decodeWav(nonPcm).isEmpty, "non-PCM rejected")
  }

  test("wav zero-cross: sign convention, per-channel comparison, peak") {
    // mono: [-1, 0, 1, -1] — crossings at -1->0 (neg vs non-neg), none at
    // 0->1 (both non-neg), one at 1->-1: total 2. Peak 1.
    val mono = MediaCodecs.wavZeroCross(
      MediaCodecs.encodeWav(Array[Short](-1, 0, 1, -1), 8000)).get
    assert(mono._2 === 2L && mono._3 === 1L)
    assert(mono._1.sumSq === 3L, "single pass still carries exact energy")

    // stereo interleaved [100, -7, 200, -3]: ch0 = [100, 200] (no flip),
    // ch1 = [-7, -3] (no flip) -> 0 per-channel crossings, where a naive
    // interleaved scan would count 3. Peak spans channels: 200.
    val stereo = MediaCodecs.wavZeroCross(
      MediaCodecs.encodeWav(Array[Short](100, -7, 200, -3), 8000, 2)).get
    assert(stereo._2 === 0L, "inter-channel flips must not count")
    assert(stereo._3 === 200L)

    assert(MediaCodecs.wavZeroCross(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("wavZcrFeatures: dataset wrapper computes zcr over comparisons; malformed -> ok=0") {
    val good = MediaCodecs.encodeWav(Array[Short](5, -5, 5, -5, 5), 8000)
    val assets = Seq((1L, good), (2L, Array[Byte](9, 9))).toDF("asset_id", "payload")
    val rows = Multimodal.wavZcrFeatures(assets).collect()
      .map(r => r.asset_id -> r).toMap
    val ok = rows(1L)
    assert(ok.ok === 1L && ok.crossings === Some(4L) && ok.peak === Some(5L))
    assert(ok.zcr === Some(1.0), "alternating signs flip at every comparison")
    assert(rows(2L).ok === 0L && rows(2L).zcr.isEmpty)
  }

  // ---- BMP ----

  test("bmp: hand-built golden 2x2 bottom-up bytes decode exactly") {
    // pixels (top-down): (0,0)=R only, (1,0)=G only, (0,1)=B only,
    // (1,1)=white. 2x2 @ 24bpp: row = 6 bytes + 2 pad. Bottom-up: row
    // y=1 first.
    val bb = java.nio.ByteBuffer.allocate(54 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + 16).putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24).putInt(0).putInt(16)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    // bottom row (y=1): BGR of (0,1)=blue, (1,1)=white, pad 2
    bb.put(Array[Byte](255.toByte, 0, 0, 255.toByte, 255.toByte, 255.toByte, 0, 0))
    // top row (y=0): (0,0)=red -> BGR 0,0,255; (1,0)=green -> 0,255,0
    bb.put(Array[Byte](0, 0, 255.toByte, 0, 255.toByte, 0, 0, 0))
    val img = MediaCodecs.decodeBmp(bb.array()).get
    assert(img.width === 2 && img.height === 2)
    assert((img.r(0, 0), img.g(0, 0), img.b(0, 0)) === ((255, 0, 0)))
    assert((img.r(1, 0), img.g(1, 0), img.b(1, 0)) === ((0, 255, 0)))
    assert((img.r(0, 1), img.g(0, 1), img.b(0, 1)) === ((0, 0, 255)))
    assert((img.r(1, 1), img.g(1, 1), img.b(1, 1)) === ((255, 255, 255)))
  }

  test("bmp: round-trip with odd width exercises row padding; variants + malformed") {
    def px(x: Int, y: Int): Int = ((x * 40 + 7) << 16) | ((y * 80 + 3) << 8) | (x + y)
    val img = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(3, 5, px)).get
    assert(img.width === 3 && img.height === 5)
    for (x <- 0 until 3; y <- 0 until 5)
      assert(img.pixels(y * 3 + x) === px(x, y), s"pixel ($x,$y)")
    // top-down variant: negative height, rows in natural order
    val td = MediaCodecs.encodeBmp(3, 5, px).clone
    val bb = java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -5)
    // flip the row block order to match top-down
    val stride = 3 * 3 + 3 // 9 + pad 3 = 12
    val rows = (0 until 5).map(i => td.slice(54 + i * stride, 54 + (i + 1) * stride))
    rows.reverse.zipWithIndex.foreach { case (r, i) =>
      System.arraycopy(r, 0, td, 54 + i * stride, stride) }
    val img2 = MediaCodecs.decodeBmp(td).get
    assert(img2.pixels.toSeq === img.pixels.toSeq, "top-down decode matches")

    assert(MediaCodecs.decodeBmp(null).isEmpty)
    assert(MediaCodecs.decodeBmp("not a bmp at all, truly not".getBytes ++
      new Array[Byte](54)).isEmpty)
    val trunc = MediaCodecs.encodeBmp(3, 5, px).take(60)
    assert(MediaCodecs.decodeBmp(trunc).isEmpty, "truncated pixel data")
    val bpp32 = MediaCodecs.encodeBmp(3, 5, px).clone; bpp32(28) = 32
    assert(MediaCodecs.decodeBmp(bpp32).isEmpty, "32 bpp rejected")
    // crafted headers whose Int size arithmetic would overflow past the
    // bounds check must return None, never throw (OOM/negative-size):
    // width=0x7FFFFFFF overflows rowBytes; 715827883×3 overflows w×h
    for ((w, h) <- Seq((0x7fffffff, 1), (715827883, 3))) {
      val evil = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      evil.put('B'.toByte).put('M'.toByte).putInt(64).putShort(0).putShort(0).putInt(54)
      evil.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24).putInt(0).putInt(0)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      assert(MediaCodecs.decodeBmp(evil.array()).isEmpty,
        s"overflowing header ($w x $h) must reject, not throw")
    }
  }

  test("bmp: nearest-neighbor resize picks the floor-index pixels") {
    def px(x: Int, y: Int): Int = (y << 8) | x
    val img = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(4, 4, px)).get
    val half = MediaCodecs.resizeNearest(img, 2, 2)
    // src = dst * 4 / 2 = dst * 2 -> picks (0,0),(2,0),(0,2),(2,2)
    assert(half.pixels.toSeq === Seq(px(0, 0), px(2, 0), px(0, 2), px(2, 2)))
  }

  test("property: decoders never throw on arbitrary byte garbage (fuzz)") {
    // the never-throws totality contract, pushed past the hand-picked
    // malformed cases: random buffers, random mutations of VALID files
    // (header corruption), and random truncations of valid files
    val rnd = new scala.util.Random(1234)
    val validWav = MediaCodecs.encodeWav(
      Array.tabulate(100)(i => (i * 31).toShort), 8000)
    val validBmp = MediaCodecs.encodeBmp(5, 4, (x, y) => x * 40 + y)
    for (round <- 0 until 300) {
      val payload = round % 3 match {
        case 0 => // pure noise, random length
          val b = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(b); b
        case 1 => // corrupt a valid file at 1-8 random offsets
          val src = if (round % 2 == 0) validWav else validBmp
          val b = src.clone
          (0 until 1 + rnd.nextInt(8)).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte }
          b
        case _ => // truncate a valid file at a random point
          val src = if (round % 2 == 0) validWav else validBmp
          src.take(rnd.nextInt(src.length + 1))
      }
      // must return (None or Some) without throwing — that's the assert
      MediaCodecs.decodeWav(payload)
      MediaCodecs.decodeBmp(payload)
      MediaCodecs.wavWindowSumSq(payload, 16)
      MediaCodecs.decodeWavMulaw(payload)
      MediaCodecs.decodeQoi(payload)
    }
  }

  test("readAssetDir: real files on disk flow through binaryFile into the decode path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-assets")
    val wav = MediaCodecs.encodeWav(Array.tabulate(50)(i => (i * 100).toShort), 16000)
    java.nio.file.Files.write(dir.resolve("a.wav"), wav)
    java.nio.file.Files.write(dir.resolve("b.wav"),
      MediaCodecs.encodeWav(Array[Short](1, 2, 3), 8000))
    java.nio.file.Files.write(dir.resolve("junk.wav"), "not audio".getBytes)
    val assets = Multimodal.readAssetDir(spark, s"$dir/*.wav", "audio/wav")
    assert(assets.count() === 3)
    val out = Multimodal.decodeWavFeatures(assets).collect()
    assert(out.count(_.ok == 1L) === 2 && out.count(_.ok == 0L) === 1)
    assert(out.filter(_.ok == 1L).map(_.n_samples.get).sorted.toSeq === Seq(3L, 50L))
  }

  // ---- Spark-side plumbing ----

  test("decodeWavFeatures/decodeBmpFeatures: ok rows exact, garbage rows ok=0 not failure") {
    val wav = MediaCodecs.encodeWav(Array[Short](1000, -1000, 500), 8000)
    val assets = Seq(
      (1L, wav), (2L, "garbage".getBytes), (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("asset_id", "payload")
    val out = Multimodal.decodeWavFeatures(assets).collect()
      .map(r => r.asset_id -> r).toMap
    assert(out(1L).ok === 1L && out(1L).sum_sq === Some(1000L * 1000 * 2 + 500L * 500))
    assert(out(1L).duration_ms === Some(3L * 1000 / 8000))
    assert(out(2L).ok === 0L && out(2L).rms.isEmpty)
    assert(out(3L).ok === 0L, "NULL payload flows to ok=0, never throws")

    val bmp = MediaCodecs.encodeBmp(2, 2, (x, y) => (x + y) * 10)
    val bout = Multimodal.decodeBmpFeatures(
        Seq((7L, bmp), (8L, "junk".getBytes)).toDF("asset_id", "payload"))
      .collect().map(r => r.asset_id -> r).toMap
    assert(bout(7L).ok === 1L && bout(7L).width === Some(2))
    assert(bout(7L).sum_b === Some(0L + 10 + 10 + 20))
    assert(bout(8L).ok === 0L)
  }

  test("wavWindowSumSq: windows tile the stream exactly; partial tail; stereo frames") {
    val samples = Array.tabulate(10)(i => (i * 100 - 400).toShort) // -400..500
    val (meta, wins) = MediaCodecs.wavWindowSumSq(
      MediaCodecs.encodeWav(samples, 8000), winFrames = 4).get
    assert(meta.nSamplesPerChannel === 10L)
    assert(wins.length === 3, "10 frames at window 4 -> 3 windows")
    assert(wins.map(_._1).toSeq === Seq(4L, 4L, 2L), "partial tail window")
    assert(wins.map(_._2).sum === samples.map(s => s.toLong * s).sum,
      "window sums partition the total energy")
    assert(wins(0)._2 === samples.take(4).map(s => s.toLong * s).sum)
    // stereo: a window of 2 FRAMES covers 4 interleaved samples
    val (m2, w2) = MediaCodecs.wavWindowSumSq(
      MediaCodecs.encodeWav(samples, 8000, channels = 2), winFrames = 2).get
    assert(m2.channels === 2 && w2.map(_._1).toSeq === Seq(4L, 4L, 2L))
    assert(MediaCodecs.wavWindowSumSq("junk".getBytes, 4).isEmpty)
  }

  test("imageAHash: identical images hash equal, perturbed twins mostly collapse, distinct differ") {
    val assets = Multimodal.synthBmpPairAssets(
      spark.range(40).toDF("doc_id"), "doc_id")
    val hashes = Multimodal.imageAHash(assets).collect()
      .map(r => r.asset_id -> (r.ahash_hi.get, r.ahash_lo.get)).toMap
    assert(hashes.size === 40)
    // planted near-dup pairs (2k, 2k+1): the one-unit single-pixel edit
    // rarely crosses a bit's mean boundary — most pairs collapse
    val pairsEqual = (0 until 20).count(k => hashes(2L * k) == hashes(2L * k + 1))
    assert(pairsEqual >= 16, s"only $pairsEqual/20 perturbed twins collapsed")
    // distinct base patterns must not ALL collide. The fixture's pixels
    // are linear ramps in (x, y), and aHash of any linear gradient is
    // roughly the same above-mean half-plane — so substantial collision
    // across bases is EXPECTED here (aHash groups by coarse luminance
    // structure); the gate is non-degeneracy, not uniqueness
    val distinctHashes = (0 until 20).map(k => hashes(2L * k)).toSet
    assert(distinctHashes.size >= 5,
      s"only ${distinctHashes.size} distinct hashes over 20 base patterns")
    // garbage payloads flow to ok=0
    import spark.implicits._
    val bad = Multimodal.imageAHash(
      Seq((99L, "nope".getBytes)).toDF("asset_id", "payload")).collect()
    assert(bad.head.ok === 0L && bad.head.ahash_hi.isEmpty)
  }

  test("imageDHash: golden 2x2 checker gives hand-computed gradient bits; twins collapse") {
    // 2x2 BMP: (0,0)=white, (1,0)=black / (0,1)=black, (1,1)=white.
    // 9x8 resize: columns 0-4 <- src x=0, 5-8 <- src x=1; rows 0-3 <- y=0,
    // 4-7 <- y=1. The only horizontal gradient is at x=4: rows 0-3 have
    // lum 765 > 0 (bit set), rows 4-7 have 0 > 765 (clear). So bits
    // k = 4, 12, 20, 28 — all in the hi half.
    val bb = java.nio.ByteBuffer.allocate(54 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + 16).putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24).putInt(0).putInt(16)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    // bottom-up: row y=1 first: black, white; then y=0: white, black (BGR)
    bb.put(Array[Byte](0, 0, 0, -1, -1, -1, 0, 0)) // y=1 + 2 pad bytes
    bb.put(Array[Byte](-1, -1, -1, 0, 0, 0, 0, 0)) // y=0 + 2 pad bytes
    import spark.implicits._
    val out = Multimodal.imageDHash(
      Seq((7L, bb.array())).toDF("asset_id", "payload")).collect().head
    assert(out.ok === 1L)
    assert(out.dhash_hi === Some((1L << 4) | (1L << 12) | (1L << 20) | (1L << 28)))
    assert(out.dhash_lo === Some(0L))

    // planted one-unit twins: the local gradient comparison is even more
    // stable than aHash's global mean — most pairs collapse
    val assets = Multimodal.synthBmpPairAssets(
      spark.range(40).toDF("doc_id"), "doc_id")
    val hashes = Multimodal.imageDHash(assets).collect()
      .map(r => r.asset_id -> (r.dhash_hi.get, r.dhash_lo.get)).toMap
    val pairsEqual = (0 until 20).count(k => hashes(2L * k) == hashes(2L * k + 1))
    assert(pairsEqual >= 16, s"only $pairsEqual/20 perturbed twins collapsed")
    val bad = Multimodal.imageDHash(
      Seq((99L, "nope".getBytes)).toDF("asset_id", "payload")).collect()
    assert(bad.head.ok === 0L && bad.head.dhash_hi.isEmpty)
  }

  test("silenceTrimPlan: voiced span located exactly; all-silent assets get NULL bounds") {
    import spark.implicits._
    val voiced = MediaCodecs.encodeWav(
      (new Array[Short](128) ++ Array.tabulate(64)(i => (i * 50).toShort) ++
        new Array[Short](64)), 8000)
    val silent = MediaCodecs.encodeWav(new Array[Short](256), 8000)
    val out = Multimodal.silenceTrimPlan(
        Seq((1L, voiced), (2L, silent)).toDF("asset_id", "payload"), winFrames = 64)
      .collect().map(r => r.getLong(0) -> r).toMap
    val v = out(1L)
    assert(v.getAs[Long]("n_windows") === 4L)
    assert(v.getAs[Long]("first_voiced") === 2L && v.getAs[Long]("last_voiced") === 2L)
    assert(v.getAs[Long]("trim_start_frame") === 128L)
    assert(v.getAs[Long]("trim_end_frame") === 192L)
    val s = out(2L)
    assert(s.isNullAt(s.fieldIndex("first_voiced")) &&
      s.isNullAt(s.fieldIndex("trim_start_frame")),
      "all-silent assets are drop candidates with NULL bounds")
    // STEREO: bounds stay in the FRAME domain — a window holds
    // winFrames*channels samples, so the old samples-vs-frames mix would
    // land bounds in neither unit (the review finding)
    val stTone = Array.tabulate(256)(i => (((i * 13) % 201 - 100) * 64).toShort)
    val stereoSamples = new Array[Short](2 * (128 + 256)) // 128 silent frames lead
    for (i <- 0 until 256) { stereoSamples(2 * (128 + i)) = stTone(i)
                             stereoSamples(2 * (128 + i) + 1) = stTone(i) }
    val st = Multimodal.silenceTrimPlan(
        Seq((9L, MediaCodecs.encodeWav(stereoSamples, 8000, 2)))
          .toDF("asset_id", "payload"), winFrames = 64)
      .collect().head
    assert(st.getAs[Long]("n_samples") === 768L, "all-channel sample count")
    assert(st.getAs[Long]("trim_start_frame") === 128L &&
      st.getAs[Long]("trim_end_frame") === 384L,
      s"stereo bounds must be frame offsets: $st")
  }

  test("wavDftBins: a pure tone dominates its own bin; stereo reads channel 0 only") {
    // quantized sine at k=8 over N=64: bin 8 carries ~N/2 * amp, others ~0
    val n = 64; val k = 8
    val tone = Array.tabulate(n)(i =>
      Math.round(1000.0 * Math.sin(2 * Math.PI * k * i / n)).toShort)
    val bytes = MediaCodecs.encodeWav(tone, 8000)
    val (w, rows) = MediaCodecs.wavDftBins(bytes, Seq(0, 7, 8, 9)).get
    assert(w.nSamplesPerChannel === n.toLong)
    val mag = rows.map { case (b, re6, im6) =>
      b -> math.sqrt((re6 / 1e6) * (re6 / 1e6) + (im6 / 1e6) * (im6 / 1e6)) }.toMap
    assert(mag(8) > 30000.0, s"tone bin magnitude ${mag(8)} should be ~N/2*amp")
    assert(mag(0) < 1000.0 && mag(7) < 1000.0 && mag(9) < 1000.0,
      s"off bins stay near zero: $mag")
    // replay the exact integer accumulation by hand for bin 8
    var re = 0L; var im = 0L
    for (i <- 0 until n) {
      val theta = -2.0 * math.Pi * 8 * i / n
      def w6(x: Double) = java.math.BigDecimal.valueOf(x * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      re += tone(i) * w6(Math.cos(theta)); im += tone(i) * w6(Math.sin(theta))
    }
    val bin8 = rows.find(_._1 == 8).get
    assert(bin8._2 === re && bin8._3 === im, "integer accumulation replays by hand")
    // stereo: tone on ch0, silence on ch1 -> same ch-0 analysis
    val inter = new Array[Short](2 * n)
    for (i <- 0 until n) inter(2 * i) = tone(i)
    val st = MediaCodecs.wavDftBins(
      MediaCodecs.encodeWav(inter, 8000, channels = 2), Seq(8)).get
    assert(st._2.head._2 === re && st._2.head._3 === im,
      "interleaved stereo analyzes channel 0 with the same result")
    // wrapper: malformed payload keeps its row with ok=0
    val out = Multimodal.wavSpectralFeatures(
        Seq((1L, bytes), (2L, "nope".getBytes)).toDF("asset_id", "payload"),
        bins = Seq(8)).collect()
    assert(out.count(_.ok == 1L) === 1 && out.count(_.ok == 0L) === 1)
    val good = out.find(_.ok == 1L).get
    assert(good.re.get === re / 1e6 && good.im.get === im / 1e6)
  }

  test("mulaw: golden bytes, segment-bounded quantization error, format gating") {
    import MediaCodecs.{mulawEncode, mulawDecode}
    // golden values: silence is the all-ones byte (ones' complement of 0)
    assert(mulawEncode(0) === 0xff.toByte && mulawDecode(0xff.toByte) === 0)
    // 8324 = 8192+132 -> exp 6, mant 0 -> ~0x60 = 0x9f; expands to 8316
    assert(mulawEncode(8192) === 0x9f.toByte && mulawDecode(0x9f.toByte) === 8316)
    // sign symmetry and segment-bounded error across the full range
    for (s <- -32000 to 32000 by 37) {
      val d = mulawDecode(mulawEncode(s.toShort)).toInt
      assert(math.signum(d) * math.signum(s) >= 0, s"sign flip at $s -> $d")
      val seg = math.max(8, Integer.highestOneBit(math.abs(s) + 132) / 16)
      assert(math.abs(d - s) <= seg, s"quantization error at $s: $d (seg $seg)")
      assert(mulawDecode(mulawEncode((-s).toShort)) === -d, s"asymmetric at $s")
    }
    // container: µ-law payloads decode linear-domain energy; formats gate
    val samples = Array.tabulate(64)(i => (i * 500 - 16000).toShort)
    val mu = MediaCodecs.encodeWavMulaw(samples, 8000)
    val w = MediaCodecs.decodeWavMulaw(mu).get
    assert(w.nSamplesPerChannel === 64L && w.sampleRate === 8000)
    val expectSs = samples.map(s => { val d = mulawDecode(mulawEncode(s)).toLong; d * d }).sum
    assert(w.sumSq === expectSs, "energy is measured on the EXPANDED samples")
    assert(MediaCodecs.decodeWav(mu).isEmpty, "PCM decoder rejects format 7")
    assert(MediaCodecs.decodeWavMulaw(
      MediaCodecs.encodeWav(samples, 8000)).isEmpty, "µ-law decoder rejects PCM")
    // wrapper: ok/0 routing
    val out = graft.operators.Multimodal.decodeMulawFeatures(
      Seq((1L, mu), (2L, MediaCodecs.encodeWav(samples, 8000)),
        (3L, "junk".getBytes)).toDF("asset_id", "payload")).collect()
    assert(out.count(_.ok == 1L) === 1 && out.count(_.ok == 0L) === 2)
  }

  test("qoi: hand-built golden bytes exercise every op; lossless round-trip; rejects") {
    import MediaCodecs.{encodeQoi, decodeQoi}
    // hand-built 6x1 stream: RGB(10,20,30), RUN(2), DIFF(+1,+1,+1),
    // LUMA(dg=+8, drg=-2, dbg=+3), INDEX back to the first pixel
    val bb = new java.io.ByteArrayOutputStream()
    bb.write("qoif".getBytes); bb.write(Array[Byte](0, 0, 0, 6, 0, 0, 0, 1, 3, 0))
    bb.write(0xfe); bb.write(10); bb.write(20); bb.write(30)  // RGB literal
    bb.write(0xc0 | 1)                                        // RUN of 2
    bb.write(0x40 | (3 << 4) | (3 << 2) | 3)                  // DIFF +1/+1/+1
    bb.write(0x80 | (8 + 32)); bb.write(((-2 + 8) << 4) | (3 + 8)) // LUMA
    bb.write((10 * 3 + 20 * 5 + 30 * 7 + 255 * 11) % 64)      // INDEX -> first
    (0 until 7).foreach(_ => bb.write(0)); bb.write(1)
    val img = decodeQoi(bb.toByteArray).get
    assert(img.width === 6 && img.height === 1)
    val px = img.pixels.map(p => ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff))
    assert(px(0) === ((10, 20, 30)) && px(1) === px(0) && px(2) === px(0))
    assert(px(3) === ((11, 21, 31)), "DIFF adds the biased deltas")
    assert(px(4) === ((11 + 8 - 2, 21 + 8, 31 + 8 + 3)), "LUMA applies dg/drg/dbg")
    assert(px(5) === ((10, 20, 30)), "INDEX recalls the seen-pixel table")
    // lossless round-trip on content that exercises runs, index hits,
    // small deltas AND literals (the mod-256 gradient re-visits colors)
    def gen(x: Int, y: Int): Int =
      (((x * 7 + y) % 256) << 16) | (((x + y * 5) % 256) << 8) | ((x * y + 3) % 256)
    val rt = decodeQoi(encodeQoi(23, 17, gen)).get
    assert(rt.width === 23 && rt.height === 17)
    for (y <- 0 until 17; x <- 0 until 23)
      assert(rt.pixels(y * 23 + x) === (gen(x, y) & 0xffffff), s"pixel ($x,$y)")
    // constant image compresses to runs: far smaller than raw
    val flat = encodeQoi(64, 64, (_, _) => 0x123456)
    assert(flat.length < 64 * 64 / 10, s"run-length must compress: ${flat.length}")
    assert(decodeQoi(flat).get.pixels.forall(_ == 0x123456))
    // rejects: bad magic, truncation, pixel-count mismatch
    assert(decodeQoi(null).isEmpty && decodeQoi("qoi?".getBytes).isEmpty)
    val good = encodeQoi(5, 5, gen)
    assert(decodeQoi(good.dropRight(12)).isEmpty, "truncated stream")
    // injected oversized RUN must not crash (either decodes or rejects)
    decodeQoi(good.take(14) ++ Array[Byte]((0xc0 | 61).toByte) ++ good.drop(14))
    // crafted header whose w*h would overflow Long past the area guard
    // must reject, never throw (the decodeBmp hardening, here too)
    val evil = new java.io.ByteArrayOutputStream()
    evil.write("qoif".getBytes)
    (0 until 4).foreach(_ => evil.write(0xff)) // w = 0xFFFFFFFF
    (0 until 4).foreach(_ => evil.write(0xff)) // h = 0xFFFFFFFF
    evil.write(3); evil.write(0)
    evil.write(new Array[Byte](16))
    assert(decodeQoi(evil.toByteArray).isEmpty,
      "overflowing dimensions must reject, not throw")
  }

  test("imageAHashSniff: the same picture in BMP/QOI/PNG/GIF collapses to one fingerprint") {
    def px(x: Int, y: Int): Int = ((x * 19 + y * 3) % 256 << 16) |
      ((x + y * 11) % 256 << 8) | ((x * 5 + y) % 256)
    val bmp = MediaCodecs.encodeBmp(11, 9, px)
    val qoi = MediaCodecs.encodeQoi(11, 9, px)
    val png = MediaCodecs.encodePng(11, 9, px)
    // GIF is paletted: collect the distinct colors first
    val pal = (for (y <- 0 until 9; x <- 0 until 11) yield px(x, y)).distinct.toArray
    val gif = MediaCodecs.encodeGif(11, 9, pal,
      (x, y) => pal.indexOf(px(x, y)), interlaced = true)
    val out = Multimodal.imageAHashSniff(
        Seq((1L, bmp), (2L, qoi), (3L, "????".getBytes), (4L, png), (5L, gif))
          .toDF("asset_id", "payload")).collect()
      .map(r => r.asset_id -> r).toMap
    assert(out(1L).ok === 1L && out(2L).ok === 1L && out(3L).ok === 0L &&
      out(4L).ok === 1L && out(5L).ok === 1L)
    Seq(2L, 4L, 5L).foreach { id =>
      assert(out(1L).ahash_hi === out(id).ahash_hi &&
        out(1L).ahash_lo === out(id).ahash_lo,
        s"pixel-level hashing is container-blind (asset $id)")
    }
  }

  test("resizeBmp emits valid BMP payloads that re-decode to the resized pixels") {
    val assets = Multimodal.synthBmpAssets(
      spark.range(20).toDF("doc_id"), "doc_id")
    val resized = Multimodal.resizeBmp(assets, box = 8).collect()
    assert(resized.forall(_.ok == 1L))
    resized.foreach { r =>
      assert(r.out_width.get <= 8 && r.out_height.get <= 8)
      val re = MediaCodecs.decodeBmp(r.out_payload).get
      assert(re.width === r.out_width.get && re.height === r.out_height.get,
        s"asset ${r.asset_id} payload round-trip")
    }
    // never upscaled: an 8x8 source stays 8x8
    val small = resized.find(r => r.width.get == 8 && r.height.get == 8).get
    assert(small.out_width.get === 8 && small.out_height.get === 8)
  }

  // ---- PNG ----

  /** Frame hand-authored filtered scanlines into a real PNG: zlib via
    * the JDK's Deflater and CRCs via the JDK's CRC32 (both TRUSTED
    * third-party code, not our encoder), so the decoder's chunk walk,
    * inflate loop, and all five unfilter reconstructions are tested
    * independently of encodePng. */
  private def framePng(w: Int, h: Int, colorType: Int, depth: Int,
                       interlace: Int, raw: Array[Byte],
                       corruptCrc: Boolean = false,
                       plte: Array[Int] = null): Array[Byte] = {
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte], breakCrc: Boolean = false): Unit = {
      def be32(v: Int): Unit = {
        out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
        out.write((v >>> 8) & 0xff); out.write(v & 0xff)
      }
      be32(data.length); out.write(typ.getBytes("US-ASCII")); out.write(data)
      val crc = new java.util.zip.CRC32
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      be32(crc.getValue.toInt ^ (if (breakCrc) 0xdeadbeef else 0))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(depth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte)
    chunk("IHDR", ihdr.array())
    if (plte != null)
      chunk("PLTE", plte.flatMap(c => Array(((c >> 16) & 0xff).toByte,
        ((c >> 8) & 0xff).toByte, (c & 0xff).toByte)))
    chunk("tEXt", "graft fixture".getBytes("US-ASCII")) // ancillary: skipped
    chunk("IDAT", zout.toByteArray, breakCrc = corruptCrc)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("png: hand-built scanlines exercise all five unfilter reconstructions") {
    // 2x5 RGB, one row per filter: Sub, Up, Average, Paeth, None —
    // expected pixels computed BY HAND from the spec's recon formulas
    val raw = Array[Int](
      1, 10, 20, 30, 5, 5, 5,
      2, 1, 2, 3, 4, 5, 6,
      3, 10, 10, 10, 10, 10, 10,
      4, 1, 1, 1, 2, 2, 2,
      0, 100, 101, 102, 103, 104, 105).map(_.toByte)
    val img = MediaCodecs.decodePng(framePng(2, 5, 2, 8, 0, raw)).get
    assert(img.width === 2 && img.height === 5)
    val px = img.pixels.map(p => ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff))
    assert(px(0) === ((10, 20, 30)) && px(1) === ((15, 25, 35)), "Sub adds left")
    assert(px(2) === ((11, 22, 33)) && px(3) === ((19, 30, 41)), "Up adds above")
    assert(px(4) === ((15, 21, 26)) && px(5) === ((27, 35, 43)),
      "Average adds floor((left+above)/2)")
    assert(px(6) === ((16, 22, 27)) && px(7) === ((29, 37, 45)),
      "Paeth picks the nearest predictor")
    assert(px(8) === ((100, 101, 102)) && px(9) === ((103, 104, 105)), "None")
  }

  test("png: gray and RGBA variants; strict rejects; CRC verification") {
    import MediaCodecs.decodePng
    // gray (color type 0): 2x2, filter None — replicated to RGB
    val gray = decodePng(framePng(2, 2, 0, 8, 0,
      Array[Int](0, 7, 200, 0, 55, 255).map(_.toByte))).get
    assert(gray.pixels.toSeq === Seq(0x070707, 0xc8c8c8, 0x373737, 0xffffff))
    // RGBA (color type 6): 1x2, alpha dropped
    val rgba = decodePng(framePng(1, 2, 6, 8, 0,
      Array[Int](0, 1, 2, 3, 9, 0, 4, 5, 6, 200).map(_.toByte))).get
    assert(rgba.pixels.toSeq === Seq(0x010203, 0x040506))
    val raw22 = Array[Int](0, 1, 2, 3, 4, 5, 6,
      0, 7, 8, 9, 10, 11, 12).map(_.toByte)
    assert(decodePng(framePng(2, 2, 2, 8, 0, raw22)).isDefined, "baseline ok")
    assert(decodePng(framePng(2, 2, 2, 8, 1, raw22)).isEmpty, "Adam7 rejected")
    assert(decodePng(framePng(2, 2, 2, 16, 0, raw22)).isEmpty,
      "16-bit stream of 8-bit length rejected (wrong scanline byte count)")
    assert(decodePng(framePng(2, 2, 3, 8, 0, raw22)).isEmpty,
      "palette image without a PLTE chunk rejected")
    assert(decodePng(framePng(2, 2, 2, 8, 0, raw22, corruptCrc = true)).isEmpty,
      "a flipped chunk CRC must be DETECTED, not decoded through")
    assert(decodePng(framePng(2, 2, 2, 8, 0, raw22.dropRight(3))).isEmpty,
      "short raw stream (inflate ends early) rejected")
    assert(decodePng(framePng(2, 2, 2, 8, 0,
      raw22 ++ Array[Byte](1, 2, 3))).isEmpty, "overlong raw stream rejected")
    val bad = framePng(2, 2, 2, 8, 0, raw22)
    assert(decodePng(bad.take(40)).isEmpty, "truncated file rejected")
    assert(decodePng(null).isEmpty)
  }

  test("png: encode round-trip is lossless; adaptive filters + multi-IDAT; compresses") {
    import MediaCodecs.{encodePng, decodePng}
    def gen(x: Int, y: Int): Int =
      (((x * 7 + y) % 256) << 16) | (((x + y * 5) % 256) << 8) | ((x * y + 3) % 256)
    val rt = decodePng(encodePng(23, 17, gen)).get
    assert(rt.width === 23 && rt.height === 17)
    for (y <- 0 until 17; x <- 0 until 23)
      assert(rt.pixels(y * 23 + x) === (gen(x, y) & 0xffffff), s"pixel ($x,$y)")
    // flat image: DEFLATE collapses it far below raw size
    val flat = encodePng(64, 64, (_, _) => 0x123456)
    assert(flat.length < 64 * 64 * 3 / 10, s"deflate must compress: ${flat.length}")
    assert(decodePng(flat).get.pixels.forall(_ == 0x123456))
    // LCG noise is incompressible -> zlib stream > 8 KiB -> multi-IDAT,
    // and the decoder must reassemble the chunks
    var seed = 12345L
    def noise(x: Int, y: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 40) & 0xffffff).toInt
    }
    val pxs = Array.tabulate(64 * 64)(i => noise(i % 64, i / 64))
    val noisy = encodePng(64, 64, (x, y) => pxs(y * 64 + x))
    def countIdat(b: Array[Byte]): Int =
      (0 until b.length - 4).count(i => b(i) == 'I' && b(i + 1) == 'D' &&
        b(i + 2) == 'A' && b(i + 3) == 'T')
    assert(countIdat(noisy) >= 2, s"noise must split IDAT: ${noisy.length} bytes")
    assert(decodePng(noisy).get.pixels.toSeq === pxs.toSeq)
  }

  test("png: Adam7 interlace round-trips equal the sequential decode") {
    import MediaCodecs.{encodePng, encodePngAdam7, decodePng}
    def gen(x: Int, y: Int): Int =
      (((x * 11 + y * 3) % 256) << 16) | (((x + y * 7) % 256) << 8) | ((x * y + 9) % 256)
    // shapes straddling the 8x8 pass grid: sub-8 dims produce EMPTY passes
    for ((w, h) <- Seq((1, 1), (2, 3), (7, 5), (8, 8), (9, 16), (23, 17), (40, 3))) {
      val seq = decodePng(encodePng(w, h, gen)).get
      val adam = decodePng(encodePngAdam7(w, h, gen)).get
      assert(adam.width === w && adam.height === h, s"${w}x$h dims")
      assert(adam.pixels.toSeq === seq.pixels.toSeq,
        s"${w}x$h: interlaced decode must equal sequential")
    }
    // the two encodings really differ at the container level (IHDR byte 12)
    val a = encodePngAdam7(16, 16, gen); val b = encodePng(16, 16, gen)
    // sig(8) + len(4) + type(4) + 13th IHDR data byte = offset 28
    assert((a(28) & 0xff) === 1 && (b(28) & 0xff) === 0, "interlace method byte")
    // truncating the last pass's scanlines must reject, not wrap around
    val short = a.clone()
    assert(decodePng(short.take(short.length - 20)).isEmpty)
  }

  test("png: palette, sub-byte gray and 16-bit round-trips; palette rejects") {
    import MediaCodecs.{decodePng, encodePngPaletted, encodePngGray, encodePng16}
    // palette at every depth: distinct colors round-trip exactly
    val pal = Array(0xff0000, 0x00ff00, 0x0000ff, 0x123456, 0xfedcba,
      0x000000, 0xffffff, 0x808080)
    for (d <- Seq(1, 2, 4, 8)) {
      val nc = math.min(pal.length, 1 << d)
      val w = 11; val h = 6   // 11*depth bits per row: exercises ragged last byte
      val img = decodePng(encodePngPaletted(w, h, pal.take(nc),
        (x, y) => (x * 3 + y * 5) % nc, d)).get
      assert(img.width === w && img.height === h, s"depth $d")
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixels(y * w + x) === pal((x * 3 + y * 5) % nc),
          s"palette depth $d pixel ($x,$y)")
    }
    // sub-byte gray: levels rescale to 0..255 by level*255/(2^d-1)
    for (d <- Seq(1, 2, 4)) {
      val levels = 1 << d
      val img = decodePng(encodePngGray(levels, 2, d,
        (x, _) => x)).get
      for (x <- 0 until levels) {
        val v = x * 255 / (levels - 1)
        assert(img.pixels(x) === ((v << 16) | (v << 8) | v),
          s"gray depth $d level $x")
      }
    }
    // 16-bit truecolor and gray: high-byte reduction inverts (v<<8)|v
    def gen(x: Int, y: Int): Int =
      (((x * 7 + y) % 256) << 16) | (((x + y * 5) % 256) << 8) | ((x * y + 3) % 256)
    val rgb16 = decodePng(encodePng16(13, 9, gen)).get
    for (y <- 0 until 9; x <- 0 until 13)
      assert(rgb16.pixels(y * 13 + x) === gen(x, y), s"rgb16 ($x,$y)")
    val g16 = decodePng(encodePng16(7, 5, (x, y) => (x * 31 + y * 7) % 256,
      gray16 = true)).get
    for (y <- 0 until 5; x <- 0 until 7) {
      val v = (x * 31 + y * 7) % 256
      assert(g16.pixels(y * 7 + x) === ((v << 16) | (v << 8) | v), s"g16 ($x,$y)")
    }
    // strict palette rejects: an index past the palette end must return
    // None (not crash, not wrap) - 1-entry PLTE, index byte 1
    assert(decodePng(framePng(2, 1, 3, 8, 0,
      Array[Byte](0, 0, 1), plte = Array(0xaaaaaa))).isEmpty,
      "out-of-range palette index rejected")
    // gray + PLTE is a spec error
    assert(decodePng(framePng(2, 1, 0, 8, 0,
      Array[Byte](0, 10, 20), plte = Array(0xaaaaaa))).isEmpty,
      "PLTE on grayscale rejected")
    // the encoder itself guards impossible palettes
    intercept[IllegalArgumentException] {
      encodePngPaletted(2, 1, Array(0xaaaaaa), (x, _) => x, 8)
    }
  }

  test("png + gzip: fuzz — decoders never throw on garbage/mutations/truncations") {
    val rnd = new scala.util.Random(4321)
    val validPng = MediaCodecs.encodePng(9, 7, (x, y) => x * 37 + y * 11)
    val validGz = graft.operators.Compressed.gzipBytes(
      "the quick brown fox".getBytes("UTF-8"))
    for (round <- 0 until 300) {
      val payload = round % 3 match {
        case 0 =>
          val b = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(b); b
        case 1 =>
          val src = if (round % 2 == 0) validPng else validGz
          val b = src.clone
          (0 until 1 + rnd.nextInt(8)).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte }
          b
        case _ =>
          val src = if (round % 2 == 0) validPng else validGz
          src.take(rnd.nextInt(src.length + 1))
      }
      MediaCodecs.decodePng(payload)
      graft.operators.Compressed.gunzipBytes(payload)
    }
  }

  test("gzip: round-trip, multi-member concat, rejects, and the bomb cap") {
    import graft.operators.Compressed.{gzipBytes, gunzipBytes, MaxInflated}
    val text = ("mixed é世界 content " * 100).getBytes("UTF-8")
    assert(gunzipBytes(gzipBytes(text)).get.toSeq === text.toSeq)
    // two members concatenated inflate to the concatenation (WARC shape)
    val two = gzipBytes("alpha ".getBytes("UTF-8")) ++
      gzipBytes("beta".getBytes("UTF-8"))
    assert(new String(gunzipBytes(two).get, "UTF-8") === "alpha beta")
    assert(gunzipBytes("not gzip at all".getBytes).isEmpty)
    assert(gunzipBytes(gzipBytes(text).dropRight(5)).isEmpty, "truncated member")
    // bomb: 80 MiB of zeros compresses tiny but must NOT materialize
    val bomb = gzipBytes(new Array[Byte](MaxInflated + (1 << 20)))
    assert(bomb.length < (1 << 20), "sanity: the bomb itself is small")
    assert(gunzipBytes(bomb).isEmpty, "inflate cap rejects the bomb")
  }

  test("gzip member split: boundaries re-slice, header extensions, strict rejects") {
    import graft.operators.Compressed.{gzipBytes, gunzipBytes, gunzipMemberSplit, MaxInflated}
    val texts = Seq("alpha record", "beta \u00e9\u4e16\u754c", "", "gamma " * 50)
    val shard = texts.map(t => gzipBytes(t.getBytes("UTF-8")))
      .foldLeft(Array.emptyByteArray)(_ ++ _)
    val members = gunzipMemberSplit(shard).get
    assert(members.length === texts.length)
    members.zip(texts).foreach { case (m, t) =>
      assert(new String(m.data, "UTF-8") === t)
    }
    // boundary arithmetic: contiguous, exhaustive, and each slice is a
    // standalone gzip stream (the ranged-read contract)
    assert(members.head.offset === 0L)
    members.sliding(2).foreach { case Seq(a, b) =>
      assert(a.offset + a.compLen === b.offset, "members are contiguous") }
    assert(members.last.offset + members.last.compLen === shard.length.toLong)
    members.foreach { m =>
      val slice = java.util.Arrays.copyOfRange(shard,
        m.offset.toInt, (m.offset + m.compLen).toInt)
      assert(gunzipBytes(slice).get.toSeq === m.data.toSeq,
        "a [offset, offset+comp_len) ranged read inflates alone")
    }
    // FNAME + FCOMMENT + FEXTRA + FHCRC headers all walk correctly: build
    // a member with every optional field via raw framing
    val body = "payload with headers".getBytes("UTF-8")
    val defl = new java.util.zip.Deflater(-1, true)
    defl.setInput(body); defl.finish()
    val cbuf = new Array[Byte](1024)
    val clen = defl.deflate(cbuf); defl.end()
    val crc = new java.util.zip.CRC32; crc.update(body)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte](0x1f.toByte, 0x8b.toByte, 8, (4 | 8 | 16).toByte,
      0, 0, 0, 0, 0, 0))                       // FEXTRA|FNAME|FCOMMENT
    bos.write(Array[Byte](3, 0, 1, 2, 3))      // xlen=3 + 3 extra bytes
    bos.write("name.txt".getBytes("US-ASCII")); bos.write(0)
    bos.write("a comment".getBytes("US-ASCII")); bos.write(0)
    bos.write(cbuf, 0, clen)
    def le32(v: Long): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    bos.write(le32(crc.getValue)); bos.write(le32(body.length.toLong))
    val fancy = bos.toByteArray
    val m2 = gunzipMemberSplit(fancy ++ gzipBytes("tail".getBytes("UTF-8"))).get
    assert(m2.length === 2 && new String(m2.head.data, "UTF-8") === "payload with headers")
    assert(new String(m2(1).data, "UTF-8") === "tail")
    // strict rejects: trailing garbage, corrupt trailer CRC, truncation, bomb
    assert(gunzipMemberSplit(shard ++ Array[Byte](1, 2, 3)).isEmpty,
      "trailing garbage is not a member")
    val corrupt = shard.clone()
    corrupt(shard.length - 5) = (corrupt(shard.length - 5) ^ 0x40).toByte
    assert(gunzipMemberSplit(corrupt).isEmpty, "flipped trailer bit detected")
    assert(gunzipMemberSplit(shard.dropRight(3)).isEmpty, "truncated trailer")
    assert(gunzipMemberSplit(null).isEmpty)
    val bomb = gzipBytes(new Array[Byte](MaxInflated / 2 + (1 << 20)))
    assert(gunzipMemberSplit(bomb ++ bomb).isEmpty,
      "the bomb cap sums ACROSS members")
  }

  test("png/gzip Spark plumbing: synth assets decode ok; fingerprints match SQL truth") {
    val ids = spark.range(30).toDF("doc_id")
    val png = Multimodal.decodePngFeatures(
      Multimodal.synthPngAssets(ids, "doc_id")).collect()
    assert(png.length === 30 && png.forall(_.ok == 1L))
    // PNG twin must agree with the BMP twin pixel-for-pixel (channel sums)
    val bmp = Multimodal.decodeBmpFeatures(
      Multimodal.synthBmpAssets(ids, "doc_id")).collect()
      .map(r => r.asset_id -> ((r.sum_r, r.sum_g, r.sum_b))).toMap
    png.foreach { r =>
      assert(((r.sum_r, r.sum_g, r.sum_b)) === bmp(r.asset_id),
        s"asset ${r.asset_id}: containers must agree on pixels")
    }
    // gzip: md5 of inflated text == Spark's own md5 of the source column
    val docs = spark.range(25).toDF("doc_id")
      .withColumn("text", concat(lit("doc body ü"), col("doc_id")))
    val got = graft.operators.Compressed.gunzipTextFeatures(
      graft.operators.Compressed.synthGzipDocs(docs, "doc_id", "text"))
      .collect().map(r => r.doc_id -> ((r.ok, r.n_bytes.get, r.md5_hex.get))).toMap
    val want = docs.select(col("doc_id"), octet_length(col("text")).as("n"),
      md5(col("text").cast("binary")).as("m")).collect()
    assert(got.size === 25)
    want.foreach { r =>
      val (ok, n, m) = got(r.getLong(0))
      assert(ok === 1L && n === r.getInt(1).toLong && m === r.getString(2))
    }
    // a garbage payload routes to ok=0, never a task failure
    val junk = Multimodal.toAssets(
      Seq((99L, "junk".getBytes)).toDF("asset_id", "payload"),
      "asset_id", "payload", "application/gzip")
    val bad = graft.operators.Compressed.gunzipTextFeatures(junk).collect()
    assert(bad.length === 1 && bad.head.ok === 0L)
  }

  test("png gray+alpha (type 4) decodes; corrupt SECOND gzip member rejects whole payload") {
    // hand-build a 2x1 type-4 PNG via the shared chunk writer: samples
    // (gray, alpha) = (10, 255), (200, 0) — alpha ignored like RGBA's
    val raw = Array[Byte](0, 10, -1, 200.toByte, 0)
    // raw scanline = filter byte + 2px * 2 samples... build: 1 row, w=2
    val raw2 = Array[Byte](0, 10, -1, 200.toByte, 0)
    assert(raw.length == 5 && raw2.length == 5)
    val png = {
      val m = classOf[MediaCodecs.type].getDeclaredMethods
        .find(_.getName == "wrapPng").get
      m.setAccessible(true)
      m.invoke(MediaCodecs, Integer.valueOf(2), Integer.valueOf(1),
        Integer.valueOf(8), Integer.valueOf(4), raw2, null,
        java.lang.Boolean.FALSE)
        .asInstanceOf[Array[Byte]]
    }
    val img = MediaCodecs.decodePng(png).get
    assert(img.pixels.toSeq === Seq(0x0a0a0a, 0xc8c8c8),
      "gray+alpha reads the luma sample")
    // strict multi-member gzip: corrupting member 2's magic must reject
    // the WHOLE payload, not silently return member 1 (the JDK stream's
    // readTrailer swallowed it)
    import graft.operators.Compressed
    val two = Compressed.gzipBytes("alpha".getBytes) ++
      Compressed.gzipBytes("beta".getBytes)
    val firstLen = Compressed.gzipBytes("alpha".getBytes).length
    val corrupt = two.clone; corrupt(firstLen) = 0x00 // member-2 magic
    assert(Compressed.gunzipBytes(corrupt).isEmpty,
      "partial data must not surface as ok")
  }

  test("all-silent audio reports NULL trim bounds (least() null-skip guard)") {
    import spark.implicits._
    val silent = MediaCodecs.encodeWav(new Array[Short](256), 8000)
    val assets = Multimodal.toAssets(Seq((1L, silent)).toDF("asset_id", "payload"),
      "asset_id", "payload", "audio/wav")
    val r = Multimodal.silenceTrimPlan(assets, winFrames = 64).collect().head
    assert(r.isNullAt(r.fieldIndex("trim_start_frame")) &&
      r.isNullAt(r.fieldIndex("trim_end_frame")),
      "silent-throughout must yield NULL bounds on BOTH ends")
  }

  // ---- GIF ----

  test("gif: hand-built golden bytes decode exactly (LZW walked by hand)") {
    // 2x2, palette [red, white], indices row-major [0,1,1,0]; mcs=2,
    // clear=4, eoi=5. Hand-run LZW: codes 4,0,1,1 at width 3, then 0,5
    // at width 4 (the third add makes next==9==2^3+1) — LSB-packed to
    // bytes 0x44 0x02 0x05.
    val g = Array[Int](
      'G', 'I', 'F', '8', '7', 'a',
      2, 0, 2, 0, 0xF0, 0, 0,            // LSD: 2x2, GCT of 2, 8-bit res
      0xFF, 0x00, 0x00, 0xFF, 0xFF, 0xFF, // GCT: red, white
      0x2C, 0, 0, 0, 0, 2, 0, 2, 0, 0x00, // image descriptor, no interlace
      0x02,                               // LZW min code size
      0x03, 0x44, 0x02, 0x05, 0x00,       // one sub-block + terminator
      0x3B).map(_.toByte)
    val img = MediaCodecs.decodeGif(g).get
    assert(img.width === 2 && img.height === 2)
    assert(img.pixels.toSeq === Seq(0xFF0000, 0xFFFFFF, 0xFFFFFF, 0xFF0000))
    assert(img.channelSums === ((1020L, 510L, 510L)))
  }

  test("gif: encode round-trip lossless; interlace permutes storage only") {
    val rnd = new scala.util.Random(77)
    for (trial <- 0 until 6) {
      val w = 3 + rnd.nextInt(30); val h = 2 + rnd.nextInt(25)
      val nCol = 1 + rnd.nextInt(256)
      val palette = Array.fill(nCol)(rnd.nextInt(1 << 24))
      val idx = Array.fill(h, w)(rnd.nextInt(nCol))
      for (inter <- Seq(false, true)) {
        val bytes = MediaCodecs.encodeGif(w, h, palette, (x, y) => idx(y)(x), inter)
        val img = MediaCodecs.decodeGif(bytes).get
        assert(img.width === w && img.height === h, s"trial $trial inter=$inter")
        for (y <- 0 until h; x <- 0 until w)
          assert(img.pixels(y * w + x) === palette(idx(y)(x)),
            s"trial $trial inter=$inter pixel ($x,$y)")
      }
    }
    // interlaced vs not: identical pixels, different bytes on disk
    val pal = Array(0x102030, 0x405060, 0x708090)
    val f = (x: Int, y: Int) => (x + 2 * y) % 3
    val a = MediaCodecs.decodeGif(MediaCodecs.encodeGif(9, 9, pal, f)).get
    val b = MediaCodecs.decodeGif(
      MediaCodecs.encodeGif(9, 9, pal, f, interlaced = true)).get
    assert(a.pixels.toSeq === b.pixels.toSeq)
    // width-boundary sweep: the decoder's phantom final add can land its
    // `next` exactly on 2^width right before EOI — (x+y)&3 on 5×4 at
    // mcs=2 is such a stream (next == 16); sweep shapes so several sizes
    // cross a boundary on their LAST code
    val pal4 = Array(0x111111, 0x222222, 0x333333, 0x444444)
    for (w <- 2 to 12; h <- 2 to 8) {
      val g = (x: Int, y: Int) => (x + y) & 3
      val img = MediaCodecs.decodeGif(MediaCodecs.encodeGif(w, h, pal4, g))
      assert(img.isDefined, s"boundary case ${w}x$h must decode")
      for (y <- 0 until h; x <- 0 until w)
        assert(img.get.pixels(y * w + x) === pal4(g(x, y)), s"${w}x$h ($x,$y)")
    }
  }

  test("gif: dictionary exhaustion forces a clear-code reset and survives") {
    // 128x64 of high-entropy indices emits > 4096 codes: the encoder
    // must hit the 12-bit ceiling, emit CLEAR, and rebuild; the decoder
    // must follow the reset mid-stream.
    val rnd = new scala.util.Random(12345)
    val w = 128; val h = 64
    val palette = Array.tabulate(256)(i => (i * 0x010203) & 0xffffff)
    val idx = Array.fill(h, w)(rnd.nextInt(256))
    val bytes = MediaCodecs.encodeGif(w, h, palette, (x, y) => idx(y)(x))
    val img = MediaCodecs.decodeGif(bytes).get
    assert(img.width === w && img.height === h)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.pixels(y * w + x) === palette(idx(y)(x)))
  }

  test("gif: 89a extension blocks are skipped; strict rejects") {
    val pal = Array(0xAA0000, 0x00BB00, 0x0000CC, 0xDDDDDD)
    val base = MediaCodecs.encodeGif(5, 4, pal, (x, y) => (x ^ y) & 3)
    val want = MediaCodecs.decodeGif(base).get.pixels.toSeq
    // splice a Graphic Control Extension after the GCT (offset 13 + 3*4)
    val cut = 13 + 12
    val gce = Array[Int](0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00)
      .map(_.toByte)
    val spliced = base.take(cut) ++ gce ++ base.drop(cut)
    spliced(4) = '9'.toByte // GIF87a -> GIF89a
    assert(MediaCodecs.decodeGif(spliced).get.pixels.toSeq === want)
    // rejects: signature, truncation at every boundary class, early trailer
    assert(MediaCodecs.decodeGif("GIF90a????????".getBytes).isEmpty)
    assert(MediaCodecs.decodeGif(base.take(10)).isEmpty, "inside the LSD")
    assert(MediaCodecs.decodeGif(base.take(cut + 5)).isEmpty, "inside the descriptor")
    assert(MediaCodecs.decodeGif(base.dropRight(3)).isEmpty, "inside the data")
    val noImage = base.take(cut) :+ 0x3B.toByte
    assert(MediaCodecs.decodeGif(noImage).isEmpty, "trailer before any image")
    // a corrupted min-code-size (1 is spec-invalid) rejects
    val badMcs = base.clone; badMcs(cut + 10) = 1.toByte
    assert(MediaCodecs.decodeGif(badMcs).isEmpty)
  }

  test("gif: fuzz — decoder never throws on garbage/mutations/truncations") {
    val rnd = new scala.util.Random(8642)
    val pal = Array.tabulate(16)(i => i * 0x111111)
    val valid = MediaCodecs.encodeGif(11, 7, pal, (x, y) => (x * 3 + y) & 15)
    for (round <- 0 until 300) {
      val payload = round % 3 match {
        case 0 => val b = new Array[Byte](rnd.nextInt(120)); rnd.nextBytes(b); b
        case 1 =>
          val b = valid.clone
          (0 until 1 + rnd.nextInt(6)).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte }
          b
        case _ => valid.take(rnd.nextInt(valid.length + 1))
      }
      MediaCodecs.decodeGif(payload) // Option, never a throw or a hang
    }
  }

  test("gif animation: multi-frame encode, meta walk, poster-frame decode") {
    val pal = Array(0x111111, 0x222222, 0x333333, 0x444444)
    val frames: Seq[(Int, Int) => Int] =
      (0 until 3).map(f => (x: Int, y: Int) => (x + y + f) & 3)
    val anim = MediaCodecs.encodeGifFrames(5, 4, pal, frames, delayCs = 7)
    assert(new String(anim, 0, 6, "US-ASCII") === "GIF89a")
    val meta = MediaCodecs.gifMeta(anim).get
    assert(meta.width === 5 && meta.height === 4 && meta.nFrames === 3L &&
      meta.animated && !meta.interlaced)
    // poster contract: decodeGif reads exactly frame 0
    val poster = MediaCodecs.decodeGif(anim).get
    for (y <- 0 until 4; x <- 0 until 5)
      assert(poster.pixels(y * 5 + x) === pal((x + y) & 3))
    // single frame degrades to plain 87a and meta agrees with decode
    val single = MediaCodecs.encodeGif(5, 4, pal, frames.head)
    val m1 = MediaCodecs.gifMeta(single).get
    assert(new String(single, 0, 6, "US-ASCII") === "GIF87a")
    assert(m1.nFrames === 1L && !m1.animated)
    // meta is strict: truncation inside any frame's sub-blocks, missing
    // trailer, zero frames
    assert(MediaCodecs.gifMeta(anim.dropRight(1)).isEmpty, "no trailer")
    assert(MediaCodecs.gifMeta(anim.take(40)).isEmpty, "inside the data")
    val noImage = single.take(13 + 12) :+ 0x3b.toByte
    assert(MediaCodecs.gifMeta(noImage).isEmpty, "zero frames")
    // and total: meta never throws on the fuzz corpus
    val rnd = new scala.util.Random(777)
    for (_ <- 0 until 200) {
      val b = new Array[Byte](rnd.nextInt(100)); rnd.nextBytes(b)
      MediaCodecs.gifMeta(b)
      MediaCodecs.gifMeta(anim.take(rnd.nextInt(anim.length + 1)))
    }
  }

  test("gif Spark plumbing: synth assets agree with the BMP pixel truth") {
    val ids = spark.range(30).toDF("doc_id")
    val gif = Multimodal.decodeGifFeatures(
      Multimodal.synthGifAssets(ids, "doc_id")).collect()
    assert(gif.length === 30 && gif.forall(_.ok == 1L))
    val bmp = Multimodal.decodeBmpFeatures(
      Multimodal.synthBmpAssets(ids, "doc_id")).collect()
      .map(r => r.asset_id -> ((r.sum_r, r.sum_g, r.sum_b))).toMap
    gif.foreach { r =>
      assert(((r.sum_r, r.sum_g, r.sum_b)) === bmp(r.asset_id),
        s"asset ${r.asset_id}: containers must agree on pixels")
    }
  }

  test("jpeg: real encode/decode round-trip, bomb cap, never-throws, sniff parity") {
    import graft.operators.MediaCodecs
    // block-constant image: JPEG's DCT grid aligns, decode is DC-only
    def px(x: Int, y: Int): Int =
      if (((y / 8) * 8 + (x / 8)) % 3 == 0) 0xffffff else 0x000000
    val bytes = MediaCodecs.encodeJpeg(64, 64, px, 0.9f)
    assert((bytes(0) & 0xff) === 0xff && (bytes(1) & 0xff) === 0xd8,
      "real JPEG bytes start with SOI")
    val img = MediaCodecs.decodeJpeg(bytes).get
    assert(img.width === 64 && img.height === 64)
    // lossy, but block interiors stay within a few luma units
    var maxErr = 0
    for (y <- 0 until 64; x <- 0 until 64) {
      val want = px(x, y) & 0xff
      val got = img.pixels(y * 64 + x) & 0xff
      maxErr = math.max(maxErr, math.abs(want - got))
    }
    assert(maxErr <= 24, s"block-aligned JPEG error must be small, got $maxErr")
    // never-throws contract
    assert(MediaCodecs.decodeJpeg(null).isEmpty)
    assert(MediaCodecs.decodeJpeg(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
    assert(MediaCodecs.decodeJpeg("not a jpeg".getBytes).isEmpty)
    assert(MediaCodecs.decodeJpeg(bytes.take(40).toArray).isEmpty,
      "truncated stream returns None, never throws")
    // the pair fixture: BMP and JPEG of one image hash identically
    val ids = spark.range(50).toDF("doc_id")
    val hashes = Multimodal.imageAHashSniff(
      Multimodal.synthJpegBmpPairAssets(ids, "doc_id")).collect()
    assert(hashes.length === 100 && hashes.forall(_.ok == 1L))
    val byId = hashes.map(r => r.asset_id -> ((r.ahash_hi, r.ahash_lo))).toMap
    (0L until 50L).foreach { id =>
      assert(byId(id) === byId(id + (1L << 40)),
        s"id $id: JPEG loss must not move any aHash bit")
      // the closed-form bit prediction the q270 oracle replays
      var hi = 0L; var lo = 0L
      (0 until 64).foreach { k =>
        if ((k + id) % 8 < 2 + id % 5) {
          if (k < 32) hi |= 1L << k else lo |= 1L << (k - 32)
        }
      }
      assert(byId(id) === ((Some(hi), Some(lo))),
        s"id $id: hash must equal the block-mask formula")
    }
  }
  test("webp probe: hand-built golden headers pin the layout; corruption taxonomy") {
    import graft.operators.MediaCodecs
    // VP8L 2x3 alpha=1: v = (2-1) | (3-1)<<14 | 1<<28 = 0x10008001,
    // LE bytes 01 80 00 10 after the 0x2f signature
    def riff(cc: String, chunk: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      "RIFF".foreach(c => out.write(c))
      val rl = 4 + 8 + chunk.length
      (0 until 4).foreach(i => out.write((rl >> (8 * i)) & 0xff))
      "WEBP".foreach(c => out.write(c))
      cc.foreach(c => out.write(c))
      (0 until 4).foreach(i => out.write((chunk.length >> (8 * i)) & 0xff))
      out.write(chunk, 0, chunk.length)
      out.toByteArray
    }
    val vp8l = riff("VP8L", Array(0x2f, 0x01, 0x80, 0x00, 0x10).map(_.toByte))
    assert(MediaCodecs.probeWebp(vp8l) ===
      Some(MediaCodecs.WebpInfo("lossless", 2, 3, alpha = true)))
    // VP8 keyframe 320x240: tag 00 00 00, start 9d 01 2a, 40 01, f0 00
    val vp8 = riff("VP8 ", Array(0x00, 0x00, 0x00, 0x9d, 0x01, 0x2a,
      0x40, 0x01, 0xf0, 0x00).map(_.toByte))
    assert(MediaCodecs.probeWebp(vp8) ===
      Some(MediaCodecs.WebpInfo("lossy", 320, 240, alpha = false)))
    // VP8X alpha, canvas 1000x600: flags 0x10, rsv x3, 24le(999), 24le(599)
    val vp8x = riff("VP8X", Array(0x10, 0x00, 0x00, 0x00,
      0xe7, 0x03, 0x00, 0x57, 0x02, 0x00).map(_.toByte))
    assert(MediaCodecs.probeWebp(vp8x) ===
      Some(MediaCodecs.WebpInfo("extended", 1000, 600, alpha = true)))
    // the fixture writer emits the same layouts byte-for-byte
    assert(MediaCodecs.encodeWebpHeader(0, 2, 3, alpha = true, fillerLen = 0)
      .sameElements(vp8l), "writer/parser layout lock (VP8L)")
    // taxonomy: wrong magic, bad VP8L signature, nonzero version,
    // interframe VP8, oversized declared chunk, short input
    assert(MediaCodecs.probeWebp("RIFFxxxxWAVE".getBytes ++ vp8l.drop(12)) === None)
    val badSig = vp8l.clone(); badSig(20) = 0x2e
    assert(MediaCodecs.probeWebp(badSig) === None)
    val badVer = vp8l.clone(); badVer(24) = (badVer(24) | 0x20).toByte
    assert(MediaCodecs.probeWebp(badVer) === None, "version bits must be 0")
    val inter = vp8.clone(); inter(20) = 0x01
    assert(MediaCodecs.probeWebp(inter) === None, "inter frame carries no dims")
    val oversize = vp8l.clone(); oversize(16) = 0x7f
    assert(MediaCodecs.probeWebp(oversize) === None, "declared chunk past payload")
    assert(MediaCodecs.probeWebp(vp8l.take(24)) === None)
    assert(MediaCodecs.probeWebp(null) === None)
    // VP8 keyframes store raw dims in 14 bits: 16384 would wrap to 0,
    // so the writer refuses it for the lossy variant only (r16 review)
    intercept[IllegalArgumentException](
      MediaCodecs.encodeWebpHeader(1, 16384, 240, alpha = false))
    assert(MediaCodecs.probeWebp(
      MediaCodecs.encodeWebpHeader(0, 16384, 16384, alpha = false)) ===
      Some(MediaCodecs.WebpInfo("lossless", 16384, 16384, alpha = false)),
      "VP8L stores dim-1: the full [1, 16384] range round-trips")
  }
  test("sniffContainer: every magic branch, short input, and near-miss bytes") {
    import graft.operators.MediaCodecs
    def px(x: Int, y: Int) = (x << 16) | (y << 8) | 7
    assert(MediaCodecs.sniffContainer(MediaCodecs.encodeBmp(4, 4, px)) === "bmp")
    assert(MediaCodecs.sniffContainer(MediaCodecs.encodeQoi(4, 4, px)) === "qoi")
    assert(MediaCodecs.sniffContainer(MediaCodecs.encodePng(4, 4, px)) === "png")
    assert(MediaCodecs.sniffContainer(MediaCodecs.encodeGif(2, 2,
      Array(0, 0xffffff), (x, y) => (x + y) % 2)) === "gif")
    assert(MediaCodecs.sniffContainer(
      MediaCodecs.encodeJpeg(4, 4, px _, 0.9f)) === "jpeg")
    assert(MediaCodecs.sniffContainer(
      MediaCodecs.encodeWebpHeader(0, 4, 4, alpha = false)) === "webp")
    assert(MediaCodecs.sniffContainer(
      MediaCodecs.encodeWav(Array.tabulate(8)(_.toShort), 8000)) === "wav")
    assert(MediaCodecs.sniffContainer(null) === "unknown")
    // per-branch length guards (the r16 ADVICE finding): a magic that
    // FITS the truncated payload classifies — the decoder, not the
    // sniff, rejects the truncation
    assert(MediaCodecs.sniffContainer(Array[Byte]('B', 'M')) === "bmp",
      "a 2-byte BM prefix is enough for the bmp branch")
    assert(MediaCodecs.sniffContainer("qoif".getBytes) === "qoi")
    assert(MediaCodecs.sniffContainer(
      Array(0xff.toByte, 0xd8.toByte)) === "jpeg")
    assert(MediaCodecs.sniffContainer("GIF8".getBytes) === "gif")
    assert(MediaCodecs.sniffContainer(Array[Byte]('B')) === "unknown",
      "one byte matches no complete magic")
    assert(MediaCodecs.sniffContainer("RIFF0000WE".getBytes) === "unknown",
      "a RIFF head without its 12-byte form tag stays unknown")
    // RIFF with neither WEBP nor WAVE form stays unknown
    assert(MediaCodecs.sniffContainer(
      "RIFF0000AVI LIST0000".getBytes) === "unknown")
    assert(MediaCodecs.sniffContainer(
      Array.tabulate(32)(i => (i * 37).toByte)) === "unknown")
  }
}
