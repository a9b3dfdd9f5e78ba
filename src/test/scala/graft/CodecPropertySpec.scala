package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{AvroCodec, Compressed, MediaCodecs}

/** Property-based codec coverage: for ALL generated inputs the encoders'
  * output decodes back to the exact source (lossless round-trip laws),
  * and the permutation law holds for every (seed, halfBits) pair —
  * breadth the deterministic golden/boundary tests don't reach.
  * Deterministic seeded ScalaCheck generators (no flaky CI). */
class CodecPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int, seed: Long = 7L): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(seed))(_.next)
      .map(s => g.pureApply(params, s)).take(n).toSeq
  }

  test("gif: lossless round-trip law over random shapes, palettes, contents") {
    val gen = for {
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 30)
      nCol <- Gen.chooseNum(1, 256)
      inter <- Gen.oneOf(true, false)
      palSeed <- Gen.chooseNum(0L, Long.MaxValue / 2)
    } yield (w, h, nCol, inter, palSeed)
    samples(gen, 120).foreach { case (w, h, nCol, inter, palSeed) =>
      val rnd = new scala.util.Random(palSeed)
      val pal = Array.fill(nCol)(rnd.nextInt(1 << 24))
      val idx = Array.fill(h, w)(rnd.nextInt(nCol))
      val img = MediaCodecs.decodeGif(
        MediaCodecs.encodeGif(w, h, pal, (x, y) => idx(y)(x), inter))
      assert(img.isDefined, s"${w}x$h nCol=$nCol inter=$inter seed=$palSeed")
      for (y <- 0 until h; x <- 0 until w)
        assert(img.get.pixels(y * w + x) === pal(idx(y)(x)),
          s"${w}x$h nCol=$nCol inter=$inter seed=$palSeed ($x,$y)")
    }
  }

  test("gif: LOW-ENTROPY contents stress the width-boundary bookkeeping") {
    // long runs and tiny alphabets make the dictionary march through
    // every code-width boundary slowly — the regime where the final-code
    // phantom-add desync lived
    val gen = for {
      w <- Gen.chooseNum(2, 64)
      h <- Gen.chooseNum(2, 24)
      k <- Gen.chooseNum(1, 4)       // alphabet size
      mode <- Gen.chooseNum(0, 2)    // runs / stripes / diagonal
    } yield (w, h, k, mode)
    val pal = Array(0x111111, 0x222222, 0x333333, 0x444444)
    samples(gen, 150).foreach { case (w, h, k, mode) =>
      val f: (Int, Int) => Int = mode match {
        case 0 => (x, _) => (x / 3) % k
        case 1 => (_, y) => y % k
        case _ => (x, y) => (x + y) % k
      }
      val img = MediaCodecs.decodeGif(MediaCodecs.encodeGif(w, h, pal, f))
      assert(img.isDefined, s"${w}x$h k=$k mode=$mode")
      for (y <- 0 until h; x <- 0 until w)
        assert(img.get.pixels(y * w + x) === pal(f(x, y)),
          s"${w}x$h k=$k mode=$mode ($x,$y)")
    }
  }

  test("feistel: bijection + inverse-free determinism law across (seed, halfBits)") {
    import graft.functions.FeistelPermute
    val gen = for {
      h <- Gen.chooseNum(4, 12)
      seed <- Gen.chooseNum(-1000000L, 1000000L)
    } yield (h, seed)
    samples(gen, 40).foreach { case (h, seed) =>
      val n = 1 << (2 * h)
      // sample the domain when it's big; exhaustive when small
      val ids = if (n <= 4096) (0L until n.toLong)
                else samples(Gen.chooseNum(0L, n - 1L), 2048, seed ^ 99L).distinct
      val out = ids.map(FeistelPermute.permute(_, seed, h))
      assert(out.forall(p => p >= 0 && p < n), s"h=$h seed=$seed domain")
      assert(out.distinct.length === ids.size, s"h=$h seed=$seed collision")
    }
  }

  test("gzip + avro: random byte/text payloads round-trip; mutations never throw") {
    val texts = samples(Gen.listOf(Gen.asciiPrintableChar).map(_.mkString), 80)
    texts.foreach { t =>
      val bytes = t.getBytes("UTF-8")
      assert(Compressed.gunzipBytes(Compressed.gzipBytes(bytes))
        .exists(_.sameElements(bytes)), s"gzip roundtrip len=${bytes.length}")
    }
    val bodiesGen = Gen.listOfN(3, Gen.listOf(Gen.asciiPrintableChar).map(_.mkString))
    samples(bodiesGen, 40).filter(_.nonEmpty).foreach { bodies =>
      for (deflate <- Seq(false, true)) {
        val (n, _, bytes, _) =
          AvroCodec.decodeAvroDoc(AvroCodec.encodeAvroDoc(bodies, deflate)).get
        assert(n === bodies.length.toLong)
        assert(bytes === bodies.map(_.getBytes("UTF-8").length.toLong).sum)
      }
    }
  }

  test("zstd/lz4/snappy: sniffed round-trip law; mutations never throw") {
    val gen = for {
      n <- Gen.chooseNum(0, 4096)
      entropy <- Gen.oneOf(0, 1)     // runs vs random — both codec regimes
      s <- Gen.chooseNum(0L, Long.MaxValue / 2)
    } yield (n, entropy, s)
    samples(gen, 60).foreach { case (n, entropy, s) =>
      val rnd = new scala.util.Random(s)
      val data = if (entropy == 0) Array.fill[Byte](n)((s % 251).toByte)
        else Array.fill[Byte](n)(rnd.nextInt(256).toByte)
      Seq("zstd", "lz4", "snappy", "gzip").foreach { codec =>
        val comp = Compressed.compressAs(codec, data)
        val got = Compressed.decompressSniff(comp)
        assert(got.isDefined && got.get._1 === codec, s"$codec n=$n e=$entropy")
        assert(got.get._2.toSeq === data.toSeq, s"$codec n=$n e=$entropy seed=$s")
        // single-byte mutations: any outcome but a throw is acceptable,
        // and a header-byte mutation must not mis-sniff into a crash
        if (comp.length > 0) {
          val m = comp.clone(); val at = rnd.nextInt(comp.length)
          m(at) = (m(at) ^ (1 + rnd.nextInt(255))).toByte
          Compressed.decompressSniff(m) // must be total
        }
      }
    }
    // unknown magic never guesses
    assert(Compressed.sniffCodec("plaintext, no magic".getBytes("UTF-8")).isEmpty)
    assert(Compressed.decompressSniff(Array[Byte](0, 1, 2)).isEmpty)
  }

  test("warc: record round-trip law; mutations/truncations are total, and a " +
       "parsed record never lies about its payload") {
    import graft.operators.Warc
    val gen = for {
      n <- Gen.chooseNum(0, 2000)
      uriLen <- Gen.chooseNum(0, 80)
      s <- Gen.chooseNum(0L, Long.MaxValue / 2)
    } yield (n, uriLen, s)
    samples(gen, 50).foreach { case (n, uriLen, s) =>
      val rnd = new scala.util.Random(s)
      // bodies may contain CRLF runs and even 'WARC/' — framing must hold
      val body = Array.fill[Byte](n)(rnd.nextInt(256).toByte)
      val uri = "http://x.org/" + Seq.fill(uriLen)('a').mkString
      val rec = Warc.buildRecord(uri, "2024-01-01T00:00:00Z", "id", "text/plain", body)
      Warc.parseWarcRecord(rec) match {
        case Some(r) =>
          assert(r.targetUri === Some(uri) && r.payload.toSeq === body.toSeq,
            s"n=$n seed=$s")
        case None =>
          // legal only when the random BODY itself contains bytes that
          // make the HEADER ambiguous — i.e. a CRLFCRLF before the real
          // split. Everything else must parse.
          val headEnd = rec.indexOfSlice(Seq[Byte]('\r', '\n', '\r', '\n'))
          assert(body.containsSlice(Seq[Byte]('\r', '\n', '\r', '\n')) ||
            headEnd < 0, s"well-framed record must parse: n=$n seed=$s")
      }
      // single-byte mutations and truncations: any outcome but a throw
      if (rec.nonEmpty) {
        val m = rec.clone(); val at = rnd.nextInt(rec.length)
        m(at) = (m(at) ^ (1 + rnd.nextInt(255))).toByte
        Warc.parseWarcRecord(m)
        Warc.parseWarcRecord(rec.take(rnd.nextInt(rec.length)))
      }
    }
  }
}
