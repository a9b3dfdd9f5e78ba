package graft

import graft.operators.{MediaCodecs, Multimodal}
import org.apache.spark.sql.functions._

/** MediaCodecs.probeJpeg / orientPixels + Multimodal.jpegProbe /
  * imageAHashOriented: golden EXIF layouts, the eight-orientation
  * inverse law, and the rotated-re-upload collapse the q295 oracle
  * counts but does not inspect. */
class ExifSpec extends SparkSpec {
  import spark.implicits._

  private def asym: MediaCodecs.BmpData =
    // 3×2, six distinct pixels: any wrong index map scrambles it
    MediaCodecs.BmpData(3, 2, Array(1, 2, 3, 4, 5, 6))

  test("orientPixels ∘ inverseOrient = identity for all eight orientations") {
    (1 to 8).foreach { o =>
      val stored = MediaCodecs.inverseOrient(asym, o)
      if (o >= 5)
        assert(stored.width === 2 && stored.height === 3,
          s"orientation $o swaps dimensions")
      val back = MediaCodecs.orientPixels(stored, o)
      assert(back.width === 3 && back.height === 2, s"orientation $o")
      assert(back.pixels.toSeq === asym.pixels.toSeq, s"orientation $o")
    }
  }

  test("probeJpeg: dims from SOF, orientation from spliced APP1, both byte orders") {
    def px(x: Int, y: Int): Int = if ((x + y) % 2 == 0) 0xffffff else 0
    val base = MediaCodecs.encodeJpeg(11, 7, px _, 0.9f)
    assert(MediaCodecs.probeJpeg(base) ===
      Some(MediaCodecs.JpegInfo(11, 7, 1, hasExif = false)),
      "plain imageio JPEG: dims via the segment walk, spec-default orientation")
    for ((be, o) <- Seq((true, 6), (false, 8))) {
      val tagged = MediaCodecs.spliceAfterSoi(base,
        MediaCodecs.encodeExifApp1(o, bigEndian = be))
      assert(MediaCodecs.probeJpeg(tagged) ===
        Some(MediaCodecs.JpegInfo(11, 7, o, hasExif = true)),
        s"bigEndian=$be")
      // the spliced file still DECODES (the walk did not corrupt it)
      assert(MediaCodecs.decodeJpeg(tagged).isDefined)
    }
  }

  test("probeJpeg taxonomy: corrupt EXIF downgrades, corrupt SOI refuses") {
    def px(x: Int, y: Int): Int = x * 7 + y
    val base = MediaCodecs.encodeJpeg(5, 5, px _, 0.9f)
    val app1 = MediaCodecs.encodeExifApp1(6, bigEndian = true)
    // break the TIFF magic: orientation must NOT be trusted
    val broken = app1.clone(); broken(11) = 0x7f.toByte
    assert(MediaCodecs.probeJpeg(MediaCodecs.spliceAfterSoi(base, broken)) ===
      Some(MediaCodecs.JpegInfo(5, 5, 1, hasExif = false)),
      "corrupt EXIF: dims still report, orientation falls to default")
    // ISO 10918-1 B.1.1.2 fill bytes: a run of extra 0xFF before a
    // marker is spec-legal padding, not a desync (r17 review)
    val padded = MediaCodecs.spliceAfterSoi(base,
      Array.fill(5)(0xff.toByte) ++ MediaCodecs.encodeExifApp1(3, bigEndian = true))
    assert(MediaCodecs.probeJpeg(padded) ===
      Some(MediaCodecs.JpegInfo(5, 5, 3, hasExif = true)),
      "FF fill run before APP1 skips cleanly")
    assert(MediaCodecs.probeJpeg(
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xff.toByte)) === None,
      "a fill run that eats the payload refuses, never reads out of bounds")
    val noSoi = base.clone(); noSoi(1) = 0x00.toByte
    assert(MediaCodecs.probeJpeg(noSoi) === None)
    assert(MediaCodecs.probeJpeg(null) === None)
    assert(MediaCodecs.probeJpeg(Array[Byte](0xff.toByte, 0xd8.toByte)) === None,
      "SOI alone has no SOF")
  }

  test("imageAHashOriented collapses rotated re-uploads; the plain sniff hash does not") {
    val ids = (0L until 16L).toDF("doc_id")
    val assets = Multimodal.synthOrientedJpegAssets(ids, "doc_id")
    val oriented = Multimodal.imageAHashOriented(assets).collect()
    assert(oriented.forall(_.ok === 1L))
    val byHash = oriented.groupBy(r => (r.ahash_hi, r.ahash_lo))
    assert(byHash.size === 4, "four groups, one hash each after normalization")
    assert(byHash.values.forall(_.length === 4))
    assert(byHash.values.forall(g =>
      g.map(r => Math.floorDiv(r.asset_id, 4L)).distinct.length === 1),
      "clusters are exactly the id groups")
    // without normalization the stored rotations hash apart
    val plain = Multimodal.imageAHashSniff(assets).collect()
    val plainGroups = plain.groupBy(r => Math.floorDiv(r.asset_id, 4L))
    val split = plainGroups.values.count(g =>
      g.map(r => (r.ahash_hi, r.ahash_lo)).distinct.length > 1)
    assert(split >= 3, s"$split/4 groups split under the orientation-blind hash")
  }
}
