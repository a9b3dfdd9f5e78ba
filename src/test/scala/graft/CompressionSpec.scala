package graft

import graft.operators.TextAnalysis

/** TextAnalysis.compressionRatio: the exact-ratio laws the oracle
  * cannot pin (compressed sizes are codec facts with no closed form —
  * the q291 oracle checks raw_len + verdict only). */
class CompressionSpec extends SparkSpec {
  import spark.implicits._

  private def rows(docs: Seq[(Long, String)]) =
    TextAnalysis.compressionRatio(docs.toDF("doc_id", "text"))
      .collect().map(r => r.doc_id -> r).toMap

  test("repetition law: template spam < prose < uniform-random, with margin") {
    val out = rows(Seq(
      (1L, "spam " * 25),
      (2L, "Document 9 surveys the harvest records of district 9: wheat " +
        "yields rose while barley fell, and the council noted that " +
        "irrigation repairs and fair market pricing kept granaries stocked."),
      (3L, {
        var x = 42L
        val sb = new StringBuilder
        while (sb.length < 400) {
          x = x * 6364136223846793005L + 1442695040888963407L
          sb += (33 + Math.floorMod(x >>> 17, 94L).toInt).toChar
        }
        sb.toString
      })))
    val (r1, r2, r3) =
      (out(1L).ratio.get, out(2L).ratio.get, out(3L).ratio.get)
    assert(r1 < r2 && r2 < r3, s"monotone: $r1 < $r2 < $r3")
    assert(r1 < 0.25 && out(1L).verdict === "repetitive",
      s"spam ratio $r1 sits far below the 0.35 boundary")
    assert(r2 > 0.45 && r2 < 0.75 && out(2L).verdict === "normal",
      s"prose ratio $r2 sits inside (0.35, 0.80) with margin")
    assert(r3 > 0.85 && out(3L).verdict === "incompressible",
      s"random ratio $r3 sits above the 0.80 boundary with margin")
  }

  test("accounting: raw_len is UTF-8 bytes, compressed_len > 0, ratio = c/r") {
    val out = rows(Seq((1L, "Café € " * 30)))
    val r = out(1L)
    assert(r.raw_len === ("Café € " * 30)
      .getBytes("UTF-8").length.toLong, "bytes, not chars")
    assert(r.compressed_len > 0L)
    assert(r.ratio.get ===
      math.rint(r.compressed_len.toDouble / r.raw_len * 1e6) / 1e6)
  }

  test("empty and null text stay visible as 'empty' with NULL ratio") {
    val out = rows(Seq((1L, ""), (2L, null)))
    assert(out(1L) === TextAnalysis.CompressionRow(1L, 0L, 0L, None, "empty"))
    assert(out(2L) === TextAnalysis.CompressionRow(2L, 0L, 0L, None, "empty"))
  }

  test("fixture modes land in their verdict buckets for a spread of ids") {
    val ids = (0L until 30L).toDF("doc_id")
    val out = TextAnalysis.compressionRatio(
      TextAnalysis.synthCompressionDocs(ids, "doc_id"))
      .collect()
    out.foreach { r =>
      val expect = Math.floorMod(r.doc_id, 3L) match {
        case 0L => "repetitive"; case 1L => "normal"; case _ => "incompressible"
      }
      assert(r.verdict === expect, s"id ${r.doc_id} ratio ${r.ratio}")
    }
  }
}
