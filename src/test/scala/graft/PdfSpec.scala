package graft

import graft.operators.Pdf

/** Pdf.extractText: golden round-trips through the fixture writer (the
  * MediaCodecs convention — the encoder emits exactly the layouts the
  * extractor parses, so the pair cannot drift into a private dialect),
  * the failure taxonomy, and the lexer's corner syntax. */
class PdfSpec extends SparkSpec {
  import spark.implicits._

  private def ex(b: Array[Byte]) = Pdf.extractText(b)

  test("golden: Tj + kerned TJ + escape-heavy literal, uncompressed") {
    val pdf = Pdf.encodePdf(Seq(
      "BT /F1 12 Tf (Hello doc 7 ) Tj " +
        "[(kern) -120 (ed TJ ) 33 (7)] TJ " +
        "(Paren \\( nested \\) and \\\\ back \\101) Tj ET"))
    val r = ex(pdf)
    assert(r === Pdf.PdfText(1L, "", 1L,
      "Hello doc 7 kerned TJ 7Paren ( nested ) and \\ back A"))
  }

  test("golden: two Flate pages, ' next-line show, indirect /Length") {
    val pdf = Pdf.encodePdf(Seq(
      "BT /F1 12 Tf (Flate page one of 9) Tj ET",
      "BT /F1 12 Tf (line one) Tj (line two 9) ' ET"),
      flate = true, indirectLength = true)
    val r = ex(pdf)
    assert(r === Pdf.PdfText(1L, "", 2L,
      "Flate page one of 9\nline one\nline two 9"))
  }

  test("golden: WinAnsi octal escapes decode as windows-1252") {
    val pdf = Pdf.encodePdf(Seq("BT /F1 12 Tf (Caf\\351 costs \\2005) Tj ET"))
    assert(ex(pdf) === Pdf.PdfText(1L, "", 1L, "Café costs €5"))
  }

  test("litString escapes round-trip any WinAnsi text through the lexer") {
    val text = "mixed (parens) \\ slash é€ and\nnewline"
    val pdf = Pdf.encodePdf(Seq(s"BT ${Pdf.litString(text)} Tj ET"))
    assert(ex(pdf) === Pdf.PdfText(1L, "", 1L, text))
  }

  test("hex strings show through Tj; odd final digit pads zero") {
    val pdf = Pdf.encodePdf(Seq("BT <48 65 6C 6C 6F> Tj <7> Tj ET"))
    assert(ex(pdf) === Pdf.PdfText(1L, "", 1L, "Hellop"),
      "odd digit 7 pads to 0x70 = p")
  }

  test("taxonomy: encrypted, unsupported filter, corrupt startxref, " +
    "malformed zlib, header, degenerate inputs") {
    val enc = Pdf.encodePdf(Seq("BT (s) Tj ET"), encrypted = true)
    assert(ex(enc) === Pdf.PdfText(0L, "encrypted", 0L, ""))
    val lzw = Pdf.encodePdf(Seq("BT (s) Tj ET"),
      filterName = Some("LZWDecode"))
    assert(ex(lzw) === Pdf.PdfText(0L, "filter", 0L, ""))
    val bad = Pdf.encodePdf(Seq("BT (s) Tj ET"), corruptStartxref = true)
    assert(ex(bad) === Pdf.PdfText(0L, "xref", 0L, ""))
    // declares FlateDecode over RAW bytes — the zlib stream is garbage
    val rawFlate = Pdf.encodePdf(Seq("BT (s) Tj ET"),
      filterName = Some("FlateDecode"))
    assert(ex(rawFlate) === Pdf.PdfText(0L, "deflate", 0L, ""))
    assert(ex("not a pdf at all".getBytes) === Pdf.PdfText(0L, "header", 0L, ""))
    assert(ex(null) === Pdf.PdfText(0L, "header", 0L, ""))
    assert(ex(Array.empty[Byte]) === Pdf.PdfText(0L, "header", 0L, ""))
    // truncated mid-body: header ok, startxref gone
    val ok = Pdf.encodePdf(Seq("BT (s) Tj ET"))
    assert(ex(ok.take(40)) === Pdf.PdfText(0L, "xref", 0L, ""))
  }

  test("operators between shows clear operands; unknown ops are inert") {
    // the (ghost) string is consumed by the unknown operator Zz and must
    // NOT leak into the next Tj
    val pdf = Pdf.encodePdf(Seq(
      "BT /F1 12 Tf 1 0 0 1 72 720 Tm (ghost) Zz (real) Tj ET"))
    assert(ex(pdf) === Pdf.PdfText(1L, "", 1L, "real"))
  }

  test("empty content and zero-page documents are ok=1, not failures") {
    assert(ex(Pdf.encodePdf(Seq("BT ET"))) === Pdf.PdfText(1L, "", 1L, ""))
    assert(ex(Pdf.encodePdf(Seq.empty)) === Pdf.PdfText(1L, "", 0L, ""))
  }

  test("pdfTexts Spark plumbing matches the pure function per mode") {
    val ids = (0L until 12L).toDF("doc_id")
    val out = Pdf.pdfTexts(Pdf.synthPdfAssets(ids, "doc_id"))
      .collect().map(r => r.doc_id -> r).toMap
    assert(out.size === 12)
    assert(out(6L).text === "Hello doc 6 kerned TJ 6Paren ( nested ) and \\ back A")
    assert(out(7L) === Pdf.PdfRow(7L, 1L, "", 2L,
      "Flate page one of 7\nline one\nline two 7"))
    assert(out(8L) === Pdf.PdfRow(8L, 1L, "", 1L, "Café costs €8"))
    assert(out(9L) === Pdf.PdfRow(9L, 0L, "encrypted", 0L, ""))
    assert(out(10L) === Pdf.PdfRow(10L, 0L, "filter", 0L, ""))
    assert(out(11L) === Pdf.PdfRow(11L, 0L, "xref", 0L, ""))
  }
}
