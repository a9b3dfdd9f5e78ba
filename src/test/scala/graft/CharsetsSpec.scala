package graft

import java.nio.charset.{Charset, StandardCharsets}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Charsets

/** Charsets: detection precedence (BOM ≻ header ≻ meta ≻ default),
  * strict-decode verdicts, and the byte-preserving failure fallback. */
class CharsetsSpec extends AnyFunSuite {
  private val Utf8 = StandardCharsets.UTF_8
  private val L1 = StandardCharsets.ISO_8859_1
  private val W1252 = Charset.forName("windows-1252")
  private val bomU8 = Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte)

  test("precedence: BOM outranks a contradicting header; header outranks meta") {
    val b = bomU8 ++ "hé".getBytes(Utf8)
    val d = Charsets.detect(b, Some("text/html; charset=windows-1252"))
    assert(d.charset === "UTF-8" && d.source === "bom" && d.bomLen === 3)
    val body = "<meta charset=\"ISO-8859-1\">x".getBytes(L1)
    val h = Charsets.detect(body, Some("text/html; charset=windows-1252"))
    assert(h.charset === "windows-1252" && h.source === "header")
    val m = Charsets.detect(body, Some("text/html"))
    assert(m.charset === "ISO-8859-1" && m.source === "meta")
    assert(Charsets.detect("plain".getBytes(Utf8), None) ===
      Charsets.Detected("UTF-8", "default", 0))
  }

  test("an unresolvable declared label is skipped, not an error") {
    val body = "<meta charset=\"ISO-8859-1\">x".getBytes(L1)
    val d = Charsets.detect(body, Some("text/html; charset=x-not-a-charset"))
    assert(d.charset === "ISO-8859-1" && d.source === "meta",
      "unknown header label falls through to the meta prescan")
    val d2 = Charsets.detect("<meta charset='no-such-cs'>".getBytes(L1), None)
    assert(d2 === Charsets.Detected("UTF-8", "default", 0))
    // the r16 review finding: a bogus FIRST meta must not abort the
    // prescan — a later valid declaration counts (WHATWG: unknown
    // label is no label)
    val two = "<meta charset=\"x-bogus\"><meta charset=\"windows-1252\">"
      .getBytes(L1)
    assert(Charsets.detect(two, None) ===
      Charsets.Detected("windows-1252", "meta", 0))
  }

  test("header param forms: quotes, case, surrounding params") {
    assert(Charsets.headerCharset("text/html; CHARSET=\"Windows-1252\"")
      .map(_.name) === Some("windows-1252"))
    assert(Charsets.headerCharset("text/html; boundary=x; charset=utf-8; q=1")
      .map(_.name) === Some("UTF-8"))
    assert(Charsets.headerCharset("text/html") === None)
  }

  test("meta prescan: http-equiv form matches; beyond 1024 bytes is ignored") {
    val he = ("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=Shift_JIS\"></head>").getBytes(L1)
    assert(Charsets.metaCharset(he).map(_.name) === Some("Shift_JIS"))
    val far = (" " * 1030 + "<meta charset=\"ISO-8859-1\">").getBytes(L1)
    assert(Charsets.metaCharset(far) === None,
      "a declaration past the WHATWG prescan window does not count")
  }

  test("meta prescan honors only the two WHATWG placements (r16 ADVICE)") {
    // charset= inside a NON-http-equiv meta's content value is prose,
    // not a declaration — this used to force a Big5 verdict
    val benign = ("<meta name=\"description\" content=\"how to set " +
      "charset=Big5 in your pages\"><p>x</p>").getBytes(L1)
    assert(Charsets.metaCharset(benign) === None)
    // …and must not shadow a LATER real declaration either
    val benignThenReal = ("<meta name=\"description\" content=\"about " +
      "charset=Big5\"><meta charset=\"windows-1252\">").getBytes(L1)
    assert(Charsets.metaCharset(benignThenReal).map(_.name) ===
      Some("windows-1252"))
    // http-equiv spelled with different case + single quotes still counts
    val heq = ("<meta HTTP-EQUIV='content-type' " +
      "CONTENT='text/html; charset=Shift_JIS'>").getBytes(L1)
    assert(Charsets.metaCharset(heq).map(_.name) === Some("Shift_JIS"))
    // unquoted bare charset attribute
    assert(Charsets.metaCharset("<meta charset=utf-8>".getBytes(L1))
      .map(_.name) === Some("UTF-8"))
    // a content= charset WITHOUT the http-equiv key does not count
    val noEquiv = ("<meta content=\"text/html; charset=Big5\">").getBytes(L1)
    assert(Charsets.metaCharset(noEquiv) === None)
  }

  test("UTF-16 BOMs detect and decode (BOM stripped from text)") {
    val be = Array(0xfe.toByte, 0xff.toByte) ++ "né".getBytes(StandardCharsets.UTF_16BE)
    val tbe = Charsets.transcode(be, None)
    assert(tbe === Charsets.Transcoded("UTF-16BE", "bom", 1L, "né"))
    val le = Array(0xff.toByte, 0xfe.toByte) ++ "né".getBytes(StandardCharsets.UTF_16LE)
    val tle = Charsets.transcode(le, None)
    assert(tle === Charsets.Transcoded("UTF-16LE", "bom", 1L, "né"))
  }

  test("strict decode: lying header fails into the byte-preserving fallback") {
    val body = "Lying € header".getBytes(W1252) // € = 0x80, invalid UTF-8
    val t = Charsets.transcode(body, Some("text/plain; charset=utf-8"))
    assert(t.charset === "UTF-8" && t.source === "header" && t.decodeOk === 0L)
    assert(t.text === "Lying \u0080 header",
      "fallback is ISO-8859-1: every byte maps to its code point")
    assert(t.text.getBytes(L1).sameElements(body), "byte-preserving round trip")
  }

  test("legit windows-1252 and UTF-8 bodies decode ok=1 byte-for-byte") {
    val s1252 = "Smart “quotes” cost €7"
    val t1 = Charsets.transcode(s1252.getBytes(W1252),
      Some("text/html; charset=windows-1252"))
    assert(t1 === Charsets.Transcoded("windows-1252", "header", 1L, s1252))
    val u = "Café numéro 9 résumé"
    val t2 = Charsets.transcode(u.getBytes(Utf8), Some("text/plain; charset=utf-8"))
    assert(t2 === Charsets.Transcoded("UTF-8", "header", 1L, u))
  }

  test("degenerate inputs: null/empty body, null content type") {
    assert(Charsets.transcode(null, None) ===
      Charsets.Transcoded("UTF-8", "default", 1L, ""))
    assert(Charsets.transcode(Array.empty[Byte], Some("text/html")) ===
      Charsets.Transcoded("UTF-8", "default", 1L, ""))
    assert(Charsets.headerCharset(null) === None)
    assert(Charsets.metaCharset(null) === None)
  }
}
