package graft.operators

import java.nio.charset.{Charset, CharsetDecoder, CodingErrorAction, StandardCharsets}

/** Charset detection + transcoding for crawl bodies — the step every
  * C4/CCNet-family pipeline runs BEFORE language-ID and main-content
  * extraction: real crawl corpora are ~10-20% legacy-encoded
  * (windows-1252, ISO-8859-x, Shift-JIS, GBK), and decoding them as
  * UTF-8 either throws or U+FFFD-shreds exactly the non-ASCII characters
  * the downstream text stages key on.
  *
  * Detection precedence follows the public WHATWG encoding-sniffing
  * order (the one browsers implement), restricted to the three signals
  * available at rest in an archive:
  *
  *   1. **BOM** — UTF-8 (EF BB BF), UTF-16BE (FE FF), UTF-16LE (FF FE).
  *      A BOM outranks everything (a server cannot un-say the bytes).
  *   2. **Content-Type charset parameter** — `text/html;
  *      charset=windows-1252` from the HTTP envelope or the WET record
  *      header.
  *   3. **`<meta charset>` prescan** — the first 1024 bytes scanned
  *      byte-transparently (ISO-8859-1) for `<meta charset="…">` or the
  *      `http-equiv=content-type` form's `charset=` inside its content
  *      attribute. Tags are attribute-parsed, and only those two
  *      placements count (the WHATWG prescan's rule) — a `charset=`
  *      substring inside some OTHER attribute's value (a description
  *      meta mentioning an encoding) is prose, not a declaration.
  *   4. **Default** — UTF-8 (the modern-web prior; ASCII is a subset).
  *
  * A declared name the JVM cannot resolve is SKIPPED (the next
  * precedence level applies), matching the browser rule that an unknown
  * label is no label. Decoding is STRICT (`CodingErrorAction.REPORT`):
  * `decode_ok = 1` means every byte round-tripped under the detected
  * charset. When the detected charset REJECTS the bytes (a lying
  * header, a mojibake body), the row stays a corpus member — the
  * never-vanish membership rule — with `decode_ok = 0` and the text
  * decoded as ISO-8859-1, the one total single-byte decode (every byte
  * maps), preserving the bytes one-to-one as code points for forensic
  * inspection; the `charset` column keeps the DETECTED (failed) name so
  * the failure is attributable.
  *
  * Everything here is a pure byte-in/string-out function — the Spark
  * surface is [[Warc.warcTranscodedRecords]]'s per-member call inside
  * the existing shard walk (map-only, no shuffle; charset work is
  * per-row CPU like the codecs). */
object Charsets {

  /** Detected charset + where the verdict came from + how many leading
    * BOM bytes to strip before decoding. */
  final case class Detected(charset: String, source: String, bomLen: Int)

  /** `charset=` parameter inside a Content-Type value (RFC 9110 §8.3):
    * case-insensitive, optional quotes, value ends at `;`/`,`/quote/
    * whitespace. */
  private val HeaderCharsetRe =
    "(?i)charset[ \\t]*=[ \\t]*\"?([A-Za-z0-9._:\\-]+)".r

  /** A whole `<meta …>` tag of the prescan window (the `[^>]*` stop is
    * the [[graft.operators.Html]] leniency: a literal `>` inside a
    * quoted attribute value truncates the tag early — the truncated
    * prefix is still attribute-parsed, never mis-read as body text). */
  private val MetaTagRe = "(?is)<meta[ \\t\\n\\x0B\\f\\r][^>]*".r

  /** One attribute of a meta tag: name, then optionally `=` and a
    * double-quoted / single-quoted / unquoted value. Matching whole
    * name=value units (instead of grepping for `charset=` anywhere in
    * the tag, the r16 ADVICE finding) is what keeps a benign
    * `content="… charset=big5 …"` on a non-http-equiv meta from
    * hijacking the verdict: `charset=big5` there is part of the
    * `content` attribute's VALUE, not an attribute of its own. */
  private val MetaAttrRe =
    "(?is)([A-Za-z][A-Za-z0-9_:.\\-]*)(?:[ \\t\\n\\x0B\\f\\r]*=[ \\t\\n\\x0B\\f\\r]*(?:\"([^\"]*)\"|'([^']*)'|([^ \\t\\n\\x0B\\f\\r\"'>]+)))?".r

  /** How far the meta prescan reads — the WHATWG prescan's 1024-byte
    * window (a conforming document declares its encoding within it). */
  val PrescanBytes = 1024

  /** Resolve a declared label to a JVM charset; None for labels the JVM
    * does not know (the caller falls through to the next signal). */
  def resolve(name: String): Option[Charset] =
    try Some(Charset.forName(name.trim))
    catch { case _: IllegalArgumentException => None }

  /** The declared charset parameter of a Content-Type value, resolved;
    * None when absent or unresolvable. */
  def headerCharset(contentType: String): Option[Charset] =
    Option(contentType).flatMap(ct =>
      HeaderCharsetRe.findFirstMatchIn(ct).flatMap(m => resolve(m.group(1))))

  /** The prescan's meta-declared charset, resolved. The window is
    * decoded as ISO-8859-1 — byte-transparent, so the ASCII-compatible
    * `<meta` markup is found regardless of what the body encoding turns
    * out to be (the same trick the WHATWG prescan uses).
    *
    * Per-tag rule (the WHATWG prescan's actual one, tightened here
    * after the r16 ADVICE finding): a declaration counts only when it
    * is (a) a bare `charset` ATTRIBUTE, or (b) a `charset=` parameter
    * inside the `content` attribute VALUE of a tag whose `http-equiv`
    * is `content-type` — a `charset=` substring in any other
    * attribute's value (a description meta mentioning an encoding) is
    * prose, not a declaration. Attribute names are first-occurrence-
    * wins within a tag (the HTML duplicate-attribute rule). */
  def metaCharset(body: Array[Byte]): Option[Charset] = {
    if (body == null || body.length == 0) return None
    val n = math.min(body.length, PrescanBytes)
    val window = new String(body, 0, n, StandardCharsets.ISO_8859_1)
    // keep scanning past unresolvable labels (the WHATWG prescan rule:
    // an unknown label is NO label — a later valid declaration counts,
    // the r16 review finding)
    MetaTagRe.findAllMatchIn(window).flatMap { tag =>
      // drop the "<meta" head; first occurrence of each name wins
      val attrs = MetaAttrRe.findAllMatchIn(tag.matched.drop(5))
        .map { m =>
          val v = Option(m.group(2)).orElse(Option(m.group(3)))
            .orElse(Option(m.group(4))).getOrElse("")
          (m.group(1).toLowerCase, v)
        }
        .foldLeft(Map.empty[String, String]) { (acc, kv) =>
          if (acc.contains(kv._1)) acc else acc + kv
        }
      attrs.get("charset").flatMap(resolve).orElse {
        if (attrs.get("http-equiv").exists(_.equalsIgnoreCase("content-type")))
          attrs.get("content").flatMap(c => headerCharset(c))
        else None
      }
    }.nextOption()
  }

  /** Detection verdict for one body (see object doc for the order). */
  def detect(body: Array[Byte], contentType: Option[String]): Detected = {
    val n = if (body == null) 0 else body.length
    if (n >= 3 && (body(0) & 0xff) == 0xef && (body(1) & 0xff) == 0xbb &&
        (body(2) & 0xff) == 0xbf)
      return Detected("UTF-8", "bom", 3)
    if (n >= 2 && (body(0) & 0xff) == 0xfe && (body(1) & 0xff) == 0xff)
      return Detected("UTF-16BE", "bom", 2)
    if (n >= 2 && (body(0) & 0xff) == 0xff && (body(1) & 0xff) == 0xfe)
      return Detected("UTF-16LE", "bom", 2)
    contentType.flatMap(headerCharset) match {
      case Some(cs) => Detected(cs.name, "header", 0)
      case None => metaCharset(body) match {
        case Some(cs) => Detected(cs.name, "meta", 0)
        case None => Detected("UTF-8", "default", 0)
      }
    }
  }

  private def strictDecoder(cs: Charset): CharsetDecoder =
    cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)

  /** Strict decode of `body[from..)` — None when any byte sequence is
    * malformed or unmappable under `cs`. */
  def strictDecode(body: Array[Byte], from: Int, cs: Charset): Option[String] =
    try Some(strictDecoder(cs).decode(
      java.nio.ByteBuffer.wrap(body, from, body.length - from)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => None }

  /** One transcoded body: detected charset name, detection source
    * (bom|header|meta|default), strict-decode verdict, and the text
    * (detected decode on ok=1; the total ISO-8859-1 byte-preserving
    * decode on ok=0 — see object doc). The BOM, when present, is
    * stripped from the text (it is framing, not content). */
  final case class Transcoded(charset: String, source: String,
                              decodeOk: Long, text: String)

  def transcode(body: Array[Byte], contentType: Option[String]): Transcoded = {
    val b = if (body == null) Array.empty[Byte] else body
    val d = detect(b, contentType)
    // detect only returns resolvable names (BOM names are constants)
    val cs = resolve(d.charset).getOrElse(StandardCharsets.UTF_8)
    strictDecode(b, d.bomLen, cs) match {
      case Some(t) => Transcoded(d.charset, d.source, 1L, t)
      case None => Transcoded(d.charset, d.source, 0L,
        new String(b, d.bomLen, b.length - d.bomLen, StandardCharsets.ISO_8859_1))
    }
  }
}
