package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}

/** PDF text extraction — after HTML, the modal textful format a crawl /
  * curation pipeline ingests (the r16 verdict's #1 breadth item). A
  * bounded PURE-JVM subset of ISO 32000, zero-egress by construction:
  * the only codec needed is FlateDecode, and `java.util.zip.Inflater`
  * is public JDK (the same admission argument as JPEG via
  * `javax.imageio`, r14).
  *
  * Scope, stated honestly (the decode-never-lies contract — anything
  * outside it is an ok=0 row with a taxonomy reason, never a guess):
  *
  *   - classic cross-reference TABLES (`xref` keyword, `/Prev` chains);
  *     cross-reference STREAMS and `/ObjStm` object streams are out of
  *     scope → `xref` / `parse`
  *   - UNENCRYPTED documents; a trailer `/Encrypt` → `encrypted`
  *   - content streams raw or `/FlateDecode` (zlib); any other filter
  *     → `filter`; malformed zlib data → `deflate`
  *   - text-showing operators `Tj`, `'` (next-line + show → a newline
  *     then the string) and `TJ` (array show — strings concatenated,
  *     kerning numbers ignored); positioning operators are not
  *     interpreted beyond that (no layout reconstruction — this is a
  *     corpus text extractor, not a renderer); the rare `"` operator
  *     and inline images (`BI…EI`) are out of scope
  *   - string bytes decode as WinAnsiEncoding (= windows-1252, ISO
  *     32000 Annex D), which equals StandardEncoding on the ASCII
  *     range — the two encodings the scope names; other `/Encoding`
  *     values and CID/Type0 fonts are not interpreted (their bytes
  *     decode as WinAnsi — documented leniency, not a claim)
  *
  * Page texts join with `\n`; multiple `/Contents` streams of one page
  * concatenate with a newline BEFORE tokenizing (ISO 32000 7.8.2: a
  * content stream may not end mid-lexical-unit, whitespace glue is the
  * spec's own concatenation rule).
  *
  * Bomb guards, all documented: ≤16 chained xref tables, ≤10k pages,
  * ≤32 indirect-reference hops, ≤64 MB inflated bytes per stream —
  * a violation is `parse`, never an OOM.
  *
  * 100 TB shape: one map pass over asset payloads inside the existing
  * binary-asset walk (the [[MediaCodecs]] convention) — per-row CPU,
  * zero shuffle; output bytes bounded by the extracted text. */
object Pdf {

  /** Extraction verdict: ok=1 with the text, or ok=0 with a reason from
    * the taxonomy (`header` | `xref` | `encrypted` | `catalog` |
    * `filter` | `deflate` | `parse`) and empty text. `n_pages` is the
    * page-tree leaf count (0 on failure). */
  final case class PdfText(ok: Long, reason: String, nPages: Long,
                           text: String)

  // -------------------------------------------------------------------
  // Object model (the subset the walker needs)
  // -------------------------------------------------------------------
  private sealed trait Obj
  private case class PInt(v: Long) extends Obj
  private case class PReal(v: Double) extends Obj
  private case class PName(v: String) extends Obj
  private case class PStr(bytes: Array[Byte]) extends Obj
  private case class PArr(items: Vector[Obj]) extends Obj
  private case class PDict(m: Map[String, Obj]) extends Obj
  private case class PRef(num: Long) extends Obj
  private case class PBool(v: Boolean) extends Obj
  private case object PNull extends Obj
  private case class PKeyword(v: String) extends Obj
  private case class PStream(dict: PDict, data: Array[Byte]) extends Obj

  private final case class PdfErr(reason: String)
    extends Exception(reason) with scala.util.control.NoStackTrace

  private val MaxXrefChain = 16
  private val MaxPages = 10000
  private val MaxRefHops = 32
  private val MaxInflate = 64 << 20

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == 0
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** Tokenizer + recursive-descent parser over the raw bytes. One
    * instance per document; `pos` is mutable scan state. */
  private final class Lexer(val b: Array[Byte]) {
    var pos: Int = 0
    def atEnd: Boolean = pos >= b.length
    private def cur: Int = if (atEnd) -1 else b(pos) & 0xff

    def skipWs(): Unit = {
      var done = false
      while (!done) {
        while (!atEnd && isWs(cur)) pos += 1
        if (cur == '%') { // comment to EOL
          while (!atEnd && cur != '\r' && cur != '\n') pos += 1
        } else done = true
      }
    }

    /** A run of regular characters (a keyword/operator like `obj`,
      * `stream`, `Tj`, `'`). Empty at a delimiter. */
    def keyword(): String = {
      skipWs()
      val start = pos
      while (!atEnd && !isWs(cur) && !isDelim(cur)) pos += 1
      new String(b, start, pos - start, java.nio.charset.StandardCharsets.US_ASCII)
    }

    def expectKeyword(k: String, reason: String): Unit =
      if (keyword() != k) throw PdfErr(reason)

    /** Parse one object. Numbers look ahead for the `N G R` reference
      * form (backtracking — the classic PDF ambiguity). Bare keywords
      * come back as PKeyword so the content-stream scanner can see
      * operators through the same lexer. */
    def parseObject(depth: Int): Obj = {
      if (depth > 64) throw PdfErr("parse")
      skipWs()
      if (atEnd) throw PdfErr("parse")
      cur match {
        case '/' => parseName()
        case '(' => parseLiteralString()
        case '<' =>
          if (pos + 1 < b.length && (b(pos + 1) & 0xff) == '<') parseDict(depth)
          else parseHexString()
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[Obj]
          var n = 0
          while ({ skipWs(); cur != ']' }) {
            if (atEnd || n > 100000) throw PdfErr("parse")
            items += parseObject(depth + 1); n += 1
          }
          pos += 1
          PArr(items.result())
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          parseNumberOrRef()
        case _ =>
          keyword() match {
            case "true"  => PBool(true)
            case "false" => PBool(false)
            case "null"  => PNull
            case ""      => throw PdfErr("parse")
            case k       => PKeyword(k)
          }
      }
    }

    private def parseName(): PName = {
      pos += 1 // '/'
      val sb = new StringBuilder
      while (!atEnd && !isWs(cur) && !isDelim(cur)) {
        if (cur == '#' && pos + 2 < b.length) {
          val h = Character.digit(b(pos + 1) & 0xff, 16)
          val l = Character.digit(b(pos + 2) & 0xff, 16)
          if (h >= 0 && l >= 0) { sb.append(((h << 4) | l).toChar); pos += 3 }
          else { sb.append(cur.toChar); pos += 1 }
        } else { sb.append(cur.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    /** Literal `(…)` string: balanced parens, the eight escapes, octal
      * `\ooo`, backslash-EOL continuation, interior EOL → LF (ISO 32000
      * 7.3.4.2). */
    private def parseLiteralString(): PStr = {
      pos += 1 // '('
      val out = new java.io.ByteArrayOutputStream()
      var open = 1
      while (open > 0) {
        if (atEnd) throw PdfErr("parse")
        val c = cur; pos += 1
        c match {
          case '(' => open += 1; out.write('(')
          case ')' => open -= 1; if (open > 0) out.write(')')
          case '\\' =>
            if (atEnd) throw PdfErr("parse")
            val e = cur; pos += 1
            e match {
              case 'n' => out.write('\n'); case 'r' => out.write('\r')
              case 't' => out.write('\t'); case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('('); case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => if (cur == '\n') pos += 1 // continuation
              case '\n' => // continuation
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'; var k = 1
                while (k < 3 && !atEnd && cur >= '0' && cur <= '7') {
                  v = (v << 3) | (cur - '0'); pos += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other) // \x → x (spec rule)
            }
          case '\r' => // interior EOL normalizes to LF
            if (cur == '\n') pos += 1
            out.write('\n')
          case other => out.write(other)
        }
      }
      PStr(out.toByteArray)
    }

    private def parseHexString(): PStr = {
      pos += 1 // '<'
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var done = false
      while (!done) {
        if (atEnd) throw PdfErr("parse")
        val c = cur; pos += 1
        if (c == '>') {
          if (hi >= 0) out.write(hi << 4) // odd final digit pads 0
          done = true
        } else if (!isWs(c)) {
          val d = Character.digit(c, 16)
          if (d < 0) throw PdfErr("parse")
          if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
        }
      }
      PStr(out.toByteArray)
    }

    private def parseDict(depth: Int): PDict = {
      pos += 2 // '<<'
      val m = Map.newBuilder[String, Obj]
      var n = 0
      while ({ skipWs(); !(cur == '>' && pos + 1 < b.length && (b(pos + 1) & 0xff) == '>') }) {
        if (atEnd || n > 10000) throw PdfErr("parse")
        if (cur != '/') throw PdfErr("parse")
        val k = parseName().v
        val v = parseObject(depth + 1)
        m += (k -> v); n += 1
      }
      pos += 2 // '>>'
      PDict(m.result())
    }

    private def parseNumberOrRef(): Obj = {
      val start = pos
      if (cur == '+' || cur == '-') pos += 1
      var real = false
      while (!atEnd && ((cur >= '0' && cur <= '9') || cur == '.')) {
        if (cur == '.') real = true
        pos += 1
      }
      val s = new String(b, start, pos - start, java.nio.charset.StandardCharsets.US_ASCII)
      if (s.isEmpty || s == "+" || s == "-" || s == ".") throw PdfErr("parse")
      if (real) return PReal(s.toDouble)
      val v = s.toLong
      // lookahead for `G R`
      val save = pos
      skipWs()
      val gStart = pos
      while (!atEnd && cur >= '0' && cur <= '9') pos += 1
      if (pos > gStart) {
        val save2 = pos
        skipWs()
        if (cur == 'R') {
          val after = pos + 1
          val nxt = if (after < b.length) b(after) & 0xff else -1
          if (nxt == -1 || isWs(nxt) || isDelim(nxt)) {
            pos = after
            return PRef(v)
          }
        }
        pos = save2
      }
      pos = save
      PInt(v)
    }

    /** Parse an indirect object body at the current position: `N G obj
      * <object> [stream…endstream] endobj`. `lengthOf` resolves the
      * stream /Length (possibly an indirect ref). */
    def parseIndirect(lengthOf: Obj => Long): Obj = {
      skipWs()
      parseObject(0) match {
        case PInt(_) => // object number
        case _ => throw PdfErr("parse")
      }
      parseObject(0) match {
        case PInt(_) => // generation
        case _ => throw PdfErr("parse")
      }
      expectKeyword("obj", "parse")
      val body = parseObject(0)
      body match {
        case d: PDict =>
          val save = pos
          if (keyword() == "stream") {
            // EOL after `stream`: CRLF or LF (ISO 32000 7.3.8.1)
            if (cur == '\r') pos += 1
            if (cur == '\n') pos += 1
            val len = lengthOf(d.m.getOrElse("Length", throw PdfErr("parse")))
            if (len < 0 || pos + len > b.length) throw PdfErr("parse")
            val data = java.util.Arrays.copyOfRange(b, pos, pos + len.toInt)
            pos += len.toInt
            expectKeyword("endstream", "parse")
            PStream(d, data)
          } else { pos = save; body }
        case _ => body
      }
    }
  }

  // -------------------------------------------------------------------
  // Document walk
  // -------------------------------------------------------------------

  /** objNum → byte offset, newest xref section first (first-seen wins
    * across the /Prev chain — incremental-update semantics). */
  private def readXrefChain(lx: Lexer, startOffset: Long)
      : (Map[Long, Long], PDict) = {
    var offsets = Map.empty[Long, Long]
    var trailer: Option[PDict] = None
    var next: Option[Long] = Some(startOffset)
    var hops = 0
    while (next.isDefined) {
      hops += 1
      if (hops > MaxXrefChain) throw PdfErr("xref")
      val off = next.get
      if (off < 0 || off >= lx.b.length) throw PdfErr("xref")
      lx.pos = off.toInt
      // cross-reference STREAMS (an object here instead of the keyword)
      // are out of scope — the honest refusal, not a guess
      if (lx.keyword() != "xref") throw PdfErr("xref")
      var inTable = true
      while (inTable) {
        // peek: digits start a `start count` subsection header, the
        // `trailer` keyword ends the table (keyword() would happily
        // consume a digit run, so probe-and-reset)
        val save = lx.pos
        if (lx.keyword() == "trailer") inTable = false
        else {
          lx.pos = save
          val start = lx.parseObject(0) match {
            case PInt(v) => v; case _ => throw PdfErr("xref")
          }
          val count = lx.parseObject(0) match {
            case PInt(v) => v; case _ => throw PdfErr("xref")
          }
          if (count < 0 || count > 1000000) throw PdfErr("xref")
          var i = 0L
          while (i < count) {
            val o = lx.parseObject(0) match {
              case PInt(v) => v; case _ => throw PdfErr("xref")
            }
            lx.parseObject(0) match {
              case PInt(_) => ; case _ => throw PdfErr("xref")
            }
            lx.keyword() match {
              case "n" =>
                val num = start + i
                if (!offsets.contains(num)) offsets += (num -> o)
              case "f" => // free entry
              case _ => throw PdfErr("xref")
            }
            i += 1
          }
        }
      }
      val t = lx.parseObject(0) match {
        case d: PDict => d; case _ => throw PdfErr("xref")
      }
      if (trailer.isEmpty) trailer = Some(t)
      else trailer = Some(PDict(t.m ++ trailer.get.m)) // newest keys win
      next = t.m.get("Prev") match {
        case Some(PInt(p)) => Some(p); case _ => None
      }
    }
    (offsets, trailer.getOrElse(throw PdfErr("xref")))
  }

  /** Find the last `startxref` and the offset after it. */
  private def startxrefOffset(b: Array[Byte]): Long = {
    val tail = "startxref".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    var i = b.length - tail.length
    var found = -1
    while (i >= 0 && found < 0) {
      var j = 0
      while (j < tail.length && b(i + j) == tail(j)) j += 1
      if (j == tail.length) found = i
      i -= 1
    }
    if (found < 0) throw PdfErr("xref")
    val lx = new Lexer(b)
    lx.pos = found + tail.length
    lx.parseObject(0) match {
      case PInt(v) => v
      case _ => throw PdfErr("xref")
    }
  }

  /** Extract text from one document's bytes. Never throws. */
  def extractText(bytes: Array[Byte]): PdfText = {
    try {
      val b = if (bytes == null) Array.empty[Byte] else bytes
      if (b.length < 8 || !(b(0) == '%' && b(1) == 'P' && b(2) == 'D' &&
          b(3) == 'F' && b(4) == '-'))
        return PdfText(0L, "header", 0L, "")
      val lx = new Lexer(b)
      val (offsets, trailer) = readXrefChain(lx, startxrefOffset(b))
      if (trailer.m.contains("Encrypt"))
        return PdfText(0L, "encrypted", 0L, "")

      // object loader with cache + hop cap
      val cache = scala.collection.mutable.Map.empty[Long, Obj]
      def load(num: Long, depth: Int): Obj = {
        if (depth > MaxRefHops) throw PdfErr("parse")
        cache.getOrElseUpdate(num, {
          val off = offsets.getOrElse(num, throw PdfErr("parse"))
          if (off < 0 || off >= b.length) throw PdfErr("parse")
          val olx = new Lexer(b)
          olx.pos = off.toInt
          olx.parseIndirect {
            case PInt(v) => v
            case PRef(n) => load(n, depth + 1) match {
              case PInt(v) => v
              case _ => throw PdfErr("parse")
            }
            case _ => throw PdfErr("parse")
          }
        })
      }
      def deref(o: Obj, depth: Int = 0): Obj = o match {
        case PRef(n) =>
          if (depth > MaxRefHops) throw PdfErr("parse")
          deref(load(n, depth), depth + 1)
        case other => other
      }

      val root = deref(trailer.m.getOrElse("Root", throw PdfErr("catalog"))) match {
        case d: PDict => d; case _ => throw PdfErr("catalog")
      }
      val pagesRoot = deref(root.m.getOrElse("Pages", throw PdfErr("catalog"))) match {
        case d: PDict => d; case _ => throw PdfErr("catalog")
      }

      // page-tree DFS, document order, cycle-proof
      val pages = Vector.newBuilder[PDict]
      var nPages = 0
      val seen = scala.collection.mutable.Set.empty[Long]
      def walk(node: PDict, depth: Int): Unit = {
        if (depth > 64) throw PdfErr("catalog")
        node.m.get("Kids") match {
          case Some(kids) => deref(kids) match {
            case PArr(items) => items.foreach { k =>
              val id = k match { case PRef(n) => n; case _ => -1L }
              if (id < 0 || seen.add(id)) deref(k) match {
                case d: PDict => walk(d, depth + 1)
                case _ => throw PdfErr("catalog")
              }
            }
            case _ => throw PdfErr("catalog")
          }
          case None =>
            nPages += 1
            if (nPages > MaxPages) throw PdfErr("catalog")
            pages += node
        }
      }
      walk(pagesRoot, 0)

      val texts = pages.result().map { page =>
        val streams = page.m.get("Contents") match {
          case None => Vector.empty[PStream]
          case Some(c) => deref(c) match {
            case s: PStream => Vector(s)
            case PArr(items) => items.map(deref(_) match {
              case s: PStream => s
              case _ => throw PdfErr("parse")
            })
            case _ => throw PdfErr("parse")
          }
        }
        val decoded = streams.map(decodeContent(_, o => deref(o)))
        // the spec's own concatenation rule: streams glue with
        // whitespace BEFORE tokenizing (7.8.2)
        val joined =
          if (decoded.isEmpty) Array.empty[Byte]
          else decoded.reduce((a, c) => a ++ Array[Byte]('\n') ++ c)
        contentText(joined)
      }
      PdfText(1L, "", nPages.toLong, texts.mkString("\n"))
    } catch {
      case PdfErr(reason) => PdfText(0L, reason, 0L, "")
      case scala.util.control.NonFatal(_) => PdfText(0L, "parse", 0L, "")
    }
  }

  /** Decode one content stream's data per its /Filter (see scope). */
  private def decodeContent(s: PStream, deref: Obj => Obj): Array[Byte] =
    deref(s.dict.m.getOrElse("Filter", PNull)) match {
      case PNull => s.data
      case PName("FlateDecode") => inflate(s.data)
      case PArr(Vector(f)) => deref(f) match {
        case PName("FlateDecode") => inflate(s.data)
        case _ => throw PdfErr("filter")
      }
      case PArr(items) if items.isEmpty => s.data
      case _ => throw PdfErr("filter")
    }

  /** zlib inflate with the bomb cap; malformed data → `deflate`. */
  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 2))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => throw PdfErr("deflate") }
        if (n == 0 && !inf.finished()) throw PdfErr("deflate") // needs input/dict
        out.write(buf, 0, n)
        if (out.size > MaxInflate) throw PdfErr("parse")
      }
      out.toByteArray
    } finally inf.end()
  }

  /** WinAnsiEncoding = windows-1252 (ISO 32000 Annex D); resolved here,
    * never captured in a closure (Charsets are not serializable). */
  private def winAnsi(bytes: Array[Byte]): String =
    new String(bytes, java.nio.charset.Charset.forName("windows-1252"))

  /** Scan one decoded content stream for `Tj` / `'` / `TJ` shows.
    * Operand handling is the PostScript convention: operands accumulate
    * until an operator consumes or clears them. Unknown operators clear
    * — their operands are positioning/state, not text. */
  private def contentText(data: Array[Byte]): String = {
    val lx = new Lexer(data)
    val out = new StringBuilder
    var lastStr: Array[Byte] = null
    var lastArr: Vector[Obj] = null
    while ({ lx.skipWs(); !lx.atEnd }) {
      lx.parseObject(0) match {
        case PStr(s) => lastStr = s
        case PArr(items) => lastArr = items
        case PKeyword("Tj") =>
          if (lastStr != null) out ++= winAnsi(lastStr)
          lastStr = null; lastArr = null
        case PKeyword("'") =>
          out += '\n'
          if (lastStr != null) out ++= winAnsi(lastStr)
          lastStr = null; lastArr = null
        case PKeyword("TJ") =>
          if (lastArr != null) lastArr.foreach {
            case PStr(s) => out ++= winAnsi(s)
            case _ => // kerning number
          }
          lastStr = null; lastArr = null
        case PKeyword(_) => lastStr = null; lastArr = null
        case _ => // numbers/names/dicts: operands for ops we don't read
      }
    }
    out.toString
  }

  // -------------------------------------------------------------------
  // Spark surface
  // -------------------------------------------------------------------

  /** One extracted document (package-visible: Encoders.product row
    * types must stay janino-compilable — the q149 lesson). */
  final case class PdfRow(doc_id: Long, ok: Long, reason: String,
                          n_pages: Long, text: String)

  /** Per-asset text extraction over a [[Multimodal.toAssets]] frame —
    * map-only inside the binary-asset walk, zero shuffle (see object
    * doc for the 100 TB shape). */
  def pdfTexts(assets: DataFrame): Dataset[PdfRow] = {
    val enc = Encoders.product[PdfRow]
    Spread.toCores(assets)
      .select(col("asset_id").cast(LongType), col("payload").cast(BinaryType))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val r = extractText(payload)
          PdfRow(id, r.ok, r.reason, r.nPages, r.text)
        }
      }(enc)
  }

  // -------------------------------------------------------------------
  // Fixture writer — emits exactly the layouts the extractor parses
  // (golden tests pin the byte layout, the MediaCodecs convention)
  // -------------------------------------------------------------------

  /** A PDF literal string for `content` ops: the three delimiters
    * escape, non-ASCII / control bytes become octal escapes over the
    * WinAnsi (windows-1252) byte image — so fixture bytes stay ASCII
    * regardless of the text. */
  def litString(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.Charset.forName("windows-1252"))
    val sb = new StringBuilder("(")
    bytes.foreach { byt =>
      val c = byt & 0xff
      c match {
        case '(' => sb ++= "\\("
        case ')' => sb ++= "\\)"
        case '\\' => sb ++= "\\\\"
        case _ if c >= 0x20 && c < 0x7f => sb += c.toChar
        case _ => sb ++= f"\\${c}%03o"
      }
    }
    sb += ')'
    sb.toString
  }

  /** Build a classic-xref PDF: one Catalog, one Pages node, one Page +
    * content stream per entry of `pageOps` (each a content-operator
    * string, e.g. `BT /F1 12 Tf (Hi) Tj ET`), one Type1 /Helvetica
    * font with /WinAnsiEncoding shared by all pages.
    *
    *  - `flate` — deflate every content stream (/Filter /FlateDecode)
    *  - `filterName` — declare this filter WITHOUT encoding the data
    *    (an unsupported-filter fixture; `Some("FlateDecode")` declares
    *    flate over raw bytes = the malformed-zlib fixture)
    *  - `encrypted` — a dummy /Encrypt dict lands in the trailer
    *  - `corruptStartxref` — startxref points past EOF
    *  - `indirectLength` — page 0's /Length is an indirect reference
    *    (the two-object form real writers emit when streaming) */
  def encodePdf(pageOps: Seq[String], flate: Boolean = false,
                filterName: Option[String] = None,
                encrypted: Boolean = false,
                corruptStartxref: Boolean = false,
                indirectLength: Boolean = false): Array[Byte] = {
    require(filterName.isEmpty || !flate, "flate XOR filterName")
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    val n = pageOps.length
    val catalogN = 1L; val pagesN = 2L
    def pageN(i: Int) = 3L + 2L * i
    def contentN(i: Int) = 4L + 2L * i
    val fontN = 3L + 2L * n
    val encryptN = fontN + 1L
    val lenN = encryptN + 1L // indirect-length object (page 0), if used

    val out = new java.io.ByteArrayOutputStream()
    val offsets = scala.collection.mutable.Map.empty[Long, Long]
    def write(s: String): Unit = { val b = s.getBytes(ascii); out.write(b, 0, b.length) }
    def obj(num: Long)(body: => Unit): Unit = {
      offsets(num) = out.size.toLong
      write(s"$num 0 obj\n"); body; write("\nendobj\n")
    }
    // the conventional high-bit comment line marking a binary file
    write("%PDF-1.4\n%\u00e2\u00e3\u00cf\u00d3\n")
    obj(catalogN) { write(s"<< /Type /Catalog /Pages $pagesN 0 R >>") }
    obj(pagesN) {
      val kids = (0 until n).map(i => s"${pageN(i)} 0 R").mkString(" ")
      write(s"<< /Type /Pages /Kids [$kids] /Count $n >>")
    }
    (0 until n).foreach { i =>
      obj(pageN(i)) {
        write(s"<< /Type /Page /Parent $pagesN 0 R " +
          s"/Resources << /Font << /F1 $fontN 0 R >> >> " +
          s"/MediaBox [0 0 612 792] /Contents ${contentN(i)} 0 R >>")
      }
      val raw = pageOps(i).getBytes(ascii)
      val data = if (flate) {
        val d = new java.util.zip.Deflater()
        d.setInput(raw); d.finish()
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
        d.end()
        bos.toByteArray
      } else raw
      obj(contentN(i)) {
        val filter = filterName.map(f => s" /Filter /$f")
          .getOrElse(if (flate) " /Filter /FlateDecode" else "")
        val lenPart =
          if (indirectLength && i == 0) s"$lenN 0 R" else s"${data.length}"
        write(s"<< /Length $lenPart$filter >>\nstream\n")
        out.write(data, 0, data.length)
        write("\nendstream")
      }
      if (indirectLength && i == 0) obj(lenN) { write(s"${data.length}") }
    }
    obj(fontN) {
      write("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
        "/Encoding /WinAnsiEncoding >>")
    }
    if (encrypted) obj(encryptN) {
      write("<< /Filter /Standard /V 1 /R 2 >>")
    }
    val maxN = offsets.keys.max
    val xrefOff = out.size.toLong
    write(s"xref\n0 ${maxN + 1}\n")
    write(f"${0}%010d ${65535}%05d f \n")
    (1L to maxN).foreach { i =>
      offsets.get(i) match {
        case Some(o) => write(f"$o%010d ${0}%05d n \n")
        case None => write(f"${0}%010d ${65535}%05d f \n")
      }
    }
    write(s"trailer\n<< /Size ${maxN + 1} /Root $catalogN 0 R")
    if (encrypted) write(s" /Encrypt $encryptN 0 R")
    write(" >>\nstartxref\n")
    write(s"${if (corruptStartxref) out.size.toLong + 999999L else xrefOff}")
    write("\n%%EOF\n")
    out.toByteArray
  }

  /** PDF fixture lake: per id, mode = floorMod(id, 6) rotates the
    * taxonomy —
    *
    *   - 0: one uncompressed page; `Tj`, a kerned `TJ`, and an
    *     escape-heavy literal (nested parens, backslash, octal `\101`)
    *   - 1: TWO Flate pages; page 2 uses the `'` next-line-show; page
    *     1's /Length is an indirect reference
    *   - 2: WinAnsi high bytes via octal escapes (é = \351, € = \200)
    *   - 3: encrypted → ok=0 `encrypted`
    *   - 4: /LZWDecode declared → ok=0 `filter`
    *   - 5: startxref past EOF → ok=0 `xref`
    *
    * All text is closed-form id arithmetic — the oracle replays it
    * exactly (see q287). */
  def synthPdfAssets(ids: DataFrame, idCol: String): DataFrame = {
    val rows = Spread.toCores(ids)
      .select(col(idCol).cast(LongType)).as(Encoders.scalaLong)
      .mapPartitions { it =>
        it.map { id =>
          val bytes = Math.floorMod(id, 6L).toInt match {
            case 0 => encodePdf(Seq(
              s"BT /F1 12 Tf (Hello doc $id ) Tj " +
                s"[(kern) -120 (ed TJ ) 33 ($id)] TJ " +
                "(Paren \\( nested \\) and \\\\ back \\101) Tj ET"))
            case 1 => encodePdf(Seq(
              s"BT /F1 12 Tf (Flate page one of $id) Tj ET",
              s"BT /F1 12 Tf (line one) Tj (line two $id) ' ET"),
              flate = true, indirectLength = true)
            case 2 => encodePdf(Seq(
              s"BT /F1 12 Tf (Caf\\351 costs \\200$id) Tj ET"))
            case 3 => encodePdf(Seq(
              s"BT /F1 12 Tf (secret $id) Tj ET"), encrypted = true)
            case 4 => encodePdf(Seq(
              s"BT /F1 12 Tf (lzw $id) Tj ET"),
              filterName = Some("LZWDecode"))
            case _ => encodePdf(Seq(
              s"BT /F1 12 Tf (lost $id) Tj ET"), corruptStartxref = true)
          }
          (id, bytes)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("asset_id", "payload")
    Multimodal.toAssets(rows, "asset_id", "payload", "application/pdf")
  }
}
