package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}

/** WARC (ISO 28500) record parsing — the container format of Common Crawl
  * and every serious web archive. A `.warc.gz` / `.wet.gz` shard is a
  * concatenation of gzip members, ONE RECORD PER MEMBER (that per-record
  * compression is what makes ranged reads possible, and is exactly the
  * boundary walk [[Compressed.gunzipMemberSplit]] provides); each record
  * is a version line, CRLF-separated named headers, a blank line, then
  * `Content-Length` payload bytes. This operator turns a shard payload
  * into typed records — the step between "bytes from the bucket" and
  * [[Html]]/[[TextAnalysis]]'s text stages.
  *
  * Parsing is strict-but-total (the [[Compressed]] contract): a member
  * that is not a well-formed record yields an ok=0 row carrying its
  * member index, never an exception, and never silently repaired bytes.
  * Header names are case-insensitive per the spec; values are trimmed of
  * the optional single space after ':'. `Content-Length` is REQUIRED and
  * must fit inside the member — a declared length past the end is a
  * truncation, reported, not clamped.
  *
  * 100 TB shape: one `mapPartitions` over shard payloads (binary codec
  * work — the documented exception to expression-only operators), one
  * output row per record; no shuffle. Shards are the unit of parallelism
  * exactly as they are on disk. */
object Warc {

  final case class WarcRecord(version: String, warcType: Option[String],
                              targetUri: Option[String], date: Option[String],
                              recordId: Option[String], contentType: Option[String],
                              contentLength: Long, nHeaders: Long,
                              payload: Array[Byte])

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** Parse ONE record from one (inflated) member. None on: missing
    * `WARC/` version line, malformed header line, missing/unparsable/
    * oversized Content-Length, or trailing bytes after the payload that
    * are not the spec's record separator (CRLF CRLF). */
  def parseWarcRecord(bytes: Array[Byte]): Option[WarcRecord] = {
    if (bytes == null || bytes.length < 16) return None
    // locate the header/payload split: first CRLFCRLF
    var split = -1
    var i = 0
    while (split < 0 && i + 3 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
          bytes(i + 2) == '\r' && bytes(i + 3) == '\n') split = i
      i += 1
    }
    if (split < 0) return None
    // UTF-8, not US_ASCII: the WARC spec allows UTF-8 header values
    // (WARC-Target-URI especially), and an ASCII decode would silently
    // U+FFFD-corrupt them — against the never-silently-repaired contract.
    // The CRLFCRLF split above is byte-safe (no UTF-8 continuation byte
    // is 0x0D/0x0A), so decoding the whole head block at once is sound.
    val head = new String(bytes, 0, split, Utf8)
    val lines = head.split("\r\n", -1)
    if (lines.isEmpty || !lines(0).startsWith("WARC/")) return None
    val version = lines(0)
    var warcType, targetUri, date, recordId, contentType: Option[String] = None
    var contentLength = -1L
    var n = 0L
    var li = 1
    while (li < lines.length) {
      val line = lines(li)
      val c = line.indexOf(':')
      if (c <= 0) return None
      val name = line.substring(0, c).trim.toLowerCase
      val value = line.substring(c + 1).trim
      n += 1
      name match {
        case "warc-type" => warcType = Some(value)
        case "warc-target-uri" => targetUri = Some(value)
        case "warc-date" => date = Some(value)
        case "warc-record-id" => recordId = Some(value)
        case "content-type" => contentType = Some(value)
        case "content-length" =>
          contentLength = try value.toLong catch { case _: NumberFormatException => return None }
        case _ => ()
      }
      li += 1
    }
    if (contentLength < 0) return None
    val payloadStart = split + 4
    // compare against the REMAINING bytes: `payloadStart + contentLength`
    // would overflow Long for a hostile huge Content-Length, slip past the
    // bound, and turn contentLength.toInt negative inside copyOfRange
    if (contentLength > (bytes.length - payloadStart).toLong) return None // truncated
    val after = payloadStart + contentLength.toInt
    // tolerate exactly the spec separator (or nothing) after the payload
    val rest = bytes.length - after
    val sepOk = rest == 0 ||
      (rest == 4 && bytes(after) == '\r' && bytes(after + 1) == '\n' &&
        bytes(after + 2) == '\r' && bytes(after + 3) == '\n') ||
      (rest == 2 && bytes(after) == '\r' && bytes(after + 1) == '\n')
    if (!sepOk) return None
    val payload = java.util.Arrays.copyOfRange(bytes, payloadStart, after)
    Some(WarcRecord(version, warcType, targetUri, date, recordId, contentType,
      contentLength, n, payload))
  }

  final case class WarcRow(shard_id: Long, member_idx: Long, ok: Long,
                           warc_type: Option[String], target_uri: Option[String],
                           content_type: Option[String],
                           content_length: Option[Long], n_headers: Option[Long],
                           md5_hex: Option[String])

  /** The ONE shard walk both record readers share (the member-failure
    * taxonomy must never drift between them): per shard, member split via
    * the RFC 1952 walk, then [[parseWarcRecord]] per member. A shard
    * whose gzip framing fails yields a single (−1, None); a member whose
    * record is malformed yields (idx, None); good records (idx, Some). */
  private def walkShard(payload: Array[Byte]): Iterator[(Long, Option[WarcRecord])] = {
    // codec sniff: a zstd data frame (28 B5 2F FD LE) or a leading
    // skippable frame (5x 2A 4D 18 — where .warc.zst parks its
    // dictionary) routes to the RFC 8878 walk; everything else takes
    // the RFC 1952 gzip path as before (SURVEY §7.4 #7, lifted r17)
    val zstd = payload != null && payload.length >= 4 &&
      (((payload(0) & 0xff) == 0x28 && (payload(1) & 0xff) == 0xb5 &&
        (payload(2) & 0xff) == 0x2f && (payload(3) & 0xff) == 0xfd) ||
       ((payload(0) & 0xf0) == 0x50 && (payload(1) & 0xff) == 0x2a &&
        (payload(2) & 0xff) == 0x4d && (payload(3) & 0xff) == 0x18))
    val split =
      if (zstd) Compressed.zstdMemberSplit(payload).map(_.map(_.data))
      else Compressed.gunzipMemberSplit(payload).map(_.map(_.data))
    split match {
      case None => Iterator.single((-1L, None))
      case Some(members) => members.iterator.zipWithIndex.map {
        case (data, i) => (i.toLong, parseWarcRecord(data))
      }
    }
  }

  /** Shard payloads → one row per WARC record with the typed header
    * fields. md5 is of the record PAYLOAD — the losslessness hook the
    * oracle replays from the source text without seeing a WARC byte.
    * Error taxonomy per [[walkShard]]: framing failure = one ok=0 row at
    * member_idx −1; a malformed member = its own ok=0 row at its index. */
  def warcRecordFeatures(assets: DataFrame): Dataset[WarcRow] = {
    val enc = Encoders.product[WarcRow]
    Spread.toCores(assets) // CPU-heavy decode leg: never pin to 1 core
      .select(col("asset_id").cast(LongType), col("payload").cast(BinaryType))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, payload) =>
          walkShard(payload).map {
            case (i, Some(r)) =>
              md.reset()
              val hex = md.digest(r.payload).map("%02x".format(_)).mkString
              WarcRow(id, i, 1L, r.warcType, r.targetUri, r.contentType,
                Some(r.contentLength), Some(r.nHeaders), Some(hex))
            case (i, None) =>
              WarcRow(id, i, 0L, None, None, None, None, None, None)
          }
        }
      }(enc)
  }

  final case class WarcTextRow(shard_id: Long, member_idx: Long, ok: Long,
                               target_uri: Option[String], text: Option[String])

  /** Shard payloads → records with their payload DECODED as UTF-8 text —
    * the handoff row the downstream text stages ([[Html.htmlProfile]],
    * [[TextAnalysis]]) consume directly. Same [[walkShard]] error
    * taxonomy as [[warcRecordFeatures]]. */
  def warcTextRecords(assets: DataFrame): Dataset[WarcTextRow] = {
    val enc = Encoders.product[WarcTextRow]
    Spread.toCores(assets) // CPU-heavy decode leg: never pin to 1 core
      .select(col("asset_id").cast(LongType), col("payload").cast(BinaryType))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          walkShard(payload).map {
            case (i, Some(r)) =>
              WarcTextRow(id, i, 1L, r.targetUri, Some(new String(r.payload, Utf8)))
            case (i, None) => WarcTextRow(id, i, 0L, None, None)
          }
        }
      }(enc)
  }

  final case class WarcCharsetRow(shard_id: Long, member_idx: Long, ok: Long,
                                  target_uri: Option[String],
                                  charset: Option[String],
                                  charset_source: Option[String],
                                  decode_ok: Option[Long],
                                  text: Option[String])

  /** [[warcTextRecords]]'s charset-AWARE sibling — the transcoding step
    * real pipelines run before language-ID and main-content extraction
    * (~10-20% of crawl bodies are legacy-encoded; a UTF-8-only decode
    * U+FFFD-shreds exactly the characters those stages key on). Per
    * record: [[Charsets.detect]] over the payload + the record's
    * Content-Type header (BOM ≻ charset param ≻ `<meta charset>`
    * prescan ≻ UTF-8 default), then a STRICT decode —
    * `decode_ok = 1` means every byte round-tripped; on rejection the
    * row keeps corpus membership with the byte-preserving ISO-8859-1
    * text and the detected-but-failed charset name (the
    * [[Charsets.transcode]] contract). The downstream text stages
    * ([[TextAnalysis]] langid, [[Html.mainContent]]) consume `text`
    * unchanged — transcoding is a drop-in replacement for the UTF-8
    * fast path, same [[walkShard]] taxonomy, map-only, no shuffle. */
  def warcTranscodedRecords(assets: DataFrame): Dataset[WarcCharsetRow] = {
    val enc = Encoders.product[WarcCharsetRow]
    Spread.toCores(assets) // CPU-heavy decode leg: never pin to 1 core
      .select(col("asset_id").cast(LongType), col("payload").cast(BinaryType))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          walkShard(payload).map {
            case (i, Some(r)) =>
              val t = Charsets.transcode(r.payload, r.contentType)
              WarcCharsetRow(id, i, 1L, r.targetUri, Some(t.charset),
                Some(t.source), Some(t.decodeOk), Some(t.text))
            case (i, None) =>
              WarcCharsetRow(id, i, 0L, None, None, None, None, None)
          }
        }
      }(enc)
  }

  /** Mixed-encoding WET fixture (closed-form bodies, the q270
    * convention): per doc, one conversion record whose body bytes and
    * Content-Type rotate through the five detection paths by
    * floorMod(id, 5) — (0) UTF-8 with a header charset param, (1)
    * windows-1252 with a header param (curly quotes + the € at 0x80),
    * (2) ISO-8859-1 declared ONLY by `<meta charset>`, (3) UTF-8
    * declared ONLY by its BOM, (4) a LYING header (claims utf-8, body
    * is windows-1252 with a bare 0x80 — an invalid UTF-8 start byte),
    * exercising the strict-decode failure + ISO-8859-1 fallback. */
  def synthWarcCharsetShards(docs: DataFrame, idCol: String,
                             shardSize: Int = 8): DataFrame = {
    require(shardSize >= 1, "shardSize must be positive")
    val grouped = Spread.toCores(docs)
      .select(expr(s"(CAST($idCol AS BIGINT) - pmod(CAST($idCol AS BIGINT), $shardSize)) DIV $shardSize").as("_shard"),
        col(idCol).cast(LongType).as("_id"))
      .groupBy(col("_shard"))
      .agg(sort_array(collect_list(col("_id"))).as("_ids"))
    val rows = grouped
      .as(Encoders.product[(Long, Seq[Long])])
      .mapPartitions { it =>
        // Charset instances are NOT java-serializable — resolve per task
        val W1252 = java.nio.charset.Charset.forName("windows-1252")
        val L1 = java.nio.charset.StandardCharsets.ISO_8859_1
        it.map { case (shard, ids) =>
          val bos = new java.io.ByteArrayOutputStream()
          ids.foreach { id =>
            val (ct, body) = Math.floorMod(id, 5L).toInt match {
              case 0 => ("text/plain; charset=utf-8",
                s"Café numéro $id résumé".getBytes(Utf8))
              case 1 => ("text/html; charset=windows-1252",
                (s"Smart “quotes” cost €" +
                  Math.floorMod(id, 97L)).getBytes(W1252))
              case 2 => ("text/html",
                (s"<html><head><meta charset=\"ISO-8859-1\"></head>" +
                  s"<body>Année $id première</body></html>").getBytes(L1))
              case 3 => ("text/plain",
                Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
                  s"Unicode ünïcödé body $id".getBytes(Utf8))
              case _ => ("text/plain; charset=utf-8", // LYING header
                s"Lying € header $id".getBytes(W1252))
            }
            val rec = buildRecord(
              uri = s"http://example.org/doc/$id",
              date = "2024-01-01T00:00:00Z",
              recordId = f"00000000-0000-0000-0003-${id}%012d",
              contentType = ct, body = body)
            val m = Compressed.gzipBytes(rec)
            bos.write(m, 0, m.length)
          }
          (shard, bos.toByteArray)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("asset_id", "payload")
    Multimodal.toAssets(rows, "asset_id", "payload", "application/warc")
  }

  // ---------------------------------------------------------------------
  // HTTP envelope of request/response records — Common Crawl WARC proper
  // (`.warc.gz`, not WET): a `response` record's payload is a FULL HTTP
  // message (status line, headers, blank line, entity body). The typed
  // fields a curation pipeline keys on — status code, served Content-Type
  // — live in that envelope, not in the WARC headers.
  // ---------------------------------------------------------------------

  final case class HttpEnvelope(status: Long, contentType: Option[String],
                                body: Array[Byte])

  /** Split one HTTP RESPONSE message into (status, Content-Type, body).
    * Strict-but-total: None on a missing CRLFCRLF split, a status line
    * that is not `HTTP/<v> <3-digit code> ...`, or a malformed header
    * line. Header names are case-insensitive (RFC 9110); the body is the
    * byte remainder — the WARC record's Content-Length already bounded
    * the whole message, so no HTTP Content-Length re-validation here
    * (truncated-body detection belongs to the record layer). */
  def parseHttpResponse(payload: Array[Byte]): Option[HttpEnvelope] = {
    if (payload == null || payload.length < 12) return None
    var split = -1
    var i = 0
    while (split < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') split = i
      i += 1
    }
    // a headers-only message (no body) may end with a single CRLF
    val headEnd = if (split >= 0) split
      else if (payload.length >= 2 && payload(payload.length - 2) == '\r' &&
               payload(payload.length - 1) == '\n') payload.length - 2
      else return None
    val head = new String(payload, 0, headEnd, Utf8)
    val lines = head.split("\r\n", -1)
    val status = lines(0) match {
      case s if s.startsWith("HTTP/") =>
        val parts = s.split(" ", 3)
        if (parts.length < 2 || !parts(1).matches("[0-9]{3}")) return None
        parts(1).toLong
      case _ => return None
    }
    var contentType: Option[String] = None
    var li = 1
    while (li < lines.length) {
      val line = lines(li)
      val c = line.indexOf(':')
      if (c <= 0) return None
      if (line.substring(0, c).trim.toLowerCase == "content-type")
        contentType = Some(line.substring(c + 1).trim)
      li += 1
    }
    val body =
      if (split >= 0)
        java.util.Arrays.copyOfRange(payload, split + 4, payload.length)
      else Array.empty[Byte]
    Some(HttpEnvelope(status, contentType, body))
  }

  final case class WarcHttpRow(shard_id: Long, member_idx: Long, ok: Long,
                               warc_type: Option[String],
                               target_uri: Option[String],
                               http_status: Option[Long],
                               http_content_type: Option[String],
                               body_bytes: Option[Long],
                               md5_hex: Option[String])

  /** Shard payloads → one row per member with the HTTP envelope of
    * `response` records split out: status code, served Content-Type,
    * entity-body length and md5. Non-response records (request,
    * conversion, metadata) stay visible as ok=1 rows with NULL http
    * fields; a response whose envelope fails to parse is ok=0 WITH its
    * warc_type/target_uri (envelope failure ≠ record failure); the
    * [[walkShard]] framing taxonomy is unchanged below that. */
  def warcResponseRecords(assets: DataFrame): Dataset[WarcHttpRow] = {
    val enc = Encoders.product[WarcHttpRow]
    Spread.toCores(assets) // CPU-heavy decode leg: never pin to 1 core
      .select(col("asset_id").cast(LongType), col("payload").cast(BinaryType))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, payload) =>
          walkShard(payload).map {
            case (i, Some(r)) if r.warcType.contains("response") =>
              parseHttpResponse(r.payload) match {
                case Some(h) =>
                  md.reset()
                  val hex = md.digest(h.body).map("%02x".format(_)).mkString
                  WarcHttpRow(id, i, 1L, r.warcType, r.targetUri,
                    Some(h.status), h.contentType,
                    Some(h.body.length.toLong), Some(hex))
                case None =>
                  WarcHttpRow(id, i, 0L, r.warcType, r.targetUri,
                    None, None, None, None)
              }
            case (i, Some(r)) =>
              WarcHttpRow(id, i, 1L, r.warcType, r.targetUri,
                None, None, None, None)
            case (i, None) =>
              WarcHttpRow(id, i, 0L, None, None, None, None, None, None)
          }
        }
      }(enc)
  }

  final case class WarcHttpCharsetRow(shard_id: Long, member_idx: Long,
                                      ok: Long, target_uri: Option[String],
                                      http_status: Option[Long],
                                      charset: Option[String],
                                      charset_source: Option[String],
                                      decode_ok: Option[Long],
                                      text: Option[String])

  /** [[warcTranscodedRecords]]'s HTTP-ENVELOPE sibling — the `.warc.gz`
    * proper path (request/response pairs), where the charset parameter
    * usually lives: per `response` record, split the HTTP message
    * ([[parseHttpResponse]]) and transcode the ENTITY BODY with the
    * envelope's served Content-Type ([[Charsets.transcode]] — BOM ≻
    * header param ≻ meta prescan ≻ UTF-8). Non-response records stay
    * visible as ok=1 rows with NULL http/text fields; an
    * envelope-parse failure is ok=0 WITH its target_uri (the
    * [[warcResponseRecords]] taxonomy, unchanged below that). */
  def warcHttpTranscodedRecords(assets: DataFrame): Dataset[WarcHttpCharsetRow] = {
    val enc = Encoders.product[WarcHttpCharsetRow]
    Spread.toCores(assets) // CPU-heavy decode leg: never pin to 1 core
      .select(col("asset_id").cast(LongType), col("payload").cast(BinaryType))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          walkShard(payload).map {
            case (i, Some(r)) if r.warcType.contains("response") =>
              parseHttpResponse(r.payload) match {
                case Some(h) =>
                  val t = Charsets.transcode(h.body, h.contentType)
                  WarcHttpCharsetRow(id, i, 1L, r.targetUri, Some(h.status),
                    Some(t.charset), Some(t.source), Some(t.decodeOk),
                    Some(t.text))
                case None =>
                  WarcHttpCharsetRow(id, i, 0L, r.targetUri, None, None,
                    None, None, None)
              }
            case (i, Some(r)) =>
              WarcHttpCharsetRow(id, i, 1L, r.targetUri, None, None, None,
                None, None)
            case (i, None) =>
              WarcHttpCharsetRow(id, i, 0L, None, None, None, None, None, None)
          }
        }
      }(enc)
  }

  /** Mixed-encoding `.warc.gz`-proper fixture: the [[synthWarcCharsetShards]]
    * bodies and Content-Types wrapped in FULL HTTP response envelopes
    * (status rotates 200/404 on every 13th doc, the
    * [[synthWarcResponseShards]] convention) — one response record per
    * doc, each its own gzip member. */
  def synthWarcHttpCharsetShards(docs: DataFrame, idCol: String,
                                 shardSize: Int = 8): DataFrame = {
    require(shardSize >= 1, "shardSize must be positive")
    val grouped = Spread.toCores(docs)
      .select(expr(s"(CAST($idCol AS BIGINT) - pmod(CAST($idCol AS BIGINT), $shardSize)) DIV $shardSize").as("_shard"),
        col(idCol).cast(LongType).as("_id"))
      .groupBy(col("_shard"))
      .agg(sort_array(collect_list(col("_id"))).as("_ids"))
    val rows = grouped
      .as(Encoders.product[(Long, Seq[Long])])
      .mapPartitions { it =>
        // Charset instances are NOT java-serializable — resolve per task
        val W1252 = java.nio.charset.Charset.forName("windows-1252")
        val L1 = java.nio.charset.StandardCharsets.ISO_8859_1
        it.map { case (shard, ids) =>
          val bos = new java.io.ByteArrayOutputStream()
          ids.foreach { id =>
            val (ct, body) = Math.floorMod(id, 5L).toInt match {
              case 0 => ("text/plain; charset=utf-8",
                s"Café numéro $id résumé".getBytes(Utf8))
              case 1 => ("text/html; charset=windows-1252",
                (s"Smart “quotes” cost €" +
                  Math.floorMod(id, 97L)).getBytes(W1252))
              case 2 => ("text/html",
                (s"<html><head><meta charset=\"ISO-8859-1\"></head>" +
                  s"<body>Année $id première</body></html>").getBytes(L1))
              case 3 => ("text/plain",
                Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
                  s"Unicode ünïcödé body $id".getBytes(Utf8))
              case _ => ("text/plain; charset=utf-8", // LYING header
                s"Lying € header $id".getBytes(W1252))
            }
            val (status, reason) =
              if (Math.floorMod(id, 13L) == 0L) (404, "Not Found") else (200, "OK")
            val head = (s"HTTP/1.1 $status $reason\r\n" +
              s"Content-Type: $ct\r\nServer: graft/1.0\r\n\r\n").getBytes(Utf8)
            val msg = new Array[Byte](head.length + body.length)
            System.arraycopy(head, 0, msg, 0, head.length)
            System.arraycopy(body, 0, msg, head.length, body.length)
            val rec = buildRecord(
              uri = s"http://example.org/doc/$id",
              date = "2024-01-01T00:00:00Z",
              recordId = f"00000000-0000-0000-0004-${id}%012d",
              contentType = "application/http; msgtype=response",
              body = msg, warcType = "response")
            val m = Compressed.gzipBytes(rec)
            bos.write(m, 0, m.length)
          }
          (shard, bos.toByteArray)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("asset_id", "payload")
    Multimodal.toAssets(rows, "asset_id", "payload", "application/warc")
  }

  /** Build the bytes of one WET-style conversion record (used by the
    * fixture and the spec's golden tests). */
  def buildRecord(uri: String, date: String, recordId: String,
                  contentType: String, body: Array[Byte],
                  warcType: String = "conversion"): Array[Byte] = {
    val head = (s"WARC/1.0\r\n" +
      s"WARC-Type: $warcType\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Record-ID: <urn:uuid:$recordId>\r\n" +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n" +
      "\r\n").getBytes(Utf8) // UTF-8 header encode, the decoder's mirror
    val out = new Array[Byte](head.length + body.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(body, 0, out, head.length, body.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** WET-shard fixture: documents grouped `shardSize` per shard, each
    * wrapped as a conversion record (URI/record-id derived from doc_id),
    * gzipped as its OWN member, members concatenated in doc_id order —
    * byte-faithful to how Common Crawl lays out `.wet.gz`. */
  def synthWarcShards(docs: DataFrame, idCol: String, textCol: String,
                      shardSize: Int = 8,
                      contentType: String = "text/plain",
                      codec: String = "gzip"): DataFrame = {
    require(shardSize >= 1, "shardSize must be positive")
    // FLOOR division, not Spark's truncate-toward-zero DIV: the oracle
    // replays this key as DuckDB `//` (floor), and the two disagree for
    // negative ids. `x - pmod(x, n)` is exactly divisible by n, so the
    // DIV afterwards is exact division — integer-safe at any magnitude.
    // input-side spread parallelizes the scan/projection; the ENCODE
    // mapPartitions below runs at the groupBy's post-shuffle partition
    // count — spark.sql.shuffle.partitions bounded by AQE's parallelism-
    // first coalescing floor — which the spread guard deliberately does
    // not touch (probing a shuffle-fed frame would materialize its stages)
    val grouped = Spread.toCores(docs)
      .filter(col(textCol).isNotNull)
      .select(expr(s"(CAST($idCol AS BIGINT) - pmod(CAST($idCol AS BIGINT), $shardSize)) DIV $shardSize").as("_shard"),
        col(idCol).cast(LongType).as("_id"), col(textCol).as("_text"))
      .groupBy(col("_shard"))
      .agg(sort_array(collect_list(struct(col("_id"), col("_text")))).as("_docs"))
    val rows = grouped
      .select(col("_shard"), col("_docs._id").as("_ids"), col("_docs._text").as("_texts"))
      .as(Encoders.product[(Long, Seq[Long], Seq[String])])
      .mapPartitions { it =>
        it.map { case (shard, ids, texts) =>
          val bos = new java.io.ByteArrayOutputStream()
          ids.lazyZip(texts).foreach { (id, text) =>
            val rec = buildRecord(
              uri = s"http://example.org/doc/$id",
              date = "2024-01-01T00:00:00Z",
              recordId = f"00000000-0000-0000-0000-${id}%012d",
              contentType = contentType,
              body = text.getBytes(Utf8))
            val m = Compressed.compressAs(codec, rec)
            bos.write(m, 0, m.length)
          }
          (shard, bos.toByteArray)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("asset_id", "payload")
    Multimodal.toAssets(rows, "asset_id", "payload", "application/warc")
  }

  /** Request/response-pair fixture — the actual Common Crawl `.warc.gz`
    * layout (WARC proper, not WET): per document, a `request` record with
    * an HTTP request envelope, then a `response` record whose payload is
    * a FULL HTTP response message (status line + headers + entity body =
    * the document text). Status and served Content-Type vary by id
    * arithmetic (floorMod — negative ids are in-contract like q251):
    * every 13th doc is a 404, mime rotates html/plain/json. Each record
    * is its own gzip member; 2·shardSize members per shard, doc order. */
  def synthWarcResponseShards(docs: DataFrame, idCol: String, textCol: String,
                              shardSize: Int = 8): DataFrame = {
    require(shardSize >= 1, "shardSize must be positive")
    // input-side spread parallelizes the scan/projection; the ENCODE
    // mapPartitions below runs at the groupBy's post-shuffle partition
    // count — spark.sql.shuffle.partitions bounded by AQE's parallelism-
    // first coalescing floor — which the spread guard deliberately does
    // not touch (probing a shuffle-fed frame would materialize its stages)
    val grouped = Spread.toCores(docs)
      .filter(col(textCol).isNotNull)
      .select(expr(s"(CAST($idCol AS BIGINT) - pmod(CAST($idCol AS BIGINT), $shardSize)) DIV $shardSize").as("_shard"),
        col(idCol).cast(LongType).as("_id"), col(textCol).as("_text"))
      .groupBy(col("_shard"))
      .agg(sort_array(collect_list(struct(col("_id"), col("_text")))).as("_docs"))
    val rows = grouped
      .select(col("_shard"), col("_docs._id").as("_ids"), col("_docs._text").as("_texts"))
      .as(Encoders.product[(Long, Seq[Long], Seq[String])])
      .mapPartitions { it =>
        it.map { case (shard, ids, texts) =>
          val bos = new java.io.ByteArrayOutputStream()
          ids.lazyZip(texts).foreach { (id, text) =>
            val uri = s"http://example.org/doc/$id"
            val date = "2024-01-01T00:00:00Z"
            val reqBody = (s"GET /doc/$id HTTP/1.1\r\nHost: example.org\r\n" +
              "User-Agent: graft/1.0\r\n").getBytes(Utf8)
            val req = buildRecord(uri, date,
              recordId = f"00000000-0000-0000-0001-${id}%012d",
              contentType = "application/http; msgtype=request",
              body = reqBody, warcType = "request")
            val (status, reason) =
              if (Math.floorMod(id, 13L) == 0L) (404, "Not Found") else (200, "OK")
            val mime = Math.floorMod(id, 3L).toInt match {
              case 0 => "text/html; charset=utf-8"
              case 1 => "text/plain"
              case _ => "application/json"
            }
            val textBytes = text.getBytes(Utf8)
            val respHead = (s"HTTP/1.1 $status $reason\r\n" +
              s"Content-Type: $mime\r\nServer: graft/1.0\r\n\r\n").getBytes(Utf8)
            val respBody = new Array[Byte](respHead.length + textBytes.length)
            System.arraycopy(respHead, 0, respBody, 0, respHead.length)
            System.arraycopy(textBytes, 0, respBody, respHead.length, textBytes.length)
            val resp = buildRecord(uri, date,
              recordId = f"00000000-0000-0000-0002-${id}%012d",
              contentType = "application/http; msgtype=response",
              body = respBody, warcType = "response")
            Seq(req, resp).foreach { rec =>
              val m = Compressed.gzipBytes(rec)
              bos.write(m, 0, m.length)
            }
          }
          (shard, bos.toByteArray)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("asset_id", "payload")
    Multimodal.toAssets(rows, "asset_id", "payload", "application/warc")
  }
}
