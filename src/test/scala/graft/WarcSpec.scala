package graft

import java.nio.charset.StandardCharsets.US_ASCII
import graft.operators.{Compressed, Warc}

/** WARC record parsing: golden bytes, spec-separator tolerance, the
  * malformed-record taxonomy, and per-member error isolation inside a
  * multi-record shard. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private val body = "hello warc world".getBytes(US_ASCII)
  private def golden: Array[Byte] = Warc.buildRecord(
    "http://example.org/doc/7", "2024-01-01T00:00:00Z",
    "00000000-0000-0000-0000-000000000007", "text/plain", body)

  test("golden record parses field-for-field") {
    val r = Warc.parseWarcRecord(golden).get
    assert(r.version === "WARC/1.0")
    assert(r.warcType === Some("conversion"))
    assert(r.targetUri === Some("http://example.org/doc/7"))
    assert(r.date === Some("2024-01-01T00:00:00Z"))
    assert(r.recordId === Some("<urn:uuid:00000000-0000-0000-0000-000000000007>"))
    assert(r.contentType === Some("text/plain"))
    assert(r.contentLength === body.length.toLong)
    assert(r.nHeaders === 6L)
    assert(r.payload.toSeq === body.toSeq)
  }

  test("separator tolerance: none, CRLF, CRLFCRLF ok; anything else rejected") {
    val g = golden
    assert(Warc.parseWarcRecord(g.dropRight(4)).isDefined, "bare payload end")
    assert(Warc.parseWarcRecord(g.dropRight(2)).isDefined, "single CRLF")
    assert(Warc.parseWarcRecord(g).isDefined, "spec CRLFCRLF")
    assert(Warc.parseWarcRecord(g ++ "x".getBytes(US_ASCII)).isEmpty,
      "trailing garbage after the separator")
    assert(Warc.parseWarcRecord(g.dropRight(1)).isEmpty, "half a separator")
  }

  test("header names are case-insensitive; values trim one optional space") {
    val rec = ("WARC/1.1\r\nwarc-type:response\r\nCONTENT-LENGTH: 3\r\n" +
      "X-Custom: kept-but-uncounted-nowhere\r\n\r\nabc").getBytes(US_ASCII)
    val r = Warc.parseWarcRecord(rec).get
    assert(r.version === "WARC/1.1")
    assert(r.warcType === Some("response"))
    assert(r.contentLength === 3L)
    assert(r.nHeaders === 3L, "unknown headers still count")
    assert(new String(r.payload, US_ASCII) === "abc")
  }

  test("malformed taxonomy: each defect is None, never a throw") {
    def rec(s: String) = Warc.parseWarcRecord(s.getBytes(US_ASCII))
    assert(rec("HTTP/1.1 200 OK\r\nContent-Length: 0\r\n\r\n").isEmpty, "not WARC")
    assert(rec("WARC/1.0\r\nWARC-Type: x\r\n\r\n").isEmpty, "no Content-Length")
    assert(rec("WARC/1.0\r\nContent-Length: twelve\r\n\r\n").isEmpty, "unparsable length")
    assert(rec("WARC/1.0\r\nContent-Length: 100\r\n\r\nshort").isEmpty, "truncated payload")
    assert(rec("WARC/1.0\r\nbroken header line\r\nContent-Length: 0\r\n\r\n").isEmpty,
      "header without a colon")
    assert(rec("WARC/1.0\r\nContent-Length: -1\r\n\r\n").isEmpty, "negative length")
    // a near-Long.Max length must not overflow the truncation bound and
    // reach copyOfRange with a negative end (the never-throws contract)
    assert(rec("WARC/1.0\r\nContent-Length: 9223372036854775804\r\n\r\n").isEmpty,
      "huge length rejects instead of overflowing")
    assert(Warc.parseWarcRecord(null).isEmpty)
    assert(Warc.parseWarcRecord("WARC/1.0 no blank line".getBytes(US_ASCII)).isEmpty)
  }

  test("shard split isolates the bad member; framing failure is one shard row") {
    val good = Compressed.gzipBytes(golden)
    val bad = Compressed.gzipBytes("not a warc record at all".getBytes(US_ASCII))
    val shard = good ++ bad ++ good
    val rows = Warc.warcRecordFeatures(
        Seq((5L, shard)).toDF("asset_id", "payload"))
      .collect().sortBy(_.member_idx)
    assert(rows.map(_.ok).toSeq === Seq(1L, 0L, 1L))
    assert(rows(0).md5_hex === rows(2).md5_hex)
    assert(rows(1).target_uri.isEmpty)
    // broken gzip framing → a single ok=0 row at member_idx -1
    val broken = Warc.warcRecordFeatures(
        Seq((9L, "junk".getBytes(US_ASCII))).toDF("asset_id", "payload"))
      .collect()
    assert(broken.length === 1 && broken.head.ok === 0L &&
      broken.head.member_idx === -1L)
  }

  test("StreamingCrawl: shard stream lands extracted docs + dead letters, exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    import java.nio.file.Files
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.plans.BucketedMergeWriter
    val store = new BucketedMergeWriter(spark,
      Files.createTempDirectory("graft-crawl").toString, nBuckets = 4)
    val ckpt = Files.createTempDirectory("graft-crawl-ckpt").toString

    def shard(id: Long, texts: Seq[(Long, String)]): (Long, Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      texts.foreach { case (docId, t) =>
        val rec = Warc.buildRecord(s"http://example.org/doc/$docId",
          "2024-01-01T00:00:00Z", f"00000000-0000-0000-0000-$docId%012d",
          "text/html", s"<html><body><p>$t</p></body></html>".getBytes("UTF-8"))
        val m = Compressed.gzipBytes(rec); bos.write(m, 0, m.length)
      }
      (id, bos.toByteArray)
    }
    val in = MemoryStream[(Long, Array[Byte])]
    val stream = in.toDF().toDF("asset_id", "payload")
    def drain(ck: String = ckpt): Unit = {
      val q = graft.streaming.StreamingCrawl.start(stream, store,
        "crawl_docs", "crawl_dead", ck)
      q.awaitTermination()
    }
    in.addData(shard(0L, Seq(1L -> "alpha beta", 2L -> "gamma")))
    // shard 1: a good record, then raw junk gzipped (parses as gzip, fails WARC)
    val junk = Compressed.gzipBytes("NOT A RECORD".getBytes("UTF-8"))
    val (gid, good) = shard(1L, Seq(3L -> "delta"))
    in.addData((gid, good ++ junk))
    drain()
    val docs = store.read("crawl_docs").collect()
      .map(r => (r.getAs[Long]("shard_id"), r.getAs[Long]("member_idx"),
        r.getAs[String]("text"))).toSet
    assert(docs === Set((0L, 0L, "alpha beta"), (0L, 1L, "gamma"),
      (1L, 0L, "delta")), s"extracted docs: $docs")
    assert(store.read("crawl_dead").collect().map(r =>
      (r.getAs[Long]("shard_id"), r.getAs[Long]("member_idx"))).toSet
      === Set((1L, 1L)), "the junk member dead-letters under its index")

    // replay shard 1 from a fresh checkpoint: keyed merges absorb it
    val in2 = MemoryStream[(Long, Array[Byte])]
    in2.addData((gid, good ++ junk))
    val q2 = graft.streaming.StreamingCrawl.start(
      in2.toDF().toDF("asset_id", "payload"), store, "crawl_docs",
      "crawl_dead", Files.createTempDirectory("graft-crawl-ckpt2").toString)
    q2.awaitTermination()
    assert(store.read("crawl_docs").count() === 3L &&
      store.read("crawl_dead").count() === 1L,
      "replayed shard must not duplicate rows")
  }

  test("UTF-8 header values survive the parse byte-exactly (WARC spec allows them)") {
    val uri = "http://example.org/straße/日本語?q=café"
    val r = Warc.parseWarcRecord(Warc.buildRecord(uri, "2024-01-01T00:00:00Z",
      "00000000-0000-0000-0000-000000000001", "text/plain",
      body)).get
    assert(r.targetUri === Some(uri),
      "an ASCII decode would have U+FFFD-replaced every multi-byte char")
  }

  test("negative doc ids shard by FLOOR division (the oracle's // semantics)") {
    val docs = Seq((-1L, "a"), (-8L, "b"), (-9L, "c"), (7L, "d"))
      .toDF("doc_id", "text")
    val rows = Warc.warcRecordFeatures(
        Warc.synthWarcShards(docs, "doc_id", "text", shardSize = 8))
      .collect()
    val byDoc = rows.map(r => r.target_uri.get.split('/').last.toLong -> r.shard_id).toMap
    // floor(-1/8) = -1, floor(-8/8) = -1, floor(-9/8) = -2, floor(7/8) = 0;
    // truncate-toward-zero DIV would have put -1 in shard 0 and -9 in -1
    assert(byDoc === Map(-1L -> -1L, -8L -> -1L, -9L -> -2L, 7L -> 0L))
  }

  test("HTTP envelope parse: status, case-insensitive Content-Type, body split") {
    val msg = ("HTTP/1.1 200 OK\r\ncontent-TYPE: text/html; charset=utf-8\r\n" +
      "Server: x\r\n\r\n<html>body</html>").getBytes(US_ASCII)
    val h = Warc.parseHttpResponse(msg).get
    assert(h.status === 200L)
    assert(h.contentType === Some("text/html; charset=utf-8"))
    assert(new String(h.body, US_ASCII) === "<html>body</html>")
    // headers-only message (no body, single trailing CRLF)
    val noBody = Warc.parseHttpResponse(
      "HTTP/1.1 304 Not Modified\r\nServer: x\r\n".getBytes(US_ASCII)).get
    assert(noBody.status === 304L && noBody.body.isEmpty)
    // malformed taxonomy: None, never a throw
    assert(Warc.parseHttpResponse("GET / HTTP/1.1\r\n\r\n".getBytes(US_ASCII)).isEmpty,
      "a request line is not a response")
    assert(Warc.parseHttpResponse("HTTP/1.1 2xx Bad\r\n\r\n".getBytes(US_ASCII)).isEmpty)
    assert(Warc.parseHttpResponse("no crlf at all".getBytes(US_ASCII)).isEmpty)
    assert(Warc.parseHttpResponse(null).isEmpty)
  }

  test("request/response fixture round-trips: pairs, statuses, body md5") {
    val docs = Seq((0L, "alpha"), (1L, "beta"), (13L, "gamma"), (3L, "delta"))
      .toDF("doc_id", "text")
    val rows = Warc.warcResponseRecords(
        Warc.synthWarcResponseShards(docs, "doc_id", "text", shardSize = 8))
      .collect().sortBy(r => (r.shard_id, r.member_idx))
    assert(rows.length === 8, "two members per document")
    assert(rows.forall(_.ok === 1L))
    val reqs = rows.filter(_.warc_type.contains("request"))
    assert(reqs.length === 4 && reqs.forall(r =>
      r.http_status.isEmpty && r.md5_hex.isEmpty),
      "request rows stay visible with NULL http fields")
    val resp = rows.filter(_.warc_type.contains("response"))
      .map(r => r.target_uri.get.split('/').last.toLong -> r).toMap
    assert(resp(0L).http_status === Some(404L), "id 0 is a 13-multiple")
    assert(resp(13L).http_status === Some(404L))
    assert(resp(1L).http_status === Some(200L))
    assert(resp(0L).http_content_type === Some("text/html; charset=utf-8"))
    assert(resp(1L).http_content_type === Some("text/plain"))
    assert(resp(3L).http_content_type === Some("text/html; charset=utf-8"))
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(resp(1L).md5_hex ===
      Some(md.digest("beta".getBytes("UTF-8")).map("%02x".format(_)).mkString),
      "entity-body md5 fingerprints the SOURCE text — envelope split is exact")
    assert(resp(1L).body_bytes === Some(4L))
  }

  test("fixture round-trip: every document comes back ok with its own URI") {
    val docs = Seq((0L, "alpha beta"), (1L, "gamma"), (9L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val rows = Warc.warcRecordFeatures(
        Warc.synthWarcShards(docs, "doc_id", "text", shardSize = 2))
      .collect().sortBy(r => (r.shard_id, r.member_idx))
    assert(rows.forall(_.ok === 1L))
    assert(rows.map(_.shard_id).toSeq === Seq(0L, 0L, 4L))
    assert(rows.map(_.target_uri.get).toSeq === Seq(
      "http://example.org/doc/0", "http://example.org/doc/1",
      "http://example.org/doc/9"))
    assert(rows.map(_.content_length.get).toSeq === Seq(10L, 5L, 18L))
  }
}
