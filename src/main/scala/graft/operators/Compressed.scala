package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}

/** Gzip-payload handling for text corpora — the shape every web-crawl
  * pipeline starts from (WARC/WET records, .jsonl.gz shards): documents
  * arrive as gzip members, and the first real operator is "inflate and
  * fingerprint". Pure JVM: `java.util.zip.GZIPInput/OutputStream` is the
  * real zlib DEFLATE, so — like [[MediaCodecs.decodePng]] — nothing here
  * is a stub.
  *
  * Decode is strict-but-total (None → ok=0 row, never throws), matching
  * the per-record error-channel philosophy of the reference's stream
  * consumer (`flink/stream_to_star.py:284-298`: drop the record, keep
  * the stream). A decompression BOMB guard caps the inflated size at
  * [[MaxInflated]] — a hostile 4 GB-of-zeros member is rejected, not
  * materialized (the guard every crawler-facing inflate needs).
  */
object Compressed {

  /** Per-payload inflate cap (64 MiB). Crawl-scale documents are far
    * smaller; anything bigger is a bomb or a mis-routed blob. */
  val MaxInflated: Int = 64 << 20

  def gzipBytes(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(data); gz.close()
    bos.toByteArray
  }

  /** Inflate one-or-more concatenated gzip members; None on bad magic,
    * truncation, CRC mismatch, trailing garbage, or the [[MaxInflated]]
    * bomb cap. Implemented over [[gunzipMemberSplit]]'s strict RFC 1952
    * walk: the JDK's GZIPInputStream SWALLOWS a corrupt second member
    * (its readTrailer treats a failed next-header read as end-of-stream),
    * silently returning partial data where this contract promises None —
    * and its byte counting avoids the Int overflow a
    * `bytes.length * 4` pre-size would hit on ≥ 512 MiB payloads. */
  def gunzipBytes(bytes: Array[Byte]): Option[Array[Byte]] =
    gunzipMemberSplit(bytes).map { members =>
      val total = members.map(_.data.length).sum
      val out = new Array[Byte](total)
      var off = 0
      members.foreach { m =>
        System.arraycopy(m.data, 0, out, off, m.data.length)
        off += m.data.length
      }
      out
    }

  final case class GzipTextRow(doc_id: Long, ok: Long, n_bytes: Option[Long],
                               md5_hex: Option[String])

  /** One gzip member inside a multi-member shard: where it starts in the
    * shard (`offset`), how many compressed bytes it spans (`compLen`),
    * and its inflated payload. */
  final case class GzipMember(offset: Long, compLen: Long, data: Array[Byte])

  /** Split a multi-member gzip shard into its members WITH byte
    * boundaries — the WARC/WET access path: real WET shards concatenate
    * one gzip member per record, and a reader that knows (offset,
    * compLen) can later fetch ONE record with a ranged read instead of
    * inflating the whole shard. [[gunzipBytes]] inflates the
    * concatenation but surfaces no boundaries; this walks the RFC 1952
    * framing itself: per member, the 10-byte header (+ FEXTRA/FNAME/
    * FCOMMENT/FHCRC extensions), a raw-DEFLATE body inflated with
    * `Inflater(nowrap)` whose `getBytesRead` marks the body end, then
    * the CRC32+ISIZE trailer — both VERIFIED. None on any malformed
    * framing, trailing garbage, CRC/length mismatch, or the
    * [[MaxInflated]] bomb cap summed ACROSS members; never throws. */
  def gunzipMemberSplit(bytes: Array[Byte]): Option[Seq[GzipMember]] = {
    if (bytes == null || bytes.length < 18) return None
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    val members = scala.collection.mutable.ArrayBuffer.empty[GzipMember]
    var pos = 0
    var totalInflated = 0L
    while (pos < bytes.length) {
      val start = pos
      if (pos + 10 > bytes.length) return None
      if ((bytes(pos) & 0xff) != 0x1f || (bytes(pos + 1) & 0xff) != 0x8b ||
          (bytes(pos + 2) & 0xff) != 8) return None   // magic + DEFLATE CM
      val flg = bytes(pos + 3) & 0xff
      if ((flg & 0xe0) != 0) return None               // reserved bits set
      pos += 10
      if ((flg & 4) != 0) {                            // FEXTRA
        if (pos + 2 > bytes.length) return None
        val xlen = le16(pos); pos += 2 + xlen
        if (pos > bytes.length) return None
      }
      var z = 0
      while (z < 2) {                                  // FNAME, FCOMMENT
        if ((flg & (if (z == 0) 8 else 16)) != 0) {
          while (pos < bytes.length && bytes(pos) != 0) pos += 1
          if (pos >= bytes.length) return None
          pos += 1                                     // the NUL
        }
        z += 1
      }
      if ((flg & 2) != 0) {                            // FHCRC
        pos += 2
        if (pos > bytes.length) return None
      }
      val infl = new java.util.zip.Inflater(true)      // raw DEFLATE body
      infl.setInput(bytes, pos, bytes.length - pos)
      val out = new java.io.ByteArrayOutputStream(8192)
      val crc = new java.util.zip.CRC32
      val buf = new Array[Byte](8192)
      var bodyLen = 0L
      try {
        while (!infl.finished()) {
          val n = infl.inflate(buf)
          if (n == 0 && !infl.finished()) return None  // truncated/FDICT
          crc.update(buf, 0, n)
          out.write(buf, 0, n)
          totalInflated += n
          if (totalInflated > MaxInflated) return None // bomb cap
        }
        bodyLen = infl.getBytesRead                    // before end() frees it
      } catch { case _: java.util.zip.DataFormatException => return None }
      finally infl.end()
      pos += bodyLen.toInt
      if (pos + 8 > bytes.length) return None
      if (le32(pos) != crc.getValue) return None       // CRC32 trailer
      if (le32(pos + 4) != (out.size() & 0xffffffffL)) return None // ISIZE
      pos += 8
      members += GzipMember(start.toLong, (pos - start).toLong, out.toByteArray)
    }
    if (members.isEmpty) None else Some(members.toSeq)
  }

  final case class GzipMemberRow(shard_id: Long, member_idx: Long, ok: Long,
                                 offset: Option[Long], comp_len: Option[Long],
                                 n_bytes: Option[Long], md5_hex: Option[String])

  /** Gzip fixture: each document's UTF-8 text through the REAL gzip
    * encoder → (asset_id, media_type, payload, n_bytes, checksum), the
    * [[Multimodal.toAssets]] envelope. */
  def synthGzipDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val rows = Spread.toCores(docs) // CPU-heavy encode leg
      .filter(col(textCol).isNotNull)
      .select(col(idCol).cast(LongType), col(textCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .mapPartitions { it =>
        it.map { case (id, text) =>
          (id, gzipBytes(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("asset_id", "payload")
    Multimodal.toAssets(rows, "asset_id", "payload", "application/gzip")
  }

  /** Multi-member shard fixture: documents grouped `shardSize` to a
    * shard (shard_id = doc_id DIV shardSize), each document gzipped as
    * its OWN member, members concatenated in ascending doc_id order —
    * the WET-shard layout. One (asset_id = shard_id, payload) row per
    * shard. The collect_list is per-shard (bounded by shardSize
    * documents), sorted by the struct's leading doc_id for a
    * deterministic layout under any partitioning. */
  def synthGzipShards(docs: DataFrame, idCol: String, textCol: String,
                      shardSize: Int = 8): DataFrame = {
    require(shardSize >= 1, "shardSize must be positive")
    // input-side spread parallelizes the scan/projection; the ENCODE
    // mapPartitions below runs at the groupBy's post-shuffle partition
    // count — spark.sql.shuffle.partitions bounded by AQE's parallelism-
    // first coalescing floor — which the spread guard deliberately does
    // not touch (probing a shuffle-fed frame would materialize its stages)
    val grouped = Spread.toCores(docs)
      .filter(col(textCol).isNotNull)
      .select(expr(s"CAST($idCol AS BIGINT) DIV $shardSize").as("_shard"),
        col(idCol).cast(LongType).as("_id"), col(textCol).as("_text"))
      .groupBy(col("_shard"))
      .agg(sort_array(collect_list(struct(col("_id"), col("_text")))).as("_docs"))
    val rows = grouped
      .select(col("_shard"), col("_docs._text").as("_texts"))
      .as(Encoders.product[(Long, Seq[String])])
      .mapPartitions { it =>
        it.map { case (shard, texts) =>
          val bos = new java.io.ByteArrayOutputStream()
          texts.foreach { t =>
            val m = gzipBytes(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            bos.write(m, 0, m.length)
          }
          (shard, bos.toByteArray)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("asset_id", "payload")
    Multimodal.toAssets(rows, "asset_id", "payload", "application/gzip")
  }

  /** Split each shard payload into members and fingerprint each member's
    * PLAINTEXT — one row per member with its BYTE BOUNDARIES (offset,
    * comp_len: the ranged-read coordinates) and (n_bytes, md5) of the
    * inflated text. A shard that fails [[gunzipMemberSplit]] yields one
    * ok=0 row with member_idx −1. The oracle replays n_bytes/md5 from
    * the source column per (shard, rank-in-shard) without seeing a gzip
    * byte; boundaries are proven by the re-slice round-trip in the
    * spec (each `[offset, offset+comp_len)` slice must inflate alone). */
  def gunzipMemberFeatures(assets: DataFrame): Dataset[GzipMemberRow] = {
    val enc = Encoders.product[GzipMemberRow]
    Spread.toCores(assets) // CPU-heavy decode leg: never pin to 1 core
      .select(col("asset_id").cast(LongType), col("payload").cast(BinaryType))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, payload) =>
          gunzipMemberSplit(payload) match {
            case Some(members) => members.iterator.zipWithIndex.map {
              case (m, i) =>
                md.reset()
                val hex = md.digest(m.data).map("%02x".format(_)).mkString
                GzipMemberRow(id, i.toLong, 1L, Some(m.offset), Some(m.compLen),
                  Some(m.data.length.toLong), Some(hex))
            }
            case None => Iterator.single(
              GzipMemberRow(id, -1L, 0L, None, None, None, None))
          }
        }
      }(enc)
  }

  // ------------------------------------------------------------------
  // Multi-codec shard ingest: zstd / lz4-frame / snappy-framed / gzip
  // ------------------------------------------------------------------

  /** Identify a compressed payload by magic bytes: the four codecs real
    * corpus shards arrive in (gzip for WET/WARC, zstd for RedPajama/
    * Dolma-style `.jsonl.zst`, lz4 frames and snappy framing from
    * Hadoop-adjacent producers). None for anything else — sniffing never
    * guesses. */
  def sniffCodec(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 4) return None
    def b(i: Int) = bytes(i) & 0xff
    if (b(0) == 0x1f && b(1) == 0x8b) Some("gzip")
    else if (b(0) == 0x28 && b(1) == 0xb5 && b(2) == 0x2f && b(3) == 0xfd) Some("zstd")
    else if (b(0) == 0x04 && b(1) == 0x22 && b(2) == 0x4d && b(3) == 0x18) Some("lz4")
    else if (bytes.length >= 10 && b(0) == 0xff && b(1) == 0x06 && b(2) == 0x00 &&
      b(3) == 0x00 && b(4) == 's' && b(5) == 'N' && b(6) == 'a' &&
      b(7) == 'P' && b(8) == 'p' && b(9) == 'Y') Some("snappy")
    else None
  }

  /** Drain a codec InputStream under the [[MaxInflated]] bomb cap; None
    * on any decode error or cap breach (strict-but-total, like
    * [[gunzipBytes]]). */
  private def drainCapped(in: java.io.InputStream): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(8192)
    val buf = new Array[Byte](8192)
    try {
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size() > MaxInflated) return None
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException | _: RuntimeException => None }
    finally in.close()
  }

  /** Sniff the codec and decompress: (codec, plaintext). gzip goes
    * through the strict RFC 1952 walk (trailing garbage and partial
    * members rejected); zstd/lz4/snappy through their reference streams
    * (all three consume concatenated frames), each under the shared bomb
    * cap. None on unknown magic or any decode failure. */
  def decompressSniff(bytes: Array[Byte]): Option[(String, Array[Byte])] =
    sniffCodec(bytes).flatMap { codec =>
      val bin = () => new java.io.ByteArrayInputStream(bytes)
      val plain = codec match {
        case "gzip" => gunzipBytes(bytes)
        case "zstd" =>
          try drainCapped(new com.github.luben.zstd.ZstdInputStream(bin()))
          catch { case _: java.io.IOException => None }
        case "lz4" =>
          try drainCapped(new net.jpountz.lz4.LZ4FrameInputStream(bin()))
          catch { case _: java.io.IOException => None }
        case "snappy" =>
          try drainCapped(new org.xerial.snappy.SnappyFramedInputStream(bin()))
          catch { case _: java.io.IOException => None }
      }
      plain.map(codec -> _)
    }

  /** Compress with a named codec — the fixture/writer side. */
  def compressAs(codec: String, data: Array[Byte]): Array[Byte] = codec match {
    case "gzip" => gzipBytes(data)
    case "zstd" =>
      val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      val s = new com.github.luben.zstd.ZstdOutputStream(bos)
      s.write(data); s.close(); bos.toByteArray
    case "lz4" =>
      val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      // 64 KB blocks, NOT the class default SIZE_4MB: the frame header
      // declares the block size, so both sides of a document-sized
      // round-trip otherwise allocate 4 MB buffers PER ROW — measured
      // 1.2 ms/doc vs 32 µs (the decoder adapts to whatever real shards
      // declare; this choice only shapes what we write)
      val s = new net.jpountz.lz4.LZ4FrameOutputStream(bos,
        net.jpountz.lz4.LZ4FrameOutputStream.BLOCKSIZE.SIZE_64KB)
      s.write(data); s.close(); bos.toByteArray
    case "snappy" =>
      val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      val s = new org.xerial.snappy.SnappyFramedOutputStream(bos)
      s.write(data); s.close(); bos.toByteArray
    case other => throw new IllegalArgumentException(s"unknown codec: $other")
  }

  final case class CodecTextRow(doc_id: Long, codec: Option[String], ok: Long,
                                n_bytes: Option[Long], md5_hex: Option[String])

  /** Mixed-codec fixture: each document compressed with the codec its id
    * selects (zstd/lz4/snappy round-robin — gzip has its own q237 path),
    * through the REAL encoders. */
  def synthCodecDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val rows = Spread.toCores(docs) // CPU-heavy encode leg
      .filter(col(textCol).isNotNull)
      .select(col(idCol).cast(LongType), col(textCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .mapPartitions { it =>
        it.map { case (id, text) =>
          // floorMod: a negative id must select the same branch the
          // oracle's sign-normalized CASE does, not throw on Seq(-1)
          val codec = Seq("zstd", "lz4", "snappy")(Math.floorMod(id, 3L).toInt)
          (id, compressAs(codec,
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("asset_id", "payload")
    Multimodal.toAssets(rows, "asset_id", "payload", "application/octet-stream")
  }

  /** Sniff + decompress each payload and fingerprint the plaintext:
    * (doc_id, codec, ok, n_bytes, md5_hex). Unknown magic or a decode
    * failure keeps the sniffed codec (when any) with ok=0. */
  def codecTextFeatures(assets: DataFrame): Dataset[CodecTextRow] = {
    val enc = Encoders.product[CodecTextRow]
    Spread.toCores(assets) // CPU-heavy decode leg: never pin to 1 core
      .select(col("asset_id").cast(LongType), col("payload").cast(BinaryType))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, payload) =>
          decompressSniff(payload) match {
            case Some((codec, plain)) =>
              md.reset()
              val hex = md.digest(plain).map("%02x".format(_)).mkString
              CodecTextRow(id, Some(codec), 1L, Some(plain.length.toLong), Some(hex))
            case None => CodecTextRow(id, sniffCodec(payload), 0L, None, None)
          }
        }
      }(enc)
  }

  /** Inflate gzip text payloads and fingerprint the PLAINTEXT: exact
    * byte length + md5 of the decompressed bytes. Losslessness is the
    * oracle hook — DuckDB computes `strlen(text)`/`md5(text)` from the
    * source column without ever seeing a gzip byte, so any DEFLATE
    * round-trip defect flips the hash. */
  def gunzipTextFeatures(assets: DataFrame): Dataset[GzipTextRow] = {
    val enc = Encoders.product[GzipTextRow]
    Spread.toCores(assets) // CPU-heavy decode leg: never pin to 1 core
      .select(col("asset_id").cast(LongType), col("payload").cast(BinaryType))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, payload) =>
          gunzipBytes(payload) match {
            case Some(plain) =>
              md.reset()
              val hex = md.digest(plain).map("%02x".format(_)).mkString
              GzipTextRow(id, 1L, Some(plain.length.toLong), Some(hex))
            case None => GzipTextRow(id, 0L, None, None)
          }
        }
      }(enc)
  }

  // ------------------------------------------------------------------
  // zstd member split — the SURVEY §7.4 #7 gated leg, LIFTED in r17:
  // the environment carries zstd-jni (already used by decodeShard's
  // stream path), so the .warc.zst frame walk slots in beside the
  // RFC 1952 one exactly as that entry promised.
  // ------------------------------------------------------------------

  /** One zstd frame inside a multi-frame shard — the `.warc.zst`
    * layout's unit (one record per frame, frames concatenated), same
    * boundary semantics as [[GzipMember]]: (offset, compLen) are the
    * ranged-read coordinates of the frame, `data` its decompressed
    * payload. */
  final case class ZstdMember(offset: Long, compLen: Long, data: Array[Byte])

  /** Split a multi-frame zstd shard into its frames WITH byte
    * boundaries — [[gunzipMemberSplit]]'s RFC 8878 twin. Frame spans
    * come from the reference decoder's own frame walk
    * (`Zstd.findFrameCompressedSize` — block-level parsing this code
    * does not re-implement); each frame then decompresses alone
    * through `ZstdInputStream` (content checksums verified natively).
    * Skippable frames (magic 0x184D2A5x — Common Crawl parks its
    * shared dictionary in one) are SKIPPED, not members; frames that
    * REQUIRE that dictionary fail their decompress and the shard reads
    * None — dictionary wiring is out of scope, stated honestly (the
    * skippable frame's content is itself compressed by a convention
    * this sandbox cannot verify). None on any malformed/truncated
    * frame, trailing garbage, or the [[MaxInflated]] cap summed across
    * frames; never throws. */
  def zstdMemberSplit(bytes: Array[Byte]): Option[Seq[ZstdMember]] = {
    if (bytes == null || bytes.length < 4) return None
    def le32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    val members = scala.collection.mutable.ArrayBuffer.empty[ZstdMember]
    var pos = 0
    var total = 0L
    while (pos < bytes.length) {
      if (pos + 4 > bytes.length) return None
      val magic = le32(pos)
      if (magic >= 0x184d2a50L && magic <= 0x184d2a5fL) {
        if (pos + 8 > bytes.length) return None
        val sz = le32(pos + 4)
        if (sz > bytes.length - pos - 8) return None
        pos += 8 + sz.toInt
      } else if (magic == 0xfd2fb528L) {
        val span =
          try com.github.luben.zstd.Zstd.findFrameCompressedSize(bytes, pos)
          catch { case scala.util.control.NonFatal(_) => return None }
        if (com.github.luben.zstd.Zstd.isError(span) || span <= 0 ||
            span > bytes.length - pos) return None
        val slice = java.util.Arrays.copyOfRange(bytes, pos, pos + span.toInt)
        val out = new java.io.ByteArrayOutputStream(8192)
        try {
          val zin = new com.github.luben.zstd.ZstdInputStream(
            new java.io.ByteArrayInputStream(slice))
          try {
            val buf = new Array[Byte](8192)
            var n = zin.read(buf)
            while (n >= 0) {
              out.write(buf, 0, n)
              total += n
              if (total > MaxInflated) return None // bomb cap
              n = zin.read(buf)
            }
          } finally zin.close()
        } catch { case _: java.io.IOException => return None }
        members += ZstdMember(pos.toLong, span, out.toByteArray)
        pos += span.toInt
      } else return None // neither a data nor a skippable frame
    }
    if (members.isEmpty) None else Some(members.toSeq)
  }

  /** [[gunzipMemberFeatures]]' zstd twin — same row shape (the
    * [[GzipMemberRow]] fields are codec-neutral boundary+fingerprint
    * facts), same taxonomy: a shard failing [[zstdMemberSplit]] yields
    * one ok=0 row at member_idx −1. */
  def zstdMemberFeatures(assets: DataFrame): Dataset[GzipMemberRow] = {
    val enc = Encoders.product[GzipMemberRow]
    Spread.toCores(assets)
      .select(col("asset_id").cast(LongType), col("payload").cast(BinaryType))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, payload) =>
          zstdMemberSplit(payload) match {
            case Some(members) => members.iterator.zipWithIndex.map {
              case (m, i) =>
                md.reset()
                val hex = md.digest(m.data).map("%02x".format(_)).mkString
                GzipMemberRow(id, i.toLong, 1L, Some(m.offset), Some(m.compLen),
                  Some(m.data.length.toLong), Some(hex))
            }
            case None => Iterator.single(
              GzipMemberRow(id, -1L, 0L, None, None, None, None))
          }
        }
      }(enc)
  }

  /** Multi-frame zstd shard fixture — [[synthGzipShards]]' layout with
    * each document compressed as its OWN zstd frame. */
  def synthZstdShards(docs: DataFrame, idCol: String, textCol: String,
                      shardSize: Int = 8): DataFrame = {
    require(shardSize >= 1, "shardSize must be positive")
    val grouped = Spread.toCores(docs)
      .filter(col(textCol).isNotNull)
      .select(expr(s"(CAST($idCol AS BIGINT) - pmod(CAST($idCol AS BIGINT), $shardSize)) DIV $shardSize").as("_shard"),
        col(idCol).cast(LongType).as("_id"), col(textCol).as("_text"))
      .groupBy(col("_shard"))
      .agg(sort_array(collect_list(struct(col("_id"), col("_text")))).as("_docs"))
    val rows = grouped
      .select(col("_shard"), col("_docs._text").as("_texts"))
      .as(Encoders.product[(Long, Seq[String])])
      .mapPartitions { it =>
        it.map { case (shard, texts) =>
          val bos = new java.io.ByteArrayOutputStream()
          texts.foreach { text =>
            val m = compressAs("zstd",
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            bos.write(m, 0, m.length)
          }
          (shard, bos.toByteArray)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("asset_id", "payload")
    Multimodal.toAssets(rows, "asset_id", "payload", "application/zstd")
  }

  // NOT private (the TrimWindowRow janino rule)
  final case class JsonlLineRow(shard_id: Long, member_idx: Long,
                                line_idx: Long, ok: Long,
                                line: Option[String])

  /** JSONL lines out of compressed document shards — the
    * Dolma/RedPajama `.jsonl.zst` (and `.jsonl.gz`) distribution
    * reality: a shard is concatenated compressed frames, each frame a
    * batch of newline-delimited JSON documents. Codec-sniffed per
    * shard (zstd data/skippable magic → [[zstdMemberSplit]], else
    * [[gunzipMemberSplit]] — the [[graft.operators.Warc]] walk's
    * convention); each member's payload decodes as UTF-8 and splits on
    * newlines (JSONL's framing guarantee: content newlines are
    * escaped inside the JSON strings). A shard whose framing fails
    * yields one ok=0 row at member_idx −1; the JSON itself is parsed
    * downstream with `from_json` (q298), so a malformed LINE stays
    * visible as a row whose parsed struct is NULL — never vanishes.
    * Map-only, zero shuffle. */
  def jsonlLines(assets: DataFrame): Dataset[JsonlLineRow] = {
    val enc = Encoders.product[JsonlLineRow]
    Spread.toCores(assets)
      .select(col("asset_id").cast(LongType), col("payload").cast(BinaryType))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val zstd = payload != null && payload.length >= 4 &&
            (((payload(0) & 0xff) == 0x28 && (payload(1) & 0xff) == 0xb5 &&
              (payload(2) & 0xff) == 0x2f && (payload(3) & 0xff) == 0xfd) ||
             ((payload(0) & 0xf0) == 0x50 && (payload(1) & 0xff) == 0x2a &&
              (payload(2) & 0xff) == 0x4d && (payload(3) & 0xff) == 0x18))
          val split =
            if (zstd) zstdMemberSplit(payload).map(_.map(_.data))
            else gunzipMemberSplit(payload).map(_.map(_.data))
          split match {
            case None => Iterator.single(JsonlLineRow(id, -1L, -1L, 0L, None))
            case Some(members) => members.iterator.zipWithIndex.flatMap {
              case (data, m) =>
                new String(data, java.nio.charset.StandardCharsets.UTF_8)
                  .split("\n", -1).iterator.filter(_.nonEmpty).zipWithIndex
                  .map { case (line, l) =>
                    JsonlLineRow(id, m.toLong, l.toLong, 1L, Some(line))
                  }
            }
          }
        }
      }(enc)
  }

  /** `.jsonl.zst` shard fixture: documents 8 per shard in doc_id
    * order, serialized as `to_json(struct(id, text, lang))` lines —
    * content newlines/quotes escape exactly as real writers escape
    * them — and compressed `linesPerFrame` lines to a zstd frame
    * (multi-frame shards, the [[synthZstdShards]] layout). */
  def synthJsonlZstdShards(docs: DataFrame, idCol: String = "doc_id",
                           textCol: String = "text",
                           langCol: String = "lang",
                           shardSize: Int = 8,
                           linesPerFrame: Int = 4): DataFrame = {
    require(shardSize >= 1 && linesPerFrame >= 1, "positive sizes")
    val grouped = Spread.toCores(docs)
      .filter(col(textCol).isNotNull)
      .select(expr(s"(CAST($idCol AS BIGINT) - pmod(CAST($idCol AS BIGINT), $shardSize)) DIV $shardSize").as("_shard"),
        col(idCol).cast(LongType).as("_id"),
        to_json(struct(col(idCol).cast(LongType).as("id"),
          col(textCol).as("text"), col(langCol).as("lang"))).as("_line"))
      .groupBy(col("_shard"))
      .agg(sort_array(collect_list(struct(col("_id"), col("_line"))))
        .as("_docs"))
    val rows = grouped
      .select(col("_shard"), col("_docs._line").as("_lines"))
      .as(Encoders.product[(Long, Seq[String])])
      .mapPartitions { it =>
        it.map { case (shard, lines) =>
          val bos = new java.io.ByteArrayOutputStream()
          lines.grouped(linesPerFrame).foreach { chunk =>
            val m = compressAs("zstd", chunk.mkString("\n")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            bos.write(m, 0, m.length)
          }
          (shard, bos.toByteArray)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("asset_id", "payload")
    Multimodal.toAssets(rows, "asset_id", "payload", "application/jsonl+zstd")
  }
}
