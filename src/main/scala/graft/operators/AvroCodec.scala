package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}

/** Avro Object Container File ingest — the training-data interchange
  * format beside gzip'd JSONL ([[Compressed]]): row-oriented blocks, an
  * embedded writer schema, per-block codecs, sync markers. This sandbox
  * ships avro-core (the real codec: binary varint/zigzag decoding,
  * DEFLATE blocks) but NOT the spark-avro DataSource connector, so the
  * engine reads containers the same way it reads every other payload
  * format: binary column → `mapPartitions` batch decode, schema-checked,
  * strict-but-total (a malformed container yields an ok=0 row, never a
  * task failure — the reference's drop-the-record-keep-the-stream
  * philosophy, `flink/stream_to_star.py:284-298`).
  *
  * Bomb guards: accumulated decoded body bytes are capped at
  * [[Compressed.MaxInflated]] and records per container at
  * [[MaxRecords]] — a hostile deflate block cannot materialize
  * unbounded memory.
  *
  * Scale: decode is map-only over however the payloads are partitioned
  * (one container per task batch, no shuffle); at 100 TB the natural
  * layout is many container files read via `binaryFile`, each decoded
  * where it lands. */
object AvroCodec {

  /** Per-container record cap: crawl-shard containers hold thousands of
    * records; millions is a bomb or a mis-routed table dump. */
  val MaxRecords: Long = 10L * 1000 * 1000

  /** The (seq, body) document-shard schema the fixtures and specs use. */
  val DocSchemaJson: String =
    """{"type":"record","name":"Doc","fields":[
      |{"name":"seq","type":"long"},{"name":"body","type":"string"}]}"""
      .stripMargin.replace("\n", "")

  /** Encode (seq, body) records into a REAL Avro container via
    * avro-core's DataFileWriter; `deflate = true` compresses the blocks
    * (the codec path a reader must also handle). */
  def encodeAvroDoc(bodies: Seq[String], deflate: Boolean): Array[Byte] = {
    val schema = new org.apache.avro.Schema.Parser().parse(DocSchemaJson)
    val writer =
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema)
    val dfw = new org.apache.avro.file.DataFileWriter(writer)
    if (deflate) dfw.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
    val bos = new java.io.ByteArrayOutputStream()
    dfw.create(schema, bos)
    bodies.zipWithIndex.foreach { case (body, i) =>
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("seq", i.toLong)
      rec.put("body", body)
      dfw.append(rec)
    }
    dfw.close()
    bos.toByteArray
  }

  final case class AvroDocRow(asset_id: Long, ok: Long,
                              n_records: Option[Long], sum_seq: Option[Long],
                              n_body_bytes: Option[Long],
                              md5_first: Option[String])

  /** Zigzag varlong at `pos`; None on truncation/overlong. */
  private def readVarLong(b: Array[Byte], pos: Int): Option[(Long, Int)] = {
    var p = pos; var shift = 0; var acc = 0L
    while (p < b.length && shift <= 63) {
      val v = b(p) & 0xff; p += 1
      acc |= (v & 0x7fL) << shift
      if ((v & 0x80) == 0) return Some(((acc >>> 1) ^ -(acc & 1), p))
      shift += 7
    }
    None
  }

  /** Walk the container FRAMING without decoding: header map, sync, then
    * every block's (count, byteSize, data, sync). Rejects declared block
    * sizes beyond the payload (a hostile header that would otherwise make
    * DataFileStream allocate the declared size BEFORE any record-level
    * cap runs) and record counts beyond [[MaxRecords]]. The residual
    * hazard — a small DEFLATE block that inflates huge — is inherent to
    * reading compressed blocks and bounded only by executor memory;
    * documented, not defended. */
  private def framingOk(b: Array[Byte]): Boolean = {
    var pos = 4
    // metadata map: (+count entries)* then 0; negative count = byteSize-prefixed
    var guard = 0
    var done = false
    while (!done && guard < 1000) {
      guard += 1
      readVarLong(b, pos) match {
        case None => return false
        case Some((n0, p0)) =>
          pos = p0
          if (n0 == 0) done = true
          else {
            var n = n0
            if (n < 0) {
              n = -n
              readVarLong(b, pos) match {
                case None => return false
                case Some((_, p1)) => pos = p1
              }
            }
            var i = 0L
            while (i < 2 * n) { // key and value are both length-prefixed
              readVarLong(b, pos) match {
                case None => return false
                case Some((len, p1)) =>
                  if (len < 0 || p1 + len > b.length) return false
                  pos = (p1 + len).toInt
              }
              i += 1
            }
          }
      }
    }
    pos += 16 // sync marker
    if (pos > b.length) return false
    var totalRecs = 0L
    while (pos < b.length) {
      readVarLong(b, pos) match {
        case None => return false
        case Some((cnt, p0)) =>
          if (cnt < 0) return false
          totalRecs += cnt
          if (totalRecs > MaxRecords) return false
          readVarLong(b, p0) match {
            case None => return false
            case Some((size, p1)) =>
              if (size < 0 || p1 + size + 16 > b.length) return false
              pos = (p1 + size + 16).toInt
          }
      }
    }
    true
  }

  /** Decode one container payload: (record count, Σseq, Σ body bytes,
    * md5 of the FIRST body) — None on bad magic, truncated blocks,
    * schema mismatch (missing seq/body fields), sync-marker corruption,
    * or either bomb cap. Never throws. */
  def decodeAvroDoc(payload: Array[Byte]): Option[(Long, Long, Long, String)] = {
    if (payload == null || payload.length < 4) return None
    // container magic: 'O' 'b' 'j' 0x01
    if (payload(0) != 'O' || payload(1) != 'b' || payload(2) != 'j' ||
        payload(3) != 1) return None
    // framing pre-walk BEFORE the avro reader touches the payload
    if (!framingOk(payload)) return None
    var dfs: org.apache.avro.file.DataFileStream[
      org.apache.avro.generic.GenericRecord] = null
    try {
      val reader = new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]()
      dfs = new org.apache.avro.file.DataFileStream(
        new java.io.ByteArrayInputStream(payload), reader)
      val schema = dfs.getSchema
      if (schema.getField("seq") == null || schema.getField("body") == null)
        return None
      val md = java.security.MessageDigest.getInstance("MD5")
      var n = 0L; var sumSeq = 0L; var bodyBytes = 0L
      var md5First: String = null
      while (dfs.hasNext) {
        val rec = dfs.next()
        n += 1
        if (n > MaxRecords) return None
        sumSeq += rec.get("seq").asInstanceOf[Long]
        val body = rec.get("body").toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        bodyBytes += body.length
        if (bodyBytes > Compressed.MaxInflated) return None
        if (md5First == null) {
          md.reset()
          md5First = md.digest(body).map("%02x".format(_)).mkString
        }
      }
      if (n == 0) return None // an empty shard is a routing bug upstream
      Some((n, sumSeq, bodyBytes, md5First))
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally {
      if (dfs != null) dfs.close()
    }
  }

  /** Container fixture: per document, an Avro container of
    * `1 + doc_id mod 3` records all carrying the doc's text, with the
    * block codec rotating null/deflate by id parity — both codec paths
    * decode against ONE oracle computed from the source column. */
  def synthAvroDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val rows = Spread.toCores(docs) // CPU-heavy encode leg
      .filter(col(textCol).isNotNull)
      .select(col(idCol).cast(LongType), col(textCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val n = 1 + (id % 3).toInt
          (id, encodeAvroDoc(Seq.fill(n)(text), deflate = id % 2 == 1))
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("asset_id", "payload")
    Multimodal.toAssets(rows, "asset_id", "payload", "application/avro")
  }

  /** Decode container payloads to feature rows; malformed → ok=0. */
  def decodeAvroFeatures(assets: DataFrame): Dataset[AvroDocRow] = {
    val enc = Encoders.product[AvroDocRow]
    Spread.toCores(assets) // CPU-heavy decode leg: never pin to 1 core
      .select(col("asset_id").cast(LongType), col("payload").cast(BinaryType))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          decodeAvroDoc(payload) match {
            case Some((n, sumSeq, bodyBytes, md5First)) =>
              AvroDocRow(id, 1L, Some(n), Some(sumSeq), Some(bodyBytes),
                Some(md5First))
            case None => AvroDocRow(id, 0L, None, None, None, None)
          }
        }
      }(enc)
  }
}
