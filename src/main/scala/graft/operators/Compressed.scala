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
    * truncation, CRC mismatch, or the [[MaxInflated]] bomb cap. */
  def gunzipBytes(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (bytes == null || bytes.length < 18) return None
    if ((bytes(0) & 0xff) != 0x1f || (bytes(1) & 0xff) != 0x8b) return None
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 4, 1 << 16))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size() > MaxInflated) { in.close(); return None }
        n = in.read(buf)
      }
      in.close()
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }
  }

  final case class GzipTextRow(doc_id: Long, ok: Long, n_bytes: Option[Long],
                               md5_hex: Option[String])

  /** Gzip fixture: each document's UTF-8 text through the REAL gzip
    * encoder → (asset_id, media_type, payload, n_bytes, checksum), the
    * [[Multimodal.toAssets]] envelope. */
  def synthGzipDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val rows = docs.filter(col(textCol).isNotNull)
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

  /** Inflate gzip text payloads and fingerprint the PLAINTEXT: exact
    * byte length + md5 of the decompressed bytes. Losslessness is the
    * oracle hook — DuckDB computes `strlen(text)`/`md5(text)` from the
    * source column without ever seeing a gzip byte, so any DEFLATE
    * round-trip defect flips the hash. */
  def gunzipTextFeatures(assets: DataFrame): Dataset[GzipTextRow] = {
    val enc = Encoders.product[GzipTextRow]
    assets.select(col("asset_id").cast(LongType), col("payload").cast(BinaryType))
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
}
