package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads + typed metadata, processed in partition-sized batches.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * batch shape (mapPartitions over iterator = the JVM analogue of
  * `mapInPandas` batches). The actual media decode is STUBBED with a
  * deterministic fake (this container has no image/audio codecs): see
  * [[StubDecoder]]; swap in a real codec behind the same trait in
  * production.
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("n_bytes", LongType, nullable = true),
    StructField("checksum", StringType, nullable = true)))

  /** Wrap any (id, bytes-ish) frame into the asset shape. Used in tests
    * with documents.text as a stand-in payload. */
  def toAssets(df: DataFrame, idCol: String, payloadCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("asset_id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).cast(BinaryType).as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast(LongType))
      .withColumn("checksum", md5(col("payload")))

  /** Decoder contract: payload bytes → extracted features. Real
    * implementations wrap an image/audio library; the pipeline only sees
    * this trait, so decode parallelism/batching is decided here, once.
    */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte]): DecodedAsset
  }

  case class DecodedAsset(width: Int, height: Int, nFrames: Int, feature: Array[Float])

  /** Deterministic fake decode (md5-derived dims, constant feature).
    * ??? in production — the real codec goes here. */
  object StubDecoder extends Decoder {
    def decode(payload: Array[Byte]): DecodedAsset = {
      val h = java.security.MessageDigest.getInstance("MD5").digest(payload)
      val w = ((h(0) & 0xff) << 4 | (h(1) & 0x0f)) + 16   // 16..4111, deterministic
      val ht = ((h(2) & 0xff) << 4 | (h(3) & 0x0f)) + 16
      DecodedAsset(w, ht, (h(4) & 0x7f) + 1,
        Array.tabulate(8)(i => (h(i) & 0xff) / 255.0f))
    }
  }

  case class AssetRow(asset_id: Long, media_type: String, payload: Array[Byte],
                      n_bytes: Long, checksum: String)
  case class DecodedRow(asset_id: Long, media_type: String, n_bytes: Long,
                        checksum: String, width: Int, height: Int,
                        n_frames: Int, feature: Array[Float])

  /** Batch decode: mapPartitions so the decoder amortizes per-partition
    * init (codec contexts, model weights) across the whole batch — the
    * exact shape `mapInPandas` gives Python pipelines. Partition count
    * governs decode parallelism; repartition upstream by expected decode
    * cost if payload sizes are skewed.
    */
  def decodeAll(assets: DataFrame, decoder: Decoder): Dataset[DecodedRow] = {
    val enc = Encoders.product[DecodedRow]
    assets.as(Encoders.product[AssetRow]).mapPartitions { it =>
      it.map { a =>
        val d = decoder.decode(if (a.payload == null) Array.empty else a.payload)
        DecodedRow(a.asset_id, a.media_type, a.n_bytes, a.checksum,
          d.width, d.height, d.nFrames, d.feature)
      }
    }(enc)
  }

  /** Frame-sample stub: pick every `stride`-th frame index up to nFrames —
    * pure column math, no decode needed (metadata-only planning step).
    * Zero-frame assets (still images, corrupt payloads) get an empty list:
    * sequence(0, -1) would throw on illegal boundaries. */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded.withColumn("sampled_frames",
      when(col("n_frames") > 0, sequence(lit(0), col("n_frames") - 1, lit(stride)))
        .otherwise(array().cast("array<int>")))

  /** Uniform-budget frame sampling: the video-LM ingestion plan — pick at
    * most `maxFrames` frame indices spanning the clip evenly (center of
    * each of K segments: `ix_j = ⌊(2j+1)·n / 2K⌋`, the standard uniform
    * sampler), with per-frame timestamps at `fps`. All INTEGER arithmetic
    * — no float boundary can flip an index between engines — and pure
    * column math over decode METADATA: which frames to decode is planned
    * (and oracle-checked) before any codec runs, so a 100 TB video corpus
    * schedules its decode work from a metadata-only scan. Clips with
    * n_frames ≤ maxFrames keep every frame (the formula degenerates to
    * j). Emits one row per sampled frame:
    * (asset_id, n_frames, sample_ix, frame_ix, ts_ms). */
  def uniformFramePlan(decoded: DataFrame, maxFrames: Int, fps: Int): DataFrame = {
    require(maxFrames > 0 && fps > 0, "maxFrames and fps must be positive")
    decoded
      .filter(col("n_frames") > 0)
      .select(col("asset_id"), col("n_frames").cast("long").as("n_frames"),
        least(lit(maxFrames.toLong), col("n_frames")).as("_k"))
      .select(col("asset_id"), col("n_frames"), col("_k"),
        explode(sequence(lit(0L), col("_k") - 1)).as("sample_ix"))
      .withColumn("frame_ix",
        expr("CAST(((2 * sample_ix + 1) * n_frames) DIV (2 * _k) AS BIGINT)"))
      .withColumn("ts_ms", expr(s"CAST((frame_ix * 1000) DIV $fps AS BIGINT)"))
      .drop("_k")
  }

  /** Resize planning: target dimensions fitting (width, height) inside a
    * `box`×`box` square, aspect preserved, never upscaled — the metadata
    * half of a resize (the pixel half belongs to the Decoder impl). Pure
    * column math: one double division + floor per side, deterministic in
    * any engine, so the whole plan (which assets, to what size) is
    * computable — and oracle-checkable — WITHOUT touching a codec. */
  def resizePlan(decoded: DataFrame, box: Int): DataFrame = {
    val scale = least(
      lit(box.toDouble) / col("width"), lit(box.toDouble) / col("height"), lit(1.0))
    decoded
      .withColumn("out_width", floor(col("width") * scale).cast("long"))
      .withColumn("out_height", floor(col("height") * scale).cast("long"))
  }
}
