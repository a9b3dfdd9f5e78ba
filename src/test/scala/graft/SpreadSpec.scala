package graft

import org.apache.spark.sql.functions._
import graft.operators.{AvroCodec, Compressed, Multimodal, Spread, Urls, Warc}

/** Partition-spread guard for the CPU-heavy codec legs: a single-partition
  * input (exactly what a single-row-group parquet file produces) must not
  * pin an encode/decode mapPartitions chain to one core. The r13 driver
  * bench measured 0.9 s codec queries at 15 s for precisely this reason —
  * one pinned core cannot absorb a contended box. */
class SpreadSpec extends SparkSpec {
  import spark.implicits._

  private val cores = spark.sparkContext.defaultParallelism

  test("toCores: narrow input spreads, wide input and streams untouched") {
    val narrow = spark.range(100).toDF("id").coalesce(1)
    assert(Spread.toCores(narrow).rdd.getNumPartitions === cores)
    val wide = spark.range(100).toDF("id").repartition(cores + 3)
    assert(Spread.toCores(wide).rdd.getNumPartitions === cores + 3,
      "an already-wide input must NOT be reshuffled (the 100 TB no-op path)")
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[Long]
    val sdf = ms.toDF()
    assert(Spread.toCores(sdf) eq sdf, "streaming frames pass through")
  }

  test("every codec chain runs at full parallelism from a 1-partition input") {
    val ids = spark.range(64).toDF("doc_id").coalesce(1)
    val docs = ids.withColumn("text", concat(lit("body "), col("doc_id")))
    def parts(df: org.apache.spark.sql.DataFrame): Int = df.rdd.getNumPartitions
    // image/audio synth → decode (q244/q245/q246 family)
    assert(parts(Multimodal.synthBmpAssets(ids, "doc_id")) >= cores, "bmp synth")
    assert(parts(Multimodal.decodeBmpFeatures(
      Multimodal.synthBmpAssets(ids.coalesce(1), "doc_id").coalesce(1)).toDF()) >= cores,
      "bmp decode re-spreads even when the synth output was re-collapsed")
    assert(parts(Multimodal.decodeWavFeatures(
      Multimodal.synthWavAssets(ids, "doc_id").coalesce(1)).toDF()) >= cores, "wav decode")
    assert(parts(AvroCodec.decodeAvroFeatures(
      AvroCodec.synthAvroDocs(docs, "doc_id", "text").coalesce(1)).toDF()) >= cores,
      "avro decode")
    // crawl chain (q248-q252 family)
    assert(parts(Warc.warcRecordFeatures(
      Warc.synthWarcShards(docs, "doc_id", "text").coalesce(1)).toDF()) >= cores,
      "warc decode")
    assert(parts(Compressed.codecTextFeatures(
      Compressed.synthCodecDocs(docs, "doc_id", "text").coalesce(1)).toDF()) >= cores,
      "multi-codec decode")
    assert(parts(Urls.synthUrls(
      spark.range(64).toDF("event_id").coalesce(1))) >= cores, "url synth")
  }

  test("spread does not change results (content-deterministic chains)") {
    val docs = spark.range(32).toDF("doc_id")
      .withColumn("text", concat(lit("alpha "), col("doc_id")))
    val one = Compressed.codecTextFeatures(
      Compressed.synthCodecDocs(docs.coalesce(1), "doc_id", "text")).collect()
    val wide = Compressed.codecTextFeatures(
      Compressed.synthCodecDocs(docs.repartition(cores + 1), "doc_id", "text")).collect()
    assert(one.sortBy(_.doc_id).toSeq === wide.sortBy(_.doc_id).toSeq)
  }
}
