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

  test("every codec chain runs at full parallelism from a single-file parquet input") {
    // the EXACT r13 driver shape: one parquet file = one row group = a
    // 1-partition scan feeding the whole chain
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-spread").toString
    spark.range(64).toDF("doc_id")
      .withColumn("text", concat(lit("body "), col("doc_id")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")
    assert(docs.rdd.getNumPartitions === 1, "fixture precondition")
    val ids = docs.select(col("doc_id"))
    def parts(df: org.apache.spark.sql.DataFrame): Int = df.rdd.getNumPartitions
    // image/audio synth chains (q244/q245/q246 family): the synth spread
    // fires on the scan-shaped input and the decode leg inherits it
    assert(parts(Multimodal.synthBmpAssets(ids, "doc_id")) >= cores, "bmp synth")
    assert(parts(Multimodal.decodeBmpFeatures(
      Multimodal.synthBmpAssets(ids, "doc_id")).toDF()) >= cores, "bmp chain")
    assert(parts(Multimodal.decodeWavFeatures(
      Multimodal.synthWavAssets(ids, "doc_id")).toDF()) >= cores, "wav chain")
    assert(parts(AvroCodec.decodeAvroFeatures(
      AvroCodec.synthAvroDocs(docs, "doc_id", "text")).toDF()) >= cores, "avro chain")
    assert(parts(Compressed.codecTextFeatures(
      Compressed.synthCodecDocs(docs, "doc_id", "text")).toDF()) >= cores,
      "multi-codec chain")
    assert(parts(Urls.synthUrls(docs.select(col("doc_id").as("event_id")))) >= cores,
      "url synth")
    // a decode fed from a re-read single-file ASSET table (scan-shaped
    // again after the write boundary) re-spreads at the decode entry
    Multimodal.synthBmpAssets(ids, "doc_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/assets")
    val assets = spark.read.parquet(s"$dir/assets")
    assert(assets.rdd.getNumPartitions === 1, "asset fixture precondition")
    assert(parts(Multimodal.decodeBmpFeatures(assets).toDF()) >= cores,
      "decode entry re-spreads a 1-partition asset scan")
    // exchange-bearing inputs are NOT probed or re-spread: parallelism
    // there is AQE's job, and probing .rdd would materialize the stages
    val shuffled = Warc.synthWarcShards(docs, "doc_id", "text") // groupBy inside
    assert(Spread.toCores(shuffled) eq shuffled,
      "exchange-bearing plans pass through un-probed")
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
