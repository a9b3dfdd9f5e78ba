package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Multi-format source/sink coverage (§2.1 beyond the reference's CSV →
  * Postgres): the engine reads and writes columnar ORC and line-oriented
  * JSON with the same predicate-pushdown / column-pruning behavior the
  * parquet paths are audited for. The reference's only interchange format
  * is the CSV feed; a training-data pipeline meets all of these at its
  * edges (upstream dumps, downstream consumers). */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 200L)
    .map(i => (i, s"token$i text body $i", if (i % 2 == 0) "en" else "de", i * 10))
    .toDF("doc_id", "text", "lang", "n_chars")

  test("ORC round-trip preserves data; filters push to the ORC scan") {
    val dir = Files.createTempDirectory("graft-orc").toString
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === 200L)
    assert(back.orderBy("doc_id").collect().toSeq ===
      docs.orderBy("doc_id").collect().toSeq)

    val q = back.filter(col("n_chars") > 1900).select(col("doc_id"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,1900)"),
      s"predicate must reach the ORC scan:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"),
      s"unprojected wide column must be pruned from the ORC read: $readSchema")
    assert(q.collect().map(_.getLong(0)).toSet === (191L to 200L).toSet)
  }

  test("JSON lines round-trip preserves data and types via explicit schema") {
    val dir = Files.createTempDirectory("graft-json").toString
    docs.write.mode("overwrite").json(dir)
    // schema-explicit read (inference is a second full pass — never at 100 TB)
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.count() === 200L)
    assert(back.orderBy("doc_id").collect().toSeq ===
      docs.orderBy("doc_id").collect().toSeq)
    // corrupt-record tolerance: a malformed line lands in the corrupt
    // column (the engine's T8 contract), not a query-killing exception
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.json"),
      "{not json at all\n".getBytes)
    // (materialized first: Spark disallows querying ONLY the corrupt
    // column straight off raw files)
    val tolerant = spark.read
      .schema(docs.schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).localCheckpoint(true)
    assert(tolerant.filter(col("_corrupt_record").isNotNull).count() === 1L)
    assert(tolerant.filter(col("_corrupt_record").isNull).count() === 200L)
  }

  test("Avro containers: round-trip both codecs, schema gate, bombs and fuzz reject") {
    import graft.operators.AvroCodec
    // round-trip: null and deflate codecs decode to identical features
    for (deflate <- Seq(false, true)) {
      val bodies = Seq("alpha", "béta 世界", "", "gamma " * 40)
      val payload = AvroCodec.encodeAvroDoc(bodies, deflate)
      val (n, sumSeq, bytes, md5First) = AvroCodec.decodeAvroDoc(payload).get
      assert(n === bodies.length.toLong)
      assert(sumSeq === (0 until bodies.length).sum.toLong)
      assert(bytes === bodies.map(_.getBytes("UTF-8").length.toLong).sum)
      val md = java.security.MessageDigest.getInstance("MD5")
      assert(md5First ===
        md.digest("alpha".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    }
    // a container whose schema lacks the contract fields is rejected
    val otherSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"X","fields":[{"name":"z","type":"long"}]}""")
    val w = new org.apache.avro.generic.GenericDatumWriter[
      org.apache.avro.generic.GenericRecord](otherSchema)
    val dfw = new org.apache.avro.file.DataFileWriter(w)
    val bos = new java.io.ByteArrayOutputStream()
    dfw.create(otherSchema, bos)
    val rec = new org.apache.avro.generic.GenericData.Record(otherSchema)
    rec.put("z", 1L); dfw.append(rec); dfw.close()
    assert(AvroCodec.decodeAvroDoc(bos.toByteArray).isEmpty, "schema gate")
    // empty container, bad magic, truncation, mutation fuzz
    assert(AvroCodec.decodeAvroDoc(
      AvroCodec.encodeAvroDoc(Nil, deflate = false)).isEmpty, "empty shard")
    assert(AvroCodec.decodeAvroDoc("not avro".getBytes).isEmpty)
    val valid = AvroCodec.encodeAvroDoc(Seq("abc", "def"), deflate = true)
    val rnd = new scala.util.Random(31337)
    for (round <- 0 until 200) {
      val payload = round % 2 match {
        case 0 => valid.take(rnd.nextInt(valid.length + 1))
        case _ =>
          val b = valid.clone
          (0 until 1 + rnd.nextInt(6)).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte }
          b
      }
      AvroCodec.decodeAvroDoc(payload) // Option, never a throw
    }
    // Spark plumbing: synth fixtures decode ok=1, garbage routes to ok=0
    val assets = AvroCodec.synthAvroDocs(docs.limit(20), "doc_id", "text")
    val out = AvroCodec.decodeAvroFeatures(assets).collect()
    assert(out.length === 20 && out.forall(_.ok == 1L))
    val junk = graft.operators.Multimodal.toAssets(
      Seq((9L, "Objgarbage".getBytes)).toDF("asset_id", "payload"),
      "asset_id", "payload", "application/avro")
    val bad = AvroCodec.decodeAvroFeatures(junk).collect()
    assert(bad.length === 1 && bad.head.ok === 0L)
    // real .avro files on disk flow through binaryFile into the decoder
    val dir = Files.createTempDirectory("graft-avro").toString
    Seq("one", "two").zipWithIndex.foreach { case (t, i) =>
      Files.write(java.nio.file.Paths.get(s"$dir/part$i.avro"),
        AvroCodec.encodeAvroDoc(Seq(t), deflate = i == 1))
    }
    val fromDisk = AvroCodec.decodeAvroFeatures(
      graft.operators.Multimodal.readAssetDir(spark, s"$dir/*.avro",
        "application/avro")).collect()
    assert(fromDisk.length === 2 && fromDisk.forall(_.ok == 1L))
  }

  test("CSV with compression round-trips (the feed format, zipped at rest)") {
    val dir = Files.createTempDirectory("graft-csv").toString
    docs.write.mode("overwrite").option("header", "true")
      .option("compression", "gzip").csv(dir)
    val back = spark.read.option("header", "true").schema(docs.schema).csv(dir)
    assert(back.orderBy("doc_id").collect().toSeq ===
      docs.orderBy("doc_id").collect().toSeq)
  }
}
