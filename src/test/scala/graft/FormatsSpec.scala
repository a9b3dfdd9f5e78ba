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

  test("CSV with compression round-trips (the feed format, zipped at rest)") {
    val dir = Files.createTempDirectory("graft-csv").toString
    docs.write.mode("overwrite").option("header", "true")
      .option("compression", "gzip").csv(dir)
    val back = spark.read.option("header", "true").schema(docs.schema).csv(dir)
    assert(back.orderBy("doc_id").collect().toSeq ===
      docs.orderBy("doc_id").collect().toSeq)
  }
}
