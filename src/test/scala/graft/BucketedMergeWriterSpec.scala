package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.plans.BucketedMergeWriter

/** Bucketed MERGE invariants: same semantics as MergeWriter, plus the
  * load-bearing scale property — a merge must leave untouched buckets'
  * files physically unchanged on disk (write amplification O(touched
  * buckets), not O(table)). */
class BucketedMergeWriterSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-bucketed").toString

  private def bucketFiles(root: String, table: String): Map[String, Long] = {
    val dir = java.nio.file.Paths.get(root, table)
    Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap
  }

  test("mergeDim keeps keys stable and updates attributes across batches") {
    val store = new BucketedMergeWriter(spark, freshRoot(), nBuckets = 8)
    val t1 = store.mergeDim("d", Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("k", "attr"),
      Seq("k"), "sk")
    val keys1 = t1.collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("sk")).toMap
    assert(keys1.values.toSet === Set(1L, 2L, 3L))

    val t2 = store.mergeDim("d", Seq((20L, "b2"), (40L, "d")).toDF("k", "attr"),
      Seq("k"), "sk")
    val rows2 = t2.collect().map(r =>
      r.getAs[Long]("k") -> (r.getAs[Long]("sk"), r.getAs[String]("attr"))).toMap
    assert(rows2(20L)._1 === keys1(20L))
    assert(rows2(20L)._2 === "b2")
    assert(rows2(10L) === (keys1(10L), "a"))
    assert(rows2(40L)._1 === 4L)
    assert(t2.count() === 4)
  }

  test("a merge rewrites ONLY the buckets its batch touches") {
    val root = freshRoot()
    val store = new BucketedMergeWriter(spark, root, nBuckets = 32)
    // keys spread across many buckets
    store.mergeFact("f", (1L to 200L).map(i => (i, i * 1.0)).toDF("id", "v"), Seq("id"))
    val before = bucketFiles(root, "f")
    Thread.sleep(1100) // mtime granularity

    // single-key batch -> exactly one bucket dir may change
    store.mergeFact("f", Seq((7L, 99.0)).toDF("id", "v"), Seq("id"))
    val after = bucketFiles(root, "f")

    val beforeDirs = before.keys.map(p => p.split("/_bucket=")(1).split("/")(0)).toSet
    val changed = after.filterNot { case (p, m) => before.get(p).contains(m) }
    val changedDirs = changed.keys.map(p => p.split("/_bucket=")(1).split("/")(0)).toSet
    assert(beforeDirs.size > 10, s"expected many buckets, got $beforeDirs")
    assert(changedDirs.size === 1,
      s"exactly one bucket dir may change, got $changedDirs")
    // and the data is correct
    val m = store.read("f").collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("v")).toMap
    assert(m(7L) === 99.0 && m(8L) === 8.0 && m.size === 200)
  }

  test("empty first batch defers table creation, later batches create it") {
    val store = new BucketedMergeWriter(spark, freshRoot(), nBuckets = 4)
    store.mergeDim("d", Seq.empty[(Long, String)].toDF("k", "attr"), Seq("k"), "sk")
    assert(!store.exists("d"))
    val t = store.mergeDim("d", Seq((1L, "x")).toDF("k", "attr"), Seq("k"), "sk")
    assert(t.count() === 1)
  }

  test("end-to-end star pipeline over the bucketed store matches MergeWriter results") {
    import graft.plans.MergeWriter
    import graft.streaming.StreamToStar
    val feedDir = Files.createTempDirectory("graft-feed-b").toString
    // small 2-file feed with duplicate ids
    for (f <- 0 until 2) {
      val pw = new java.io.PrintWriter(s"$feedDir/MOCK_DATA_$f.csv")
      pw.println(graft.sources.SalesFeed.fieldNames.mkString(","))
      for (i <- 1 to 50) {
        val m = Map("id" -> i.toString, "sale_customer_id" -> i.toString,
          "customer_first_name" -> s"F$i", "customer_last_name" -> s"L${i}_f$f",
          "sale_seller_id" -> i.toString, "sale_product_id" -> i.toString,
          "product_name" -> s"P$i", "store_name" -> s"S${i % 5}",
          "supplier_name" -> s"Su${i % 3}", "sale_date" -> "3/14/2021",
          "sale_quantity" -> "2", "sale_total_price" -> s"$i.50",
          "seller_first_name" -> s"SF$i", "seller_last_name" -> s"SL$i")
        pw.println(graft.sources.SalesFeed.fieldNames.map(c => m.getOrElse(c, "")).mkString(","))
      }
      pw.close()
    }
    def runWith(store: graft.plans.TableStore): Map[String, Long] = {
      StreamToStar.startFromFiles(spark, s"$feedDir/MOCK_DATA_*.csv", store,
        Files.createTempDirectory("ckpt").toString).awaitTermination()
      RunStar.starTables.map(t => t -> store.read(t).count()).toMap
    }
    val a = runWith(new MergeWriter(spark, Files.createTempDirectory("ta").toString))
    val b = runWith(new BucketedMergeWriter(spark, Files.createTempDirectory("tb").toString, 8))
    assert(a === b)
    assert(a("fact_sales") === 50)
  }
}
