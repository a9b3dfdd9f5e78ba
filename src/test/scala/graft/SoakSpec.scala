package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.plans.BucketedMergeWriter
import graft.streaming.StreamToStar

/** Hours-equivalent serve-mode soak (VERDICT r3 "next #5"): a live
  * ProcessingTime stream ingests a trickle of files while compaction
  * triggers repeatedly (compactAfter=2) and a vacuum thread reclaims
  * superseded versions CONCURRENTLY under the tombstone retention grace.
  * Asserts the three operational invariants of long-running service:
  * bounded live-version count, bounded disk (vacuum actually deletes
  * while serving), and state identical to a quiescent run. */
class SoakSpec extends SparkSpec {

  private def writeMsgs(dir: String, file: String, ids: Range, tag: String): Unit = {
    val tmp = Paths.get(dir, s".$file.tmp")
    val pw = new java.io.PrintWriter(tmp.toFile)
    ids.foreach { i =>
      pw.println(s"""{"id":"$i","sale_customer_id":"$i","customer_first_name":"F$i","customer_last_name":"L${i}_$tag","store_name":"S${i % 3}","supplier_name":"Sup${i % 2}","sale_date":"3/${1 + i % 28}/2021","sale_quantity":"1","sale_total_price":"2.50"}""")
    }
    pw.close()
    // atomic move so the file source never reads a half-written file
    Files.move(tmp, Paths.get(dir, file),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def liveVersions(root: String, table: String): Set[Long] =
    Files.readAllLines(Paths.get(root, table, "_MANIFEST")).asScala
      .drop(1).filter(l => l.trim.nonEmpty && !l.startsWith("#"))
      .map(_.trim.split("\\s+")(1).toLong).toSet

  private def diskVersions(root: String, table: String): Set[Long] = {
    val d = Paths.get(root, table)
    val ls = Files.list(d)
    try ls.iterator().asScala.map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d+") => s.drop(1).toLong }.toSet
    finally ls.close()
  }

  test("serve-mode soak: live compaction + concurrent vacuum keep state bounded and exact") {
    val feed = Files.createTempDirectory("graft-soak-feed").toString
    val root = Files.createTempDirectory("graft-soak-tables").toString
    val ckpt = Files.createTempDirectory("graft-soak-ckpt").toString
    val nFiles = 14
    // aggressive compaction so the soak exercises the fold path constantly
    val store = new BucketedMergeWriter(spark, root, nBuckets = 4, compactAfter = 2)
    val tables = Seq("dim_customer", "dim_store", "dim_supplier", "dim_date", "fact_sales")

    writeMsgs(feed, "m00.jsonl", 1 to 30, "t00")
    val q = StreamToStar.serveFromJsonFiles(
      spark, s"$feed/*.jsonl", store, ckpt, "100 milliseconds")

    @volatile var stopVacuum = false
    @volatile var maxDiskVersions = 0
    // concurrent vacuum with a 3 s reader grace — the production
    // arrangement; also samples disk usage so we can prove reclamation
    // happened DURING serving, not just at the end
    val vac = new Thread(() => {
      while (!stopVacuum) {
        tables.foreach { t =>
          if (store.exists(t)) {
            store.vacuum(t, retainMillis = 3000)
            maxDiskVersions = math.max(maxDiskVersions, diskVersions(root, t).size)
          }
        }
        Thread.sleep(300)
      }
    })
    vac.start()
    try {
      // trickle the remaining files in while the query serves
      for (f <- 1 until nFiles) {
        writeMsgs(feed, f"m$f%02d.jsonl", 1 to 30, f"t$f%02d")
        Thread.sleep(250)
      }
      val deadline = System.currentTimeMillis() + 180000
      def lastTagged: Boolean =
        store.exists("dim_customer") && {
          val names = store.read("dim_customer")
            .select(col("source_customer_id"), col("customer_name")).collect()
            .map(r => r.getLong(0) -> r.getString(1)).toMap
          names.size == 30 && names.values.forall(_.endsWith(f"_t${nFiles - 1}%02d"))
        }
      while (!lastTagged && System.currentTimeMillis() < deadline) Thread.sleep(300)
      assert(lastTagged, "stream did not converge to the last file's state in time")
    } finally {
      q.stop()
      stopVacuum = true
      vac.join()
    }

    // 1. exact state after ~nFiles batches of last-write-wins pressure
    assert(store.read("fact_sales").count() === 30)
    assert(store.read("dim_store").count() === 3)
    assert(store.read("dim_supplier").count() === 2)
    val sks = store.read("dim_customer").select(col("customer_sk")).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(sks === (1L to 30L), s"surrogate keys must stay dense/stable, got $sks")

    // 2. bounded live versions: compaction kept every manifest folded
    for (t <- tables) {
      val live = liveVersions(root, t)
      assert(live.size <= 3,
        s"$t: live versions must stay bounded by compaction, got $live")
    }

    // 3. vacuum reclaimed during serving (disk never grew toward the
    //    ~2×nFiles versions each table committed), and a final quiesced
    //    vacuum leaves exactly the live set on disk. The bound is NOT
    //    tight: it only needs to separate "reclaimed while serving" from
    //    "everything retained" (~28 versions/table), with headroom for
    //    however many commits can stack inside the 3 s retention grace on
    //    a fast box.
    assert(maxDiskVersions <= 16,
      s"disk versions must stay bounded while serving, saw $maxDiskVersions")
    tables.foreach(t => store.vacuum(t))
    for (t <- tables)
      assert(diskVersions(root, t) === liveVersions(root, t),
        s"$t: quiesced vacuum must leave exactly the live versions")
  }
}
