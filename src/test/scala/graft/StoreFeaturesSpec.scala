package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.plans.BucketedMergeWriter

/** Time travel (manifest snapshots) + zone-map data skipping — the two
  * table-format features a 100 TB deployment leans on daily: reproduce
  * yesterday's training run against yesterday's table, and answer
  * time-bounded queries over an append-heavy table without scanning its
  * whole history. */
class StoreFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-storefeat").toString

  test("readAsOf reproduces each committed state; vacuum bounds history honestly") {
    val store = new BucketedMergeWriter(spark, freshRoot(), nBuckets = 4)
    store.mergeDim("d", Seq((1L, "a")).toDF("k", "attr"), Seq("k"), "sk")
    store.mergeDim("d", Seq((2L, "b")).toDF("k", "attr"), Seq("k"), "sk")
    store.mergeDim("d", Seq((1L, "a2")).toDF("k", "attr"), Seq("k"), "sk")

    val vs = store.committedVersions("d")
    assert(vs.size === 3, s"three commits -> three snapshots, got $vs")

    def state(v: Long): Map[Long, String] = store.readAsOf("d", v)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("attr")).toMap
    assert(state(vs(0)) === Map(1L -> "a"))
    assert(state(vs(1)) === Map(1L -> "a", 2L -> "b"))
    assert(state(vs(2)) === Map(1L -> "a2", 2L -> "b"))
    // latest snapshot ≡ the live read
    assert(state(vs(2)) === store.read("d").collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("attr")).toMap)

    // vacuum(0) reclaims superseded versions: stale time travel must fail
    // loudly (missing data), never return a partial table
    store.vacuum("d")
    assert(state(store.committedVersions("d").max) === Map(1L -> "a2", 2L -> "b"))
    intercept[java.nio.file.NoSuchFileException] { store.readAsOf("d", vs(0)) }
  }

  test("a crash-orphaned snapshot (swap never landed) is not committed state") {
    val root = freshRoot()
    val store = new BucketedMergeWriter(spark, root, nBuckets = 4)
    store.mergeDim("d", Seq((1L, "a")).toDF("k", "attr"), Seq("k"), "sk")
    store.mergeDim("d", Seq((2L, "b")).toDF("k", "attr"), Seq("k"), "sk")
    val committed = store.committedVersions("d")
    // fabricate the crash window: a version dir with its snapshot written
    // but whose pointer swap never executed
    val orphan = java.nio.file.Paths.get(root, "d", "v99")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("_MANIFEST_SNAPSHOT"),
      "maxsk=9\n0 99\n#parent=-1\n".getBytes)
    assert(store.committedVersions("d") === committed,
      "an unswapped snapshot must not appear in the commit chain")
    intercept[java.nio.file.NoSuchFileException] { store.readAsOf("d", 99L) }
  }

  test("diffVersions emits exactly the insert/update/delete set between commits") {
    val store = new BucketedMergeWriter(spark, freshRoot(), nBuckets = 4)
    store.mergeDim("d", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "attr"),
      Seq("k"), "sk")
    store.mergeDim("d", Seq((2L, "b2"), (4L, "d")).toDF("k", "attr"), Seq("k"), "sk")
    val Seq(v1, v2) = store.committedVersions("d")

    val d12 = store.diffVersions("d", v1, v2, Seq("k"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("_change")).toMap
    // merge semantics never delete: k=2 updated, k=4 inserted, 1/3 silent
    assert(d12 === Map(2L -> "update", 4L -> "insert"))

    // replaceTable DOES delete by omission — the diff must surface it
    store.replaceTable("d", Seq((2L, 2L, "b2"), (4L, 4L, "d")).toDF("k", "sk", "attr"),
      Seq("k"))
    val v3 = store.committedVersions("d").max
    val d23 = store.diffVersions("d", v2, v3, Seq("k"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("_change")).toMap
    assert(d23 === Map(1L -> "delete", 3L -> "delete"))
    // self-diff is empty; sk changes alone count as updates (struct equality)
    assert(store.diffVersions("d", v3, v3, Seq("k")).count() === 0L)
  }

  test("zone maps skip non-intersecting versions of an append table") {
    val root = freshRoot()
    val store = new BucketedMergeWriter(spark, root, nBuckets = 4,
      statsColumns = Seq("ts"))
    // three appends with disjoint time ranges — the audit-log shape
    store.appendTable("log", Seq((1L, 100.0), (2L, 150.0)).toDF("id", "ts"))
    store.appendTable("log", Seq((3L, 200.0), (4L, 250.0)).toDF("id", "ts"))
    store.appendTable("log", Seq((5L, 300.0), (6L, 350.0)).toDF("id", "ts"))

    val mid = store.readRange("log", "ts", 200.0, 260.0)
    assert(mid.collect().map(_.getAs[Long]("id")).toSet === Set(3L, 4L))
    // skipping is physical: only the middle version's files are opened
    val versionsRead = mid.inputFiles.map(_.split("/v")(1).split("/")(0)).toSet
    assert(versionsRead.size === 1,
      s"expected one version dir scanned, got $versionsRead")

    // full range reads everything; result identical to unpruned filter
    val all = store.readRange("log", "ts", 0.0, 1000.0)
    assert(all.count() === 6)
    val unpruned = store.read("log").filter(col("ts").between(200.0, 260.0))
      .collect().map(_.getAs[Long]("id")).toSet
    assert(unpruned === Set(3L, 4L), "fixture: exact filter agrees")

    // empty intersection: no files opened at all, empty result, schema kept
    val none = store.readRange("log", "ts", 5000.0, 6000.0)
    assert(none.count() === 0 && none.columns.contains("id"))
  }

  test("zone maps prune merged tables too, and missing stats stay safe") {
    val root = freshRoot()
    val store = new BucketedMergeWriter(spark, root, nBuckets = 4,
      statsColumns = Seq("v"))
    store.mergeFact("f", (1L to 40L).map(i => (i, i.toDouble)).toDF("id", "v"), Seq("id"))
    val sub = store.readRange("f", "v", 10.0, 12.0)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(sub === Set(10L, 11L, 12L))
    // a column with no recorded stats falls back to scan-everything
    val noStats = store.readRange("f", "id", 10.0, 12.0)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(noStats === Set(10L, 11L, 12L))

    // a store WITHOUT statsColumns writes no stats; readRange still correct
    val plain = new BucketedMergeWriter(spark, freshRoot(), nBuckets = 4)
    plain.mergeFact("f", (1L to 10L).map(i => (i, i.toDouble)).toDF("id", "v"), Seq("id"))
    assert(plain.readRange("f", "v", 3.0, 4.0)
      .collect().map(_.getAs[Long]("id")).toSet === Set(3L, 4L))
  }

  test("NaN values never poison zone maps into pruning live rows") {
    val store = new BucketedMergeWriter(spark, freshRoot(), nBuckets = 2,
      statsColumns = Seq("v"))
    // every bucket holds a NaN beside in-range values: max() over the raw
    // column would record NaN and a naive keep test would DROP the bucket
    store.appendTable("m", Seq((1L, 10.0), (2L, Double.NaN), (3L, 11.0),
      (4L, Double.NaN), (5L, 12.0), (6L, 13.0)).toDF("id", "v"))
    val got = store.readRange("m", "v", 10.0, 13.0)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got === Set(1L, 3L, 5L, 6L),
      "in-range rows must survive NaN neighbors (and NaN itself never " +
        "matches a finite range)")
    // an all-NaN commit carries no stats entry -> conservatively scanned
    store.appendTable("m", Seq((7L, Double.NaN)).toDF("id", "v"))
    assert(store.readRange("m", "v", 0.0, 100.0).count() === 4L)
  }

  test("NULL natural keys upsert null-safely in the bucketed store") {
    val store = new BucketedMergeWriter(spark, freshRoot(), nBuckets = 4)
    val b = Seq((Some(1L), "a"), (None, "nullkey")).toDF("k", "attr")
    store.mergeDim("d", b, Seq("k"), "sk")
    val sk0 = store.read("d").filter(col("k").isNull).head().getAs[Long]("sk")
    store.mergeDim("d", b, Seq("k"), "sk")
    assert(store.read("d").count() === 2, "replay is a no-op on NULL keys too")
    assert(store.read("d").filter(col("k").isNull).head().getAs[Long]("sk") === sk0)
    val f = Seq((Some(1L), Option.empty[String], 5.0)).toDF("a", "b", "v")
    store.mergeFact("f2", f, Seq("a", "b"))
    store.mergeFact("f2", f.withColumn("v", lit(9.0)), Seq("a", "b"))
    val rows = store.read("f2").collect()
    assert(rows.length === 1 && rows.head.getAs[Double]("v") === 9.0,
      "NULL key component must update in place, not duplicate")
  }
}
