package graft

import org.apache.spark.sql.functions._
import graft.functions.FeistelPermute

/** The epoch-shuffle primitive: feistel(id, seed) must be a true
  * bijection per seed (a collision would silently merge training rows
  * into one shard slot), distinct across seeds (or epochs would replay
  * the same order), and identical between the interpreted `nullSafeEval`
  * and the codegen'd path Spark actually runs. */
class FeistelSpec extends SparkSpec {
  import spark.implicits._

  test("feistel is a bijection on the full 2^(2h) domain (h=6, exhaustive)") {
    val h = 6
    val n = 1 << (2 * h) // 4096
    for (seed <- Seq(0L, 17L, 7919L * 3 + 17)) {
      val seen = new Array[Boolean](n)
      var i = 0
      while (i < n) {
        val p = FeistelPermute.permute(i.toLong, seed, h).toInt
        assert(p >= 0 && p < n, s"out of domain: $i -> $p")
        assert(!seen(p), s"collision at seed=$seed: image $p hit twice")
        seen(p) = true
        i += 1
      }
    }
  }

  test("different seeds give different orders; same seed is reproducible") {
    // halfBits = 16 is the production width — the width where a round
    // function that drops the seed's low bits makes ADJACENT seeds
    // collide (the bug the ·65537 spread fixes); check every pair in a
    // small seed neighborhood, not just one
    val h = 16
    val ids = (0L until 1024L)
    def order(seed: Long) = ids.map(FeistelPermute.permute(_, seed, h))
    assert(order(17L) == order(17L), "same seed must replay identically")
    val orders = (0L until 8L).map(s => order(s))
    for (i <- orders.indices; j <- orders.indices if i < j)
      assert(orders(i) != orders(j), s"seeds $i and $j must not collide")
    // epoch-style seeds too (the q240 shape)
    assert(order(7919L + 17L) != order(2 * 7919L + 17L))
    // EVERY width separates adjacent seeds — a 16-pinned spread constant
    // left the collision alive for halfBits 17..23 (97% identical
    // permutations at 23); the width-scaled spread closes it
    for (hb <- Seq(17, 20, 23)) {
      val ids = (0L until 4096L)
      def o(seed: Long) = ids.map(FeistelPermute.permute(_, seed, hb))
      val (a, b) = (o(17L), o(18L))
      val same = a.zip(b).count { case (x, y) => x == y }
      assert(same < ids.size / 10,
        s"halfBits=$hb: adjacent seeds nearly collide ($same/${ids.size} fixed points)")
    }
  }

  test("codegen'd column path matches the interpreted walk, and SQL " +
       "feistel32 is registered") {
    val df = spark.range(0, 5000).select(col("id"),
      FeistelPermute.feistel(col("id"), lit(42L)).as("pos"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getLong(1) == FeistelPermute.permute(r.getLong(0), 42L, 16))
    }
    // distinctness over the sample (bijection ⇒ no collisions)
    assert(rows.map(_.getLong(1)).distinct.length == rows.length)
    val viaSql = spark.sql("SELECT feistel32(7L, 42L) AS p").head.getLong(0)
    assert(viaSql == FeistelPermute.permute(7L, 42L, 16))
  }

  test("writeEpochShuffled: reproducible from the seed, reshuffled across seeds, balanced") {
    import graft.plans.Layout
    val df = spark.range(0, 4096).withColumn("v", col("id") * 3)
    def readOrder(dir: String): Seq[Long] = {
      // file order = range-partition order; rows inside are pos-sorted
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
      files.flatMap(f => spark.read.parquet(f).select("id")
        .collect().map(_.getLong(0))).toSeq
    }
    val d1 = java.nio.file.Files.createTempDirectory("graft-ep1").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft-ep2").toString
    val d3 = java.nio.file.Files.createTempDirectory("graft-ep3").toString
    Layout.writeEpochShuffled(df, "id", seed = 17L, d1, shards = 8)
    Layout.writeEpochShuffled(df.repartition(13), "id", seed = 17L, d2, shards = 8)
    Layout.writeEpochShuffled(df, "id", seed = 18L, d3, shards = 8)
    val (o1, o2, o3) = (readOrder(d1), readOrder(d2), readOrder(d3))
    assert(o1 === o2, "same seed replays the identical epoch order under any input partitioning")
    assert(o1 !== o3, "a new seed is a genuinely different epoch order")
    assert(o1.sorted === (0L until 4096L), "a permutation: every row exactly once")
    assert(o1 !== (0L until 4096L), "and NOT the identity order")
    // range-cut permutation positions deal near-equal shards
    val sizes = new java.io.File(d1).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      .map(f => spark.read.parquet(f).count())
    assert(sizes.sum === 4096L && sizes.forall(s => s > 256 && s < 768),
      s"shards near-balanced: ${sizes.mkString(",")}")
  }

  test("shards dealt by pmod(pos, k) are balanced for a contiguous id range") {
    val k = 8
    val counts = spark.range(0, 65536)
      .select(pmod(FeistelPermute.feistel(col("id"), lit(99L)), lit(k.toLong)).as("s"))
      .groupBy("s").count().collect().map(_.getLong(1))
    // ids 0..65535 is exactly a quarter of the 2^32 domain; a permutation
    // maps it to 65536 DISTINCT positions, so shard skew is bounded by the
    // permutation's spread — assert no shard deviates by more than 5%.
    val expected = 65536.0 / k
    counts.foreach(c => assert(math.abs(c - expected) / expected < 0.05,
      s"shard skew: $c vs $expected"))
  }
}
