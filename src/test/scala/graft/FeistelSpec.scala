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
    val h = 8
    val ids = (0L until 1024L)
    val a = ids.map(FeistelPermute.permute(_, 17L, h))
    val b = ids.map(FeistelPermute.permute(_, 17L, h))
    val c = ids.map(FeistelPermute.permute(_, 18L, h))
    assert(a == b, "same seed must replay the identical permutation")
    assert(a != c, "adjacent seeds must not produce the same permutation")
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
