package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Joins}
import graft.Materialize.MaterializeOps

/** Evidence generators for two VERDICT-r8 measurement asks (results in
  * SCALE.md):
  *
  *  1. PageRank convergence — `Dedup.pageRank` runs a FIXED 8 damped
  *     power-method iterations by design (downstream consumes only the
  *     ranking). This measures, per iteration count, how stable the
  *     ranking already is: top-20 overlap and full-ranking agreement vs a
  *     deep (12-iteration) reference, on the real LSH dup graph at sf0.1
  *     and at the 10× duplicate+perturb set — turning "8 is enough" from
  *     a design assertion into a measured claim.
  *
  *  2. Interval-overlap skew — `Joins.intervalOverlap` fans each row out
  *     to span/bucketWidth buckets. A skewed length distribution (99% of
  *     rows span ≤2 buckets, 1% span ~1000, just under the 4096 guard)
  *     is the adversarial case: this times the join at n and 10n rows to
  *     show cost stays ∝ rows × mean fan-out — the knob bounds the blowup
  *     and no per-key quadratic appears.
  *
  * Usage: runMain graft.ConvergenceCheck [docsDir ...]
  */
object ConvergenceCheck {
  def main(args: Array[String]): Unit = {
    val intervalsOnly = args.contains("--intervals-only")
    val dirs =
      if (args.filterNot(_.startsWith("--")).nonEmpty)
        args.filterNot(_.startsWith("--")).toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/scaledata")
    val spark = GraftSession.local("graft-convergence")

    // ---- 1. PageRank rank stability per iteration ----
    for (dir <- dirs if !intervalsOnly) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val edges = Dedup.minhashLsh(docs, n = 5, k = 12, bands = 4,
        threshold = 0.5, maxBucket = 100).materialized
      val maxIt = 12
      def ranking(it: Int): Seq[(Long, Double)] =
        Dedup.pageRank(edges, iterations = it)
          .orderBy(col("pr").desc, col("doc_id").asc)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val ref = ranking(maxIt)
      val n = ref.size
      val k = math.min(20, n)
      val refTop = ref.take(k).map(_._1).toSet
      println(s"[pagerank] $dir nodes=$n ref_iters=$maxIt")
      for (it <- 1 to maxIt) {
        // it == maxIt is byte-identical to ref (deterministic rounding +
        // tie-break) — reuse instead of re-running the costliest leg
        val r = if (it == maxIt) ref else ranking(it)
        val topOverlap = r.take(k).map(_._1).toSet.intersect(refTop).size.toDouble / k
        val agree = r.map(_._1).zip(ref.map(_._1)).count { case (a, b) => a == b }
          .toDouble / n
        println(f"[pagerank] $dir it=$it%2d top$k%d_overlap=$topOverlap%.3f full_rank_agree=$agree%.3f")
      }
    }

    // ---- 2. Skewed interval-overlap scaling ----
    // left: 99% span 50 (1-2 buckets at width 100), 1% span 100,000
    // (~1001 buckets — under the 4096 guard); right: uniform span 50.
    // Start positions and keys are pure column math — deterministic.
    def skewedLeft(rows: Long) = spark.range(rows).select(
        (col("id") % 64).as("k"),
        (col("id") * 37 % 1000000).as("s"),
        (col("id") * 37 % 1000000 + when(pmod(col("id"), lit(100)) === 0,
          lit(100000L)).otherwise(lit(50L))).as("e"))
    def uniformRight(rows: Long) = spark.range(rows).select(
        (col("id") % 64).as("k"),
        ((col("id") * 91 + 17) % 1000000).as("rs"),
        (((col("id") * 91 + 17) % 1000000) + lit(50L)).as("re"))
    for (rows <- Seq(200000L, 2000000L)) {
      val secs = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        Joins.intervalOverlap(skewedLeft(rows), uniformRight(rows), Seq("k"),
            "s", "e", "rs", "re", bucketWidth = 100L)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[interval_skew] rows=$rows%8d  $secs%8.2f s (min of 2)")
    }
    spark.stop()
  }
}
