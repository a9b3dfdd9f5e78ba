package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Frequent-items (heavy hitters) at scale: Misra-Gries candidate
  * summaries per partition, then ONE exact recount of the (small)
  * candidate set.
  *
  * Why not a plain `groupBy(item).count()`? That shuffles EVERY distinct
  * item — at 100 TB a token-frequency query would shuffle the whole vocab
  * including the billions-of-singletons tail. Misra-Gries bounds the
  * per-partition state to k counters and GUARANTEES every item with
  * global count > N/k survives in at least one partition summary (if an
  * item's count were ≤ n_p/k in every partition, summing gives ≤ N/k —
  * pigeonhole), so the candidate union (≤ k × partitions items, tiny) is
  * a superset of the answer. The exact recount then broadcast-joins that
  * candidate set against the items and keeps `count × k > N` — the
  * output is EXACT (counts and membership), which is what lets the DuckDB
  * oracle verify it with a plain GROUP BY/HAVING.
  *
  * Shuffle ledger: pass 1 is map-only (summaries collected to the driver
  * via the candidate distinct — ≤ k·P rows); pass 2 shuffles only
  * candidate-matching items (partial aggregation collapses them
  * map-side). The total N rides pass 1's job as an Observation — no
  * separate count scan.
  */
object HeavyHitters {

  /** Misra-Gries summary of one partition: at most k-1 counters; every
    * item with partition count > n_p/k is guaranteed present. Amortized
    * O(1) per element: each decrement-all pairs k increments with k
    * decrements. */
  private[graft] def mgSummary(k: Int, it: Iterator[String]): Iterator[String] = {
    val counts = mutable.HashMap.empty[String, Long]
    while (it.hasNext) {
      val x = it.next()
      counts.get(x) match {
        case Some(c) => counts.update(x, c + 1)
        case None if counts.size < k - 1 => counts.update(x, 1L)
        case None =>
          val dead = mutable.ArrayBuffer.empty[String]
          counts.mapValuesInPlace((_, c) => c - 1)
          counts.foreach { case (key, c) => if (c == 0L) dead += key }
          dead.foreach(counts.remove)
      }
    }
    counts.keysIterator
  }

  /** Exact items with `count × k > N` (frequency > 1/k of the corpus),
    * via MG candidates + recount. `itemCol` is cast to string; NULL items
    * are ignored (like SQL aggregates), and N counts non-null rows only —
    * so the output matches `GROUP BY item HAVING count(*)·k > N` over the
    * non-null stream exactly. (Counting nulls instead would silently
    * understate every threshold while the join could never report them.) */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val s = items.sparkSession
    import s.implicits._
    val strItems = items.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
    val obs = Observation()
    // candidates + total N in ONE pass (N rides the job as a metric)
    val cands = strItems
      .observe(obs, count(lit(1)).as("n"))
      .as[String]
      .mapPartitions(it => mgSummary(k, it))
      .toDF("item").distinct()
      .materialized
    val n = graft.plans.Observed.poll(obs).flatMap(_.get("n"))
      .map(_.asInstanceOf[Long]).getOrElse(strItems.count())
    strItems.join(broadcast(cands), "item")
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(k.toLong) > lit(n))
  }
}
