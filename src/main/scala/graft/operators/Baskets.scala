package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining: pairwise association rules
  * (support / confidence / lift) over (basket, item) rows — the classic
  * "parts bought together" curation signal, and the same shape a training
  * pipeline uses for tag/label co-occurrence audits.
  *
  * Engine-parity discipline: all counts are BIGINT folds; confidence is
  * ONE double division rounded at readout; the lift verdict is the exact
  * integer cross-multiplication `pair·N > cnt_a·cnt_b` (never a float
  * ratio), so the DuckDB oracle replays every cell bit-for-bit.
  */
object Baskets {

  /** Pairwise association rules with support ≥ `minPairCount`.
    *
    * Plan shape (scale-first): the item×item pair generation is a
    * SELF-JOIN ON THE BASKET KEY — co-partitioned by basket, never a
    * cartesian — so a basket of B items fans out B·(B−1)/2 pair rows and
    * nothing else. A pathological mega-basket would fan quadratically, so
    * baskets over `maxBasketItems` are dropped up front by a
    * basket-partitioned count window (the same hot-key cap discipline as
    * the LSH bucket cap; TPC-H-shaped orders top out at ~11 distinct
    * parts, so nothing is dropped at the catalog's data). Pair counts and
    * the two per-item frequency joins shuffle on (item_a,item_b) / item —
    * all key-partitioned; the basket total rides a one-row broadcast.
    *
    * Output: `item_a < item_b`, `pair_cnt`, `cnt_a`, `cnt_b`,
    * `n_baskets`, `confidence` = round(pair/cnt_a, 6) (P(b|a), the
    * a→b rule), `lift_gt1` = exact `pair·N > cnt_a·cnt_b`.
    */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
                       minPairCount: Long = 2L,
                       maxBasketItems: Int = 256): DataFrame = {
    val basket = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("_b"), col(itemCol).as("_i"))
      .distinct()
    val sized = basket
      .withColumn("_bs", count(lit(1)).over(Window.partitionBy(col("_b"))))
      .filter(col("_bs") <= maxBasketItems)
      .drop("_bs")
    val nBaskets = sized.agg(countDistinct(col("_b")).as("n_baskets"))
    val itemCnt = sized.groupBy(col("_i")).agg(count(lit(1)).as("_c"))
    val a = sized.select(col("_b"), col("_i").as("item_a"))
    val b = sized.select(col("_b").as("_b2"), col("_i").as("item_b"))
    val pairs = a
      .join(b, col("_b") === col("_b2") && col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= minPairCount)
    pairs
      .join(itemCnt.select(col("_i").as("item_a"), col("_c").as("cnt_a")), "item_a")
      .join(itemCnt.select(col("_i").as("item_b"), col("_c").as("cnt_b")), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("pair_cnt"),
        col("cnt_a"), col("cnt_b"), col("n_baskets"),
        round(col("pair_cnt").cast("double") / col("cnt_a"), 6).as("confidence"),
        // DECIMAL cross-products (the twoProportionTest discipline):
        // cnt_a*cnt_b wraps a long silently past ~3e9 each — at the scale
        // this module targets the lift verdict would flip, where decimal
        // NULLs loudly
        (col("pair_cnt").cast("decimal(38,0)") *
            col("n_baskets").cast("decimal(38,0)") >
          col("cnt_a").cast("decimal(38,0)") *
            col("cnt_b").cast("decimal(38,0)"))
          .as("lift_gt1"))
  }
}
