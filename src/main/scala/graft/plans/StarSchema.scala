package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Cleanse._

/** Star-schema derivation from the cleansed wide feed (SURVEY.md §1.3).
  *
  * Every builder is set-oriented: last-write-wins collapse is a single
  * `max_by(struct(attrs), _seq)` aggregation per natural key (one shuffle,
  * map-side partial agg) — NOT the reference's per-record upsert round-trip
  * (reference: flink/stream_to_star.py:99-282), which is the anti-pattern
  * that cannot scale. At 100 TB each dim build is one hash-aggregate over
  * the feed with only the needed columns scanned.
  */
object StarSchema {

  /** A5 — last-write-wins collapse: one row per natural key, attributes
    * taken from the record with the highest `seqCol`. Implemented as
    * max_by(struct(...)) which partial-aggregates map-side (cheaper than
    * the window/row_number formulation: no total sort per key, and the
    * combiner collapses duplicates before the shuffle).
    */
  def lastWriteWins(df: DataFrame, natKey: Seq[String], seqCol: String): DataFrame = {
    val attrs = df.columns.filterNot(c => natKey.contains(c) || c == seqCol)
    val packed = struct((attrs.toIndexedSeq :+ seqCol).map(col): _*)
    df.groupBy(natKey.map(col): _*)
      .agg(max_by(packed, col(seqCol)).as("_last"))
      .select(natKey.map(col) ++ attrs.map(a => col(s"_last.$a").as(a)): _*)
  }

  // ---- cleansing projections per dimension (SURVEY.md §1.3 field map) ----

  /** P7 — alias-coalesce over whichever alternative spellings exist in this
    * feed's schema (reference tolerates several, flink/stream_to_star.py:100). */
  private def aliasKeyIn(feed: DataFrame, names: String*): Column = {
    val present = names.filter(feed.columns.contains(_)).map(col)
    require(present.nonEmpty,
      s"none of the key alias spellings [${names.mkString(", ")}] exist in " +
        s"the feed schema [${feed.columns.mkString(", ")}] — an empty " +
        "coalesce would die with an opaque analysis error")
    aliasKey(present: _*)
  }

  /** Cleansed dim_customer source rows (P2/P5/P6/P7/P8). */
  def customerRows(feed: DataFrame): DataFrame = feed
    .select(
      // alias chain ends with "id": the reference's coalesce falls back to
      // the sale id when the dedicated customer fields are all blank
      // (reference: flink/stream_to_star.py:100)
      aliasKeyIn(feed, "sale_customer_id", "customer_id", "customer_key", "id")
        .as("source_customer_id"),
      fullName(col("customer_first_name"), col("customer_last_name")).as("customer_name"),
      trimToNull(col("customer_country")).as("country"),
      toIntLossy(col("customer_age")).cast("int").as("age"),
      trimToNull(col("customer_email")).as("email"),
      col("_seq"))
    .filter(col("source_customer_id").isNotNull)

  def sellerRows(feed: DataFrame): DataFrame = feed
    .select(
      aliasKeyIn(feed, "sale_seller_id", "seller_id").as("source_seller_id"),
      fullName(col("seller_first_name"), col("seller_last_name")).as("seller_name"),
      trimToNull(col("seller_country")).as("country"),
      trimToNull(col("seller_email")).as("email"),
      col("_seq"))
    .filter(col("source_seller_id").isNotNull)

  def productRows(feed: DataFrame): DataFrame = feed
    .select(
      aliasKeyIn(feed, "sale_product_id", "product_id").as("source_product_id"),
      trimToNull(col("product_name")).as("product_name"),
      trimToNull(col("product_category")).as("category"),
      toDecimalLossy(col("product_price"), 12, 2).as("price"),
      toDecimalLossy(col("product_rating"), 3, 1).as("rating"),
      toIntLossy(col("product_reviews")).cast("int").as("reviews"),
      col("_seq"))
    .filter(col("source_product_id").isNotNull)

  def storeRows(feed: DataFrame): DataFrame = feed
    .select(
      trimToNull(col("store_name")).as("store_name"),
      trimToNull(col("store_city")).as("city"),
      trimToNull(col("store_country")).as("country"),
      trimToNull(col("store_email")).as("email"),
      col("_seq"))
    .filter(col("store_name").isNotNull)

  def supplierRows(feed: DataFrame): DataFrame = feed
    .select(
      trimToNull(col("supplier_name")).as("supplier_name"),
      trimToNull(col("supplier_country")).as("country"),
      trimToNull(col("supplier_email")).as("email"),
      col("_seq"))
    .filter(col("supplier_name").isNotNull)

  /** P4/P10 — dim_date: parse + derive parts; one row per distinct date. */
  def dateRows(feed: DataFrame): DataFrame = feed
    .select(parseDateMulti(col("sale_date")).as("sale_date"))
    .filter(col("sale_date").isNotNull)
    .distinct()
    .select(
      col("sale_date"),
      year(col("sale_date")).as("year"),
      month(col("sale_date")).as("month"),
      dayofmonth(col("sale_date")).as("day"))

  /** Cleansed fact rows (P2/P7/P8/P9): natural keys + measures, keeps rows
    * with NULL dim keys (LEFT-join semantics downstream, J1).
    *
    * The natural keys use the SAME alias-coalesce chains as the dim
    * builders: the reference stitches fact FKs from the dim upserts, which
    * resolved their keys through those chains (reference:
    * flink/stream_to_star.py:100,128,154,248 feeding :286-295) — a fact row
    * with a blank `sale_customer_id` still joins the dim row derived from
    * its `id` fallback.
    */
  def factRows(feed: DataFrame): DataFrame = feed
    .select(
      aliasKeyIn(feed, "id", "sale_id").as("source_sale_id"),
      aliasKeyIn(feed, "sale_customer_id", "customer_id", "customer_key", "id")
        .as("source_customer_id"),
      aliasKeyIn(feed, "sale_seller_id", "seller_id").as("source_seller_id"),
      aliasKeyIn(feed, "sale_product_id", "product_id").as("source_product_id"),
      trimToNull(col("store_name")).as("store_name"),
      trimToNull(col("supplier_name")).as("supplier_name"),
      parseDateMulti(col("sale_date")).as("sale_date"),
      defaultZeroLong(col("sale_quantity")).cast("int").as("sale_quantity"),
      coalesce(toDecimalLossy(col("sale_total_price"), 14, 2),
        lit(0.0).cast("decimal(14,2)")).as("sale_total_price"),
      col("_seq"))
    .filter(col("source_sale_id").isNotNull)

  /** J1 — resolve the 6 surrogate FKs by broadcast LEFT joins against the
    * (small) dims. Dims are orders of magnitude smaller than the fact at
    * any scale, so every lookup is a broadcast hash join — zero shuffle of
    * the fact side. NULL natural keys yield NULL FKs (nullable FK columns,
    * reference: postgres/00_ddl_dw.sql:57-62).
    */
  def resolveFactKeys(
      fact: DataFrame,
      dimCustomer: DataFrame, dimSeller: DataFrame, dimProduct: DataFrame,
      dimStore: DataFrame, dimSupplier: DataFrame, dimDate: DataFrame): DataFrame = {

    def lookup(f: DataFrame, dim: DataFrame, fk: String, natF: String,
               natD: String, sk: String): DataFrame =
      f.join(broadcast(dim.select(col(natD), col(sk))),
             f(natF) === dim(natD), "left")
        .drop(dim(natD))
        .withColumnRenamed(sk, fk)

    var out = fact
    out = lookup(out, dimCustomer, "customer_key", "source_customer_id", "source_customer_id", "customer_sk")
    out = lookup(out, dimSeller,   "seller_key",   "source_seller_id",   "source_seller_id",   "seller_sk")
    out = lookup(out, dimProduct,  "product_key",  "source_product_id",  "source_product_id",  "product_sk")
    out = lookup(out, dimStore,    "store_key",    "store_name",         "store_name",         "store_sk")
    out = lookup(out, dimSupplier, "supplier_key", "supplier_name",      "supplier_name",      "supplier_sk")
    out = lookup(out, dimDate,     "date_key",     "sale_date",          "sale_date",          "date_sk")
    out.select(
      col("source_sale_id"),
      col("customer_key"), col("seller_key"), col("product_key"),
      col("store_key"), col("supplier_key"), col("date_key"),
      col("sale_quantity"), col("sale_total_price"))
  }
}
