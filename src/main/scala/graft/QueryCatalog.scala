package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Cleanse, Dedup, Multimodal, Similarity, TextAnalysis}
import graft.plans.{Integrity, StarSchema}

/** The driver-contract query inventory: one entry per implemented operator
  * from SURVEY.md §2 plus the training-data-pipeline operators, each with a
  * DuckDB-runnable oracle over the same parquet tables.
  *
  * Engine-parity rules used throughout (so the driver's hash compare is
  * exact, not approximately-equal):
  *   - money/discount sums go through DECIMAL(18,2) (exact, order-
  *     independent) and only the final scalar is cast to DOUBLE;
  *   - whole-valued doubles (l_quantity) sum exactly in double/bigint;
  *   - every integer output is BIGINT, never INT (dtype-stable);
  *   - hashes are md5 hex (canonical in both engines);
  *   - cosines are ranked and emitted as round(x, 6) so a last-ulp
  *     difference in float summation order cannot flip a rank;
  *   - all rows of a result are deterministic as a SET; the driver sorts
  *     before hashing.
  */
object QueryCatalog {

  /** Testdata loader. `events.ts` is parquet TIMESTAMP(NANOS), which Spark
    * cannot represent natively: the session reads it as a nanos long
    * (spark.sql.legacy.parquet.nanosAsLong) and we truncate to a µs
    * timestamp here — the same floor DuckDB applies on
    * `CAST(ts_ns AS TIMESTAMP)`, so both engines see identical values. */
  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** DECIMAL(18,2) view of a 2-dp double column: exact, associative sum. */
  private def dec2(c: Column): Column = c.cast("decimal(18,2)")

  // =========================================================================
  // Relational core (SURVEY.md §2.2-§2.5: P*, J*, A*)
  // =========================================================================

  /** A1/A5-adjacent pricing summary (hash-agg, map-side partial agg). */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec2(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        avg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
      |  avg(l_quantity) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  /** J1-style star join: fact joins two broadcast dims (supplier→nation),
    * revenue per nation. At 100 TB: dims broadcast, fact never shuffles
    * before the aggregate. */
  def q02RevenueByNation(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  val q02Sql: String =
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2""".stripMargin

  /** Fact→dim join + multi-metric agg by segment. */
  def q03SegmentSales(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total_price"))

  val q03Sql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  count(DISTINCT o_custkey) AS n_customers,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin

  /** Window/top-k: top-3 orders per customer (rank ties broken on key so
    * the result is a deterministic set). */
  def q04TopOrdersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  }

  val q04Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
      |FROM orders
      |QUALIFY rn <= 3""".stripMargin

  /** A1/A2 — plain and distinct counts. */
  def q05OrderCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").agg(
      count(lit(1)).as("n_orders"),
      countDistinct(col("o_custkey")).as("n_customers"))

  val q05Sql: String =
    "SELECT count(*) AS n_orders, count(DISTINCT o_custkey) AS n_customers FROM orders"

  /** A4 — conditional aggregation (SUM CASE WHEN). */
  def q06ConditionalAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      sum(when(col("l_returnflag") === "R", 1).otherwise(0)).as("n_returned"),
      sum(when(col("l_discount") > 0.05, 1).otherwise(0)).as("n_discounted"),
      sum(when(col("l_shipdate").isNull, 1).otherwise(0)).as("n_null_ship"))

  val q06Sql: String =
    """SELECT
      |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
      |  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
      |  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_ship
      |FROM lineitem""".stripMargin

  /** Set ops — customers that never placed an order (EXCEPT = distinct). */
  def q07CustomersWithoutOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_custkey"))
      .except(t(s, dir, "orders").select(col("o_custkey").as("c_custkey")))

  val q07Sql: String =
    "SELECT c_custkey FROM customer EXCEPT SELECT o_custkey AS c_custkey FROM orders"

  /** Rollup (grouping sets): subtotal rows coalesced to 'ALL'. */
  def q08RollupCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("qty"))

  val q08Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      |  count(*) AS n, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  /** A5 — last-write-wins collapse over the events stream table: one row
    * per user, attributes from the highest event_id. Exercises the exact
    * operator the star pipeline uses (max_by(struct, seq): one shuffle,
    * map-side partial agg). */
  def q09LatestEventPerUser(s: SparkSession, dir: String): DataFrame =
    StarSchema.lastWriteWins(t(s, dir, "events"), Seq("user_id"), "event_id")

  val q09Sql: String =
    """SELECT user_id,
      |  arg_max(CAST(ts AS TIMESTAMP), event_id) AS ts,
      |  arg_max(event_type, event_id) AS event_type,
      |  arg_max(value, event_id) AS value,
      |  arg_max(props, event_id) AS props
      |FROM events GROUP BY user_id""".stripMargin

  /** P10 — date-part extraction + counts per day. */
  def q10EventsByDay(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(
        year(col("ts")).cast("long").as("y"),
        month(col("ts")).cast("long").as("m"),
        dayofmonth(col("ts")).cast("long").as("d"))
      .agg(count(lit(1)).as("n"), sum(dec2(col("value"))).cast("double").as("total_value"))

  val q10Sql: String =
    """SELECT CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m,
      |  CAST(day(ts) AS BIGINT) AS d, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  /** P2 — lossy int coercion over real columns rendered as strings:
    * "20.0"→20, garbage→NULL, overflow→NULL (never a crash: ANSI-safe). */
  def q11IntCoercion(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
      Cleanse.toIntLossy(col("l_quantity").cast("string")).as("qty_int"),
      Cleanse.toIntLossy(col("l_returnflag")).as("flag_int"),
      Cleanse.toIntLossy(concat(col("l_extendedprice").cast("string"), lit("e290"))).as("overflow_int"))

  val q11Sql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |  TRY_CAST(trunc(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE)) AS BIGINT) AS qty_int,
      |  TRY_CAST(trunc(TRY_CAST(l_returnflag AS DOUBLE)) AS BIGINT) AS flag_int,
      |  TRY_CAST(trunc(TRY_CAST(CAST(l_extendedprice AS VARCHAR) || 'e290' AS DOUBLE)) AS BIGINT) AS overflow_int
      |FROM lineitem""".stripMargin

  /** P4 — 3-format date parse: render each ts in one of the reference's
    * three formats by row, parse back through the coalesce chain. */
  def q12MultiFormatDateParse(s: SparkSession, dir: String): DataFrame = {
    val f = when(col("event_id") % 3 === 0, date_format(col("ts"), "M/d/yyyy"))
      .when(col("event_id") % 3 === 1, date_format(col("ts"), "yyyy-MM-dd"))
      .otherwise(date_format(col("ts"), "d.M.yyyy"))
    t(s, dir, "events").select(
      col("event_id"),
      Cleanse.parseDateMulti(f).as("parsed"))
  }

  val q12Sql: String =
    """WITH f AS (SELECT event_id,
      |  CASE CAST(event_id % 3 AS INT)
      |    WHEN 0 THEN strftime(ts, '%-m/%-d/%Y')
      |    WHEN 1 THEN strftime(ts, '%Y-%m-%d')
      |    ELSE strftime(ts, '%-d.%-m.%Y') END AS fs
      |  FROM events)
      |SELECT event_id,
      |  CAST(coalesce(try_strptime(fs, '%-m/%-d/%Y'), try_strptime(fs, '%Y-%m-%d'),
      |                try_strptime(fs, '%-d.%-m.%Y')) AS DATE) AS parsed
      |FROM f""".stripMargin

  /** P5/P6 — trim-to-null + name concat over part names. */
  def q13NameConcat(s: SparkSession, dir: String): DataFrame = {
    val words = split(col("p_name"), " ")
    t(s, dir, "part").select(
      col("p_partkey"),
      Cleanse.fullName(element_at(words, 1), element_at(words, 2)).as("short_name"),
      Cleanse.trimToNull(col("p_brand")).as("brand"))
  }

  val q13Sql: String =
    """SELECT p_partkey,
      |  nullif(trim(concat_ws(' ', trim(coalesce(string_split(p_name, ' ')[1], '')),
      |                             trim(coalesce(string_split(p_name, ' ')[2], '')))), '') AS short_name,
      |  nullif(trim(p_brand), '') AS brand
      |FROM part""".stripMargin

  /** P7 — field-alias coalesce: first alias is genuinely missing (absent
    * JSON key), falls through to the second. */
  def q14AliasCoalesce(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      Cleanse.aliasKey(
        get_json_object(col("props"), "$.missing"),
        col("user_id").cast("string")).as("resolved_key"))

  val q14Sql: String =
    """SELECT event_id,
      |  TRY_CAST(trunc(TRY_CAST(coalesce(
      |    nullif(trim(json_extract_string(props, '$.missing')), ''),
      |    nullif(trim(CAST(user_id AS VARCHAR)), '')) AS DOUBLE)) AS BIGINT) AS resolved_key
      |FROM events""".stripMargin

  /** P9 — default-on-null measures. */
  def q15DefaultZero(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
      Cleanse.defaultZeroLong(col("l_returnflag")).as("garbage_to_zero"),
      Cleanse.defaultZeroDouble(col("l_discount").cast("string")).as("roundtrip_discount"))

  val q15Sql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |  coalesce(TRY_CAST(trunc(TRY_CAST(l_returnflag AS DOUBLE)) AS BIGINT), 0) AS garbage_to_zero,
      |  coalesce(TRY_CAST(CAST(l_discount AS VARCHAR) AS DOUBLE), 0.0) AS roundtrip_discount
      |FROM lineitem""".stripMargin

  /** P1 — JSON field extraction from the events props column. */
  def q16JsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").try_cast("long").as("k"))

  val q16Sql: String =
    "SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events"

  /** J2/A4 — referential-integrity audit of the testdata star. */
  def q17IntegrityAudit(s: SparkSession, dir: String): DataFrame =
    Integrity.auditDf(t(s, dir, "lineitem"), Seq(
      ("part", t(s, dir, "part"), "l_partkey", "p_partkey"),
      ("supplier", t(s, dir, "supplier"), "l_suppkey", "s_suppkey"),
      ("orders", t(s, dir, "orders"), "l_orderkey", "o_orderkey")))

  val q17Sql: String =
    """SELECT
      |  CAST(sum(CASE WHEN l_partkey IS NOT NULL AND p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing_part,
      |  CAST(sum(CASE WHEN l_suppkey IS NOT NULL AND s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing_supplier,
      |  CAST(sum(CASE WHEN l_orderkey IS NOT NULL AND o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing_orders
      |FROM lineitem
      |LEFT JOIN part ON l_partkey = p_partkey
      |LEFT JOIN supplier ON l_suppkey = s_suppkey
      |LEFT JOIN orders ON l_orderkey = o_orderkey""".stripMargin

  /** A2/A3 — uniqueness invariant on the events stream table. */
  def q18EventUniqueness(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("event_id")).as("n_ids"))

  val q18Sql: String =
    "SELECT count(*) AS n_rows, count(DISTINCT event_id) AS n_ids FROM events"

  /** P8-style filter + projection, pushdown-friendly. */
  def q19PurchaseFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_type") === "purchase" && col("value") > 100.0)
      .select(col("event_id"), col("user_id"), col("value"))

  val q19Sql: String =
    "SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase' AND value > 100.0"

  // =========================================================================
  // Registry
  // =========================================================================

  /** name → (query fn, oracle SQL or None for rows-only checks). */
  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q01_pricing_summary", q01PricingSummary _, Some(q01Sql)),
    ("q02_revenue_by_nation", q02RevenueByNation _, Some(q02Sql)),
    ("q03_segment_sales", q03SegmentSales _, Some(q03Sql)),
    ("q04_top_orders_per_customer", q04TopOrdersPerCustomer _, Some(q04Sql)),
    ("q05_order_counts", q05OrderCounts _, Some(q05Sql)),
    ("q06_conditional_agg", q06ConditionalAgg _, Some(q06Sql)),
    ("q07_customers_without_orders", q07CustomersWithoutOrders _, Some(q07Sql)),
    ("q08_rollup_counts", q08RollupCounts _, Some(q08Sql)),
    ("q09_latest_event_per_user", q09LatestEventPerUser _, Some(q09Sql)),
    ("q10_events_by_day", q10EventsByDay _, Some(q10Sql)),
    ("q11_int_coercion", q11IntCoercion _, Some(q11Sql)),
    ("q12_multiformat_date_parse", q12MultiFormatDateParse _, Some(q12Sql)),
    ("q13_name_concat", q13NameConcat _, Some(q13Sql)),
    ("q14_alias_coalesce", q14AliasCoalesce _, Some(q14Sql)),
    ("q15_default_zero", q15DefaultZero _, Some(q15Sql)),
    ("q16_json_extract", q16JsonExtract _, Some(q16Sql)),
    ("q17_integrity_audit", q17IntegrityAudit _, Some(q17Sql)),
    ("q18_event_uniqueness", q18EventUniqueness _, Some(q18Sql)),
    ("q19_purchase_filter", q19PurchaseFilter _, Some(q19Sql)))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    entries.map { case (n, f, _) => n -> f }.toMap

  def oracleSql: Map[String, String] =
    entries.flatMap { case (n, _, o) => o.map(n -> _) }.toMap
}
