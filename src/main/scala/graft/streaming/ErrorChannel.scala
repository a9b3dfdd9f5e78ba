package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Cleanse

/** T8 — per-record error channel.
  *
  * The reference wraps each record's processing in try/except and emits a
  * per-record status string — "ok" or "error: <type>: <message>" — to the
  * console sink, dropping the record but keeping the stream alive
  * (reference: flink/stream_to_star.py:284-298, wired :320). A PERMISSIVE
  * CSV read + try_cast alone would silently null bad data instead; this
  * module makes the rejection explicit and routable to a dead-letter sink.
  *
  * A record is an error when:
  *   - the parser could not parse it at all (corrupt-record column), or
  *   - a required key field is *present but uncoercible* (e.g. id="abc"):
  *     the reference's int(float(x)) would raise and the record would
  *     surface as "error: ...". A genuinely-missing key is NOT an error —
  *     the reference silently skips those upserts (P8 guards).
  *
  * Everything is a Column-level split: two filters over one scan, no UDFs,
  * no driver round-trips — the split costs nothing extra at 100 TB.
  */
object ErrorChannel {

  val corruptCol = "_corrupt_record"

  /** NUMERIC(p,s) bounds of the warehouse columns (reference:
    * postgres/00_ddl_dw.sql — price NUMERIC(12,2), rating NUMERIC(3,1),
    * total price NUMERIC(14,2)). A record whose value parses as a double
    * but overflows its declared decimal errors out at the reference's
    * insert ("numeric field overflow", caught per record) — mirrored here
    * as an error-channel predicate, checked only when the column exists. */
  val decimalBounds: Seq[(String, Int, Int)] = Seq(
    ("product_price", 12, 2), ("product_rating", 3, 1), ("sale_total_price", 14, 2))

  /** Error predicate + message for a feed with a corrupt-record column and
    * required int-keyed fields. */
  private def errorMsg(feed: DataFrame, requiredIntKeys: Seq[String]): Column = {
    val corrupt = if (feed.columns.contains(corruptCol))
      when(col(corruptCol).isNotNull,
        concat(lit("error: MalformedRecord: "), col(corruptCol))) else lit(null)
    val coercions = requiredIntKeys.map { k =>
      when(Cleanse.trimToNull(col(k)).isNotNull && Cleanse.toIntLossy(col(k)).isNull,
        concat(lit(s"error: ValueError: invalid int for '$k': "), col(k)))
    }
    val overflows = decimalBounds.filter(b => feed.columns.contains(b._1)).map {
      case (k, p, s) =>
        when(Cleanse.toFloatLossy(col(k)).isNotNull &&
            Cleanse.toDecimalLossy(col(k), p, s).isNull,
          concat(lit(s"error: NumericOverflow: '$k' out of NUMERIC($p,$s) range: "), col(k)))
    }
    coalesce((Seq(corrupt) ++ coercions ++ overflows): _*)
  }

  /** The feed with its `_error` column attached (null = valid record) —
    * the single-scan form of [[split]], for callers that materialize once
    * and carve both halves off the same in-memory frame. */
  def tagged(feed: DataFrame, requiredIntKeys: Seq[String]): DataFrame =
    feed.withColumn("_error", errorMsg(feed, requiredIntKeys))

  /** Split a raw feed into (valid, errors). `errors` carries the original
    * columns plus `_error` (reference-style message). */
  def split(feed: DataFrame, requiredIntKeys: Seq[String]): (DataFrame, DataFrame) = {
    val t = tagged(feed, requiredIntKeys)
    val valid = t.filter(col("_error").isNull).drop("_error")
      .drop(corruptCol)
    val errors = t.filter(col("_error").isNotNull)
    (valid, errors)
  }

  /** S5 — per-record status column ("ok" / "error: ..."), the reference's
    * console-sink payload. */
  def status(feed: DataFrame, requiredIntKeys: Seq[String]): DataFrame =
    feed.select(coalesce(errorMsg(feed, requiredIntKeys), lit("ok")).as("status"))

  /** Console status sink: aggregate counts plus a sample of error lines —
    * the scale-safe rendering of the reference's per-record print (printing
    * 100 TB of "ok" lines is not a sink; the counts and the actual error
    * payloads are). */
  def printStatus(feed: DataFrame, requiredIntKeys: Seq[String], sample: Int = 20): Unit = {
    val st = status(feed, requiredIntKeys).cache()
    try {
      val counts = st.groupBy(col("status") === "ok").count().collect()
        .map(r => (if (r.getBoolean(0)) "ok" else "error") -> r.getLong(1)).toMap
      printStatus(counts.getOrElse("ok", 0L), counts.getOrElse("error", 0L),
        st.filter(col("status") =!= "ok").select(col("status").as("_error")), sample)
    } finally st.unpersist()
  }

  /** Counted variant for callers that already know the split (the star
    * pipeline's single-materialization path): same console format, no
    * extra scan — ONE copy of the reference's status-line rendering. */
  def printStatus(ok: Long, errors: Long, errorSample: DataFrame, sample: Int): Unit = {
    println(s"[status] ok=$ok error=$errors")
    errorSample.select(col("_error")).limit(sample).collect()
      .foreach(r => println(s"[status] ${r.getString(0)}"))
  }
}
