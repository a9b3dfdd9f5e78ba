package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL parsing and registrable-domain extraction — the keying primitives
  * of crawl curation: per-domain document caps ([[Sampling.sourceCap]]
  * keyed on the eTLD+1, not the raw host, or `news.example.co.uk` and
  * `blog.example.co.uk` dodge the cap), domain-level quality priors, and
  * URL-pattern dedup all start by splitting a URL into comparable parts.
  *
  * Parsing is REGEX over the generic-URI shape (RFC 3986 appendix B,
  * simplified to the absolute http(s) form a crawl frontier emits), not
  * `java.net.URI`: the JDK parser throws on the malformed URLs real crawl
  * data is full of, and — the [[Html]] rule — a regex in the common
  * Java/RE2 subset lets the DuckDB oracle replay every field
  * byte-for-byte. Non-matching rows surface with NULL host, never an
  * exception. All patterns are alternation-free (optional groups over
  * disjoint delimiter classes parse uniquely, so leftmost-first and
  * leftmost-longest agree).
  *
  * eTLD+1 uses an embedded MINI public-suffix list: the ~20 two-label
  * suffixes that dominate real traffic (`co.uk`, `com.au`, `co.jp`, …) —
  * enough to make the "last two labels" naive rule wrong visibly and
  * testably. A production deployment swaps in the full Mozilla PSL as a
  * broadcast set; the lookup shape (last-2-labels membership test) is
  * identical, and the list is a `val` precisely so that swap is one line.
  * IP-literal hosts and single-label hosts are their own registrable
  * domain.
  *
  * 100 TB shape: every column is a codegen'd per-row projection — no
  * shuffle, no UDF, no driver round-trip. Domain rollups downstream
  * aggregate on `etld1`, which is exactly as skewed as real domains are —
  * pair with [[Skew.saltedAgg]] when one domain is half the crawl. */
object Urls {

  /** scheme://host[:port][/path][?query] — capture groups 1-5. */
  val UrlRe = "^([a-z][a-z0-9+.-]*)://([^/?#:]+)(:[0-9]+)?([^?#]*)(\\?[^#]*)?"

  /** Two-label public suffixes (mini-PSL; see the header note). */
  val PublicSuffixes2: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.ar", "com.tr",
    "co.in", "co.kr", "co.za", "com.sg", "com.hk")

  def scheme(url: Column): Column = nullif(regexp_extract(url, UrlRe, 1), lit(""))

  /** Host, lowercased (URL authority is case-insensitive; paths are not). */
  def host(url: Column): Column = lower(nullif(regexp_extract(url, UrlRe, 2), lit("")))

  /** Explicit port, NULL when absent. */
  def port(url: Column): Column =
    nullif(regexp_replace(regexp_extract(url, UrlRe, 3), "^:", ""), lit("")).cast("long")

  /** Path including the leading '/', empty string when absent. */
  def path(url: Column): Column = regexp_extract(url, UrlRe, 4)

  /** Query string without the '?', NULL when absent. */
  def query(url: Column): Column =
    nullif(regexp_replace(regexp_extract(url, UrlRe, 5), "^\\?", ""), lit(""))

  /** Count of non-empty '/'-separated path segments. */
  def pathDepth(url: Column): Column = pathDepthOf(path(url))
  def pathDepthOf(p: Column): Column =
    size(filter(split(p, "/"), s => s =!= "")).cast("long")

  /** Count of '&'-separated query parameters; 0 when no query. */
  def nParams(url: Column): Column = nParamsOf(query(url))
  def nParamsOf(q: Column): Column =
    when(q.isNull, lit(0L)).otherwise(size(split(q, "&")).cast("long"))

  /** Registrable domain (eTLD+1) of a host: last two labels, or last
    * THREE when the last two are a known public suffix; IP literals and
    * single-label hosts pass through whole. */
  def etld1Of(h: Column): Column = {
    val labels = split(h, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), last2)
    when(h.isNull, lit(null).cast("string"))
      .when(h.rlike("^[0-9.]+$"), h) // IPv4 literal
      .when(n <= 1, h)
      .when(last2.isin(PublicSuffixes2: _*), when(n >= 3, last3).otherwise(h))
      .otherwise(last2)
  }

  def etld1(url: Column): Column = etld1Of(host(url))

  /** Per-URL parse profile: (id, url, scheme, host, port, path,
    * query_string, path_depth, n_params, etld1). Malformed rows keep
    * their id with NULL scheme/host — the error-visibility contract. */
  def urlProfile(df: DataFrame, idCol: String = "event_id",
                 urlCol: String = "url"): DataFrame = {
    val u = col(urlCol)
    // two STAGED projections, deliberately: etld1Of references its host
    // argument ~8 times (label slices, the PSL test, fallbacks) inside
    // CASE branches, where codegen's subexpression elimination does not
    // reach — inlined, each reference would re-run the host regex (and
    // whatever expression built the url). Staging host/path/query as
    // real columns makes CollapseProject keep them materialized
    // (non-cheap exprs referenced more than once are not collapsed).
    df.select(col(idCol), u,
        scheme(u).as("scheme"), host(u).as("host"), port(u).as("port"),
        path(u).as("path"), query(u).as("query_string"))
      .select(col(idCol), u, col("scheme"), col("host"), col("port"),
        col("path"), col("query_string"),
        pathDepthOf(col("path")).as("path_depth"),
        nParamsOf(col("query_string")).as("n_params"),
        etld1Of(col("host")).as("etld1"))
  }

  /** Deterministic URL fixture over the events table (the
    * [[Html.synthHtmlDocs]] pattern): scheme/host shape/port/path depth/
    * params all vary by id arithmetic, covering the mini-PSL suffixes, a
    * bare IP, an uppercase host (case-folding), and a malformed row every
    * 97th event. Pure concat — the oracle rebuilds identical strings. */
  def synthUrls(events: DataFrame, idCol: String = "event_id"): DataFrame = {
    val id = col(idCol)
    val ids = id.cast("string")
    val hostCol = when(id % 11 === 0, concat(lit("Site"), (id % 5).cast("string"), lit(".Example.CO.UK")))
      .when(id % 11 === 1, concat(lit("10.0."), (id % 256).cast("string"), lit(".7")))
      .when(id % 11 === 2, lit("localhost"))
      .when(id % 11 === 3, concat(lit("cdn.host"), (id % 7).cast("string"), lit(".com.au")))
      .otherwise(concat(lit("www.dom"), (id % 50).cast("string"), lit(".org")))
    val portPart = when(id % 13 === 0, lit(":8080")).otherwise(lit(""))
    val pathPart = when(id % 4 === 0, lit(""))
      .when(id % 4 === 1, lit("/"))
      .when(id % 4 === 2, concat(lit("/a/b/page"), (id % 9).cast("string")))
      .otherwise(concat(lit("/p//q"), (id % 3).cast("string"), lit("/")))
    val queryPart = when(id % 5 === 0, concat(lit("?u="), ids, lit("&ref=feed")))
      .when(id % 5 === 1, lit("?"))
      .otherwise(lit(""))
    events.select(id,
      when(id % 97 === 0, concat(lit("not a url "), ids))
        .otherwise(concat(
          when(id % 2 === 0, lit("https://")).otherwise(lit("http://")),
          hostCol, portPart, pathPart, queryPart)).as("url"))
  }
}
