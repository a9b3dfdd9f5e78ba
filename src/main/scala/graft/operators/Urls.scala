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

  /** scheme://host[:port][/path][?query] — capture groups 1-5. The
    * scheme letters are case-insensitive per RFC 3986 §3.1 ('HTTP://' is
    * the same scheme as 'http://'); [[scheme]] lowercases the capture,
    * so consumers always see the canonical form. */
  val UrlRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#:]+)(:[0-9]+)?([^?#]*)(\\?[^#]*)?"

  /** Two-label public suffixes (mini-PSL; see the header note). */
  val PublicSuffixes2: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.ar", "com.tr",
    "co.in", "co.kr", "co.za", "com.sg", "com.hk")

  /** A compiled public-suffix rule set — the publicsuffix.org data model:
    * plain rules (`co.uk`), wildcard rules (`*.ck` — ANY single label
    * under the parent is a public suffix), and exception rules
    * (`!www.ck` — overrides a matching wildcard; the public suffix is
    * the exception minus its leftmost label). `parse` takes lines in the
    * PSL file syntax (comments `//` and blanks ignored), so a production
    * deployment loads the FULL Mozilla list with
    * `PslRules.parse(Files.readAllLines(...))` and passes it to
    * [[etld1OfPsl]] — the walk is parameterized, not hard-wired.
    *
    * Scale note: the rule literals compile into `isin` sets inside ONE
    * codegen'd projection — no shuffle, no UDF, no driver lookup. The
    * full ~9k-rule list is ~200 KB of literals; if that ever pressures
    * codegen, the same walk runs with the sets hoisted into a broadcast
    * and a native set-probe expression — the SHAPE (longest-match over
    * last-k labels) is what this object fixes. */
  final case class PslRules(plainByLen: Map[Int, Seq[String]],
                            wildcardParentsByLen: Map[Int, Seq[String]],
                            exceptionsByLen: Map[Int, Seq[String]]) {
    /** Longest rule length (wildcard rule length = parent labels + 1). */
    val maxRuleLen: Int =
      (plainByLen.keySet ++ wildcardParentsByLen.keySet.map(_ + 1) ++
        exceptionsByLen.keySet).foldLeft(1)(math.max)
  }

  object PslRules {
    private def labelCount(s: String): Int = s.count(_ == '.') + 1
    def parse(lines: Seq[String]): PslRules = {
      val rules = lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//"))
        .map(_.toLowerCase)
      val (exc, rest) = rules.partition(_.startsWith("!"))
      val (wild, plain) = rest.partition(_.startsWith("*."))
      PslRules(
        plain.distinct.groupBy(labelCount),
        wild.map(_.stripPrefix("*.")).distinct.groupBy(labelCount),
        exc.map(_.stripPrefix("!")).distinct.groupBy(labelCount))
    }
  }

  /** Trimmed REAL subset of the Mozilla public-suffix list: the mini-PSL
    * two-label suffixes plus genuine wildcard and exception rules from
    * the published list (`*.ck`/`!www.ck`, the Japanese city wildcards
    * with their `!city.` exceptions, and the bare-wildcard ccTLDs) — so
    * the walk exercises every rule type the full list contains. The full
    * list is a drop-in via [[PslRules.parse]]. */
  val TrimmedPsl: PslRules = PslRules.parse(PublicSuffixes2 ++ Seq(
    "*.ck", "!www.ck",
    "*.np", "*.jm", "*.kh", "*.mm", "*.pg",
    "*.kawasaki.jp", "!city.kawasaki.jp",
    "*.kitakyushu.jp", "!city.kitakyushu.jp",
    "*.kobe.jp", "!city.kobe.jp",
    "*.nagoya.jp", "!city.nagoya.jp",
    "*.sapporo.jp", "!city.sapporo.jp",
    "*.sendai.jp", "!city.sendai.jp",
    "*.yokohama.jp", "!city.yokohama.jp"))

  def scheme(url: Column): Column =
    lower(nullif(regexp_extract(url, UrlRe, 1), lit("")))

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

  /** Registrable domain (eTLD+1) of a host under the FULL publicsuffix.org
    * algorithm, parameterized by rule set: exception rules override,
    * otherwise the longest matching plain/wildcard rule prevails,
    * otherwise the implicit `*` default (the bare TLD). The registrable
    * domain is the public suffix plus one label; a host that IS a public
    * suffix (or an IP literal) passes through whole — this library's
    * keying convention, so per-domain caps still see one stable key.
    *
    * For the library-default [[TrimmedPsl]] the walk is the native
    * [[graft.functions.Etld1]] expression — ONE static call, immune to
    * the aggregate-fusion codegen blowup the unrolled chain hits when
    * two walks share a fused stage (the r15 q261 finding). Custom rule
    * sets take the statically-unrolled CASE chain — per-row
    * O(maxRuleLen) label-slice probes, no shuffle, no UDF — and
    * Etld1EquivalenceSpec pins the two paths byte-identical. */
  def etld1OfPsl(h: Column, psl: PslRules): Column =
    if (psl eq TrimmedPsl) graft.functions.Etld1.etld1(h)
    else etld1FromLabels(h, split(h, "\\."), psl)

  /** [[etld1OfPsl]] with the label array supplied as an already-STAGED
    * column: the walk references the labels ~8 times (slices, length
    * probes, the fallback), and inlining `split(host)` at every reference
    * multiplies the generated code — two such walks in one projection
    * (e.g. both ends of a link edge) then blow janino's method limit and
    * the whole stage silently loses codegen. Callers computing more than
    * one registrable domain per projection stage `split(host, "\\.")` as
    * a real column and call this variant (see [[Html.linkEdges]]). */
  def etld1FromLabels(h: Column, labels: Column, psl: PslRules): Column = {
    // library default → the native expression (the staged labels are
    // unnecessary there: the static walk splits once per row itself)
    if (psl eq TrimmedPsl) return graft.functions.Etld1.etld1(h)
    val n = size(labels)
    def lastK(k: Int): Column = concat_ws(".", slice(labels, -k, k))
    // longest plain/wildcard match; ascending fold puts the LARGEST k
    // outermost in the CASE chain, so longest-match wins (spec step 3).
    // The implicit default rule '*' makes the unmatched suffix length 1.
    val plainOrWild = (1 to psl.maxRuleLen).foldLeft(lit(1)) { case (acc, k) =>
      val conds =
        psl.plainByLen.get(k).map(r => lastK(k).isin(r: _*)).toSeq ++
          (if (k >= 2) psl.wildcardParentsByLen.get(k - 1)
                          .map(p => lastK(k - 1).isin(p: _*)).toSeq
           else Nil)
      if (conds.isEmpty) acc
      else when(n >= k && conds.reduce(_ || _), lit(k)).otherwise(acc)
    }
    // exception rules OVERRIDE any other match (spec step 2): the public
    // suffix is the exception minus its leftmost label → length e − 1
    val suffixLen = psl.exceptionsByLen.toSeq.sortBy(_._1)
      .foldLeft(plainOrWild) { case (acc, (e, rules)) =>
        when(n >= e && lastK(e).isin(rules: _*), lit(e - 1)).otherwise(acc)
      }
    val rd = suffixLen + 1
    when(h.isNull, lit(null).cast("string"))
      // \z, not $: Java's '$' also matches BEFORE a final newline, RE2's
      // does not — and UrlRe's host class admits \n, so a crawled
      // "10.0.0.7\n" host would classify as an IP literal here but not in
      // the oracle's RE2 replay (whose '$' already means end-of-text)
      .when(h.rlike("^[0-9.]+\\z"), h) // IPv4 literal
      .when(n <= suffixLen, h)       // the host IS a public suffix
      .otherwise(concat_ws(".", slice(labels, lit(0) - rd, rd)))
  }

  /** [[etld1OfPsl]] over [[TrimmedPsl]] — the default registrable-domain
    * column. Behaviour on hosts outside the wildcard/exception rules is
    * identical to the historical last-2-in-set walk (a plain 2-label rule
    * is just suffix length 2), so existing consumers see no change. */
  def etld1Of(h: Column): Column = etld1OfPsl(h, TrimmedPsl)

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
    // spread BEFORE the concat so the downstream regex-heavy parse (the
    // actual cost of every consumer) never runs on one core — see Spread
    Spread.toCores(events).select(id,
      when(id % 97 === 0, concat(lit("not a url "), ids))
        .otherwise(concat(
          when(id % 2 === 0, lit("https://")).otherwise(lit("http://")),
          hostCol, portPart, pathPart, queryPart)).as("url"))
  }

  /** Tracking query parameters a canonicalizer strips — the public
    * cross-site set (UTM campaign tags, click ids, the bare `ref`). */
  // \z, not $ (the etld1FromLabels note): a param value ending in \n must
  // read identically in Java and the oracle's RE2
  val TrackingParamRe = "^(utm_[^=]*|gclid|fbclid|msclkid|yclid|ref|ref_src)(=.*)?\\z"

  /** RFC 3986 §6.2.2.2 percent-encoding normalization: within every valid
    * `%XX` triplet the hex digits are UPPERCASED, and triplets encoding an
    * UNRESERVED character (ALPHA / DIGIT / `-` `.` `_` `~`) are decoded —
    * `/%7euser`, `/%7Euser` and `/~user` become one key. Reserved and
    * non-ASCII octets stay encoded (only case-folded): `%2F` must NOT
    * become a path `/`, `%3D` not a param `=` — decoding those would
    * change where downstream splits cut. A `%` not followed by two hex
    * digits is not a valid encoding; it is preserved verbatim (the
    * error-transparency rule every lenient parser follows). NULL → NULL.
    *
    * Shape: one `split('%')` + a `transform` over the fragments + one
    * rejoin — per-row, no shuffle; the common no-`%` row takes the
    * `instr` fast path and never builds the array. Decoding unreserved
    * characters can only produce ALPHA/DIGIT/`-._~` — never `/` `&` `=`
    * — so slash-collapse and param-split compose freely on either side.
    * The one ORDER-SENSITIVE composition is `.`: `%2E` decodes to a dot
    * that can SPELL a dot segment, so [[resolveDotSegments]] must run
    * AFTER this (RFC 3986 §6.2.2's decode-then-remove order — see
    * q267's composition); the function is idempotent, so a caller
    * normalizing early composes safely with [[canonicalOf]]'s own
    * internal application. */
  def normalizePercent(s: Column): Column = {
    val parts = split(s, "%", -1) // -1: a trailing '%' keeps its empty tail
    val fixed = transform(slice(parts, lit(2), size(parts) - 1), seg => {
      val hex2 = upper(substring(seg, 1, 2))
      val code = conv(hex2, 16, 10).cast("int")
      val rest = substring(seg, 3, Int.MaxValue)
      val unreserved = (code >= 48 && code <= 57) ||
        (code >= 65 && code <= 90) || (code >= 97 && code <= 122) ||
        code === 45 || code === 46 || code === 95 || code === 126
      when(!hex2.rlike("^[0-9A-F]{2}\\z"), concat(lit("%"), seg))
        .when(unreserved, concat(call_function("char", code), rest))
        .otherwise(concat(lit("%"), hex2, rest))
    })
    when(s.isNull || instr(s, "%") === 0, s)
      .otherwise(concat(element_at(parts, 1), array_join(fixed, "")))
  }

  /** Canonical URL — the normalization every crawl frontier and URL-level
    * dedup applies BEFORE hashing, so `HTTP://Host.com:80/a//b?b=2&a=1&utm_x=9`
    * and `http://host.com/a/b?a=1&b=2` collapse to one key:
    *
    *   - scheme and host lowercased; a host's trailing root-dot dropped;
    *   - default ports stripped (http:80, https:443), others kept;
    *   - runs of '/' in the path collapsed, an empty path becomes '/';
    *   - query parameters: tracking params ([[TrackingParamRe]]) and
    *     empty tokens dropped, the survivors BYTE-SORTED and rejoined
    *     (param order never carries meaning a cache key can rely on);
    *     an emptied query disappears entirely;
    *   - percent-encodings in path and query normalized per
    *     [[normalizePercent]] (RFC 3986 §6.2.2.2) BEFORE the collapse /
    *     split steps — a round-15 key-version bump; %-free URLs (every
    *     pre-r15 fixture) canonicalize byte-identically to the old key;
    *   - the host IDN-folded to punycode ASCII
    *     ([[graft.functions.IdnAscii]], same key-version bump): the
    *     unicode and `xn--` spellings of one authority are one frontier
    *     key; pure-ASCII hosts (every pre-r15 fixture) pass through
    *     byte-identically, and a host ToASCII rejects folds to NULL
    *     canonical — the same error-visibility contract as a NULL host;
    *   - the fragment never reaches the server and is already outside
    *     [[UrlRe]]'s capture.
    *
    * Dot-segment resolution (`/a/../b`) is deliberately NOT folded in
    * here (q258's key semantics are frozen); callers that want RFC 3986
    * §5.2.4 resolution compose [[resolveDotSegments]] over the collapsed
    * path — see q263.
    * NULL host (malformed URL) → NULL canonical — the error-visibility
    * contract. Takes the STAGED parse columns (the [[urlProfile]]
    * staging lesson: each is referenced more than once). */
  def canonicalOf(scheme: Column, host: Column, port: Column,
                  path: Column, query: Column): Column = {
    val sch = lower(scheme)
    // root-dot strip BEFORE the IDN fold (ToASCII rejects the empty final
    // label a trailing dot implies); ASCII hosts short-circuit unchanged
    val h = graft.functions.IdnAscii.idnAscii(
      regexp_replace(host, "\\.\\z", "")) // \z: see the etld1FromLabels note
    val defPort = (sch === "http" && port === 80L) ||
      (sch === "https" && port === 443L)
    val portPart = when(port.isNull || defPort, lit(""))
      .otherwise(concat(lit(":"), port.cast("string")))
    // percent-normalize FIRST: decoding unreserved octets never produces
    // '/' or '&' (those are reserved, kept encoded), so the collapse and
    // the param split below see the final byte forms
    val path1 = normalizePercent(path)
    val p = when(path1 === "", lit("/"))
      .otherwise(regexp_replace(path1, "/{2,}", "/"))
    val kept = array_sort(filter(
      split(coalesce(normalizePercent(query), lit("")), "&"),
      x => x =!= "" && !x.rlike(TrackingParamRe)))
    val qPart = when(size(kept) > 0,
      concat(lit("?"), array_join(kept, "&"))).otherwise(lit(""))
    // h is NULL when host is NULL (malformed URL) OR the IDN fold
    // rejected it — both are "cannot canonicalize", both surface as NULL
    when(h.isNull, lit(null).cast("string"))
      .otherwise(concat(sch, lit("://"), h, portPart, p, qPart))
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over an ABSOLUTE path — the one
    * normalization [[canonicalOf]] leaves out: `/a/b/../c` → `/a/c`,
    * `/./x` → `/x`, a `..` at the root is absorbed (`/../a` → `/a`; note
    * `java.net.URI.normalize` diverges from the RFC exactly there), and a
    * trailing `/.` or `/..` leaves a trailing slash, as the spec's buffer
    * walk does. Implemented as a single `aggregate` HOF over the split
    * segments — a per-row stack walk, no shuffle, no UDF, no driver
    * round-trip; the interpreted-lambda cost is a few comparisons per
    * path segment, noise next to the parse regexes upstream. Empty-string
    * segments (uncollapsed slash runs) are preserved verbatim, exactly as
    * the RFC's walk preserves them — compose AFTER run-collapse when one
    * key per path is wanted. An empty path resolves to "/" (the
    * [[canonicalOf]] convention). Verified against an independent
    * buffer-walk reference on randomized paths (DotSegmentsSpec). */
  def resolveDotSegments(p: Column): Column = {
    // a trailing '/.' or '/..' must LEAVE a trailing slash (spec steps
    // 2B/2C move a '/' back to the input); appending one here lets the
    // stack walk see it as an explicit empty final segment
    // \z, not $: Java's '$' also fires before a final newline, and "..\n"
    // is an ORDINARY segment — the buffer-walk reference agrees
    val p2 = when(p.rlike("/\\.\\.?\\z"), concat(p, lit("/"))).otherwise(p)
    val segs0 = split(p2, "/")
    val segs = slice(segs0, lit(2), size(segs0)) // drop the leading '' of an absolute path
    val emptyStack = array().cast("array<string>")
    aggregate(segs, emptyStack,
      (acc, s) =>
        when(s === ".", acc)
          .when(s === "..",
            when(size(acc) <= 1, emptyStack)
              .otherwise(slice(acc, lit(1), size(acc) - 1)))
          .otherwise(concat(acc, array(s))),
      acc => concat(lit("/"), array_join(acc, "/")))
  }

  /** [[canonicalOf]] over a raw url column. One-off convenience: every
    * component re-runs the host regex here (CASE branches defeat codegen
    * CSE — the q253 lesson), so set-oriented callers should stage the
    * parse once via [[urlProfile]] and call [[canonicalOf]]. */
  def canonicalUrl(url: Column): Column =
    canonicalOf(scheme(url), host(url), port(url), path(url), query(url))

  /** Canonicalization fixture: scheme/port/trailing-dot/path-run/query
    * variation by id arithmetic — default ports to strip, a kept :8080,
    * a root-dot host, '' vs '/a//b' vs '/x/' paths, tracking params,
    * empty tokens, a bare '?', and out-of-order params that must
    * byte-sort. Pure concat; the oracle rebuilds identical strings. */
  def synthCanonUrls(events: DataFrame, idCol: String = "event_id"): DataFrame = {
    val id = col(idCol)
    def m(k: Int) = (id % k).cast("string")
    val hostCol = when(id % 3 === 0, lit("Example.ORG."))
      .when(id % 3 === 1, concat(lit("site"), m(5), lit(".example.com")))
      .otherwise(lit("example.co.uk"))
    val schemePart = when(id % 2 === 0, lit("http://")).otherwise(lit("https://"))
    val portPart = when(id % 4 === 0, lit(":80"))
      .when(id % 4 === 1, lit(":443"))
      .when(id % 4 === 2, lit(":8080"))
      .otherwise(lit(""))
    val pathPart = when(id % 3 === 0, lit(""))
      .when(id % 3 === 1, concat(lit("/a//b"), m(7)))
      .otherwise(lit("/x/"))
    val queryPart = when(id % 5 === 0, concat(lit("?b=2&a="), m(3), lit("&utm_source=x")))
      .when(id % 5 === 1, lit("?gclid=123"))
      .when(id % 5 === 2, lit("?"))
      .when(id % 5 === 3, lit("?z=1&&a=2"))
      .otherwise(lit(""))
    Spread.toCores(events).select(id.as("event_id"),
      concat(schemePart, hostCol, portPart, pathPart, queryPart).as("url"))
  }

  /** Percent-encoding fixture for [[normalizePercent]] composed into the
    * canonical key: `%7e`/`%7E`/`~` spellings that must COLLAPSE, a
    * reserved `%2f`/`%2F` that must only case-fold (never become a path
    * slash), uppercase-decode legs (`%4a%4B` → `JK`), an invalid `%zz`
    * and a bare trailing `%` kept verbatim, a digit decode in the query
    * (`%31` → `1`), and an encoded-leading-letter tracking param
    * (`%75tm_source` → `utm_source`) that only a normalize-before-filter
    * canonicalizer drops. Pure concat; the oracle rebuilds identical raw
    * strings and replays the normalization generically with list ops. */
  def synthPercentUrls(events: DataFrame, idCol: String = "event_id"): DataFrame = {
    val id = col(idCol)
    def m(k: Int) = (id % k).cast("string")
    val pathPart = when(id % 6 === 0, concat(lit("/%7euser"), m(5)))
      .when(id % 6 === 1, concat(lit("/%7Euser"), m(5)))
      .when(id % 6 === 2, concat(lit("/~user"), m(5)))
      .when(id % 6 === 3, concat(lit("/a%2Fb"), m(5)))
      .when(id % 6 === 4, concat(lit("/a%2fb"), m(5)))
      .otherwise(concat(lit("/%4a%4B"), m(5), lit("%zz%")))
    val queryPart = when(id % 4 === 0, lit("?x=%31"))
      .when(id % 4 === 1, lit("?x=1"))
      .when(id % 4 === 2, concat(lit("?%75tm_source=9&a="), m(3)))
      .otherwise(concat(lit("?a="), m(3)))
    Spread.toCores(events).select(id.as("event_id"),
      concat(lit("https://example.com"), pathPart, queryPart).as("url"))
  }

  /** IDN fixture for the host fold composed into the canonical key:
    * the unicode, uppercase-unicode and pre-encoded ACE spellings of one
    * authority (all three must land on ONE canonical), a second IDN
    * authority, and an impossible 64-char label that must fold to NULL
    * canonical. The oracle rebuilds identical raw strings and maps each
    * host through the PINNED punycode literals (golden values, the
    * MediaSpec hand-built-bytes convention — the fold itself is the
    * JDK's public ToASCII, asserted label-by-label in UrlsSpec). */
  def synthIdnUrls(events: DataFrame, idCol: String = "event_id"): DataFrame = {
    val id = col(idCol)
    val hostCol = when(id % 5 === 0, lit("bücher.example"))
      .when(id % 5 === 1, lit("BÜCHER.example"))
      .when(id % 5 === 2, lit("xn--bcher-kva.example"))
      .when(id % 5 === 3, lit("münchen.de"))
      .otherwise(lit("a" * 64 + ".example"))
    Spread.toCores(events).select(id.as("event_id"),
      concat(lit("https://"), hostCol, lit("/p"), (id % 3).cast("string"))
        .as("url"))
  }

  /** Host fixture exercising every publicsuffix.org rule TYPE in
    * [[TrimmedPsl]]: a bare exception host, wildcard-suffix hosts at and
    * above the suffix length (1- and 2-label wildcard parents), exception
    * hosts with and without extra subdomains, a plain 2-label suffix, and
    * the default-rule shape. Pure concat — the oracle rebuilds identical
    * strings and replays the longest-match walk in SQL. */
  def synthPslHosts(events: DataFrame, idCol: String = "event_id"): DataFrame = {
    val id = col(idCol)
    def m(k: Int) = (id % k).cast("string")
    Spread.toCores(events).select(id.as("event_id"),
      when(id % 9 === 0, lit("www.ck"))
        .when(id % 9 === 1, concat(lit("shop"), m(7), lit(".ck")))
        .when(id % 9 === 2, concat(lit("a"), m(5), lit(".shop.ck")))
        .when(id % 9 === 3, lit("city.kawasaki.jp"))
        .when(id % 9 === 4, concat(lit("sub"), m(3), lit(".city.kawasaki.jp")))
        .when(id % 9 === 5, concat(lit("blog"), m(4), lit(".kawasaki.jp")))
        .when(id % 9 === 6, concat(lit("x.blog"), m(4), lit(".kawasaki.jp")))
        .when(id % 9 === 7, concat(lit("news.example"), m(6), lit(".co.uk")))
        .otherwise(concat(lit("site"), m(8), lit(".example.org"))).as("host"))
  }

  /** Dot-segment path fixture: every RFC 3986 §5.2.4 shape
    * [[resolveDotSegments]] must handle — a mid-path `..`, a leading
    * `/.`, a root-escaping `../..` that must absorb, trailing `/.` and
    * `/..` that must leave a slash, a bare `/..`, dots inside ordinary
    * segment names (`d.d`, `x..` — NOT dot segments), and
    * already-resolved paths with and without trailing slash. Pure concat
    * arithmetic — the oracle rebuilds the paths AND their expected
    * resolutions from the same arithmetic. */
  def synthDotPaths(events: DataFrame, idCol: String = "event_id"): DataFrame = {
    val id = col(idCol)
    def m(k: Int) = (id % k).cast("string")
    Spread.toCores(events).select(id.as("event_id"),
      when(id % 8 === 0, concat(lit("/a/b/../c"), m(4)))
        .when(id % 8 === 1, lit("/./x"))
        .when(id % 8 === 2, lit("/a/../../b"))
        .when(id % 8 === 3, lit("/a/b/.."))
        .when(id % 8 === 4, lit("/a/./"))
        .when(id % 8 === 5, lit("/.."))
        .when(id % 8 === 6, lit("/d.d/../x.."))
        .otherwise(concat(lit("/p"), m(5), lit("/"))).as("path"))
  }
}
