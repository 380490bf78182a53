package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/host operators for crawl-curation pipelines.
  *
  * Web-scale training corpora are keyed by URL: the first hop of every
  * curation run derives a canonical host / registered domain per page, and
  * host-level signals (link-graph rank from [[Graph.pageRankExact]],
  * per-host quality priors, crawl frequency caps) join back onto documents
  * through that key. The reference has no URLs anywhere — its only
  * string-keyed decomposition is the `'|'`-split of `VideoTitle`
  * (`lambda_s3/lambda_function_s3.py:49-62`) — so this family extends
  * SURVEY §2.8 the way the dedup/ANN/text families do.
  *
  * Everything here is a PURE PROJECTION — native string/regexp expressions,
  * no UDF, no shuffle, fully inside whole-stage codegen — so deriving a
  * host for 100 TB of pages costs exactly one scan. The parse is an
  * RFC-3986-appendix-B-shaped regex split (scheme / authority / path /
  * query / fragment, with the authority further split into
  * userinfo@host:port). Deliberate simplifications, documented here rather
  * than discovered later: IPv6 bracket hosts are not unwrapped, and an
  * empty query/fragment ("a?#top") is treated as absent (NULL).
  */
object Urls {

  /** Known multi-label public suffixes for [[registeredDomain]] — a pinned
    * subset of the public-suffix list (the real list is a data file a
    * deployment would broadcast; the operator shape is identical). */
  val multiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp",
    "com.au", "net.au", "com.br", "co.in", "co.nz")

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*):"
  // authority = what sits between "//" and the first /, ?, or #
  private val authRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"

  private def authority(url: Column): Column = regexp_extract(url, authRe, 1)

  /** Lowercased scheme, NULL when the value has none (relative reference). */
  def urlScheme(url: Column): Column =
    nullif(lower(regexp_extract(url, schemeRe, 1)), lit(""))

  /** Canonical host: authority minus userinfo and port, lowercased, with a
    * trailing root-label dot stripped ("Example.ORG." → "example.org"). */
  def urlHost(url: Column): Column =
    nullif(rtrim(lower(regexp_extract(authority(url), "^(?:[^@]*@)?([^:]*)", 1)),
      "."), lit(""))

  /** Explicit port as INT, NULL when absent (default-port inference is the
    * canonicalizer's concern, not the parser's). A digit run longer than 9
    * is treated as absent rather than cast: under ANSI mode an overflow
    * cast THROWS, and one malformed URL must never kill a crawl-scale scan
    * (≤9 digits can't overflow INT). */
  def urlPort(url: Column): Column = {
    val raw = nullif(regexp_extract(authority(url), ":([0-9]+)$", 1), lit(""))
    when(length(raw) <= 9, raw.cast("int"))
  }

  /** Path component, possibly empty ("" for "https://h" — the canonical
    * form maps it to "/"). */
  def urlPath(url: Column): Column =
    regexp_extract(url,
      "^(?:[A-Za-z][A-Za-z0-9+.-]*:)?(?://[^/?#]*)?([^?#]*)", 1)

  /** Query string (without '?'), NULL when absent or empty. */
  def urlQuery(url: Column): Column =
    nullif(regexp_extract(url, "^[^#]*\\?([^#]*)", 1), lit(""))

  /** Fragment (without '#'), NULL when absent or empty. */
  def urlFragment(url: Column): Column =
    nullif(regexp_extract(url, "#(.*)$", 1), lit(""))

  /** Registered domain of a canonical host: the last two labels, or the
    * last three when the two-label tail is a known multi-label public
    * suffix ("a.b.example.co.uk" → "example.co.uk"). Single-label hosts
    * ("localhost") and IPv4 literals pass through unchanged. */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    when(host.isNull, lit(null))
      .when(host.rlike("^[0-9.]+$"), host)
      .when(n <= 2, host)
      .when(last2.isInCollection(multiLabelSuffixes), last3)
      .otherwise(last2)
  }

  /** Canonical URL: lowercased scheme + canonical host, default ports
    * dropped (http:80, https:443, ftp:21), empty path → "/", query kept,
    * fragment dropped — the equality key under which crawl dedup and
    * frontier queues operate. */
  def canonicalUrl(url: Column): Column = {
    val scheme = urlScheme(url)
    val port = urlPort(url)
    val defaultPort = (scheme === "http" && port === 80) ||
      (scheme === "https" && port === 443) ||
      (scheme === "ftp" && port === 21)
    val portPart = when(port.isNull || defaultPort, lit(""))
      .otherwise(concat(lit(":"), port.cast("string")))
    val path = when(urlPath(url) === "", lit("/")).otherwise(urlPath(url))
    val queryPart = when(urlQuery(url).isNull, lit(""))
      .otherwise(concat(lit("?"), urlQuery(url)))
    concat(scheme, lit("://"), urlHost(url), portPart, path, queryPart)
  }

  /** All parse fields at once as extra columns (one codegen'd projection):
    * scheme, host, port, reg_domain, path, query, frag, canon_url. */
  def withUrlParts(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    df.withColumn("scheme", urlScheme(u))
      .withColumn("host", urlHost(u))
      .withColumn("port", urlPort(u))
      .withColumn("reg_domain", registeredDomain(urlHost(u)))
      .withColumn("path", urlPath(u))
      .withColumn("query", urlQuery(u))
      .withColumn("frag", urlFragment(u))
      .withColumn("canon_url", canonicalUrl(u))
  }

  // ───────────────────── one-pass native parse path ─────────────────────
  // The regex chain above evaluates ~6 anchored patterns per derived field
  // (and every canonical-URL derivation re-parses five of them) — ~30
  // regex machines per row on a crawl-scale scan. The native
  // [[expressions.UrlPartsExpr]] walks the string ONCE and returns all six
  // fields as a struct; Catalyst's subexpression elimination collapses the
  // repeated field accesses to a single parse per row inside whole-stage
  // codegen. BIT-IDENTICAL to the regex twins (UrlExprSpec asserts it on
  // generated + adversarial inputs), so either path satisfies the same
  // oracles.

  import org.apache.spark.sql.graftbridge.GraftColumnBridge

  /** `struct<scheme,host,port,path,query,frag>` from one native pass. */
  def urlParts(url: Column): Column =
    GraftColumnBridge.column(expressions.UrlPartsExpr(
      GraftColumnBridge.expression(url)))

  private def canonicalFromParts(p: Column): Column = {
    val scheme = p.getField("scheme")
    val host = p.getField("host")
    val port = p.getField("port")
    val path0 = p.getField("path")
    val query = p.getField("query")
    val defaultPort = (scheme === "http" && port === 80) ||
      (scheme === "https" && port === 443) ||
      (scheme === "ftp" && port === 21)
    val portPart = when(port.isNull || defaultPort, lit(""))
      .otherwise(concat(lit(":"), port.cast("string")))
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val queryPart = when(query.isNull, lit(""))
      .otherwise(concat(lit("?"), query))
    concat(scheme, lit("://"), host, portPart, path, queryPart)
  }

  /** [[canonicalUrl]] from one native parse + pure concat (no re-parse). */
  def canonicalUrlNative(url: Column): Column =
    canonicalFromParts(urlParts(url))

  /** [[urlHost]] from the native parse. */
  def urlHostNative(url: Column): Column = urlParts(url).getField("host")

  /** [[withUrlParts]] on the native one-pass path — same columns. */
  def withUrlPartsNative(df: DataFrame, urlCol: String): DataFrame = {
    val p = urlParts(col(urlCol))
    df.withColumn("scheme", p.getField("scheme"))
      .withColumn("host", p.getField("host"))
      .withColumn("port", p.getField("port"))
      .withColumn("reg_domain", registeredDomain(p.getField("host")))
      .withColumn("path", p.getField("path"))
      .withColumn("query", p.getField("query"))
      .withColumn("frag", p.getField("frag"))
      .withColumn("canon_url", canonicalFromParts(p))
  }

  /** Host-level quality join: attach a per-host rank (e.g. the output of
    * [[Graph.pageRankExact]] over a host link graph) to a per-document
    * frame keyed by an integer host id. The host dimension is orders of
    * magnitude smaller than the corpus (millions of hosts vs billions of
    * pages), so the rank side is broadcast — documents never shuffle. Hosts
    * absent from the graph keep the document with a NULL rank (left join):
    * dropping unranked hosts is a sampling decision, not a join's. */
  def hostRankJoin(docs: DataFrame, hostIdCol: String,
                   ranks: DataFrame, nodeCol: String,
                   rankCol: String, rankAs: String = "host_rank"): DataFrame =
    docs.join(
      broadcast(ranks.select(col(nodeCol).as(hostIdCol),
        col(rankCol).as(rankAs))),
      Seq(hostIdCol), "left")
}
