package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the cheapest dedup stage of a crawl
  * pipeline, run BEFORE any content dedup: two fetches of the same
  * page differ only in URL cosmetics (scheme/host case, an explicit
  * default port, a fragment, tracking parameters, query-key order),
  * and collapsing those on the canonical string removes refetches for
  * the price of one column expression — no shuffle until the
  * keep-first group-by, which keys on a short string instead of
  * document bytes.
  *
  * The canonical form (the standard RFC 3986 §6 safe normalizations
  * plus the universal tracking-param strip):
  *   - scheme and host lowercased (case-insensitive by spec);
  *   - explicit default port stripped (`:80` for http, `:443` for
  *     https);
  *   - fragment stripped (never sent to the server);
  *   - tracking parameters dropped (`utm_*`, `fbclid`, `gclid`);
  *   - remaining query parameters sorted by codepoint (order is
  *     semantically irrelevant to ~all servers; sorting makes the
  *     string canonical);
  *   - empty path normalized to `/`.
  *
  * Pure `org.apache.spark.sql.functions` column expression
  * (regexp/array ops — whole-stage codegen, no UDF), restated
  * verbatim in the DuckDB oracle with the same regexes and the same
  * codepoint sort, so the q266 gate checks the canonical string
  * byte-for-byte.
  */
object Urls {

  /** Params dropped entirely: the click/campaign trackers every
    * pipeline strips (they identify the REFERRAL, not the resource). */
  val TrackingParamRe = "^(utm_[A-Za-z0-9_]*|fbclid|gclid)="

  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val path = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1)
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val kept = array_join(
      array_sort(filter(split(query, "&"),
        p => p =!= lit("") && !p.rlike(TrackingParamRe))), "&")
    concat(scheme, lit("://"), host,
      when(path === "", lit("/")).otherwise(path),
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** Lowercased host of a URL (port stripped) — the grouping key for
    * per-site crawl statistics. Pure regexp column expression. */
  def hostOf(u: Column): Column =
    lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?:]*)", 1))

  /** Registrable domain approximated as the last two dot-labels of the
    * host (`www.news.site4.com` → `site4.com`) — the aggregation key
    * domain-level curation uses (docs-per-domain caps, reputation
    * scores key on the SITE, not each subdomain). A production
    * deployment substitutes the Public Suffix List (multi-label
    * suffixes like `.co.uk`); the two-label rule is the
    * list-independent core and is stated identically in the oracle. */
  def registeredDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
}
