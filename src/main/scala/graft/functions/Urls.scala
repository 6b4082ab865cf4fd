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
  *   - percent-encoding normalized (§6.2.2.1-2): unreserved escapes
  *     (`%6F` → `o`) decoded, remaining escapes' hex uppercased
  *     (`%2f` → `%2F`) — two encodings of one URL must collapse;
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

  /** ONE-pass parse of a URL into
    * `(canon, scheme, host, host_noport, path, query)` — the native
    * [[graft.plans.UrlParts]] expression (registered by
    * GraftExtensions). Semantically identical to
    * [[canonicalUrl]]/[[hostOf]] but reads the string once instead of
    * a split/transform pass plus five regexp passes; q266/q267 route
    * through this, and the q266 oracle (which restates the REGEX
    * formulation in DuckDB) gates the equivalence byte-for-byte. */
  def parts(u: Column): Column = call_function("url_parts", u)

  /** Params dropped entirely: the click/campaign trackers every
    * pipeline strips (they identify the REFERRAL, not the resource). */
  val TrackingParamRe = "^(utm_[A-Za-z0-9_]*|fbclid|gclid)="

  /** Uppercase hex codes of the RFC 3986 UNRESERVED characters
    * (ALPHA / DIGIT / `-` `.` `_` `~`) — the escapes §6.2.2.2 says to
    * decode. Everything else (reserved, non-ASCII bytes of multibyte
    * escapes) must STAY escaped: decoding `%2F` would change the
    * path structure. */
  val UnreservedHexRe = "^(4[1-9A-F]|5[0-9A]|6[1-9A-F]|7[0-9A]|3[0-9]|2[DE]|5F|7E)$"

  /** RFC 3986 §6.2.2 percent-encoding normalization: decode
    * unreserved `%XX` escapes, uppercase the hex of the rest, leave
    * malformed escapes (`%4`, `%zz`, trailing `%`) byte-for-byte.
    * Split on `%`; each following piece's first two chars are the
    * candidate hex. Pure array/regexp column expression, restated
    * with the same regexes over DuckDB's `string_split`/
    * `list_transform` in the q266 oracle. */
  def pctNormalize(u: Column): Column = {
    val parts = split(u, "%", -1)
    val rest = transform(slice(parts, lit(2), size(parts) - 1), p => {
      val hex = upper(substring(p, 1, 2))
      val tail = substring(p, 3, Int.MaxValue)
      when(hex.rlike(UnreservedHexRe), concat(decode(unhex(hex), "UTF-8"), tail))
        .when(hex.rlike("^[0-9A-F]{2}$"), concat(lit("%"), hex, tail))
        .otherwise(concat(lit("%"), p))
    })
    concat(element_at(parts, 1), array_join(rest, ""))
  }

  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(pctNormalize(u), "#.*$", "")
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

  /** Multi-label public suffixes — RETIRED as the lookup table
    * ([[registeredDomain]] now delegates to the native
    * [[graft.plans.RegisteredDomain]] expression backed by the FULL
    * ~9.5k-rule Public Suffix List, embedded from publicsuffix.org's
    * public data); kept as documentation of the motivating cases and
    * as the fixture list for parity tests. A host under one of these
    * registers one label DEEPER: the registrable domain of
    * `shop.example.co.uk` is `example.co.uk`, not `co.uk` — the
    * two-label rule would fold every UK site into one pseudo-domain
    * and a docs-per-domain cap (q267) would then throttle the whole
    * country as a single "site". */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp", "lg.jp",
    "gr.jp",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz", "school.nz",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in", "ac.in",
    "edu.in", "res.in", "gov.in", "nic.in",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.tr", "net.tr", "org.tr", "gen.tr", "web.tr", "edu.tr", "gov.tr",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "co.id", "net.id", "or.id", "web.id", "ac.id", "sch.id", "go.id",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "co.th", "in.th", "ac.th", "go.th", "or.th", "net.th",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke")

  /** Registrable domain of a (lowercased) host — the aggregation key
    * domain-level curation uses (docs-per-domain caps, reputation
    * scores key on the SITE, not each subdomain): the public suffix
    * plus one label (`www.news.site4.com` → `site4.com`,
    * `www.example.co.uk` → `example.co.uk`), under the FULL embedded
    * Public Suffix List — see [[graft.plans.RegisteredDomain]] for
    * the algorithm, the scale shape and the IPv4/single-label/own-
    * suffix carve-outs. */
  def registeredDomain(host: Column): Column =
    call_function("registered_domain", host)
}
