package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt path rules (RFC 9309) — the third leg of the crawl
  * compliance gate, next to the `X-Robots-Tag` response header and the
  * in-page `<meta name=robots>` (both q268): Common Crawl ships the
  * robots.txt responses it fetched as their own WARC records, and
  * every compliant corpus recipe parses them and drops pages a site's
  * rules disallow BEFORE extraction.
  *
  * Parsing (RFC 9309 §2.2):
  *   - lines are `key: value`; `#` starts a comment; unknown keys
  *     (`Crawl-delay`, `Sitemap`) are ignored;
  *   - consecutive `User-agent` lines open ONE group that owns the
  *     rule lines after it; a group applies when it names the product
  *     token or `*`;
  *   - `Allow`/`Disallow` values are path patterns; an EMPTY value
  *     matches nothing (a bare `Disallow:` means allow-all).
  *
  * Matching (§2.2.2-3): the rule with the LONGEST match wins (rule
  * length as written); on a length tie `Allow` wins; a page no rule
  * matches is allowed. `*` matches any octet sequence and a trailing
  * `$` anchors at end-of-path (see [[evaluate]]).
  *
  * Scale shape: parsing windows over (host, line-index) — bounded,
  * robots.txt is capped at 500 KiB by the RFC and there is ONE file
  * per host. Evaluation is a host-keyed join (rules side is tiny
  * relative to pages; AQE broadcasts it when it fits) followed by a
  * prefix filter and a per-page max_by — no window over the corpus,
  * no cartesian beyond the bounded per-host rule fan-out.
  */
object RobotsTxt {

  /** Parse robots.txt bodies into per-host prefix rules for `agent`
    * (groups naming the agent verbatim or `*`). Input: one row per
    * fetched robots.txt, `(host, body)`. Output:
    * `(host, rtype 'allow'|'disallow', rpath)`. */
  def rules(robots: DataFrame, agent: String = "*"): DataFrame = {
    val lines = robots
      .select(col("host"),
        posexplode(split(col("body"), "\n")).as(Seq("i", "raw")))
      .select(col("host"), col("i"),
        trim(regexp_replace(col("raw"), "#.*$", ""), " \t\r").as("line"))
      .select(col("host"), col("i"),
        lower(regexp_extract(col("line"), "^([A-Za-z-]+)\\s*:", 1)).as("key"),
        trim(regexp_extract(col("line"), "^[A-Za-z-]+\\s*:(.*)$", 1), " \t")
          .as("value"))
    val w = Window.partitionBy(col("host")).orderBy(col("i"))
    val grouped = lines
      .withColumn("is_ua", col("key") === "user-agent")
      .withColumn("grp_start",
        (col("is_ua") && !coalesce(lag(col("is_ua"), 1).over(w), lit(false)))
          .cast("int"))
      .withColumn("grp", sum(col("grp_start")).over(w))
    // §2.2.1 precedence: a crawler obeys the group naming ITS token;
    // the `*` group applies only on hosts where no group names it
    val uaAll = grouped.filter(col("is_ua"))
      .groupBy(col("host"), col("grp"))
      .agg(collect_set(lower(col("value"))).as("uas"))
    val named = uaAll.filter(array_contains(col("uas"), agent))
      .select(col("host"), col("grp"))
    val fallback = uaAll.filter(array_contains(col("uas"), "*"))
      .select(col("host"), col("grp"))
      .join(named.select(col("host")).distinct(), Seq("host"), "left_anti")
    val uaGroups = named.union(fallback).distinct()
    grouped
      .filter(col("key").isin("allow", "disallow") && col("value") =!= "")
      .join(uaGroups, Seq("host", "grp"))
      .select(col("host"), col("key").as("rtype"), col("value").as("rpath"))
      .distinct()
  }

  /** Evaluate pages `(doc_id, host, path, …)` against [[rules]]
    * output: appends `rule` (the winning rule's path, "" when none
    * matches) and `allowed` (1/0). Longest-match (rule-string
    * length, wildcards counted as written), Allow-wins-ties,
    * no-match-allows — §2.2.2. The length/type/path max_by key makes
    * the winner deterministic even between same-length same-type
    * rules.
    *
    * §2.2.3 special characters: `*` in a rule matches any octet
    * sequence, a TRAILING `$` anchors the rule at the path's end (a
    * mid-rule `$` is literal). Plain prefix rules — the overwhelming
    * majority of real robots.txt lines — keep the cheap
    * `startsWith` path; only rules carrying `*`/`$` pay the regex
    * translation (metachars escaped, `*` → `.*`, `^`-anchored), so
    * the per-(page×rule) cost stays a prefix compare except where
    * the spec forces more.
    *
    * Grouping keys on (doc_id, host) — not doc_id alone — so two
    * pages on different hosts that happen to share an id never
    * collapse into one winner group. */
  def evaluate(pages: DataFrame, rules: DataFrame): DataFrame = {
    val anchored = col("rpath").endsWith("$")
    val body = when(anchored,
      expr("substring(rpath, 1, length(rpath) - 1)")).otherwise(col("rpath"))
    val matchers = rules
      .withColumn("has_wild", col("rpath").contains("*") || anchored)
      .withColumn("rre",
        when(col("has_wild"), concat(
          lit("^"),
          regexp_replace(
            regexp_replace(body, "([\\\\.\\[\\]\\{\\}\\(\\)\\+\\-\\^\\$\\|\\?])", "\\\\$1"),
            "\\*", ".*"),
          when(anchored, lit("$")).otherwise(lit("")))))
    val best = pages.select(col("doc_id"), col("host"), col("path"))
      .join(matchers, Seq("host"))
      .filter(when(col("has_wild"), regexp_like(col("path"), col("rre")))
        .otherwise(col("path").startsWith(col("rpath"))))
      .groupBy(col("doc_id"), col("host"))
      .agg(max_by(struct(col("rtype"), col("rpath")),
        struct(length(col("rpath")),
          (col("rtype") === "allow").cast("int"), col("rpath"))).as("best"))
      .select(col("doc_id"), col("host"), col("best.rtype").as("rtype"),
        col("best.rpath").as("best_rule"))
    pages.join(best, Seq("doc_id", "host"), "left")
      .withColumn("rule", coalesce(col("best_rule"), lit("")))
      .withColumn("allowed",
        (col("rtype").isNull || col("rtype") === "allow").cast("int"))
      .drop("rtype", "best_rule")
  }
}
