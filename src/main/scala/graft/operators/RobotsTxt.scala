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
  *   - `Allow`/`Disallow` values are path prefixes; an EMPTY value
  *     matches nothing (a bare `Disallow:` means allow-all).
  *
  * Matching (§2.2.2): the rule with the LONGEST matching prefix wins;
  * on a length tie `Allow` wins. A page no rule matches is allowed.
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
    * matches) and `allowed` (1/0). Longest-match, Allow-wins-ties,
    * no-match-allows — §2.2.2. The length/type/path max_by key makes
    * the winner deterministic even between same-length same-type
    * rules. */
  def evaluate(pages: DataFrame, rules: DataFrame): DataFrame = {
    val best = pages.select(col("doc_id"), col("host"), col("path"))
      .join(rules, Seq("host"))
      .filter(col("path").startsWith(col("rpath")))
      .groupBy(col("doc_id"))
      .agg(max_by(struct(col("rtype"), col("rpath")),
        struct(length(col("rpath")),
          (col("rtype") === "allow").cast("int"), col("rpath"))).as("best"))
      .select(col("doc_id"), col("best.rtype").as("rtype"),
        col("best.rpath").as("best_rule"))
    pages.join(best, Seq("doc_id"), "left")
      .withColumn("rule", coalesce(col("best_rule"), lit("")))
      .withColumn("allowed",
        (col("rtype").isNull || col("rtype") === "allow").cast("int"))
      .drop("rtype", "best_rule")
  }
}
