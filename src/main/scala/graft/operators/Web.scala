package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus curation operators: URL normalization, registrable-domain
  * (eTLD+1) extraction, and per-domain caps — the CommonCrawl-pipeline trio
  * that runs before any text-level dedup (URL-level exact dedup and domain
  * diversity balancing, per Gopher/RefinedWeb/FineWeb data pipelines).
  *
  * Everything is pure built-in column math (regexp parsing + array ops) —
  * SQL-mirrorable value-for-value, no UDFs, no driver state.
  */
object Web {

  /** Query parameters dropped by [[normalizeUrl]]: click/campaign trackers
    * that differ per visit without changing the resource.
    */
  val trackingParams: Seq[String] = Seq("utm_", "gclid", "fbclid", "msclkid")

  /** Compact public-suffix subset (publicsuffix.org rules; the full list is
    * data, not logic — swap in the complete one at deploy time). Two-level
    * rules here; every other TLD falls back to the one-level default rule.
    */
  val twoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.za", "com.sg", "co.kr")

  // crawl frontiers carry scheme-less entries ("example.com/x"): with no
  // "://" the authority is everything up to the first /?#
  private def authority(url: Column): Column =
    when(url.contains("://"), regexp_extract(url, "^[^:/?#]+://([^/?#]*)", 1))
      .otherwise(regexp_extract(url, "^([^/?#]*)", 1))

  /** URL normalization for exact URL-level dedup:
    * scheme/host lowercased, default ports stripped (http:80, https:443),
    * fragment removed, tracking params ([[trackingParams]]) dropped,
    * remaining query params sorted, empty path → "/". The result is a
    * canonical key — byte-equal for URLs that fetch the same resource.
    */
  def normalizeUrl(df: DataFrame, urlCol: String = "url",
      into: String = "url_norm"): DataFrame = {
    val u = col(urlCol)
    val scheme = lower(regexp_extract(u, "^([^:/?#]+)://", 1))
    val auth = authority(u)
    val host = lower(regexp_extract(auth, "^([^:]*)", 1))
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val portN = when(port === "", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .otherwise(concat(lit(":"), port))
    val path = when(u.contains("://"),
      regexp_extract(u, "^[^:/?#]+://[^/?#]*([^?#]*)", 1))
      .otherwise(regexp_extract(u, "^[^/?#]*([^?#]*)", 1))
    val pathN = when(path === "", lit("/")).otherwise(path)
    val query = regexp_extract(u, "\\?([^#]*)", 1)
    val kept = array_sort(filter(split(query, "&"), p =>
      p =!= "" && !trackingParams.foldLeft(lit(false)) { (acc, t) =>
        acc || p.startsWith(t)
      }))
    val queryN = when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
      .otherwise(lit(""))
    // scheme-less inputs normalize scheme-less (no phantom "://")
    val prefix = when(scheme === "", lit("")).otherwise(concat(scheme, lit("://")))
    df.withColumn(into, concat(prefix, host, portN, pathN, queryN))
  }

  /** Registrable domain (eTLD+1) of the URL's host: longest matching
    * public-suffix rule ([[twoLevelSuffixes]], else the one-level default)
    * plus one label — "a.b.site.co.uk" → "site.co.uk", "www.site.com" →
    * "site.com". Hosts that ARE a bare suffix (or a single label) pass
    * through unchanged.
    */
  def withRegistrableDomain(df: DataFrame, urlCol: String = "url",
      into: String = "domain"): DataFrame = {
    val host = lower(regexp_extract(authority(col(urlCol)), "^([^:]*)", 1))
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    val suffix2 = array(twoLevelSuffixes.map(lit): _*)
    val etld1 = when(n >= 3 && array_contains(suffix2, last2), last3)
      .when(n >= 2, last2)
      .otherwise(host)
    df.withColumn(into, etld1)
  }

  /** Deterministic per-domain cap — domain diversity balancing: keep at most
    * `cap` rows per domain, chosen by a seeded splitmix64 of `idCol` (stable
    * across runs, partitionings, and engines — not `rand()`). Appends
    * `rank_in_domain` and filters to `<= cap`.
    *
    * Scale shape: the `row_number <= cap` idiom becomes a WindowGroupLimit —
    * every task prunes each domain to its `cap` best rows BEFORE the
    * exchange, so a mega-domain (the crawl's canonical skew) crosses the
    * shuffle as O(tasks · cap) rows, not its full row count.
    */
  def perDomainCap(
      df: DataFrame,
      domainCol: String = "domain",
      idCol: String = "doc_id",
      cap: Int = 5,
      seed: Long = 42L): DataFrame = {
    require(cap >= 1, "cap must be positive")
    import graft.functions.TextFunctions.mix64_hash
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(mix64_hash(col(idCol), seed), col(idCol))
    df.withColumn("rank_in_domain", row_number().over(w))
      .where(col("rank_in_domain") <= cap)
  }
}
