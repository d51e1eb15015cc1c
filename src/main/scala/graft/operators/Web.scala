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

  /** Full PSL rule grammar (publicsuffix.org/list): normal rules
    * ([[twoLevelSuffixes]]), wildcard rules (`*.` — any label in that
    * position is part of the suffix) and exception rules (`!` — carve-outs
    * from a wildcard: the suffix is the rule minus its leftmost label).
    * The entries here are the published rules the PSL's own test vectors
    * exercise; the table is data — swap in the complete list at deploy time.
    */
  val pslRules: Seq[String] = twoLevelSuffixes ++ Seq(
    "*.ck", "!www.ck",
    "*.kawasaki.jp", "!city.kawasaki.jp",
    "*.bd", "*.er")

  /** One parsed PSL rule: its labels (marker stripped), and whether it was
    * a `*.` wildcard or a `!` exception.
    */
  private[graft] final case class PslRule(
      labels: List[String], wildcard: Boolean, exception: Boolean)

  private[graft] lazy val parsedPslRules: Seq[PslRule] = pslRules.map { r =>
    if (r.startsWith("!")) PslRule(r.drop(1).split('.').toList, wildcard = false, exception = true)
    else if (r.startsWith("*.")) PslRule(r.drop(2).split('.').toList, wildcard = true, exception = false)
    else PslRule(r.split('.').toList, wildcard = false, exception = false)
  }

  /** The prevailing-rule evaluation order the PSL algorithm prescribes,
    * flattened to (condition-ingredients, public-suffix label count):
    * exception rules first (longest body first; suffix = body minus its
    * leftmost label), then normal/wildcard rules longest-first, then the
    * implicit default rule `*` (suffix = 1 label). Shared by the Spark
    * expression and the DuckDB oracle mirror so the two cannot drift.
    * Each entry: (labels to compare, labelCount compared, resulting
    * suffix length). A wildcard rule of k labels compares its k−1 tail
    * labels but yields a k-label suffix.
    */
  private[graft] lazy val pslBranches: Seq[(Seq[String], Int, Int)] = {
    val (exc, rest) = parsedPslRules.partition(_.exception)
    val excB = exc.sortBy(-_.labels.length).map { r =>
      (Seq(r.labels.mkString(".")), r.labels.length, r.labels.length - 1)
    }
    val ks = rest.map(r => if (r.wildcard) r.labels.length + 1 else r.labels.length)
      .distinct.sorted.reverse
    val ruleB = ks.flatMap { k =>
      val normals = rest.filter(r => !r.wildcard && r.labels.length == k)
        .map(_.labels.mkString("."))
      val wildTails = rest.filter(r => r.wildcard && r.labels.length == k - 1)
        .map(_.labels.mkString("."))
      Seq(
        if (normals.nonEmpty) Some((normals, k, k)) else None,
        if (wildTails.nonEmpty) Some((wildTails, k - 1, k)) else None).flatten
    }
    excB ++ ruleB
  }

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

  /** Registrable domain (eTLD+1) of the URL's host under the PSL algorithm
    * over [[pslRules]]: the prevailing rule is the matching exception rule
    * if any, else the matching rule with the most labels, else the default
    * `*`; the registrable domain is the prevailing public suffix plus one
    * label — "a.b.site.co.uk" → "site.co.uk", "www.site.com" → "site.com",
    * "anything.ck" → wildcard suffix so "x.anything.ck" → "x.anything.ck"'s
    * last three... i.e. the label left of the matched suffix, while
    * "www.ck" (exception) → "www.ck". Hosts that ARE a bare suffix (or a
    * single label) pass through unchanged.
    */
  def withRegistrableDomain(df: DataFrame, urlCol: String = "url",
      into: String = "domain"): DataFrame = {
    val host = lower(regexp_extract(authority(col(urlCol)), "^([^:]*)", 1))
    val labels = split(host, "\\.")
    val n = size(labels)
    def lastK(k: Int): Column =
      array_join(slice(labels, greatest(n - lit(k) + 1, lit(1)), lit(k)), ".")
    val suffixLen = pslBranches.foldRight(lit(1): Column) {
      case ((ruleStrs, cmpK, sufLen), chain) =>
        // a rule only matches hosts with at least as many labels as the
        // FULL rule — for a wildcard that includes the `*` label itself
        // (cmpK compares just the literal tail), for an exception the
        // whole body (sufLen is the body minus one)
        val minN = math.max(cmpK, sufLen)
        val cmp =
          if (ruleStrs.size == 1) lastK(cmpK) === ruleStrs.head
          else array_contains(array(ruleStrs.map(lit): _*), lastK(cmpK))
        when(n >= minN && cmp, lit(sufLen)).otherwise(chain)
    }
    val etld1 = when(n > suffixLen,
      array_join(slice(labels, n - suffixLen, suffixLen + 1), "."))
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
