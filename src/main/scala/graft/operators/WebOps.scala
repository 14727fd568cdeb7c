package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-side URL handling: canonicalization (the dedup key for web
  * corpora — the same page arrives under utm-tagged, fragment-bearing,
  * case-shifted URL variants), and a registrable-domain heuristic (the
  * per-site grouping key for quotas, skew caps, robots bookkeeping).
  *
  * Everything is per-row `regexp_extract` / array expressions with
  * exact DuckDB twins (no lookahead, no engine-specific classes), so
  * the oracle replays byte-for-byte. A production deployment would
  * swap [[registrableDomain]]'s small built-in second-level list for
  * the full Public Suffix List (same expression shape, broadcast
  * lookup); the heuristic is documented as such, not as PSL-complete.
  */
object WebOps {

  /** Tracking parameters stripped by [[canonicalizeUrl]]: the
    * analytics tags that vary per click without changing content. */
  val TrackingParams: Seq[String] =
    Seq("fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "ref")

  private def schemeOf(url: Column): Column =
    lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))

  /** host[:port] with any userinfo@ stripped, lowercased. */
  private def authorityOf(url: Column): Column = {
    val auth = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    lower(element_at(split(auth, "@"), -1))
  }

  /** Bare host: authority minus any :port suffix. */
  def hostOf(url: Column): Column =
    element_at(split(authorityOf(url), ":"), 1)

  private def portOf(url: Column): Column = {
    val a = authorityOf(url)
    when(a.contains(":"), element_at(split(a, ":"), -1)).otherwise(lit(""))
  }

  private def pathOf(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  private def queryOf(url: Column): Column =
    regexp_extract(url, "\\?([^#]*)", 1)

  /** Canonical form for dedup keys:
    *   - scheme + host lowercased, userinfo and fragment dropped;
    *   - default ports stripped (http:80, https:443), others kept;
    *   - tracking params ([[TrackingParams]] + any `utm_*`) removed,
    *     survivors SORTED so param order never splits a dup group;
    *   - empty path becomes "/".
    * Non-URL strings (no scheme://) pass through unchanged — garbage
    * keys group only with identical garbage, never crash the pass. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = schemeOf(url)
    val host = hostOf(url)
    val port = portOf(url)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val path = when(pathOf(url) === "", "/").otherwise(pathOf(url))
    val kept = array_sort(filter(split(queryOf(url), "&"), p =>
      !(p.startsWith("utm_") || p === "" ||
        TrackingParams.map(t => p === t || p.startsWith(t + "="))
          .reduce(_ || _))))
    val q = array_join(kept, "&")
    when(scheme === "", url).otherwise(concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(q =!= "", concat(lit("?"), q)).otherwise(lit(""))))
  }

  /** HTML → text extraction — the step between the crawl and every
    * text-analysis operator: drop script/style payloads and comments
    * wholesale, strip remaining tags, decode the common entities,
    * collapse whitespace. Per-row regex/replace chain (no parser
    * state), codegen-friendly, with an exact DuckDB twin — Java regex
    * and RE2 agree on every construct used here (inline `(?is)`
    * flags, non-greedy repetition, `[^>]` classes, `\s`).
    *
    * Deliberately a TEXT EXTRACTOR, not a sanitizer: entity decoding
    * follows tag stripping (so `&lt;script&gt;` renders as literal
    * text exactly as a browser would) and `&amp;` decodes LAST (so
    * `&amp;lt;` yields `&lt;`, the double-escape rule). Boilerplate
    * REMOVAL (nav/footer pruning à la trafilatura) is a DOM problem
    * out of scope here — compose with [[Dedup.segmentDedup]]-style
    * line dedup for that, which is how the big crawl pipelines
    * actually kill shared chrome. */
  def stripHtml(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&apos;" -> "'", "&nbsp;" -> " ").foldLeft(noTags) {
      case (c, (ent, ch)) => replace(c, lit(ent), lit(ch))
    }
    val amp = replace(decoded, lit("&amp;"), lit("&"))
    // explicit class = Java's \s (r16 sweep: RE2's \s lacks \x0B,
    // so a vertical tab survived collapse in the DuckDB replay)
    trim(regexp_replace(amp, "[ \\t\\n\\x0B\\f\\r]+", " "))
  }

  /** Robots-style URL rule filter: `rules(domain, path_prefix,
    * allow)` resolved per URL with longest-prefix-match semantics,
    * ties to allow — the Google-documented robots.txt resolution
    * order. URLs on hosts with no rules, or matching no rule, are
    * allowed (robots' own default).
    *
    * 100 TB shape: the rule table collapses to ONE array row per host
    * (rules are small by definition — they're hand-written site
    * policy), broadcast-joined to the URL stream; the winning rule is
    * picked per row by `filter`/`transform`/`array_max` over that
    * array — the URL table is never shuffled, grouped, or windowed.
    * `array_max` on struct(l, a) is lexicographic: longest prefix
    * first, then allow > disallow — exactly the tie rule.
    *
    * Output: input columns + `allowed` (boolean) + `matched_len`
    * (length of the winning prefix, -1 when no rule matched). */
  def robotsFilter(urls: DataFrame, rules: DataFrame,
      urlCol: String = "url"): DataFrame = {
    val perHost = rules.groupBy(col("domain"))
      .agg(collect_list(struct(col("path_prefix"), col("allow")))
        .as("__rules"))
    val rawPath = pathOf(col(urlCol))
    val path = when(rawPath === "", "/").otherwise(rawPath)
    val matched = filter(col("__rules"),
      r => path.startsWith(r.getField("path_prefix")))
    val best = array_max(transform(matched, r =>
      struct(length(r.getField("path_prefix")).as("l"),
        r.getField("allow").as("a"))))
    urls.withColumn("__host", hostOf(col(urlCol)))
      .join(broadcast(perHost), col("__host") === perHost("domain"), "left")
      .withColumn("__best", best)
      .withColumn("allowed",
        coalesce(col("__best").getField("a"), lit(true)))
      .withColumn("matched_len",
        coalesce(col("__best").getField("l").cast("long"), lit(-1L)))
      .drop("__host", "domain", "__rules", "__best")
  }

  /** [[robotsFilter]] upgraded to the FULL RFC 9309 pattern grammar —
    * production-exact robots matching, the way `registrableDomainWith`
    * upgrades the PSL heuristic: rules are (domain, path_pattern,
    * allow) where a pattern is literal octets, `*` (any sequence) and
    * an optional trailing `$` (end anchor). Decision per URL: among
    * matching rules the LONGEST pattern wins (most-specific, per the
    * RFC), ties go to allow; no matching rule → allowed.
    *
    * Each pattern compiles ONCE to a regex inside the broadcast rule
    * fold (escape regex metachars, `*` → `.*`, `^` start anchor, `$`
    * kept only as the trailing anchor); the URL stream then pays one
    * per-rule regex test per row and never shuffles — the
    * [[robotsFilter]] plan with `startsWith` swapped for
    * `regexp_like`. */
  def robotsFilterPatterns(urls: DataFrame, rules: DataFrame,
      urlCol: String = "url"): DataFrame = {
    val anchored = col("path_pattern").endsWith("$")
    val body = when(anchored,
      expr("substring(path_pattern, 1, length(path_pattern) - 1)"))
      .otherwise(col("path_pattern"))
    val esc = regexp_replace(body,
      "([.?+(){}\\[\\]^$|\\\\])", "\\\\$1")
    val rx = concat(lit("^"), regexp_replace(esc, "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
    val perHost = rules
      .withColumn("__rx", rx)
      .withColumn("__l", length(col("path_pattern")))
      .groupBy(col("domain"))
      .agg(collect_list(struct(col("__rx"), col("__l"), col("allow")))
        .as("__rules"))
    val rawPath = pathOf(col(urlCol))
    val path = when(rawPath === "", "/").otherwise(rawPath)
    val matched = filter(col("__rules"),
      r => regexp_like(path, r.getField("__rx")))
    val best = array_max(transform(matched, r =>
      struct(r.getField("__l").as("l"), r.getField("allow").as("a"))))
    urls.withColumn("__host", hostOf(col(urlCol)))
      .join(broadcast(perHost), col("__host") === perHost("domain"),
        "left")
      .withColumn("__best", best)
      .withColumn("allowed",
        coalesce(col("__best").getField("a"), lit(true)))
      .withColumn("matched_len",
        coalesce(col("__best").getField("l").cast("long"), lit(-1L)))
      .drop("__host", "domain", "__rules", "__best")
  }

  /** Registrable-domain HEURISTIC: the last two host labels, or the
    * last three when the second-to-last is a common second-level
    * label (`co`, `com`, `ac`, `gov`, `org`, `net`, `edu`) under a
    * 2-letter country TLD — so `shop.example.co.uk` → `example.co.uk`
    * while `a.b.example.com` → `example.com`. Swap in the full Public
    * Suffix List for production exactness. IPs and single-label hosts
    * pass through whole. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val isIp = host.rlike("^[0-9.]+$")
    val sld = element_at(labels, -2)
    val tld = element_at(labels, -1)
    val needThree = n >= 3 &&
      sld.isin("co", "com", "ac", "gov", "org", "net", "edu") &&
      length(tld) === 2
    when(isIp || n <= 2, host)
      .when(needThree, concat_ws(".", slice(labels, -3, 3)))
      .otherwise(concat_ws(".", slice(labels, -2, 2)))
  }

  /** Registrable domain resolved against an EXPLICIT public-suffix
    * rule table — the production-exact path [[registrableDomain]]'s
    * scaladoc promises: load the real Public Suffix List as
    * `suffixes(suffix)` (one row per rule, e.g. "com", "co.uk",
    * "github.io") and the registrable domain is the winning suffix
    * plus one label. Longest-match semantics, per the PSL algorithm;
    * hosts matching no rule fall back to the last label as the
    * suffix (the PSL's own "*" default), and IPs / single-label
    * hosts pass through whole.
    *
    * 100 TB shape — identical to [[robotsFilter]]'s broadcast fold:
    * the rule table (~9k rows for the real PSL) collapses to ONE
    * array row, broadcast against the host stream; matching is a
    * per-row `filter`/`array_max` over that array. The host table is
    * never shuffled, grouped, or windowed, and the filter compares
    * each rule against the host's label TAIL (never substrings), so
    * "example.co" can't match host "bexample.co".
    *
    * The FULL PSL rule grammar is supported: wildcard rules ("*.ck" —
    * `*` matches exactly one label in that position) and exception
    * rules ("!www.ck" — when matched, the public suffix is the rule
    * minus its leftmost label, overriding every wildcard/literal
    * match, per the PSL algorithm). Hosts are normalized before
    * matching — lowercased, one trailing dot (FQDN form) stripped —
    * so "WWW.Example.CO.UK." resolves like "www.example.co.uk"; the
    * emitted `registrable_domain` is built from the normalized host.
    *
    * Output: input columns + `registrable_domain`. */
  def registrableDomainWith(hosts: DataFrame, suffixes: DataFrame,
      hostCol: String = "host"): DataFrame = {
    val folded = suffixes
      .agg(collect_list(col("suffix")).as("__sfx"))
    val host = lower(regexp_replace(col(hostCol), "\\.$", ""))
    val labels = split(host, "\\.")
    val n = size(labels)
    val isIp = host.rlike("^[0-9.]+$")
    // per rule s: strip a leading "!" (exception marker), then match
    // the host's label TAIL label-by-label ("*" matches any ONE label,
    // never substrings — "example.co" can't match host "bexample.co").
    // A host that IS its winning suffix (n == sn) still matches; the
    // final least(·, n) cap then emits the host itself — the PSL edge
    // rule for hosts with no registrable domain.
    def body(s: Column): Column =
      when(substring(s, 1, 1) === "!", substring(s, 2, 1000)).otherwise(s)
    val matched = filter(col("__sfx"), s => {
      val rl = split(body(s), "\\.")
      val sn = size(rl)
      n >= sn && forall(
        zip_with(rl, slice(labels, -sn, lit(100)),
          (r, h) => r === "*" || r === h), m => m)
    })
    // winner, per PSL: an exception rule beats everything; otherwise
    // more labels beats fewer. Effective suffix length: the rule's
    // label count, minus one for an exception (its public suffix is
    // the rule sans leftmost label, so the registrable domain is the
    // exception rule itself). Ties impossible among literals (distinct
    // rules, equal-length tails of one host are equal strings); a
    // wildcard and a literal of equal length resolve identically.
    // TIE-BREAK INVARIANT (ADVICE r7): on an (e, l) tie array_max
    // picks the lexicographically LARGEST rule string; the DuckDB
    // oracle orders `rule DESC` to match. Output today depends only on
    // `l`, but anything future that emits the winning rule itself must
    // keep both engines on this direction.
    val best = array_max(transform(matched, s => {
      val isExc = substring(s, 1, 1) === "!"
      val sn = size(split(body(s), "\\."))
      struct(when(isExc, 1).otherwise(0).as("e"),
        when(isExc, sn - 1).otherwise(sn).as("l"), s.as("s"))
    }))
    // no-rule fallback: the PSL's own "*" default — last label is the
    // suffix
    val sfxLabels = coalesce(col("__best").getField("l"), lit(1))
    hosts.crossJoin(broadcast(folded))
      .withColumn("__best", best)
      .withColumn("registrable_domain",
        when(isIp || n <= 1, host)
          .otherwise(concat_ws(".",
            slice(labels, -greatest(least(sfxLabels + 1, n), lit(1)),
              lit(100)))))
      .drop("__sfx", "__best")
  }
}
