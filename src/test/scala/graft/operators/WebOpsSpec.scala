package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization / registrable-domain specs on hand-picked
  * variants: the forms that must collapse, and the garbage that must
  * pass through untouched. */
class WebOpsSpec extends SparkSpec {

  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(WebOps.canonicalizeUrl(col("u")))
      .collect().head.getString(0)

  private def dom(host: String): String =
    Seq(host).toDF("h").select(WebOps.registrableDomain(col("h")))
      .collect().head.getString(0)

  test("canonicalizeUrl collapses tracking/case/port/fragment variants") {
    assert(canon("HTTPS://User@Example.COM:443/Path/Pg?utm_source=x&b=2&a=1#f")
      == "https://example.com/Path/Pg?a=1&b=2") // path case PRESERVED
    assert(canon("http://example.com:80/x") == "http://example.com/x")
    assert(canon("http://example.com:8080") == "http://example.com:8080/")
    assert(canon("https://example.com/?fbclid=abc") == "https://example.com/")
    assert(canon("https://example.com?a=1") == "https://example.com/?a=1")
    assert(canon("not a url") == "not a url") // garbage passes through
  }

  test("identical pages under URL variants share one canonical key") {
    val urls = Seq(
      "https://example.com/a?x=1&y=2",
      "https://EXAMPLE.com/a?y=2&x=1&utm_campaign=spring",
      "https://example.com:443/a?x=1&y=2#section")
      .toDF("u")
    val keys = urls.select(WebOps.canonicalizeUrl(col("u")))
      .distinct().collect()
    assert(keys.length == 1 &&
      keys.head.getString(0) == "https://example.com/a?x=1&y=2")
  }

  test("registrableDomain heuristic: ccTLD second-level, IPs, bare hosts") {
    assert(dom("shop.example.co.uk") == "example.co.uk")
    assert(dom("a.b.example.com") == "example.com")
    assert(dom("example.org") == "example.org")
    assert(dom("localhost") == "localhost")
    assert(dom("192.168.0.1") == "192.168.0.1")
    assert(dom("news.bbc.ac.jp") == "bbc.ac.jp")
  }

  test("registrableDomainWith: PSL table corrects the heuristic; label-tail matching") {
    import spark.implicits._
    // a PSL-shaped rule table: plain TLDs, a ccTLD second-level, and a
    // PRIVATE multi-label suffix (github.io) the heuristic's fixed
    // second-level list cannot know about
    val psl = Seq("com", "uk", "co.uk", "io", "github.io", "jp",
      "nagoya.jp").toDF("suffix")
    val hosts = Seq(
      "foo.github.io",      // heuristic says github.io — WRONG per PSL
      "shop.example.co.uk", // both right (co is in the heuristic list)
      "a.b.example.com",
      "foo.example.nagoya.jp", // nagoya.jp rule: 3-label registrable
      "bexample.co",        // must NOT substring-match rule "co"... tail only
      "192.168.0.1",
      "localhost").toDF("host")
    val got = WebOps.registrableDomainWith(hosts, psl).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // the documented heuristic miss, fixed by the table path:
    assert(dom("foo.github.io") == "github.io")
    assert(got("foo.github.io") == "foo.github.io")
    assert(got("shop.example.co.uk") == "example.co.uk")
    assert(got("a.b.example.com") == "example.com")
    // heuristic also misses the ccTLD second-level not in its list
    assert(dom("foo.example.nagoya.jp") == "nagoya.jp")
    assert(got("foo.example.nagoya.jp") == "example.nagoya.jp")
    // no-rule fallback = last label as suffix; tails only, no substrings
    assert(got("bexample.co") == "bexample.co")
    assert(got("192.168.0.1") == "192.168.0.1")
    assert(got("localhost") == "localhost")
  }

  test("registrableDomainWith: wildcard + exception rules per the PSL algorithm") {
    import spark.implicits._
    // the canonical PSL pair: every label under ck is a public suffix
    // EXCEPT www.ck, which is a registrable domain
    val psl = Seq("com", "ck", "*.ck", "!www.ck").toDF("suffix")
    val hosts = Seq(
      "a.b.ck",    // *.ck -> suffix b.ck -> registrable a.b.ck
      "b.ck",      // *.ck matches the whole host -> no registrable, host itself
      "www.ck",    // exception: suffix ck -> registrable www.ck
      "foo.www.ck", // exception beats *.ck -> registrable www.ck
      "x.com").toDF("host")
    val got = WebOps.registrableDomainWith(hosts, psl).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "a.b.ck" -> "a.b.ck", "b.ck" -> "b.ck", "www.ck" -> "www.ck",
      "foo.www.ck" -> "www.ck", "x.com" -> "x.com"))
  }

  test("registrableDomainWith: host normalization (case, trailing dot)") {
    import spark.implicits._
    val psl = Seq("com", "uk", "co.uk").toDF("suffix")
    val hosts = Seq("WWW.Example.CO.UK.", "Shop.EXAMPLE.com.").toDF("host")
    val got = WebOps.registrableDomainWith(hosts, psl).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "WWW.Example.CO.UK." -> "example.co.uk",
      "Shop.EXAMPLE.com." -> "example.com"))
  }

  test("robotsFilter: longest match wins, ties to allow, default allow") {
    import spark.implicits._
    val rules = Seq(
      ("example.com", "/a", false),
      ("example.com", "/a/b", true),
      ("example.com", "/a/b", false), // tie with the allow above
      ("blocked.org", "/", false)).toDF("domain", "path_prefix", "allow")
    val urls = Seq(
      (1L, "https://example.com/a/x"),      // /a disallow
      (2L, "https://example.com/a/b/c"),    // /a/b: tie -> allow
      (3L, "https://example.com/other"),    // no match -> allow
      (4L, "https://blocked.org/anything"), // site-wide disallow
      (5L, "https://example.com"),          // empty path -> "/", no match
      (6L, "https://unlisted.net/x")        // no rules for host -> allow
    ).toDF("url_id", "url")
    val got = WebOps.robotsFilter(urls, rules).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> ((false, 2L)), 2L -> ((true, 4L)), 3L -> ((true, -1L)),
      4L -> ((false, 1L)), 5L -> ((true, -1L)), 6L -> ((true, -1L))))
  }

  test("robotsFilterPatterns: wildcards, end anchors, metachar escaping") {
    import spark.implicits._
    val rules = Seq(
      ("e.com", "/a*", false),        // wildcard prefix, len 3
      ("e.com", "/a/b$", true),       // exact-only allow, len 5
      ("e.com", "/*.pdf$", false),    // extension block ('.' must be
                                      // LITERAL: /axpdf must not match)
      ("e.com", "/q?x=1", false))     // '?' literal, not regex any-char
      .toDF("domain", "path_pattern", "allow")
    val urls = Seq(
      (1L, "https://e.com/a/c"),     // /a* deny (anchor rule needs exact)
      (2L, "https://e.com/a/b"),     // /a/b$ exact: allow beats /a* on length
      (3L, "https://e.com/a/b/c"),   // NOT exact: anchor rule out -> deny
      (4L, "https://e.com/doc.pdf"), // *.pdf$ deny
      (5L, "https://e.com/docxpdf"), // '.' escaped: NOT denied by *.pdf$
      (6L, "https://e.com/z"))       // no match -> allow
      .toDF("url_id", "url")
    val got = WebOps.robotsFilterPatterns(urls, rules).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> ((false, 3L)), 2L -> ((true, 5L)), 3L -> ((false, 3L)),
      4L -> ((false, 7L)), 5L -> ((true, -1L)), 6L -> ((true, -1L))),
      got.toString)
    // the literal-'?' rule: '?' begins the query string, which pathOf
    // strips — so a '?' pattern can only match if treated literally
    // against the PATH; /q alone must not match /q?x=1's pattern
    val q = WebOps.robotsFilterPatterns(
      Seq((7L, "https://e.com/q")).toDF("url_id", "url"), rules)
      .collect().head
    assert(q.getBoolean(2), "bare /q wrongly matched the '/q?x=1' rule")
  }

  test("robotsFilter plan: URL side broadcast-joined, never shuffled") {
    import spark.implicits._
    val rules = Seq(("example.com", "/", false))
      .toDF("domain", "path_prefix", "allow")
    val urls = Seq((1L, "https://example.com/x")).toDF("url_id", "url")
    val plan = WebOps.robotsFilter(urls, rules)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
    assert(!plan.contains("Window"))
  }

  private def strip(h: String): String = {
    import spark.implicits._
    Seq(h).toDF("h").select(WebOps.stripHtml(col("h"))).head().getString(0)
  }

  test("stripHtml: script/style payloads and comments vanish whole") {
    assert(strip("<p>keep</p><script>var a = '<b>no</b>';</script>done")
      == "keep done")
    assert(strip("a<style type=\"text/css\">p { x: 1 }</style>b") == "a b")
    assert(strip("x<!-- hidden <b>bold</b> -->y") == "x y")
    // case-insensitive + multi-line blocks
    assert(strip("a<SCRIPT>\nline1\nline2\n</SCRIPT>b") == "a b")
  }

  test("stripHtml: tags out, entities decoded, &amp; decodes last") {
    assert(strip("<h1 class=\"t\">Title</h1><p>A &amp; B &lt;3</p>")
      == "Title A & B <3")
    assert(strip("&quot;q&quot; &#39;a&#39; &apos;b&apos;&nbsp;end")
      == "\"q\" 'a' 'b' end")
    // &amp;lt; is an ESCAPED entity: renders as literal "&lt;"
    assert(strip("&amp;lt;") == "&lt;")
    // entity-encoded markup is text, never re-parsed as a tag
    assert(strip("&lt;script&gt;x&lt;/script&gt;") == "<script>x</script>")
  }

  test("stripHtml: whitespace collapses; plain text passes through") {
    assert(strip("<div>\n  a\n\t b  </div>") == "a b")
    assert(strip("already plain text") == "already plain text")
  }

  test("registrableDomainWith: randomized hosts/rules match a naive PSL reference") {
    import spark.implicits._
    // plain-Scala reference of the documented PSL semantics — an
    // implementation simple enough to audit by eye
    def ref(rawHost: String, rules: Seq[String]): String = {
      val host = rawHost.toLowerCase.stripSuffix(".")
      val hl = host.split("\\.", -1).toSeq
      val n = hl.length
      if (host.matches("^[0-9.]+$") || n <= 1) return host
      val winners = rules.flatMap { r =>
        val exc = r.startsWith("!")
        val rl = (if (exc) r.drop(1) else r).split("\\.", -1).toSeq
        val sn = rl.length
        val tail = hl.takeRight(sn)
        if (n >= sn && rl.zip(tail).forall { case (a, b) => a == "*" || a == b })
          Some((if (exc) 1 else 0, if (exc) sn - 1 else sn))
        else None
      }
      val sfx = if (winners.isEmpty) 1 else winners.max._2
      hl.takeRight(math.max(math.min(sfx + 1, n), 1)).mkString(".")
    }
    val rnd = new scala.util.Random(20260813L)
    val labels = Seq("a", "bb", "www", "example", "co", "uk", "io", "x9")
    def mkHost(): String = {
      val n = 1 + rnd.nextInt(5)
      val base = Seq.fill(n)(labels(rnd.nextInt(labels.length))).mkString(".")
      val cased = if (rnd.nextInt(4) == 0) base.toUpperCase else base
      val dotted = if (rnd.nextInt(6) == 0) cased + "." else cased
      if (rnd.nextInt(12) == 0) s"10.${rnd.nextInt(256)}.0.${rnd.nextInt(256)}"
      else dotted
    }
    def mkRule(): String = {
      val n = 1 + rnd.nextInt(3)
      val body = Seq.fill(n)(labels(rnd.nextInt(labels.length)))
        .updated(0, if (rnd.nextInt(5) == 0) "*"
          else labels(rnd.nextInt(labels.length))).mkString(".")
      if (rnd.nextInt(6) == 0 && n >= 2) "!" + body else body
    }
    for (round <- 1 to 3) {
      val rules = Seq.fill(12)(mkRule()).distinct
      val hosts = Seq.tabulate(100)(i => (i.toLong, mkHost()))
      val got = WebOps.registrableDomainWith(
          hosts.toDF("host_id", "host"), rules.toDF("suffix"))
        .select("host_id", "host", "registrable_domain")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      got.foreach { case (id, h, d) =>
        assert(d == ref(h, rules),
          s"round $round host '$h' (id $id): got '$d', " +
            s"reference '${ref(h, rules)}', rules=$rules")
      }
    }
  }
}
