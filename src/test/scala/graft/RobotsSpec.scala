package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.RobotsTxt

/** RFC 9309 semantics pinned case by case: group selection, rule
  * precedence (most octets, Allow on ties), and the `*`/`$` pattern
  * grammar — the cases real robots.txt files exercise daily.
  */
class RobotsSpec extends AnyFunSuite {

  private def allowed(txt: String, agent: String, path: String): Boolean =
    RobotsTxt.isAllowed(RobotsTxt.parse(txt), agent, path)

  test("longest match wins; Allow beats Disallow on an equal-length tie") {
    val txt = "User-agent: *\n" +
      "Disallow: /example/page/\n" +
      "Allow: /example/page/allowed.gif\n"
    assert(!allowed(txt, "bot", "/example/page/other"))
    assert(allowed(txt, "bot", "/example/page/allowed.gif"))
    val tie = "User-agent: *\nAllow: /p\nDisallow: /p\n"
    assert(allowed(tie, "bot", "/p/x"))
  }

  test("$ anchors and * wildcards per §2.2.3; $ alone matches only " +
      "the empty path") {
    val txt = "User-agent: *\nDisallow: /*.gif$\n"
    assert(!allowed(txt, "bot", "/pics/cat.gif"))
    assert(allowed(txt, "bot", "/pics/cat.gifs"))
    assert(allowed(txt, "bot", "/pics/cat.png"))
    val mid = "User-agent: *\nDisallow: /private*/data\n"
    assert(!allowed(mid, "bot", "/private2024/data/x"))
    assert(allowed(mid, "bot", "/private2024/info"))
    // regression: a bare "$" must not match every path
    assert(allowed("User-agent: *\nDisallow: $\n", "bot", "/x"))
  }

  test("a specific-token group EXCLUDES the wildcard group; token " +
      "match is case-insensitive; agent runs share rules") {
    val txt = "User-agent: *\n" +
      "Disallow: /\n" +
      "User-agent: GraftBot\n" +
      "User-agent: otherbot\n" +
      "Allow: /docs/\n" +
      "Disallow: /\n"
    // wildcard group blocks everything for unknown agents
    assert(!allowed(txt, "strange", "/docs/a"))
    // graftbot's own group allows /docs/ (and its * rule blocks the rest)
    assert(allowed(txt, "graftbot", "/docs/a"))
    assert(!allowed(txt, "GRAFTBOT", "/private"))
    // the second token in the same agent run shares the rules
    assert(allowed(txt, "otherbot", "/docs/a"))
  }

  test("comments and unknown fields are ignored; rules before any " +
      "group are ignored; empty Disallow allows everything") {
    val txt = "Disallow: /orphan\n" +
      "Sitemap: https://x/sitemap.xml\n" +
      "User-agent: * # trailing comment\n" +
      "Crawl-delay: 10\n" +
      "Disallow:\n"
    assert(allowed(txt, "bot", "/orphan/x"))
    assert(allowed(txt, "bot", "/anything"))
    // no groups at all -> allowed
    assert(allowed("# only comments\n", "bot", "/x"))
  }

  test("crawl-delay binds to its group (specific beats wildcard; " +
      "merged groups take the max); sitemaps are file-wide") {
    val txt = "Sitemap: https://h/s1.xml\n" +
      "User-agent: *\nCrawl-delay: 10\nDisallow: /x/\n" +
      "User-agent: graftbot\nDisallow:\nCrawl-delay: 2\n" +
      "User-agent: graftbot\nCrawl-delay: 7\nDisallow: /y/\n" +
      "Sitemap: https://h/s2.xml\n"
    val g = RobotsTxt.parse(txt)
    assert(RobotsTxt.crawlDelayFor(g, "graftbot") == Some(7L))
    assert(RobotsTxt.crawlDelayFor(g, "other") == Some(10L))
    assert(RobotsTxt.crawlDelayFor(Seq.empty, "x").isEmpty)
    assert(RobotsTxt.sitemaps(txt)
      == Seq("https://h/s1.xml", "https://h/s2.xml"))
  }

  test("two groups naming the same token merge in file order") {
    val txt = "User-agent: graftbot\nDisallow: /a/\n" +
      "User-agent: other\nDisallow: /\n" +
      "User-agent: graftbot\nDisallow: /b/\n"
    assert(!allowed(txt, "graftbot", "/a/x"))
    assert(!allowed(txt, "graftbot", "/b/x"))
    assert(allowed(txt, "graftbot", "/c/x"))
  }
}
