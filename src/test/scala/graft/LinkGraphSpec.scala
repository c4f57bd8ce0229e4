package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{HtmlText, PublicSuffix}

/** Pins the link-graph front door: href extraction (decoys must not
  * mint edges), RFC 3986 §5.2 resolution (including the spec's own
  * dot-segment examples), and the publicsuffix.org decision table.
  */
class LinkGraphSpec extends AnyFunSuite {

  test("links extracts hrefs with anchors and skips decoys") {
    val html = "<html><body>" +
      "<!-- <a href=\"/ghost\">ghost</a> -->" +
      "<script>var s = '<a href=\"/decoy\">d</a>';</script>" +
      "<a href=\"/a\">One</a>" +
      "<a href='b/c'>Two &amp; half</a>" +
      "<a class=\"x\" href=unquoted>Three <b>bold</b></a>" +
      "</body></html>"
    val ls = HtmlText.links(html)
    assert(ls == Seq(
      HtmlText.Link("/a", "One"),
      HtmlText.Link("b/c", "Two & half"),
      HtmlText.Link("unquoted", "Three bold")))
  }

  test("removeDotSegments follows RFC 3986 §5.2.4") {
    assert(HtmlText.removeDotSegments("/a/b/c/./../../g") == "/a/g")
    assert(HtmlText.removeDotSegments("mid/content=5/../6") == "mid/6")
    assert(HtmlText.removeDotSegments("/../x") == "/x")
    assert(HtmlText.removeDotSegments("/a/..") == "/")
    assert(HtmlText.removeDotSegments("/a/.") == "/a/")
  }

  test("resolveHref covers the live reference forms") {
    val base = "http://h.example.com/b/c/d;p?q"
    assert(HtmlText.resolveHref(base, "g") == "http://h.example.com/b/c/g")
    assert(HtmlText.resolveHref(base, "./g") == "http://h.example.com/b/c/g")
    assert(HtmlText.resolveHref(base, "/g") == "http://h.example.com/g")
    assert(HtmlText.resolveHref(base, "//o.example.com/g") ==
      "http://o.example.com/g")
    assert(HtmlText.resolveHref(base, "?y") ==
      "http://h.example.com/b/c/d;p?y")
    assert(HtmlText.resolveHref(base, "../g") == "http://h.example.com/b/g")
    assert(HtmlText.resolveHref(base, "../../g") == "http://h.example.com/g")
    assert(HtmlText.resolveHref(base, "../../../g") ==
      "http://h.example.com/g")
    assert(HtmlText.resolveHref(base, "") ==
      "http://h.example.com/b/c/d;p?q")
    // fragments never reach the frontier
    assert(HtmlText.resolveHref(base, "#s") ==
      "http://h.example.com/b/c/d;p?q")
    assert(HtmlText.resolveHref(base, "g#s") ==
      "http://h.example.com/b/c/g")
    assert(HtmlText.resolveHref(base, "https://x.example.org/p#s") ==
      "https://x.example.org/p")
    // authority-only base gets the implied root path
    assert(HtmlText.resolveHref("http://h.example.com", "g") ==
      "http://h.example.com/g")
    // non-hierarchical absolute schemes pass through unchanged —
    // links() extracts these from real pages and resolution must not
    // crash the composite (fragment still dropped, the frontier view)
    assert(HtmlText.resolveHref(base, "mailto:a@example.com") ==
      "mailto:a@example.com")
    assert(HtmlText.resolveHref(base, "javascript:void(0)") ==
      "javascript:void(0)")
    assert(HtmlText.resolveHref(base, "tel:+1-555-0100") ==
      "tel:+1-555-0100")
    assert(HtmlText.resolveHref(base, "mailto:a@example.com#frag") ==
      "mailto:a@example.com")
  }

  test("public suffix decision table") {
    assert(PublicSuffix.publicSuffix("a.example.com") == "com")
    assert(PublicSuffix.publicSuffix("b.example.co.uk") == "co.uk")
    assert(PublicSuffix.publicSuffix("user.github.io") == "github.io")
    // wildcard *.ck, exception !www.ck
    assert(PublicSuffix.publicSuffix("x.other.ck") == "other.ck")
    assert(PublicSuffix.publicSuffix("WWW.ck") == "ck")
    assert(PublicSuffix.registrableDomain("a.b.example.co.uk")
      .contains("example.co.uk"))
    assert(PublicSuffix.registrableDomain("user.github.io")
      .contains("user.github.io"))
    assert(PublicSuffix.registrableDomain("x.other.ck")
      .contains("x.other.ck"))
    assert(PublicSuffix.registrableDomain("other.ck").isEmpty)
    assert(PublicSuffix.registrableDomain("WWW.ck").contains("www.ck"))
    assert(PublicSuffix.registrableDomain("com").isEmpty)
    assert(PublicSuffix.registrableDomain("localhost").isEmpty)
    // unknown TLD: the implicit * rule
    assert(PublicSuffix.publicSuffix("x.example.zz") == "zz")
    assert(PublicSuffix.registrableDomain("x.example.zz")
      .contains("example.zz"))
  }
}
