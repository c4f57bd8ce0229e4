package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Sitemap

/** Pins the sitemaps.org grammar: loc entity round-trip, exact-e3
  * priorities (default 0.5), index files, and the loud failure modes.
  */
class SitemapSpec extends AnyFunSuite {

  test("urlset round-trips locs with escaped ampersands and hints") {
    val entries = Seq(
      Sitemap.Entry("https://h.example.com/p?a=1&b=2", Some("2025-01-02"),
        Some("daily"), 800L),
      Sitemap.Entry("https://h.example.com/q", None, None, 500L),
      Sitemap.Entry("https://h.example.com/r", None, None, 0L))
    val xml = Sitemap.mint(entries)
    // the schema requires & escaped inside <loc>
    assert(xml.contains("a=1&amp;b=2"))
    // the 0.5 default is omitted by the minter, restored by the parser
    assert(!xml.contains("0.500"))
    assert(Sitemap.parse(xml) == entries)
  }

  test("priorityE3 is exact and gated to [0,1] with <=3 fraction digits") {
    assert(Sitemap.priorityE3("0.8") == 800L)
    assert(Sitemap.priorityE3("1") == 1000L)
    assert(Sitemap.priorityE3("1.0") == 1000L)
    assert(Sitemap.priorityE3("0.55") == 550L)
    assert(Sitemap.priorityE3("0") == 0L)
    intercept[IllegalArgumentException](Sitemap.priorityE3("1.5"))
    intercept[IllegalArgumentException](Sitemap.priorityE3("0.1234"))
    intercept[IllegalArgumentException](Sitemap.priorityE3("abc"))
    intercept[IllegalArgumentException](Sitemap.priorityE3(".5"))
  }

  test("sitemap index round-trips children") {
    val children = Seq(
      ("https://h.example.com/sm0.xml", Some("2025-01-01")),
      ("https://h.example.com/sm1.xml", None))
    assert(Sitemap.parseIndex(Sitemap.mintIndex(children)) == children)
  }

  test("structural violations are loud") {
    intercept[IllegalArgumentException](Sitemap.parse("<html></html>"))
    intercept[IllegalArgumentException](Sitemap.parse(
      "<urlset></urlset>")) // zero entries
    intercept[IllegalArgumentException](Sitemap.parse(
      "<urlset><url><lastmod>2025-01-01</lastmod></url></urlset>")) // no loc
    intercept[IllegalArgumentException](Sitemap.parseIndex(
      "<urlset><url><loc>x</loc></url></urlset>")) // not an index
  }
}
