package graft.pipeline

/** sitemaps.org XML parsing — the frontier-seeding step after
  * [[RobotsTxt.sitemaps]] hands the crawler its per-host sitemap URLs:
  * a crawl pipeline fetches each sitemap and turns it into the URL
  * list (with recrawl hints) that seeds the fetch frontier.
  *
  * Scope is the published sitemaps.org schema, parsed with a bounded
  * documented grammar (not a general XML parser): a `<urlset>` root of
  * `<url>` entries carrying `<loc>` (required), `<lastmod>`,
  * `<changefreq>`, `<priority>`; or a `<sitemapindex>` root of
  * `<sitemap>` entries carrying `<loc>`/`<lastmod>`. Entity references
  * in `<loc>` decode through the shared [[HtmlText.decodeEntities]]
  * pass (the schema requires `&` in URLs to be escaped). Parsing is
  * LOUD — a missing root element, an entry without `<loc>`, or a
  * priority outside [0,1] throws for S10 routing.
  *
  * Scale shape: one sitemap file is one per-row string kernel (a
  * sitemap is capped at 50k URLs / 50 MB by the spec, so per-row work
  * is bounded by the format itself); the frontier union across hosts
  * is the relational layer above.
  */
object Sitemap {

  /** One `<url>` entry: location, and the optional recrawl hints.
    * `priorityE3` is the schema's [0.0, 1.0] priority scaled to exact
    * integer thousandths (default 500 = the spec's 0.5).
    */
  final case class Entry(loc: String, lastmod: Option[String],
      changefreq: Option[String], priorityE3: Long)

  private val urlRe = """(?s)<url\s*>(.*?)</url\s*>""".r
  private val smRe = """(?s)<sitemap\s*>(.*?)</sitemap\s*>""".r

  private def field(entry: String, name: String): Option[String] = {
    val re = s"""(?s)<$name\\s*>(.*?)</$name\\s*>""".r
    re.findFirstMatchIn(entry).map(_.group(1).trim)
  }

  /** Parse a priority value to exact thousandths without a double
    * round-trip: `0.8` → 800, `1` → 1000, `0.55` → 550. More than
    * three fractional digits or a value outside [0,1] throws.
    */
  private[graft] def priorityE3(s: String): Long = {
    val (whole, frac) = s.indexOf('.') match {
      case -1 => (s, "")
      case i  => (s.substring(0, i), s.substring(i + 1))
    }
    require(whole.nonEmpty && whole.forall(_.isDigit) &&
      frac.forall(_.isDigit) && frac.length <= 3,
      s"bad sitemap priority: '$s'")
    val v = whole.toLong * 1000 + frac.padTo(3, '0').toLong
    require(v >= 0 && v <= 1000, s"sitemap priority out of [0,1]: '$s'")
    v
  }

  /** Parse a `<urlset>` sitemap into its entries, loudly. */
  def parse(xml: String): Seq[Entry] = {
    require(xml.contains("<urlset"), "not a sitemap: missing <urlset>")
    val entries = urlRe.findAllMatchIn(xml).map(_.group(1)).toSeq
    require(entries.nonEmpty, "sitemap with zero <url> entries")
    entries.map { e =>
      val loc = field(e, "loc").getOrElse(
        throw new IllegalArgumentException("sitemap <url> missing <loc>"))
      Entry(HtmlText.decodeEntities(loc), field(e, "lastmod"),
        field(e, "changefreq"),
        field(e, "priority").map(priorityE3).getOrElse(500L))
    }
  }

  /** Parse a `<sitemapindex>` into its child sitemap (loc, lastmod)
    * rows, loudly.
    */
  def parseIndex(xml: String): Seq[(String, Option[String])] = {
    require(xml.contains("<sitemapindex"),
      "not a sitemap index: missing <sitemapindex>")
    val entries = smRe.findAllMatchIn(xml).map(_.group(1)).toSeq
    require(entries.nonEmpty, "sitemap index with zero <sitemap> entries")
    entries.map { e =>
      val loc = field(e, "loc").getOrElse(throw new IllegalArgumentException(
        "sitemap index <sitemap> missing <loc>"))
      (HtmlText.decodeEntities(loc), field(e, "lastmod"))
    }
  }

  /** Mint a spec-shaped `<urlset>` (fixture dual of [[parse]]); locs
    * are entity-escaped exactly as the schema requires.
    */
  def mint(entries: Seq[Entry]): String = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
    entries.foreach { e =>
      sb.append("  <url>\n")
      sb.append(s"    <loc>${HtmlText.escape(e.loc)}</loc>\n")
      e.lastmod.foreach(lm => sb.append(s"    <lastmod>$lm</lastmod>\n"))
      e.changefreq.foreach(cf =>
        sb.append(s"    <changefreq>$cf</changefreq>\n"))
      if (e.priorityE3 != 500L) {
        val w = e.priorityE3 / 1000
        val f = e.priorityE3 % 1000
        sb.append(f"    <priority>$w%d.$f%03d</priority>\n")
      }
      sb.append("  </url>\n")
    }
    sb.append("</urlset>\n")
    sb.toString
  }

  /** Mint a `<sitemapindex>` (fixture dual of [[parseIndex]]). */
  def mintIndex(children: Seq[(String, Option[String])]): String = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
    children.foreach { case (loc, lastmod) =>
      sb.append("  <sitemap>\n")
      sb.append(s"    <loc>${HtmlText.escape(loc)}</loc>\n")
      lastmod.foreach(lm => sb.append(s"    <lastmod>$lm</lastmod>\n"))
      sb.append("  </sitemap>\n")
    }
    sb.append("</sitemapindex>\n")
    sb.toString
  }
}
