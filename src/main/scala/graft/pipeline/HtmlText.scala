package graft.pipeline

/** HTML → text extraction, the step between [[WarcIO]] and the text
  * gates: what C4/RefinedWeb/FineWeb call "text extraction" before any
  * quality filter runs. Deterministic, documented grammar — not a
  * browser: (1) drop comments, `<script>`/`<style>` subtrees; (2)
  * block-level tags become line breaks, remaining tags vanish; (3)
  * character references decode (named core set + decimal/hex numeric,
  * `&amp;` last so escaped markup stays escaped text, the standard
  * single-pass approximation); (4) per-line whitespace collapses,
  * empty lines drop. The downstream line-level ops (C4 boilerplate
  * strip L66, line dedup L25) consume exactly this line structure.
  *
  * Scale shape: pure per-row string kernel — regex + one linear decode
  * pass, no allocation beyond the output; runs inside typed maps or
  * codegen'd expressions like the codec probes.
  */
object HtmlText {

  private val commentRe = """(?s)<!--.*?-->""".r
  private val scriptStyleRe =
    """(?is)<(script|style)\b[^>]*>.*?</\1\s*>""".r
  // the HTML block-level elements whose boundaries imply line breaks
  private val blockRe =
    ("""(?is)</?(p|div|br|hr|li|ul|ol|dl|dt|dd|h[1-6]|tr|table|thead|""" +
      """tbody|td|th|blockquote|pre|section|article|aside|nav|header|""" +
      """footer|figure|figcaption|form|title|head|body|html)\b[^>]*>""").r
  private val tagRe = """(?s)<[^>]*>""".r

  private val named = Map(
    "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ")

  /** Decode character references in one left-to-right pass; `&amp;`
    * resolves to a literal `&` that is NOT re-scanned (so
    * `&amp;lt;` → `&lt;` as text, per the single-pass rule).
    */
  private[pipeline] def decodeEntities(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val name = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (name == "amp") Some("&")
            else if (named.contains(name)) Some(named(name))
            else if (name.startsWith("#x") || name.startsWith("#X"))
              scala.util.Try(Integer.parseInt(name.substring(2), 16))
                .toOption.filter(cp => cp > 0 && cp <= 0x10ffff)
                .map(cp => new String(Character.toChars(cp)))
            else if (name.startsWith("#"))
              scala.util.Try(Integer.parseInt(name.substring(1)))
                .toOption.filter(cp => cp > 0 && cp <= 0x10ffff)
                .map(cp => new String(Character.toChars(cp)))
            else None
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None    => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The inverse mint-side escape for embedding arbitrary text in a
    * fixture: the three characters that would change the markup.
    */
  def escape(text: String): String =
    text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Extract text lines: block boundaries become newlines, each line's
    * whitespace collapses to single spaces, empty lines drop.
    */
  def toLines(html: String): Seq[String] = {
    val noComments = commentRe.replaceAllIn(html, "")
    val noScript = scriptStyleRe.replaceAllIn(noComments, "")
    val blocked = blockRe.replaceAllIn(noScript, "\n")
    val stripped = tagRe.replaceAllIn(blocked, "")
    stripped.split('\n').toSeq
      .map(l => decodeEntities(l).replaceAll("\\s+", " ").trim)
      .filter(_.nonEmpty)
  }

  /** [[toLines]] joined with single newlines — the document text the
    * downstream gates see.
    */
  def toText(html: String): String = toLines(html).mkString("\n")

  private val anchorRe = """(?is)<a\b[^>]*>(.*?)</a\s*>""".r

  /** One block-level segment with its link-text accounting: `nChars`
    * of cleaned text, of which `anchorChars` sat inside `<a>` spans.
    */
  final case class Block(text: String, nChars: Long, anchorChars: Long)

  private def clean(s: String): String =
    decodeEntities(tagRe.replaceAllIn(s, "")).replaceAll("\\s+", " ").trim

  /** Split into block-level segments with per-block LINK DENSITY — the
    * Kohlschütter/boilerpipe signal: navigation, footers, and related-
    * links rails are short blocks whose text is mostly anchor text,
    * while main content is long and anchor-light. The caller gates on
    * `100·anchorChars > pct·nChars` (link-heavy) and `nChars <
    * minChars` (too short) — the standard main-content heuristic a
    * crawl pipeline runs after [[toLines]]-style extraction. Anchors
    * spanning block boundaries count as plain text (documented
    * heuristic scope; fixtures keep anchors inline).
    */
  def blocks(html: String): Seq[Block] = {
    val noComments = commentRe.replaceAllIn(html, "")
    val noScript = scriptStyleRe.replaceAllIn(noComments, "")
    blockRe.replaceAllIn(noScript, "\n").split('\n').toSeq.flatMap { seg =>
      val anchorChars = anchorRe.findAllMatchIn(seg)
        .map(m => clean(m.group(1)).length.toLong).sum
      val text = clean(seg)
      if (text.isEmpty) None
      else Some(Block(text, text.length.toLong, anchorChars))
    }
  }

  private val hrefRe =
    ("""(?is)<a\b[^>]*?href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>"']+))""" +
      """[^>]*>(.*?)</a\s*>""").r

  /** One extracted link: the raw (entity-decoded) href and the
    * cleaned anchor text.
    */
  final case class Link(href: String, anchor: String)

  /** Extract `<a href>` links with their anchor text — the edge list
    * of the crawl's link graph and the anchor-text signal web search
    * aggregates per target. Comments and script/style subtrees are
    * dropped first (a commented-out nav must not mint edges).
    */
  def links(html: String): Seq[Link] = {
    val noComments = commentRe.replaceAllIn(html, "")
    val noScript = scriptStyleRe.replaceAllIn(noComments, "")
    hrefRe.findAllMatchIn(noScript).map { m =>
      val raw = Seq(2, 3, 4).map(m.group).find(_ != null).getOrElse("")
      Link(decodeEntities(raw).trim, clean(m.group(5)))
    }.toSeq
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over a path. */
  private[graft] def removeDotSegments(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "." || in == "..") in = ""
      else {
        val next = in.indexOf('/', if (in.startsWith("/")) 1 else 0)
        if (next < 0) { out += in; in = "" }
        else { out += in.substring(0, next); in = in.substring(next) }
      }
    }
    out.mkString
  }

  private val schemeRe = """^[A-Za-z][A-Za-z0-9+.-]*:""".r

  /** Split an absolute http(s) URL into (scheme://authority, path,
    * query-with-?) — fragment dropped (frontier semantics: a fragment
    * never reaches the server).
    */
  private def splitUrl(url: String): (String, String, String) = {
    val noFrag = url.indexOf('#') match {
      case -1 => url
      case i  => url.substring(0, i)
    }
    val schemeEnd = noFrag.indexOf("://")
    require(schemeEnd > 0, s"not an absolute URL: $url")
    val authEnd = noFrag.indexOf('/', schemeEnd + 3) match {
      case -1 =>
        noFrag.indexOf('?', schemeEnd + 3) match {
          case -1 => noFrag.length
          case q  => q
        }
      case i => i
    }
    val rest = noFrag.substring(authEnd)
    val qAt = rest.indexOf('?')
    val (path, query) =
      if (qAt < 0) (rest, "") else (rest.substring(0, qAt), rest.substring(qAt))
    (noFrag.substring(0, authEnd), if (path.isEmpty) "/" else path, query)
  }

  /** RFC 3986 §5.2 reference resolution against an absolute http(s)
    * base, with fragments dropped on both sides — exactly what a
    * frontier needs to turn an href into a fetchable URL. Covers the
    * reference forms live in HTML: absolute, protocol-relative
    * (`//host/p`), path-absolute (`/p`), path-relative (incl. `.` and
    * `..` segments), query-only (`?q`), fragment-only, and empty.
    */
  def resolveHref(base: String, ref: String): String = {
    val (baseRoot, basePath, baseQuery) = splitUrl(base)
    val noFrag = ref.indexOf('#') match {
      case -1 => ref
      case i  => ref.substring(0, i)
    }
    if (schemeRe.findPrefixOf(noFrag).nonEmpty) {
      // A ref with a scheme is already absolute (RFC 3986 §5.2.2). Only
      // hierarchical (`://`) URLs get authority/path normalization;
      // non-hierarchical schemes that links() legitimately extracts from
      // real pages (mailto:, javascript:, tel:, data:) pass through
      // unchanged — splitUrl would reject them loudly otherwise.
      if (noFrag.indexOf("://") > 0) {
        val (r, p, q) = splitUrl(noFrag)
        r + removeDotSegments(p) + q
      } else noFrag
    } else if (noFrag.startsWith("//")) {
      val scheme = base.substring(0, base.indexOf("://"))
      val (r, p, q) = splitUrl(s"$scheme:$noFrag")
      r + removeDotSegments(p) + q
    } else if (noFrag.isEmpty) baseRoot + basePath + baseQuery
    else if (noFrag.startsWith("?")) baseRoot + basePath + noFrag
    else {
      val qAt = noFrag.indexOf('?')
      val (refPath, refQuery) =
        if (qAt < 0) (noFrag, "")
        else (noFrag.substring(0, qAt), noFrag.substring(qAt))
      val merged =
        if (refPath.startsWith("/")) refPath
        else basePath.substring(0, basePath.lastIndexOf('/') + 1) + refPath
      baseRoot + removeDotSegments(merged) + refQuery
    }
  }

  private val linkTagRe = """(?is)<link\b[^>]*>""".r
  private val attrRe =
    """(?is)(rel|href|hreflang)\s*=\s*("([^"]*)"|'([^']*)'|([^\s>"']+))""".r

  /** One `<link>` relation: rel (lower-cased), href (entity-decoded),
    * and hreflang when present (the `rel=alternate` language map).
    */
  final case class LinkRel(rel: String, href: String,
      hreflang: Option[String])

  /** Extract `<link rel=...>` relations from the document head — the
    * canonical-URL signal (`rel=canonical`: the page's OWN statement
    * of which URL is the original, the dedup signal next to the
    * redirect map) and the `rel=alternate hreflang` language cluster.
    * Comments are dropped first; links missing rel or href are
    * skipped (they relate nothing).
    */
  def linkRels(html: String): Seq[LinkRel] = {
    val noComments = commentRe.replaceAllIn(html, "")
    linkTagRe.findAllMatchIn(noComments).flatMap { tag =>
      val attrs = attrRe.findAllMatchIn(tag.matched).map { m =>
        val v = Seq(3, 4, 5).map(m.group).find(_ != null).getOrElse("")
        (m.group(1).toLowerCase(java.util.Locale.ROOT), decodeEntities(v))
      }.toMap
      (attrs.get("rel"), attrs.get("href")) match {
        case (Some(rel), Some(href)) if rel.nonEmpty && href.nonEmpty =>
          Some(LinkRel(rel.toLowerCase(java.util.Locale.ROOT).trim,
            href.trim, attrs.get("hreflang")))
        case _ => None
      }
    }.toSeq
  }

  private val metaRobotsRe =
    ("""(?is)<meta\s+[^>]*?name\s*=\s*["']robots["'][^>]*?""" +
      """content\s*=\s*["']([^"']*)["']""").r

  /** The robots/consent directives a 2025-era crawl pipeline gates on,
    * merged from the HTML `<meta name="robots">` tag and the
    * `X-Robots-Tag` HTTP header (both surfaces are live in the wild;
    * either alone under-reads). Directives are comma-split,
    * lower-cased, trimmed.
    */
  def robotsDirectives(html: String,
      xRobotsTag: Option[String]): Set[String] = {
    val meta = metaRobotsRe.findFirstMatchIn(html).map(_.group(1))
      .getOrElse("")
    (meta.split(',') ++ xRobotsTag.getOrElse("").split(','))
      .map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty).toSet
  }
}
