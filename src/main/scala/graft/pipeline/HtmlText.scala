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
