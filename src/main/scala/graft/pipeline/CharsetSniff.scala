package graft.pipeline

import java.nio.ByteBuffer
import java.nio.charset.{Charset, CharacterCodingException, CodingErrorAction}

/** Charset sniffing + STRICT decode — the byte→text step between the
  * WARC/HTTP envelope ([[WarcIO]]) and HTML extraction ([[HtmlText]]):
  * a crawl body is bytes, and decoding them with the wrong charset is
  * where mojibake enters a corpus (the damage the downstream
  * `t_charset_mix` gate detects AFTER the fact — this op prevents it
  * AT ingest). Precedence follows the WHATWG encoding sniffing order a
  * real crawler applies:
  *
  *  1. UTF-8 BOM (EF BB BF);
  *  2. the transport's `Content-Type: ...; charset=...` parameter;
  *  3. an in-document `<meta charset=...>` or
  *     `<meta http-equiv="Content-Type" content="...; charset=...">`
  *     within the first 1024 bytes (the WHATWG prescan window);
  *  4. UTF-8 default.
  *
  * Decode is STRICT (`CodingErrorAction.REPORT`): a windows-1252 page
  * mis-declared as UTF-8 throws instead of silently injecting U+FFFD —
  * the caller routes it (S10 posture) or retries with a fallback; a
  * lossy default decode is exactly how mojibake propagates.
  */
object CharsetSniff {

  private val metaCharsetRe =
    """(?i)<meta\s+charset\s*=\s*["']?([A-Za-z0-9._-]+)""".r
  private val metaHttpEquivRe =
    ("""(?i)<meta\s+http-equiv\s*=\s*["']?content-type["']?\s+""" +
      """content\s*=\s*["'][^"']*?charset=([A-Za-z0-9._-]+)""").r
  private val headerCharsetRe = """(?i)charset=\s*"?([A-Za-z0-9._-]+)""".r

  /** Canonical lower-case charset label, restricted to the set a
    * corpus pipeline accepts deterministically; anything else is loud
    * (an unbounded `Charset.forName` would make behavior depend on the
    * JVM's installed providers).
    */
  private[pipeline] def canonical(label: String): String = {
    val l = label.toLowerCase(java.util.Locale.ROOT)
    l match {
      case "utf-8" | "utf8"                     => "utf-8"
      case "iso-8859-1" | "latin-1" | "latin1"  => "iso-8859-1"
      case "windows-1252" | "cp1252"            => "windows-1252"
      case "us-ascii" | "ascii"                 => "us-ascii"
      case other =>
        throw new IllegalArgumentException(s"unsupported charset: $other")
    }
  }

  /** WHATWG-order sniff: BOM > transport header > meta prescan >
    * UTF-8. Returns (charset, source) with source ∈ {"bom", "header",
    * "meta", "default"}.
    */
  def sniff(contentType: Option[String],
      body: Array[Byte]): (String, String) = {
    if (body.length >= 3 && (body(0) & 0xff) == 0xef
      && (body(1) & 0xff) == 0xbb && (body(2) & 0xff) == 0xbf)
      return ("utf-8", "bom")
    contentType.flatMap(headerCharsetRe.findFirstMatchIn(_)) match {
      case Some(m) => return (canonical(m.group(1)), "header")
      case None    =>
    }
    // prescan window: meta tags are ASCII-compatible in every charset
    // this op accepts, so a latin-1 view of the head is safe to scan
    val head = new String(body, 0, math.min(body.length, 1024),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    metaCharsetRe.findFirstMatchIn(head)
      .orElse(metaHttpEquivRe.findFirstMatchIn(head)) match {
      case Some(m) => (canonical(m.group(1)), "meta")
      case None    => ("utf-8", "default")
    }
  }

  /** Strict decode: malformed or unmappable input THROWS
    * CharacterCodingException (wrapped loud) rather than silently
    * substituting U+FFFD. A BOM is stripped from a UTF-8 decode.
    */
  def decodeStrict(body: Array[Byte], charset: String): String = {
    val cs = canonical(charset)
    val skipBom = cs == "utf-8" && body.length >= 3 &&
      (body(0) & 0xff) == 0xef && (body(1) & 0xff) == 0xbb &&
      (body(2) & 0xff) == 0xbf
    val buf = ByteBuffer.wrap(body, if (skipBom) 3 else 0,
      body.length - (if (skipBom) 3 else 0))
    val decoder = Charset.forName(cs).newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try decoder.decode(buf).toString
    catch {
      case e: CharacterCodingException =>
        throw new IllegalArgumentException(
          s"body is not valid $cs: ${e.getClass.getSimpleName}")
    }
  }

  /** Encode for fixtures — strict in the same way (a fixture text that
    * cannot round-trip in the target charset is a mint bug).
    */
  def encodeStrict(text: String, charset: String): Array[Byte] = {
    val cs = canonical(charset)
    val encoder = Charset.forName(cs).newEncoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try {
      val bb = encoder.encode(java.nio.CharBuffer.wrap(text))
      val out = new Array[Byte](bb.remaining())
      bb.get(out)
      out
    } catch {
      case e: CharacterCodingException =>
        throw new IllegalArgumentException(
          s"text not representable in $cs: ${e.getClass.getSimpleName}")
    }
  }
}
