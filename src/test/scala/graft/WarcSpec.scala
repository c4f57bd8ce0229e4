package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{HtmlText, WarcIO}
import graft.pipeline.WarcIO.WarcRecord

/** The WARC front door (ISO 28500) + HTML extraction seam: a hand-laid
  * record literal pins the container grammar (minter and parser must
  * not share a wrong constant — the ONNX/TIFF lesson), Content-Length
  * framing must survive adversarial payloads, per-record gzip members
  * walk loudly, and the HTML grammar cases are pinned one by one.
  */
class WarcSpec extends AnyFunSuite {

  private def rec(i: Int, payload: String,
      warcType: String = "response") = WarcRecord(
    warcType, s"http://example.com/$i", "2025-01-01T00:00:00Z",
    s"<urn:uuid:$i>", "application/http; msgtype=response",
    payload.getBytes("US-ASCII"))

  test("extra headers (WET conversion shape) round-trip in order") {
    val conv = WarcRecord("conversion", "http://example.com/a",
      "2025-01-01T00:00:00Z", "<urn:uuid:c1>", "text/plain",
      "Doc text".getBytes("UTF-8"),
      extra = Seq("WARC-Refers-To" -> "<urn:uuid:r1>",
        "WARC-Block-Digest" -> "sha1:ABC"))
    val back = WarcIO.parse(WarcIO.mint(Seq(conv), perRecordGzip = true)).head
    assert(back.warcType == "conversion")
    assert(back.extra == Seq("warc-refers-to" -> "<urn:uuid:r1>",
      "warc-block-digest" -> "sha1:ABC"))
    assert(new String(back.payload, "UTF-8") == "Doc text")
    // a record minted without extras parses back with none
    val plain = WarcIO.parse(WarcIO.mint(Seq(rec(1, "x")),
      perRecordGzip = false)).head
    assert(plain.extra.isEmpty)
  }

  test("hand-laid WARC literal parses to the planted fields") {
    val lit = "WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: http://example.com/a\r\n" +
      "WARC-Date: 2025-01-01T00:00:00Z\r\n" +
      "WARC-Record-ID: <urn:uuid:7>\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      "Content-Length: 5\r\n" +
      "\r\n" +
      "hello" +
      "\r\n\r\n"
    val rs = WarcIO.parse(lit.getBytes("US-ASCII"))
    assert(rs.size == 1)
    val r = rs.head
    assert(r.warcType == "response"
      && r.targetUri == "http://example.com/a"
      && r.recordId == "<urn:uuid:7>"
      && new String(r.payload, "US-ASCII") == "hello", s"got $r")
  }

  test("Content-Length framing survives a payload that embeds a fake " +
      "record header (regex walkers would split there)") {
    val evil = "\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\n"
    val rs = WarcIO.parse(WarcIO.mint(
      Seq(rec(1, evil), rec(2, "tail")), perRecordGzip = false))
    assert(rs.size == 2)
    assert(new String(rs.head.payload, "US-ASCII") == evil)
    assert(rs(1).targetUri == "http://example.com/2")
  }

  test("per-record gzip members (the Common-Crawl layout) roundtrip; " +
      "every member's integrity is verified") {
    val records = (0 until 5).map(i => rec(i, s"payload number $i"))
    val gz = WarcIO.mint(records, perRecordGzip = true)
    assert((gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b)
    val back = WarcIO.parse(gz)
    assert(back.size == 5)
    back.zip(records).foreach { case (b, r) =>
      assert(b.targetUri == r.targetUri
        && b.payload.sameElements(r.payload))
    }
  }

  test("corrupt SECOND gzip member fails loudly — GZIPInputStream " +
      "would silently EOF and drop the tail records") {
    val gz = WarcIO.mint(Seq(rec(1, "first"), rec(2, "second")),
      perRecordGzip = true)
    // locate the second member's magic and break it
    var at = -1
    for (i <- 1 until gz.length - 1)
      if (at < 0 && i > 2 && (gz(i) & 0xff) == 0x1f
        && (gz(i + 1) & 0xff) == 0x8b) at = i
    assert(at > 0, "second member magic not found")
    val corrupt = gz.clone(); corrupt(at) = 0x00
    intercept[IllegalArgumentException] { WarcIO.parse(corrupt) }
    // truncated trailer also loud
    intercept[IllegalArgumentException] {
      WarcIO.parse(java.util.Arrays.copyOfRange(gz, 0, gz.length - 6))
    }
    // flipped CRC byte also loud (trailer = last 8 bytes of a member)
    val badCrc = gz.clone()
    badCrc(gz.length - 8) = (badCrc(gz.length - 8) ^ 0x5a).toByte
    intercept[IllegalArgumentException] { WarcIO.parse(badCrc) }
  }

  test("structural violations are loud: missing separator, short " +
      "payload, missing Content-Length, garbage") {
    val good = new String(WarcIO.mint(Seq(rec(1, "abc")),
      perRecordGzip = false), "ISO-8859-1")
    intercept[IllegalArgumentException] {
      WarcIO.parse(good.replace("Content-Length: 3", "Content-Length: 99")
        .getBytes("ISO-8859-1"))
    }
    intercept[IllegalArgumentException] {
      WarcIO.parse(good.replaceFirst("Content-Length: 3\r\n", "")
        .getBytes("ISO-8859-1"))
    }
    intercept[IllegalArgumentException] {
      WarcIO.parse("HTTP/1.1 200 OK\r\n\r\n".getBytes("US-ASCII"))
    }
  }

  test("HTTP response envelope: status, lower-cased headers, exact body") {
    val payload = WarcIO.mintHttpResponse(200,
      Seq("Content-Type" -> "text/html", "X-Robots-Tag" -> "noai"),
      "<p>hi</p>".getBytes("US-ASCII"))
    val h = WarcIO.parseHttpResponse(payload)
    assert(h.status == 200
      && h.headers("content-type") == "text/html"
      && h.headers("x-robots-tag") == "noai"
      && new String(h.body, "US-ASCII") == "<p>hi</p>", s"got $h")
    intercept[IllegalArgumentException] {
      WarcIO.parseHttpResponse("not http".getBytes("US-ASCII"))
    }
  }

  test("HTTP codings: chunked framing decodes exactly (extensions " +
      "ignored), gzip content coding unwraps, both compose, malformed " +
      "chunk sizes and unknown codings are loud") {
    val body = "hello chunked world payload".getBytes("US-ASCII")
    val chunked = WarcIO.mintChunked(body, Seq(5, 10, 12))
    assert(WarcIO.decodeChunked(chunked).sameElements(body))
    val withExt = ("5;ext=1" + new String(chunked, "ISO-8859-1").drop(1))
      .getBytes("ISO-8859-1")
    assert(WarcIO.decodeChunked(withExt).sameElements(body))
    val gz = WarcIO.gzipBytes(body)
    val h1 = WarcIO.parseHttpResponse(WarcIO.mintHttpResponse(200,
      Seq("Content-Encoding" -> "gzip"), gz))
    assert(WarcIO.decodedBody(h1).sameElements(body))
    val h2 = WarcIO.parseHttpResponse(WarcIO.mintHttpResponse(200,
      Seq("Transfer-Encoding" -> "chunked", "Content-Encoding" -> "gzip"),
      WarcIO.mintChunked(gz, Seq(7, gz.length - 7))))
    assert(WarcIO.decodedBody(h2).sameElements(body))
    intercept[IllegalArgumentException] {
      WarcIO.decodeChunked("zz\r\nhi\r\n0\r\n\r\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      WarcIO.decodedBody(WarcIO.parseHttpResponse(WarcIO.mintHttpResponse(
        200, Seq("Content-Encoding" -> "br"), body)))
    }
    // a chunk claiming more octets than remain is loud, not a short read
    intercept[IllegalArgumentException] {
      WarcIO.decodeChunked("ff\r\nhi\r\n0\r\n\r\n".getBytes("US-ASCII"))
    }
  }

  test("HTML extraction: script/style/comment drop, block lines, " +
      "entity decode incl. the single-pass &amp; rule") {
    val html = "<!DOCTYPE html><html><head><title>T</title>" +
      "<style>p { color: red }</style>" +
      "<script>var x = '<p>not text</p>';</script></head>" +
      "<body><!-- <p>ghost</p> -->" +
      "<h1>A &amp; B</h1>" +
      "<p>one<br>two</p>" +
      "<p>caf&#233; &#x2603; &nbsp;ok</p>" +
      "<p>&amp;lt; stays escaped</p>" +
      "<span>inline</span> joined</body></html>"
    val lines = HtmlText.toLines(html)
    assert(lines == Seq("T", "A & B", "one", "two",
      "café ☃ ok", "&lt; stays escaped", "inline joined"),
      s"got $lines")
    // escape/extract roundtrip for arbitrary corpus text
    val text = "a < b & c > d"
    assert(HtmlText.toText(s"<p>${HtmlText.escape(text)}</p>") == text)
  }

  test("link-density blocks: anchor text is counted per block, nested " +
      "markup and entities cleaned identically on both sides") {
    val html = "<body><div><a href='/'>Home</a> <a href='/a'>About us</a></div>" +
      "<p>real content that is long enough to keep</p>" +
      "<p>More &amp; <a href='/x'><b>bold link</b></a> tail</p></body>"
    val bs = HtmlText.blocks(html)
    assert(bs.map(_.text) == Seq("Home About us",
      "real content that is long enough to keep", "More & bold link tail"),
      s"got $bs")
    assert(bs.map(_.anchorChars) == Seq(4L + 8L, 0L, 9L), s"got $bs")
    assert(bs.map(_.nChars) == Seq(13L, 40L, 21L), s"got $bs")
  }

  test("robots directives merge the meta tag and the X-Robots-Tag header") {
    val html = """<html><head><meta name="robots" """ +
      """content="noindex, NoAI"></head><body>x</body></html>"""
    assert(HtmlText.robotsDirectives(html, Some("noarchive"))
      == Set("noindex", "noai", "noarchive"))
    assert(HtmlText.robotsDirectives("<p>plain</p>", None) == Set.empty)
    assert(HtmlText.robotsDirectives("<p>plain</p>", Some("none"))
      == Set("none"))
  }
}
