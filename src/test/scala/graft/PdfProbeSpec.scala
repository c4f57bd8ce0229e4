package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.PdfProbe

/** The byte-level PDF structural seam (L235): minted spec-valid files
  * probe back to their mint parameters, a hand-laid literal pins the
  * grammar the parser must honor (so injector and parser cannot share
  * a wrong constant), and garbage fails loudly.
  */
class PdfProbeSpec extends AnyFunSuite {

  test("L235 mint/probe roundtrip across versions, page counts, and " +
      "the encrypted variant") {
    for (minor <- Seq(4, 7); pages <- Seq(1, 5); enc <- Seq(false, true)) {
      val p = PdfProbe.probe(PdfProbe.mint(minor, pages, enc))
      assert(p.versionMinor == minor.toLong
        && p.nPages == pages.toLong && p.pagesCount == pages.toLong
        && p.nObjects == (2 + pages + (if (enc) 1 else 0)).toLong
        && p.hasEncrypt == enc && p.xrefOk,
        s"minor=$minor pages=$pages enc=$enc got $p")
    }
  }

  test("L235 hand-laid literal: /Pages is not a page, startxref must " +
      "point at the xref keyword, objects are counted at line starts") {
    // laid out by hand with a decoy: the string "9 9 obj" inside a
    // comment must NOT count (objects are line-anchored), /Type /Pages
    // must not count as a page, and startxref points at 'xref' exactly
    val body = new StringBuilder
    body.append("%PDF-1.6\n")
    body.append("% decoy: 9 9 obj and /Type /PageLabel\n")
    val o1 = body.length
    body.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val o2 = body.length
    body.append("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    val o3 = body.length
    body.append("3 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n")
    val xrefAt = body.length
    body.append("xref\n0 4\n0000000000 65535 f \n")
    for (o <- Seq(o1, o2, o3)) body.append(f"$o%010d 00000 n \n")
    body.append(s"trailer\n<< /Size 4 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    val p = PdfProbe.probe(body.toString.getBytes("US-ASCII"))
    // /PageLabel in the decoy is excluded by the word-boundary
    // lookahead, /Pages by the same rule -> exactly one page
    assert(p.versionMinor == 6L && p.nObjects == 3L && p.nPages == 1L
      && p.pagesCount == 1L && !p.hasEncrypt && p.xrefOk, s"got $p")
    // a startxref pointing into the middle of an object is NOT ok
    val broken = body.toString.replace(s"startxref\n$xrefAt", "startxref\n5")
    assert(!PdfProbe.probe(broken.getBytes("US-ASCII")).xrefOk)
  }

  test("L236 mintWithText/extractText: page texts come back in document " +
      "order; decoy parens outside Tj do not extract") {
    val pdf = PdfProbe.mintWithText(5, Seq("first page", "second page"))
    assert(PdfProbe.extractText(pdf) == "first page second page")
    val p = PdfProbe.probe(pdf)
    assert(p.nPages == 2L && p.pagesCount == 2L && p.nObjects == 6L
      && p.xrefOk, s"got $p")
    // a parenthesized string NOT followed by Tj must not extract
    val s = new String(pdf, "US-ASCII")
      .replace("%PDF-1.5\n", "%PDF-1.5\n% (decoy comment) Td\n")
    assert(PdfProbe.extractText(s.getBytes("US-ASCII"))
      == "first page second page")
    // the injector refuses unescapable text rather than corrupting
    intercept[IllegalArgumentException] {
      PdfProbe.mintWithText(5, Seq("has (parens)"))
    }
  }

  test("L236 FlateDecode: compressed mint roundtrips, a hand-laid " +
      "stored-block zlib literal inflates, corrupt deflate fails loudly") {
    // deflate-compressed mint extracts identically to the plain form
    val texts = Seq("alpha page", "beta page", "gamma page")
    val flated = PdfProbe.mintWithText(6, texts, flate = true)
    assert(PdfProbe.extractText(flated) == "alpha page beta page gamma page")
    assert(new String(flated, "ISO-8859-1").contains("/Filter /FlateDecode"))

    // hand-laid RFC 1950 literal: one STORED block (BFINAL=1 BTYPE=00,
    // LEN/NLEN little-endian) + adler32 big-endian, laid out from the
    // spec so the inflater and the minter cannot share a wrong constant
    val content = "BT /F1 12 Tf (flate pinned) Tj ET"
    val raw = content.getBytes("US-ASCII")
    var a = 1L; var b = 0L
    raw.foreach { v => a = (a + (v & 0xff)) % 65521; b = (b + a) % 65521 }
    val len = raw.length
    val z = Array[Byte](0x78, 0x01, 0x01,
      (len & 0xff).toByte, ((len >> 8) & 0xff).toByte,
      ((~len) & 0xff).toByte, (((~len) >> 8) & 0xff).toByte) ++ raw ++
      Array[Byte](((b >> 8) & 0xff).toByte, (b & 0xff).toByte,
        ((a >> 8) & 0xff).toByte, (a & 0xff).toByte)
    val pre = (s"%PDF-1.4\n4 0 obj\n<< /Length ${z.length} " +
      "/Filter /FlateDecode >>\nstream\n").getBytes("US-ASCII")
    val post = "\nendstream\nendobj\n%%EOF\n".getBytes("US-ASCII")
    assert(PdfProbe.extractText(pre ++ z ++ post) == "flate pinned")

    // corrupt zlib header -> loud failure (the S10 route), not a
    // silent empty extraction
    val corrupt = flated.clone()
    val at = corrupt.indexOfSlice("stream\n".getBytes("US-ASCII")) + 7
    corrupt(at) = 0xff.toByte
    intercept[IllegalArgumentException] { PdfProbe.extractText(corrupt) }
  }

  test("L247 scrubInfo: in-place scrub preserves every byte length and " +
      "the xref; a file without /Info returns unchanged") {
    val pdf = PdfProbe.mintWithInfo(6, 3, "alice", "scannerX")
    val p1 = PdfProbe.probe(pdf)
    assert(p1.hasInfo && p1.nPages == 3L && p1.xrefOk, s"got $p1")
    assert(new String(pdf, "US-ASCII").contains("(alice)"))
    val scrubbed = PdfProbe.scrubInfo(pdf)
    val p2 = PdfProbe.probe(scrubbed)
    assert(!p2.hasInfo && p2.nPages == 3L && p2.xrefOk
      && p2.nObjects == p1.nObjects, s"got $p2")
    assert(scrubbed.length == pdf.length, "length must be preserved")
    val s = new String(scrubbed, "US-ASCII")
    assert(!s.contains("alice") && !s.contains("scannerX"),
      "PII strings must not survive the scrub")
    // idempotent on an Info-free file
    val plain = PdfProbe.mint(6, 2, encrypt = false)
    assert(PdfProbe.scrubInfo(plain).sameElements(plain))
  }

  test("L235 garbage fails loudly") {
    intercept[IllegalArgumentException] {
      PdfProbe.probe("not a pdf at all".getBytes)
    }
    intercept[IllegalArgumentException] {
      PdfProbe.probe(Array[Byte](1, 2, 3))
    }
  }
}
