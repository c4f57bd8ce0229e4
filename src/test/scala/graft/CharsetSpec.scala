package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.CharsetSniff

/** The byte→text seam: WHATWG sniff precedence (BOM > header > meta >
  * default), strict decode that refuses mojibake instead of minting
  * U+FFFD, and the cp1252/latin-1 distinction (same bytes, different
  * text — the classic silent corruption).
  */
class CharsetSpec extends AnyFunSuite {

  test("sniff precedence: BOM beats a wrong header, header beats meta, " +
      "meta beats the default") {
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "<p>x</p>".getBytes("UTF-8")
    assert(CharsetSniff.sniff(Some("text/html; charset=windows-1252"), bom)
      == (("utf-8", "bom")))
    val metaDoc = "<html><head><meta charset=ISO-8859-1></head></html>"
      .getBytes("US-ASCII")
    assert(CharsetSniff.sniff(Some("text/html; charset=windows-1252"),
      metaDoc) == (("windows-1252", "header")))
    assert(CharsetSniff.sniff(None, metaDoc) == (("iso-8859-1", "meta")))
    val equivDoc = ("<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=windows-1252\">").getBytes("US-ASCII")
    assert(CharsetSniff.sniff(None, equivDoc) == (("windows-1252", "meta")))
    assert(CharsetSniff.sniff(None, "<p>plain</p>".getBytes("US-ASCII"))
      == (("utf-8", "default")))
  }

  test("strict decode: cp1252 bytes mis-declared utf-8 throw; the same " +
      "bytes decode differently (NOT equal) under cp1252 vs latin-1") {
    val text = "price €9 café"
    val cp = CharsetSniff.encodeStrict(text, "windows-1252")
    assert(CharsetSniff.decodeStrict(cp, "windows-1252") == text)
    intercept[IllegalArgumentException] {
      CharsetSniff.decodeStrict(cp, "utf-8")
    }
    // latin-1 happily decodes EVERY byte — 0x80 becomes the C1 control
    // U+0080, not the euro sign: a silent corruption strictness can't
    // catch, only correct declaration can
    val asLatin = CharsetSniff.decodeStrict(cp, "iso-8859-1")
    assert(asLatin != text && asLatin.contains('\u0080'))
    // utf-8 BOM is stripped on decode
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      text.getBytes("UTF-8")
    assert(CharsetSniff.decodeStrict(bom, "utf-8") == text)
    // unmappable on encode is loud too
    intercept[IllegalArgumentException] {
      CharsetSniff.encodeStrict("€", "iso-8859-1")
    }
    // unsupported labels are loud, not provider-dependent
    intercept[IllegalArgumentException] {
      CharsetSniff.decodeStrict("x".getBytes, "shift-jis")
    }
  }
}
