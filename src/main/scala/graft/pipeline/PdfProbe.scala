package graft.pipeline

import java.nio.charset.StandardCharsets.{ISO_8859_1, US_ASCII}
import java.util.zip.{DataFormatException, Deflater, Inflater}

/** Byte-level PDF structural probe + minimal spec-valid injector — the
  * document-corpus sibling of [[ImageProbe]]/[[AudioMeta]]: a crawl of
  * scholarly/scanned material is mostly PDF, and the ingest gate needs
  * version, object/page counts, encryption, and cross-reference sanity
  * BEFORE a heavyweight text extractor runs (encrypted or xref-broken
  * files route to the S10 failed path, not into the extractor).
  *
  * Everything is the public ISO 32000 container grammar, parsed
  * directly: the `%PDF-1.x` header, `N G obj` indirect objects, the
  * page tree's `/Type /Page` leaves and `/Count`, the trailer's
  * `/Encrypt` key, and `startxref` → `xref` agreement. The probe never
  * decompresses streams or runs JavaScript — header/trailer/object
  * scaffolding only, the same posture as the audio duration probes.
  *
  * [[mint]] builds a minimal REAL file (catalog → pages → page leaves,
  * byte-accurate xref offsets, trailer) so the probe is exercised
  * against spec-valid layout, and the spec pins a hand-laid literal so
  * injector and parser cannot share a wrong constant (the ONNX/TIFF
  * lesson).
  */
object PdfProbe {

  final case class PdfInfo(versionMinor: Long, nObjects: Long,
      nPages: Long, pagesCount: Long, hasEncrypt: Boolean, xrefOk: Boolean,
      hasInfo: Boolean)

  /** Build a minimal spec-valid PDF: catalog (1), pages node (2),
    * `nPages` page leaves, optionally a standard-security dictionary
    * referenced from the trailer; real byte offsets in the xref.
    */
  def mint(versionMinor: Int, nPages: Int, encrypt: Boolean): Array[Byte] = {
    require(versionMinor >= 0 && versionMinor <= 7, s"bad minor $versionMinor")
    require(nPages >= 1 && nPages <= 1000, s"bad page count $nPages")
    val sb = new StringBuilder
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    sb.append(s"%PDF-1.$versionMinor\n")
    def obj(body: String): Unit = {
      offsets += sb.length
      sb.append(s"${offsets.length} 0 obj\n$body\nendobj\n")
    }
    val kids = (0 until nPages).map(i => s"${3 + i} 0 R").mkString(" ")
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    obj(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>")
    (0 until nPages).foreach { _ =>
      obj("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>")
    }
    if (encrypt) obj("<< /Filter /Standard /V 1 /R 2 >>")
    val xrefAt = sb.length
    sb.append(s"xref\n0 ${offsets.length + 1}\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R")
    if (encrypt) sb.append(s" /Encrypt ${offsets.length} 0 R")
    sb.append(s" >>\nstartxref\n$xrefAt\n%%EOF\n")
    sb.toString.getBytes(US_ASCII)
  }

  /** RFC 1950 zlib-wrapped deflate — the byte form PDF `/FlateDecode`
    * names (ISO 32000 §7.4.4). `java.util.zip` is stdlib, the same
    * dependency posture as [[ImageMeta]]'s Inflater.
    */
  private[graft] def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, /*nowrap=*/ false)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Inverse of [[deflate]]; corrupt or truncated deflate data throws
    * IllegalArgumentException LOUDLY (callers S10-route it), never a
    * silent partial result.
    */
  private[graft] def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 2 + 64)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          throw new DataFormatException("truncated deflate stream")
        out.write(buf, 0, n)
      }
    } catch {
      case e: DataFormatException =>
        throw new IllegalArgumentException(
          s"corrupt FlateDecode stream: ${e.getMessage}")
    } finally inf.end()
    out.toByteArray
  }

  /** [[mint]] plus one text content stream per page
    * (`BT /F1 12 Tf (text) Tj ET`, exact /Length), UNCOMPRESSED or —
    * with `flate` — zlib-deflated with `/Filter /FlateDecode` (the
    * near-universal real-world form) — the layouts [[extractText]]
    * parses; texts must be paren/backslash-free (the injector rejects
    * them rather than escaping, keeping the grammar the spec pins
    * minimal).
    */
  def mintWithText(versionMinor: Int, texts: Seq[String],
      flate: Boolean = false): Array[Byte] = {
    require(versionMinor >= 0 && versionMinor <= 7, s"bad minor $versionMinor")
    require(texts.nonEmpty && texts.size <= 1000, s"bad page count")
    require(texts.forall(t => !t.exists("()\\".contains(_))),
      "page text must be paren/backslash-free")
    val n = texts.size
    // compressed payloads are binary: the builder string is ISO-8859-1
    // (chars 0..255 <-> bytes 1:1), so offsets stay byte-exact
    val sb = new StringBuilder
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    sb.append(s"%PDF-1.$versionMinor\n")
    def obj(body: String): Unit = {
      offsets += sb.length
      sb.append(s"${offsets.length} 0 obj\n$body\nendobj\n")
    }
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    obj(s"<< /Type /Pages /Kids [$kids] /Count $n >>")
    texts.zipWithIndex.foreach { case (t, i) =>
      obj("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Contents ${4 + 2 * i} 0 R >>")
      val content = s"BT /F1 12 Tf ($t) Tj ET"
      if (flate) {
        val comp = deflate(content.getBytes(US_ASCII))
        obj(s"<< /Length ${comp.length} /Filter /FlateDecode >>\n" +
          s"stream\n${new String(comp, ISO_8859_1)}\nendstream")
      } else
        obj(s"<< /Length ${content.length} >>\nstream\n$content\nendstream")
    }
    val xrefAt = sb.length
    sb.append(s"xref\n0 ${offsets.length + 1}\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R")
    sb.append(s" >>\nstartxref\n$xrefAt\n%%EOF\n")
    sb.toString.getBytes(ISO_8859_1)
  }

  private val tjRe = """\(([^()\\]*)\)\s*Tj""".r
  private val streamStartRe =
    java.util.regex.Pattern.compile("""<<([^<>]*)>>\s*stream\r?\n""")
  // direct /Length only: a digit continuation or an indirect `N G R`
  // reference must NOT half-match via backtracking
  private val lengthRe = """/Length\s+(\d+)(?!\d|\s+\d+\s+R)""".r

  /** L236 — extract the `(...) Tj` show-text strings from every
    * content stream, in document order joined by single spaces. The
    * stream walk honors exact `/Length` byte counts (so binary
    * payloads can't alias the grammar) and inflates
    * `/Filter /FlateDecode` streams via [[inflate]] — corrupt deflate
    * data throws loudly for S10 routing. Scope: direct (non-indirect)
    * `/Length`, non-nested stream dictionaries — the minted/simple
    * corpus tier; a full extractor replaces the body, the Spark-side
    * plumbing stays.
    */
  def extractText(bytes: Array[Byte]): String = {
    require(bytes != null && bytes.length >= 9 &&
      new String(bytes, 0, 5, US_ASCII) == "%PDF-",
      "not a PDF: missing %PDF- header")
    val s = new String(bytes, ISO_8859_1)
    val m = streamStartRe.matcher(s)
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    var pos = 0
    while (pos < s.length && m.find(pos)) {
      val dict = m.group(1)
      val dataFrom = m.end
      val dataUntil = lengthRe.findFirstMatchIn(dict).map(_.group(1).toInt) match {
        case Some(len) =>
          require(dataFrom + len <= bytes.length,
            s"stream /Length $len runs past end of file")
          dataFrom + len
        case None =>
          // no direct /Length: fall back to the endstream keyword
          val e = s.indexOf("endstream", dataFrom)
          require(e >= 0, "unterminated content stream")
          // strip the EOL the writer put before the keyword
          if (e > dataFrom && s(e - 1) == '\n')
            (if (e - 1 > dataFrom && s(e - 2) == '\r') e - 2 else e - 1)
          else e
      }
      val payload = java.util.Arrays.copyOfRange(bytes, dataFrom, dataUntil)
      val decoded =
        if (dict.contains("/FlateDecode")) new String(inflate(payload), US_ASCII)
        else new String(payload, ISO_8859_1)
      val found = tjRe.findAllMatchIn(decoded).map(_.group(1)).toSeq
      if (found.nonEmpty) parts += found.mkString(" ")
      pos = dataUntil
    }
    parts.mkString(" ")
  }

  /** [[mint]] plus a document-information dictionary (`/Author`,
    * `/Producer`) referenced from the trailer's `/Info` key — the
    * metadata slot where scanned/exported PDFs carry user names and
    * tool identities (the PII surface [[scrubInfo]] removes). Values
    * must be paren/backslash-free, like [[mintWithText]].
    */
  def mintWithInfo(versionMinor: Int, nPages: Int, author: String,
      producer: String): Array[Byte] = {
    require(versionMinor >= 0 && versionMinor <= 7, s"bad minor $versionMinor")
    require(nPages >= 1 && nPages <= 1000, s"bad page count $nPages")
    require(!(author + producer).exists("()\\".contains(_)),
      "info strings must be paren/backslash-free")
    val sb = new StringBuilder
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    sb.append(s"%PDF-1.$versionMinor\n")
    def obj(body: String): Unit = {
      offsets += sb.length
      sb.append(s"${offsets.length} 0 obj\n$body\nendobj\n")
    }
    val kids = (0 until nPages).map(i => s"${3 + i} 0 R").mkString(" ")
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    obj(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>")
    (0 until nPages).foreach { _ =>
      obj("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>")
    }
    obj(s"<< /Author ($author) /Producer ($producer) >>")
    val xrefAt = sb.length
    sb.append(s"xref\n0 ${offsets.length + 1}\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R")
    sb.append(s" /Info ${offsets.length} 0 R")
    sb.append(s" >>\nstartxref\n$xrefAt\n%%EOF\n")
    sb.toString.getBytes(US_ASCII)
  }

  private val infoRefRe = """/Info\s+(\d+)\s+(\d+)\s+R""".r

  /** L247 — scrub the document-information dictionary IN PLACE: the
    * trailer's `/Info N G R` key and the referenced object's body are
    * overwritten with spaces of the SAME byte length (body → an empty
    * dictionary padded with spaces), so every xref offset — and every
    * other byte — stays valid without re-serializing the file. The
    * audit contract: probe → scrub → re-probe with nothing but
    * `hasInfo` changing, and `scrubbed.length == original.length`.
    * A file without `/Info` is returned unchanged.
    */
  def scrubInfo(bytes: Array[Byte]): Array[Byte] = {
    val s = new String(bytes, US_ASCII)
    val m = infoRefRe.findFirstMatchIn(s).getOrElse(return bytes.clone())
    val out = bytes.clone()
    def blank(from: Int, until: Int): Unit = {
      var i = from
      while (i < until) { out(i) = ' '; i += 1 }
    }
    blank(m.start, m.end)
    val objHdr = s"${m.group(1)} ${m.group(2)} obj"
    val at = s.indexOf(objHdr + "\n")
    require(at >= 0 || s.indexOf(objHdr) >= 0,
      s"scrubInfo: /Info points at missing object ${m.group(1)}")
    val hdrAt = if (at >= 0) at else s.indexOf(objHdr)
    val bodyFrom = hdrAt + objHdr.length
    val endAt = s.indexOf("endobj", bodyFrom)
    require(endAt > bodyFrom, "scrubInfo: unterminated Info object")
    // keep the object header and terminator (xref stays valid), fill
    // the body with an empty dict + spaces of the same length
    require(endAt - bodyFrom >= 6, "scrubInfo: Info body too short")
    blank(bodyFrom, endAt)
    out(bodyFrom + 1) = '<'; out(bodyFrom + 2) = '<'
    out(endAt - 3) = '>'; out(endAt - 2) = '>'
    out
  }

  private val objRe = """(?m)^(\d+) (\d+) obj\b""".r
  private val pageRe = """/Type\s*/Page(?![a-zA-Z])""".r
  private val countRe = """/Type\s*/Pages[^>]*?/Count\s+(\d+)""".r
  private val startxrefRe = """startxref\s+(\d+)""".r

  /** Structural probe; throws loudly on a non-PDF payload.
    *
    * Scope caveats (the minted tier never hits either, but real-world
    * input can): nObjects/nPages count by regex over the WHOLE byte
    * stream, so dictionary-like text inside page content strings
    * inflates the counts (a full tokenizer would need the object
    * graph); and `startxref` validation reads the LAST occurrence —
    * ISO 32000 §7.5.5: an incrementally-updated PDF appends a new
    * xref + startxref, and the last one is the live table.
    */
  def probe(bytes: Array[Byte]): PdfInfo = {
    require(bytes != null && bytes.length >= 9 &&
      new String(bytes, 0, 5, US_ASCII) == "%PDF-",
      "not a PDF: missing %PDF- header")
    val s = new String(bytes, US_ASCII)
    require(s(5) == '1' && s(6) == '.' && s(7).isDigit,
      s"unsupported PDF version header: ${s.take(9)}")
    val minor = (s(7) - '0').toLong
    val nObjects = objRe.findAllMatchIn(s).size.toLong
    val nPages = pageRe.findAllMatchIn(s).size.toLong
    val pagesCount = countRe.findFirstMatchIn(s)
      .map(_.group(1).toLong).getOrElse(-1L)
    val hasEncrypt = s.contains("/Encrypt")
    val hasInfo = infoRefRe.findFirstMatchIn(s).isDefined
    // last startxref: incremental updates append new xref tables and
    // the final startxref is the live one (ISO 32000 §7.5.5)
    val xrefOk = startxrefRe.findAllMatchIn(s).toSeq.lastOption.exists { m =>
      val at = m.group(1).toInt
      at >= 0 && at + 4 <= bytes.length &&
        new String(bytes, at, 4, US_ASCII) == "xref"
    }
    PdfInfo(minor, nObjects, nPages, pagesCount, hasEncrypt, xrefOk,
      hasInfo)
  }
}
