package graft.pipeline

import java.nio.charset.StandardCharsets

/** Archive-container walks — the front doors a training-data pipeline
  * meets right after WARC (pipeline/WarcIO.scala): corpora ship as
  * tarballs (WebDataset, The Pile shards) and ZIP containers (DOCX /
  * EPUB office documents are ZIP archives of XML parts). The posture
  * matches the other binary front doors: pure-JVM parsers over opaque
  * binary columns, header/directory walks that never decode more than
  * asked, corrupt bytes → loud IllegalArgumentException for the S10
  * failed-row tier, and mint duals so every parser is round-trip
  * certified against bytes laid down by an independent code path.
  *
  * Formats from their public specifications only:
  *  - POSIX.1-1988 ustar (pax/GNU extensions out of the bounded
  *    grammar — loud, not silent).
  *  - PKWARE APPNOTE.TXT ZIP: EOCD → central directory → local
  *    headers; methods 0 (stored) and 8 (deflate, via
  *    java.util.zip.Inflater — the PdfProbe dependency posture).
  *  - ECMA-376 / ISO-IEC 29500 WordprocessingML: document text is the
  *    concatenation of `<w:t>` runs inside `word/document.xml`.
  */
object Containers {

  // ---------------------------------------------------------------- tar

  /** One ustar entry: header fields the walk certifies plus the
    * payload offset/size so a caller can slice content lazily.
    */
  final case class TarEntry(name: String, size: Long, typeflag: Char,
      mtime: Long, dataOffset: Long)

  private def octal(b: Array[Byte], off: Int, len: Int,
      what: String): Long = {
    var i = off
    val end = off + len
    // leading spaces/NULs tolerated (historic writers), then octal
    // digits until space/NUL terminator
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    var v = 0L
    var any = false
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = v * 8 + (b(i) - '0'); i += 1; any = true
    }
    require(any || (i < end && (b(i) == ' ' || b(i) == 0)),
      s"tar: unparseable octal field $what")
    v
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var e = off
    while (e < off + len && b(e) != 0) e += 1
    new String(b, off, e - off, StandardCharsets.US_ASCII)
  }

  /** Walk a POSIX ustar archive: validates the `ustar` magic and the
    * header checksum (sum of header bytes with the chksum field read
    * as spaces) of every entry, stops at the two-NUL-block terminator
    * (or clean EOF). Regular files and directories only — pax/GNU
    * longname typeflags are out of the bounded grammar and raise.
    */
  def walkTar(bytes: Array[Byte]): Seq[TarEntry] = {
    val out = Seq.newBuilder[TarEntry]
    var off = 0L
    var done = false
    while (!done) {
      require(off + 512 <= bytes.length,
        s"tar: truncated header at offset $off")
      val o = off.toInt
      if (bytes.slice(o, o + 512).forall(_ == 0)) {
        done = true // terminator block
      } else {
        val magic = cstr(bytes, o + 257, 6)
        require(magic == "ustar",
          s"tar: bad magic '$magic' at offset $off")
        val stored = octal(bytes, o + 148, 8, "chksum")
        var sum = 0L
        var i = 0
        while (i < 512) {
          sum += (if (i >= 148 && i < 156) ' '.toLong
                  else bytes(o + i) & 0xffL)
          i += 1
        }
        require(sum == stored,
          s"tar: header checksum mismatch at offset $off " +
            s"(stored $stored, computed $sum)")
        val tf = (bytes(o + 156) & 0xff).toChar
        require(tf == '0' || tf == 0.toChar || tf == '5',
          s"tar: typeflag '$tf' outside the bounded grammar " +
            "(regular files and directories only)")
        val prefix = cstr(bytes, o + 345, 155)
        val base = cstr(bytes, o, 100)
        val name = if (prefix.isEmpty) base else s"$prefix/$base"
        val size = octal(bytes, o + 124, 12, "size")
        out += TarEntry(name, size, if (tf == 0.toChar) '0' else tf,
          octal(bytes, o + 136, 12, "mtime"), off + 512)
        off += 512 + ((size + 511) / 512) * 512
        require(off <= bytes.length, s"tar: entry '$name' overruns " +
          s"the archive (needs $off of ${bytes.length} bytes)")
        if (off == bytes.length) done = true
      }
    }
    out.result()
  }

  /** Mint a ustar archive (fixture dual of [[walkTar]]): regular
    * files with correct checksums and the two-block terminator.
    */
  def mintTar(entries: Seq[(String, Long, Array[Byte])]): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, mtime, data) =>
      require(name.length <= 100, s"mintTar: name too long: $name")
      val h = new Array[Byte](512)
      def put(s: String, off: Int): Unit = {
        val b = s.getBytes(StandardCharsets.US_ASCII)
        System.arraycopy(b, 0, h, off, b.length)
      }
      put(name, 0)
      put("0000644", 100); put("0000000", 108); put("0000000", 116)
      put(f"${data.length}%011o", 124)
      put(f"$mtime%011o", 136)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      h(156) = '0'
      put("ustar", 257) // magic 257..262, NUL-terminated by the zero fill
      put("00", 263)    // version field
      var sum = 0L
      h.foreach(b => sum += b & 0xffL)
      put(f"$sum%06o", 148); h(154) = 0; h(155) = ' '
      bb.write(h)
      bb.write(data)
      val pad = ((data.length + 511) / 512) * 512 - data.length
      bb.write(new Array[Byte](pad))
    }
    bb.write(new Array[Byte](1024))
    bb.toByteArray
  }

  // ---------------------------------------------------------------- zip

  /** One central-directory entry: the catalog row a ZIP walk reads
    * without touching entry payloads.
    */
  final case class ZipEntry(name: String, method: Int, crc32: Long,
      compSize: Long, uncompSize: Long, localOffset: Long)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Walk a ZIP central directory: locate the end-of-central-directory
    * record by scanning backwards for its signature (the published
    * algorithm — the EOCD may be followed by a comment), then read
    * each central file header. Multi-disk archives and ZIP64 are out
    * of the bounded grammar — loud. The walk reads the CATALOG only;
    * payloads stay untouched (the lazy-decode posture).
    */
  def walkZip(bytes: Array[Byte]): Seq[ZipEntry] = {
    var eocd = -1
    var i = bytes.length - 22
    while (eocd < 0 && i >= 0) {
      if (u32(bytes, i) == 0x06054b50L) eocd = i else i -= 1
    }
    require(eocd >= 0, "zip: no end-of-central-directory signature")
    require(u16(bytes, eocd + 4) == 0 && u16(bytes, eocd + 6) == 0,
      "zip: multi-disk archives outside the bounded grammar")
    val n = u16(bytes, eocd + 10)
    require(n == u16(bytes, eocd + 8),
      "zip: per-disk vs total entry counts disagree")
    val cdOff = u32(bytes, eocd + 16)
    var o = cdOff.toInt
    (0 until n).map { _ =>
      require(o + 46 <= bytes.length, "zip: truncated central directory")
      require(u32(bytes, o) == 0x02014b50L,
        f"zip: bad central-file-header signature at $o%d")
      val method = u16(bytes, o + 10)
      require(method == 0 || method == 8,
        s"zip: compression method $method outside the bounded grammar " +
          "(stored and deflate only)")
      val crc = u32(bytes, o + 16)
      val csz = u32(bytes, o + 20)
      val usz = u32(bytes, o + 24)
      val nameLen = u16(bytes, o + 28)
      val extraLen = u16(bytes, o + 30)
      val cmtLen = u16(bytes, o + 32)
      val lho = u32(bytes, o + 42)
      require(csz != 0xffffffffL && lho != 0xffffffffL,
        "zip: ZIP64 outside the bounded grammar")
      val name = new String(bytes, o + 46, nameLen, StandardCharsets.UTF_8)
      o += 46 + nameLen + extraLen + cmtLen
      ZipEntry(name, method, crc, csz, usz, lho)
    }
  }

  /** Read and decode one entry's payload through its local header
    * (APPNOTE 4.3.7), inflating method-8 data and certifying the
    * CRC-32 — the loud-decode tier behind the catalog walk.
    */
  def readZipEntry(bytes: Array[Byte], e: ZipEntry): Array[Byte] = {
    val o = e.localOffset.toInt
    require(u32(bytes, o) == 0x04034b50L,
      s"zip: bad local-header signature for '${e.name}'")
    val nameLen = u16(bytes, o + 26)
    val extraLen = u16(bytes, o + 28)
    val dataOff = o + 30 + nameLen + extraLen
    require(dataOff + e.compSize <= bytes.length,
      s"zip: entry '${e.name}' payload overruns the archive")
    val comp = java.util.Arrays.copyOfRange(bytes, dataOff,
      dataOff + e.compSize.toInt)
    val raw =
      if (e.method == 0) comp
      else {
        val inf = new java.util.zip.Inflater(/*nowrap=*/ true)
        inf.setInput(comp)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        try {
          while (!inf.finished()) {
            val k = inf.inflate(buf)
            require(k > 0 || inf.finished() || !inf.needsInput(),
              s"zip: truncated deflate stream in '${e.name}'")
            out.write(buf, 0, k)
          }
        } catch {
          case d: java.util.zip.DataFormatException =>
            throw new IllegalArgumentException(
              s"zip: corrupt deflate stream in '${e.name}': ${d.getMessage}")
        } finally inf.end()
        out.toByteArray
      }
    require(raw.length.toLong == e.uncompSize,
      s"zip: '${e.name}' inflated to ${raw.length}, " +
        s"directory says ${e.uncompSize}")
    val c = new java.util.zip.CRC32()
    c.update(raw)
    require(c.getValue == e.crc32,
      s"zip: CRC mismatch in '${e.name}'")
    raw
  }

  /** Mint a ZIP archive (fixture dual of [[walkZip]]): local headers,
    * payloads (deflated when `deflate`), central directory, EOCD.
    */
  def mintZip(entries: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      bb.write((v & 0xff).toInt); bb.write(((v >> 8) & 0xff).toInt)
      bb.write(((v >> 16) & 0xff).toInt); bb.write(((v >> 24) & 0xff).toInt)
    }
    val dir = entries.map { case (name, data, deflate) =>
      val nameB = name.getBytes(StandardCharsets.UTF_8)
      val crc = new java.util.zip.CRC32(); crc.update(data)
      val comp =
        if (!deflate) data
        else {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, /*nowrap=*/ true)
          d.setInput(data); d.finish()
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) out.write(buf, 0, d.deflate(buf))
          d.end()
          out.toByteArray
        }
      val off = bb.size().toLong
      w32(0x04034b50L); w16(20); w16(0); w16(if (deflate) 8 else 0)
      w16(0); w16(0) // time/date
      w32(crc.getValue); w32(comp.length.toLong); w32(data.length.toLong)
      w16(nameB.length); w16(0)
      bb.write(nameB); bb.write(comp)
      (nameB, deflate, crc.getValue, comp.length.toLong,
        data.length.toLong, off)
    }
    val cdOff = bb.size().toLong
    dir.foreach { case (nameB, deflate, crc, csz, usz, off) =>
      w32(0x02014b50L); w16(20); w16(20); w16(0)
      w16(if (deflate) 8 else 0); w16(0); w16(0)
      w32(crc); w32(csz); w32(usz)
      w16(nameB.length); w16(0); w16(0); w16(0); w16(0)
      w32(0L); w32(off)
      bb.write(nameB)
    }
    val cdSize = bb.size().toLong - cdOff
    w32(0x06054b50L); w16(0); w16(0); w16(dir.size); w16(dir.size)
    w32(cdSize); w32(cdOff); w16(0)
    bb.toByteArray
  }

  // --------------------------------------------------------------- docx

  private val wtRe = """(?s)<w:t(?:\s[^>]*)?>(.*?)</w:t>""".r
  private val parSplitRe = "</w:p>"

  /** Extract document text from a DOCX container (ISO/IEC 29500
    * WordprocessingML): the archive's `word/document.xml` part is
    * located through the central directory, decoded loudly, and text
    * is the concatenation of `<w:t>` run contents — paragraphs
    * (`</w:p>`) become newlines, the XML entity subset the format
    * emits is decoded. Missing part or corrupt payload raises (S10
    * tier).
    */
  def docxText(bytes: Array[Byte]): String = {
    val entries = walkZip(bytes)
    val doc = entries.find(_.name == "word/document.xml").getOrElse(
      throw new IllegalArgumentException(
        "docx: no word/document.xml part"))
    val xml = new String(readZipEntry(bytes, doc), StandardCharsets.UTF_8)
    xml.split(parSplitRe).toSeq
      .map(p => wtRe.findAllMatchIn(p).map(_.group(1)).mkString)
      .map(HtmlText.decodeEntities)
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  // --------------------------------------------------------------- epub

  private val rootfileRe =
    """full-path\s*=\s*"([^"]+)"""".r
  private val manifestItemRe =
    """(?s)<item\s[^>]*>""".r
  private val attrValRe =
    """(\w+(?:-\w+)*)\s*=\s*"([^"]*)"""".r
  private val spineRefRe =
    """<itemref\s[^>]*idref\s*=\s*"([^"]+)"""".r

  /** One EPUB chapter in spine order: position, archive href, and the
    * extracted text.
    */
  final case class EpubChapter(idx: Int, href: String, text: String)

  /** Extract chapter text from an EPUB container (the other ZIP-based
    * document format next to [[docxText]]; EPUB OCF + OPF): certify
    * the `mimetype` entry (spec: STORED, exact media type), locate the
    * OPF package document through `META-INF/container.xml`, resolve
    * the SPINE reading order through the manifest id→href map, and run
    * each XHTML chapter through the L256 HTML text extraction. Missing
    * structure raises (S10 tier).
    */
  def epubText(bytes: Array[Byte]): Seq[EpubChapter] = {
    val entries = walkZip(bytes)
    def part(name: String): Array[Byte] =
      readZipEntry(bytes, entries.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"epub: no $name part")))
    val mt = entries.find(_.name == "mimetype").getOrElse(
      throw new IllegalArgumentException("epub: no mimetype entry"))
    require(mt.method == 0, "epub: mimetype entry must be STORED")
    require(new String(readZipEntry(bytes, mt), StandardCharsets.US_ASCII)
      == "application/epub+zip", "epub: wrong media type")
    val container = new String(part("META-INF/container.xml"),
      StandardCharsets.UTF_8)
    val opfPath = rootfileRe.findFirstMatchIn(container).map(_.group(1))
      .getOrElse(throw new IllegalArgumentException(
        "epub: container.xml names no rootfile"))
    val opf = new String(part(opfPath), StandardCharsets.UTF_8)
    val opfDir = opfPath.lastIndexOf('/') match {
      case -1 => ""
      case i  => opfPath.substring(0, i + 1)
    }
    val hrefById = manifestItemRe.findAllMatchIn(opf).flatMap { m =>
      val attrs = attrValRe.findAllMatchIn(m.matched)
        .map(a => (a.group(1), a.group(2))).toMap
      for (id <- attrs.get("id"); href <- attrs.get("href")) yield id -> href
    }.toMap
    val spine = spineRefRe.findAllMatchIn(opf).map(_.group(1)).toSeq
    require(spine.nonEmpty, "epub: empty spine")
    spine.zipWithIndex.map { case (idref, i) =>
      val href = hrefById.getOrElse(idref,
        throw new IllegalArgumentException(
          s"epub: spine idref '$idref' missing from manifest"))
      val xhtml = new String(part(opfDir + href), StandardCharsets.UTF_8)
      EpubChapter(i + 1, href, HtmlText.toText(xhtml))
    }
  }

  /** Mint a minimal EPUB (fixture dual of [[epubText]]): stored
    * mimetype, container.xml, OPF with manifest+spine, one XHTML file
    * per chapter.
    */
  def mintEpub(chapters: Seq[Seq[String]], deflate: Boolean): Array[Byte] = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
    val container = "<?xml version=\"1.0\"?><container version=\"1.0\" " +
      "xmlns=\"urn:oasis:names:tc:opendocument:xmlns:container\">" +
      "<rootfiles><rootfile full-path=\"OEBPS/content.opf\" " +
      "media-type=\"application/oebps-package+xml\"/></rootfiles>" +
      "</container>"
    val manifest = chapters.indices.map(i =>
      s"""<item id="c$i" href="ch$i.xhtml" """ +
        "media-type=\"application/xhtml+xml\"/>").mkString
    val spine = chapters.indices.map(i =>
      s"""<itemref idref="c$i"/>""").mkString
    val opf = "<?xml version=\"1.0\"?><package version=\"3.0\" " +
      "xmlns=\"http://www.idpf.org/2007/opf\"><manifest>" + manifest +
      "</manifest><spine>" + spine + "</spine></package>"
    val chapterParts = chapters.zipWithIndex.map { case (paras, i) =>
      val body = paras.map(p => s"<p>${esc(p)}</p>").mkString
      (s"OEBPS/ch$i.xhtml",
        ("<?xml version=\"1.0\"?><html><body>" + body + "</body></html>")
          .getBytes(StandardCharsets.UTF_8), deflate)
    }
    mintZip(Seq(
      ("mimetype", "application/epub+zip".getBytes(StandardCharsets.US_ASCII),
        false),
      ("META-INF/container.xml",
        container.getBytes(StandardCharsets.UTF_8), deflate),
      ("OEBPS/content.opf", opf.getBytes(StandardCharsets.UTF_8), deflate))
      ++ chapterParts)
  }

  /** Mint a minimal WordprocessingML container (fixture dual of
    * [[docxText]]): one paragraph per input line, each line split
    * into two runs to exercise run concatenation.
    */
  def mintDocx(paragraphs: Seq[String], deflate: Boolean): Array[Byte] = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
    val body = paragraphs.map { p =>
      val (a, b) = p.splitAt(p.length / 2)
      s"<w:p><w:r><w:t xml:space=\"preserve\">${esc(a)}</w:t></w:r>" +
        s"<w:r><w:t xml:space=\"preserve\">${esc(b)}</w:t></w:r></w:p>"
    }.mkString
    val docXml = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<w:document xmlns:w=\"http://schemas.openxmlformats.org/" +
      "wordprocessingml/2006/main\"><w:body>" + body +
      "</w:body></w:document>"
    val types = "<?xml version=\"1.0\"?><Types xmlns=\"http://schemas." +
      "openxmlformats.org/package/2006/content-types\">" +
      "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
      "</Types>"
    mintZip(Seq(
      ("[Content_Types].xml", types.getBytes(StandardCharsets.UTF_8),
        deflate),
      ("word/document.xml", docXml.getBytes(StandardCharsets.UTF_8),
        deflate)))
  }
}
