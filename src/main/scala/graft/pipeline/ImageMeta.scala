package graft.pipeline

import java.io.ByteArrayOutputStream

/** L200 — IMAGE METADATA: probe + inject + strip, pure byte-level
  * container surgery from the public specs — the metadata lens a
  * curation pass over scraped images needs next to the dimension probe
  * (`ImageProbe`): EXIF orientation decides whether a resize/crop plan
  * is even valid, ICC presence decides color handling, and text/EXIF
  * payloads are a PII surface (GPS tags, device serials) that a
  * privacy scrub must REMOVE without re-encoding pixels.
  *
  *  - JPEG (ISO 10918 + EXIF/TIFF 6.0): APP1 "Exif\0\0" holds a TIFF
  *    block (II/MM byte order, magic 42, IFD0 entries); orientation is
  *    tag 0x0112 type SHORT. APP2 "ICC_PROFILE\0" marks an embedded
  *    profile; COM (0xFE) segments are free text. The walk stops at
  *    SOS — metadata precedes entropy-coded data.
  *  - PNG (ISO 15948): ancillary chunks tEXt/zTXt/iTXt carry text,
  *    iCCP the profile, eXIf (1.2 extension) a TIFF block like APP1.
  *    Chunk CRCs are real CRC32 over type+data — the injectors emit
  *    spec-valid chunks any reader can skip.
  *  - GIF (89a): comment extension blocks (0x21 0xFE, length-prefixed
  *    sub-blocks) are the text surface; no EXIF/ICC concept.
  *  - BMP: carries no metadata — probe reports none, strip is the
  *    identity.
  *
  * Strip = rebuild the container WITHOUT the metadata segments,
  * byte-copying everything else — pixels are never re-encoded, so a
  * decode of the stripped file is bit-identical to the original
  * (pinned in ImageCodecSpec). Injection exists so the pipeline can
  * MINT metadata-bearing fixtures (and re-tag curated output); the
  * ICC injectors wrap an opaque payload in the real container layout —
  * presence/shape is what the probe and scrub act on, profile
  * semantics are out of scope.
  *
  * Every parse failure throws loudly — never a guessed tag.
  */
object ImageMeta {

  final case class MetaInfo(format: String, width: Long, height: Long,
      orientation: Long, hasExif: Boolean, hasIcc: Boolean, nText: Long)

  // ---------------------------------------------------------------- TIFF

  /** Minimal EXIF TIFF block: one IFD0 entry — orientation (0x0112,
    * SHORT). Little-endian ("II") layout, IFD0 at offset 8.
    */
  def tiffOrientation(orientation: Int): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8,
      s"EXIF orientation must be 1..8, got $orientation")
    val b = new ByteArrayOutputStream()
    b.write('I'); b.write('I'); b.write(42); b.write(0)
    b.write(8); b.write(0); b.write(0); b.write(0)      // IFD0 offset
    b.write(1); b.write(0)                              // 1 entry
    b.write(0x12); b.write(0x01)                        // tag 0x0112
    b.write(3); b.write(0)                              // type SHORT
    b.write(1); b.write(0); b.write(0); b.write(0)      // count 1
    b.write(orientation); b.write(0); b.write(0); b.write(0) // value+pad
    b.write(0); b.write(0); b.write(0); b.write(0)      // no next IFD
    b.toByteArray
  }

  /** Read orientation (tag 0x0112) from a TIFF block, II or MM byte
    * order; −1 when the tag is absent.
    */
  def tiffReadOrientation(t: Array[Byte], off: Int, len: Int): Long = {
    require(len >= 8, s"TIFF block truncated ($len bytes)")
    val le =
      if (t(off) == 'I' && t(off + 1) == 'I') true
      else if (t(off) == 'M' && t(off + 1) == 'M') false
      else throw new IllegalArgumentException(
        f"bad TIFF byte-order mark 0x${t(off) & 0xff}%02x${t(off + 1) & 0xff}%02x")
    def u16(p: Int): Int =
      if (le) (t(p) & 0xff) | ((t(p + 1) & 0xff) << 8)
      else ((t(p) & 0xff) << 8) | (t(p + 1) & 0xff)
    def u32(p: Int): Long =
      if (le) (t(p) & 0xffL) | ((t(p + 1) & 0xffL) << 8) |
        ((t(p + 2) & 0xffL) << 16) | ((t(p + 3) & 0xffL) << 24)
      else ((t(p) & 0xffL) << 24) | ((t(p + 1) & 0xffL) << 16) |
        ((t(p + 2) & 0xffL) << 8) | (t(p + 3) & 0xffL)
    require(u16(off + 2) == 42, s"bad TIFF magic ${u16(off + 2)}")
    val ifd = off + u32(off + 4).toInt
    require(ifd + 2 <= off + len, "TIFF IFD0 offset beyond block")
    val n = u16(ifd)
    var i = 0
    while (i < n) {
      val e = ifd + 2 + i * 12
      require(e + 12 <= off + len, "TIFF IFD0 entry truncated")
      if (u16(e) == 0x0112 && u16(e + 2) == 3 && u32(e + 4) == 1L)
        return u16(e + 8).toLong
      i += 1
    }
    -1L
  }

  // ---------------------------------------------------------------- JPEG

  private def be16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

  private val ExifHeader = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0)
  private val IccHeader = "ICC_PROFILE".getBytes("US-ASCII") ++ Array[Byte](0)

  private def isSoi(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  private def jpegInsert(jpeg: Array[Byte], marker: Int,
      payload: Array[Byte]): Array[Byte] = {
    require(isSoi(jpeg), "not a JPEG (missing SOI)")
    require(payload.length + 2 <= 0xffff, "JPEG segment payload too long")
    val out = new ByteArrayOutputStream(jpeg.length + payload.length + 4)
    out.write(0xff); out.write(0xd8)
    out.write(0xff); out.write(marker)
    val len = payload.length + 2
    out.write(len >> 8); out.write(len & 0xff)
    out.write(payload, 0, payload.length)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }

  def jpegWithExif(jpeg: Array[Byte], orientation: Int): Array[Byte] =
    jpegInsert(jpeg, 0xe1, ExifHeader ++ tiffOrientation(orientation))

  /** APP2 ICC container (real layout: identifier + chunk 1/1) around an
    * opaque profile payload.
    */
  def jpegWithIcc(jpeg: Array[Byte], profile: Array[Byte]): Array[Byte] =
    jpegInsert(jpeg, 0xe2, IccHeader ++ Array[Byte](1, 1) ++ profile)

  def jpegWithComment(jpeg: Array[Byte], text: String): Array[Byte] =
    jpegInsert(jpeg, 0xfe, text.getBytes("US-ASCII"))

  /** Walk JPEG metadata segments up to SOS. */
  private def jpegMeta(b: Array[Byte]): (Long, Boolean, Boolean, Long) = {
    var p = 2
    var orientation = -1L
    var hasExif = false
    var hasIcc = false
    var nText = 0L
    while (p + 3 < b.length) {
      require((b(p) & 0xff) == 0xff,
        f"JPEG marker expected at $p, got 0x${b(p) & 0xff}%02x")
      var m = b(p + 1) & 0xff
      var q = p + 1
      while (m == 0xff && q + 1 < b.length) { q += 1; m = b(q) & 0xff }
      val seg = q + 1
      if (m == 0xda || m == 0xd9) return (orientation, hasExif, hasIcc, nText)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
        p = seg
      } else {
        require(seg + 1 < b.length, "JPEG segment length truncated")
        val len = be16(b, seg)
        require(len >= 2 && seg + len <= b.length,
          s"bad JPEG segment length $len")
        val dataOff = seg + 2
        val dataLen = len - 2
        if (m == 0xe1 && dataLen >= ExifHeader.length &&
            ExifHeader.indices.forall(i => b(dataOff + i) == ExifHeader(i))) {
          hasExif = true
          orientation = tiffReadOrientation(
            b, dataOff + ExifHeader.length, dataLen - ExifHeader.length)
        } else if (m == 0xe2 && dataLen >= IccHeader.length &&
            IccHeader.indices.forall(i => b(dataOff + i) == IccHeader(i))) {
          hasIcc = true
        } else if (m == 0xfe) {
          nText += 1L
        }
        p = seg + len
      }
    }
    (orientation, hasExif, hasIcc, nText)
  }

  /** Drop APP1–APP15 and COM segments (keep APP0/JFIF); from SOS on,
    * bytes copy verbatim — pixels are never re-encoded.
    */
  def stripJpeg(b: Array[Byte]): Array[Byte] = {
    require(isSoi(b), "not a JPEG (missing SOI)")
    val out = new ByteArrayOutputStream(b.length)
    out.write(0xff); out.write(0xd8)
    var p = 2
    while (p + 3 < b.length) {
      require((b(p) & 0xff) == 0xff,
        f"JPEG marker expected at $p, got 0x${b(p) & 0xff}%02x")
      var m = b(p + 1) & 0xff
      var q = p + 1
      while (m == 0xff && q + 1 < b.length) { q += 1; m = b(q) & 0xff }
      val seg = q + 1
      if (m == 0xda) { // SOS: copy the rest verbatim
        out.write(b, p, b.length - p)
        return out.toByteArray
      }
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
        out.write(b, p, seg - p)
        p = seg
      } else {
        require(seg + 1 < b.length, "JPEG segment length truncated")
        val len = be16(b, seg)
        require(len >= 2 && seg + len <= b.length,
          s"bad JPEG segment length $len")
        val drop = (m >= 0xe1 && m <= 0xef) || m == 0xfe
        if (!drop) out.write(b, p, seg + len - p)
        p = seg + len
      }
    }
    out.toByteArray
  }

  // ----------------------------------------------------------------- PNG

  private val PngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (0 until 8).forall(i => b(i) == PngSig(i))

  private def crc32(typ: Array[Byte], data: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32()
    c.update(typ); c.update(data)
    c.getValue
  }

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    require(t.length == 4, s"bad chunk type $typ")
    val out = new ByteArrayOutputStream(data.length + 12)
    val n = data.length
    out.write((n >> 24) & 0xff); out.write((n >> 16) & 0xff)
    out.write((n >> 8) & 0xff); out.write(n & 0xff)
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val c = crc32(t, data)
    out.write(((c >> 24) & 0xff).toInt); out.write(((c >> 16) & 0xff).toInt)
    out.write(((c >> 8) & 0xff).toInt); out.write((c & 0xff).toInt)
    out.toByteArray
  }

  /** Insert a chunk immediately after IHDR (spec-legal position for
    * every ancillary chunk we mint).
    */
  private def pngInsert(png: Array[Byte], chunk: Array[Byte]): Array[Byte] = {
    require(isPng(png), "not a PNG (bad signature)")
    require(png.length >= 33 && png(12) == 'I' && png(13) == 'H',
      "PNG first chunk is not IHDR")
    val ihdrEnd = 8 + 12 + 13 // sig + (len,type,crc) + IHDR payload
    val out = new ByteArrayOutputStream(png.length + chunk.length)
    out.write(png, 0, ihdrEnd)
    out.write(chunk, 0, chunk.length)
    out.write(png, ihdrEnd, png.length - ihdrEnd)
    out.toByteArray
  }

  def pngWithText(png: Array[Byte], keyword: String, text: String): Array[Byte] =
    pngInsert(png, pngChunk("tEXt",
      keyword.getBytes("ISO-8859-1") ++ Array[Byte](0) ++
        text.getBytes("ISO-8859-1")))

  def pngWithIccp(png: Array[Byte], name: String,
      profile: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(profile); d.finish()
    val buf = new Array[Byte](profile.length * 2 + 64)
    val n = d.deflate(buf)
    d.end()
    pngInsert(png, pngChunk("iCCP",
      name.getBytes("ISO-8859-1") ++ Array[Byte](0, 0) ++ buf.take(n)))
  }

  def pngWithExif(png: Array[Byte], orientation: Int): Array[Byte] =
    pngInsert(png, pngChunk("eXIf", tiffOrientation(orientation)))

  private val PngMetaTypes = Set("tEXt", "zTXt", "iTXt", "iCCP", "eXIf")

  private def pngWalk(b: Array[Byte])(
      keep: String => Boolean): (Array[Byte], Long, Boolean, Boolean, Long) = {
    require(isPng(b), "not a PNG (bad signature)")
    val out = new ByteArrayOutputStream(b.length)
    out.write(b, 0, 8)
    var p = 8
    var orientation = -1L
    var hasIcc = false
    var hasExif = false
    var nText = 0L
    while (p + 8 <= b.length) {
      val len = (((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)).toInt
      val typ = new String(b, p + 4, 4, "US-ASCII")
      require(p + 12 + len <= b.length, s"PNG chunk $typ truncated")
      typ match {
        case "tEXt" | "zTXt" | "iTXt" => nText += 1L
        case "iCCP" => hasIcc = true
        case "eXIf" =>
          hasExif = true
          orientation = tiffReadOrientation(b, p + 8, len)
        case _ => ()
      }
      if (keep(typ)) out.write(b, p, 12 + len)
      p += 12 + len
      if (typ == "IEND") {
        require(p == b.length, "trailing bytes after PNG IEND")
        return (out.toByteArray, orientation, hasExif, hasIcc, nText)
      }
    }
    throw new IllegalArgumentException("PNG stream ended before IEND")
  }

  def stripPng(b: Array[Byte]): Array[Byte] =
    pngWalk(b)(t => !PngMetaTypes.contains(t))._1

  // ----------------------------------------------------------------- GIF

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** Offset of the first block after header + logical screen descriptor
    * + global color table.
    */
  private def gifBodyStart(b: Array[Byte]): Int = {
    require(isGif(b), "not a GIF (bad signature)")
    require(b.length >= 13, "GIF truncated before screen descriptor")
    val packed = b(10) & 0xff
    val gctSize = if ((packed & 0x80) != 0) 3 * (1 << ((packed & 7) + 1)) else 0
    13 + gctSize
  }

  private def gifSubBlocksEnd(b: Array[Byte], start: Int): Int = {
    var p = start
    while (true) {
      require(p < b.length, "GIF sub-blocks truncated")
      val n = b(p) & 0xff
      if (n == 0) return p + 1
      p += 1 + n
    }
    -1 // unreachable
  }

  def gifWithComment(gif: Array[Byte], text: String): Array[Byte] = {
    val body = gifBodyStart(gif)
    val t = text.getBytes("US-ASCII")
    require(t.length >= 1 && t.length <= 255, "GIF comment must be 1..255 bytes")
    val out = new ByteArrayOutputStream(gif.length + t.length + 4)
    out.write(gif, 0, body)
    out.write(0x21); out.write(0xfe); out.write(t.length)
    out.write(t, 0, t.length)
    out.write(0)
    out.write(gif, body, gif.length - body)
    out.toByteArray
  }

  private def gifWalk(b: Array[Byte])(
      keepComments: Boolean): (Array[Byte], Long) = {
    val body = gifBodyStart(b)
    val out = new ByteArrayOutputStream(b.length)
    out.write(b, 0, body)
    var p = body
    var nText = 0L
    while (p < b.length) {
      (b(p) & 0xff) match {
        case 0x3b => // trailer
          out.write(b, p, b.length - p)
          return (out.toByteArray, nText)
        case 0x21 =>
          require(p + 1 < b.length, "GIF extension truncated")
          val label = b(p + 1) & 0xff
          val end = gifSubBlocksEnd(b, p + 2)
          if (label == 0xfe) {
            nText += 1L
            if (keepComments) out.write(b, p, end - p)
          } else out.write(b, p, end - p)
          p = end
        case 0x2c =>
          require(p + 10 <= b.length, "GIF image descriptor truncated")
          val packed = b(p + 9) & 0xff
          val lct = if ((packed & 0x80) != 0) 3 * (1 << ((packed & 7) + 1)) else 0
          val dataStart = p + 10 + lct + 1 // + LZW min-code-size byte
          val end = gifSubBlocksEnd(b, dataStart)
          out.write(b, p, end - p)
          p = end
        case other =>
          throw new IllegalArgumentException(
            f"unknown GIF block 0x$other%02x at $p")
      }
    }
    throw new IllegalArgumentException("GIF stream ended before trailer")
  }

  def stripGif(b: Array[Byte]): Array[Byte] = gifWalk(b)(keepComments = false)._1

  // ------------------------------------------------------------- surface

  /** Extended probe: dimensions (via [[ImageProbe]]) + metadata. */
  def probeMeta(bytes: Array[Byte]): MetaInfo = {
    val dims = ImageProbe.probe(bytes)
    dims.format match {
      case "jpg" =>
        val (o, e, icc, t) = jpegMeta(bytes)
        MetaInfo("jpg", dims.width, dims.height, o, e, icc, t)
      case "png" =>
        val (_, o, e, icc, t) = pngWalk(bytes)(_ => false)
        MetaInfo("png", dims.width, dims.height, o, e, icc, t)
      case "gif" =>
        val (_, t) = gifWalk(bytes)(keepComments = true)
        MetaInfo("gif", dims.width, dims.height, -1L, hasExif = false,
          hasIcc = false, nText = t)
      case "bmp" =>
        MetaInfo("bmp", dims.width, dims.height, -1L, hasExif = false,
          hasIcc = false, nText = 0L)
      case other =>
        throw new IllegalArgumentException(s"unsupported format $other")
    }
  }

  /** Privacy scrub: remove every metadata segment the probe reports,
    * re-encoding nothing.
    */
  def strip(bytes: Array[Byte]): Array[Byte] =
    ImageProbe.probe(bytes).format match {
      case "jpg" => stripJpeg(bytes)
      case "png" => stripPng(bytes)
      case "gif" => stripGif(bytes)
      case "bmp" => bytes
      case other =>
        throw new IllegalArgumentException(s"unsupported format $other")
    }
}
