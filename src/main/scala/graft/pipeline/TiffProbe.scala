package graft.pipeline

/** TIFF 6.0 header-only probe + GPS privacy strip — the remaining
  * classic image container next to the PNG/GIF/BMP/JPEG probes
  * (pipeline/ImageProbe.scala): scanned-document corpora and camera
  * originals ship as TIFF, and the format's IFD tag walk is also the
  * grammar EXIF embeds in JPEG. Pure-JVM, spec-only (Adobe TIFF 6.0):
  * byte-order mark `II`/`MM`, magic 42, a chain of IFDs of 12-byte
  * entries (tag, type, count, value-or-offset). The probe reads the
  * catalog only (no strip/tile payloads — the lazy-decode posture);
  * corrupt structure raises for the S10 tier. The scrub removes the
  * GPS IFD pointer (tag 0x8825) — the location-privacy leak a
  * training corpus must drop — by rebuilding the IFD without it, the
  * L200 EXIF-strip posture on the TIFF container itself.
  */
object TiffProbe {

  final case class TiffInfo(bigEndian: Boolean, width: Long, height: Long,
      bitsPerSample: Long, orientation: Long, nTags: Long,
      hasGps: Boolean, hasExif: Boolean)

  private def u16(b: Array[Byte], o: Int, be: Boolean): Int =
    if (be) ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    else (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], o: Int, be: Boolean): Long =
    if (be) ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    else (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** SHORT (3) and LONG (4) inline values — the only types the probe's
    * tags legally carry with count 1.
    */
  private def inlineVal(b: Array[Byte], entry: Int, be: Boolean): Long = {
    val typ = u16(b, entry + 2, be)
    val cnt = u32(b, entry + 4, be)
    require(cnt == 1, s"tiff: tag with count $cnt outside the probe grammar")
    typ match {
      case 3 => u16(b, entry + 8, be).toLong
      case 4 => u32(b, entry + 8, be)
      case t => throw new IllegalArgumentException(
        s"tiff: tag type $t outside the probe grammar")
    }
  }

  def probe(bytes: Array[Byte]): TiffInfo = {
    require(bytes.length >= 8, "tiff: truncated header")
    val be = (bytes(0), bytes(1)) match {
      case ('M', 'M') => true
      case ('I', 'I') => false
      case _ => throw new IllegalArgumentException(
        "tiff: bad byte-order mark")
    }
    require(u16(bytes, 2, be) == 42, "tiff: magic is not 42")
    val ifd = u32(bytes, 4, be)
    require(ifd >= 8 && ifd + 2 <= bytes.length, "tiff: IFD offset out of range")
    val n = u16(bytes, ifd.toInt, be)
    require(ifd + 2 + 12L * n + 4 <= bytes.length, "tiff: truncated IFD")
    var width = -1L; var height = -1L; var bps = 1L; var orient = 1L
    var gps = false; var exif = false
    var i = 0
    var prevTag = -1
    while (i < n) {
      val e = ifd.toInt + 2 + 12 * i
      val tag = u16(bytes, e, be)
      require(tag > prevTag,
        s"tiff: IFD tags not strictly ascending at tag $tag") // spec §2
      prevTag = tag
      tag match {
        case 256    => width = inlineVal(bytes, e, be)
        case 257    => height = inlineVal(bytes, e, be)
        case 258    => bps = inlineVal(bytes, e, be)
        case 274    => orient = inlineVal(bytes, e, be)
        case 0x8769 => exif = true
        case 0x8825 => gps = true
        case _      => ()
      }
      i += 1
    }
    require(width > 0 && height > 0,
      "tiff: missing ImageWidth/ImageLength")
    TiffInfo(be, width, height, bps, orient, n.toLong, gps, exif)
  }

  /** TIFF 6.0 §2 field-type byte widths (1=BYTE … 12=DOUBLE); used to
    * size out-of-line GPS values so the scrub can zero them.
    */
  private val typeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8,
    6 -> 1, 7 -> 1, 8 -> 2, 9 -> 4, 10 -> 8, 11 -> 4, 12 -> 8)

  /** Rebuild the TIFF with GPS (0x8825) entries dropped from the
    * first IFD — offsets into the data area are preserved because the
    * IFD is rebuilt IN PLACE (entries compacted, count reduced, the
    * freed tail padded): nothing else in the file moves. The GPS
    * sub-IFD itself is also EXCISED, not just unlinked: its 12-byte
    * entries, next pointer, and every out-of-line value (RATIONAL
    * lat/lon payloads live outside the 4-byte value field) are
    * zeroed, so the coordinates are unrecoverable by a byte scan —
    * dropping only the pointer would leave the privacy leak intact.
    */
  def stripGps(bytes: Array[Byte]): Array[Byte] = {
    val info = probe(bytes)
    if (!info.hasGps) return bytes
    val be = info.bigEndian
    val out = bytes.clone()
    val ifd = u32(bytes, 4, be).toInt
    val n = u16(bytes, ifd, be)
    // zero the GPS sub-IFD region + its out-of-line values first,
    // while the pointer entry is still in place to locate it
    val gpsEntry = (0 until n).map(i => ifd + 2 + 12 * i)
      .find(e => u16(bytes, e, be) == 0x8825).get
    val gpsOff = inlineVal(bytes, gpsEntry, be).toInt
    require(gpsOff >= 8 && gpsOff + 2 <= bytes.length,
      "tiff: GPS IFD offset out of range")
    val gn = u16(bytes, gpsOff, be)
    require(gpsOff + 2 + 12L * gn + 4 <= bytes.length,
      "tiff: truncated GPS IFD")
    (0 until gn).foreach { i =>
      val e = gpsOff + 2 + 12 * i
      val typ = u16(bytes, e + 2, be)
      val cnt = u32(bytes, e + 4, be)
      val sz = typeSize.getOrElse(typ, throw new IllegalArgumentException(
        s"tiff: GPS tag type $typ outside the grammar")) * cnt
      if (sz > 4) { // value is out of line — zero its payload region
        val vo = u32(bytes, e + 8, be)
        require(vo >= 8 && vo + sz <= bytes.length,
          "tiff: GPS value offset out of range")
        java.util.Arrays.fill(out, vo.toInt, (vo + sz).toInt, 0.toByte)
      }
    }
    java.util.Arrays.fill(out, gpsOff, gpsOff + 2 + 12 * gn + 4, 0.toByte)
    val kept = (0 until n).filter { i =>
      u16(bytes, ifd + 2 + 12 * i, be) != 0x8825
    }
    def w16(o: Int, v: Int): Unit =
      if (be) { out(o) = (v >> 8).toByte; out(o + 1) = v.toByte }
      else { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    w16(ifd, kept.size)
    kept.zipWithIndex.foreach { case (src, dst) =>
      System.arraycopy(bytes, ifd + 2 + 12 * src, out, ifd + 2 + 12 * dst, 12)
    }
    // next-IFD pointer moves up; freed bytes zeroed
    System.arraycopy(bytes, ifd + 2 + 12 * n, out, ifd + 2 + 12 * kept.size, 4)
    java.util.Arrays.fill(out, ifd + 2 + 12 * kept.size + 4,
      ifd + 2 + 12 * n + 4, 0.toByte)
    out
  }

  /** The GPS latitude written by [[mint]] — three non-zero RATIONALs
    * (deg/min/milli-sec) whose bytes a strip test can assert vanish.
    */
  val MintLat: Seq[(Long, Long)] = Seq((37L, 1L), (46L, 1L), (30123L, 1000L))

  /** Mint a minimal single-IFD TIFF (fixture dual of [[probe]]):
    * inline SHORT/LONG tags only, strictly ascending, optional EXIF
    * pointer (to an empty but structurally valid stub IFD) and GPS
    * pointer to a REAL GPS sub-IFD carrying [[MintLat]] — non-zero
    * coordinate bytes, partly out-of-line, so a scrub test proves
    * the payload (not just the pointer) is gone after [[stripGps]].
    */
  def mint(width: Long, height: Long, bps: Long, orientation: Long,
      withExif: Boolean, withGps: Boolean, bigEndian: Boolean): Array[Byte] = {
    val tags = Seq(
      (256, 4, width), (257, 4, height), (258, 3, bps),
      (274, 3, orientation)) ++
      (if (withExif) Seq((0x8769, 4, 0L)) else Nil) ++
      (if (withGps) Seq((0x8825, 4, 0L)) else Nil)
    val n = tags.size
    val exifOff = 8 + 2 + 12 * n + 4
    val exifSize = if (withExif) 6 else 0 // count 0 + next 0
    val gpsOff = exifOff + exifSize
    val gpsSize = if (withGps) 2 + 2 * 12 + 4 else 0 // 2 entries
    val latOff = gpsOff + gpsSize
    val latSize = if (withGps) 24 else 0 // 3 out-of-line RATIONALs
    val out = new Array[Byte](latOff + latSize)
    def w16(o: Int, v: Int): Unit =
      if (bigEndian) { out(o) = (v >> 8).toByte; out(o + 1) = v.toByte }
      else { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def w32(o: Int, v: Long): Unit =
      if (bigEndian) {
        out(o) = (v >> 24).toByte; out(o + 1) = (v >> 16).toByte
        out(o + 2) = (v >> 8).toByte; out(o + 3) = v.toByte
      } else {
        out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
        out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
      }
    out(0) = (if (bigEndian) 'M' else 'I').toByte
    out(1) = out(0)
    w16(2, 42)
    w32(4, 8L)
    w16(8, n)
    tags.zipWithIndex.foreach { case ((tag, typ, v), i) =>
      val e = 10 + 12 * i
      w16(e, tag); w16(e + 2, typ); w32(e + 4, 1L)
      val value = tag match {
        case 0x8769 => exifOff.toLong
        case 0x8825 => gpsOff.toLong
        case _      => v
      }
      if (typ == 3) w16(e + 8, value.toInt) else w32(e + 8, value)
    }
    w32(10 + 12 * n, 0L) // next-IFD: none
    // EXIF stub IFD: 0 entries + next 0 — already zeroed
    if (withGps) {
      w16(gpsOff, 2)
      // entry 0: GPSVersionID (tag 0), BYTE x4, inline, raw byte order
      w16(gpsOff + 2, 0); w16(gpsOff + 4, 1); w32(gpsOff + 6, 4L)
      out(gpsOff + 10) = 2; out(gpsOff + 11) = 3
      // entry 1: GPSLatitude (tag 2), RATIONAL x3, out-of-line
      w16(gpsOff + 14, 2); w16(gpsOff + 16, 5); w32(gpsOff + 18, 3L)
      w32(gpsOff + 22, latOff.toLong)
      w32(gpsOff + 26, 0L) // next-IFD: none
      MintLat.zipWithIndex.foreach { case ((num, den), i) =>
        w32(latOff + 8 * i, num); w32(latOff + 8 * i + 4, den)
      }
    }
    out
  }
}
