package graft.pipeline

/** Header-only image dimension probe — the image twin of the S3 audio
  * duration probe (`AudioProbe`): read width/height/format from the
  * container header bytes WITHOUT decoding any raster, the check a
  * 100 TB ingest runs on every payload before deciding what to decode
  * at all (and the only touch a resize planner needs). Pure byte
  * parsing from the public container specs:
  *
  *  - PNG (ISO 15948): 8-byte signature, then the IHDR chunk's
  *    big-endian width/height at offsets 16/20.
  *  - BMP (Windows BITMAPINFOHEADER): "BM", little-endian int32
  *    width/height at offsets 18/22 (height may be negative =
  *    top-down row order; magnitude is the pixel height).
  *  - GIF (87a/89a): little-endian uint16 logical-screen dims at 6/8.
  *  - JPEG (ISO 10918 JFIF stream): walk the FF-marker segments to the
  *    first frame header (SOF0..15 minus DHT/JPG/DAC), whose payload
  *    carries big-endian height/width after the precision byte.
  *
  * Every parse failure throws loudly (truncated header, bad signature,
  * missing SOF) — never a guessed dimension.
  */
object ImageProbe {

  final case class ImageInfo(format: String, width: Long, height: Long)

  def probe(bytes: Array[Byte]): ImageInfo = {
    require(bytes.length >= 10, s"payload too short to probe (${bytes.length} bytes)")
    if (isPng(bytes)) probePng(bytes)
    else if (bytes(0) == 'B' && bytes(1) == 'M') probeBmp(bytes)
    else if (isGif(bytes)) probeGif(bytes)
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) probeJpeg(bytes)
    else throw new IllegalArgumentException(
      "unrecognized image container (not PNG/BMP/GIF/JPEG)")
  }

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (0 until 8).forall(i => b(i) == PngSig(i))

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def be32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  private def be16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

  private def le32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  private def probePng(b: Array[Byte]): ImageInfo = {
    require(b.length >= 24, "PNG truncated before IHDR")
    // first chunk must be IHDR (spec): length at 8, type at 12
    require(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R',
      "PNG first chunk is not IHDR")
    ImageInfo("png", be32(b, 16), be32(b, 20))
  }

  private def probeBmp(b: Array[Byte]): ImageInfo = {
    require(b.length >= 26, "BMP truncated before BITMAPINFOHEADER dims")
    val hdrSize = le32(b, 14)
    require(hdrSize >= 40, s"unsupported BMP header size $hdrSize (core header)")
    val w = le32(b, 18)
    val h = le32(b, 22) // negative = top-down; magnitude is the height
    require(w > 0 && h != 0, s"degenerate BMP dims $w x $h")
    ImageInfo("bmp", w.toLong, math.abs(h.toLong))
  }

  private def probeGif(b: Array[Byte]): ImageInfo = {
    require(b.length >= 10, "GIF truncated before screen descriptor")
    ImageInfo("gif", le16(b, 6).toLong, le16(b, 8).toLong)
  }

  private def probeJpeg(b: Array[Byte]): ImageInfo = {
    var p = 2
    while (p + 3 < b.length) {
      require((b(p) & 0xff) == 0xff, f"JPEG marker expected at $p, got 0x${b(p) & 0xff}%02x")
      var m = b(p + 1) & 0xff
      // fill bytes: FF may repeat before the marker id
      var q = p + 1
      while (m == 0xff && q + 1 < b.length) { q += 1; m = b(q) & 0xff }
      val seg = q + 1
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
        p = seg // standalone markers carry no length
      } else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        // SOF frame header: [len][precision][height][width]
        require(seg + 6 < b.length, "JPEG SOF truncated")
        return ImageInfo("jpg", be16(b, seg + 5).toLong, be16(b, seg + 3).toLong)
      } else {
        require(seg + 1 < b.length, "JPEG segment length truncated")
        val len = be16(b, seg)
        require(len >= 2, s"bad JPEG segment length $len")
        p = seg + len
      }
    }
    throw new IllegalArgumentException("JPEG stream ended before any SOF frame header")
  }
}
