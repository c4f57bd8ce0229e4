package graft.pipeline

/** WebP header-only probe — the modern web-image container the crawl
  * front door meets alongside PNG/JPEG (pipeline/ImageProbe.scala):
  * a RIFF file whose first chunk decides the flavor, each with its
  * own dimension encoding (Google WebP container + VP8/VP8L bitstream
  * specs, all public):
  *  - `VP8 ` lossy: 3-byte frame tag, 9D 01 2A start code, 14-bit
  *    width/height in 16-bit LE fields.
  *  - `VP8L` lossless: 0x2F signature, then width-1 / height-1 as
  *    14-bit fields packed into a 32-bit LE word.
  *  - `VP8X` extended: 4 flag bytes, then canvas width-1 / height-1
  *    as 24-bit LE fields (the alpha/EXIF/animation wrapper).
  * Header window only (the lazy-decode posture); corrupt structure
  * raises for the S10 tier.
  */
object WebpProbe {

  final case class WebpInfo(flavor: String, width: Long, height: Long,
      hasAlphaFlag: Boolean)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le24(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16)
  private def le32(b: Array[Byte], o: Int): Long =
    le16(b, o).toLong | (le16(b, o + 2).toLong << 16)

  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def probe(bytes: Array[Byte]): WebpInfo = {
    require(bytes.length >= 26, "webp: truncated header")
    require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WEBP",
      "webp: not a RIFF/WEBP container")
    val riffSize = le32(bytes, 4)
    require(riffSize + 8 == bytes.length,
      s"webp: RIFF size $riffSize disagrees with file length " +
        s"${bytes.length}")
    tag(bytes, 12) match {
      case "VP8 " =>
        // payload at 20: 3-byte frame tag, start code, 16-bit LE dims
        require(bytes.length >= 30, "webp: truncated VP8 header")
        require((bytes(23) & 0xff) == 0x9d && (bytes(24) & 0xff) == 0x01
          && (bytes(25) & 0xff) == 0x2a, "webp: bad VP8 start code")
        WebpInfo("vp8", (le16(bytes, 26) & 0x3fff).toLong,
          (le16(bytes, 28) & 0x3fff).toLong, hasAlphaFlag = false)
      case "VP8L" =>
        require((bytes(20) & 0xff) == 0x2f, "webp: bad VP8L signature")
        val w = le32(bytes, 21)
        WebpInfo("vp8l", (w & 0x3fff) + 1, ((w >> 14) & 0x3fff) + 1,
          hasAlphaFlag = ((w >> 28) & 1) == 1)
      case "VP8X" =>
        require(bytes.length >= 30, "webp: truncated VP8X header")
        WebpInfo("vp8x", le24(bytes, 24).toLong + 1,
          le24(bytes, 27).toLong + 1,
          hasAlphaFlag = ((bytes(20) >> 4) & 1) == 1)
      case t => throw new IllegalArgumentException(
        s"webp: first chunk '$t' outside the bounded grammar")
    }
  }

  /** Mint a probe-valid WebP header (fixture dual of [[probe]]) for
    * any of the three flavors; payload beyond the header window is a
    * deterministic stub.
    */
  def mint(flavor: String, width: Long, height: Long,
      alpha: Boolean): Array[Byte] = {
    require(width >= 1 && width <= 0x4000 && height >= 1 && height <= 0x4000,
      "webp: dims out of 14-bit range")
    val body: Array[Byte] = flavor match {
      case "vp8" =>
        val chunk = new Array[Byte](10)
        chunk(3) = 0x9d.toByte; chunk(4) = 0x01; chunk(5) = 0x2a
        chunk(6) = (width & 0xff).toByte
        chunk(7) = ((width >> 8) & 0x3f).toByte
        chunk(8) = (height & 0xff).toByte
        chunk(9) = ((height >> 8) & 0x3f).toByte
        riffChunk("VP8 ", chunk)
      case "vp8l" =>
        val w = (width - 1) | ((height - 1) << 14) |
          (if (alpha) 1L << 28 else 0L)
        riffChunk("VP8L", Array(0x2f.toByte, (w & 0xff).toByte,
          ((w >> 8) & 0xff).toByte, ((w >> 16) & 0xff).toByte,
          ((w >> 24) & 0xff).toByte))
      case "vp8x" =>
        val chunk = new Array[Byte](10)
        if (alpha) chunk(0) = 0x10
        chunk(4) = ((width - 1) & 0xff).toByte
        chunk(5) = (((width - 1) >> 8) & 0xff).toByte
        chunk(6) = (((width - 1) >> 16) & 0xff).toByte
        chunk(7) = ((height - 1) & 0xff).toByte
        chunk(8) = (((height - 1) >> 8) & 0xff).toByte
        chunk(9) = (((height - 1) >> 16) & 0xff).toByte
        riffChunk("VP8X", chunk)
      case f => throw new IllegalArgumentException(s"webp: flavor $f")
    }
    val out = new Array[Byte](12 + body.length)
    "RIFF".getBytes.copyToArray(out, 0)
    val sz = 4L + body.length
    out(4) = (sz & 0xff).toByte; out(5) = ((sz >> 8) & 0xff).toByte
    out(6) = ((sz >> 16) & 0xff).toByte; out(7) = ((sz >> 24) & 0xff).toByte
    "WEBP".getBytes.copyToArray(out, 8)
    body.copyToArray(out, 12)
    out
  }

  private def riffChunk(t: String, payload: Array[Byte]): Array[Byte] = {
    val padded = payload.length + (payload.length & 1) // RIFF even pad
    val out = new Array[Byte](8 + padded)
    t.getBytes.copyToArray(out, 0)
    out(4) = (payload.length & 0xff).toByte
    out(5) = ((payload.length >> 8) & 0xff).toByte
    out(6) = ((payload.length >> 16) & 0xff).toByte
    out(7) = ((payload.length >> 24) & 0xff).toByte
    payload.copyToArray(out, 8)
    out
  }
}
