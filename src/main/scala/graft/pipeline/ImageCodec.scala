package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real, pure-JVM image codecs via `javax.imageio` — the image twin of
  * the `javax.sound`/FLAC/MP3/Vorbis audio path (S2): PNG (8-bit ARGB
  * and 16-bit grayscale), BMP, GIF, JPEG and TIFF all decode with the
  * JDK's standard plugins, no external dependency. The reference
  * pipeline is audio-only, but its multimodal siblings (dHash near-dup
  * L111, shot detection L119) need decoded pixels; until round 9 those
  * ran on a clearly-marked deterministic stub
  * ([[graft.ops.Multimodal.decodeStub]], kept for the metadata-
  * plumbing oracle) — this object is the real seam.
  *
  * Exactness contract (what the oracle rows lean on): PNG and BMP are
  * lossless, so decode(encode(pixels)) == pixels bit-for-bit — proven
  * per-build by ImageCodecSpec and per-run by the mm_image_roundtrip
  * oracle, which recomputes the SYNTHESIS formula in SQL and matches
  * the decoded checksums exactly (the s2_codec_roundtrip pattern:
  * encoder dual mints the fixture, oracle recomputes the formula).
  * JPEG is lossy: only structural facts (dimensions) are exact.
  *
  * 16-bit grayscale PNG (`TYPE_USHORT_GRAY`) is the workhorse for the
  * exact-integer grid queries: sample values 0..65535 survive the
  * roundtrip unchanged, so grid formulas that exceed 8 bits (the dHash
  * fixture's 0..455 family spread) stay exact.
  *
  * Everything here is per-row kernel code called from `mapPartitions`
  * — images never touch the driver, and a corrupt payload fails LOUDLY
  * ([[decode]] throws on undecodable bytes; callers that want the S10
  * fault-isolation posture catch per-row and emit status columns).
  */
object ImageCodec {

  // ImageIO wraps byte-array streams in File{Cache}Image{In,Out}putStream
  // when useCache is on (the JDK default): every encode/decode creates,
  // writes and deletes a TEMP FILE. At 32 concurrent codec tasks that is
  // tens of thousands of filesystem round-trips per query (measured:
  // mm_image_shots 8.7 s -> ~1 s action at sf0.1). Memory-cached streams
  // produce bit-identical bytes; our payloads are tiny (< 100 KB).
  ImageIO.setUseCache(false)

  /** Decoded raster: `argb(y*width + x)` packed as 0xAARRGGBB, the
    * JDK's TYPE_INT_ARGB convention, row-major.
    */
  final case class DecodedImage(width: Int, height: Int, argb: Array[Int])

  /** Decoded 16-bit grayscale raster: `samples(y*width + x)` in
    * 0..65535, row-major.
    */
  final case class DecodedGray16(width: Int, height: Int, samples: Array[Int])

  /** Decode any ImageIO-supported payload (PNG/BMP/GIF/JPEG/TIFF) to
    * packed ARGB. Throws IllegalArgumentException on bytes no plugin
    * recognizes — the loud path; never a silent null.
    */
  def decode(bytes: Array[Byte]): DecodedImage = {
    val img = readImage(bytes)
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Int](w * h)
    // normalize any source color model through getRGB (the JDK's
    // documented conversion to default-sRGB packed ARGB)
    img.getRGB(0, 0, w, h, out, 0, w)
    DecodedImage(w, h, out)
  }

  /** Decode a 16-bit grayscale payload (PNG gray16) to raw raster
    * samples — `getRGB` would clamp to 8 bits, the raster keeps all 16.
    * Throws on undecodable bytes or non-single-band images.
    */
  def decodeGray16(bytes: Array[Byte]): DecodedGray16 = {
    val img = readImage(bytes)
    val raster = img.getRaster
    require(raster.getNumBands == 1,
      s"expected single-band grayscale, got ${raster.getNumBands} bands")
    val w = img.getWidth
    val h = img.getHeight
    val out = raster.getSamples(0, 0, w, h, 0, null: Array[Int])
    DecodedGray16(w, h, out)
  }

  private def readImage(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null,
      s"no ImageIO plugin decodes this payload (${bytes.length} bytes)")
    img
  }

  /** Encode packed-ARGB pixels as PNG (lossless — the roundtrip dual
    * of [[decode]]).
    */
  def encodePng(width: Int, height: Int, argb: Array[Int]): Array[Byte] =
    encodeArgb(width, height, argb, BufferedImage.TYPE_INT_ARGB, "png")

  /** Encode as BMP (lossless for opaque RGB; BMP has no alpha, so the
    * raster is 3-byte BGR and alpha is dropped).
    */
  def encodeBmp(width: Int, height: Int, argb: Array[Int]): Array[Byte] =
    encodeArgb(width, height, argb, BufferedImage.TYPE_3BYTE_BGR, "bmp")

  /** Encode as JPEG (LOSSY — structural facts only survive; pixel
    * oracles must not read through this).
    */
  def encodeJpeg(width: Int, height: Int, argb: Array[Int]): Array[Byte] =
    encodeArgb(width, height, argb, BufferedImage.TYPE_3BYTE_BGR, "jpg")

  /** Encode as GIF (palette-quantized — lossy for >256-color rasters;
    * structural facts are exact).
    */
  def encodeGif(width: Int, height: Int, argb: Array[Int]): Array[Byte] =
    encodeArgb(width, height, argb, BufferedImage.TYPE_INT_ARGB, "gif")

  private def encodeArgb(width: Int, height: Int, argb: Array[Int],
      imgType: Int, format: String): Array[Byte] = {
    require(argb.length == width * height,
      s"pixel buffer ${argb.length} != $width x $height")
    val img = new BufferedImage(width, height, imgType)
    img.setRGB(0, 0, width, height, argb, 0, width)
    writeImage(img, format)
  }

  /** Encode 16-bit grayscale samples (0..65535) as PNG gray16 —
    * lossless, the exact-integer image container the grid queries
    * roundtrip through.
    */
  def encodePng16(width: Int, height: Int, samples: Array[Int]): Array[Byte] = {
    require(samples.length == width * height,
      s"sample buffer ${samples.length} != $width x $height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_USHORT_GRAY)
    img.getRaster.setSamples(0, 0, width, height, 0, samples)
    writeImage(img, "png")
  }

  private def writeImage(img: BufferedImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ok = ImageIO.write(img, format, bos)
    require(ok, s"no ImageIO writer for format $format")
    bos.toByteArray
  }

  /** Integer ITU-R BT.601 luma in thousandths: (299 R + 587 G + 114 B)
    * / 1000, floor — exact, and the identity for gray pixels
    * (R = G = B = v → exactly v, since 1000 v / 1000).
    */
  def gray(argbPixel: Int): Int = {
    val r = (argbPixel >> 16) & 0xff
    val g = (argbPixel >> 8) & 0xff
    val b = argbPixel & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** `cols`×`rows` cell means over a row-major sample raster: cell
    * (cy, cx) covers x in [cx·W/cols, (cx+1)·W/cols) × y likewise
    * (integer-division boundaries — the standard partition), value =
    * floor(Σ samples / count). Exact; when W, H are multiples of
    * cols/rows and samples are cell-constant, the mean IS the sample —
    * the invariant the dHash grid roundtrip leans on. Output row-major
    * cy·cols + cx, matching the dHash 8×9 layout.
    */
  def cellMeans(width: Int, height: Int, samples: Array[Int],
      cols: Int, rows: Int): Array[Int] = {
    require(width >= cols && height >= rows,
      s"raster ${width}x$height too small for ${cols}x$rows grid")
    val out = new Array[Int](cols * rows)
    var cy = 0
    while (cy < rows) {
      val y0 = cy * height / rows
      val y1 = (cy + 1) * height / rows
      var cx = 0
      while (cx < cols) {
        val x0 = cx * width / cols
        val x1 = (cx + 1) * width / cols
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += samples(y * width + x); x += 1 }
          y += 1
        }
        out(cy * cols + cx) = (sum / ((x1 - x0).toLong * (y1 - y0))).toInt
        cx += 1
      }
      cy += 1
    }
    out
  }
}
