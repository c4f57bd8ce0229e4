package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.ImageCodec

/** The real javax.imageio seam: lossless roundtrips are bit-exact,
  * lossy/structural facts hold, garbage fails loudly — the image twin
  * of the S2 audio codec roundtrip specs.
  */
class ImageCodecSpec extends AnyFunSuite {

  private def argbPattern(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      0xff000000 | (((x * 13 + y * 29) % 256) << 16) |
        (((x * 3 + y * 17) % 256) << 8) | ((x * 23 + y * 7) % 256)
    }

  test("PNG ARGB roundtrip is bit-exact") {
    val px = argbPattern(24, 16)
    val dec = ImageCodec.decode(ImageCodec.encodePng(24, 16, px))
    assert(dec.width == 24 && dec.height == 16)
    assert(dec.argb.sameElements(px))
  }

  test("BMP roundtrip is bit-exact for opaque RGB") {
    val px = argbPattern(19, 7) // non-multiple-of-4 width: BMP row padding path
    val dec = ImageCodec.decode(ImageCodec.encodeBmp(19, 7, px))
    assert(dec.width == 19 && dec.height == 7)
    assert(dec.argb.map(_ | 0xff000000).sameElements(px))
  }

  test("JPEG decodes with exact structural facts (dims) — pixels are lossy") {
    val px = argbPattern(24, 16)
    val dec = ImageCodec.decode(ImageCodec.encodeJpeg(24, 16, px))
    assert(dec.width == 24 && dec.height == 16)
  }

  test("16-bit gray PNG carries values past 8 bits exactly") {
    val samples = Array.tabulate(27 * 16)(i => (i * 97 + 31) % 456 + 40000 * (i % 2))
    val dec = ImageCodec.decodeGray16(ImageCodec.encodePng16(27, 16, samples))
    assert(dec.width == 27 && dec.height == 16)
    assert(dec.samples.sameElements(samples),
      "gray16 roundtrip must be lossless — values up to 65535")
  }

  test("garbage bytes fail loudly, never a silent null") {
    intercept[IllegalArgumentException] {
      ImageCodec.decode("definitely not an image".getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] {
      ImageCodec.decodeGray16(Array[Byte](1, 2, 3))
    }
    // a color PNG is not single-band: the gray16 path rejects it
    intercept[IllegalArgumentException] {
      ImageCodec.decodeGray16(ImageCodec.encodePng(4, 4, argbPattern(4, 4)))
    }
  }

  test("integer BT.601 gray is the identity on gray pixels and exact elsewhere") {
    assert(ImageCodec.gray(0xff000000 | (77 << 16) | (77 << 8) | 77) == 77)
    assert(ImageCodec.gray(0xffffffff) == 255)
    // (299*10 + 587*20 + 114*30) / 1000 = (2990 + 11740 + 3420) / 1000 = 18
    assert(ImageCodec.gray(0xff000000 | (10 << 16) | (20 << 8) | 30) == 18)
  }

  test("ImageProbe reads dims from header bytes alone for all four containers") {
    import graft.pipeline.ImageProbe
    val px = argbPattern(21, 9)
    assert(ImageProbe.probe(ImageCodec.encodePng(21, 9, px))
      == ImageProbe.ImageInfo("png", 21, 9))
    assert(ImageProbe.probe(ImageCodec.encodeBmp(21, 9, px))
      == ImageProbe.ImageInfo("bmp", 21, 9))
    assert(ImageProbe.probe(ImageCodec.encodeJpeg(21, 9, px))
      == ImageProbe.ImageInfo("jpg", 21, 9))
    assert(ImageProbe.probe(ImageCodec.encodeGif(21, 9, px))
      == ImageProbe.ImageInfo("gif", 21, 9))
    // gray16 PNG probes like any PNG — dims live in IHDR
    assert(ImageProbe.probe(ImageCodec.encodePng16(27, 16,
      Array.fill(27 * 16)(100))) == ImageProbe.ImageInfo("png", 27, 16))
    // loud failures: unknown container, JPEG truncated before SOF
    intercept[IllegalArgumentException] {
      ImageProbe.probe("not an image at all!!".getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] {
      ImageProbe.probe(ImageCodec.encodeJpeg(21, 9, px).take(6))
    }
  }

  test("cellMeans: exact means, and the identity on cell-constant rasters") {
    // 27x16 with 3x2 constant blocks -> the 8x9 grid is recovered exactly
    val grid = Array.tabulate(72)(i => (i * 53 + 11) % 456)
    val samples = Array.tabulate(27 * 16) { i =>
      val x = i % 27; val y = i / 27
      grid((y / 2) * 9 + (x / 3))
    }
    assert(ImageCodec.cellMeans(27, 16, samples, 9, 8).sameElements(grid))
    // non-constant cell: floor of the true mean (2x1 cells of [0,1] -> 0)
    val mixed = Array(0, 1, 3, 4)
    assert(ImageCodec.cellMeans(4, 1, mixed, 2, 1).sameElements(Array(0, 3)))
  }

  test("L200 ImageMeta: hand-built APP1 byte literal (big-endian MM " +
      "exporter layout) parses to the planted orientation") {
    import graft.pipeline.ImageMeta
    // Laid out the way a camera exporter writes it — Motorola byte
    // order, IFD0 at offset 8, TWO entries (orientation between other
    // tags), value left-justified in the 4-byte field — so a parser
    // that hardcodes II, a single entry, or the wrong value offset
    // cannot pass (the ONNX field-number lesson applied to TIFF).
    val tiffMM = Array[Int](
      'M', 'M', 0x00, 0x2a,             // byte order + magic 42
      0x00, 0x00, 0x00, 0x08,           // IFD0 at 8
      0x00, 0x02,                       // 2 entries
      0x01, 0x0f, 0x00, 0x02,           // tag 0x010F Make, ASCII
      0x00, 0x00, 0x00, 0x04,           // count 4
      'a', 'c', 'm', 0x00,              // inline value
      0x01, 0x12, 0x00, 0x03,           // tag 0x0112 Orientation, SHORT
      0x00, 0x00, 0x00, 0x01,           // count 1
      0x00, 0x06, 0x00, 0x00,           // value 6 (BE, left-justified)
      0x00, 0x00, 0x00, 0x00            // no next IFD
    ).map(_.toByte)
    assert(ImageMeta.tiffReadOrientation(tiffMM, 0, tiffMM.length) == 6L)
    // spliced into a real JPEG after SOI it must probe identically
    val jpeg = ImageCodec.encodeJpeg(24, 16, argbPattern(24, 16))
    val app1 = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiffMM
    val tagged = jpeg.take(2) ++
      Array[Byte](0xff.toByte, 0xe1.toByte,
        (((app1.length + 2) >> 8) & 0xff).toByte,
        ((app1.length + 2) & 0xff).toByte) ++
      app1 ++ jpeg.drop(2)
    val m = ImageMeta.probeMeta(tagged)
    assert(m.format == "jpg" && m.orientation == 6L && m.hasExif, s"got $m")
  }

  test("L200 ImageMeta: inject/probe/strip across PNG, JPEG, GIF; strip " +
      "preserves decoded pixels bit-exactly") {
    import graft.pipeline.ImageMeta
    val px = argbPattern(24, 16)
    // PNG: eXIf + two tEXt chunks (real CRC32s — ImageIO must still read it)
    val png0 = ImageCodec.encodePng(24, 16, px)
    val png = ImageMeta.pngWithText(
      ImageMeta.pngWithText(ImageMeta.pngWithExif(png0, 5),
        "Comment", "alpha"), "Author", "beta")
    val pm = ImageMeta.probeMeta(png)
    assert(pm.format == "png" && pm.orientation == 5L && pm.hasExif
      && !pm.hasIcc && pm.nText == 2L, s"got $pm")
    // the tagged file still decodes, identically to the original
    assert(ImageCodec.decode(png).argb.sameElements(px))
    val pngStripped = ImageMeta.strip(png)
    val pm2 = ImageMeta.probeMeta(pngStripped)
    assert(pm2.orientation == -1L && !pm2.hasExif && pm2.nText == 0L
      && pm2.width == 24L && pm2.height == 16L, s"got $pm2")
    assert(ImageCodec.decode(pngStripped).argb.sameElements(px))
    // iCCP presence round-trips through the probe and leaves on strip
    val pi = ImageMeta.probeMeta(
      ImageMeta.pngWithIccp(png0, "p", Array.tabulate(64)(_.toByte)))
    assert(pi.hasIcc, s"got $pi")
    // JPEG: APP1 + APP2 ICC + COM; strip keeps the entropy stream verbatim
    val jp0 = ImageCodec.encodeJpeg(24, 16, px)
    val jp = ImageMeta.jpegWithComment(
      ImageMeta.jpegWithIcc(ImageMeta.jpegWithExif(jp0, 3),
        Array.tabulate(16)(_.toByte)), "hello")
    val jm = ImageMeta.probeMeta(jp)
    assert(jm.format == "jpg" && jm.orientation == 3L && jm.hasExif
      && jm.hasIcc && jm.nText == 1L, s"got $jm")
    val jStripped = ImageMeta.strip(jp)
    val jm2 = ImageMeta.probeMeta(jStripped)
    assert(jm2.orientation == -1L && !jm2.hasExif && !jm2.hasIcc
      && jm2.nText == 0L, s"got $jm2")
    // pixels decode identically: the strip never re-encodes
    assert(ImageCodec.decode(jStripped).argb
      .sameElements(ImageCodec.decode(jp0).argb))
    // GIF: comment blocks count and strip back to the original bytes
    val gf0 = ImageCodec.encodeGif(24, 16, px)
    val gf = ImageMeta.gifWithComment(
      ImageMeta.gifWithComment(gf0, "one"), "two")
    val gm = ImageMeta.probeMeta(gf)
    assert(gm.format == "gif" && gm.nText == 2L && gm.orientation == -1L,
      s"got $gm")
    assert(ImageMeta.strip(gf).sameElements(gf0))
    // BMP: no metadata surface; strip is the identity
    val bm0 = ImageCodec.encodeBmp(24, 16, px)
    assert(ImageMeta.strip(bm0).sameElements(bm0))
    assert(ImageMeta.probeMeta(bm0).nText == 0L)
  }

  test("L200 ImageMeta: contract violations raise loudly") {
    import graft.pipeline.ImageMeta
    intercept[IllegalArgumentException] {
      ImageMeta.tiffOrientation(0) // orientation domain is 1..8
    }
    intercept[IllegalArgumentException] {
      // bad byte-order mark
      ImageMeta.tiffReadOrientation(Array[Byte]('X', 'X', 42, 0, 8, 0, 0, 0), 0, 8)
    }
    val px = argbPattern(8, 8)
    val png = ImageCodec.encodePng(8, 8, px)
    intercept[IllegalArgumentException] {
      ImageMeta.strip(png.take(20)) // truncated chunk walk
    }
  }
}
