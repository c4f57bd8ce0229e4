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
}
