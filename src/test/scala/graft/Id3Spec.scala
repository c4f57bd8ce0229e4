package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Id3

/** Pins the ID3v2 grammar: syncsafe integers (the 7-bit-per-byte
  * layout whose misread is the classic 8x size bug), the v2.3-plain
  * vs v2.4-syncsafe frame-size split, and the strip surface.
  */
class Id3Spec extends AnyFunSuite {

  test("syncsafe layout: 257 encodes as 00 00 02 01, round-trips, " +
    "high-bit bytes are loud") {
    assert(Id3.syncsafe(257).toSeq == Seq[Byte](0, 0, 2, 1))
    assert(Id3.syncsafe(0x0fffffff).toSeq ==
      Seq[Byte](0x7f, 0x7f, 0x7f, 0x7f))
    for (n <- Seq(0, 1, 127, 128, 16383, 16384, 1234567))
      assert(Id3.unsyncsafe(Id3.syncsafe(n), 0) == n)
    intercept[IllegalArgumentException](
      Id3.unsyncsafe(Array[Byte](0, 0, 0x80.toByte, 0), 0))
  }

  test("v2.4 vs v2.3 frame sizes differ on payloads >= 128 octets") {
    // a 130-char text -> payload 131: v4 writes syncsafe (0,0,1,3),
    // v3 writes plain BE (0,0,0,131) — a parser sharing one rule
    // would mis-walk one of them
    val long = "x" * 130
    val audio = "A".getBytes("US-ASCII")
    for (ver <- Seq(3, 4)) {
      val t = Id3.probe(Id3.mint(ver, Seq("TIT2" -> long), 0, audio))
      assert(t.versionMajor == ver && t.frames.head.size == 131
        && t.frames.head.text.contains(long), s"v$ver: $t")
    }
  }

  test("probe reads frames in order, strip returns the exact audio") {
    val audio = Array[Byte](1, 2, 3, 0x7f)
    val bytes = Id3.mint(4,
      Seq("TIT2" -> "T", "TPE1" -> "P", "TALB" -> "L"), 9, audio)
    val t = Id3.probe(bytes)
    assert(t.frames.map(_.id) == Seq("TIT2", "TPE1", "TALB"))
    assert(t.frames.flatMap(_.text) == Seq("T", "P", "L"))
    // header 10 + 3 frames x (10 + 1 enc + 1 char) + 9 padding = 55
    assert(t.size == 55)
    assert(Id3.strip(bytes).toSeq == audio.toSeq)
    // no tag -> pass-through
    assert(Id3.strip(audio).toSeq == audio.toSeq)
  }

  test("violations are loud: bad magic version, truncated frame") {
    intercept[IllegalArgumentException](
      Id3.probe("ID3junk".getBytes("US-ASCII")))
    val ok = Id3.mint(4, Seq("TIT2" -> "Title"), 0, Array[Byte]())
    val truncated = java.util.Arrays.copyOf(ok, ok.length - 3)
    intercept[IllegalArgumentException](Id3.probe(truncated))
  }
}
