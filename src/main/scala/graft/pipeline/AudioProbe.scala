package graft.pipeline

import java.io.ByteArrayInputStream

import javax.sound.sampled.AudioSystem

/** S3 — HEADER-LEVEL duration/rate probe for containers the JVM cannot
  * decode. The reference globs six formats and ffprobe-style metadata is
  * enough for the S3 duration gate and the S1 manifest stats — decoding
  * is only needed once a file passes them. All parsing here is from the
  * public container specs, pure JVM, reads only the first few hundred
  * bytes:
  *
  *  - WAV/AIFF/AU: `javax.sound` file-format headers (frame count /
  *    frame rate), no sample decode.
  *  - FLAC: the mandatory STREAMINFO block (sample rate 20 bits, total
  *    samples 36 bits) right after the `fLaC` magic.
  *  - MP3: skip an ID3v2 tag (syncsafe size, honoring the v2.4 footer
  *    flag), scan a bounded span for the first frame sync (padding
  *    before the first frame is legal), parse the frame header
  *    (version/layer/bitrate/samplerate tables). If the first frame
  *    carries a Xing/Info or VBRI header the frame count gives the
  *    EXACT duration (frames × samplesPerFrame / sr); otherwise the
  *    CBR estimate `bytes·8/bitrate` — exact for CBR files, a
  *    documented estimate for headerless VBR.
  *
  * The probe NEVER throws on foreign bytes — `None` routes the file to
  * the S10 failed-status path, same as decode failures.
  */
object AudioProbe {

  /** (container, sampleRate Hz, duration µs, exact?) — `exact = false`
    * marks the MP3 CBR estimate.
    */
  final case class Probe(container: String, sampleRate: Int,
      durationUs: Long, exact: Boolean)

  /** S3 pre-decode duration gate (`vad_multi.py:12-16,31`): header-probe
    * every payload and keep those with duration in [minSec, maxSec];
    * probe failure reports duration 0 (the reference's get_duration
    * failure contract), so any minSec > 0 drops undecodable files
    * before the expensive decode stage ever sees them.
    */
  def probeGate(ds: org.apache.spark.sql.Dataset[(String, Array[Byte])],
                minSec: Double, maxSec: Double = Double.MaxValue):
      org.apache.spark.sql.Dataset[(String, Array[Byte])] =
    ds.filter { x: (String, Array[Byte]) =>
      val durSec = probe(x._2).map(_.durationUs / 1e6d).getOrElse(0d)
      durSec >= minSec && durSec <= maxSec
    }

  def probe(bytes: Array[Byte]): Option[Probe] =
    if (bytes == null || bytes.length < 12) None
    else if (bytes.startsWith("fLaC".getBytes)) probeFlac(bytes)
    else if (bytes.startsWith("ID3".getBytes) || isMp3Sync(bytes, 0))
      probeMp3(bytes)
    else probeJavaSound(bytes)

  private def probeJavaSound(bytes: Array[Byte]): Option[Probe] =
    try {
      val f = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))
      val fmt = f.getFormat
      val frames = f.getFrameLength.toLong
      if (frames <= 0 || fmt.getFrameRate <= 0) None
      else Some(Probe(f.getType.toString.toLowerCase,
        math.round(fmt.getSampleRate),
        math.round(frames * 1e6d / fmt.getFrameRate),
        exact = true))
    } catch { case _: Exception => None }

  private def u(b: Byte): Int = b & 0xff

  /** STREAMINFO (spec §9.1): after the 4-byte magic, block header
    * (1 byte type+last, 3 bytes length = 34), then the 34-byte body:
    * sample rate = 20 bits at body offset 10, total samples = the low
    * 4 bits of byte 13 and bytes 14-17.
    */
  private def probeFlac(bytes: Array[Byte]): Option[Probe] = {
    if (bytes.length < 8 + 34) return None
    if ((u(bytes(4)) & 0x7f) != 0) return None // first block must be STREAMINFO
    val b = 8 // body start
    val sr = (u(bytes(b + 10)) << 12) | (u(bytes(b + 11)) << 4) | (u(bytes(b + 12)) >> 4)
    val total = ((u(bytes(b + 13)) & 0x0f).toLong << 32) |
      (u(bytes(b + 14)).toLong << 24) | (u(bytes(b + 15)).toLong << 16) |
      (u(bytes(b + 16)).toLong << 8) | u(bytes(b + 17)).toLong
    if (sr <= 0 || total <= 0) None
    else Some(Probe("flac", sr, total * 1000000L / sr, exact = true))
  }

  private def isMp3Sync(bytes: Array[Byte], off: Int): Boolean =
    bytes.length >= off + 4 && u(bytes(off)) == 0xff && (u(bytes(off + 1)) & 0xe0) == 0xe0

  // bitrate (kbps) and sample-rate tables for Layer III (public spec);
  // index 0 = "free", 15 = invalid
  private val brV1 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val brV2 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val srV1 = Array(44100, 48000, 32000)
  private val srV2 = Array(22050, 24000, 16000)
  private val srV25 = Array(11025, 12000, 8000)

  private def be32(bytes: Array[Byte], off: Int): Long =
    (u(bytes(off)).toLong << 24) | (u(bytes(off + 1)).toLong << 16) |
      (u(bytes(off + 2)).toLong << 8) | u(bytes(off + 3)).toLong

  private def tagAt(bytes: Array[Byte], off: Int, t: String): Boolean =
    off >= 0 && bytes.length >= off + 4 &&
      bytes(off) == t.charAt(0).toByte && bytes(off + 1) == t.charAt(1).toByte &&
      bytes(off + 2) == t.charAt(2).toByte && bytes(off + 3) == t.charAt(3).toByte

  /** Bytes scanned past the ID3 tag looking for the first frame sync —
    * bounded so foreign bytes can never turn the probe O(file).
    */
  private val SyncScanLimit = 8192

  /** A full frame-header validity check at `off`: sync + version/layer/
    * bitrate/samplerate fields all legal — a bare 0xFF,0xE0+ pair in
    * junk must NOT end the scan.
    */
  private def isValidFrameHeader(bytes: Array[Byte], off: Int): Boolean = {
    if (!isMp3Sync(bytes, off)) return false
    val h1 = u(bytes(off + 1)); val h2 = u(bytes(off + 2))
    val version = (h1 >> 3) & 0x3
    val layer = (h1 >> 1) & 0x3
    val brIdx = (h2 >> 4) & 0xf
    val srIdx = (h2 >> 2) & 0x3
    version != 1 && layer == 1 && brIdx != 0 && brIdx != 15 && srIdx != 3
  }

  private def probeMp3(bytes: Array[Byte]): Option[Probe] = {
    // ID3v2: "ID3" ver(2) flags(1) size(4 × 7-bit syncsafe); the v2.4
    // footer flag (byte 5 bit 4) adds a 10-byte footer after the tag
    val tagEnd =
      if (bytes.startsWith("ID3".getBytes) && bytes.length >= 10) {
        val sz = (u(bytes(6)) << 21) | (u(bytes(7)) << 14) |
          (u(bytes(8)) << 7) | u(bytes(9))
        10 + sz + (if ((u(bytes(5)) & 0x10) != 0) 10 else 0)
      } else 0
    // padding/junk before the first frame is legal — bounded forward
    // scan for the first FULLY VALID header, skipping false syncs
    val limit = math.min(bytes.length - 4, tagEnd + SyncScanLimit)
    var start = tagEnd
    while (start <= limit && !isValidFrameHeader(bytes, start)) start += 1
    if (start > limit) return None
    val h1 = u(bytes(start + 1)); val h2 = u(bytes(start + 2))
    val version = (h1 >> 3) & 0x3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    val brIdx = (h2 >> 4) & 0xf
    val srIdx = (h2 >> 2) & 0x3
    val kbps = if (version == 3) brV1(brIdx) else brV2(brIdx)
    val sr = version match {
      case 3 => srV1(srIdx)
      case 2 => srV2(srIdx)
      case _ => srV25(srIdx)
    }
    // VBR headers in the first frame give an exact frame count.
    // Xing/Info sits after the side info (MPEG1: 17 mono / 32 stereo;
    // MPEG2/2.5: 9 / 17); VBRI always at header + 36.
    val mono = ((u(bytes(start + 3)) >> 6) & 0x3) == 3
    val sideInfo =
      if (version == 3) { if (mono) 17 else 32 } else { if (mono) 9 else 17 }
    val samplesPerFrame = if (version == 3) 1152L else 576L
    val xingOff = start + 4 + sideInfo
    val vbrFrames: Option[Long] =
      if (tagAt(bytes, xingOff, "Xing") || tagAt(bytes, xingOff, "Info")) {
        if (bytes.length >= xingOff + 12 && (be32(bytes, xingOff + 4) & 1L) != 0)
          Some(be32(bytes, xingOff + 8))
        else None
      } else if (tagAt(bytes, start + 36, "VBRI") && bytes.length >= start + 36 + 18)
        Some(be32(bytes, start + 36 + 14))
      else None
    // Encoder conventions disagree on whether the Xing/VBRI frame count
    // includes the header frame itself (LAME does, some others don't), so
    // "exact" carries a one-frame (~26 ms at 44.1 kHz) ambiguity. The
    // count is used as written — downstream gates operate at whole-second
    // granularity (`vad_multi.py` min/max duration), so one frame never
    // flips a decision.
    vbrFrames.filter(_ > 0) match {
      case Some(nf) =>
        Some(Probe("mp3", sr, nf * samplesPerFrame * 1000000L / sr, exact = true))
      case None =>
        val payload = (bytes.length - start).toLong
        Some(Probe("mp3", sr, payload * 8000000L / (kbps * 1000L), exact = false))
    }
  }
}
