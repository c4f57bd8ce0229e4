package graft.pipeline

import java.io.ByteArrayOutputStream
import java.security.MessageDigest

/** S2 — pure-JVM FLAC decode from the public container spec (RFC 9639):
  * CONSTANT / VERBATIM / FIXED order 0–4 / LPC order 1–32 subframes
  * with Rice-coded residuals (both 4- and 5-bit parameter widths,
  * escape partitions), all stereo decorrelation modes (independent,
  * left/side, right/side, mid/side), wasted-bits, and frame
  * CRC-8/CRC-16 verification — the complete subframe surface real
  * encoders emit. Anything outside it (reserved codes, corrupt frames)
  * throws → the S10 failed-status path, exactly like any other
  * undecodable payload. Reference call sites that read FLAC:
  * `modules/separation_filter.py:101` (librosa load),
  * `modules/models/utils.py:11-16` (format glob).
  *
  * The [[encode]] dual (mono 16-bit, CONSTANT/FIXED-order-2 subframes,
  * single-partition Rice residuals, correct CRCs and STREAMINFO MD5) is
  * the test-fixture generator: decode(encode(x)) == x bit-exactly, and
  * the decoded stream's MD5 must equal the STREAMINFO golden checksum.
  */
object FlacAudio {

  // ---------------------------------------------------------------- CRC

  /** CRC-8, polynomial 0x07, init 0 — frame-header checksum. */
  private[pipeline] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial 0x8005, init 0 — whole-frame checksum. */
  private[pipeline] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
        else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ---------------------------------------------------------- bit reader

  private final class BitReader(val bytes: Array[Byte], var bitPos: Long) {
    def bytePos: Int = (bitPos >> 3).toInt
    def atByteBoundary: Boolean = (bitPos & 7) == 0
    def alignToByte(): Unit = bitPos = (bitPos + 7) & ~7L
    def remainingBits: Long = bytes.length.toLong * 8 - bitPos

    def readBit(): Int = {
      val b = (bytes((bitPos >> 3).toInt) >> (7 - (bitPos & 7).toInt)) & 1
      bitPos += 1
      b
    }

    /** Up to 56 bits, MSB first, unsigned. */
    def readBits(n: Int): Long = {
      require(n >= 0 && n <= 56, s"readBits($n)")
      var out = 0L
      var left = n
      while (left > 0) {
        val byteI = (bitPos >> 3).toInt
        val bitI = (bitPos & 7).toInt
        val avail = 8 - bitI
        val take = math.min(avail, left)
        val chunk = ((bytes(byteI) & 0xff) >> (avail - take)) & ((1 << take) - 1)
        out = (out << take) | chunk
        bitPos += take
        left -= take
      }
      out
    }

    /** n-bit two's-complement signed read. */
    def readSigned(n: Int): Long = {
      val v = readBits(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }

    /** Count 0 bits until the terminating 1 (Rice quotient / unary). */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
  }

  // ---------------------------------------------------------- bit writer

  private final class BitWriter {
    private val buf = new ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0

    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nBits += 1
      if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
    }

    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >> i) & 1L).toInt); i -= 1 }
    }

    def alignToByte(): Unit = while (nBits != 0) writeBit(0)
    def toArray: Array[Byte] = { require(nBits == 0); buf.toByteArray }
    def size: Int = buf.size()
  }

  // ------------------------------------------------------------- tables

  /** Fixed-predictor coefficients for orders 0–4 (spec §9.2.5):
    * prediction of s[i] from s[i−1..i−order].
    */
  private def predictFixed(order: Int, s: Array[Long], i: Int): Long = order match {
    case 0 => 0L
    case 1 => s(i - 1)
    case 2 => 2 * s(i - 1) - s(i - 2)
    case 3 => 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
    case 4 => 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
    case _ => throw new IllegalArgumentException(s"fixed order $order")
  }

  private val SampleRates = Array(0, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000)

  // ------------------------------------------------------------- decode

  private final case class StreamInfo(sampleRate: Int, channels: Int,
      bps: Int, totalSamples: Long, md5: Array[Byte])

  private def parseStreamInfo(r: BitReader): StreamInfo = {
    r.readBits(16); r.readBits(16) // min/max blocksize
    r.readBits(24); r.readBits(24) // min/max framesize
    val sr = r.readBits(20).toInt
    val ch = r.readBits(3).toInt + 1
    val bps = r.readBits(5).toInt + 1
    val total = r.readBits(36)
    val md5 = new Array[Byte](16)
    var i = 0
    while (i < 16) { md5(i) = r.readBits(8).toByte; i += 1 }
    StreamInfo(sr, ch, bps, total, md5)
  }

  /** UTF-8-style coded frame/sample number (spec §9.1.5). */
  private def readCodedNumber(r: BitReader): Long = {
    val b0 = r.readBits(8).toInt
    var lead = 0
    while (lead < 8 && ((b0 << lead) & 0x80) != 0) lead += 1
    if (lead == 0) b0.toLong
    else {
      require(lead >= 2 && lead <= 7, s"bad coded-number lead byte $b0")
      var v = (b0 & (0x7f >> lead)).toLong
      var i = 1
      while (i < lead) {
        val c = r.readBits(8).toInt
        require((c & 0xc0) == 0x80, "bad coded-number continuation")
        v = (v << 6) | (c & 0x3f)
        i += 1
      }
      v
    }
  }

  /** One subframe → `n` samples at `bps` bits. */
  private def readSubframe(r: BitReader, n: Int, bps: Int): Array[Long] = {
    require(r.readBit() == 0, "subframe padding bit != 0")
    val tpe = r.readBits(6).toInt
    val wastedFlag = r.readBit()
    val wasted = if (wastedFlag == 1) r.readUnary() + 1 else 0
    val eff = bps - wasted
    val out = new Array[Long](n)
    tpe match {
      case 0 => // CONSTANT
        val v = r.readSigned(eff)
        java.util.Arrays.fill(out, v)
      case 1 => // VERBATIM
        var i = 0
        while (i < n) { out(i) = r.readSigned(eff); i += 1 }
      case t if t >= 8 && t <= 12 => // FIXED, order 0-4
        val order = t - 8
        var i = 0
        while (i < order) { out(i) = r.readSigned(eff); i += 1 }
        readResidual(r, n, order, out)
        i = order
        while (i < n) { out(i) += predictFixed(order, out, i); i += 1 }
      case t if t >= 32 => // LPC, order 1-32 (spec §9.2.6)
        val order = (t & 31) + 1
        var i = 0
        while (i < order) { out(i) = r.readSigned(eff); i += 1 }
        val precision = r.readBits(4).toInt + 1
        require(precision <= 15, "invalid qlp coefficient precision 0b1111")
        val shift = r.readSigned(5).toInt
        require(shift >= 0, s"negative LPC shift $shift")
        val coefs = Array.fill(order)(r.readSigned(precision))
        readResidual(r, n, order, out)
        i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j) * out(i - 1 - j); j += 1 }
          out(i) += acc >> shift // arithmetic shift per spec
          i += 1
        }
      case t =>
        throw new IllegalArgumentException(s"reserved subframe type $t")
    }
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) <<= wasted; i += 1 }
    }
    out
  }

  /** Rice-coded residual (spec §9.2.7), written into `out[order..n)`. */
  private def readResidual(r: BitReader, n: Int, order: Int, out: Array[Long]): Unit = {
    val method = r.readBits(2).toInt
    require(method <= 1, s"reserved residual method $method")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = r.readBits(4).toInt
    val nPart = 1 << po
    require(n % nPart == 0, s"blocksize $n not divisible into $nPart partitions")
    var idx = order
    var p = 0
    while (p < nPart) {
      val cnt = (n >> po) - (if (p == 0) order else 0)
      val param = r.readBits(pBits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < cnt) { out(idx) = if (raw == 0) 0L else r.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < cnt) {
          val q = r.readUnary()
          val v = (q.toLong << param) | r.readBits(param)
          out(idx) = (v >>> 1) ^ -(v & 1L) // zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }

  /** Decode a FLAC container to (sampleRate, mono float samples in
    * [−1, 1]); multi-channel is averaged to mono (the reference loads
    * `mono=True`). Throws on anything outside the supported subset —
    * callers route that to S10.
    */
  def decode(bytes: Array[Byte]): (Int, Array[Float]) = {
    require(bytes.length > 42 && bytes.startsWith("fLaC".getBytes), "not a FLAC stream")
    val r = new BitReader(bytes, 32L)
    // metadata blocks: first MUST be STREAMINFO
    var last = false
    var info: StreamInfo = null
    var first = true
    while (!last) {
      last = r.readBit() == 1
      val tpe = r.readBits(7).toInt
      val len = r.readBits(24).toInt
      if (first) {
        require(tpe == 0, s"first metadata block type $tpe != STREAMINFO")
        info = parseStreamInfo(r)
        first = false
      } else r.bitPos += len.toLong * 8
    }
    val nCh = info.channels
    val acc = Array.ofDim[Float](
      if (info.totalSamples > 0) info.totalSamples.toInt else 0)
    val dyn = if (info.totalSamples > 0) null else new scala.collection.mutable.ArrayBuffer[Float]()
    var got = 0L
    while ((info.totalSamples > 0 && got < info.totalSamples) ||
        (info.totalSamples == 0 && r.remainingBits >= 16)) {
      val frameStart = r.bytePos
      require(r.atByteBoundary, "frame not byte-aligned")
      val sync = r.readBits(14).toInt
      require(sync == 0x3ffe, f"bad frame sync $sync%x at byte $frameStart")
      require(r.readBit() == 0, "reserved bit != 0")
      r.readBit() // blocking strategy
      val bsCode = r.readBits(4).toInt
      val srCode = r.readBits(4).toInt
      val chCode = r.readBits(4).toInt
      val bpsCode = r.readBits(3).toInt
      require(r.readBit() == 0, "reserved bit != 0")
      readCodedNumber(r)
      val blockSize = bsCode match {
        case 0 => throw new IllegalArgumentException("reserved blocksize code 0")
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case c => 256 << (c - 8)
      }
      val sr = srCode match {
        case 0 => info.sampleRate
        case c if c <= 11 => SampleRates(c)
        case 12 => r.readBits(8).toInt * 1000
        case 13 => r.readBits(16).toInt
        case 14 => r.readBits(16).toInt * 10
        case _ => throw new IllegalArgumentException("invalid sample-rate code")
      }
      require(sr == info.sampleRate, "frame sample rate != STREAMINFO")
      val bps = bpsCode match {
        case 0 => info.bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case c => throw new IllegalArgumentException(s"reserved bps code $c")
      }
      val hdrCrc = crc8(bytes, frameStart, r.bytePos)
      require(r.readBits(8).toInt == hdrCrc, "frame header CRC-8 mismatch")
      // subframes
      val chans: Array[Array[Long]] = chCode match {
        case c if c <= 7 =>
          require(c + 1 == nCh, "frame channel count != STREAMINFO")
          Array.tabulate(nCh)(_ => readSubframe(r, blockSize, bps))
        case 8 => // left/side
          require(nCh == 2, s"stereo-decorrelated frame in a $nCh-channel stream")
          val l = readSubframe(r, blockSize, bps)
          val s = readSubframe(r, blockSize, bps + 1)
          Array(l, Array.tabulate(blockSize)(i => l(i) - s(i)))
        case 9 => // right/side
          require(nCh == 2, s"stereo-decorrelated frame in a $nCh-channel stream")
          val s = readSubframe(r, blockSize, bps + 1)
          val rr = readSubframe(r, blockSize, bps)
          Array(Array.tabulate(blockSize)(i => rr(i) + s(i)), rr)
        case 10 => // mid/side
          require(nCh == 2, s"stereo-decorrelated frame in a $nCh-channel stream")
          val m = readSubframe(r, blockSize, bps)
          val s = readSubframe(r, blockSize, bps + 1)
          Array.tabulate(2, blockSize) { (c, i) =>
            val mm = (m(i) << 1) | (s(i) & 1)
            if (c == 0) (mm + s(i)) >> 1 else (mm - s(i)) >> 1
          }
        case c => throw new IllegalArgumentException(s"reserved channel code $c")
      }
      r.alignToByte()
      val frameCrc = crc16(bytes, frameStart, r.bytePos)
      require(r.readBits(16).toInt == frameCrc, "frame CRC-16 mismatch")
      // average to mono, normalize
      val scale = (1L << (bps - 1)).toFloat * chans.length
      var i = 0
      while (i < blockSize) {
        var s = 0L
        var c = 0
        while (c < chans.length) { s += chans(c)(i); c += 1 }
        val v = s / scale
        if (dyn == null) {
          if (got + i < acc.length) acc((got + i).toInt) = v
        } else dyn += v
        i += 1
      }
      got += blockSize
    }
    (info.sampleRate, if (dyn == null) acc else dyn.toArray)
  }

  // ------------------------------------------------------------- encode

  /** Encode mono 16-bit samples: fixed 4096-sample blocks, CONSTANT
    * subframes for flat blocks, FIXED order-2 + single-partition Rice
    * otherwise — or, with `lpc = true`, quantized-LPC order-2 subframes
    * (coefs [3, −1], shift 1) exercising the spec's §9.2.6 coefficient/
    * shift arithmetic end-to-end. Correct CRC-8/CRC-16 and STREAMINFO
    * MD5 — the golden checksum [[decode]] is tested against.
    */
  def encode(sr: Int, samples: Array[Float], blockSize: Int = 4096,
             lpc: Boolean = false): Array[Byte] = {
    val pcm = samples.map { x =>
      val c = math.max(-1f, math.min(1f, x))
      math.round(c * 32767f).toLong
    }
    val md = MessageDigest.getInstance("MD5")
    pcm.foreach { s =>
      md.update((s & 0xff).toByte); md.update(((s >> 8) & 0xff).toByte)
    }
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes)
    // STREAMINFO: last-block flag set, type 0, length 34
    val si = new BitWriter
    si.writeBits(1, 1); si.writeBits(0, 7); si.writeBits(34, 24)
    si.writeBits(blockSize, 16); si.writeBits(blockSize, 16)
    si.writeBits(0, 24); si.writeBits(0, 24)
    si.writeBits(sr, 20); si.writeBits(0, 3) /* 1 ch */
    si.writeBits(15, 5) /* bps 16 */
    si.writeBits(pcm.length.toLong, 36)
    md.digest().foreach(b => si.writeBits(b & 0xffL, 8))
    out.write(si.toArray)

    var frameNo = 0L
    var off = 0
    while (off < pcm.length || (pcm.length == 0 && frameNo == 0)) {
      val n = math.min(blockSize, pcm.length - off)
      if (n <= 0) return out.toByteArray
      val blk = java.util.Arrays.copyOfRange(pcm, off, off + n)
      val w = new BitWriter
      w.writeBits(0x3ffe, 14) // sync
      w.writeBits(0, 1); w.writeBits(0, 1) // reserved, fixed blocksize
      w.writeBits(7, 4) // blocksize: 16-bit at end
      w.writeBits(0, 4) // sample rate: STREAMINFO
      w.writeBits(0, 4) // 1 channel
      w.writeBits(4, 3) // bps 16
      w.writeBits(0, 1)
      writeCodedNumber(w, frameNo)
      w.writeBits(n - 1L, 16)
      w.alignToByte()
      val hdr = w.toArray
      val w2 = new BitWriter
      hdr.foreach(b => w2.writeBits(b & 0xffL, 8))
      w2.writeBits(crc8(hdr, 0, hdr.length).toLong, 8)
      writeSubframe(w2, blk, lpc)
      w2.alignToByte()
      val body = w2.toArray
      out.write(body)
      val fcrc = crc16(body, 0, body.length)
      out.write((fcrc >> 8) & 0xff); out.write(fcrc & 0xff)
      off += n
      frameNo += 1
    }
    out.toByteArray
  }

  private def writeCodedNumber(w: BitWriter, v: Long): Unit =
    if (v < 0x80) w.writeBits(v, 8)
    else {
      // lead byte with k leading 1s + (k−1) continuation bytes of 6 bits
      var k = 2
      while (k <= 7 && v >= (1L << (6 * (k - 1) + (7 - k)))) k += 1
      val headBits = 7 - k
      w.writeBits((0xff << (8 - k)) & 0xff | ((v >> (6 * (k - 1))) & ((1 << headBits) - 1)), 8)
      var i = k - 2
      while (i >= 0) {
        w.writeBits(0x80L | ((v >> (6 * i)) & 0x3f), 8)
        i -= 1
      }
    }

  private def writeSubframe(w: BitWriter, blk: Array[Long],
                            lpc: Boolean = false): Unit = {
    val n = blk.length
    val constant = blk.forall(_ == blk(0))
    if (constant) {
      w.writeBits(0, 1); w.writeBits(0, 6); w.writeBits(0, 1)
      w.writeBits(blk(0) & 0xffff, 16)
      return
    }
    val order = math.min(2, n - 1)
    val useLpc = lpc && order == 2
    // header: 1 pad bit, 6 type bits, 1 wasted-bits flag. LPC order 2:
    // coefs [3, -1] at precision 5, shift 1 — pred = (3·s[i−1] − s[i−2]) >> 1
    w.writeBits(0, 1)
    w.writeBits(if (useLpc) 32 + (order - 1) else 8 + order, 6)
    w.writeBits(0, 1)
    var i = 0
    while (i < order) { w.writeBits(blk(i) & 0xffff, 16); i += 1 }
    if (useLpc) {
      w.writeBits(4, 4)  // precision − 1
      w.writeBits(1, 5)  // shift
      w.writeBits(3L & 0x1f, 5); w.writeBits(-1L & 0x1f, 5)
    }
    def predict(idx: Int): Long =
      if (useLpc) (3 * blk(idx - 1) - blk(idx - 2)) >> 1
      else predictFixed(order, blk, idx)
    val res = new Array[Long](n - order)
    i = order
    while (i < n) { res(i - order) = blk(i) - predict(i); i += 1 }
    // zigzag + single-partition Rice with a mean-based parameter
    val zig = res.map(v => (v << 1) ^ (v >> 63))
    val mean = if (zig.isEmpty) 0L else zig.sum / math.max(1, zig.length)
    var param = 0
    while (param < 14 && (1L << (param + 1)) < mean + 1) param += 1
    w.writeBits(0, 2) // 4-bit Rice
    w.writeBits(0, 4) // partition order 0
    w.writeBits(param.toLong, 4)
    zig.foreach { v =>
      val q = v >>> param
      require(q < (1L << 24), "rice quotient blow-up") // cannot happen at 16-bit order-2
      var j = 0L
      while (j < q) { w.writeBit(0); j += 1 }
      w.writeBit(1)
      w.writeBits(v & ((1L << param) - 1), param)
    }
  }
}
