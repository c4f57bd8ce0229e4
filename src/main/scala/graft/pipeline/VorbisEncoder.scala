package graft.pipeline

import VorbisHeaders._

/** Minimal Ogg/Vorbis mono encoder — the fixture-minting dual of
  * [[VorbisAudio]] (the role [[Mp3Encoder]]/FlacAudio's encoder play
  * for their codecs). Vorbis is SELF-DESCRIBING, so the encoder ships
  * its own deliberately simple configuration in the setup header and
  * the decoder needs nothing beyond the spec machinery:
  *
  *  - one mode, blocksize0 = blocksize1 = 256 (symmetric windows only)
  *  - floor1 with ZERO partitions: the two mandatory endpoint values
  *    draw one flat dB line — the floor is a per-block amplitude
  *  - residue type 1 over the whole spectrum: one classification,
  *    5-level scalar quantization {−2..2} via a dim-2 VQ codebook
  *    (complete 25-entry tree), classbook dim 1
  *
  * A pure tone concentrates into few MDCT lines, so the 5-level
  * residue carries it cleanly (roundtrip correlation pinned in
  * VorbisSpec); broadband content is heavily quantized — these are
  * fixtures, not a production encoder.
  */
object VorbisEncoder {

  private val N = 256
  private val N2 = N / 2
  private val PartSize = 8
  private val ValueLevels = 5 // residue alphabet −2..2

  // classbook: dim 1, entries 2 (class 0 = silent partition, 1 = coded)
  private val ClassLengths = Array(1, 1)
  // value book: dim 2, 25 entries, complete tree (7×len4 + 18×len5)
  private val ValueLengths = Array.fill(25)(5).zipWithIndex.map {
    case (_, i) => if (i < 7) 4 else 5
  }

  /** Forward MDCT: X[k] = (4/n)·Σ_j x[j]·w[j]·cos(2π/n·(j+½+n/4)(k+½))
    * — the TDAC inverse of [[VorbisAudio.imdct]] under overlap-add:
    * Σ_k cos²(θ) = n/4 per fold, so 4/n makes the cascade unity
    * (pinned by the identity property in VorbisSpec).
    */
  private lazy val MdctCos: Array[Array[Double]] =
    Array.tabulate(N2, N)((k, j) =>
      math.cos(2 * math.Pi / N * (j + 0.5 + N / 4.0) * (k + 0.5)))

  def mdct(x: Array[Double], win: Array[Double]): Array[Double] = {
    val out = new Array[Double](N2)
    var k = 0
    while (k < N2) {
      val row = MdctCos(k)
      var acc = 0.0
      var j = 0
      while (j < N) {
        acc += x(j) * win(j) * row(j)
        j += 1
      }
      out(k) = acc * 4.0 / N
      k += 1
    }
    out
  }

  private def headerPackets(sr: Int): (Array[Byte], Array[Byte], Array[Byte]) = {
    // identification
    val ib = new BitWriter
    ib.write(1, 8); "vorbis".getBytes.foreach(c => ib.write(c, 8))
    ib.writeLong(0L, 32)
    ib.write(1, 8)
    ib.writeLong(sr.toLong, 32)
    ib.writeLong(0L, 32); ib.writeLong(0L, 32); ib.writeLong(0L, 32)
    ib.write(8, 4); ib.write(8, 4) // 256 / 256
    ib.write(1, 1)
    // comment
    val cb = new BitWriter
    cb.write(3, 8); "vorbis".getBytes.foreach(c => cb.write(c, 8))
    val vendor = "graft".getBytes
    cb.writeLong(vendor.length.toLong, 32)
    vendor.foreach(c => cb.write(c, 8))
    cb.writeLong(0L, 32) // no user comments
    cb.write(1, 1)
    // setup
    val sb = new BitWriter
    sb.write(5, 8); "vorbis".getBytes.foreach(c => sb.write(c, 8))
    sb.write(1, 8) // codebook_count - 1 = 1 → 2 books
    writeCodebook(sb, dim = 1, lengths = ClassLengths) // book 0: classbook
    writeCodebook(sb, dim = 2, lengths = ValueLengths, lookupType = 1,
      minVal = -2.0, delta = 1.0, valueBits = 3,
      mults = Array.tabulate(ValueLevels)(identity)) // book 1: values
    sb.write(0, 6); sb.write(0, 16) // one time transform, type 0
    sb.write(0, 6) // one floor
    sb.write(1, 16) // floor1
    sb.write(0, 5) // ZERO partitions → only the two endpoint values
    sb.write(0, 2) // multiplier - 1 → 1
    sb.write(7, 4) // rangebits (xList = [0, 128])
    sb.write(0, 6) // one residue
    sb.write(1, 16) // residue type 1
    sb.write(0, 24) // begin
    sb.write(N2, 24) // end
    sb.write(PartSize - 1, 24)
    sb.write(1, 6) // classifications - 1 = 1 → 2
    sb.write(0, 8) // classbook = book 0
    sb.write(0, 3); sb.write(0, 1) // class 0 cascade: nothing
    sb.write(1, 3); sb.write(0, 1) // class 1 cascade: pass 0 only
    sb.write(1, 8) // class 1 pass 0 book = book 1
    sb.write(0, 6) // one mapping
    sb.write(0, 16) // type 0
    sb.write(0, 1) // one submap
    sb.write(0, 1) // no coupling
    sb.write(0, 2) // reserved
    sb.write(0, 8); sb.write(0, 8); sb.write(0, 8) // time/floor/residue 0
    sb.write(0, 6) // one mode
    sb.write(0, 1) // blockflag 0
    sb.write(0, 16); sb.write(0, 16)
    sb.write(0, 8) // mapping 0
    sb.write(1, 1)
    (ib.toBytes, cb.toBytes, sb.toBytes)
  }

  /** Encode one block's spectrum: flat floor at the quantized peak
    * amplitude, residue = spectrum/floor quantized to {−2..2}.
    */
  private def encodePacket(spec: Array[Double]): Array[Byte] = {
    val bw = new BitWriter
    bw.write(0, 1) // audio packet
    // mode bits: ilog(0) = 0 bits — nothing to write
    val peak = spec.map(math.abs).max
    if (peak == 0.0) {
      bw.write(0, 1) // floor unused → silent channel
      return bw.toBytes
    }
    // floor: flat line at the smallest table amplitude ≥ peak/2 (so
    // residue values ±2 can reach the peak)
    val target = peak / 2.0
    var yv = 255
    var y = 0
    while (y < 256 && VorbisAudio.InverseDb(y) < target) y += 1
    yv = math.min(y, 255)
    val amp = VorbisAudio.InverseDb(yv)
    bw.write(1, 1) // floor nonzero
    bw.write(yv, 8) // y0 (range 256 → ilog(255) = 8 bits)
    bw.write(yv, 8) // y1
    // residue type 1: classwords then values
    val q = spec.map(v => math.max(-2, math.min(2, math.round(v / amp).toInt)))
    val partitions = N2 / PartSize
    val classes = Array.tabulate(partitions)(p =>
      if ((0 until PartSize).exists(i => q(p * PartSize + i) != 0)) 1 else 0)
    val classCodes = assignCodewords(ClassLengths)
    val valueCodes = assignCodewords(ValueLengths)
    def putCode(code: Int, len: Int): Unit = {
      var k = len - 1
      while (k >= 0) { bw.write((code >> k) & 1, 1); k -= 1 }
    }
    // pass 0: interleaved classword-then-partition structure with
    // classbook dim 1 → one classword immediately before each partition
    var p = 0
    while (p < partitions) {
      putCode(classCodes(classes(p)), ClassLengths(classes(p)))
      if (classes(p) == 1) {
        var s = 0
        while (s < PartSize) {
          // type-1 lookup decodes dim j from (e / 5^j) % 5: dim 0 is
          // the LOW digit, so the second sample takes the high digit
          val e = (q(p * PartSize + s + 1) + 2) * ValueLevels + (q(p * PartSize + s) + 2)
          putCode(valueCodes(e), ValueLengths(e))
          s += 2
        }
      }
      p += 1
    }
    bw.toBytes
  }

  /** Encode mono samples; returns a complete Ogg/Vorbis stream. */
  def encode(sr: Int, samples: Array[Float]): Array[Byte] = {
    val (ih, ch, sh) = headerPackets(sr)
    val out = new java.io.ByteArrayOutputStream()
    val serial = 0x67726166 // "graf"
    Ogg.writePage(out, headerType = 2, granule = 0L, serial = serial, seq = 0, Seq(ih))
    Ogg.writePage(out, headerType = 0, granule = 0L, serial = serial, seq = 1, Seq(ch, sh))
    val win = VorbisAudio.window(N)
    val nBlocks = math.max(2, (samples.length + N2 - 1) / N2 + 1)
    val packets = Seq.newBuilder[Array[Byte]]
    var b = 0
    while (b < nBlocks) {
      val x = new Array[Double](N)
      var j = 0
      while (j < N) {
        val idx = b * N2 - N2 + j // 50% overlapping blocks
        x(j) = if (idx >= 0 && idx < samples.length) samples(idx) else 0.0
        j += 1
      }
      packets += encodePacket(mdct(x, win))
      b += 1
    }
    val pkts = packets.result()
    var seq = 2
    var emitted = 0L
    pkts.zipWithIndex.foreach { case (pk, i) =>
      // first audio packet produces no output; granule = PCM emitted
      if (i > 0) emitted += N2
      val last = i == pkts.length - 1
      Ogg.writePage(out, headerType = if (last) 4 else 0,
        granule = emitted, serial = serial, seq = seq, Seq(pk))
      seq += 1
    }
    out.toByteArray
  }
}
