package graft.pipeline

/** Matroska / WebM header probe — the EBML container the open web's
  * video (`.webm`) and the archive world's `.mkv` ship in; the probe
  * certifies the layer BELOW any codec: EBML header (magic + DocType),
  * Segment → Info (TimecodeScale) and Segment → Tracks (per-track
  * number, type, codec id). Spec-only (IETF RFC 8794 EBML + the
  * public Matroska element registry). EBML's one structural idea is
  * the VINT: a length-prefixed variable integer whose leading-zero
  * count picks the width — element IDs keep the marker bit (as
  * registered), element SIZES drop it. Catalog only (Clusters — the
  * media payload — are skipped by size); structural violations raise
  * for the S10 tier.
  */
object MkvProbe {

  final case class MkvTrack(number: Long, trackType: Long, codecId: String)

  final case class MkvInfo(docType: String, timecodeScale: Long,
      tracks: Seq[MkvTrack])

  // ---- VINT machinery ------------------------------------------------

  /** Read a VINT at `off`: returns (value-with-marker-kept,
    * value-with-marker-dropped, width).
    */
  private def vint(b: Array[Byte], off: Int): (Long, Long, Int) = {
    require(off < b.length, s"ebml: truncated vint at $off")
    val first = b(off) & 0xff
    require(first != 0, s"ebml: vint with >8-byte width at $off")
    val width = Integer.numberOfLeadingZeros(first) - 24 + 1
    require(off + width <= b.length, s"ebml: truncated vint body at $off")
    var raw = first.toLong
    var i = 1
    while (i < width) { raw = (raw << 8) | (b(off + i) & 0xffL); i += 1 }
    val marker = 1L << (7 * width)
    (raw, raw - marker, width)
  }

  private def uint(b: Array[Byte], off: Int, len: Int): Long = {
    require(len >= 1 && len <= 8, s"ebml: uint of $len bytes")
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  // Element IDs from the public Matroska registry (marker bit kept,
  // as the IDs are written in the spec and on the wire).
  private val EbmlHeader = 0x1a45dfa3L
  private val DocType = 0x4282L
  private val Segment = 0x18538067L
  private val Info = 0x1549a966L
  private val TimecodeScale = 0x2ad7b1L
  private val Tracks = 0x1654ae6bL
  private val TrackEntry = 0xaeL
  private val TrackNumber = 0xd7L
  private val TrackType = 0x83L
  private val CodecId = 0x86L

  def probe(bytes: Array[Byte]): MkvInfo = {
    var docType = ""
    var tcScale = 1000000L // spec default
    val tracks = Seq.newBuilder[MkvTrack]
    // per-TrackEntry accumulation
    var tn = -1L; var tt = -1L; var cid = ""

    def walk(from: Int, to: Int, depth: Int): Unit = {
      require(depth < 8, "ebml: nesting too deep")
      var off = from
      while (off < to) {
        val (id, _, idW) = vint(bytes, off)
        val (_, size, szW) = vint(bytes, off + idW)
        val body = off + idW + szW
        require(body + size <= to,
          s"ebml: element 0x${id.toHexString} overruns parent at $off")
        id match {
          case EbmlHeader | Segment | Info | Tracks =>
            walk(body, body + size.toInt, depth + 1)
          case TrackEntry =>
            tn = -1L; tt = -1L; cid = ""
            walk(body, body + size.toInt, depth + 1)
            require(tn > 0 && tt >= 0 && cid.nonEmpty,
              "ebml: TrackEntry missing number/type/codec")
            tracks += MkvTrack(tn, tt, cid)
          case DocType =>
            docType = new String(bytes, body, size.toInt,
              java.nio.charset.StandardCharsets.US_ASCII)
          case TimecodeScale => tcScale = uint(bytes, body, size.toInt)
          case TrackNumber   => tn = uint(bytes, body, size.toInt)
          case TrackType     => tt = uint(bytes, body, size.toInt)
          case CodecId =>
            cid = new String(bytes, body, size.toInt,
              java.nio.charset.StandardCharsets.US_ASCII)
          case _ => () // skip unknown/payload elements by size
        }
        off = body + size.toInt
      }
    }
    walk(0, bytes.length, 0)
    require(docType.nonEmpty, "ebml: no EBML header / DocType")
    MkvInfo(docType, tcScale, tracks.result())
  }

  // ---- mint dual -----------------------------------------------------

  private def vintBytes(v: Long, width: Int, keepMarker: Boolean)
      : Array[Byte] = {
    val raw = if (keepMarker) v else v | (1L << (7 * width))
    Array.tabulate(width)(i => ((raw >> (8 * (width - 1 - i))) & 0xff).toByte)
  }

  private def el(id: Long, payload: Array[Byte]): Array[Byte] = {
    val idW = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    val szW = 2 // two-byte size covers every fixture payload
    require(payload.length < (1 << 13), "mint: payload too large")
    vintBytes(id, idW, keepMarker = true) ++
      vintBytes(payload.length.toLong, szW, keepMarker = false) ++ payload
  }

  private def uintBytes(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && (v >> (8 * len)) != 0) len += 1
    Array.tabulate(len)(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte)
  }

  /** Mint a probe-valid Matroska/WebM stream (fixture dual of
    * [[probe]]): EBML header with DocType, Segment with Info
    * (TimecodeScale) and Tracks.
    */
  def mint(docType: String, timecodeScale: Long,
      tracks: Seq[MkvTrack]): Array[Byte] =
    mint(docType, Some(timecodeScale), tracks)

  /** As above, but `timecodeScale = None` mints an Info block that
    * OMITS TimecodeScale — the fixture for probe's spec-default
    * (1,000,000 ns) fallback branch, which a scale-always-written
    * mint could never exercise.
    */
  def mint(docType: String, timecodeScale: Option[Long],
      tracks: Seq[MkvTrack]): Array[Byte] = {
    val header = el(EbmlHeader, el(DocType,
      docType.getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
    val info = el(Info, timecodeScale.map(s =>
      el(TimecodeScale, uintBytes(s))).getOrElse(Array.emptyByteArray))
    val trackEntries = tracks.flatMap { t =>
      el(TrackEntry,
        el(TrackNumber, uintBytes(t.number)) ++
          el(TrackType, uintBytes(t.trackType)) ++
          el(CodecId, t.codecId.getBytes(
            java.nio.charset.StandardCharsets.US_ASCII)))
    }.toArray
    header ++ el(Segment, info ++ el(Tracks, trackEntries))
  }
}
