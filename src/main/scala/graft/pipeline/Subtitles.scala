package graft.pipeline

/** SubRip (SRT) subtitle parsing — the sidecar format transcript and
  * caption corpora actually ship in (the reference pipeline's
  * transcript sidecars are JSON; the public world's are SRT/WebVTT).
  * A speech-data curation run ingests these for ASR supervision, so
  * the cue grammar must parse exactly: cue index line, the
  * `HH:MM:SS,mmm --> HH:MM:SS,mmm` time line, text lines up to a
  * blank-line separator. Times land in exact MICROSECONDS (ms × 1000,
  * the engine's time domain) — never a float second.
  *
  * Parsing is LOUD (the S10 posture): a non-numeric index, indexes
  * out of order, a malformed time line, or end ≤ start throws —
  * a silently mis-parsed cue is mis-aligned supervision downstream.
  *
  * Scale shape: one SRT file is one per-row string kernel; the cue
  * table relationalizes above it (joins to segments via the
  * interval-containment family).
  */
object Subtitles {

  /** One cue: 1-based index, [startUs, endUs), text (multi-line
    * joined with `\n`).
    */
  final case class Cue(index: Int, startUs: Long, endUs: Long,
      text: String)

  private val timeRe =
    """(\d{2,}):(\d{2}):(\d{2}),(\d{3}) --> (\d{2,}):(\d{2}):(\d{2}),(\d{3})""".r

  private def us(h: String, m: String, s: String, ms: String): Long = {
    val mm = m.toLong; val ss = s.toLong
    require(mm < 60 && ss < 60, s"bad SRT time field: $h:$m:$s,$ms")
    ((h.toLong * 3600 + mm * 60 + ss) * 1000 + ms.toLong) * 1000
  }

  /** Parse an SRT document into cues, loudly. */
  def parseSrt(srt: String): Seq[Cue] = {
    val blocks = srt.replace("\r\n", "\n").split("\n\n+")
      .map(_.trim).filter(_.nonEmpty)
    require(blocks.nonEmpty, "empty SRT document")
    var lastIndex = 0
    blocks.toSeq.map { block =>
      val lines = block.split('\n')
      require(lines.length >= 2, s"SRT cue with fewer than 2 lines: $block")
      require(lines(0).nonEmpty && lines(0).forall(_.isDigit),
        s"bad SRT cue index line: '${lines(0)}'")
      val idx = lines(0).toInt
      require(idx > lastIndex,
        s"SRT cue indexes must increase: $idx after $lastIndex")
      lastIndex = idx
      val (s, e) = lines(1) match {
        case timeRe(h1, m1, s1, ms1, h2, m2, s2, ms2) =>
          (us(h1, m1, s1, ms1), us(h2, m2, s2, ms2))
        case other =>
          throw new IllegalArgumentException(s"bad SRT time line: '$other'")
      }
      require(e > s, s"SRT cue $idx ends at or before its start")
      Cue(idx, s, e, lines.drop(2).mkString("\n"))
    }
  }

  private def fmt(usTotal: Long): String = {
    val ms = usTotal / 1000
    f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d,${ms % 1000}%03d"
  }

  /** Mint a spec-shaped SRT document (fixture dual of [[parseSrt]]);
    * cue times must be whole milliseconds (the format's resolution).
    */
  def mintSrt(cues: Seq[Cue]): String = {
    require(cues.forall(c => c.startUs % 1000 == 0 && c.endUs % 1000 == 0),
      "SRT resolution is milliseconds")
    cues.map(c => s"${c.index}\n${fmt(c.startUs)} --> ${fmt(c.endUs)}\n" +
      c.text).mkString("\n\n") + "\n"
  }

  private val vttTimeRe =
    ("""(?:(\d{2,}):)?(\d{2}):(\d{2})\.(\d{3}) --> """ +
      """(?:(\d{2,}):)?(\d{2}):(\d{2})\.(\d{3})(?:[ \t].*)?""").r

  /** Parse a WebVTT document (the SRT sibling with DOT milliseconds,
    * a mandatory `WEBVTT` header, OPTIONAL cue identifier lines,
    * optional hours, and cue settings after the time line — ignored
    * per spec). Spec-valid NOTE / STYLE / REGION blocks (comments,
    * stylesheets, region definitions — common in wild sidecars) are
    * skipped, not errors; per spec they cannot contain `-->`, which
    * distinguishes them from a cue whose identifier line merely
    * starts with one of those words. Cue indexes are assigned by
    * CUE position (1-based); violations are loud.
    */
  def parseVtt(vtt: String): Seq[Cue] = {
    val norm = vtt.replace("\r\n", "\n")
    require(norm.startsWith("WEBVTT"),
      "not a WebVTT document: missing WEBVTT header")
    val nonCueRe = """(?s)(NOTE([ \t\n].*)?|STYLE(\n.*)?|REGION(\n.*)?)""".r
    val blocks = norm.split("\n\n+").map(_.trim).filter(_.nonEmpty)
      .drop(1) // the header block
      .filterNot(b => !b.contains("-->") && nonCueRe.pattern.matcher(b).matches)
    require(blocks.nonEmpty, "WebVTT document with zero cues")
    blocks.toSeq.zipWithIndex.map { case (block, i) =>
      val lines = block.split('\n')
      // the time line is the first line containing "-->"; at most one
      // identifier line may precede it (spec: id must not contain -->)
      val tAt = lines.indexWhere(_.contains("-->"))
      require(tAt == 0 || tAt == 1,
        s"WebVTT cue without a leading time line: $block")
      val (s, e) = lines(tAt) match {
        case vttTimeRe(h1, m1, s1, ms1, h2, m2, s2, ms2) =>
          (us(if (h1 == null) "0" else h1, m1, s1, ms1),
            us(if (h2 == null) "0" else h2, m2, s2, ms2))
        case other =>
          throw new IllegalArgumentException(
            s"bad WebVTT time line: '$other'")
      }
      require(e > s, s"WebVTT cue ${i + 1} ends at or before its start")
      Cue(i + 1, s, e, lines.drop(tAt + 1).mkString("\n"))
    }
  }

  private def fmtVtt(usTotal: Long): String = {
    val ms = usTotal / 1000
    f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d.${ms % 1000}%03d"
  }

  /** Mint a WebVTT document: cues with even index carry an identifier
    * line, cues with index % 3 == 0 carry a `align:start` setting —
    * both surfaces the parser must handle (fixture dual of
    * [[parseVtt]]).
    */
  def mintVtt(cues: Seq[Cue]): String = {
    require(cues.forall(c => c.startUs % 1000 == 0 && c.endUs % 1000 == 0),
      "WebVTT resolution is milliseconds")
    "WEBVTT\n\n" + cues.map { c =>
      val id = if (c.index % 2 == 0) s"cue-${c.index}\n" else ""
      val settings = if (c.index % 3 == 0) " align:start" else ""
      s"$id${fmtVtt(c.startUs)} --> ${fmtVtt(c.endUs)}$settings\n${c.text}"
    }.mkString("\n\n") + "\n"
  }
}
