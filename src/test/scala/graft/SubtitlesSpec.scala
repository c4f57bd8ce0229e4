package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Subtitles
import graft.pipeline.Subtitles.Cue

/** Pins the SRT cue grammar against a hand-laid literal (minter and
  * parser must not share a wrong constant) plus the loud failure
  * modes.
  */
class SubtitlesSpec extends AnyFunSuite {

  test("hand-laid SRT literal parses to the planted cues") {
    val lit = "1\n00:00:01,500 --> 00:00:04,250\nHello there\n\n" +
      "2\n01:02:03,004 --> 01:02:05,000\nTwo lines\nof text\n"
    val cues = Subtitles.parseSrt(lit)
    assert(cues == Seq(
      Cue(1, 1500000L, 4250000L, "Hello there"),
      Cue(2, (3723L * 1000 + 4) * 1000, 3725000000L, "Two lines\nof text")))
  }

  test("mint/parse round-trip is the identity, CRLF tolerated") {
    val cues = Seq(Cue(1, 0L, 900000L, "a"),
      Cue(2, 1000000L, 2000000L, "b\nc"))
    assert(Subtitles.parseSrt(Subtitles.mintSrt(cues)) == cues)
    val crlf = Subtitles.mintSrt(cues).replace("\n", "\r\n")
    assert(Subtitles.parseSrt(crlf) == cues)
  }

  test("hand-laid WebVTT literal: header, optional id, optional hours, " +
    "settings ignored, dot milliseconds") {
    val lit = "WEBVTT\n\n" +
      "00:01.000 --> 00:02.500\nFirst\n\n" +
      "ident-7\n01:00:03.250 --> 01:00:04.000 align:start\nSecond\nline\n"
    val cues = Subtitles.parseVtt(lit)
    assert(cues == Seq(
      Cue(1, 1000000L, 2500000L, "First"),
      Cue(2, 3603250000L, 3604000000L, "Second\nline")))
    // SRT comma time in a VTT file is loud, and vice versa headers
    intercept[IllegalArgumentException](Subtitles.parseVtt(
      "WEBVTT\n\n00:00:01,000 --> 00:00:02.000\nt\n"))
    intercept[IllegalArgumentException](Subtitles.parseVtt(
      "00:00:01.000 --> 00:00:02.000\nt\n")) // no header
    val minted = Seq(Cue(1, 0L, 500000L, "a"), Cue(2, 1000000L, 3000000L, "b"),
      Cue(3, 4000000L, 5000000L, "c"))
    assert(Subtitles.parseVtt(Subtitles.mintVtt(minted)) == minted)
  }

  test("WebVTT NOTE/STYLE/REGION blocks are skipped, not errors; " +
    "cue indexes count cues only") {
    val lit = "WEBVTT\n\n" +
      "NOTE this is a comment\nspanning two lines\n\n" +
      "00:01.000 --> 00:02.000\nFirst\n\n" +
      "STYLE\n::cue { color: red }\n\n" +
      "REGION\nid:r1 width:40%\n\n" +
      "NOTE\n\n" +
      "00:03.000 --> 00:04.000\nSecond\n"
    assert(Subtitles.parseVtt(lit) == Seq(
      Cue(1, 1000000L, 2000000L, "First"),
      Cue(2, 3000000L, 4000000L, "Second")))
    // a cue whose IDENTIFIER line merely starts with NOTE is still a
    // cue (the --> in the block disambiguates, per spec comment rules)
    assert(Subtitles.parseVtt("WEBVTT\n\n" +
      "NOTEWORTHY-7\n00:05.000 --> 00:06.000\nThird\n") ==
      Seq(Cue(1, 5000000L, 6000000L, "Third")))
    // an all-comment document still has zero cues: loud
    intercept[IllegalArgumentException](Subtitles.parseVtt(
      "WEBVTT\n\nNOTE nothing here\n"))
  }

  test("violations are loud: bad index, order, time grammar, zero span") {
    intercept[IllegalArgumentException](Subtitles.parseSrt(
      "x\n00:00:01,000 --> 00:00:02,000\nt\n"))
    intercept[IllegalArgumentException](Subtitles.parseSrt(
      "2\n00:00:01,000 --> 00:00:02,000\nt\n\n" +
        "1\n00:00:03,000 --> 00:00:04,000\nu\n"))
    intercept[IllegalArgumentException](Subtitles.parseSrt(
      "1\n00:00:01.000 --> 00:00:02,000\nt\n")) // WebVTT dot, not SRT
    intercept[IllegalArgumentException](Subtitles.parseSrt(
      "1\n00:00:02,000 --> 00:00:02,000\nt\n"))
    intercept[IllegalArgumentException](Subtitles.parseSrt(
      "1\n00:00:99,000 --> 00:01:40,000\nt\n")) // 99 seconds field
    intercept[IllegalArgumentException](Subtitles.mintSrt(
      Seq(Cue(1, 500L, 1000000L, "t")))) // sub-millisecond start
  }
}
