package graft

import graft.model._
import graft.ops.SegmentAlgebra

import scala.util.Random

/** The flatMapGroups kernels have no SQL oracle — these suites ARE their
  * correctness gate, checking against brute-force single-threaded
  * reference implementations of the documented semantics
  * (`utils.py:64-102`, `silero_vad.py:81-112`, `diarization.py:24-64`).
  */
class SegmentAlgebraSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force capped merge, literally `utils.py:64-79`. */
  private def bruteCapped(segs: Seq[(Double, Double)], gap: Double, cap: Double)
      : Seq[(Double, Double, Int)] = {
    val sorted = segs.sortBy(identity)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Int)]
    var cur: Option[(Double, Double, Int)] = None
    sorted.foreach { case (s, e) =>
      cur match {
        case Some((cs, ce, n)) if s - ce <= gap && math.max(ce, e) - cs <= cap =>
          cur = Some((cs, math.max(ce, e), n + 1))
        case Some(done) =>
          out += done; cur = Some((s, e, 1))
        case None => cur = Some((s, e, 1))
      }
    }
    cur.foreach(out += _)
    out.toSeq
  }

  test("sessionizeCapped matches brute force on random segments") {
    val rnd = new Random(42)
    val segs = (1 to 4).flatMap { f =>
      (1 to 200).map { _ =>
        val s = rnd.nextDouble() * 1000
        (s"f$f", s, s + rnd.nextDouble() * 30)
      }
    }
    val ds = segs.map { case (f, s, e) => Segment(f, s, e) }.toDS()
    val got = SegmentAlgebra.sessionizeCapped(ds, gap = 5d, maxDuration = 120d)
      .collect().groupBy(_.file)
      .map { case (f, ms) => f -> ms.sortBy(_.start).map(m => (m.start, m.end, m.n)).toSeq }
    val want = segs.groupBy(_._1).map { case (f, ss) =>
      f -> bruteCapped(ss.map(t => (t._2, t._3)), 5d, 120d)
    }
    assert(got == want)
  }

  test("sessionizeCapped: cap splits a chain that gap alone would merge") {
    val ds = Seq(Segment("f", 0, 10), Segment("f", 11, 21), Segment("f", 22, 32))
      .toDS()
    val merged = SegmentAlgebra.sessionizeCapped(ds, gap = 2d, maxDuration = 25d)
      .collect().sortBy(_.start)
    assert(merged.map(m => (m.start, m.end, m.n)).toSeq ==
      Seq((0d, 21d, 2), (22d, 32d, 1)))
  }

  test("sessionizeTyped voice gate drops all-silence sessions") {
    val ds = Seq(
      TypedSegment("f", 0, 1, "silence"), TypedSegment("f", 1.5, 2.5, "voice"),
      TypedSegment("f", 10, 11, "silence"), TypedSegment("f", 11.5, 12, "silence"))
      .toDS()
    val kept = SegmentAlgebra.sessionizeTyped(ds, gap = 1d, maxDuration = 100d,
      mustIncludeVoice = true).collect()
    assert(kept.length == 1)
    assert(kept.head.start == 0d && kept.head.end == 2.5 &&
      kept.head.types == Seq("silence", "voice"))
  }

  test("recursiveSplit splits at the largest internal gap until pieces fit") {
    // run spans 0..100 (> 40); largest gap is 50->70, then 0..50 splits at 20->35
    val ds = Seq(
      Segment("f", 0, 10), Segment("f", 12, 20), Segment("f", 35, 50),
      Segment("f", 70, 100)).toDS()
    val parts = SegmentAlgebra.recursiveSplit(ds, maxDuration = 40d)
      .collect().sortBy(_.start).map(m => (m.start, m.end, m.n)).toSeq
    assert(parts == Seq((0d, 20d, 2), (35d, 50d, 1), (70d, 100d, 1)))
  }

  test("recursiveSplit keeps oversize singletons whole") {
    val ds = Seq(Segment("f", 0, 500)).toDS()
    val parts = SegmentAlgebra.recursiveSplit(ds, maxDuration = 40d).collect()
    assert(parts.map(m => (m.start, m.end, m.n)).toSeq == Seq((0d, 500d, 1)))
  }

  test("sweepLineActiveSets: overlaps, ties, and end-before-start ordering") {
    val ds = Seq(
      SpeakerSegment("f", 0, 10, "a"),
      SpeakerSegment("f", 5, 15, "b"),
      SpeakerSegment("f", 15, 20, "c")) // b ends exactly when c starts
      .toDS()
    val got = SegmentAlgebra.sweepLineActiveSets(ds).collect()
      .sortBy(_.start).map(a => (a.start, a.end, a.speakers.mkString(","))).toSeq
    assert(got == Seq(
      (0d, 5d, "a"), (5d, 10d, "a,b"), (10d, 15d, "b"), (15d, 20d, "c")))
  }

  test("sweepLineActiveSets handles duplicate labels (refcount, not set)") {
    val ds = Seq(
      SpeakerSegment("f", 0, 10, "a"),
      SpeakerSegment("f", 2, 4, "a")).toDS()
    val got = SegmentAlgebra.sweepLineActiveSets(ds).collect()
      .sortBy(_.start).map(a => (a.start, a.end, a.speakers.mkString(","))).toSeq
    // 'a' stays active across the inner segment's end
    assert(got == Seq((0d, 2d, "a"), (2d, 4d, "a"), (4d, 10d, "a")))
  }

  test("sessionizeBySpeaker breaks on speaker change and drops short sessions") {
    val ds = Seq(
      SpeakerSegment("f", 0, 2, "a"), SpeakerSegment("f", 2.5, 5, "a"),
      SpeakerSegment("f", 5.5, 6, "b"), // short: 0.5 <= 1 -> dropped
      SpeakerSegment("f", 6.5, 12, "a")).toDS()
    val got = SegmentAlgebra.sessionizeBySpeaker(ds, gap = 1d, maxDuration = 100d,
      minDuration = 1d).collect().sortBy(_.start)
      .map(s => (s.start, s.end, s.speaker)).toSeq
    assert(got == Seq((0d, 5d, "a"), (6.5, 12d, "a")))
  }

  // --- SURVEY §7.4.2 reference-compat quirk flags ------------------------

  test("sessionizeTyped compatMode replays the reference's end regression (utils.py:94,96)") {
    // Golden hand-traced through combine_timestamps (utils.py:64-102)
    // with interval=0.25, max_duration=10: the nested (1,2) segment
    // REGRESSES the running end from 9.0 to 2.0, then (2.1,3) to 3.0 —
    // so (9.2,9.4), within gap of the TRUE end 9.0 but 6.2s past the
    // regressed end, starts a new all-silence session that the gate
    // drops. The fixed covering merge absorbs it into one session.
    val ds = Seq(
      TypedSegment("f", 0.0, 9.0, "voice"),
      TypedSegment("f", 1.0, 2.0, "silence"),
      TypedSegment("f", 2.1, 3.0, "voice"),
      TypedSegment("f", 9.2, 9.4, "silence")).toDS()
    def run(compat: Boolean) =
      SegmentAlgebra.sessionizeTyped(ds, gap = 0.25, maxDuration = 10d,
          mustIncludeVoice = true, compatMode = compat)
        .collect().sortBy(_.start).map(m => (m.start, m.end, m.n, m.types)).toSeq
    assert(run(compat = true) ==
      Seq((0.0, 3.0, 3, Seq("voice", "silence", "voice"))))
    assert(run(compat = false) ==
      Seq((0.0, 9.4, 4, Seq("voice", "silence", "voice", "silence"))))
  }

  test("sessionizeNoisySkip compatMode discards the trailing run (utils.py:165-183)") {
    // Golden hand-traced through the reference walk: noisy region (4,7);
    // segment C (5,6) straddles it -> flushes run [A,B], starts the next
    // run WITH C (the boundary is a session break, not an exclusion);
    // D (8,9) passes the region's end -> flushes [C], advances the noisy
    // pointer off the end, starts run [D]. The reference never flushes
    // that trailing run; the fixed mode does.
    val segs = Seq(
      TypedSegment("f", 0.0, 1.0, "voice"),
      TypedSegment("f", 1.1, 2.0, "voice"),
      TypedSegment("f", 5.0, 6.0, "voice"),
      TypedSegment("f", 8.0, 9.0, "voice"),
      // second file, no noisy regions: plain gated combine both modes
      TypedSegment("g", 0.0, 1.0, "voice")).toDS()
    val noisy = Seq(Segment("f", 4.0, 7.0)).toDS()
    def run(compat: Boolean) =
      SegmentAlgebra.sessionizeNoisySkip(segs, noisy, gap = 0.5, maxDuration = 10d,
          compatMode = compat)
        .collect().sortBy(m => (m.file, m.start))
        .map(m => (m.file, m.start, m.end, m.n)).toSeq
    assert(run(compat = true) ==
      Seq(("f", 0.0, 2.0, 2), ("f", 5.0, 6.0, 1), ("g", 0.0, 1.0, 1)))
    assert(run(compat = false) ==
      Seq(("f", 0.0, 2.0, 2), ("f", 5.0, 6.0, 1), ("f", 8.0, 9.0, 1),
        ("g", 0.0, 1.0, 1)))
  }
}
