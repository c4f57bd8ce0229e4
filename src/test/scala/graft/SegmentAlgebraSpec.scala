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
}
