package graft.ops

import scala.collection.mutable.ArrayBuffer

/** Pure single-key kernels backing [[SegmentAlgebra]]'s flatMapGroups
  * operators (and the streaming state handlers). Kept free of Spark so
  * they are property-testable at ScalaCheck speed and reusable across the
  * batch and streaming execution shells.
  */
object SegmentKernels {

  final case class Merged(start: Double, end: Double, n: Int)

  /** W1 capped merge over (start, end)-sorted input — `utils.py:64-79`. */
  def mergeCapped(sorted: IndexedSeq[(Double, Double)], gap: Double,
                  cap: Double): IndexedSeq[Merged] = {
    val out = ArrayBuffer.empty[Merged]
    var curS = 0d; var curE = 0d; var n = 0
    sorted.foreach { case (s, e) =>
      if (n == 0) { curS = s; curE = e; n = 1 }
      else if (s - curE <= gap && math.max(curE, e) - curS <= cap) {
        curE = math.max(curE, e); n += 1
      } else {
        out += Merged(curS, curE, n); curS = s; curE = e; n = 1
      }
    }
    if (n > 0) out += Merged(curS, curE, n)
    out.toIndexedSeq
  }

  final case class MergedTyped(start: Double, end: Double, n: Int, types: Seq[String])

  /** W1 typed capped merge over pre-sorted WEIGHTED items
    * (start, end, memberCount, types) — the shared kernel of the batch
    * typed merge (items are single segments, n=1) and its streaming
    * state shell (the carried-over open session enters as ONE item with
    * its accumulated count and types, so no post-merge fix-up is
    * needed). Same fold as [[mergeCapped]] with types concatenated in
    * item order — `utils.py:82-99`.
    */
  def mergeTypedCapped(sorted: IndexedSeq[(Double, Double, Int, Seq[String])],
                       gap: Double, cap: Double): IndexedSeq[MergedTyped] = {
    val out = ArrayBuffer.empty[MergedTyped]
    var curS = 0d; var curE = 0d; var n = 0
    val types = ArrayBuffer.empty[String]
    sorted.foreach { case (s, e, cnt, ts) =>
      if (n > 0 && !(s - curE <= gap && math.max(curE, e) - curS <= cap)) {
        out += MergedTyped(curS, curE, n, types.toSeq)
        types.clear(); n = 0
      }
      if (n == 0) { curS = s; curE = e } else curE = math.max(curE, e)
      types ++= ts; n += cnt
    }
    if (n > 0) out += MergedTyped(curS, curE, n, types.toSeq)
    out.toIndexedSeq
  }

  /** W8 recursive longest-gap split over sorted input —
    * `silero_vad.py:81-112`.
    */
  def splitAtLargestGaps(sorted: IndexedSeq[(Double, Double)],
                         maxDuration: Double): IndexedSeq[Merged] = {
    val out = ArrayBuffer.empty[Merged]
    val stack = scala.collection.mutable.Stack[(Int, Int)]()
    if (sorted.nonEmpty) stack.push((0, sorted.length))
    while (stack.nonEmpty) {
      val (lo, hi) = stack.pop()
      val span = sorted(hi - 1)._2 - sorted(lo)._1
      if (span <= maxDuration || hi - lo == 1) {
        out += Merged(sorted(lo)._1, sorted(hi - 1)._2, hi - lo)
      } else {
        var bestK = lo + 1; var bestGap = Double.NegativeInfinity
        var k = lo + 1
        while (k < hi) {
          val g = sorted(k)._1 - sorted(k - 1)._2
          if (g > bestGap) { bestGap = g; bestK = k }
          k += 1
        }
        stack.push((bestK, hi))
        stack.push((lo, bestK))
      }
    }
    out.sortBy(_.start).toIndexedSeq
  }

  final case class Active(start: Double, end: Double, labels: Seq[String])

  /** J8 sweep line with active sets; ends process before starts at ties —
    * `diarization.py:24-64`. Counts are a true multiset WITHOUT clamping:
    * an end seen before its (same-instant) start leaves a −1 deficit that
    * the start cancels, so zero-length segments contribute nothing — the
    * reference's plain `set.remove` raises on that degenerate input, so
    * this is the only consistent extension (and the one a running-sum SQL
    * sweep computes).
    */
  def sweepActiveSets(segs: Seq[(Double, Double, String)]): IndexedSeq[Active] = {
    val events = segs.flatMap { case (s, e, l) => Seq((s, 1, l), (e, 0, l)) }
      .sortBy { case (t, isStart, l) => (t, isStart, l) }
    val counts = scala.collection.mutable.Map.empty[String, Int]
    val out = ArrayBuffer.empty[Active]
    var prevT = Double.NaN
    events.foreach { case (t, isStart, l) =>
      if (!prevT.isNaN && t > prevT && counts.exists(_._2 > 0))
        out += Active(prevT, t,
          counts.collect { case (lbl, c) if c > 0 => lbl }.toSeq.sorted)
      val c = counts.getOrElse(l, 0) + (if (isStart == 1) 1 else -1)
      if (c == 0) counts.remove(l) else counts(l) = c
      prevT = t
    }
    out.toIndexedSeq
  }
}
