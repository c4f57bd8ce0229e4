package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One row of either input stream of [[TemporalEnrich.latestStateEnrich]]:
  * `isRight` tags the state (dimension) stream, `tie` breaks ordering
  * ties (unique per (k, ts) on the right for determinism; the left id).
  */
final case class EnrichInput(k: String, ts: Long, isRight: Boolean,
    tie: Long, payload: Long)

/** An enriched left row: the matched right row's (ts, payload), or None
  * when no right row is known yet for the key.
  */
final case class Enriched(k: String, ts: Long, tie: Long,
    asofTs: Option[Long], asofPayload: Option[Long])

/** Streaming flavor of [[graft.ops.SegmentOps.asofJoin]] — the
  * PROCESSING-TIME temporal join (Flink's temporal table function /
  * "enrich events with the latest dimension state"): a state stream and
  * an event stream union into one keyed stream; per key the group state
  * holds the latest-known right row, and every left row emits joined to
  * it.
  *
  * Semantics vs the batch as-of join: WITHIN a micro-batch, rows sort by
  * (ts, right-before-left, tie), so the match is the exact event-time
  * as-of. ACROSS micro-batches, only the latest right row survives in
  * state (constant state per key — the whole point), so a left row
  * arriving in a later batch than a right row that POSTDATES it still
  * matches that newer state — latest-known-state semantics, the
  * documented posture of every streaming kernel here (late data extends
  * forward only; the batch operator is the exact-replay authority).
  *
  * Scale shape: one shuffle on the key; state is one (ts, tie, payload)
  * triple per key, no buffering of either stream.
  */
object TemporalEnrich {

  final case class LatestRight(ts: Long, tie: Long, payload: Long)

  def latestStateEnrich(in: Dataset[EnrichInput]): Dataset[Enriched] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.k)
      .flatMapGroupsWithState[LatestRight, Enriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[EnrichInput], state: GroupState[LatestRight]) =>
          // right rows sort before left rows at equal ts (inclusive
          // as-of); ties among right rows resolve via the max-guard below
          val rows = it.toIndexedSeq
            .sortBy(r => (r.ts, if (r.isRight) 0 else 1, r.tie))
          var cur = state.getOption
          val out = IndexedSeq.newBuilder[Enriched]
          rows.foreach { r =>
            if (r.isRight) {
              // monotone: keep the max (ts, tie) right row ever seen
              if (cur.forall(c =>
                  Ordering.Tuple2[Long, Long].gt((r.ts, r.tie), (c.ts, c.tie))))
                cur = Some(LatestRight(r.ts, r.tie, r.payload))
            } else {
              out += Enriched(k, r.ts, r.tie,
                cur.map(_.ts), cur.map(_.payload))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** [[EnrichInput]] with an absolute event timestamp for watermarking. */
  final case class TimedEnrichInput(k: String, ts: Timestamp, isRight: Boolean,
      tie: Long, payload: Long)

  final case class BufRow(tsMs: Long, tie: Long, payload: Long)
  final case class AsofBuffers(rights: Seq[BufRow], lefts: Seq[BufRow])

  /** EVENT-TIME streaming as-of join (SURVEY §2.11 L30) — the exact
    * refinement of [[latestStateEnrich]]: left rows are joined to the
    * latest right row with `(ts, tie) <= (left.ts, +inf)` REGARDLESS of
    * arrival order, by holding both sides in group state until the
    * watermark proves the answer final. A left row is emitted only once
    * `watermark >= left.ts`: every right row at or before it has either
    * arrived or is watermark-late (and was dropped at the source, the
    * standard contract). This is Spark's stream–stream interval-join
    * posture applied to as-of semantics.
    *
    * State per key is bounded by the watermark delay: right rows older
    * than the watermark are folded into ONE latest-known row (the match
    * floor for future lefts), lefts leave state when emitted, and the
    * group wakes via event-time timeout when the watermark passes its
    * oldest pending left — no data needed on the key to flush it.
    *
    * Emitted `Enriched.ts`/`asofTs` are epoch millis (the watermark
    * clock), matching the batch operator's integer-time convention.
    */
  def eventTimeAsof(in: Dataset[TimedEnrichInput],
                    watermarkDelay: String): Dataset[Enriched] = {
    import in.sparkSession.implicits._
    in.withWatermark("ts", watermarkDelay)
      .groupByKey(_.k)
      .flatMapGroupsWithState[AsofBuffers, Enriched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: String, it: Iterator[TimedEnrichInput], state: GroupState[AsofBuffers]) =>
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(AsofBuffers(Nil, Nil))
          val rows = it.toIndexedSeq
          val rights = (prev.rights ++ rows.filter(_.isRight)
              .map(r => BufRow(r.ts.getTime, r.tie, r.payload)))
            .sortBy(r => (r.tsMs, r.tie))
          val lefts = prev.lefts ++ rows.filterNot(_.isRight)
            .map(r => BufRow(r.ts.getTime, r.tie, r.payload))
          val (ready, pending) = lefts.partition(_.tsMs <= wm)
          val out = ready.sortBy(l => (l.tsMs, l.tie)).map { l =>
            // latest right at or before the left row; right ties on one
            // ts resolve to the max tie (the batch operator's rule)
            val m = rights.takeWhile(_.tsMs <= l.tsMs).lastOption
            Enriched(k, l.tsMs, l.tie, m.map(_.tsMs), m.map(_.payload))
          }
          // fold watermark-old rights into the single latest-known row:
          // it is still the match floor for lefts with ts > wm
          val (oldR, liveR) = rights.partition(_.tsMs <= wm)
          val kept = oldR.lastOption.toSeq ++ liveR
          if (kept.isEmpty && pending.isEmpty) state.remove()
          else {
            state.update(AsofBuffers(kept, pending))
            // wake when the watermark reaches the oldest pending left
            // (pending => tsMs > wm, so the timestamp is legal)
            pending.map(_.tsMs).minOption
              .foreach(ts => state.setTimeoutTimestamp(ts))
          }
          out.iterator
      }
  }

  /** One drift observation for [[eventTimeCusum]]: `tie` breaks ordering
    * ties (unique per (k, ts) for determinism).
    */
  final case class CusumInput(k: String, ts: Timestamp, tie: Long, drift: Long)

  final case class CusumOut(k: String, ts: Long, tie: Long, drift: Long,
      cusum: Long, alarm: Boolean)

  /** Folded prefix state (p = running Σdrift, m = min prefix incl. 0)
    * plus the rows still inside the disorder window.
    */
  final case class CusumState(p: Long, m: Long, pending: Seq[BufRow])

  /** EVENT-TIME streaming CUSUM — the streaming twin of
    * [[graft.ops.EventAnalytics.cusumDrift]]: `S_i = max(0, S_{i−1} +
    * x_i)` is inherently sequential, so correctness under disorder means
    * holding a row until the watermark proves nothing earlier can still
    * arrive, then folding rows in exact (ts, tie) event order. Same
    * buffering contract as [[eventTimeAsof]]: rows with `ts ≤ watermark`
    * emit in order, later rows wait in state, and an event-time timeout
    * wakes the group when the watermark passes its oldest pending row.
    *
    * State per key is the disorder window's rows plus TWO LONGS — the
    * folded prefix sum `p` and prefix-min `m` (the closed form
    * `S = p − m`, m seeded with P₀ = 0) — so the unbounded history costs
    * constant state, exactly like the batch window formulation costs one
    * sort. Run to completion (heartbeat past every event + the trailing
    * timeout batch), the output equals the batch operator row for row.
    */
  /** One row of either attribution stream: touches (`isConv = false`)
    * and conversions (`isConv = true`, carrying `cents`). `ts` is the
    * watermark clock — queries here embed exact µs in it
    * (`timestamp_millis(tus)`, the same scale-shift every streaming
    * kernel in this engine uses), so ordering and window membership
    * are µs-exact.
    */
  final case class AttrInput(k: String, ts: Timestamp, isConv: Boolean,
      tie: Long, cents: Long)

  final case class AttrCredit(k: String, convId: Long, touchId: Long,
      credit: Long)

  final case class AttrState(touches: Seq[BufRow], convs: Seq[BufRow])

  /** EVENT-TIME streaming MULTI-TOUCH LINEAR ATTRIBUTION — the exact
    * twin of [[graft.ops.EventAnalytics.linearAttribution]]: a
    * conversion's credit splits over the same key's touches inside the
    * preceding `window` (in watermark-clock units), base `cents div k`
    * plus one remainder cent to each of the earliest touches. A
    * conversion is processed only once `watermark ≥ its ts`: every
    * touch at or before it has either arrived or is watermark-late
    * (the standard drop contract), so the credit set is final — same
    * buffering posture as [[eventTimeAsof]]. Touchless conversions
    * emit nothing (the batch inner join).
    *
    * State per key is bounded: touches older than `watermark − window`
    * can never enter a future conversion's window (future conversions
    * have ts > watermark) and are pruned; conversions leave state when
    * processed. Event-time timeout wakes the group when the watermark
    * passes its oldest pending conversion.
    */
  def eventTimeAttribution(in: Dataset[AttrInput], watermarkDelay: String,
                           window: Long): Dataset[AttrCredit] = {
    import in.sparkSession.implicits._
    in.withWatermark("ts", watermarkDelay)
      .groupByKey(_.k)
      .flatMapGroupsWithState[AttrState, AttrCredit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: String, it: Iterator[AttrInput], state: GroupState[AttrState]) =>
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(AttrState(Nil, Nil))
          val rows = it.toIndexedSeq
          val touches = (prev.touches ++ rows.filterNot(_.isConv)
              .map(r => BufRow(r.ts.getTime, r.tie, 0L)))
            .sortBy(t => (t.tsMs, t.tie))
          val convs = prev.convs ++ rows.filter(_.isConv)
            .map(r => BufRow(r.ts.getTime, r.tie, r.cents))
          val (ready, pending) = convs.partition(_.tsMs <= wm)
          val out = IndexedSeq.newBuilder[AttrCredit]
          ready.sortBy(c => (c.tsMs, c.tie)).foreach { c =>
            val win = touches.filter(t =>
              t.tsMs <= c.tsMs && t.tsMs > c.tsMs - window)
            val kk = win.length
            if (kk > 0) {
              // Java / and % match the batch `div`/`%` for every sign
              val base = c.payload / kk
              val rem = c.payload % kk
              win.zipWithIndex.foreach { case (t, i) =>
                out += AttrCredit(k, c.tie, t.tie,
                  base + (if (i < rem) 1L else 0L))
              }
            }
          }
          val keptT = touches.filter(_.tsMs > wm - window)
          if (keptT.isEmpty && pending.isEmpty) state.remove()
          else {
            state.update(AttrState(keptT, pending))
            // wake at the oldest pending conversion; with none pending,
            // wake once the newest touch ages out of every possible
            // window so an idle key self-prunes instead of holding its
            // touch buffer until new data happens to arrive
            val wake = pending.map(_.tsMs).minOption
              .orElse(keptT.map(_.tsMs).maxOption.map(_ + window))
            wake.foreach(ts => state.setTimeoutTimestamp(math.max(ts, wm + 1)))
          }
          out.result().iterator
      }
  }

  def eventTimeCusum(in: Dataset[CusumInput], watermarkDelay: String,
                     h: Long): Dataset[CusumOut] = {
    import in.sparkSession.implicits._
    in.withWatermark("ts", watermarkDelay)
      .groupByKey(_.k)
      .flatMapGroupsWithState[CusumState, CusumOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: String, it: Iterator[CusumInput], state: GroupState[CusumState]) =>
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(CusumState(0L, 0L, Nil))
          val all = prev.pending ++
            it.map(r => BufRow(r.ts.getTime, r.tie, r.drift))
          val (ready, pending) = all.partition(_.tsMs <= wm)
          var p = prev.p
          var m = prev.m
          val out = ready.sortBy(r => (r.tsMs, r.tie)).map { r =>
            p += r.payload
            if (p < m) m = p
            val s = p - m
            CusumOut(k, r.tsMs, r.tie, r.payload, s, s > h)
          }
          state.update(CusumState(p, m, pending))
          pending.map(_.tsMs).minOption
            .foreach(ts => state.setTimeoutTimestamp(ts))
          out.iterator
      }
  }
}
