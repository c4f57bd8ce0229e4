package graft.streaming

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
}
