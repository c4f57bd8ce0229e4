package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming flavor of the segment algebra (SURVEY §2.10):
  * the reference is batch, but its dataflow is incremental-by-design —
  * `skip_if_exist` everywhere makes each stage a resumable append-only
  * computation. Here the same logical operators run under
  * `readStream`/`writeStream`:
  *
  *  - file arrival → file source + `Trigger.AvailableNow` reproduces a
  *    batch run; the checkpoint dir is the principled `skip_if_exist`;
  *  - W1 sessionization → `session_window(ts, gap)`;
  *  - W3/W4 hops → `window(ts, size, hop)`;
  *  - P7/W7 late-drop → `withWatermark` (the reference discards rows
  *    whose end trails the running max, `silero_vad.py:137-139`).
  */
object StreamingOps {

  /** W1 streaming — gap-based session aggregation per key. Input needs an
    * event-time `ts` (timestamp) column.
    */
  def sessionAgg(events: DataFrame, key: String, gap: String,
                 watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col(key), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col(key),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** W3/W4 streaming — hopped window aggregation with late-data drop. */
  def hoppedAgg(events: DataFrame, key: String, size: String, hop: String,
                watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col(key), window(col("ts"), size, hop))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col(key),
        col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("n_events"), col("sum_value"))

  /** STREAM-STREAM INTERVAL JOIN — Spark's native two-sided streaming
    * inner join: both sides carry an event-time watermark, and `cond`
    * must include a time-range constraint between the two event-time
    * columns so the state store retires rows once the other side's
    * watermark passes their match window (without the range, inner-join
    * state grows without bound — the 100 TB failure mode this operator
    * exists to avoid). The classic use is attribution: purchases joined
    * to the views they followed within the window.
    *
    * Determinism: the inner join emits a (l, r) match exactly when both
    * rows have arrived and neither was retired. With a watermark delay
    * at least the streams' disorder bound nothing needed is ever
    * retired, so a run-to-completion (`AvailableNow`) output equals the
    * batch join WHATEVER the file/batch split — which is how the oracle
    * checks it exactly (the registered query sets the delay to the data
    * span; production sets it to the disorder SLA).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, cond: org.apache.spark.sql.Column,
                   ltsCol: String, rtsCol: String, delay: String): DataFrame =
    left.withWatermark(ltsCol, delay)
      .join(right.withWatermark(rtsCol, delay), cond)

  /** STREAM-STATIC JOIN scoring — the online flavor of
    * [[graft.ops.Curation.lmFamiliarity]]: documents arrive as a
    * stream; the LM count tables (the "model": bigram counts, unigram
    * counts, vocab size — trained offline on the trusted slice) are
    * STATIC DataFrames joined per micro-batch. A stream-static join is
    * stateless — nothing is watermarked or retired, each batch probes
    * the model as-of that batch — which is why the model side carries a
    * broadcast hint: without it every micro-batch re-shuffles the
    * static side (a per-batch tax that dwarfs the batch itself; a
    * model too big to broadcast would instead be pre-bucketed on the
    * join key so only the stream side moves).
    *
    * The rollup keys on `langCol` in complete mode — state is one row
    * per language, the bounded-state aggregation shape — so a
    * run-to-completion output equals the batch rollup whatever the
    * file/batch split. Per-occurrence term sums equal the batch
    * tf-weighted sums (Σ_occurrences = Σ_distinct tf·term).
    */
  final case class FrameEvent(vid: Long, frame: Long, fhash: Long)
  final case class ShotRow(vid: Long, shot_id: Long, key_frame: Long, n_frames: Long)
  final case class OpenShot(shotId: Long, keyFrame: Long, nFrames: Long, lastHash: Long)

  /** L122 — STREAMING SHOT-BOUNDARY DETECTION: the L119 cut/keyframe
    * kernel as per-video `flatMapGroupsWithState` — the live-ingest
    * flavor (frames arrive as a video uploads; shots emit the moment
    * the cut that closes them arrives, not at end-of-file). State per
    * video is ONE open shot (id, keyframe, length, last hash) — O(1)
    * regardless of video length, the bounded-state contract every
    * streaming op here obeys. Within a micro-batch frames sort by
    * frame index, so any file/batch split of an in-order feed yields
    * the identical shot sequence; a closing sentinel frame whose hash
    * is Hamming-far from every real hash (e.g. all-ones against
    * bounded hashes) flushes the final real shot, exactly the
    * heartbeat idiom `streaming_sessions` uses. Run to completion, the
    * output equals [[graft.ops.Multimodal.shotSegments]] on the same
    * frames — the batch-twin oracle.
    */
  def streamingShots(frames: org.apache.spark.sql.Dataset[FrameEvent],
                     maxDist: Int): org.apache.spark.sql.Dataset[ShotRow] = {
    import frames.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    frames.groupByKey(_.vid)
      .flatMapGroupsWithState[OpenShot, ShotRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (vid, it, state) =>
          val sorted = it.toIndexedSeq.sortBy(_.frame)
          var cur = state.getOption
          val out = scala.collection.mutable.Buffer[ShotRow]()
          for (f <- sorted) cur match {
            case Some(o) if java.lang.Long.bitCount(o.lastHash ^ f.fhash) <= maxDist =>
              cur = Some(o.copy(nFrames = o.nFrames + 1, lastHash = f.fhash))
            case Some(o) =>
              out += ShotRow(vid, o.shotId, o.keyFrame, o.nFrames)
              cur = Some(OpenShot(o.shotId + 1, f.frame, 1L, f.fhash))
            case None =>
              cur = Some(OpenShot(1L, f.frame, 1L, f.fhash))
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  final case class VecBucket(band: Int, bv: Long, vecId: Long, qv: Array[Long])
  final case class NearDupHit(band: Int, bv: Long, a: Long, b: Long,
                              dot: Long, cos: Double)
  final case class BucketCanon(canonId: Long, qv: Array[Long], nn: Long)

  /** L125 — STREAMING EMBEDDING NEAR-DUP: incremental semantic dedup
    * of a vector feed. Upstream (stateless, codegen'd) each vector is
    * quantized, SRP-signed, and exploded into its LSH band buckets;
    * here each bucket holds exactly ONE canonical vector in state (the
    * first arrival — with an in-order feed, the min id) and every
    * later arrival verifies against it by exact quantized cosine the
    * moment it lands, emitting a near-dup hit immediately — the
    * streaming dedup decision is made per vector at ingest, not in a
    * nightly batch. State is O(buckets): one id + one quantized vector
    * (+ its cached norm²) per bucket, regardless of feed length —
    * canonical-only state is exactly how production streaming dedup
    * bounds itself (pair history is never kept, the L20 incremental
    * posture). Within a micro-batch arrivals sort by id, so a
    * single-pass feed reproduces the batch twin: pairs (bucket-min,
    * other) with cos ≥ `minCos`, per band bucket.
    */
  def streamingNearDup(vecs: org.apache.spark.sql.Dataset[VecBucket],
                       minCos: Double): org.apache.spark.sql.Dataset[NearDupHit] = {
    import vecs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    vecs.groupByKey(v => (v.band, v.bv))
      .flatMapGroupsWithState[BucketCanon, NearDupHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, bv), it, state) =>
          val sorted = it.toIndexedSeq.sortBy(_.vecId)
          val out = scala.collection.mutable.Buffer[NearDupHit]()
          var st = state.getOption
          for (v <- sorted) st match {
            case None =>
              var nn = 0L; var i = 0
              while (i < v.qv.length) { nn += v.qv(i) * v.qv(i); i += 1 }
              st = Some(BucketCanon(v.vecId, v.qv, nn))
            case Some(c) if v.vecId == c.canonId => () // replayed delivery
            case Some(c) =>
              var dot = 0L; var nn = 0L; var i = 0
              while (i < v.qv.length) {
                dot += c.qv(i) * v.qv(i); nn += v.qv(i) * v.qv(i); i += 1
              }
              val cos = dot.toDouble /
                (math.sqrt(c.nn.toDouble) * math.sqrt(nn.toDouble))
              if (cos >= minCos)
                out += NearDupHit(band, bv, c.canonId, v.vecId, dot, cos)
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  def familiarityRollup(docs: DataFrame, c2: DataFrame, c1: DataFrame,
                        vocab: DataFrame, textCol: String, langCol: String,
                        scale: Long): DataFrame = {
    import graft.ops.TextOps
    docs.select(col(langCol),
        explode(TextOps.shingles(TextOps.tokens(col(textCol)), 2)).as("g"))
      .withColumn("w1", element_at(split(col("g"), " "), 1))
      .join(broadcast(c2), Seq("g"), "left")
      .join(broadcast(c1), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(langCol), expr(
        s"($scale * (coalesce(c2, 0L) + 1L)) div (coalesce(c1, 0L) + v)").as("term"))
      .groupBy(col(langCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("term")).as("fam_sum"))
      .select(col(langCol), col("n_bigrams"), col("fam_sum"),
        expr("fam_sum div n_bigrams").as("fam_scaled"))
  }
}
