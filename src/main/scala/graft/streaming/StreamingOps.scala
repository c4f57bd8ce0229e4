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
}
