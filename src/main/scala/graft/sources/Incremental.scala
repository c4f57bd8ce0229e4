package graft.sources

import org.apache.spark.sql.DataFrame

/** S9/X2 — incremental computation: the reference's `skip_if_exist`
  * (per-file output-existence checks scattered through every stage,
  * `vad_multi.py:22-26` etc.) becomes one declarative left-anti join
  * against the sink's manifest of completed keys. Under Structured
  * Streaming the checkpoint plays this role; in batch this helper does.
  */
object Incremental {

  /** Keys of `inputs` not yet present in `done` — the units of work a
    * re-run still owes. Broadcast-friendly when the manifest is small;
    * at scale Catalyst plans a shuffled left-anti hash join on the key.
    */
  def remaining(inputs: DataFrame, done: DataFrame, key: String): DataFrame =
    inputs.join(done.select(key).distinct(), Seq(key), "left_anti")

  /** S10-adjacent — split a run's outputs into completed/failed tallies
    * by a status column (`vad_multi.py:101-115` counters).
    */
  def statusCounts(outputs: DataFrame, statusCol: String): DataFrame =
    outputs.groupBy(statusCol).count()
}
