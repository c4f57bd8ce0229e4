package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SPACE-SAVING heavy-hitters summary (Metwally et al. 2005) as a true
  * partial-merge Aggregator with HARD-BOUNDED state: at most `capacity`
  * (key, est, err) counters per group per map partition, whatever the
  * number of distinct keys. The missing piece between the engine's two
  * existing frequency tools: CMS estimates counts but only for keys you
  * already know to ask about; exact `groupBy(key).count` names the keys
  * but its state is one counter PER DISTINCT KEY — at 100 TB with
  * billions of distinct tokens/URLs per group that state is the job.
  * Space-Saving names the heavy keys AND bounds the state.
  *
  * Single-stream guarantees (classic): for every key,
  * `est - err <= true <= est` when present, any key with
  * `true > n/capacity` is present, and `est - true <= n/capacity`.
  * Merging (Agarwal et al. 2012, "Mergeable summaries"): union matching
  * counters by summing est and err (absent side contributes 0), truncate
  * to the top-`capacity` by count — the n/capacity error bound is
  * preserved across arbitrary merge trees. After a truncating merge
  * `est >= true` can flip to undercount for keys a branch dropped;
  * `est - err <= true` and the heavy-hitter presence bound survive (the
  * properties `SketchProps` checks).
  *
  * Determinism: when every group's distinct-key count fits `capacity`,
  * no eviction or truncation ever fires, est is the exact count and
  * err = 0 on every path — the summary is a bounded-state lattice
  * (union-sum merge), bit-identical under ANY partitioning or batch
  * split, so one exact-counts SQL mirror oracles both the batch and the
  * streaming flavor. Beyond capacity the summary is approximate by
  * design and partitioning-dependent, like every Space-Saving
  * deployment; the laws above still hold.
  *
  * State is a key-sorted vector (binary-search insert, linear-merge
  * union); eviction scans for the (est, key)-min counter — O(capacity)
  * per evicting row, the classic implementation trade at bounded m.
  */
class SpaceSavingAgg(capacity: Int, k: Int)
    extends Aggregator[String, Seq[(String, Long, Long)], Seq[SpaceSavingAgg.Entry]] {
  require(capacity >= 1, s"need capacity >= 1, got $capacity")
  require(k >= 1 && k <= capacity, s"need 1 <= k <= capacity, got $k")

  override def zero: Seq[(String, Long, Long)] = Seq.empty

  // buffer is sorted by key; find the insert/match slot
  @inline private def slot(v: IndexedSeq[(String, Long, Long)], key: String): Int = {
    var a = 0
    var b = v.length
    while (a < b) { val m = (a + b) >>> 1; if (v(m)._1 < key) a = m + 1 else b = m }
    a
  }

  override def reduce(buf: Seq[(String, Long, Long)], key: String): Seq[(String, Long, Long)] = {
    val v = buf.toIndexedSeq
    val i = slot(v, key)
    if (i < v.length && v(i)._1 == key)
      v.updated(i, (key, v(i)._2 + 1L, v(i)._3))
    else if (v.length < capacity)
      (v.take(i) :+ (key, 1L, 0L)) ++ v.drop(i)
    else {
      // evict the (est, key)-min counter; the newcomer inherits its
      // count as both estimate floor and error witness
      var m = 0
      var j = 1
      while (j < v.length) {
        if (v(j)._2 < v(m)._2 || (v(j)._2 == v(m)._2 && v(j)._1 < v(m)._1)) m = j
        j += 1
      }
      val minEst = v(m)._2
      val dropped = v.take(m) ++ v.drop(m + 1)
      val i2 = slot(dropped, key)
      (dropped.take(i2) :+ (key, minEst + 1L, minEst)) ++ dropped.drop(i2)
    }
  }

  override def merge(a: Seq[(String, Long, Long)], b: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    var i = 0
    var j = 0
    while (i < a.length || j < b.length) {
      if (j >= b.length || (i < a.length && a(i)._1 < b(j)._1)) { out += a(i); i += 1 }
      else if (i >= a.length || b(j)._1 < a(i)._1) { out += b(j); j += 1 }
      else {
        out += ((a(i)._1, a(i)._2 + b(j)._2, a(i)._3 + b(j)._3)); i += 1; j += 1
      }
    }
    if (out.length <= capacity) out.toSeq
    else out.sortBy { case (kk, e, _) => (-e, kk) }.take(capacity)
      .sortBy(_._1).toSeq
  }

  override def finish(buf: Seq[(String, Long, Long)]): Seq[SpaceSavingAgg.Entry] =
    buf.sortBy { case (kk, e, _) => (-e, kk) }.take(k)
      .map { case (kk, e, r) => SpaceSavingAgg.Entry(kk, e, r) }

  override def bufferEncoder: Encoder[Seq[(String, Long, Long)]] =
    ExpressionEncoder[Seq[(String, Long, Long)]]()
  override def outputEncoder: Encoder[Seq[SpaceSavingAgg.Entry]] =
    ExpressionEncoder[Seq[SpaceSavingAgg.Entry]]()
}

object SpaceSavingAgg {
  /** One kept counter: est overcounts by at most err (single stream). */
  final case class Entry(key: String, est: Long, err: Long)
}
