package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact interval-union length as a typed `Aggregator` — "total covered
  * time" over possibly-overlapping segments, the scalar the reference
  * derives by merging before summing (`host_rematch.py:35-45` over merged
  * segments; per-speaker totals in SURVEY A4).
  *
  * Unlike capped sessionization (order-dependent, per-key kernel), the
  * interval union IS associative and commutative, so it fits Spark's
  * partial-aggregation contract: each partition folds its rows into a
  * sorted disjoint interval list, partial buffers merge pairwise, and
  * `finish` sums the lengths. Buffer size is bounded by the number of
  * disjoint covered spans, not the row count — map-side combine does the
  * heavy lifting exactly like a built-in sum.
  */
class IntervalUnionAgg extends Aggregator[(Long, Long), Seq[(Long, Long)], Long] {

  override def zero: Seq[(Long, Long)] = Seq.empty

  /** Insert one interval into the sorted-disjoint buffer: binary-search
    * the first mergeable slot, absorb the (usually empty) run of
    * overlapping intervals, splice. O(log B + B) copy per row instead of
    * the former full re-sort (O(B log B)) — and on the common in-order
    * input the binary search lands at the end and the splice is an
    * append.
    */
  override def reduce(buf: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] = {
    val (s, e) = x
    if (e <= s) return buf
    val v: IndexedSeq[(Long, Long)] = buf match {
      case is: IndexedSeq[(Long, Long)] => is
      case other => other.toIndexedSeq
    }
    // first index whose end touches-or-passes s (candidates to merge)
    var a = 0
    var b = v.length
    while (a < b) { val m = (a + b) >>> 1; if (v(m)._2 >= s) b = m else a = m + 1 }
    val lo = a
    // absorb the run of intervals starting at or before e
    var hi = lo
    var ns = s
    var ne = e
    while (hi < v.length && v(hi)._1 <= e) {
      ns = math.min(ns, v(hi)._1); ne = math.max(ne, v(hi)._2); hi += 1
    }
    (v.take(lo) :+ ((ns, ne))) ++ v.drop(hi)
  }

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    normalize(a ++ b)

  override def finish(buf: Seq[(Long, Long)]): Long =
    buf.map(iv => iv._2 - iv._1).sum

  /** Sort + sweep to a minimal sorted disjoint list. */
  private def normalize(ivs: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val sorted = ivs.sortBy(identity)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    sorted.foreach { case (s, e) =>
      if (out.nonEmpty && s <= out.last._2) {
        val (ls, le) = out.last
        out(out.length - 1) = (ls, math.max(le, e))
      } else out += ((s, e))
    }
    out.toSeq
  }

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
