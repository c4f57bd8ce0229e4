package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state per-group TOP-K aggregate: keep the k largest
  * (value, id) pairs — ordered by value desc, then id asc for
  * deterministic ties — as a true partial-merge Aggregator.
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY
  * v DESC) <= k`) shuffles EVERY row of every group to its group's
  * partition and sorts there; this aggregate ships at most k pairs per
  * group per map partition — the same contrast as Spark's global
  * TakeOrderedAndProject vs a full sort, but per group, where Spark has
  * no built-in. At 100 TB with millions of rows per hot group the
  * shuffle drops from O(rows) to O(k · partitions).
  *
  * State is a sorted vector of ≤ k pairs; insert is binary-search +
  * splice, merge is a linear merge of two sorted buffers. Output is the
  * sorted top-k as structs (rank via posexplode at the call site).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[TopKAgg.Entry]] {
  require(k >= 1, s"top-k needs k >= 1, got $k")

  // ordering: value desc, id asc — (a) before (b) when better
  @inline private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] = {
    val v = buf.toIndexedSeq
    if (v.length == k && !better(x, v.last)) v
    else {
      var a = 0
      var b = v.length
      while (a < b) { val m = (a + b) >>> 1; if (better(v(m), x)) a = m + 1 else b = m }
      ((v.take(a) :+ x) ++ v.drop(a)).take(k)
    }
  }

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0
    var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && better(a(i), b(j)))) {
        out += a(i); i += 1
      } else { out += b(j); j += 1 }
    }
    out.toSeq
  }

  override def finish(buf: Seq[(Long, Long)]): Seq[TopKAgg.Entry] =
    buf.map { case (v, id) => TopKAgg.Entry(v, id) }

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[TopKAgg.Entry]] =
    ExpressionEncoder[Seq[TopKAgg.Entry]]()
}

object TopKAgg {
  /** One kept pair: the sort value and its row id. */
  final case class Entry(value: Long, id: Long)
}
