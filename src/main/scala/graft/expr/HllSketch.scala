package graft.expr

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Result of an HLL sketch: the 2^b registers in bucket order, the
  * scaled inverse-power sum `S = Σ_j 2^(width+1−M_j)` (empty registers
  * at M=0 contribute 2^(width+1)), and the empty-register count. The
  * raw HLL estimate is `α_m·m²·2^(width+1) / S` — a single double
  * division of exact integers, so the caller (and an external engine)
  * derives it bit-identically; the small/large-range corrections are
  * the caller's policy, not sketch state.
  */
final case class HllSummary(regs: Seq[Long], s_scaled: Long, n_zero: Long)

/** Bounded-state HyperLogLog distinct-count sketch (Flajolet et al.
  * 2007): 2^b max-of-rank registers with true partial-merge semantics
  * (element-wise max is associative + commutative + idempotent), so
  * Spark runs it map-side-combined — 2^b longs per group per partition
  * cross the wire, the industry-standard approximate COUNT(DISTINCT)
  * shape next to [[KmvSketchAgg]]'s order-statistic flavor (HLL state
  * is fixed-size and mergeable across ANY grouping; KMV keeps k exact
  * minima and degrades gracefully to exact counts below k).
  *
  * Like KMV, the input is the top-60-bit public md5 hash
  * (`conv(substr(md5(x),1,15),16,10)`), not an engine-private hash —
  * which is what makes this APPROXIMATE operator exactly
  * oracle-checkable: bucket = the hash's top `b` bits, rank ρ = leading
  * zeros of the remaining `width = 60−b` bits + 1 (an all-zero suffix
  * ranks width+1), mirrored in SQL as `width+1 − bitlength(w)`.
  */
class HllSketchAgg(b: Int) extends Aggregator[Long, Seq[Long], HllSummary] {
  require(b >= 1 && b <= 16, s"HLL needs 1 <= b <= 16, got $b")
  private val m = 1 << b
  private val width = 60 - b
  private val wMask = (1L << width) - 1L

  override def zero: Seq[Long] = Seq.fill(m)(0L)

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = {
    val bucket = (h >>> width).toInt & (m - 1)
    val w = h & wMask
    val rho =
      if (w == 0L) (width + 1).toLong
      else (width + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))).toLong
    if (rho <= buf(bucket)) buf else buf.updated(bucket, rho)
  }

  override def merge(a: Seq[Long], b2: Seq[Long]): Seq[Long] = {
    val out = new Array[Long](m)
    var i = 0
    while (i < m) { out(i) = math.max(a(i), b2(i)); i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  override def finish(buf: Seq[Long]): HllSummary =
    HllSummary(buf,
      buf.map(r => 1L << (width + 1 - r)).sum,
      buf.count(_ == 0L).toLong)

  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[HllSummary] =
    ExpressionEncoder[HllSummary]()
}
