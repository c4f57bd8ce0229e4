package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Result of a KMV sketch: how many distinct hashes the buffer holds
  * (≤ k) and, when the buffer is full, the kth-smallest hash — the
  * order statistic the cardinality estimate `(k−1)·2⁶⁰ / kth_min`
  * divides by. `kth_min` is None while fewer than k distinct hashes
  * exist (the count itself is then exact).
  */
final case class KmvSummary(n_min: Long, kth_min: Option[Long])

/** Bounded-state K-Minimum-Values distinct-count sketch (Bar-Yossef et
  * al., RANDOM 2002): keep the k smallest DISTINCT hash values of the
  * input; if the kth smallest normalized hash is U, the estimator
  * (k−1)/U is unbiased for the distinct count. State is ≤ k longs with
  * true partial-merge semantics (associative + commutative), so Spark
  * runs it map-side-combined exactly like a built-in aggregate — the
  * 100 TB shape for approximate COUNT(DISTINCT) without a global
  * shuffle of distinct values.
  *
  * The input is expected to be a hash already (the engine uses the top
  * 60 bits of md5, `graft_kmv` convention: `conv(substr(md5(x),1,15),
  * 16,10)`), which is what makes this APPROXIMATE operator exactly
  * oracle-checkable: an external engine computes the identical sketch
  * from the identical public hash, unlike HLL implementations whose
  * internal hashing is engine-private.
  */
class KmvSketchAgg(k: Int) extends Aggregator[Long, Seq[Long], KmvSummary] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: Seq[Long] = Seq.empty

  /** Insert into the sorted distinct buffer iff it is a new hash small
    * enough to matter; O(log k) search + O(k) splice, state never
    * exceeds k.
    */
  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = {
    val v: IndexedSeq[Long] = buf match {
      case is: IndexedSeq[Long] => is
      case other => other.toIndexedSeq
    }
    var a = 0
    var b = v.length
    while (a < b) { val m = (a + b) >>> 1; if (v(m) < h) a = m + 1 else b = m }
    if (a < v.length && v(a) == h) v // already present
    else if (a >= k) v // larger than every kept minimum
    else ((v.take(a) :+ h) ++ v.drop(a)).take(k)
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: Seq[Long]): KmvSummary =
    KmvSummary(buf.length.toLong,
      if (buf.length == k) Some(buf.last) else None)

  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[KmvSummary] =
    ExpressionEncoder[KmvSummary]()
}

/** The same bounded KMV state, finished as the raw sorted bottom-k hash
  * LIST instead of the (count, kth) summary — the mergeable-sketch form
  * set-expression estimators need (pairwise union/intersection over
  * per-group sketches, L123). Same reduce/merge, same ≤ k longs.
  */
class KmvListAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  private val core = new KmvSketchAgg(k)
  override def zero: Seq[Long] = core.zero
  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = core.reduce(buf, h)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = core.merge(a, b)
  override def finish(buf: Seq[Long]): Seq[Long] = buf
  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
