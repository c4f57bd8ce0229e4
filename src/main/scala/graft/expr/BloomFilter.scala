package graft.expr

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-state BLOOM FILTER aggregate for semi-join pruning — the
  * standard 100 TB join-reduction structure: build an m-bit filter over
  * the small side's keys (state = m/64 longs with true partial merge —
  * word-wise OR is associative and commutative, so Spark runs it
  * map-side-combined), broadcast the one-row result, and prune the big
  * side with a bit test BEFORE its shuffle. Rows the filter rejects are
  * definitely not in the build side; accepted rows still confirm through
  * the exact join — the filter only removes work, never changes answers.
  *
  * Bit positions come from PUBLIC md5 substrings (`positions`), not an
  * engine-private hash, which makes this approximate structure exactly
  * oracle-checkable: an external engine derives the identical positions,
  * and "bit p is set" ≡ "p ∈ (positions of some build key)" — so the
  * oracle can mirror the membership test as a set join without ever
  * materializing the bitset.
  */
object BloomFilter {

  /** The k bit positions of `key` in an m-bit filter: position i is the
    * i-th 8-hex-char slice of md5(key) mod m (m ≤ 2³², k ≤ 4 — 32 hex
    * chars of md5 give four independent 32-bit slices).
    */
  def positions(key: Column, k: Int, m: Int): Column = {
    require(k >= 1 && k <= 4, s"bloom k must be in 1..4, got $k")
    require(m >= 64 && m % 64 == 0, s"bloom bits must be a positive multiple of 64, got $m")
    val slices = (0 until k).map { i =>
      (conv(substring(md5(key.cast("string")), 1 + i * 8, 8), 16, 10)
        .cast("long") % m).cast("int")
    }
    array(slices: _*)
  }

  /** Membership test of one row's position array against the aggregated
    * bitset column (Array[Long]): every position's bit must be set.
    * Pure bit arithmetic (word index `p >>> 6`, bit probe
    * `(word >>> (p & 63)) & 1`) — codegen'd, no UDF.
    */
  def mightContain(bitsCol: Column, posCol: Column): Column =
    forall(posCol, p => {
      val word = element_at(bitsCol,
        call_function("shiftrightunsigned", p, lit(6)) + 1)
      call_function("shiftrightunsigned", word, p.bitwiseAND(lit(63)))
        .bitwiseAND(lit(1L)) === lit(1L)
    })
}

/** Aggregator building the m-bit Bloom bitset from per-row position
  * arrays (as produced by [[BloomFilter.positions]]). State is exactly
  * `bits/64` longs regardless of input cardinality; merge is word-wise
  * OR — a true partial-merge aggregate, the same execution shape as a
  * built-in sum.
  */
class BloomFilterAgg(bits: Int) extends Aggregator[Seq[Int], Array[Long], Array[Long]] {
  require(bits >= 64 && bits % 64 == 0, s"bits must be a positive multiple of 64, got $bits")
  private val words = bits / 64

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(buf: Array[Long], ps: Seq[Int]): Array[Long] = {
    ps.foreach { p => buf(p >>> 6) |= 1L << (p & 63) }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
