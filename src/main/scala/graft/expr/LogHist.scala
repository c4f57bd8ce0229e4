package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** LOG-HISTOGRAM QUANTILE SKETCH bucketing (the DDSketch shape —
  * Masson, Rim & Lee, VLDB 2019): positive longs map to buckets of
  * geometrically growing width, `subs` sub-buckets per binary octave, so
  * any bucket's representative is within a fixed RELATIVE error
  * (≤ 1/subs) of every value it holds, with at most `(maxK+1)·subs`
  * buckets covering the whole long range — a per-group quantile state
  * of ~0.5k counters no matter how many distinct values the group has.
  * Contrast [[graft.ops.Curation.discreteQuantiles]], the exact flavor,
  * whose per-group state is one counter per DISTINCT value: at 100 TB
  * the exact form is right for low-cardinality domains (durations in
  * ms), the sketch for unbounded ones (document lengths, byte sizes).
  *
  * Everything here is INTEGER-EXACT, which is what makes the
  * "approximate" sketch exactly oracle-checkable cross-engine:
  *  - octave `k = floor(log2 x)` is the bit length of x minus one —
  *    computed as `length(bin(x)) - 1`, never float log;
  *  - sub-bucket `s = ((x − 2^k)·subs) >> k` (exact: the divisor is a
  *    power of two and the operand non-negative);
  *  - bucket id `b = k·subs + s`;
  *  - the representative is the bucket's LOWER BOUND scaled by `subs`
  *    to stay integral: `rep·subs = (subs + s)·2^k`.
  *
  * Domain: x is clamped below to 1; x must stay under 2^60 so the
  * `·subs` products cannot overflow a long. The bucket-count state
  * itself is [[CmsSketchAgg]] with d = 1 and w = [[nBuckets]] — a CMS
  * whose "hash" is the identity on a bounded key space is exactly this
  * histogram, and its element-wise-sum merge is what makes the sketch a
  * partial-merge aggregate (map-side combined, mergeable across shards
  * and streaming micro-batches alike).
  */
object LogHist {

  /** Sub-buckets per binary octave: relative error ≤ 1/8. Kept a power
    * of two so `div subs` / `mod subs` are shifts and masks. */
  val subs = 8
  private val subShift = 3

  /** Bucket ids span 0 until nBuckets (octaves 0..62). */
  val nBuckets: Int = 63 * subs

  /** `2^k` for a column k in 0..62. */
  private def pow2(k: Column): Column = call_function("shiftleft", lit(1L), k)

  /** Bucket id of `x` (clamped to ≥ 1): `k·subs + sub`, integer-exact. */
  def bucket(x: Column): Column = {
    val xx = greatest(x.cast("long"), lit(1L))
    val k = (length(bin(xx)) - lit(1)).cast("int")
    val sub = call_function("shiftright", (xx - pow2(k)) * lit(subs.toLong), k)
      .cast("int")
    (k * lit(subs) + sub).cast("int")
  }

  /** `subs ×` the lower bound of bucket `b`: `(subs + b mod subs)·2^(b
    * div subs)` — the quantile representative, kept integral. Every x in
    * the bucket satisfies `rep8 ≤ subs·x < rep8 + 2^(b div subs)`.
    */
  def rep8(b: Column): Column =
    (lit(subs.toLong) + pmod(b, lit(subs)).cast("long")) *
      pow2(call_function("shiftright", b, lit(subShift)))
}
