package graft.expr

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-state COUNT-MIN SKETCH aggregate (Cormode & Muthukrishnan,
  * J. Algorithms 2005) for heavy-hitter frequency estimation over a
  * token stream: a d×w counter grid where each item increments one cell
  * per row (cell `r·w + h_r(item)`), and `est(item) = min_r cell[r][h_r
  * (item)]` overestimates the true count only by colliding items —
  * `est ≥ true` always, within `ε·N` with probability `1−δ` for
  * `w = e/ε, d = ln(1/δ)`. State is exactly d·w longs; cell updates are
  * sums, so the merge is ELEMENT-WISE ADDITION — associative,
  * commutative, and (unlike Misra–Gries) completely independent of
  * partitioning and merge order: the sketch is a deterministic function
  * of the input multiset, which is what makes this approximate operator
  * exactly oracle-checkable. Row hashes are public md5 slices
  * ([[CmsSketch.cells]]), so an external engine derives identical cells:
  * each cell's value is just COUNT(*) of the (row, position) group.
  *
  * The 100 TB shape for "top tokens with estimated counts": the sketch
  * aggregates map-side-combined like a built-in sum — no per-token
  * shuffle, no distinct-value state — and the one-row grid broadcasts to
  * whoever needs estimates.
  */
object CmsSketch {

  /** The d cell indices of `item` in a d×w grid: row r probes column
    * `parseHex(md5(item)[8r .. 8r+8]) mod w`, flattened as `r·w + col`
    * (d ≤ 4 — md5's 32 hex chars give four independent 32-bit slices).
    */
  def cells(item: Column, d: Int, w: Int): Column = {
    require(d >= 1 && d <= 4, s"cms depth must be in 1..4, got $d")
    require(w >= 2, s"cms width must be >= 2, got $w")
    val ids = (0 until d).map { r =>
      (lit(r * w) + (conv(substring(md5(item.cast("string")), 1 + r * 8, 8), 16, 10)
        .cast("long") % w).cast("int")).cast("int")
    }
    array(ids: _*)
  }

  /** `min_r grid[cell_r(item)]` against the aggregated grid column —
    * the CMS point estimate, as a pure HOF expression.
    */
  def estimate(gridCol: Column, cellsCol: Column): Column =
    array_min(transform(cellsCol, c => element_at(gridCol, c + 1)))
}

/** Aggregator accumulating the d×w grid from per-row cell-index arrays
  * (as produced by [[CmsSketch.cells]]). Each input row adds 1 to its d
  * cells; merge is element-wise sum — a true partial-merge aggregate
  * with fixed-size state.
  */
class CmsSketchAgg(d: Int, w: Int) extends Aggregator[Seq[Int], Array[Long], Array[Long]] {
  require(d >= 1 && w >= 2, s"cms needs d >= 1, w >= 2, got d=$d w=$w")
  private val cellsN = d * w

  override def zero: Array[Long] = new Array[Long](cellsN)

  override def reduce(buf: Array[Long], cs: Seq[Int]): Array[Long] = {
    cs.foreach { c => buf(c) += 1L }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < cellsN) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
