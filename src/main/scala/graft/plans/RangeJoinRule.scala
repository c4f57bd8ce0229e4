package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** X4 — the range-join bucketing optimization as a Catalyst rule
  * (SURVEY §4: "the only custom strategy worth writing").
  *
  * Detects an inner join whose condition is
  * `kL = kR AND sL >= sR AND eL <= eR` (interval containment with an
  * equi key — the shape of `separation_filter.py:190-236`) and rewrites
  * it to join additionally on a bucket id: the probe side computes
  * `bucket(sL)`, the chunk side explodes to every bucket its interval
  * overlaps. Any monotone bucketing preserves the join result exactly —
  * a contained segment's start bucket always lies within its chunk's
  * bucket range — so this is a pure optimization: the shuffle and the
  * per-row comparison set shrink from "all chunks of the key" to "chunks
  * overlapping one bucket".
  *
  * Enabled by setting `spark.graft.rangeJoin.bucketWidth` to a positive
  * integer (in the unit of the interval columns); 0 (default) disables
  * the rewrite. Registered through [[graft.GraftExtensions]].
  *
  * PRECONDITIONS AND SOUNDNESS: the rule fires only when the condition
  * holds EXACTLY ONE left-start ≥ right-start conjunct and EXACTLY ONE
  * left-end ≤ right-end conjunct (ambiguous shapes with several candidate
  * bound pairs are left untouched), and enabling the conf opts EVERY
  * inner equi-join with that shape in the session into the rewrite.
  *
  * The rewrite is unconditionally semantics-preserving, including for
  * malformed (inverted, `s > e`) intervals on either side, because the
  * bucket equality is only a CANDIDATE filter — the original condition
  * stays in the join — and every row is guaranteed a candidate superset:
  *   - probe rows with `sL ≤ eL` take bucket(sL), which any containing
  *     build interval's bucket range covers (monotonicity);
  *   - probe rows with `sL > eL` (whose matches a bounded bucketing
  *     cannot cover — their start may sit arbitrarily far past the build
  *     interval) are routed to a CATCH-ALL bucket that every build row
  *     also emits, so they see the full unbucketed candidate set for
  *     their key; correct, merely unpruned for those rows;
  *   - build rows with an inverted bucket range (bucket(sR) > bucket(eR))
  *     emit only the catch-all entry instead of an illegal sequence — no
  *     well-formed probe row can match them, and inverted probe rows
  *     reach them through the catch-all.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  val CONF_KEY = "spark.graft.rangeJoin.bucketWidth"

  private def bucketWidth: Long =
    try conf.getConfString(CONF_KEY, "0").toLong catch { case _: NumberFormatException => 0L }

  /** (key-equi, sL >= sR, eL <= eR) conjunct extraction; attributes must
    * split cleanly across the two sides and interval columns be numeric.
    */
  private def matchContainment(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Attribute, Attribute, Attribute, Attribute)] = {
    val l = left.outputSet
    val r = right.outputSet
    val conjuncts = splitConjuncts(cond)
    // idempotence: never refire on a join this rule already rewrote
    if (cond.references.exists(_.name.startsWith("__gb_"))) return None
    def side(a: Attribute): Int = if (l.contains(a)) 0 else if (r.contains(a)) 1 else -1
    // collect ALL candidate bound pairs; fire only on an unambiguous
    // shape (exactly one of each) — multiple matching conjuncts used to
    // silently overwrite each other, pairing bounds of different
    // intervals.
    val geq = scala.collection.mutable.ArrayBuffer.empty[(Attribute, Attribute)]
    val leq = scala.collection.mutable.ArrayBuffer.empty[(Attribute, Attribute)]
    var hasEqui = false
    conjuncts.foreach {
      case EqualTo(a: Attribute, b: Attribute)
          if (side(a) == 0 && side(b) == 1) || (side(a) == 1 && side(b) == 0) =>
        hasEqui = true
      case GreaterThanOrEqual(a: Attribute, b: Attribute)
          if side(a) == 0 && side(b) == 1 =>
        geq += ((a, b))
      case LessThanOrEqual(a: Attribute, b: Attribute)
          if side(a) == 0 && side(b) == 1 =>
        leq += ((a, b))
      case _ => ()
    }
    (geq.toSeq, leq.toSeq) match {
      case (Seq((s1, s2)), Seq((e1, e2)))
          if hasEqui && s1 != e1 &&
            Seq(s1, s2, e1, e2).forall(_.dataType == LongType) =>
        Some((s1, s2, e1, e2))
      case _ => None
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Monotone bucket id: truncate(x / width) in INTEGER arithmetic
    * (`IntegralDivide`, i.e. SQL `div`). Truncation (not floor) is
    * fine — any monotone non-decreasing function preserves containment
    * bucketing — but it must be exact: the earlier double-divide
    * variant rounded above 2^53 and could place a probe start one
    * bucket away from its build range's bucket. Integer division is
    * exact over the full Long domain.
    */
  private def bucketOf(x: Expression, width: Long): Expression =
    IntegralDivide(Cast(x, LongType), Literal(width))

  /** Catch-all bucket id. A real bucket id only collides with it when
    * `truncate(sL / width) == Long.MinValue`, and even then the routing
    * stays correct: a catch-all probe row candidates against EVERY build
    * row of its key (superset), and the original condition decides.
    */
  private val CatchAll = Long.MinValue

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = bucketWidth
    if (width <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        matchContainment(cond, left, right) match {
          case Some((sL, sR, eL, eR)) =>
            // Probe: well-formed rows take their start bucket; inverted
            // (or null-bound) rows take the catch-all. A null predicate
            // falls to the catch-all branch, which is safe — the original
            // condition is null for those rows and filters them.
            val probeBucket = If(LessThanOrEqual(sL, eL),
              bucketOf(sL, width), Literal(CatchAll))
            val bL = Alias(probeBucket, "__gb_probe")()
            val probeSide = Project(left.output :+ bL, left)
            // Build: every bucket the interval overlaps, plus the
            // catch-all; an inverted bucket range would make Sequence
            // throw, so it degrades to catch-all-only (no well-formed
            // probe row can be contained in an inverted interval).
            // Sequence is TimeZoneAwareExpression: unresolved without a tz
            val bsR = bucketOf(sR, width)
            val beR = bucketOf(eR, width)
            val seq = new Sequence(bsR, beR,
              Literal(1L)).withTimeZone(conf.sessionLocalTimeZone)
            val guarded = If(
              And(And(IsNotNull(bsR), IsNotNull(beR)), LessThanOrEqual(bsR, beR)),
              seq, Literal.create(Array.empty[Long], seq.dataType))
            val withCatchAll = Concat(Seq(guarded, CreateArray(Seq(Literal(CatchAll)))))
            val gen = Explode(withCatchAll)
            val genOut = AttributeReference("__gb_build", LongType, nullable = false)()
            val buildSide = Generate(gen, Nil, outer = false, None, Seq(genOut), right)
            val newCond = And(cond, EqualTo(bL.toAttribute, genOut))
            Project(j.output,
              Join(probeSide, buildSide, Inner, Some(newCond), hint))
          case None => j
        }
    }
  }
}
