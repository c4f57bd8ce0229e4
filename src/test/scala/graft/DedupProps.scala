package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Property laws for the prefix-filtering candidate rule
  * (`Dedup.prefixFilterPairs`): the PPJoin lemma — under ANY fixed
  * global token order, two sets with Jaccard ≥ t = num/den must share a
  * token inside each other's first `n − ceil(t·n) + 1` tokens — checked
  * over hundreds of random set pairs and thresholds (pure math, no
  * Spark; the Spark operator's end-to-end equality with the exhaustive
  * Jaccard path is OpsSpec's job). An off-by-one in the prefix length
  * breaks recall silently in production; this pins the formula.
  */
object DedupProps extends Properties("DedupPrefixFilter") {

  private def prefixLen(n: Int, tNum: Int, tDen: Int): Int =
    n - ((tNum * n + tDen - 1) / tDen) + 1

  private def jaccardAtLeast(a: Set[String], b: Set[String],
                             tNum: Int, tDen: Int): Boolean =
    (a & b).size.toLong * tDen >= tNum.toLong * (a | b).size

  private val genThreshold: Gen[(Int, Int)] =
    Gen.oneOf((1, 2), (2, 3), (4, 5), (9, 10))

  private val genPair: Gen[(Set[String], Set[String])] = for {
    sizeA <- Gen.chooseNum(5, 30)
    a <- Gen.pick(sizeA, (0 until 40).map(i => f"t$i%02d"))
    nDrop <- Gen.chooseNum(0, math.min(4, sizeA - 1))
    dropped <- Gen.pick(nDrop, a)
    nAdd <- Gen.chooseNum(0, 4)
    added <- Gen.pick(nAdd, (100 until 140).map(i => s"x$i"))
  } yield (a.toSet, a.toSet -- dropped ++ added)

  property("J >= t pairs collide inside each other's prefixes") =
    Prop.forAll(genPair, genThreshold) { case ((a, b), (num, den)) =>
      !jaccardAtLeast(a, b, num, den) || {
        // the lemma holds for ANY global total order; alphabetical here
        val pa = a.toSeq.sorted.take(prefixLen(a.size, num, den)).toSet
        val pb = b.toSeq.sorted.take(prefixLen(b.size, num, den)).toSet
        (pa & pb).nonEmpty
      }
    }

  property("prefix length stays within [1, n]") =
    Prop.forAll(Gen.chooseNum(1, 10000), genThreshold) { case (n, (num, den)) =>
      val p = prefixLen(n, num, den)
      p >= 1 && p <= n
    }
}
