package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.expr.SpaceSavingAgg

/** Space-Saving summary laws, driven directly through the Aggregator's
  * reduce/merge/finish (no Spark session — ScalaCheck speed), over
  * random streams, random partition splits, and random merge trees:
  *
  *  - exact regime (distinct keys <= capacity): the summary equals the
  *    exact counts under ANY partitioning — the lattice property the
  *    oracle query relies on;
  *  - eviction regime: every key with true count > n/capacity is
  *    present, `est - err <= true` for every present key, and the
  *    overestimate is bounded by n/capacity — the classic guarantees,
  *    preserved across merges (Agarwal et al. 2012).
  */
object SketchProps extends Properties("SpaceSavingAgg") {

  private def run(agg: SpaceSavingAgg, parts: Seq[Seq[String]]): Seq[SpaceSavingAgg.Entry] = {
    val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    // fold buffers pairwise left-to-right; splits already randomize shape
    agg.finish(bufs.foldLeft(agg.zero)(agg.merge))
  }

  private def split(xs: Seq[String], cuts: Seq[Int]): Seq[Seq[String]] = {
    val sorted = (cuts.map(c => math.abs(c) % (xs.length + 1)).distinct.sorted
      :+ xs.length).distinct
    (0 +: sorted).sliding(2).collect {
      case Seq(a, b) if b > a => xs.slice(a, b)
    }.toSeq
  }

  private val genStream: Gen[List[String]] =
    Gen.listOfN(300, Gen.frequency(
      8 -> Gen.oneOf("hot1", "hot2", "hot3"),
      3 -> Gen.choose(0, 11).map(i => s"warm$i"),
      2 -> Gen.choose(0, 199).map(i => s"cold$i")))

  private val genCuts: Gen[List[Int]] = Gen.listOfN(6, Gen.choose(0, 300))

  property("exact regime: any partitioning yields the exact counts") =
    Prop.forAll(genStream, genCuts) { (xs, cuts) =>
      val agg = new SpaceSavingAgg(256, 256) // >= 215 possible keys
      val got = run(agg, split(xs, cuts))
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      got.forall(e => e.err == 0L && exact.get(e.key).contains(e.est)) &&
        got.size == exact.size &&
        got.map(e => (-e.est, e.key)) == got.map(e => (-e.est, e.key)).sorted
    }

  property("eviction regime: heavy hitters present, bounds hold") =
    Prop.forAll(genStream, genCuts) { (xs, cuts) =>
      val cap = 16
      val agg = new SpaceSavingAgg(cap, cap)
      val got = run(agg, split(xs, cuts))
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = xs.length.toLong / cap
      val present = got.map(e => e.key -> e).toMap
      exact.forall { case (k, t) =>
        t <= bound || present.contains(k) } &&
        got.forall(e => e.est - e.err <= exact.getOrElse(e.key, 0L)) &&
        got.forall(e => e.est <= exact.getOrElse(e.key, 0L) + bound)
    }

  property("single stream: est always dominates the true count") =
    Prop.forAll(genStream) { xs =>
      val agg = new SpaceSavingAgg(16, 16)
      val got = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      got.forall(e => e.est >= exact.getOrElse(e.key, 0L))
    }

  // ---- HyperLogLog laws (graft.expr.HllSketchAgg) ----

  private def md5Top60(x: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString.take(15), 16)

  private val genIds: Gen[List[Int]] =
    Gen.listOfN(400, Gen.choose(0, 999))

  property("HLL: any partitioning/order yields the identical summary") =
    Prop.forAll(genIds, genCuts) { (ids, cuts) =>
      val agg = new graft.expr.HllSketchAgg(4)
      val hs = ids.map(i => md5Top60(i.toString))
      val whole = agg.finish(hs.foldLeft(agg.zero)(agg.reduce))
      val parts = split(hs.map(_.toString), cuts)
        .map(_.map(_.toLong).foldLeft(agg.zero)(agg.reduce))
      val merged = agg.finish(parts.foldLeft(agg.zero)(agg.merge))
      val shuffled = agg.finish(hs.reverse.foldLeft(agg.zero)(agg.reduce))
      merged == whole && shuffled == whole
    }

  property("HLL: duplicate insertion is idempotent; raw estimate is in range") =
    Prop.forAll(genIds) { ids =>
      val agg = new graft.expr.HllSketchAgg(4)
      val hs = ids.map(i => md5Top60(i.toString))
      val once = agg.finish(hs.foldLeft(agg.zero)(agg.reduce))
      val twice = agg.finish((hs ++ hs).foldLeft(agg.zero)(agg.reduce))
      val distinct = hs.distinct.size
      val est = 0.673 * 256.0 * 1.44115188075855872e17 / once.s_scaled.toDouble
      // raw HLL error is ~1.04/sqrt(16) ≈ 26% — allow 4 sigma plus the
      // small-range bias (the raw estimator undershoots tiny counts)
      (twice == once) && (distinct == 0 || est <= distinct * 3.0 + 3.0)
    }
}
