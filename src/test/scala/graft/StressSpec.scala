package graft

import org.apache.spark.sql.functions._

import graft.model.Segment
import graft.ops.{SegmentAlgebra, SegmentOps}

/** Compact scale stress: skewed keys and a single very long key exercise
  * the shapes that break at 100× — window ops under key skew, and the
  * per-key sequential kernels on a group far larger than typical.
  */
class StressSpec extends SparkSpec {
  import spark.implicits._

  test("coalesceIntervals handles 400k rows with one hot key") {
    // 100 normal keys x 1k rows + 1 hot key x 300k rows
    val df = spark.range(400000L).select(
      when(col("id") < 300000L, lit(0L)).otherwise((col("id") % 100L) + 1L).as("k"),
      (col("id") * 7L % 100000000L).as("s"))
      .withColumn("e", col("s") + 50L)
      .withColumn("id2", monotonically_increasing_id())
    val merged = SegmentOps.coalesceIntervals(df, "k", "s", "e", "id2", lit(10L))
      .groupBy(col("k"), col("session_id"))
      .agg(count(lit(1)).as("n"))
    val total = merged.agg(sum(col("n"))).head.getLong(0)
    assert(total == 400000L)
  }

  test("minhash LSH dedup sustains a 4x-replicated corpus (20k docs)") {
    // replicate sf0.1's 5000 docs 4x with shifted ids: every original
    // near-dup pair becomes a 4x4 clique across copies, and the band
    // join must absorb the 16x candidate growth without an all-pairs
    // blowup — candidates only form inside (band, signature) buckets,
    // which is what keeps this shape from going quadratic at 100 TB.
    val docs0 = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))
    val docs = (0L until 4L).map(i =>
        docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    assert(docs.count() == 20000L)
    val pairs = graft.ops.Dedup.minhashLshPairs(
      graft.ops.TextOps.shingleTable(docs, "doc_id", "text", 3),
      "doc_id", bands = 8, minJaccard = 0.5)
    val n = pairs.count()
    // each of the 5000 originals matches its 3 clones exactly (jaccard 1)
    // -> at least 5000 * 3 identical-copy pairs beyond the original 256
    assert(n >= 15000L, s"expected at least the cross-copy clique pairs, got $n")
    // the op's eager caches (shingle + signature tables at 4x scale) must
    // not stay pinned in the suite-wide session
    spark.catalog.clearCache()
  }

  test("connectedComponents absorbs the 4x-replica clique graph") {
    // the same 4x replication: every original near-dup pair becomes a
    // 4-clique of copies (plus cross-pair edges), a dense many-component
    // graph ~20k edges — star contraction must converge and every
    // replica group must land in one component with its copies
    val docs0 = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))
    val docs = (0L until 4L).map(i =>
        docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val pairs = graft.ops.Dedup.minhashLshPairs(
      graft.ops.TextOps.shingleTable(docs, "doc_id", "text", 3),
      "doc_id", bands = 8, minJaccard = 0.5)
    val cc = graft.ops.Dedup.connectedComponents(pairs, "a", "b")
    // every doc that appears in a pair got a label, and each label is the
    // component min: no label exceeds its id, and every component's
    // min-labeled member labels itself
    val bad = cc.filter(col("component") > col("id")).count()
    assert(bad == 0L, "a label exceeds its node id")
    // the 4 copies of any doc are jaccard-1 pairs -> same component:
    // labels of clones (id % 1000000) must agree across replicas
    val split = cc.select((col("id") % 1000000L).as("orig"), col("component"))
      .groupBy(col("orig")).agg(countDistinct(col("component")).as("nc"))
      .filter(col("nc") > 1L).count()
    assert(split == 0L, "replica copies of one doc landed in different components")
    spark.catalog.clearCache()
  }

  test("connectedComponents collapses a 100k-node path graph (diameter = n)") {
    // the adversarial case the star-contraction rounds exist for:
    // boilerplate dup CHAINS where a–b–c–… links one component across
    // the whole corpus. Naive min-propagation needs `diameter` rounds
    // (100k here — fatal); alternating large/small star must converge
    // in O(log² n) and label every node with the chain's minimum.
    val n = 100000L
    val pairs = spark.range(n - 1).select(
      col("id").as("a"), (col("id") + 1L).as("b"))
    val cc = graft.ops.Dedup.connectedComponents(pairs, "a", "b", maxIter = 30)
    val agg = cc.agg(count(lit(1)), countDistinct(col("component")),
      max(col("component")), count(when(col("component") =!= 0L, 1))).head
    assert(agg.getLong(0) == n, "every chain node labeled")
    assert(agg.getLong(1) == 1L, "one component")
    assert(agg.getLong(2) == 0L && agg.getLong(3) == 0L,
      "every label is the chain minimum")
  }

  test("substringDupSpans sustains the 4x-replicated corpus") {
    // 4x replication makes every identical-copy pair share its FULL
    // token run: each of the 5000 eligible docs contributes C(4,2)=6
    // whole-doc spans, and every original cross-doc span becomes a 4x4
    // clique (16 copies). The seed join only pairs rows inside one
    // k-gram bucket, so candidate volume grows with true duplication
    // (16x), never with corpus size squared.
    val docs0 = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))
    val docs = (0L until 4L).map(i =>
        docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val k = 10
    val spans = graft.ops.Dedup.substringDupSpans(docs, "doc_id", "text", k)
      .withColumn("oa", col("a") % 1000000L)
      .withColumn("ob", col("b") % 1000000L)
      .cache()
    val origSpans = graft.ops.Dedup.substringDupSpans(docs0, "doc_id", "text", k)
    val nOrig = origSpans.count()
    val nEligible = docs0
      .filter(size(graft.ops.TextOps.tokens(col("text"))) >= k).count()
    // identical-copy spans: replica pairs of one doc (oa == ob) whose
    // span covers the whole token run, 6 per eligible doc
    val selfFull = spans.filter(col("oa") === col("ob")).count()
    assert(selfFull >= nEligible * 6,
      s"expected >= ${nEligible * 6} whole-doc replica spans, got $selfFull")
    // every original cross-doc span appears for all 16 copy pairs —
    // canonicalize orientation first: when the a-side copy index exceeds
    // the b-side's, the pair surfaces flipped (id order decides a vs b)
    val crossByPair = spans.filter(col("oa") =!= col("ob"))
      .select(
        least(col("oa"), col("ob")).as("olo"),
        greatest(col("oa"), col("ob")).as("ohi"),
        when(col("oa") < col("ob"), col("a_start")).otherwise(col("b_start"))
          .as("lo_start"),
        when(col("oa") < col("ob"), col("b_start")).otherwise(col("a_start"))
          .as("hi_start"),
        col("span_len"))
      .groupBy(col("olo"), col("ohi"), col("lo_start"), col("hi_start"),
        col("span_len"))
      .agg(count(lit(1)).as("copies"))
    assert(crossByPair.filter(col("copies") =!= 16L).count() == 0L,
      "some original span did not replicate into the full 4x4 clique")
    assert(crossByPair.count() == nOrig, "cross-doc span multiset changed")
    spans.unpersist()
    spark.catalog.clearCache()
  }

  test("stftFrames streams a 2M-sample waveform and reassembles exactly") {
    import graft.pipeline.SpeechPipeline
    // hour-scale audio: framing must stay a flatMap (one frame of state
    // per step, never padded-waveform × frame-count); count follows the
    // reference formula and reassembly is the exact inverse
    val n = 2000000
    val rnd = new scala.util.Random(5)
    val w = Array.fill(n)(rnd.nextFloat() * 2f - 1f)
    val ds = Seq(graft.model.AudioFile("big", 16000, w)).toDS()
    val chunkSize = 1024; val nFft = 512
    val gen = chunkSize - nFft
    val frames = SpeechPipeline.stftFrames(ds, chunkSize, nFft)
    val pad = gen - n % gen
    assert(frames.count() == (n + pad) / gen)
    val back = SpeechPipeline.stftReassemble(frames, chunkSize, nFft)
      .collect().head.waveform
    assert(back.length == n)
    var i = 0
    while (i < n) { assert(back(i) == w(i)); i += 1 }
  }

  test("FLAC codec round-trips a 2M-sample waveform across ~490 frames") {
    import graft.pipeline.FlacAudio
    val n = 2000000
    val rnd = new scala.util.Random(6)
    val w = Array.fill(n)((rnd.nextFloat() * 2f - 1f) * 0.7f)
    val flac = FlacAudio.encode(16000, w, lpc = true)
    val (sr, back) = FlacAudio.decode(flac)
    assert(sr == 16000 && back.length == n)
    var i = 0
    while (i < n) {
      assert(math.round(back(i) * 32768f) ==
        math.round(math.max(-1f, math.min(1f, w(i))) * 32767f))
      i += 1
    }
  }

  test("eventTimeAttribution conserves credit over 100k hot-key touches") {
    import graft.streaming.TemporalEnrich
    import graft.streaming.TemporalEnrich.{AttrCredit, AttrInput}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AttrInput]
    // 100k touches at 1 ms spacing on ONE key; conversions every 1000 ms
    // credit the 500 ms window (≈500 touches each) — state must stay the
    // pruned window, and every conversion's cents must conserve exactly
    val out = TemporalEnrich.eventTimeAttribution(input.toDS(), "0 seconds",
      window = 500L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("attr_stress").start()
    try {
      val touches = (0 until 100000).map(i =>
        AttrInput("hot", new java.sql.Timestamp(i.toLong), isConv = false,
          tie = i.toLong, cents = 0L))
      val convs = (1 until 100).map(c =>
        AttrInput("hot", new java.sql.Timestamp(c * 1000L), isConv = true,
          tie = 1000000L + c, cents = 997L))
      input.addData(touches.take(60000) ++ convs.take(50))
      q.processAllAvailable()
      input.addData(touches.drop(60000) ++ convs.drop(50))
      q.processAllAvailable()
      input.addData(AttrInput("flush", new java.sql.Timestamp(10000000L),
        isConv = true, tie = 0L, cents = 0L))
      q.processAllAvailable()
      val credits = spark.table("attr_stress").as[AttrCredit]
        .collect().filter(_.k == "hot")
      val byConv = credits.groupBy(_.convId)
      // convs 51-59 arrive in batch 2 BEHIND the watermark (59 999 ms
      // from batch 1's touches) — withWatermark drops them at the
      // source, the standard late-data contract every kernel here
      // documents. Everything the operator actually saw conserves.
      val missing = (1 until 100).map(c => 1000000L + c).filterNot(byConv.contains)
      assert(byConv.size == 90,
        s"expected 90 credited conversions, got ${byConv.size}; missing: $missing")
      assert(missing == (51 to 59).map(c => 1000000L + c),
        s"late-drop set changed: $missing")
      byConv.foreach { case (cid, cs) =>
        assert(cs.map(_.credit).sum == 997L, s"conversion $cid lost cents")
        assert(cs.length == 500, s"conversion $cid credited ${cs.length} touches")
      }
    } finally q.stop()
  }

  test("sweepLineActiveSets sustains a 100k-interval single file (SURVEY §7.4.3 risk)") {
    // one file, 100k overlapping speaker intervals, 40 speakers: the
    // flatMapGroups kernel holds O(n) events plus the bounded 40-entry
    // active-count map — never a per-elementary-interval blowup. The
    // label churn (every end cancels its start) keeps counts exact.
    import graft.model.SpeakerSegment
    val segs = spark.range(100000L).select(
      lit("one").as("file"),
      concat(lit("sp"), (col("id") % 40L).cast("string")).as("speaker"),
      (col("id").cast("double") * 1.5d).as("start"),
      (col("id").cast("double") * 1.5d + 90d).as("end"))
      .as[SpeakerSegment]
    val out = SegmentAlgebra.sweepLineActiveSets(segs)
    val agg = out.groupBy().agg(count(lit(1)).as("n"),
      max(size(col("speakers"))).as("widest"),
      sum(col("end") - col("start")).as("span")).head
    // elementary intervals: boundaries are the distinct event times
    assert(agg.getLong(0) > 100000L && agg.getLong(0) < 300000L,
      s"unexpected elementary interval count ${agg.getLong(0)}")
    // steady state: 60 concurrent intervals over 40 speakers
    assert(agg.getInt(1) == 40, s"widest active set ${agg.getInt(1)}")
    // total covered span = last end - first start (fully covered line)
    assert(math.abs(agg.getDouble(2) - (99999 * 1.5 + 90.0)) < 1e-6)
  }

  test("sessionizeCapped kernel sustains a 200k-segment single key") {
    val segs = spark.range(200000L).select(
      lit("one").as("file"),
      (col("id").cast("double") * 3d).as("start"),
      (col("id").cast("double") * 3d + 2d).as("end"))
      .as[Segment]
    val out = SegmentAlgebra.sessionizeCapped(segs, gap = 2d, maxDuration = 30d)
    val agg = out.groupBy().agg(sum(col("n")), count(lit(1))).head
    assert(agg.getLong(0) == 200000L)
    // gap=1 between consecutive (<=2), cap 30 -> 10 members per session
    assert(agg.getLong(1) == 20000L)
  }
}
