package graft

import org.apache.spark.sql.functions._

import graft.ops.{SegmentOps, TextOps}

/** Window-pattern operators: reference edge semantics from FIXTURES.md. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("slidingWindows reproduces the reference hop-count formula") {
    // dur=10,w=3,h=2 -> 5 windows; dur=9,w=3,h=3 -> 3; dur=1 -> 1 unsliced
    val df = Seq(("a", 0L, 10L), ("b", 0L, 9L), ("c", 0L, 1L)).toDF("k", "s", "e")
    val w32 = SegmentOps.slidingWindows(df.filter($"k" === "a"), "s", "e", 3L, 2L)
    assert(w32.count() == 5)
    assert(w32.agg(max($"win_end")).head.getLong(0) == 10L)
    val w33 = SegmentOps.slidingWindows(df.filter($"k" === "b"), "s", "e", 3L, 3L)
    assert(w33.count() == 3)
    val short = SegmentOps.slidingWindows(df.filter($"k" === "c"), "s", "e", 3L, 2L)
    val row = short.select("win_start", "win_end").head
    assert(row.getLong(0) == 0L && row.getLong(1) == 1L)
  }

  test("coalesceIntervals merges overlapping and gap-close intervals") {
    val df = Seq(
      ("f", 0L, 10L, 1L), ("f", 5L, 8L, 2L), ("f", 12L, 20L, 3L),
      ("f", 100L, 110L, 4L)).toDF("k", "s", "e", "id")
    val sessions = SegmentOps.coalesceIntervals(df, "k", "s", "e", "id", lit(3L))
      .groupBy($"k", $"session_id").agg(min($"s").as("s"), max($"e").as("e"))
      .orderBy($"s").collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(sessions.toSeq == Seq((0L, 20L), (100L, 110L)))
  }

  test("runningMaxDedup keeps only strictly-increasing values") {
    val df = Seq(("f", 1L, 1L, 5L), ("f", 2L, 2L, 3L), ("f", 3L, 3L, 8L),
      ("f", 4L, 4L, 8L)).toDF("k", "t", "id", "v")
    val kept = SegmentOps.runningMaxDedup(df, "k", "t", "id", "v")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L))
  }

  test("shingles builds word n-grams; short docs yield none") {
    val df = Seq((1L, "a b c d"), (2L, "x y")).toDF("id", "text")
    val sh = df.select($"id", TextOps.shingles(TextOps.tokens($"text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L) == Seq("a b c", "b c d"))
    assert(sh(2L).isEmpty)
  }

  test("tokenCount == size(tokens) on exotic whitespace (oracle split-on-space contract)") {
    // every oracle mirrors string_split(text, ' '): tabs/newlines/form
    // feeds stay INSIDE tokens. tokenCount must count identically, or a
    // regenerated corpus with one newline flips t_pivot_matrix red.
    val texts = Seq(
      "a b c", " a  b ", "a\tb c\nd", "\n", "\t\t", "", "   ",
      "x\r\ny zq", "one", " lead", "trail ", "a b c")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select(col("id"),
        size(TextOps.tokens(col("text"))).cast("long").as("via_tokens"),
        TextOps.tokenCount(col("text")).as("via_count"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"id=${r.getLong(0)} '${texts(r.getLong(0).toInt)}': " +
          s"size(tokens)=${r.getLong(1)} tokenCount=${r.getLong(2)}")
    }
  }

  test("fingerprint normalizes case and whitespace") {
    val df = Seq((1L, "Hello   World"), (2L, " hello world ")).toDF("id", "text")
    val fps = df.select(TextOps.fingerprint($"text").as("fp"))
      .collect().map(_.getString(0)).toSeq
    assert(fps.distinct.length == 1)
  }

  test("langId picks the marker set with the most hits, ties to earlier") {
    val df = Seq(
      (1L, "the cat of the house and a dog"),
      (2L, "el perro de la casa y el gato"),
      (3L, "nothing matches here")).toDF("id", "text")
    val got = df.select($"id", TextOps.langId(TextOps.tokens($"text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en" && got(2L) == "es" && got(3L) == "en")
  }

  test("simhashPairs uneven bands == brute force at maxHamming 1 and 4") {
    // maxHamming=4 needs 5 bands over 16 bits (sizes 4,3,3,3,3) — equal
    // ceil-width bands would leave a constant zero band (all-pairs)
    val rnd = new scala.util.Random(7)
    val sigs = (0L until 60L).map(i => (i, rnd.nextInt(1 << 16).toLong))
    val df = sigs.toDF("doc_id", "simhash")
    for (maxH <- Seq(1, 4)) {
      val got = graft.ops.Dedup.simhashPairs(df, "doc_id", maxH)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (a, sa) <- sigs; (b, sb) <- sigs if a < b
        h = java.lang.Long.bitCount(sa ^ sb) if h <= maxH
      } yield (a, b, h.toLong)).toSet
      assert(got == want, s"maxHamming=$maxH")
    }
  }

  test("saltedReplicateJoin == plain inner join, incl. dup keys and hot key") {
    val rnd = new scala.util.Random(11)
    // hot key 0 dominates; small side has duplicate keys too
    val big = (0 until 5000).map(i =>
      (if (rnd.nextDouble() < 0.7) 0L else rnd.nextInt(40).toLong, i.toLong))
      .toDF("k", "payload")
    val small = ((0 until 40).map(i => (i.toLong, s"d$i")) ++ Seq((0L, "dup0")))
      .toDF("k", "label")
    for (salts <- Seq(1, 5)) {
      val got = graft.ops.SegmentOps.saltedReplicateJoin(big, small, "k", salts)
      assert(!got.columns.contains("__salt"))
      val want = big.join(small, "k")
      assert(got.count() == want.count(), s"salts=$salts row count")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"salts=$salts multiset mismatch")
    }
  }

  test("KMV sketch == brute-force k smallest distinct hashes, any partitioning") {
    val rnd = new scala.util.Random(23)
    val hs = (0 until 500).map(_ => rnd.nextLong().abs % (1L << 60))
    val dup = hs ++ hs.take(100) // duplicates must not count twice
    val want = dup.distinct.sorted.take(16)
    val kmv = udaf(new graft.expr.KmvSketchAgg(16))
    for (parts <- Seq(1, 7)) {
      val got = dup.toDF("h").repartition(parts)
        .agg(kmv($"h").as("k")).select("k.n_min", "k.kth_min").head
      assert(got.getLong(0) == 16L && got.getLong(1) == want.last,
        s"parts=$parts")
    }
    // under-full buffer: exact mode, kth_min absent
    val r = Seq(5L, 7L, 5L, 9L).toDF("h")
      .agg(kmv($"h").as("k")).select("k.n_min", "k.kth_min").head
    assert(r.getLong(0) == 3L && r.isNullAt(1))
  }

  test("substringDupSpans == brute-force maximal shared runs (k-gram seeds)") {
    val corpus = Seq(
      1L -> "a b c d e f g h i j k l m n o p",
      2L -> "z z a b c d e f g h i j k l q r s",     // shares a..l with 1
      3L -> "c d e f g h i j k l m n o p q",         // shares c..p with 1
      4L -> "q w e r t y u i o p a s d f g h j k l", // nothing >= 5 shared
      5L -> "a b c d e x a b c d e y a b c d e")     // two diagonals vs 1
    val docs = corpus.toDF("doc_id", "text")
    val k = 5
    val got = graft.ops.Dedup.substringDupSpans(docs, "doc_id", "text", k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    def seeds(t: String): Seq[(String, Int)] =
      t.split(" ").filter(_.nonEmpty).toSeq.sliding(k).filter(_.size == k)
        .map(_.mkString(" ")).zipWithIndex.toSeq
    def runs(ps: Seq[Int]): Seq[Seq[Int]] =
      ps.sorted.foldLeft(Vector.empty[Vector[Int]]) {
        case (acc, p) if acc.nonEmpty && acc.last.last == p - 1 =>
          acc.init :+ (acc.last :+ p)
        case (acc, p) => acc :+ Vector(p)
      }
    val want = (for {
      (a, ta) <- corpus; (b, tb) <- corpus if a < b
      matches = for { (g, pa) <- seeds(ta); (h, pb) <- seeds(tb) if g == h }
        yield (pa, pb)
      (diag, ps) <- matches.groupBy { case (pa, pb) => pa - pb }
      run <- runs(ps.map(_._1))
    } yield (a, b, run.head.toLong, (run.head - diag).toLong,
      (run.length + k - 1).toLong)).toSet
    assert(got == want)
    // the 12-token shared run between 1 and 2 surfaces as one maximal span
    assert(got.contains((1L, 2L, 0L, 2L, 12L)))
    // doc 5 repeats a 5-token block: one span per alignment diagonal
    assert(got.count { case (a, b, _, _, _) => a == 1L && b == 5L } == 3)
  }

  test("incrementalNearDups == full pair set restricted to pairs touching new") {
    // same signatures either way, so the incremental probe must return
    // exactly the full-corpus near-dup pairs that involve >=1 new doc,
    // reoriented new-first with the match side tagged
    val base = Seq(
      "the quick brown fox jumps over the lazy dog again and again today",
      "pack my box with five dozen liquor jugs before noon strikes twice",
      "sphinx of black quartz judge my vow said the curious old raven")
    val docs = (0L until 30L).map { i =>
      val t = base((i % 3).toInt)
      // thirds are near-identical variants: one word tweaked per doc
      (i, if (i < 3) t else t + " v" + (i % 5))
    }.toDF("doc_id", "text")
    val sd = graft.ops.TextOps.shingleTable(docs, "doc_id", "text", 3)
    val isNew = (id: Long) => id % 4 == 1
    val inc = graft.ops.Dedup.incrementalNearDups(
        sd.where($"doc_id" % 4 =!= 1), sd.where($"doc_id" % 4 === 1),
        "doc_id", 8, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val full = graft.ops.Dedup.minhashLshPairs(sd, "doc_id", 8, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = full.flatMap { case (a, b) =>
      (isNew(a), isNew(b)) match {
        case (true, true)   => Some((a, b, "new"))    // lower id first
        case (true, false)  => Some((a, b, "seen"))
        case (false, true)  => Some((b, a, "seen"))   // reorient new-first
        case (false, false) => None                   // never generated
      }
    }.toSet
    assert(inc == want)
    assert(inc.nonEmpty, "test corpus must actually produce near-dups")
  }

  test("connectedComponents == union-find on random graphs, paths, cliques") {
    def bruteCC(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
      graft.ops.Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // path of 65 nodes: worst case for diameter-bound propagation —
    // star contraction must converge well inside maxIter=30
    val path = (0L until 64L).map(i => (i, i + 1))
    val gotPath = run(path)
    assert((0L to 64L).forall(gotPath(_) == 0L))
    // dense clique + random graphs at three densities, adversarial
    // orientation (b, a) and duplicate edges mixed in
    val rnd = new scala.util.Random(42)
    for (p <- Seq(0.01, 0.05, 0.3)) {
      val n = 80
      val edges = (for {
        a <- 0 until n; b <- a + 1 until n if rnd.nextDouble() < p
      } yield (a.toLong, b.toLong)) ++ Seq((5L, 3L), (3L, 5L), (5L, 3L))
      val want = bruteCC(n, edges)
      val got = run(edges)
      // kernel labels only incident nodes; brute labels all — restrict
      val incident = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(got == want.filter(kv => incident(kv._1)), s"p=$p")
    }
    // empty pair table -> empty labeling, no throw
    assert(run(Seq.empty[(Long, Long)]).isEmpty)
  }

  test("fused WinnowFingerprint == HOF winnowing, as sets, incl. edge cases") {
    val fn = graft.expr.WinnowFingerprint.register(spark, 8, 4)
    val docs = Seq(
      "The quick brown fox jumps over the lazy dog! 123",
      "the QUICK brown fox jumps over the lazy dog 123",  // case/punct-invariant
      "short",                                            // canon < k -> empty
      "exactly8!",                                        // canon == k -> 1 gram < w
      "",                                                 // empty
      "aaaaaaaaaaaaaaaaaaaaaaaa",                         // constant text, 1 distinct fp
      "Pack my box with five dozen liquor jugs — naturally."
    ).zipWithIndex.map(_.swap).toDF("id", "text")
    // fallback=false: a broken doGenCode throws instead of silently
    // running interpreted — proves the generated call actually compiles
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val both =
      try docs
        .withColumn("fused", expr(s"$fn(text)"))
        .withColumn("hof", graft.ops.TextOps.winnowFingerprints(
          graft.ops.TextOps.winnowGramHashes($"text", 8), 4))
        .select($"id", array_sort($"fused").as("f"), array_sort($"hof").as("h"))
        .collect()
      finally spark.conf.set("spark.sql.codegen.fallback", "true")
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"doc ${r.getInt(0)}")
    }
    // invariance: docs 0 and 1 differ only in case/punctuation
    val fps = both.map(r => r.getSeq[String](1))
    assert(fps(0) == fps(1))
    assert(fps(2).isEmpty && fps(3).length == 1 && fps(4).isEmpty && fps(5).length == 1)
  }

  test("kmeansCells recovers planted clusters, deterministically") {
    // three tight planted families far apart in 4-d
    def fam(cx: Float, n: Int, off: Int) =
      (0 until n).map(i => (off + i.toLong,
        Array(cx + i * 0.01f, cx, -cx, cx * 2)))
    val emb = (fam(10f, 5, 0) ++ fam(-10f, 5, 100) ++ fam(0.5f, 5, 200))
      .toDF("vec_id", "embedding")
    val cells = graft.ops.MLlibOps.kmeansCells(emb, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // each family lands in ONE cell; families land in distinct cells
    val byFam = Seq(0, 100, 200).map(off =>
      (0 until 5).map(i => cells(off + i)).toSet)
    assert(byFam.forall(_.size == 1), s"family split across cells: $byFam")
    assert(byFam.flatten.toSet.size == 3)
    // seeded determinism across fits
    val again = graft.ops.MLlibOps.kmeansCells(emb, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again == cells)
  }

  test("orderLongestFirst range-partitions descending by duration (O1 LPT hint)") {
    val rnd = new scala.util.Random(5)
    val df = (1 to 400).map(i => (i.toLong, i * 10L, i * 10L + rnd.nextInt(1000)))
      .toDF("id", "s", "e")
    val parted = graft.ops.SegmentOps.orderLongestFirst(df, "s", "e")
    // plan shape: a range-partitioning exchange on (e - s) DESC
    val plan = parted.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") && plan.contains("DESC"),
      s"expected a descending range exchange:\n$plan")
    // content preserved; earliest partitions hold the longest durations
    import org.apache.spark.sql.functions.spark_partition_id
    val rows = parted.withColumn("p", spark_partition_id())
      .collect().map(r => (r.getAs[Int]("p"), r.getAs[Long]("e") - r.getAs[Long]("s")))
    assert(rows.length == 400)
    val maxByPart = rows.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).max) }
    val minByPart = rows.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).min) }
    for (p <- maxByPart.keys if minByPart.contains(p + 1))
      assert(minByPart(p) >= maxByPart(p + 1),
        s"partition $p should hold durations >= partition ${p + 1}")
  }

  test("allocateBudget: exact Hamilton allocation — sums to budget, floor/floor+1 only") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 5) {
      val groups = (1 to 2 + rnd.nextInt(8))
        .map(i => (s"g$i", 1L + rnd.nextInt(1000000).toLong))
      val budget = 1L + rnd.nextInt(10000000).toLong
      val total = groups.map(_._2).sum
      val got = graft.ops.Curation.allocateBudget(
          groups.toDF("grp", "tokens"), "grp", "tokens", budget)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.map(_._3).sum == budget, s"trial $trial: allocs must sum to budget")
      got.foreach { case (g, t, a) =>
        val fl = budget * t / total
        assert(a == fl || a == fl + 1, s"trial $trial $g: $a not in {$fl, ${fl + 1}}")
      }
      // proportionality: at most one token from exact proportion per group
      got.foreach { case (g, t, a) =>
        assert(math.abs(a - budget.toDouble * t / total) <= 1.0, s"trial $trial $g")
      }
    }
  }

  test("polyval expression matches manual Horner, interpreted and codegen") {
    val name = graft.expr.Polyval.register(spark, "test", Seq(2.0, -1.0, 0.5))
    val df = Seq(0.0, 0.5, 1.0, -2.0).toDF("x")
      .withColumn("p", expr(s"$name(x)"))
      .withColumn("manual", (lit(2.0) * $"x" + lit(-1.0)) * $"x" + lit(0.5))
    assert(df.filter($"p" =!= $"manual").count() == 0)
  }

  test("scrubPii: typed placeholders, per-category counts, ordered passes") {
    val df = Seq(
      (1L, "write bob.smith+x@mail7.co or call 555-123-4567 now"),
      (2L, "server at 10.0.254.3 and 192.168.1.1 up"),
      // not an email (no alpha TLD after a dot) — the IP pass picks up
      // the dotted quad even though an '@' precedes it
      (3L, "ping a@1.2.3.44 x"),
      (4L, "clean text, nothing to scrub"),
      (5L, "edge 555-000-0000 and 555-11 2222")).toDF("id", "text")
    val got = graft.ops.Curation.scrubPii(df, "id", "text")
      .orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got(0) == ((1L, "write <EMAIL> or call <PHONE> now", 1L, 1L, 0L)))
    assert(got(1) == ((2L, "server at <IP> and <IP> up", 0L, 0L, 2L)))
    assert(got(2) == ((3L, "ping a@<IP> x", 0L, 0L, 1L)))
    assert(got(3) == ((4L, "clean text, nothing to scrub", 0L, 0L, 0L)))
    // 555-11 2222 is NOT a phone (needs 3-3-4 digit groups)
    assert(got(4)._4 == 1L && got(4)._2 == "edge <PHONE> and 555-11 2222")
  }

  test("asofJoin: inclusive at equal ts, right deduped by tie, null when no prior") {
    val left = Seq((1L, "k", 10L), (2L, "k", 5L), (3L, "k", 3L), (4L, "z", 7L))
      .toDF("id", "g", "ts")
    val right = Seq((100L, "k", 5L, 50L), (101L, "k", 5L, 60L), (102L, "k", 8L, 80L))
      .toDF("rid", "g", "ts", "v")
    val got = SegmentOps.asofJoin(left, right, "g", "ts", "ts", "rid", Seq("v"))
      .select($"id", $"asof.ts".as("rts"), $"asof.v".as("rv"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 8L, 80L),    // latest strictly-earlier right row
      (2L, 5L, 60L),    // equal ts is visible; rid 101 wins the (k,5) tie
      (3L, -1L, -1L),   // nothing at or before ts=3
      (4L, -1L, -1L)))  // key with no right rows at all
  }

  test("asofJoin matches the brute-force point-in-time model on random data") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 5) {
      val keys = Seq("a", "b", "c")
      val lrows = (1 to 40).map(i =>
        (i.toLong, keys(rnd.nextInt(3)), rnd.nextInt(20).toLong))
      val rrows = (1 to 40).map(i =>
        (100L + i, keys(rnd.nextInt(3)), rnd.nextInt(20).toLong,
          rnd.nextInt(1000).toLong))
      // model: dedupe right per (key, ts) by max tie, then per left row
      // take the max right ts <= left ts
      val rDedup = rrows.groupBy(r => (r._2, r._3))
        .map { case (_, xs) => xs.maxBy(_._1) }.toSeq
      val expect = lrows.map { case (id, k, ts) =>
        val cands = rDedup.filter(r => r._2 == k && r._3 <= ts)
        if (cands.isEmpty) (id, -1L, -1L)
        else { val m = cands.maxBy(_._3); (id, m._3, m._4) }
      }.sortBy(_._1)
      val got = SegmentOps.asofJoin(
          lrows.toDF("id", "g", "ts"), rrows.toDF("rid", "g", "ts", "v"),
          "g", "ts", "ts", "rid", Seq("v"))
        .select($"id", $"asof.ts", $"asof.v")
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(got == expect, s"trial $trial")
    }
  }

  test("dedupLines matches the brute-force first-occurrence model on random data") {
    val rnd = new scala.util.Random(43)
    for (trial <- 1 to 5) {
      val vocab = Seq("a", "b")     // tiny vocab forces cross-doc dup lines
      val docs = (1 to 20).map { id =>
        val n = rnd.nextInt(13)
        (id.toLong, (1 to n).map(_ => vocab(rnd.nextInt(2))).mkString(" "))
      }
      val L = 3
      // model: chunk into L-token lines, first (doc, line_no) keeps
      val allLines = docs.flatMap { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        toks.grouped(L).zipWithIndex.map { case (ts, i) =>
          (id, i.toLong, ts.mkString(" "), ts.length.toLong) }
      }
      val firstOf = allLines.groupBy(_._3)
        .map { case (line, xs) => line -> xs.map(x => (x._1, x._2)).min }
      val expect = allLines.groupBy(_._1).map { case (id, xs) =>
        (id, xs.size.toLong,
          xs.count(x => firstOf(x._3) != ((x._1, x._2))).toLong,
          xs.filter(x => firstOf(x._3) == ((x._1, x._2))).map(_._4).sum)
      }.toSeq.sortBy(_._1)
      val got = graft.ops.Curation.dedupLines(
          docs.toDF("id", "text"), "id", "text", lineLen = L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      assert(got == expect, s"trial $trial")
    }
  }

  test("dedupLines: global first occurrence wins; empty docs emit nothing") {
    val df = Seq(
      (1L, "a b c d e f g h i j"),            // lines: [a..e], [f..j]
      (2L, "a b c d e x y z w v"),            // first line duplicates doc 1's
      (3L, "f g h i j"),                      // duplicates doc 1's 2nd line
      (4L, ""),                               // no tokens -> no output row
      (5L, "q r s")).toDF("id", "text")       // short doc: one 3-token line
    val got = graft.ops.Curation.dedupLines(df, "id", "text", lineLen = 5)
      .orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, 0L, 10L),   // both lines first occurrences
      (2L, 2L, 1L, 5L),    // "a b c d e" dropped, keeps its x..v line
      (3L, 1L, 1L, 0L),    // its only line is a duplicate
      (5L, 1L, 0L, 3L)))   // partial trailing line counts its real length
  }

  test("Bloom filter: no false negatives, bit test == position-set test, any partitioning") {
    import graft.expr.{BloomFilter, BloomFilterAgg}
    val k = 2; val m = 256
    val build = (0L until 40L).map(_ * 7L)
    val probe = (0L until 400L)
    val bloomAgg = udaf(new BloomFilterAgg(m))
    // reference semantics: position-set membership
    def positions(key: Long): Seq[Int] = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (0 until k).map(i =>
        (java.lang.Long.parseLong(hex.substring(i * 8, i * 8 + 8), 16) % m).toInt)
    }
    val builtBits = build.flatMap(positions).toSet
    val want = probe.map(p => p -> positions(p).forall(builtBits)).toMap
    for (parts <- Seq(1, 5)) {
      val bits = build.toDF("key").repartition(parts)
        .select(BloomFilter.positions($"key", k, m).as("ps"))
        .agg(bloomAgg($"ps").as("bits"))
      val got = probe.toDF("key")
        .crossJoin(broadcast(bits))
        .select($"key", BloomFilter.mightContain($"bits",
          BloomFilter.positions($"key", k, m)).as("pass"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got == want, s"parts=$parts")
      build.foreach(b => assert(got(b), s"false negative for $b")) // never FN
    }
  }

  test("CMS sketch: est >= exact for all tokens, grid independent of partitioning") {
    import graft.expr.{CmsSketch, CmsSketchAgg}
    val d = 3; val w = 32 // tiny width forces collisions
    val rnd = new scala.util.Random(7)
    val stream = (0 until 2000).map(_ => s"tok${rnd.nextInt(50)}")
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cms = udaf(new CmsSketchAgg(d, w))
    val grids = Seq(1, 6).map { parts =>
      stream.toDF("tok").repartition(parts)
        .select(CmsSketch.cells($"tok", d, w).as("cs"))
        .agg(cms($"cs").as("grid"))
        .head.getSeq[Long](0)
    }
    assert(grids(0) == grids(1), "grid must not depend on partitioning")
    val ests = exact.keySet.toSeq.toDF("tok")
      .crossJoin(broadcast(stream.toDF("tok")
        .select(CmsSketch.cells($"tok", d, w).as("cs"))
        .agg(cms($"cs").as("grid"))))
      .select($"tok", CmsSketch.estimate($"grid",
        CmsSketch.cells($"tok", d, w)).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, c) =>
      assert(ests(t) >= c, s"$t: est ${ests(t)} < exact $c")
    }
    // each grid row's cells sum to the stream length (every row counts all)
    grids(0).grouped(w).foreach(row => assert(row.sum == stream.size.toLong))
  }

  test("cooccurrencePmi: hand-computed lift, unordered pairs, support floor") {
    val df = Seq("a b a b", "c c").toDF("text")
    val got = graft.ops.TextOps.cooccurrencePmi(df, "text",
        window = 1, minPairCount = 1L, k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(6), r.getLong(7), r.getDouble(8)))
    // N=6; (a,b): 3 pairs (both orders fold), num=18 den=4 lift=4.5;
    // (c,c): 1 pair, num=6 den=4 lift=1.5
    assert(got.toSeq == Seq(
      (1L, "a", "b", 3L, 18L, 4L, 4.5),
      (2L, "c", "c", 1L, 6L, 4L, 1.5)))
  }

  test("bpeTrainMerges: hand-computed merge rules with deterministic tie-break") {
    val df = Seq("low low low", "lower lower", "newest").toDF("text")
    val got = graft.ops.TextOps.bpeTrainMerges(df, "text", rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // r1: lo and ow both count 5 -> lexicographic tie-break picks (l,o);
    // r2: (lo,w) 5; r3: (low,e) 2 ties (e,r) 2 -> (e,r) smaller
    assert(got.toSeq == Seq(
      (1, "l", "o", "lo", 5L),
      (2, "lo", "w", "low", 5L),
      (3, "e", "r", "er", 2L)))
  }

  test("L114 bpeEncode: corpus tokenized with the learned merges, hand-computed histogram") {
    val df = Seq("low low low", "lower lower", "newest").toDF("text")
    val got = graft.ops.TextOps.bpeEncode(df, "text", rounds = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // merges (see bpeTrainMerges test): lo, low, er ->
    // low -> [low]x3; lower -> [low, er]x2; newest -> [n,e,w,e,s,t]x1
    assert(got.toSeq == Seq(("low", 5L), ("e", 2L), ("er", 2L),
      ("n", 1L), ("s", 1L), ("t", 1L), ("w", 1L)))
  }

  test("L124 bpeFertility: per-language token economy, hand-computed") {
    val df = Seq(("low low low", "aa"), ("lower lower", "bb"), ("newest", "bb"))
      .toDF("text", "lang")
    val (_, words) = graft.ops.TextOps.bpeTrainFull(df, "text", rounds = 3)
    val got = graft.ops.TextOps.bpeFertility(df, "text", "lang", words)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // merges lo/low/er: low -> 1 token, lower -> 2, newest -> 6
    // aa: 3 words, 9 chars, 3 tokens; bb: 3 words, 16 chars, 10 tokens
    assert(got.toSeq == Seq(
      ("aa", 3L, 9L, 3L, 1000L, 3000L),
      ("bb", 3L, 16L, 10L, 3333L, 1600L)))
  }

  test("snapshotDiff: all four statuses classified by fingerprint compare") {
    val oldDf = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val newDf = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "text")
    val got = graft.ops.Curation.snapshotDiff(oldDf, newDf, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("bottomKSample: matches hash-sort mirror, independent of partitioning") {
    def md5h(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.take(15), 16)
    }
    val rows = (0L until 200L).map(i => (if (i % 3 == 0) "a" else "b", i))
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map { case (_, id) => (g, id, md5h(id.toString)) }
        .sortBy { case (_, id, h) => (h, id) }.take(4).zipWithIndex
        .map { case ((gg, id, h), i) => (gg, i + 1L, id, h) }
    }.toSeq.sortBy(r => (r._1, r._2))
    Seq(1, 7).foreach { parts =>
      val got = graft.ops.Curation.bottomKSample(
          rows.toDF("g", "id").repartition(parts), "g", "id", 4)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq == want, s"parts=$parts")
    }
  }

  test("domainCap: blocklist dropped, best cap rows kept per host, n_host pre-cap") {
    val df = Seq(
      (1L, "https://a.com/p/1", 100L),
      (2L, "https://a.com/p/2", 300L),
      (3L, "https://a.com/p/3", 200L),
      (4L, "https://a.com/p/4", 300L), // ties with 2 -> id asc keeps both
      (5L, "https://bad.org/p/5", 999L),
      (6L, "https://b.net/p/6", 50L)
    ).toDF("doc_id", "url", "w")
    val got = graft.ops.Curation.domainCap(df, "doc_id", "url", "w",
        cap = 2, blocked = Seq("bad.org"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("a.com", 4L, 1L, 2L, 300L),
      ("a.com", 4L, 2L, 4L, 300L),
      ("b.net", 1L, 1L, 6L, 50L)))
  }

  test("decayedCounts: integer shift weights, one exact final division") {
    val day = 86400000000L
    val df = Seq(
      ("A", 10L), ("A", 20L), ("A", 2 * day + 5L), // days 0, 0, 2
      ("B", day + 7L)                               // day 1
    ).toDF("g", "tus")
    val got = graft.ops.Curation.decayedCounts(df, "g", "tus", day)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // dmin=0 dmax=2: A num = 1+1+4 = 6 -> 6/4 = 1.5; B num = 2 -> 0.5
    assert(got.toSeq == Seq(("A", 3L, 6L, 2L, 1.5), ("B", 1L, 2L, 2L, 0.5)))
    // a span beyond 62 half-lives must raise, not wrap the shift
    val wide = Seq(("A", 0L), ("A", 63L * day + 1L)).toDF("g", "tus")
    val e = intercept[Exception] {
      graft.ops.Curation.decayedCounts(wide, "g", "tus", day).collect()
    }
    assert(e.getMessage.contains("62 half-lives")
      || e.getCause != null && e.getCause.getMessage.contains("62 half-lives"))
  }

  test("zorderLayout: interleave is exact; z files prune both dims, linear only one") {
    import spark.implicits._
    // known interleave: b0=0b101, b1=0b011 -> z = 1·1 + 1·2 + 0·4 + 1·8 + 1·16 = 0b11011
    val z = Seq((5L, 3L)).toDF("b0", "b1")
      .select(graft.ops.Curation.zorderKey(col("b0"), col("b1"), 3).as("z"))
      .head().getLong(0)
    assert(z == 27L)
    // 64x64 grid, independent dims: 16 files of 256 rows. Z-order gives
    // every file a ~quarter-range envelope in BOTH dims; an x-sorted
    // linear layout leaves every file spanning ALL of y.
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y =>
      (x.toLong, y.toLong, (x * 64 + y).toLong))).toDF("x", "y", "tie")
    val zStats = graft.ops.Curation.zorderLayout(grid, "x", "y", "tie",
      bits = 6, rowsPerFile = 256).collect()
    assert(zStats.length == 16 && zStats.forall(_.getLong(1) == 256L))
    // predicate y in [0, 15]: z layout overlaps 4/16 files, linear 16/16
    def overlapY(lo: Long, hi: Long) =
      zStats.count(r => r.getLong(4) <= hi && r.getLong(5) >= lo)
    val linear = grid.withColumn("file_id",
        expr("(tie) div 256")).groupBy("file_id")
      .agg(min(col("y")).as("min_y"), max(col("y")).as("max_y")).collect()
    assert(overlapY(0L, 15L) == 4)
    assert(linear.count(r => r.getLong(1) <= 15L && r.getLong(2) >= 0L) == 16)
    // both dims stay tight: no z file spans more than half the x range either
    assert(zStats.forall(r => r.getLong(3) - r.getLong(2) <= 32L))
    // bucket-multiply overflow must raise, not wrap
    val big = Seq((0L, 0L, 0L), (Long.MaxValue / 10L, 1L, 1L)).toDF("x", "y", "tie")
    val eo = intercept[Exception] {
      graft.ops.Curation.zorderLayout(big, "x", "y", "tie", 12, 4).collect()
    }
    assert(eo.getMessage.contains("overflows")
      || eo.getCause != null && eo.getCause.getMessage.contains("overflows"))
  }

  test("chunkWindows: coverage, overlap, non-empty tail, short-doc identity") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // n=10 -> 3 chunks
      (2L, "a b c"),                                  // n <= max -> 1 chunk
      (3L, "   "),                                    // empty after filter
      (4L, (1 to 8).map(i => s"u$i").mkString(" "))   // n=8=max+stride -> 2 chunks
    ).toDF("doc_id", "text")
    val got = graft.ops.TextOps.chunkWindows(docs, "doc_id", "text", 4, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // stride == max: disjoint full coverage, tail chunk 2 tokens
    assert(got.filter(_._1 == 1L).map(_._4).toSeq ==
      Seq("t1 t2 t3 t4", "t5 t6 t7 t8", "t9 t10"))
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 3L, "a b c")))
    assert(!got.exists(_._1 == 3L) && got.forall(_._3 > 0L))
    assert(got.filter(_._1 == 4L).map(_._4).toSeq ==
      Seq("u1 u2 u3 u4", "u5 u6 u7 u8"))
    // overlapping stride: chunks share max - stride tokens
    val ov = graft.ops.TextOps.chunkWindows(
        docs.filter($"doc_id" === 1L), "doc_id", "text", 4, 2)
      .collect().map(_.getString(3))
    assert(ov.toSeq == Seq("t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8",
      "t7 t8 t9 t10"))
  }

  test("leakageSafeSplit: components share a split, singletons covered, all splits used") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, s"d$i")).toDF("doc_id", "name")
    // chain 1-2-3, pair 10-11, rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val got = graft.ops.Curation
      .leakageSafeSplit(docs, pairs, "doc_id", 10, 8, 9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.length == 40 && got.map(_._1).toSet == (1L to 40L).toSet)
    val byId = got.map(t => t._1 -> t).toMap
    assert(Seq(1L, 2L, 3L).map(byId(_)._4).distinct.size == 1)
    assert(byId(1L)._2 == 1L && byId(10L)._2 == 10L && byId(11L)._2 == 10L)
    assert(byId(20L)._2 == 20L) // singleton labels itself
    // bucket -> split boundaries honored everywhere
    assert(got.forall { case (_, _, b, sp) =>
      (b < 8 && sp == "train") || (b == 8 && sp == "val") || (b == 9 && sp == "test") })
  }

  test("pqAdcTopK: codebook rows reconstruct exactly, so PQ scores equal exact dots") {
    import spark.implicits._
    // corpus = exactly the 16 seed rows: every subvector IS a codebook
    // entry (d2 = 0 at its own code), reconstruction is lossless and the
    // ADC score must equal the exact integer dot product
    val vecs = (0 until 16).map { id =>
      (id.toLong, Array.tabulate(64)(j => ((id * 31 + j * 7) % 13 - 6) / 10f))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val q = graft.ops.Similarity.quantize(emb, "vec_id", "embedding")
    val got = graft.ops.Similarity
      .pqAdcTopK(q.filter($"vec_id" < 2), q, "vec_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val qv = vecs.map { case (id, a) =>
      id -> a.map(x => math.round(x.toDouble * 10000d)) }.toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val expect = (0L until 2L).flatMap { qid =>
      (0L until 16L).filter(_ != qid)
        .map(n => (qid, n, dot(qv(qid), qv(n))))
        .sortBy { case (_, n, s) => (-s, n) }.take(5).zipWithIndex
        .map { case ((qq, n, s), i) => (qq, i + 1L, n, s) }
    }
    assert(got.toSeq == expect)
  }

  test("sqAdcTopK: reconstruction within one cell width, ranks match exact dots") {
    import graft.ops.Similarity
    val L = 16
    val rnd = new scala.util.Random(3)
    val dim = 6
    val corpus = (0L until 40L).map(i =>
      (i, Array.fill(dim)(rnd.nextInt(20001) - 10000L).toSeq)).toDF("vec_id", "qv")
    val queries = corpus.filter($"vec_id" < 3)
    val got = Similarity.sqAdcTopK(queries, corpus, "vec_id", 5, L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val vecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // per-dim stats as the operator computes them
    val mins = (0 until dim).map(d => vecs.values.map(_(d)).min)
    val ws = (0 until dim).map(d => vecs.values.map(_(d)).max - vecs.values.map(_(d)).min + 1)
    def recon2l(v: Seq[Long]): Seq[Long] = (0 until dim).map { d =>
      val c = (v(d) - mins(d)) * L / ws(d)
      2L * L * mins(d) + (2 * c + 1) * ws(d)
    }
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val qq = vecs(qid)
      // scala-side mirror: score2l = q . recon2l, top-5 by (score desc, id)
      val want = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) =>
          (id, (0 until dim).map(d => qq(d) * recon2l(v)(d)).sum) }
        .sortBy { case (id, s) => (-s, id) }.take(5)
      assert(rows.sortBy(_._2).map(r => (r._3, r._4)).toSeq == want)
      // ADC score within sum_d |q_d| * w_d of the exact scaled dot
      want.foreach { case (id, s) =>
        val exact2l = (0 until dim).map(d => 2L * L * qq(d) * vecs(id)(d)).sum
        val bound = (0 until dim).map(d => math.abs(qq(d)) * ws(d)).sum
        assert(math.abs(s - exact2l) <= bound, s"q=$qid n=$id")
      }
    }
  }

  test("sqAdcPackedTopK: packed-nibble ADC scan bit-identical to unpacked, dim not 16-aligned") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(19)
    val dim = 6 // deliberately NOT a multiple of 16 — exercises zero-fill
    val corpus = (0L until 60L).map(i =>
      (i, Array.fill(dim)(rnd.nextInt(20001) - 10000L).toSeq)).toDF("vec_id", "qv")
    val queries = corpus.filter($"vec_id" < 4)
    val plain = Similarity.sqAdcTopK(queries, corpus, "vec_id", 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val packed = Similarity.sqAdcPackedTopK(queries, corpus, "vec_id", 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packed.toSeq == plain.toSeq)
  }

  test("LogHist: hand-computed buckets, bound law, quantile bucket is exact") {
    import graft.expr.LogHist
    // scala-side mirror of the bucket function for the law checks
    def bucketRef(x0: Long): Int = {
      val x = math.max(x0, 1L)
      val k = 63 - java.lang.Long.numberOfLeadingZeros(x)
      (k * 8 + (((x - (1L << k)) * 8L) >> k).toInt)
    }
    val xs = Seq(1L, 2L, 3L, 8L, 9L, 255L, 256L, 1L << 40, (1L << 40) + 12345L)
    val got = xs.toDF("x")
      .select($"x", LogHist.bucket($"x").as("b"),
        LogHist.rep8(LogHist.bucket($"x")).as("rep8"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // hand checks: 1 -> octave 0 sub 0; 3 -> k=1, sub=4; 9 -> k=3, sub=1;
    // 255 -> top sub-bucket of octave 7
    assert(got.map(_._2).toSeq == Seq(0, 8, 12, 24, 25, 63, 64, 320, 320))
    got.foreach { case (x, b, rep8) =>
      assert(b == bucketRef(x))
      val width = 1L << (b / 8) // bucket width = 2^k
      assert(rep8 <= 8 * x && 8 * x < rep8 + width,
        s"x=$x b=$b rep8=$rep8 width=$width") // relative error <= 1/8
    }
    // the sketch's chosen bucket CONTAINS the true ceil-rank quantile:
    // the histogram is exact per bucket, so rep8 = rep8(bucket(trueQ))
    val rnd = new scala.util.Random(11)
    val vals = (0 until 500).map(_ => 1L + rnd.nextInt(1 << 20).toLong)
    val qs = Seq((50, 1L, 2L), (90, 9L, 10L), (99, 99L, 100L))
    val est = graft.ops.Curation.logQuantiles(
        vals.map(("g", _)).toDF("g", "v"), "g", "v", qs)
      .collect().map(r => r.getInt(1) -> (r.getLong(3), r.getInt(4))).toMap
    val sorted = vals.sorted
    qs.foreach { case (pct, qn, qd) =>
      val rank = (vals.size * qn + qd - 1) / qd
      val trueQ = sorted((rank - 1).toInt)
      assert(est(pct)._1 == rank)
      assert(est(pct)._2 == bucketRef(trueQ),
        s"p$pct: bucket ${est(pct)._2} != bucket(trueQ=$trueQ)")
    }
  }

  test("sourceOverlap: shared-shingle counts and Jaccard match hand computation") {
    val df = Seq(
      (1L, "s1", "a b c d e"),   // shingles: abc bcd cde
      (2L, "s1", "a b c x y"),   // abc bcx cxy  -> s1 set: 5 distinct
      (3L, "s2", "a b c d q"),   // abc bcd cdq  -> s2 set: 3
      (4L, "s3", "p q r s t")    // pqr qrs rst  -> s3 set: 3, disjoint
    ).toDF("doc_id", "source", "text")
    val got = graft.ops.Curation.sourceOverlap(df, "source", "text", 3)
      .orderBy($"source_a", $"source_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // only pairs sharing >= 1 shingle appear: (s1,s2) share {abc, bcd}
    assert(got.toSeq == Seq(("s1", "s2", 5L, 3L, 2L, 2.0 / 6.0)))
  }

  test("vocabStats: token and type counts per group") {
    val df = Seq(
      (1L, "g1", "a b a b c"),
      (2L, "g1", "c d"),
      (3L, "g2", "x x x")).toDF("doc_id", "grp", "text")
    val got = graft.ops.Curation.vocabStats(df, "grp", "text")
      .orderBy($"grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("g1", 7L, 4L, 4.0 / 7.0), ("g2", 3L, 1L, 1.0 / 3.0)))
  }

  test("TopKAgg == sorted take(k) per group, any partitioning, dup ties stable") {
    val rnd = new scala.util.Random(41)
    val rows = (0 until 1200).map { i =>
      (s"g${i % 7}", rnd.nextInt(50).toLong, i.toLong) // heavy value ties
    }
    val want = rows.groupBy(_._1).view.mapValues(
      _.map(r => (r._2, r._3)).sortBy { case (v, id) => (-v, id) }.take(5)).toMap
    val topk = udaf(new graft.expr.TopKAgg(5))
    for (parts <- Seq(1, 9)) {
      val got = rows.toDF("g", "v", "id").repartition(parts)
        .groupBy($"g")
        .agg(topk($"v", $"id").as("tk"))
        .collect().map(r => r.getString(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getLong(0), e.getLong(1))))
        .toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("tfidfTopK: integer tf/df ranks match hand computation, ties by token") {
    val df = Seq(
      (1L, "apple apple banana common common"),
      (2L, "banana cherry common"),
      (3L, "cherry cherry common date")).toDF("doc_id", "text")
    val got = graft.ops.TextOps.tfidfTopK(df, "doc_id", "text", 3)
      .orderBy($"doc_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // doc1: apple 2e9/1, common 2e9/3, banana 1e9/2
    assert(got.filter(_._1 == 1L).map(_._3).toSeq == Seq("apple", "common", "banana"))
    // doc3: cherry 2e9/2 == date 1e9/1 — exact tie broken by token text
    assert(got.filter(_._1 == 3L).map(_._3).toSeq == Seq("cherry", "date", "common"))
  }

  test("centroidClassify: sum-centroids, argmax cosine, mislabeled row detected") {
    val df = Seq(
      (1L, 0, Seq(1.0f, 0f, 0f, 0f)),
      (2L, 0, Seq(0.8f, 0.2f, 0f, 0f)),
      (3L, 1, Seq(0f, 1.0f, 0f, 0f)),
      (4L, 1, Seq(0f, 0.9f, 0.1f, 0f)),
      (5L, 0, Seq(0.1f, 0.9f, 0f, 0f))) // label 0 but points at centroid 1
      .toDF("vec_id", "label", "embedding")
    val got = graft.ops.Similarity.centroidClassify(df, "vec_id", "embedding", "label", 4)
      .orderBy($"vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getBoolean(3)))
    assert(got.toSeq == Seq((1L, 0, true), (2L, 0, true), (3L, 1, true),
      (4L, 1, true), (5L, 1, false)))
  }

  test("gopherGates: integer-domain gate booleans match hand computation") {
    val df = Seq(
      // 60 clean words -> passes everything
      (1L, (1 to 60).map(i => s"the word$i").mkString(" ").split(" ").take(60).mkString(" ")),
      // too short
      (2L, "the of and short text here"),
      // symbol-heavy: hash marks push symbol ratio over 0.1
      (3L, ((1 to 60).map(i => s"w$i") ++ (1 to 10).map(_ => "#")).mkString(" ") + " the of that be")
    ).toDF("doc_id", "text")
    val got = graft.ops.Curation.gopherGates(df, "doc_id", "text")
      .select($"doc_id", $"pass_word_count", $"pass_symbol", $"pass_stop", $"pass")
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
    assert(got(0) == ((1L, true, true, true)))
    assert(got(1)._2 == false)           // word count gate fails
    assert(got(2)._3 == false)           // symbol gate fails: 10 hashes / 74 words
    // doc 3 still passes the stopword gate (4 stopwords present)
    assert(got(2)._4 == true)
  }

  test("dsirScores: cross-multiplied surrogate matches hand computation, sign = target-likeness") {
    val docs = Seq(
      (1L, "en", "alpha beta alpha beta"),   // bigrams: ab ba ab
      (2L, "en", "alpha beta gamma"),        // ab bg
      (3L, "xx", "delta epsilon zeta"),      // de ez
      (4L, "xx", "alpha beta delta epsilon") // ab bd de
    ).toDF("doc_id", "lang", "text")
    val got = graft.ops.Curation.dsirScores(
        docs, docs.filter($"lang" === "en"), "doc_id", "text",
        buckets = 4096, shingleN = 2)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // N_tgt = 5, N_raw = 10; per-feature weight ct·10 − cr·5:
    //   "alpha beta" ct=3 cr=4 → 10;  "beta alpha" / "beta gamma" → 5;
    //   "delta epsilon" → −10;  "epsilon zeta" / "beta delta" → −5
    // (no two of the six grams collide mod 4096)
    assert(got.toSeq == Seq(
      (1L, 3L, 25L, true), (2L, 2L, 15L, true),
      (3L, 2L, -15L, false), (4L, 3L, -5L, false)))
  }

  test("noveltyStats: df=1 shingle fractions match hand computation") {
    val docs = Seq(
      (1L, "a b c d"),  // abc bcd
      (2L, "a b c x"),  // abc bcx
      (3L, "p q r s")   // pqr qrs
    ).toDF("doc_id", "text")
    val got = graft.ops.Curation.noveltyStats(docs, "doc_id", "text", 3)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 2L, 2L, 1.0)))
  }

  test("lmFamiliarity: hand-computed integer scores; familiar > alien; short docs dropped") {
    val docs = Seq(
      (1L, "en", "a b a b a b"), // train; bigrams: ab ba ab ba ab
      (2L, "en", "a b a b"),     // train; bigrams: ab ba ab
      (3L, "xx", "a b a b"),     // familiar under the en model
      (4L, "xx", "p q r"),       // fully OOV
      (5L, "xx", "a")            // <2 tokens: no bigram evidence, dropped
    ).toDF("doc_id", "lang", "text")
    val got = graft.ops.Curation.lmFamiliarity(
        docs, docs.filter($"lang" === "en"), "doc_id", "text", scale = 1000L)
      .orderBy($"doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    // Train slice: c2("a b")=5, c2("b a")=3; c1(a)=5, c1(b)=5; V=2.
    // term("a b") = floor(1000·6/7) = 857; term("b a") = floor(1000·4/7)
    // = 571; term(OOV) = floor(1000·1/2) = 500.
    // doc1: 3·857+2·571 = 3713 over 5; doc2/doc3: 2·857+571 = 2285 over 3
    // doc4: 2·500 = 1000 over 2 (mean 500 < corpus mean → flagged)
    assert(got.toSeq == Seq(
      (1L, 5L, 3713L, 742L, false),
      (2L, 3L, 2285L, 761L, false),
      (3L, 3L, 2285L, 761L, false),
      (4L, 2L, 1000L, 500L, true)))
  }

  test("bm25TopK: two-stage integer floors match hand computation; probeTerms df order") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "banana banana banana")
    ).toDF("doc_id", "text")
    val probes = Seq("apple", "banana").toDF("term")
    val got = graft.ops.Retrieval.bm25TopK(docs, "doc_id", "text", probes,
        k = 10, scale = 1000L)
      .orderBy($"term", $"rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // N=3, T=8. apple df=2: doc1 tf=2 → s1 = 352000 div 265 = 1328,
    // score = 1328·3 div 5 = 796; doc2 tf=1 → s1 = 176000 div 158 =
    // 1113, score = 667. banana df=2: doc3 tf=3 → s1 = 528000 div 345
    // = 1530, score = 918; doc1 tf=1 → s1 = 176000 div 185 = 951,
    // score = 570.
    assert(got.toSeq == Seq(
      ("apple", 1L, 1L, 796L), ("apple", 2L, 2L, 667L),
      ("banana", 1L, 3L, 918L), ("banana", 2L, 1L, 570L)))
    val pt = graft.ops.Retrieval.probeTerms(
        Seq((1L, "apple banana cherry"), (2L, "apple banana"), (3L, "apple dd"))
          .toDF("doc_id", "text"), "doc_id", "text", minLen = 5, k = 2)
      .collect().map(_.getString(0)).toSet
    assert(pt == Set("apple", "banana")) // cherry df=1 loses; dd too short
  }

  test("funnel: strictly-after ordering, null suffix propagation") {
    val ev = Seq(
      // user 1 completes in order: signup@10, view@20, click@30
      (1L, "signup", 10L), (1L, "view", 20L), (1L, "click", 30L),
      // user 2's view PRECEDES signup — funnel stops at signup
      (2L, "view", 5L), (2L, "signup", 10L), (2L, "click", 20L),
      // user 3 never signed up — no funnel row at all
      (3L, "view", 1L),
      // user 4: two views, the one after signup counts
      (4L, "view", 1L), (4L, "signup", 2L), (4L, "view", 9L)
    ).toDF("user_id", "event_type", "tus")
    val got = graft.ops.EventAnalytics.funnel(ev, "user_id", "event_type",
        "tus", Seq("signup", "view", "click"))
      .orderBy($"user_id").collect()
      .map(r => (r.getLong(0),
        (1 to 3).map(i => if (r.isNullAt(i)) -1L else r.getLong(i)),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, Seq(10L, 20L, 30L), 3L),
      (2L, Seq(10L, -1L, -1L), 1L), // click@20 unreachable: view missing
      (4L, Seq(2L, 9L, -1L), 2L)))
  }

  test("retention: cohort = first bucket, offsets count distinct users") {
    val ev = Seq(
      (1L, 0L), (1L, 25L),            // cohort 0, active offsets 0 and 2
      (2L, 5L), (2L, 15L), (2L, 15L), // cohort 0, offsets 0 and 1 (dup row)
      (3L, 12L)                       // cohort 1, offset 0
    ).toDF("user_id", "tus")
    val got = graft.ops.EventAnalytics.retention(ev, "user_id", "tus", 10L)
      .orderBy($"cohort_w", $"week_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)))
  }

  test("urlBlocklistGate: domain normalization, path words, no-URL pass-through") {
    val docs = Seq(
      (1L, "plain text, no url"),
      (2L, "see https://WWW.Bad.com/home now"),   // blocked domain (www+case)
      (3L, "see https://ok.org/casino/slots"),    // flagged path word
      (4L, "see http://fine.net/page"),           // clean
      (5L, "see https://bad.com")                 // blocked, no path at all
    ).toDF("doc_id", "text")
    val got = graft.ops.Curation.urlBlocklistGate(docs, "doc_id", "text",
        Seq("bad.com"), Seq("casino"))
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-"),
        r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, "-", false, false, true),
      (2L, "bad.com", true, false, false),
      (3L, "ok.org", false, true, false),
      (4L, "fine.net", false, false, true),
      (5L, "bad.com", true, false, false)))
  }

  test("unimaxAllocation: integer water-filling matches hand computation in all regimes") {
    val counts = Seq(("en", 100L), ("fr", 50L), ("de", 10L)).toDF("lang", "n")
    def run(budget: Long) = graft.ops.Curation
      .unimaxAllocation(counts, "lang", "n", budget)
      .orderBy($"lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4))).toSeq
    // budget 100: k=1 (de funded), level = (100-10) div 2 = 45
    assert(run(100L) == Seq(
      ("de", 10L, 10L, 45L, 0L), ("en", 100L, 45L, 45L, 0L),
      ("fr", 50L, 45L, 45L, 0L)))
    // budget 200 >= total 160: everyone fully funded, leftover 40
    assert(run(200L) == Seq(
      ("de", 10L, 10L, -1L, 40L), ("en", 100L, 100L, -1L, 40L),
      ("fr", 50L, 50L, -1L, 40L)))
    // budget 7 < L*smallest: k=0, level = 7 div 3 = 2, leftover 1
    assert(run(7L) == Seq(
      ("de", 10L, 2L, 2L, 1L), ("en", 100L, 2L, 2L, 1L),
      ("fr", 50L, 2L, 2L, 1L)))
  }

  test("hardNegativesTopK: near-dups and random pairs excluded, band kept") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1f, 0f)),    // query
      (1L, Array(1f, 0f)),    // cos 1.0 — near-dup, above hi
      (2L, Array(0.6f, 0.8f)),// cos 0.6 — the hard negative
      (3L, Array(0f, 1f))     // cos 0.0 — uninformative, below lo
    ).toDF("vec_id", "embedding")
    val q = graft.ops.Similarity.quantize(emb, "vec_id", "embedding")
    val got = graft.ops.Similarity.hardNegativesTopK(
        q.filter($"vec_id" === 0L), q, "vec_id", k = 5, lo = 0.2, hi = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 2L, 1L)))
  }

  test("stripBoilerplate: df>=minDf lines removed from every doc, clean_md5 checks content") {
    val docs = Seq(
      (1L, "a b c d"), // lines (len 2): "a b", "c d"
      (2L, "a b x y"), // "a b" boilerplate (df 2); "x y" kept
      (3L, "p q")      // unique line, kept
    ).toDF("doc_id", "text")
    val got = graft.ops.Curation.stripBoilerplate(docs, "doc_id", "text",
        lineLen = 2, minDf = 2L)
      .orderBy($"doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // "a b" is removed from BOTH docs 1 and 2 (unlike first-occurrence dedup)
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 2L, m("c d")),
      (2L, 2L, 1L, 2L, m("x y")),
      (3L, 1L, 0L, 2L, m("p q"))))
  }

  test("sortedNeighborhoodPairs finds prefix-adjacent near-dups, window-bounded") {
    // 1 and 2 share a long prefix (adjacent in key order, Jaccard 1.0 on
    // 3-grams of the first 6 tokens... actually identical text -> 1.0);
    // 3 is unrelated but in the same 2-char block ("th"); 4 near-dups 1
    // but starts differently -> different block, OUT OF REACH by design.
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base), (2L, base), (3L, "the zebra stands completely still all day long"),
      (4L, "a " + base)).toDF("doc_id", "text")
    val sd = graft.ops.TextOps.shingleTable(docs, "doc_id", "text", 3)
    val got = graft.ops.Dedup.sortedNeighborhoodPairs(docs, sd, "doc_id",
        "text", keyChars = 16, blockChars = 2, window = 4, minJaccard = 0.8)
      .select($"a", $"b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)))
    // a second pass under a different key (drop the leading token) is the
    // paper's multi-pass remedy; here widening the block to catch doc 4
    // is out of scope — assert the single-pass contract instead.
  }

  test("packNextFit: bins respect the budget, offsets are contiguous, oversize isolated") {
    // lens 1..29 plus one oversize 25 (> budget 10); 2 shards
    val docs = ((1L to 29L).map(i => (i, (i % 9) + 1L)) :+ (30L, 25L))
      .toDF("doc_id", "nt")
    val got = graft.ops.Curation.packNextFit(docs, "doc_id", "nt", 2, 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.length == 30)
    got.groupBy(_._2).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_._3)
      assert(byPos.map(_._3).toSeq == (1L to rows.length).toSeq) // pos dense
      // replay the fold over the emitted order: bin/off must match exactly
      var bin = 0L; var used = 0L
      byPos.foreach { case (_, _, _, b, off, len) =>
        if (used > 0 && used + len > 10L) { bin += 1; used = 0L }
        assert(b == bin && off == used)
        used += len
      }
      // oversize docs sit alone at off 0; all others fit the budget
      byPos.foreach { case (_, _, _, _, off, len) =>
        if (len > 10L) assert(off == 0L) else assert(off + len <= 10L)
      }
    }
  }

  test("madOutliers: rank-selected median/MAD flag, robust to the outlier itself") {
    // vals [1,2,3,4,100]: med = 3 (rank 3), devs [2,1,0,1,97],
    // mad = 1 (rank 3 of sorted devs [0,1,1,2,97]);
    // gate dev*2 > 9*mad -> only 97 flags (2*2=4 < 9, 97*2 > 9).
    // sigma would be dragged to ~39 by the 100 and still flag it, but
    // mean 22 also pushes 1..4 to dev ~20 - the robustness shows in mad=1.
    val df = Seq((1L, "g", 1L), (2L, "g", 2L), (3L, "g", 3L), (4L, "g", 4L),
      (5L, "g", 100L)).toDF("id", "g", "v")
    val got = graft.ops.EventAnalytics.madOutliers(df, "g", "v", 9, 2)
      .select($"id", $"med", $"dev", $"mad", $"is_outlier")
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.toSeq == Seq((1L, 3L, 2L, 1L, false), (2L, 3L, 1L, 1L, false),
      (3L, 3L, 0L, 1L, false), (4L, 3L, 1L, 1L, false),
      (5L, 3L, 97L, 1L, true)))
  }

  test("containmentVerify catches subset dups that Jaccard misses") {
    // doc 2's text is entirely inside doc 1's much longer text:
    // containment = 1.0 but Jaccard = small/large is tiny.
    val long_ = (1 to 40).map(i => s"w$i").mkString(" ")
    val short_ = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long_), (2L, short_)).toDF("doc_id", "text")
    val sd = graft.ops.TextOps.shingleTable(docs, "doc_id", "text", 3)
    val cand = Seq((1L, 2L)).toDF("a", "b")
    val cont = graft.ops.Dedup.containmentVerify(cand, sd, "doc_id", 800)
      .collect()
    assert(cont.length == 1 && cont.head.getAs[Double]("containment") == 1.0)
    val jacc = graft.ops.Dedup.jaccardVerify(cand, sd, "doc_id", 0.8)
    assert(jacc.count() == 0) // 6/38 shared shingles - Jaccard blind
  }

  test("editDistancePairs verifies candidates by relative Levenshtein") {
    // "kitten" vs "sitten" dist 1, len 6 -> 1000 <= 200*6? no at 100 permille
    // (1000 > 600); use longer strings: dist 1 over len 20 -> passes 10%.
    val docs = Seq(
      (1L, "the quick brown fox x"), (2L, "the quick brown fox y"),
      (3L, "completely different text here")).toDF("doc_id", "text")
    val cand = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val got = graft.ops.Dedup.editDistancePairs(docs, cand, "doc_id", "text", 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // (1,2): dist 1, len 21 -> 1000 <= 2100 keep; (1,3): length gap 9*1000
    // > 30*100 -> killed by the cheap bound before the DP
    assert(got.toSeq == Seq((1L, 2L, 1L)))
  }

  test("rendezvousAssign: k -> k+1 moves docs only TO the new shard") {
    // The HRW minimal-movement law: growing the shard count never moves
    // a doc between old shards — its argmax either stands or is beaten
    // by the new shard's score (old scores are unchanged).
    val ids = (1L to 300L).toDF("doc_id")
    def assign(k: Int): Map[Long, Long] =
      graft.ops.Curation.rendezvousAssign(ids, "doc_id", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a4 = assign(4); val a5 = assign(5)
    (1L to 300L).foreach { id =>
      assert(a5(id) == a4(id) || a5(id) == 4L,
        s"doc $id moved between old shards: ${a4(id)} -> ${a5(id)}")
    }
    // and the new shard actually takes ~1/5 of the docs (not 0, not all)
    val moved = (1L to 300L).count(id => a5(id) == 4L && a4(id) != 4L)
    assert(moved > 20 && moved < 140, s"implausible movement count $moved")
  }

  test("calibratedQualityGate keeps exactly floor(num/den * n) rows per group") {
    // group g1: 10 rows scores 1..10 -> keep top 3 (scores 10,9,8);
    // group g2: 4 rows all score 7 -> keep floor(1.2) = 1, tie broken by id
    val df = ((1L to 10L).map(i => (i, "g1", i)) ++
      (11L to 14L).map(i => (i, "g2", 7L))).toDF("id", "g", "score")
    val got = graft.ops.Curation.calibratedQualityGate(df, "id", "g", "score", 3, 10)
      .collect().map(r => (r.getLong(0), r.getBoolean(5))).toMap
    val kept = got.filter(_._2).keySet
    assert(kept == Set(8L, 9L, 10L, 11L))
  }

  test("sigmaOutliers flags exactly the rows past num/den population sigmas") {
    // group a: [0,0,0,0,100] -> mean 20, sigma^2 = (5*10000-100^2)/25 = 1600,
    // sigma 40; z(100) = 2 > 3/2 -> outlier; z(0) = -0.5 -> kept.
    // group c: constant -> sigma 0, dev 0 -> never an outlier, dev_sign 0.
    val df = (Seq.fill(4)(("a", 0L)) ++ Seq(("a", 100L), ("c", 7L), ("c", 7L)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val got = graft.ops.EventAnalytics.sigmaOutliers(df, "g", "v", num = 3, den = 2)
      .select($"id", $"is_outlier", $"dev_sign").orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, false, -1L), (1L, false, -1L), (2L, false, -1L), (3L, false, -1L),
      (4L, true, 1L), (5L, false, 0L), (6L, false, 0L)))
  }

  test("linearAttribution conserves every conversion's cents exactly") {
    // user 1: purchase of 100 cents with 3 views in window -> 34,33,33
    // (remainder cent to the EARLIEST touch); purchase of 7 with 3 views
    // -> 3,2,2; a view outside the window gets nothing.
    val touches = Seq((1L, 10L, 100L), (1L, 11L, 200L), (1L, 12L, 300L),
      (1L, 13L, 5000L)).toDF("user_id", "touchId", "tus")
    val convs = Seq((1L, 90L, 400L, 100L), (1L, 91L, 450L, 7L))
      .toDF("user_id", "convId", "tus", "cents")
    val got = graft.ops.EventAnalytics.linearAttribution(
        touches, convs, "user_id", windowUs = 1000L)
      .collect().map(r => r.getAs[Long]("touchId") -> r.getAs[Long]("attributed_cents"))
      .toMap
    assert(got == Map(10L -> (34L + 3L), 11L -> (33L + 2L), 12L -> (33L + 2L)))
    assert(got.values.sum == 107L) // total attributed = total converted
  }

  test("cusumDrift closed form equals the sequential max(0, S+x) fold") {
    val rows = Seq((1L, "g", 0L, 5L), (2L, "g", 1L, -3L), (3L, "g", 2L, 9L),
      (4L, "g", 3L, -20L), (5L, "g", 4L, 6L), (6L, "h", 0L, -1L),
      (7L, "h", 1L, 4L))
    val df = rows.toDF("id", "g", "tus", "v")
    val target = Seq(("g", 0L), ("h", 0L)).toDF("g", "target")
    val got = graft.ops.EventAnalytics.cusumDrift(df, target, "g", "v",
        "tus", "id", h = 7L)
      .select($"id", $"cusum", $"alarm").orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // sequential: g: 5, 2, 11, 0, 6; h: 0, 4
    assert(got.toSeq == Seq((1L, 5L, false), (2L, 2L, false), (3L, 11L, true),
      (4L, 0L, false), (5L, 6L, false), (6L, 0L, false), (7L, 4L, false)))
  }

  test("interleavedEpochOrder: epoch_rank is a source-interleaved permutation") {
    // 3 sources of sizes 3/2/1: positions interleave a1 b1 c1 a2 b2 a3
    // in (pos, source) order whatever the hash draw.
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"),
      (6L, "c")).toDF("doc_id", "src")
    val got = graft.ops.Curation.interleavedEpochOrder(df, "doc_id", "src", 42L)
      .collect().map(r => (r.getAs[Long]("epoch_rank"), r.getAs[String]("src"),
        r.getAs[Long]("pos")))
    assert(got.map(_._1).sorted.toSeq == (1L to 6L).toSeq, "rank must be a permutation")
    val bySrc = got.sortBy(_._1).map(_._2).toSeq
    assert(bySrc == Seq("a", "b", "c", "a", "b", "a"),
      s"interleave order wrong: $bySrc")
    // and a different seed permutes within sources, not across the shape
    val other = graft.ops.Curation.interleavedEpochOrder(df, "doc_id", "src", 43L)
      .collect().map(r => (r.getAs[Long]("epoch_rank"), r.getAs[String]("src")))
    assert(other.sortBy(_._1).map(_._2).toSeq == Seq("a", "b", "c", "a", "b", "a"))
  }

  test("oovRate: dfNum=0 puts every token in vocab; rate bounded in [0,1]") {
    val df = Seq((1L, "x x y"), (2L, "x z"), (3L, "x q r s"))
      .toDF("doc_id", "text")
    val all = graft.ops.Curation.oovRate(df, "doc_id", "text", 0, 1)
      .collect().map(r => r.getAs[Long]("n_oov"))
    assert(all.forall(_ == 0L))
    // df fraction 2/3: vocab = {x} (df 3); doc 3 has 3 oov of 4 tokens
    val m = graft.ops.Curation.oovRate(df, "doc_id", "text", 2, 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov")))).toMap
    assert(m == Map(1L -> ((3L, 1L)), 2L -> ((2L, 1L)), 3L -> ((4L, 3L))))
  }

  test("rankFusion sums within-group ranks and breaks Borda ties by id") {
    val df = Seq((1L, "g", 10L, 5L), (2L, "g", 5L, 10L), (3L, "g", 1L, 1L),
      (4L, "h", 7L, 7L)).toDF("id", "grp", "s1", "s2")
    val got = graft.ops.Curation.rankFusion(df, "grp", "id", Seq("s1", "s2"))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("borda"), r.getAs[Long]("fused_rank")))).toMap
    // g: s1 ranks 1,2,3; s2 ranks 2,1,3 -> borda 3,3,6; tie 1-vs-2 by id
    assert(got == Map(1L -> ((3L, 1L)), 2L -> ((3L, 2L)), 3L -> ((6L, 3L)),
      4L -> ((2L, 1L))))
  }

  test("prefixFilterPairs equals the exhaustive Jaccard path (recall 1)") {
    // d1/d2 differ in one trailing token: J = 35/41 ≈ 0.854 ≥ 0.8;
    // d3 shares nothing. The PPJoin candidate rule must find exactly
    // what the exhaustive rare-shingle path finds.
    val w = (1 to 40).map(i => s"w$i")
    val docs = Seq((1L, w.mkString(" ")),
      (2L, (w.init :+ "zz").mkString(" ")),
      (3L, w.map(_ + "x").mkString(" "))).toDF("doc_id", "text")
    val sd = graft.ops.TextOps.shingleTable(docs, "doc_id", "text", 3)
    val pp = graft.ops.Dedup.prefixFilterPairs(sd, "doc_id", 4, 5)
      .collect().toSet
    val nj = graft.ops.Dedup.ngramJaccardPairs(sd, "doc_id", 0.8)
      .collect().toSet
    assert(pp == nj)
    assert(pp.size == 1 && pp.head.getLong(0) == 1L && pp.head.getLong(1) == 2L)
  }

  test("qualityDrift fits the exact integer OLS slope over bucket medians") {
    // src a: bucket medians (0,10), (1,20), (2,30) -> slope exactly 10
    // (num 60, den 6); src b: one bucket -> den 0, slope NULL
    val df = Seq(("a", 0L, 9L), ("a", 0L, 10L), ("a", 0L, 11L),
      ("a", 1L, 20L), ("a", 2L, 30L), ("b", 0L, 5L))
      .toDF("src", "wk", "v")
    val got = graft.ops.Curation.qualityDrift(df, "src", "wk", "v")
      .collect().map(r => r.getAs[String]("src") ->
        ((r.getAs[Long]("n_buckets"), r.getAs[Long]("slope_num"),
          r.getAs[Long]("slope_den"), Option(r.get(4))))).toMap
    assert(got("a") == ((3L, 60L, 6L, Some(10.0d))))
    assert(got("b") == ((1L, 0L, 0L, None)))
  }

  test("incrementalComponents(stars ∪ delta) equals full-history CC") {
    // old graph: {1,2,3} (min 1) and {10,11} (min 10); the delta edge
    // (3,10) merges them (min must propagate to 1 across the star
    // boundary) and (20,21) opens a brand-new component
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val delta = Seq((3L, 10L), (20L, 21L)).toDF("a", "b")
    val oldLbl = graft.ops.Dedup.connectedComponents(oldPairs, "a", "b")
    val incr = graft.ops.Dedup.incrementalComponents(oldLbl, delta, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = graft.ops.Dedup.connectedComponents(
        oldPairs.union(delta), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incr == full)
    assert(incr(11L) == 1L && incr(21L) == 20L)
  }

  test("disorderProfile measures arrival lag against the event-time high water mark") {
    // arrival order (by arr): t=10, t=30, t=20, t=25 -> lags 0, 0, 10, 5;
    // n_late 2, max 10; p99 rank ceil(99*4/100)=4 -> lag 10
    val df = Seq((1L, 10L, 100L), (2L, 30L, 200L), (3L, 20L, 300L),
      (4L, 25L, 400L)).map { case (id, t, a) => (id, "u", t, a) }
      .toDF("id", "u", "tus", "arr")
    val got = graft.ops.EventAnalytics.disorderProfile(df, "u", "tus", "arr", "id")
      .collect().map(r => (r.getAs[Long]("n"), r.getAs[Long]("n_late"),
        r.getAs[Long]("max_lag_us"), r.getAs[Long]("p99_lag_us")))
    assert(got.toSeq == Seq((4L, 2L, 10L, 10L)))
  }

  test("chao1Estimate: bias-corrected richness from the dup-count histogram") {
    // group g: counts {a:1, b:1, c:2, d:3} -> d=4, f1=2, f2=1,
    // chao1 = 4 + 2*1/(2*2) = 4.5; group h: all singletons f2=0 stays defined
    val df = (Seq("a", "b", "c", "c", "d", "d", "d").map(("g", _)) ++
      Seq("x", "y").map(("h", _))).toDF("grp", "v")
    val got = graft.ops.Curation.chao1Estimate(df, "grp", col("v"))
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Long]("d_distinct"), r.getAs[Long]("f1"),
          r.getAs[Long]("f2"), r.getAs[Double]("chao1")))).toMap
    assert(got("g") == ((4L, 2L, 1L, 4.5d)))
    assert(got("h") == ((2L, 2L, 0L, 2d + 2d / 2d)))
  }

  test("CDC chunks partition the canon text and survive a point edit (locality)") {
    import graft.expr.CdcChunks
    def chunksOf(text: String): Seq[String] = {
      val arr = CdcChunks.compute(org.apache.spark.unsafe.types.UTF8String.fromString(text))
      (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    }
    val rnd = new scala.util.Random(17)
    val base = Array.fill(2000)(('a' + rnd.nextInt(26)).toChar).mkString
    val ch = chunksOf(base)
    // partition property: chunks concatenate back to the canon text
    assert(ch.mkString == base)
    assert(ch.forall(_.nonEmpty))
    assert(ch.length > 5, s"expected multiple chunks, got ${ch.length}")
    // locality: one edited char re-chunks only its neighborhood — the
    // multiset of chunks away from the edit is unchanged (THE property
    // fixed-size chunking lacks)
    val edited = base.updated(1000, if (base(1000) == 'q') 'r' else 'q')
    val ch2 = chunksOf(edited)
    val common = ch.toSet.intersect(ch2.toSet)
    assert(ch.toSet.size - common.size <= 3,
      s"edit invalidated ${ch.toSet.size - common.size} chunks of ${ch.length}")
    // short input: single chunk
    assert(chunksOf("ab2") == Seq("ab2"))
    assert(chunksOf("  ") == Seq.empty)
  }

  test("AhoCorasick counts every occurrence, overlapping and nested, like brute force") {
    import graft.ops.TextMatch.AhoCorasick
    val pats = IndexedSeq("ab", "aba", "bb", "a", "babb")
    val ac = new AhoCorasick(pats)
    val rnd = new scala.util.Random(23)
    (0 until 50).foreach { _ =>
      val text = Array.fill(200)(if (rnd.nextBoolean()) 'a' else 'b').mkString
      val got = ac.countMatches(text)
      pats.zipWithIndex.foreach { case (p, i) =>
        val brute = (0 to text.length - p.length).count(j => text.startsWith(p, j))
        assert(got(i) == brute, s"pattern '$p' in '$text': got ${got(i)}, want $brute")
      }
    }
  }

  test("AhoCorasick matchCounts runs the broadcast automaton over a DataFrame") {
    val df = Seq((1L, "spark table spark"), (2L, "no hits here"), (3L, "tabletable"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextMatch.matchCounts(df, "doc_id", "text", Seq("spark", "table"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set((1L, "spark", 2L), (1L, "table", 1L), (3L, "table", 2L)))
  }

  test("dHash bands pack 64 comparisons; near-dup pairs match brute-force Hamming") {
    import graft.ops.Multimodal
    // strictly increasing rows: every g(r,c) < g(r,c+1) -> all bits 0;
    // strictly decreasing: all bits 1 -> bands 0xFFFF
    val inc = (0 until 72).toArray
    val dec = inc.map(72 - _)
    val raw0 = Seq((1L, inc), (2L, dec)).toDF("doc_id", "g")
    val df0 = raw0.select(col("doc_id"), Multimodal.dHashBands(raw0, "g").as("bands"))
    val m = df0.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(m(1L) == Seq(0, 0, 0, 0))
    assert(m(2L) == Seq(65535, 65535, 65535, 65535))
    // brute-force agreement on random grids, incl. pigeonhole recall
    val rnd = new scala.util.Random(31)
    val grids = (0L until 40L).map(i => (i, Array.fill(72)(rnd.nextInt(40))))
    val raw1 = grids.toDF("doc_id", "g")
    val hashed = raw1.select(col("doc_id"), Multimodal.dHashBands(raw1, "g").as("bands"))
    val bands = hashed.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    def dist(a: Long, b: Long): Int =
      bands(a).zip(bands(b)).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val want = (for {
      a <- 0L until 40L; b <- (a + 1) until 40L
      if dist(a, b) <= 3
    } yield (a, b, dist(a, b).toLong)).toSet
    val got = Multimodal.dhashNearDupPairs(hashed, "doc_id", "bands", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("canonicalUrl normalizes host/port/query and preserves path case") {
    val cases = Seq(
      "HTTP://WWW.Site.COM:80/A/B?utm_source=x&b=2&a=1#f" -> "http://site.com/A/B?a=1&b=2",
      "https://site.com:443/" -> "https://site.com/",
      "https://site.com:8443/x" -> "https://site.com:8443/x", // non-default port kept
      "http://site.com:443/x" -> "http://site.com:443/x", // 443 is not http's default
      "https://www.site.com" -> "https://site.com/", // empty path -> /
      "https://site.com/p?utm_a=1&utm_b=2" -> "https://site.com/p") // all-utm -> no ?
    val df = cases.map(_._1).zipWithIndex.map { case (u, i) => (i, u) }.toDF("i", "url")
    val got = df.select(col("i"), graft.ops.Curation.canonicalUrl(col("url")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(got(i) == want, s"canonicalUrl($in) = ${got(i)}, want $want")
    }
  }

  test("L112 audio contour fingerprint: scale-invariant grams, family near-dups, stop-gram cap") {
    import graft.ops.Multimodal
    def wave(amps: Seq[Int], frame: Int): Array[Float] =
      amps.flatMap(a => Seq.fill(frame)(a / 32767f)).toArray
    // distinct per-frame amplitudes with wide margins: the rising-edge
    // contour survives integer amplitude rescaling (monotone map)
    // aperiodic rising runs (an alternating low/high pattern would make
    // the reversed wave's contour complement-reverse-symmetric and
    // collide with the originals' grams)
    val amps = Seq(100, 200, 400, 800, 1600, 300, 500, 900, 1800, 2200,
      150, 250, 1400, 350, 550, 950, 1900, 120, 1000, 2100)
    val df = Seq(
      ("a1", wave(amps, 32)),
      ("a2", wave(amps.map(a => a * 7 / 10), 32)), // regained copy
      ("b1", wave(amps.reverse, 32))).toDF("id", "wave")
    val grams = Multimodal.audioContourGrams(df, "id", "wave", frame = 32, k = 8)
    val byId = grams.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byId("a1") == byId("a2"), "amplitude-scaled copy must share the full gram set")
    val pairs = Multimodal.audioNearDupPairs(grams, "id", 0.5).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("a1", "a2")), s"got $pairs")
    // degenerate corpus: identical contours everywhere → the stop-gram
    // cap must drop the corpus-sized buckets before the join
    val flat = (0 until 6).map(i => (s"f$i", wave(amps, 32))).toDF("id", "wave")
    val fg = Multimodal.audioContourGrams(flat, "id", "wave", frame = 32, k = 8)
    assert(Multimodal.audioNearDupPairs(fg, "id", 0.5, maxGramDf = Some(3)).count() == 0L)
    assert(Multimodal.audioNearDupPairs(fg, "id", 0.5).count() == 15L)
  }

  test("L115 pageRank: star hub outranks leaves, mass is exact integers, dangling documented") {
    import graft.ops.GraphOps
    // star: 1..6 -> 0, plus a 2-cycle 7<->8 off to the side; node 0 dangles
    val edges = ((1L to 6L).map(i => (i, 0L)) ++ Seq((7L, 8L), (8L, 7L))).toDF("src", "dst")
    val pr = GraphOps.pageRank(edges, "src", "dst", iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.size == 9)
    // hub: 6 leaves each send floor(rank/1); leaves get base only after iter 1
    assert(pr(0L) > pr(1L), s"hub must outrank leaves: $pr")
    assert((1L to 6L).map(pr).toSet.size == 1, "symmetric leaves tie exactly")
    // exact replay of the fixed-point arithmetic for the hub:
    // iter1: leaves rank 1000000, contrib 1000000 each -> hub = 150000 + 85*6000000/100
    // iter2: leaves rank 150000 (their inflow is nothing; base only) -> hub = 150000 + 85*900000/100
    assert(pr(1L) == 150000L)
    assert(pr(0L) == 150000L + 85L * (6L * 150000L) / 100L)
    // 2-cycle: each sends its full rank across every round -> stationary at
    // 150000 + 850000; the cycle CONSERVES mass while the hub's dangling
    // mass drains, so after iter 2 the cycle outranks the hub — the
    // documented no-teleport-redistribution semantics, seen exactly
    assert(pr(7L) == 150000L + 85L * 1000000L / 100L)
    assert(pr(7L) == pr(8L), "symmetric cycle must tie")
    assert(pr(7L) > pr(0L), "conserved cycle mass vs drained dangling hub")
  }

  test("L117 personalizedPageRank: seed-only teleport, exact fixed-point replay on a path") {
    import graft.ops.GraphOps
    // path 0 -> 1 -> 2 -> 3, seed {0}: mass diffuses down the path,
    // only the seed keeps restart mass, the far end gets nothing in 2 hops
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val ppr = GraphOps.personalizedPageRank(edges, "src", "dst", seeds, "id", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // iter1: r(0)=150000, r(1)=850000; iter2: r(1)=85*150000/100,
    // r(2)=85*850000/100, r(3) still 0 (2 hops can't reach node 3's inflow)
    assert(ppr == Map(0L -> 150000L, 1L -> 127500L, 2L -> 722500L, 3L -> 0L), s"got $ppr")
  }

  test("L116 labelPropagation: majority vote refines, min-label tie-break, sync update") {
    import graft.ops.GraphOps
    // triangle {0,1,2} joined by ONE spurious edge (2-10) to triangle {10,11,12}:
    // CC glues all six; LPA keeps the two triangles in distinct labels
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L), (10L, 11L), (10L, 12L),
      (11L, 12L), (2L, 10L)).toDF("a", "b")
    val out = GraphOps.labelPropagation(pairs, "a", "b", iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 6)
    assert(Set(out(0L), out(1L)).subsetOf(Set(0L, 1L, 2L)), s"left triangle stays left: $out")
    assert(Set(out(11L), out(12L)).forall(l => l >= 2L), s"right triangle stays right: $out")
    assert(out(0L) != out(11L), "one spurious edge must NOT merge the triangles")
  }

  test("L119 shotSegments: cuts on hash jumps, 1-bit wiggle tolerated, keyframe = first of shot") {
    import graft.ops.Multimodal
    // video 1: frames 0-2 hash ~0 (wiggle bit 0), frames 3-4 jump to 0xFF00,
    // frame 5 jumps to 0xF0; video 2: a single frame
    val frames = Seq(
      (1L, 0L, 0L), (1L, 1L, 1L), (1L, 2L, 0L),
      (1L, 3L, 65280L), (1L, 4L, 65281L),
      (1L, 5L, 240L),
      (2L, 0L, 7L)).toDF("vid", "frame", "fhash")
    val got = Multimodal.shotSegments(frames, "vid", "frame", "fhash", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 1L, 0L, 3L), // frames 0-2, one shot despite the parity wiggle
      (1L, 2L, 3L, 2L), // 8-bit jump opens shot 2
      (1L, 3L, 5L, 1L), // 12-bit jump opens shot 3
      (2L, 1L, 0L, 1L)), s"got $got")
  }

  test("L123 sourceOverlapSketch: non-full union sketch degrades to EXACT set algebra") {
    import graft.ops.Curation
    // two sources, 4 distinct 2-shingles each, 3 shared; k=16 >> |A∪B| = 5
    // so every estimate must be exact
    val docs = Seq(
      ("s1", "aa bb cc dd ee"),          // shingles: aa bb, bb cc, cc dd, dd ee
      ("s2", "bb cc dd ee xx")           // shingles: bb cc, cc dd, dd ee, ee xx
    ).toDF("source", "text")
    val got = Curation.sourceOverlapSketch(docs, "source", "text",
        shingleN = 2, k = 16).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getBoolean(4), "union sketch below k must flag exact")
    assert(r.getLong(2) == 5L && r.getLong(3) == 3L, s"union 5, common 3: $r")
    assert(r.getDouble(5) == 3.0 / 5.0 && r.getDouble(6) == 5.0 &&
      r.getDouble(7) == 3.0, s"exact J/union/intersection: $r")
  }

  test("L121 dbscanClusters: density gate, border adoption, bridge does not glue, noise dropped") {
    import graft.ops.Similarity
    // clique {0,1,2} -(bridge 3)- clique {10,11,12}; 3 has degree 2 but its
    // neighbors 2,10 are cores of DIFFERENT clusters; pendant 20-21 is noise
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L), (10L, 11L), (10L, 12L),
      (11L, 12L), (2L, 3L), (3L, 10L), (20L, 21L)).toDF("a", "b")
    val got = Similarity.dbscanClusters(pairs, "a", "b", minPts = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // cores: 0,1,2 (deg>=2), 10,11,12, and 3 (deg 2 - core by count); 20,21 deg 1 -> noise
    assert(!got.contains(20L) && !got.contains(21L), s"pendant pair must be noise: $got")
    assert(got(0L) == (("core", 0L)) && got(11L)._1 == "core")
    // 3 IS core here (deg 2) so the graph glues via core-core edges 2-3, 3-10:
    // tighten minPts to 3 - only 2 and 10 stay core (degree 3 via the bridge),
    // they are NOT adjacent, so the two sides stay separate singleton-core
    // clusters with everything else as borders
    val strict = Similarity.dbscanClusters(pairs, "a", "b", minPts = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(strict(2L) == (("core", 2L)) && strict(10L) == (("core", 10L)))
    assert(strict(3L) == (("border", 2L)), s"bridge demotes to border, adopts MIN core cluster: $strict")
    assert(strict(0L) == (("border", 2L)) && strict(11L) == (("border", 10L)))
    assert(strict(0L)._2 != strict(11L)._2, "bridge must not glue the cliques")
  }

  test("L120 videoKeyHashes: signature = distinct cut-row hashes; copies near-dup, strangers don't") {
    import graft.ops.Multimodal
    // video 1: shots with hashes 0, 0xFF00, 0xF0; video 2 = copy missing the
    // last shot; video 3 disjoint
    def vid(id: Long, shots: Seq[Long]): Seq[(Long, Long, Long)] =
      shots.zipWithIndex.flatMap { case (h, s) =>
        (0 until 4).map(f => (id, s * 4L + f, h + (f % 2))) }
    // bases keep bit 0 clear so the +parity wiggle is a 1-bit flip, not a carry
    val frames = (vid(1L, Seq(0L, 65280L, 240L)) ++ vid(2L, Seq(0L, 65280L)) ++
      vid(3L, Seq(983040L, 14L))).toDF("vid", "frame", "fhash")
    val kh = Multimodal.videoKeyHashes(frames, "vid", "frame", "fhash", maxDist = 3)
    assert(kh.count() == 7L, "3 + 2 + 2 distinct keyframe hashes")
    val pairs = Multimodal.audioNearDupPairs(kh, "vid", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)), s"got ${pairs.toSeq}")
    assert(pairs.head._3 == 2.0 / 3.0)
  }

  test("L118 marginMine: mutual clear winners accepted, hub with tied matches rejected") {
    import graft.ops.Similarity
    // side 0: 0->[1,0,0,0], 2->[0,1,0,0], 4->hub [.7,.7,0,0]
    // side 1: 1 close to 0, 3 close to 2, 5 orthogonal
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f, 0f), 0),
      (4L, Array(0.7f, 0.7f, 0f, 0f), 0),
      (1L, Array(1f, 0.1f, 0f, 0f), 1),
      (3L, Array(0.1f, 1f, 0f, 0f), 1),
      (5L, Array(0f, 0f, 1f, 0f), 1)).toDF("vec_id", "embedding", "side")
    val got = Similarity.marginMine(emb, "vec_id", "embedding", "side",
        minMargin = 1.02, nCells = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // (0,1) and (2,3): mutual, margin ~10x over the cross match;
    // hub 4 ties its two matches exactly (margin 1.0) -> rejected
    assert(got.map(t => (t._1, t._2)).toSet == Set((0L, 1L), (2L, 3L)), s"got ${got.toSeq}")
    assert(got.forall(_._3 > 5.0), s"margins should be decisive: ${got.toSeq}")
  }

  test("L113 ivfTrain: membership conserved, cells bounded by the seed set, integer centroids") {
    import graft.ops.Similarity
    // 4 tight clusters (one-hot directions + small jitter); seeds are the
    // first 16 corpus rows, 4 per cluster
    val emb = (0 until 200).map { id =>
      val c = id % 4
      val v = Array.fill(8)(0f)
      v(2 * c) = 1f
      v(2 * c + 1) = 0.001f * (id % 7)
      (id.toLong, v)
    }.toDF("vec_id", "embedding")
    val q = Similarity.quantize(emb, "vec_id", "embedding")
    val out = Similarity.ivfTrain(q, "vec_id", dim = 8, nCells = 16, iters = 2).collect()
    assert(out.map(_.getLong(1)).sum == 200L, "every vector assigned exactly once")
    assert(out.forall(_.getLong(0) < 16L), "cells come from the seed id space")
    assert(out.forall(_.getLong(2) > 0L), "integer sum-centroids are nonzero")
    assert(out.length <= 16)
  }

  test("L128 lengthBuckets: exact padding-minimal boundaries, exhaustive enumeration argmin") {
    import graft.ops.Curation
    // lengths 1×3, 5×2, 6×2, 100×1 — candidates (b1,b2) ∈ {1,5,6}²:
    // (1,5) costs 0+0+188, (1,6) costs 0+2+0, (5,6) costs 12+0+0 → (1,6)
    val lens = Seq(1L, 1L, 1L, 5L, 5L, 6L, 6L, 100L).toDF("nt")
    val got = Curation.lengthBuckets(lens, "nt")
      .orderBy(col("bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 1L, 3L, 0L), (1L, 6L, 4L, 2L), (2L, 100L, 1L, 0L)),
      s"got ${got.toSeq}")
  }

  test("L128 lengthBuckets: clamp at capLen and degenerate distinct-length guard") {
    import graft.ops.Curation
    // 2000 clamps to 512: distinct = {3, 512} only -> no (b1,b2) pair
    val lens = Seq(3L, 2000L, 2000L).toDF("nt")
    assert(Curation.lengthBuckets(lens, "nt").count() == 0,
      "fewer than 3 distinct lengths has no boundary choice")
    // with a middle length the clamp participates as the max bucket
    val lens2 = Seq(3L, 3L, 7L, 2000L, 2000L).toDF("nt")
    val got = Curation.lengthBuckets(lens2, "nt")
      .orderBy(col("bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 3L, 2L, 0L), (1L, 7L, 1L, 0L), (2L, 512L, 2L, 0L)),
      s"got ${got.toSeq}")
  }

  test("L135 removeDupSpans: later doc loses the shared span, first occurrence and clean docs intact") {
    import graft.ops.Dedup
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"$shared delta epsilon"),
      (3L, "completely different words here")).toDF("doc_id", "text")
    val spans = Dedup.substringDupSpans(docs, "doc_id", "text", 10)
    val got = Dedup.removeDupSpans(docs, spans, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got(0) == (1L, 15L, 0L, s"alpha beta $shared gamma"),
      s"first occurrence keeps its text: ${got(0)}")
    assert(got(1) == (2L, 14L, 12L, "delta epsilon"),
      s"later doc loses exactly the 12 shared tokens: ${got(1)}")
    assert(got(2) == (3L, 4L, 0L, "completely different words here"),
      s"untouched doc passes through: ${got(2)}")
  }

  test("L135 removeDupSpans: a thousand overlapping spans on one hot doc merge before the HOF") {
    import graft.ops.Dedup
    val text = (1 to 500).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    // staggered windows all inside [10, 399) — the viral-boilerplate shape
    val spans = (0 until 1000).map(i => (0L, 1L, 0L, (10 + i % 300).toLong, 90L))
      .toDF("a", "b", "a_start", "b_start", "span_len")
    val got = Dedup.removeDupSpans(docs, spans, "doc_id", "text").collect().head
    assert(got.getLong(1) == 500L && got.getLong(2) == 389L,
      s"union of the staggered spans is [10,399): $got")
    assert(got.getString(3).startsWith("w1 w2") && got.getString(3).contains("w400"),
      "tokens outside the union survive")
  }

  test("L141 prototypicalPrune: the centroid-aligned member ranks first and is dropped") {
    import graft.ops.Similarity
    val q = Similarity.quantize(Seq(
        (1L, Array(0.7f, 0.7f)), (2L, Array(1f, 0f)), (3L, Array(0f, 1f)),
        (4L, Array(1f, 0.2f)), (5L, Array(0.2f, 1f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val cells = Seq(1L, 2L, 3L, 4L, 5L).map((_, 3)).toDF("vec_id", "cell")
    val got = Similarity.prototypicalPrune(cells, q, "vec_id", dim = 2, dropDenom = 5)
      .orderBy(col("rnk")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(4)))
    // centroid direction is [1,1]; v1 = [0.7,0.7] has cosine exactly 1
    assert(got.head == (1L, 1L, true), s"centroid-aligned v1 ranks 1 and drops: ${got.head}")
    assert(got.tail.forall(!_._3), s"the diverse shell is kept: ${got.toSeq}")
  }

  test("L139 textTileSegments: cut exactly at the topic shift, short doc stays whole") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "a b c a b c a b c x y z x y z x y z"), // topic shift at token 9
      (2L, "p q r")).toDF("doc_id", "text") // shorter than 2w -> one segment
    val got = TextOps.textTileSegments(docs, "doc_id", "text", w = 3, minOverlap = 0)
      .orderBy(col("doc_id"), col("seg_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 9L, 9L), (1L, 1L, 9L, 18L, 9L),
      (2L, 0L, 0L, 3L, 3L)), s"got ${got.toSeq}")
  }

  test("L138 doremiReweight: alien source flagged hard, doubled, budget conserved exactly") {
    import graft.ops.Curation
    val docs = Seq(
      (1L, "the a of and to in the a of and", "en", "srcA"),
      (2L, "the a of and to in the a of and", "en", "srcA"),
      (3L, "zz qq ww rr tt yy uu ii oo pp", "xx", "srcB"),
      (4L, "zz qq ww rr tt yy uu ii oo pp", "xx", "srcB"))
      .toDF("doc_id", "text", "lang", "source")
    val (c2, c1, v) = Curation.lmModel(docs.filter(col("lang") === "en"), "text")
    val got = Curation.doremiReweight(docs, "source", "text", c2, c1, v,
        scale = 1000000L, budget = 999L)
      .orderBy(col("source")).collect()
      .map(r => (r.getString(0), r.getBoolean(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(("srcA", false, 2L, 333L), ("srcB", true, 4L, 666L)),
      s"familiar source keeps weight, alien doubles, 2:1 split of 999: ${got.toSeq}")
    assert(got.map(_._4).sum == 999L, "the budget is conserved exactly")
  }

  test("L134 luhnValid/luhnCheckDigit: canonical vectors and the mint-validate duality") {
    import graft.ops.Curation
    val df = Seq("79927398713", "79927398714", "4539578763621486")
      .toDF("num")
      .select(col("num"), Curation.luhnValid(col("num")).as("ok"))
    val got = df.collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(got("79927398713"), "the canonical valid Luhn number")
    assert(!got("79927398714"), "off-by-one check digit must fail")
    val chk = Seq("7992739871").toDF("pre")
      .select(Curation.luhnCheckDigit(col("pre")).as("d")).collect().head.getInt(0)
    assert(chk == 3, s"check digit of 7992739871 is 3, got $chk")
  }

  test("L133 lateInteractionTopK: facet-permutation invariance, partial facet match scores partially") {
    import graft.ops.Similarity
    // query [1,0 | 0,1]; doc 1 identical, doc 2 = facets SWAPPED (MaxSim
    // must score it identically — facet order is irrelevant), doc 3
    // matches only facet 0
    val quant = (s: Seq[(Long, Array[Float])]) =>
      Similarity.quantize(s.toDF("vec_id", "embedding"), "vec_id", "embedding")
    val qdf = quant(Seq((100L, Array(1f, 0f, 0f, 1f))))
    val corpus = quant(Seq(
      (1L, Array(1f, 0f, 0f, 1f)),
      (2L, Array(0f, 1f, 1f, 0f)),
      (3L, Array(1f, 0f, 1f, 0f))))
    val got = Similarity.lateInteractionTopK(qdf, corpus, "vec_id",
        dim = 4, nSub = 2, k = 3)
      .orderBy(col("rnk")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val e8 = 100000000L
    assert(got.toSeq == Seq((1L, 1L, 2 * e8), (2L, 2L, 2 * e8), (3L, 3L, e8)),
      s"got ${got.toSeq}")
  }

  test("L132 coresetGreedy: farthest-point order, seed = min id, covers the axes") {
    import graft.ops.Similarity
    // three orthogonal axes + near-dups of axis 0: FPS must pick the
    // three axes (in farthest-first order) before any near-dup
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(1f, 0.01f, 0f, 0f)),
      (2L, Array(0.99f, 0.02f, 0f, 0f)),
      (5L, Array(0f, 1f, 0f, 0f)),
      (7L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val q = Similarity.quantize(emb, "vec_id", "embedding")
    val got = Similarity.coresetGreedy(q, "vec_id", 4).orderBy(col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // seed 0; farthest from 0 = an orthogonal axis (cos 0), tie -> min
    // id 5; then 7 (max cos to {0,5} = 0); only then a near-dup
    assert(got.toSeq == Seq((1L, 0L), (2L, 5L), (3L, 7L), (4L, 2L)),
      s"got ${got.toSeq}")
  }

  test("L131 feistelPermute: bijective, invertible, epoch-distinct") {
    import graft.ops.Curation
    val ids = spark.range(0, 2000).toDF("id")
      .union(Seq(65536L, 1000000L, 4294967295L).toDF("id"))
    val out = ids.select(col("id"),
        Curation.feistelPermute(col("id"), 0).as("p0"),
        Curation.feistelPermute(col("id"), 1).as("p1"))
      .withColumn("r0", Curation.feistelInvert(col("p0"), 0))
      .withColumn("r1", Curation.feistelInvert(col("p1"), 1))
    val rows = out.collect()
    assert(rows.forall(r => r.getLong(3) == r.getLong(0) && r.getLong(4) == r.getLong(0)),
      "invert(permute(id)) == id for both epochs")
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < (1L << 32)),
      "permutation stays inside the 2^32 domain")
    val distinctP0 = rows.map(_.getLong(1)).distinct.length
    assert(distinctP0 == rows.length, "epoch-0 images are all distinct (injective)")
    assert(rows.count(r => r.getLong(1) == r.getLong(2)) < rows.length / 100,
      "epoch 0 and epoch 1 orders are (almost everywhere) different")
  }

  test("L129 isotonicCalibrate: minimax identity reproduces classic PAV pooling") {
    import graft.ops.Curation
    // rates .2 .6 .4 .8 (weights 5 each): bins 2/3 violate, PAV pools
    // them to .5 -> [.2, .5, .5, .8]; already-monotone ends unchanged
    val binned = Seq((0L, 5L, 1L), (1L, 5L, 3L), (2L, 5L, 2L), (3L, 5L, 4L))
      .toDF("bin", "n", "pos")
    val got = Curation.isotonicCalibrate(binned).orderBy(col("bin")).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq((0L, 0.2, 0.2), (1L, 0.6, 0.5),
      (2L, 0.4, 0.5), (3L, 0.8, 0.8)), s"got ${got.toSeq}")
    // fit is non-decreasing by construction
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.toSeq)
  }

  test("L126 semanticDecontaminate: same-cell probe hit flagged with argmax + count, cross-cell missed") {
    import graft.ops.Similarity
    // probes = even ids; cell A holds probes 0/2 and corpus 1/3, cell B
    // holds corpus 5 (identical to probe 0, but no probe shares its cell
    // — the documented cross-cell recall miss).
    val emb = Seq(
      (0L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (1L, Array(1f, 0.01f)), (3L, Array(0f, 1f)), (5L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val q = Similarity.quantize(emb, "vec_id", "embedding")
    val cells = Seq((0L, 10), (2L, 10), (1L, 10), (3L, 10), (5L, 20))
      .toDF("vec_id", "cell")
    val got = Similarity.semanticDecontaminate(cells, q, "vec_id",
        probeMod = 2L, minCos = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 0L, 2L)),
      s"only corpus 1 flagged, nearest probe 0, both probes hit: ${got.toSeq}")
  }

  test("L127 mmrTopK: near-dup demoted behind the diverse candidate, rank-1 mmr equals rel") {
    import graft.ops.Similarity
    // query leans on x with some z; corpus: 1 and 2 are near-identical
    // x-axis docs (plain top-k would take both first), 3 is orthogonal
    // to them with moderate relevance. MMR keeps 1, promotes 3 to rank
    // 2 (penalty ~0 vs the near-dup's ~rel-1), demotes 2 to rank 3.
    val qdf = Similarity.quantize(
      Seq((100L, Array(1f, 0f, 0.3f, 0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val corpus = Similarity.quantize(Seq(
        (1L, Array(1f, 0f, 0f, 0f)),
        (2L, Array(1f, 0.01f, 0f, 0f)),
        (3L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val got = Similarity.mmrTopK(qdf, corpus, "vec_id", poolK = 3, selectK = 3)
      .orderBy(col("sel_rank"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 2L),
      s"MMR order must be 1,3,2 (plain top-k is 1,2,3): ${got.toSeq}")
    val rel1 = 1e8 / (math.sqrt(1.09e8) * 1e4)
    assert(math.abs(got(0)._3 - rel1) < 1e-12, "rank-1 mmr is the plain relevance")
    assert(got(1)._3 > 0 && got(2)._3 < 0,
      s"diverse pick scores positive, near-dup negative: ${got.toSeq}")
  }

  test("L144 hits: two exact unnormalized rounds on a hand-checked digraph") {
    import graft.ops.GraphOps
    // 1->3, 2->3, 3->4: h1 = outdeg, a1(3)=2, a1(4)=1;
    // h2(1)=h2(2)=a1(3)=2, h2(3)=a1(4)=1; a2(3)=h2(1)+h2(2)=4, a2(4)=h2(3)=1
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = GraphOps.hits(edges, "src", "dst", iters = 2)
      .orderBy($"node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 0L), (2L, 2L, 0L), (3L, 1L, 4L), (4L, 0L, 1L)),
      s"got $got")
    // duplicate edges are distinct conductances (multigraph)
    val dup = GraphOps.hits(edges.unionAll(Seq((1L, 3L)).toDF("src", "dst")),
        "src", "dst", iters = 1)
      .orderBy($"node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // h1(1)=2 (two parallel edges), a1(3)=h(1)+h(1)+h(2)=2+2+1=5
    assert(dup == Seq((1L, 2L, 0L), (2L, 1L, 0L), (3L, 1L, 5L), (4L, 0L, 1L)),
      s"got $dup")
  }

  test("L145 triangleCounts: shared-edge triangles and bridges count exactly") {
    import graft.ops.GraphOps
    // triangles {1,2,3} and {2,3,4} share edge (2,3); 4-5 is a bridge
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = GraphOps.triangleCounts(pairs, "a", "b")
      .orderBy($"node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 1L), (5L, 0L)),
      s"got $got")
    // a triangle-free star (viral hub): zero triangles, and the degree
    // ordering caps the hub's oriented out-degree at 0 wedge fan-out
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b")
    val sGot = GraphOps.triangleCounts(star, "a", "b")
      .agg(sum($"n_tri")).head.getLong(0)
    assert(sGot == 0L)
  }

  test("L146 collocations: the word2phrase gate accepts the true phrase only") {
    import graft.ops.TextOps
    val docs = Seq("new york is big", "new york city", "the cat sat")
      .toDF("text")
    // N=10; (new,york): c_ab=2,c_a=c_b=2 -> lhs=(2-1)*10=10 > 2*4=8 ACCEPT,
    // score_e3 = 10*1000 div 4 = 2500; every c_ab=1 pair clamps via delta
    val got = TextOps.collocations(docs, "text", delta = 1L, tau = 2L)
    val acc = got.filter($"accepted").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(5))).toSeq
    assert(acc == Seq(("new", "york", 2500L)), s"got $acc")
    assert(got.filter(!$"accepted" && $"score_e3" =!= 0L).count() == 0,
      "c_ab <= delta pairs must clamp to score 0")
  }

  test("L148 normalizeFold folds case/diacritics/punct/whitespace; dedup audit counts") {
    import graft.ops.TextOps
    val f = Seq("Héllo,  Wörld!").toDF("t")
      .select(TextOps.normalizeFold($"t")).head.getString(0)
    assert(f == "hello world", s"got '$f'")
    val docs = Seq(
      ("en", "Hello World"), ("en", "hello,   world!"), ("en", "different"),
      ("fr", "Â la carte")).toDF("lang", "text")
    val got = TextOps.normalizeFoldDedup(docs, "lang", "text")
      .orderBy($"lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(("en", 3L, 3L, 2L, 1L), ("fr", 1L, 1L, 1L, 0L)),
      s"got $got")
  }

  test("L147 ndcgAtK: exact e6 sums, ideal reorder, zero-grade convention") {
    import graft.ops.Retrieval
    val ranked = Seq(
      (1L, 1L, 0L), (1L, 2L, 3L), // dcg = 3*630930; ideal puts 3 first
      (2L, 1L, 0L), (2L, 2L, 0L)  // all-zero -> ndcg 0 by convention
    ).toDF("q", "rank", "rel")
    val got = Retrieval.ndcgAtK(ranked, "q", "rank", "rel", k = 10)
      .orderBy($"q").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      (1L, 1892790L, 3000000L, 1892790d / 3000000d),
      (2L, 0L, 0L, 0d)), s"got $got")
    // a perfect ranking scores exactly 1
    val perfect = Seq((1L, 1L, 3L), (1L, 2L, 2L), (1L, 3L, 1L)).toDF("q", "rank", "rel")
    val p = Retrieval.ndcgAtK(perfect, "q", "rank", "rel", k = 10).head
    assert(p.getDouble(3) == 1.0d)
  }

  test("L282 errAtK: rank contract is loud — duplicates and gaps raise") {
    import graft.ops.Retrieval
    // contiguous 1..2 per query: fine (q1 grade-3 at rank 1 dominates)
    val ok = Seq((1L, 1L, 3L), (1L, 2L, 1L)).toDF("query", "rank", "grade")
    val row = Retrieval.errAtK(ok, "query", "rank", "grade", k = 10).head
    assert(row.getLong(1) == 2L && row.getLong(2) > 0L)
    // duplicate ranks: deterministic-but-wrong before the gate; now loud
    val dup = Seq((1L, 1L, 3L), (1L, 1L, 1L), (1L, 3L, 0L))
      .toDF("query", "rank", "grade")
    val e1 = intercept[Exception] {
      Retrieval.errAtK(dup, "query", "rank", "grade", k = 10).collect()
    }
    assert(e1.getMessage.contains("contiguous"), e1.getMessage)
    // gapped ranks (2,3 without 1): loud
    val gap = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("query", "rank", "grade")
    val e2 = intercept[Exception] {
      Retrieval.errAtK(gap, "query", "rank", "grade", k = 10).collect()
    }
    assert(e2.getMessage.contains("contiguous"), e2.getMessage)
  }

  test("L149 kCorePeel: tail peels away round by round, the core survives") {
    import graft.ops.GraphOps
    // triangle {1,2,3} with tail 3-4-5: round 1 drops 5, round 2 drops 4
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got3 = GraphOps.kCorePeel(g, "a", "b", k = 2, rounds = 3)
      .orderBy($"node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    // round 3 removes nothing -> converged witnesses true
    assert(got3 == Seq((1L, 2L, true), (2L, 2L, true), (3L, 2L, true)),
      s"got $got3")
    // a pure path has no 2-core: three rounds peel P5 to nothing
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    assert(GraphOps.kCorePeel(path, "a", "b", k = 2, rounds = 3).count() == 0L)
    // bounded-round contract: after only ONE round, 4 is still there
    // (it loses its neighbor 5 but is re-judged next round)
    val oneDf = GraphOps.kCorePeel(g, "a", "b", k = 2, rounds = 1)
    val one = oneDf.orderBy($"node").collect().map(_.getLong(0)).toSeq
    assert(one == Seq(1L, 2L, 3L, 4L), s"got $one")
    // round 1 dropped node 5 -> not yet converged
    assert(oneDf.select($"converged").head.getBoolean(0) == false)
  }

  test("L150 ibanValid: textbook IBAN validates, any single-digit tamper fails") {
    import graft.ops.Curation
    val df = Seq(
      "GB82WEST12345698765432", // the standard ISO 13616 example
      "GB82WEST12345698765433", // tampered last digit
      "GB83WEST12345698765432", // tampered check digit
      "GB82west12345698765432", // lowercase: structurally malformed
      "GB82WEST1234569876-432", // punctuation: structurally malformed
      "NO938601111794"          // 14 chars: below the ISO 15-char floor
    ).toDF("iban").withColumn("ok", Curation.ibanValid($"iban"))
    val got = df.orderBy($"iban").collect().map(r => (r.getString(0), r.getBoolean(1)))
    assert(got.toSeq == Seq(
      ("GB82WEST1234569876-432", false),
      ("GB82WEST12345698765432", true),
      ("GB82WEST12345698765433", false),
      ("GB82west12345698765432", false),
      ("GB83WEST12345698765432", false),
      ("NO938601111794", false)), s"got ${got.toSeq}")
    // the minting dual: checkDigits(cc, bban) always yields a valid IBAN
    val minted = Seq(("DE", "000012345678901234"), ("FR", "99999999999")).toDF("cc", "bban")
      .select(concat($"cc",
        lpad(Curation.ibanCheckDigits($"cc", $"bban").cast("string"), 2, "0"),
        $"bban").as("iban"))
      .withColumn("ok", Curation.ibanValid($"iban"))
    assert(minted.filter(!$"ok").count() == 0L)
  }

  test("L151 quantileNormalizeScores maps source ranks onto the global distribution") {
    import graft.ops.Curation
    val scores = Seq(
      (1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L), (4L, "A", 4L),
      (5L, "B", 10L), (6L, "B", 20L)).toDF("id", "src", "s")
    // global sorted: [1,2,3,4,10,20]; B rn=1 -> p=1 -> 1, rn=2 -> p=4 -> 4;
    // A ranks map to p 1,2,4,5 -> 1,2,4,10
    val got = Curation.quantileNormalizeScores(scores, "id", "src", "s")
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 1L, 1L), (2L, 2L, 2L), (3L, 3L, 4L), (4L, 4L, 10L),
      (5L, 10L, 1L), (6L, 20L, 4L)), s"got $got")
    // after normalization the two sources draw from the same value set
    val norms = Curation.quantileNormalizeScores(scores, "id", "src", "s")
      .groupBy($"src").agg(collect_set($"norm").as("vs")).collect()
      .map(r => r.getSeq[Long](1).toSet).toSeq
    assert(norms(1).subsetOf(norms(0)) || norms(0).subsetOf(norms(1)))
  }

  test("L153 trussPeel: unsupported edges drop, supports recompute per round") {
    import graft.ops.GraphOps
    // two triangles sharing (2,3), plus the bridge 4-5
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val t3 = GraphOps.trussPeel(g, "a", "b", k = 3, rounds = 2)
      .orderBy($"a", $"b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    // round 2 removes nothing (round 1 already dropped the 4-5 bridge)
    // -> converged true on every surviving edge
    assert(t3 == Seq((1L, 2L, 1L, true), (1L, 3L, 1L, true), (2L, 3L, 2L, true),
      (2L, 4L, 1L, true), (3L, 4L, 1L, true)), s"got $t3")
    // k=4 demands 2 witnesses: round 1 keeps only (2,3), whose
    // triangles then vanish -> round 2 empties the truss
    assert(GraphOps.trussPeel(g, "a", "b", k = 4, rounds = 2).count() == 0L)
  }

  test("L154 charChiSquare: e6-quantized letter-share divergence, exact") {
    import graft.ops.TextOps
    val docs = Seq((1L, "aaab"), (2L, "ab")).toDF("doc_id", "text")
    // mirror the op's integer arithmetic in plain Scala
    val o = Map(1L -> Map('a' -> 3L, 'b' -> 1L), 2L -> Map('a' -> 1L, 'b' -> 1L))
    val n = Map(1L -> 4L, 2L -> 2L)
    val e = Map('a' -> 4L, 'b' -> 2L); val nn = 6L
    def score(id: Long): Long = ('a' to 'z').map { c =>
      val pd = o(id).getOrElse(c, 0L) * 1000000L / n(id)
      val pc = e.getOrElse(c, 0L) * 1000000L / nn
      (pd - pc) * (pd - pc) / (pc + 1L)
    }.sum
    val got = TextOps.charChiSquare(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 4L, score(1L)), (2L, 2L, score(2L))), s"got $got")
    // an off-profile doc scores far above an on-profile one
    val mixed = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "zzzzzzzzzzzzzzzzzzzzzz")).toDF("doc_id", "text")
    val sc = TextOps.charChiSquare(mixed, "doc_id", "text")
      .orderBy($"doc_id").collect().map(_.getLong(2))
    // (with only 3 docs the corpus profile is itself z-skewed, which
    // compresses the gap — 5x is already decisive)
    assert(sc(2) > 5L * math.max(sc(0), 1L), s"gibberish must dominate: ${sc.toSeq}")
  }

  test("L155 wordErrorRate: word-level edits count 1 each; oversized dict flags -1") {
    import graft.ops.TextOps
    val pairs = Seq(
      (1L, Seq("a", "b", "c", "d"), Seq("a", "x", "c")),   // sub + del = 2
      (2L, Seq("a", "b"), Seq("a", "b")),                  // identical = 0
      (3L, Seq("a", "b"), Seq("b", "a")),                  // swap = 2 (no transposition op)
      (4L, Seq("hello"), Seq("hellox"))                    // whole-word sub = 1, never char-diff
    ).toDF("id", "ref", "hyp")
    val got = TextOps.wordErrorRate(pairs, "id", "ref", "hyp")
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == Seq((1L, 2L, 0.5), (2L, 0L, 0.0), (3L, 2L, 1.0), (4L, 1L, 1.0)),
      s"got $got")
    // a pair whose union vocabulary exceeds the 200-code-point budget
    // must flag -1 loudly, never encode wrongly
    val big = Seq((9L, (1 to 150).map("r" + _), (1 to 150).map("h" + _)))
      .toDF("id", "ref", "hyp")
    val b = TextOps.wordErrorRate(big, "id", "ref", "hyp").head
    assert(b.getLong(3) == -1L && b.getDouble(4) == -1d)
  }

  test("L156 chunkUtterances bounds every WER pair: a 600-distinct-word transcript never flags -1") {
    import graft.ops.TextOps
    // window shape: 250 tokens -> utterances of 100/100/50; empty drops
    val doc = (1 to 250).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val got = TextOps.chunkUtterances(df, "doc_id", "text", 100)
      .orderBy($"doc_id", $"utt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2).length)).toSeq
    assert(got == Seq((1L, 0L, 100), (1L, 1L, 100), (1L, 2L, 50), (3L, 0L, 2)),
      s"got $got")
    assert(TextOps.chunkUtterances(df, "doc_id", "text", 100)
      .filter($"utt_id" === 0L).head.getSeq[String](2).take(3) == Seq("w1", "w2", "w3"))
    // the composition gap the chunker closes: an all-distinct 600-word
    // transcript overflows wordErrorRate's 200-word dictionary when fed
    // WHOLE (dist -1), but NO chunked utterance pair can (<=100 ref
    // words + <=100 corrupted variants < 200 by construction)
    val long = Seq((7L, (1 to 600).map(i => s"u$i").mkString(" "))).toDF("doc_id", "text")
    val whole = long.select($"doc_id",
      TextOps.tokens($"text").as("ref"), TextOps.tokens($"text").as("hyp"))
    assert(TextOps.wordErrorRate(whole, "doc_id", "ref", "hyp").head.getLong(3) == -1L)
    val chunked = TextOps.chunkUtterances(long, "doc_id", "text", 100)
      .select(($"doc_id" * 10000L + $"utt_id").as("k"), $"utt".as("ref"), $"utt".as("hyp"))
    val dists = TextOps.wordErrorRate(chunked, "k", "ref", "hyp")
      .select($"dist").collect().map(_.getLong(0)).toSeq
    assert(dists.length == 6 && dists.forall(_ == 0L), s"got $dists")
    intercept[IllegalArgumentException] {
      TextOps.chunkUtterances(df, "doc_id", "text", 101)
    }
  }

  test("L157 unigramLmRound: Viterbi picks the max-probability segmentation, M-step recounts") {
    import graft.ops.TextOps
    // q(x)=201, q(z)=400, q(y)=201, q(xz)=200, q(zy)=200, q(xy)=1.
    // 'xz': q(x)q(z)=80400 < q(xz)*10^4=2e6 -> whole piece wins (same
    // for 'zy'); 'xy': q(x)q(y)=40401 > q(xy)*10^4=1e4 -> splits.
    val text = ("xz " * 200) + ("zy " * 200) + "xy"
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextOps.unigramLmRound(df, "text")
      .orderBy($"piece").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("x", 1L), ("xz", 200L), ("y", 1L), ("zy", 200L)), s"got $got")
    // the lattice is the fixed 222-pattern composition table
    assert(TextOps.unigramSlots.map(s => (s._1, s._2)).distinct.size == 222)
    assert(TextOps.unigramSlots.size == 943)
    // every word length 2..8 has the all-ones pattern -> always >= 1
    // valid segmentation (single letters are always in the seed)
    for (n <- 2 to 8)
      assert(TextOps.unigramSlots.exists(s => s._1 == n && s._3 == n))
  }

  test("L158 diarizationErrorRate: optimal mapping recovers relabelings, never true confusion") {
    import graft.ops.EvalOps
    val ref = Seq(
      (1L, 0L, 10L, 0), (1L, 10L, 20L, 1),   // perfect hyp
      (2L, 0L, 10L, 0), (2L, 10L, 20L, 1),   // globally swapped hyp labels
      (3L, 0L, 10L, 0),                      // shifted hyp
      (4L, 0L, 10L, 0), (4L, 10L, 20L, 1), (4L, 20L, 30L, 2) // one seg mislabeled
    ).toDF("f", "s", "e", "spk")
    val hyp = Seq(
      (1L, 0L, 10L, 0), (1L, 10L, 20L, 1),
      (2L, 0L, 10L, 1), (2L, 10L, 20L, 0),
      (3L, 2L, 12L, 0),
      (4L, 0L, 10L, 0), (4L, 10L, 20L, 0), (4L, 20L, 30L, 2)
    ).toDF("f", "s", "e", "spk")
    val got = EvalOps.diarizationErrorRate(ref, hyp, "f", "s", "e", "spk")
      .orderBy($"file").collect()
      .map(r => (r.getLong(0), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getDouble(8))).toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 0L, 0.0),     // exact match
      (2L, 0L, 0L, 0L, 0.0),     // global swap undone by the optimal mapping
      (3L, 2L, 2L, 0L, 0.4),     // 2 missed + 2 false alarm on 10 ref
      (4L, 0L, 0L, 10L, 10d / 30d) // one mislabeled seg = true confusion
    ), s"got $got")
    // a file with no hypothesis at all is all miss, DER 1
    val noHyp = EvalOps.diarizationErrorRate(
      Seq((9L, 0L, 10L, 0)).toDF("f", "s", "e", "spk"),
      Seq((8L, 0L, 10L, 0)).toDF("f", "s", "e", "spk"),
      "f", "s", "e", "spk").filter($"file" === 9L).head
    assert(noHyp.getLong(5) == 10L && noHyp.getDouble(8) == 1.0)
    // ...and the converse: a file with hypothesis speech but NO
    // reference speech must still emit — t_ref 0, its FA time
    // surfaced, der the loud -1 flag (0/0 is not a score)
    val faOnly = EvalOps.diarizationErrorRate(
      Seq((9L, 0L, 10L, 0)).toDF("f", "s", "e", "spk"),
      Seq((8L, 0L, 10L, 0)).toDF("f", "s", "e", "spk"),
      "f", "s", "e", "spk").filter($"file" === 8L).head
    assert(faOnly.getLong(1) == 0L, s"t_ref: $faOnly")     // t_ref
    assert(faOnly.getLong(6) == 10L, s"t_fa: $faOnly")     // t_fa
    assert(faOnly.getDouble(8) == -1.0, s"der: $faOnly")
  }

  test("L158 diarizationErrorRate: out-of-contract speaker ids flag der -1, never a skewed score") {
    import graft.ops.EvalOps
    // hyp speaker 7 breaks the 0..3 lattice contract: its overlap
    // would silently vanish from t_correct while staying in t_both,
    // inflating confusion — the file must flag instead
    val ref = Seq((1L, 0L, 10L, 0), (2L, 0L, 10L, 0)).toDF("f", "s", "e", "spk")
    val hyp = Seq((1L, 0L, 10L, 7), (2L, 0L, 10L, 0)).toDF("f", "s", "e", "spk")
    val got = EvalOps.diarizationErrorRate(ref, hyp, "f", "s", "e", "spk")
      .orderBy($"file").collect()
      .map(r => (r.getLong(0), r.getDouble(8))).toSeq
    assert(got == Seq((1L, -1.0), (2L, 0.0)), s"got $got")
    // same contract on the ref side
    val refBad = Seq((1L, 0L, 10L, -2)).toDF("f", "s", "e", "spk")
    val hypOk = Seq((1L, 0L, 10L, 0)).toDF("f", "s", "e", "spk")
    assert(EvalOps.diarizationErrorRate(refBad, hypOk, "f", "s", "e", "spk")
      .head.getDouble(8) == -1.0)
  }

  test("L174 speakerConfusion: merged voices surface as t_confused under the chosen mapping") {
    import graft.ops.EvalOps
    val ref = Seq(
      (4L, 0L, 10L, 0), (4L, 10L, 20L, 1), (4L, 20L, 30L, 2),
      (9L, 0L, 10L, 0) // no hypothesis file
    ).toDF("f", "s", "e", "spk")
    val hyp = Seq(
      // the diarizer merged ref spk1 into hyp spk0
      (4L, 0L, 10L, 0), (4L, 10L, 20L, 0), (4L, 20L, 30L, 2)
    ).toDF("f", "s", "e", "spk")
    val got = EvalOps.speakerConfusion(ref, hyp, "f", "s", "e", "spk")
      .orderBy($"file", $"spk_ref").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == Seq(
      (4L, 0L, 0L, 10L, 10L, 0L, 0L),
      (4L, 1L, 1L, 10L, 0L, 10L, 0L),  // all of spk1's time is confusion
      (4L, 2L, 2L, 10L, 10L, 0L, 0L),
      (9L, 0L, -1L, 10L, 0L, 0L, 10L)  // no mapping, all missed
    ), s"got $got")
    // contract-violation surfaces (scaladoc'd): an out-of-range REF id
    // can never map -> spk_mapped -1 with its time loud in
    // confused/missed; an out-of-range HYP label's overlap lands in
    // t_confused (it is nobody's mapped label) — neither vanishes
    val refC = Seq((5L, 0L, 10L, 0), (5L, 10L, 20L, 9), (5L, 20L, 30L, 1))
      .toDF("f", "s", "e", "spk")
    val hypC = Seq((5L, 0L, 10L, 7), (5L, 10L, 20L, 0), (5L, 20L, 30L, 1))
      .toDF("f", "s", "e", "spk")
    val gotC = EvalOps.speakerConfusion(refC, hypC, "f", "s", "e", "spk")
      .orderBy($"spk_ref").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5),
        r.getLong(6))).toSeq
    assert(gotC == Seq(
      (0L, 0L, 0L, 10L, 0L),   // ref 0's time overlapped the invalid hyp 7 -> confused
      (1L, 1L, 10L, 0L, 0L),   // the valid anchor pair pins the identity mapping
      (9L, -1L, 0L, 10L, 0L)), // invalid ref id: no mapping, overlap with hyp 0 -> confused
      s"got $gotC")
  }

  test("L175 dowProfile: uniform week scores 0, one-day spike scores the textbook 42") {
    import graft.ops.EventAnalytics
    val day = 86400000000L
    val ev = ((0 until 7).map(d => ("x", d * day + 5L)) ++
      (0 until 7).map(_ => ("y", 3L * day + 9L))).toDF("t", "tus")
    val got = EventAnalytics.dowProfile(ev, "t", "tus")
      .orderBy($"type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    // y: num = 49*49 - 7*49 = 2058, chisq = 2058/49 = 42 = (k-1)*n
    assert(got == Seq(("x", 7L, 7L, 0L, 0.0), ("y", 7L, 1L, 2058L, 42.0)),
      s"got $got")
  }

  test("L190 bfsDistances: exact hops within the round budget, unreached flags loudly") {
    import graft.ops.GraphOps
    // chain 1->2->3->4->5, shortcut 1->4, island 9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (9L, 9L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("seed")
    val got = GraphOps.bfsDistances(edges, "src", "dst", seeds, "seed", rounds = 3)
      .orderBy($"node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    // shortest paths: 1=0, 2=1, 3=2, 4=1 (shortcut beats the chain),
    // 5=2; the 9-self-loop island never reaches
    assert(got == Seq(
      (1L, 0L, true), (2L, 1L, true), (3L, 2L, true),
      (4L, 1L, true), (5L, 2L, true), (9L, -1L, false)), s"got $got")
    // a tighter budget truncates the frontier, never mislabels it
    val r1 = GraphOps.bfsDistances(edges, "src", "dst", seeds, "seed", rounds = 1)
      .orderBy($"node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(r1 == Seq((1L, 0L), (2L, 1L), (3L, -1L), (4L, 1L), (5L, -1L),
      (9L, -1L)), s"got $r1")
  }

  test("L190 bfsDistances: isolated seed surfaces at dist 0; converged " +
      "witnesses frontier exhaustion") {
    import graft.ops.GraphOps
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    // 99 appears in seeds but touches no edge: trivially dist 0, must
    // NOT silently vanish from the report (r9 ADVICE)
    val seeds = Seq(1L, 99L).toDF("seed")
    val r3 = GraphOps.bfsDistances(edges, "src", "dst", seeds, "seed",
        rounds = 3).orderBy($"node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSeq
    // round 3 still relaxed node 4 (2->3... it set d(4)=3), so the
    // process had NOT exhausted entering the final round
    assert(r3 == Seq((1L, 0L, false), (2L, 1L, false), (3L, 2L, false),
      (4L, 3L, false), (99L, 0L, false)), s"got $r3")
    // one spare round: nothing changes in it -> converged
    val r4 = GraphOps.bfsDistances(edges, "src", "dst", seeds, "seed",
        rounds = 4).orderBy($"node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSeq
    assert(r4 == Seq((1L, 0L, true), (2L, 1L, true), (3L, 2L, true),
      (4L, 3L, true), (99L, 0L, true)), s"got $r4")
  }

  test("L196 ssspDistances: weighted relaxation beats hop shortcuts; " +
      "negative weight raises loudly") {
    import graft.ops.GraphOps
    // direct edge 1->3 costs 9; the 2-hop path costs 5+1=6
    val edges = Seq((1L, 3L, 9L), (1L, 2L, 5L), (2L, 3L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(Tuple1(1L)).toDF("seed")
    val got = GraphOps.ssspDistances(edges, "src", "dst", "w", seeds,
        "seed", rounds = 3).orderBy($"node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3))).toSeq
    assert(got == Seq((1L, 0L, true, true), (2L, 5L, true, true),
      (3L, 6L, true, true)), s"got $got")
    // after ONE round the direct (more expensive) edge wins — the
    // Bellman-Ford round invariant: paths of <= k edges exact at round k
    val g1 = GraphOps.ssspDistances(edges, "src", "dst", "w", seeds,
        "seed", rounds = 1).orderBy($"node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(g1 == Seq((1L, 0L), (2L, 5L), (3L, 9L)), s"got $g1")
    // contract: a negative weight corrupts the invariant -> loud error
    val bad = Seq((1L, 2L, -1L)).toDF("src", "dst", "w")
    val ex = intercept[Exception] {
      GraphOps.ssspDistances(bad, "src", "dst", "w", seeds, "seed",
        rounds = 1).collect()
    }
    assert(ex.getMessage != null)
  }

  test("L201 hyperBall: registers equal the hand-merged HLL of the ball") {
    import graft.ops.GraphOps
    // star: 1 -> {2, 3, 4}; leaves have no out-edges.
    // ball(1, 1) = {1,2,3,4}; ball(leaf, 1) = {leaf}
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val got = GraphOps.hyperBall(edges, "src", "dst", b = 4, rounds = 1)
      .orderBy($"node").collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[String]("regs"),
        r.getAs[Long]("s_scaled"), r.getAs[Long]("n_zero"))).toSeq
    // replicate the register discipline independently (public md5 hash,
    // bucket = top 4 of 60 bits, rho = 57 - bitlength of low 56)
    def hv(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def regsOf(ids: Seq[Long]): Array[Long] = {
      val a = new Array[Long](16)
      ids.foreach { id =>
        val h = hv(id)
        val bucket = (h >>> 56).toInt
        val w = h & ((1L << 56) - 1L)
        val rho = if (w == 0L) 57L else 57L - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > a(bucket)) a(bucket) = rho
      }
      a
    }
    def row(ids: Seq[Long]): (String, Long, Long) = {
      val a = regsOf(ids)
      (a.mkString(","), a.map(r => 1L << (57 - r)).sum, a.count(_ == 0L).toLong)
    }
    val e1 = row(Seq(1L, 2L, 3L, 4L))
    val e2 = row(Seq(2L)); val e3 = row(Seq(3L)); val e4 = row(Seq(4L))
    assert(got == Seq((1L, e1._1, e1._2, e1._3), (2L, e2._1, e2._2, e2._3),
      (3L, e3._1, e3._2, e3._3), (4L, e4._1, e4._2, e4._3)), s"got $got")
    // merge monotonicity: the hub's inverse-power sum can only shrink
    assert(e1._2 <= Seq(e2._2, e3._2, e4._2).min)
  }

  test("L202 vocabGrowth: exact Heaps trajectory on a constructed corpus") {
    import graft.ops.Curation
    // doc i carries a fresh type t_i plus the shared type 'common'
    val docs = (0L until 10L).map(i => (i, Seq(s"t$i", "common")))
      .toDF("doc_id", "toks")
    val got = Curation.vocabGrowth(docs, "doc_id", "toks", nCheckpoints = 5)
      .orderBy($"checkpoint").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // cutoff c = 2,4,6,8,10: n_docs = c, n_tokens = 2c, vocab = c + 1
    assert(got == Seq(
      (1L, 2L, 2L, 4L, 3L), (2L, 4L, 4L, 8L, 5L), (3L, 6L, 6L, 12L, 7L),
      (4L, 8L, 8L, 16L, 9L), (5L, 10L, 10L, 20L, 11L)), s"got $got")
  }

  test("L209 bradleyTerry: two-item fixed point equals the win rate; " +
      "transitive ordering without direct games") {
    import graft.ops.EventAnalytics
    // A beats B 3-1: BT for two items is the win odds — s_A/(s_A+s_B)
    // = 3/4. Fixed point lands in ONE round here (denominator s_A+s_B
    // stays 2e6): s_A = 1.5e6, s_B = 0.5e6.
    val t1 = Seq(("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"))
      .toDF("win", "lose")
    val g1 = EventAnalytics.bradleyTerry(t1, "win", "lose", rounds = 2)
      .orderBy($"item").collect()
      .map(r => (r.getString(0), r.getAs[Long]("wins"),
        r.getAs[Long]("games"), r.getAs[Long]("s_e6"))).toSeq
    assert(g1 == Seq(("A", 3L, 4L, 1500000L), ("B", 1L, 4L, 500000L)),
      s"got $g1")
    // A>B twice, B>C twice, no A-C games: strengths must order A>B>C
    val t2 = Seq(("A", "B"), ("A", "B"), ("B", "C"), ("B", "C"))
      .toDF("win", "lose")
    val g2 = EventAnalytics.bradleyTerry(t2, "win", "lose", rounds = 3)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("s_e6")).toMap
    assert(g2("A") > g2("B") && g2("B") > g2("C"), s"got $g2")
    // the all-losses item floors at 1, never 0 (stays a valid denominator)
    assert(g2("C") >= 1L)
  }

  test("L210 fleissKappa: the Fleiss 1971 worked example (14 raters, " +
      "10 items, 5 categories) reproduces the published 0.21") {
    import graft.ops.EvalOps
    // the canonical psychiatric-diagnosis table (Fleiss 1971, Table 1):
    // per item the category counts over 14 raters; published P-bar =
    // 0.378, P_e = 0.213, kappa = 0.21
    val table: Seq[Seq[Int]] = Seq(
      Seq(0, 0, 0, 0, 14), Seq(0, 2, 6, 4, 2), Seq(0, 0, 3, 5, 6),
      Seq(0, 3, 9, 2, 0), Seq(2, 2, 8, 1, 1), Seq(7, 7, 0, 0, 0),
      Seq(3, 2, 6, 3, 0), Seq(2, 5, 3, 2, 2), Seq(6, 5, 2, 1, 0),
      Seq(0, 2, 2, 3, 7))
    val rows = for {
      (cats, item) <- table.zipWithIndex
      (cnt, cat) <- cats.zipWithIndex
      _ <- 0 until cnt
    } yield (item.toLong, s"c$cat")
    val r = EvalOps.fleissKappa(rows.toDF("item", "cat"), "item", "cat")
      .head
    assert((r.getAs[Long]("n_items"), r.getAs[Long]("n_raters"),
      r.getAs[Long]("p_bar_e6"), r.getAs[Long]("p_e_e6"))
      == ((10L, 14L, 378021L, 212754L)), s"got $r")
    assert(r.getAs[Double]("kappa") == 165267d / 787246d, s"got $r")
    // uneven panel is a loud contract violation, not a wrong number
    intercept[IllegalArgumentException] {
      EvalOps.fleissKappa(
        Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("item", "cat"),
        "item", "cat")
    }
  }

  test("L212 brierDecomposition: hand-checked Murphy components; the " +
      "identity gap is exactly the within-bin variance") {
    import graft.ops.EvalOps
    // nBins = 2 (width 5e5): bin0 = {(0.2, 0), (0.2, 1)},
    // bin1 = {(0.9, 1), (0.7, 1)}; ybar = 3/4
    val df = Seq((200000L, 0L), (200000L, 1L), (900000L, 1L),
      (700000L, 1L)).toDF("s", "y")
    val r = EvalOps.brierDecomposition(df, $"s", $"y", nBins = 2).head
    val (n, brier, ybar, rel, res, unc) = (r.getAs[Long]("n"),
      r.getAs[Long]("brier_e12"), r.getAs[Long]("ybar_e6"),
      r.getAs[Long]("rel_e12"), r.getAs[Long]("res_e12"),
      r.getAs[Long]("unc_e12"))
    assert((n, brier, ybar, rel, res, unc) ==
      ((4L, 195000000000L, 750000L, 65000000000L, 62500000000L,
        187500000000L)), s"got $r")
    // Murphy identity over the BINNED forecaster: raw Brier exceeds
    // REL - RES + UNC by exactly the within-bin variance (bin1 holds
    // 0.9 and 0.7 around pbar 0.8: 2·(1e5)² / 4 = 5e9)
    assert(brier - (rel - res + unc) == 5000000000L)
    // out-of-domain score raises loudly (shares the L181 contract)
    intercept[Exception] {
      EvalOps.brierDecomposition(
        Seq((1000001L, 1L)).toDF("s", "y"), $"s", $"y").collect()
    }
  }

  test("L211 conformalAudit: exact order-statistic threshold, audited " +
      "coverage, loud -1 on short calibration") {
    import graft.ops.EvalOps
    // group g: 19 calibration scores 1..19 -> k = ceil(20*0.9) = 18,
    // qhat = 18; all 10 test scores <= 18 -> coverage 1.0.
    // group h: 3 calibration points -> k = 4 > n -> loud -1s.
    val cal = ((1L to 19L).map(i => ("g", i * 1L)) ++
      Seq(("h", 5L), ("h", 6L), ("h", 7L))).toDF("grp", "s")
    val test = ((1L to 10L).map(i => ("g", i)) :+ (("h", 6L)))
      .toDF("grp", "s")
    val got = EvalOps.conformalAudit(cal, test, "grp", "s",
        alphaNum = 1, alphaDen = 10)
      .orderBy($"group").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_cal"), r.getAs[Long]("k"),
        r.getAs[Long]("qhat_e6"), r.getAs[Long]("n_test"),
        r.getAs[Long]("n_covered"), r.getAs[Long]("coverage_e6"))).toSeq
    assert(got == Seq(
      ("g", 19L, 18L, 18L, 10L, 10L, 1000000L),
      ("h", 3L, 4L, -1L, 1L, 0L, -1L)), s"got $got")
  }

  test("L206 kAnonymityLadder: first qualifying rung, coarser merge, " +
      "loud suppression") {
    import graft.ops.Curation
    // group ("s","en"): 6 docs at v 0..5 (k=5 holds at rung 0);
    // 4 docs at v 64..67 and 3 at v 128..130 (fail rung 0, merge with
    // the first 6 into bucket 0 at rung 1 -> group of 13);
    // 1 doc at v 5000 (alone at every rung -> suppressed)
    val rows = ((0L until 6L).map(i => (i, "s", "en", i)) ++
      (0L until 4L).map(i => (10L + i, "s", "en", 64L + i)) ++
      (0L until 3L).map(i => (20L + i, "s", "en", 128L + i)) :+
      ((30L, "s", "en", 5000L)))
      .toDF("doc_id", "source", "lang", "v")
    val got = Curation.kAnonymityLadder(rows, "doc_id",
        Seq("source", "lang"), "v", Seq(64L, 256L, 1024L), k = 5L)
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("level"),
        r.getAs[Long]("group_n"))).toSeq
    val expect = (0L until 6L).map(i => (i, 0L, 6L)) ++
      (0L until 4L).map(i => (10L + i, 1L, 13L)) ++
      (0L until 3L).map(i => (20L + i, 1L, 13L)) :+ ((30L, -1L, -1L))
    assert(got == expect, s"got $got")
    // non-dividing granularities are a contract violation
    intercept[IllegalArgumentException] {
      Curation.kAnonymityLadder(rows, "doc_id", Seq("source"), "v",
        Seq(64L, 100L), k = 5L)
    }
  }

  test("L207 blockingAudit: exact reduction ratio and pairs completeness") {
    import graft.ops.Dedup
    val docs = (1L to 5L).map(Tuple1(_)).toDF("doc_id") // 10 total pairs
    val cand = Seq((1L, 2L), (3L, 4L), (2L, 1L), (5L, 5L)) // dup + self
      .toDF("a", "b")
    val truth = Seq((1L, 2L), (3L, 1L)).toDF("a", "b")
    val r = Dedup.blockingAudit(docs, "doc_id", cand, "a", "b",
      truth, "a", "b").head
    assert((r.getAs[Long]("n_docs"), r.getAs[Long]("n_total_pairs"),
      r.getAs[Long]("n_cand"), r.getAs[Long]("n_truth"),
      r.getAs[Long]("n_hit"), r.getAs[Long]("rr_e6"),
      r.getAs[Long]("completeness_e6"))
      == ((5L, 10L, 2L, 2L, 1L, 800000L, 500000L)), s"got $r")
  }

  test("L208 gainPlan: largest non-clipping rung; loud -1 when every " +
      "rung clips") {
    import graft.ops.Multimodal
    import graft.model.AudioFile
    // exact q roundtrip holds for |q| <= 16384 (q/32767*32768 rounds
    // back to q)
    def wave(qs: Seq[Int]) = qs.map(q => q / 32767f).toArray
    val audio = Seq(
      AudioFile("1", 8000, wave(Seq(50, -100, 25))),     // peak 100
      AudioFile("2", 8000, wave(Seq(12000, -7, 0))),     // peak 12000
      AudioFile("3", 8000, wave(Seq(-16000, 4, 16000)))  // peak 16000
    ).toDS()
    val got = Multimodal.gainPlan(audio,
        Seq(250000L, 500000L, 1000000L, 2000000L, 4000000L), ceilQ = 30000L)
      .orderBy($"file").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("peak_q"),
        r.getAs[Long]("sum_sq"), r.getAs[Long]("gain_e6"),
        r.getAs[Long]("post_peak_q"))).toSeq
    // 100*4e6 = 4e8 <= 3e10; 12000*4e6 > 3e10 but *2e6 = 2.4e10 ok;
    // 16000*2e6 = 3.2e10 > 3e10 -> 1e6
    assert(got == Seq(
      (1L, 100L, 50L * 50L + 100L * 100L + 25L * 25L, 4000000L, 400L),
      (2L, 12000L, 12000L * 12000L + 49L, 2000000L, 24000L),
      (3L, 16000L, 2L * 16000L * 16000L + 16L, 1000000L, 16000L)),
      s"got $got")
    // a 1-q ceiling: every rung clips every file -> -1 plan, loud not 0
    val tight = Multimodal.gainPlan(audio, Seq(250000L), ceilQ = 1L)
      .orderBy($"file").collect().map(_.getAs[Long]("gain_e6")).toSeq
    assert(tight == Seq(-1L, -1L, -1L), s"got $tight")
  }

  test("L203 layoutSkipAudit: exact envelope-intersection counts; tight " +
      "layout beats scattered on strip queries") {
    import graft.ops.Curation
    // 40 points, c0 = id, c1 = id -> a linear layout on c0 gives 4
    // tight files; interleaving ids across files scatters envelopes
    val pts = (0L until 40L).map(i => (i, i, i)).toDF("u", "t", "tie")
    val tight = Curation.linearLayout(pts, "u", "t", "tie", rowsPerFile = 10)
    val tRows = tight.orderBy($"file_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(tRows == Seq(
      (0L, 10L, 0L, 9L, 0L, 9L), (1L, 10L, 10L, 19L, 10L, 19L),
      (2L, 10L, 20L, 29L, 20L, 29L), (3L, 10L, 30L, 39L, 30L, 39L)),
      s"got $tRows")
    // scattered: file f holds ids {f, f+4, f+8, ...} -> every envelope
    // spans nearly the whole domain
    val scattered = (0L until 40L).map(i => (i % 4, i, i))
      .toDF("file_id", "u", "t").groupBy($"file_id")
      .agg(count(lit(1)).as("n"), min($"u").as("min_u"), max($"u").as("max_u"),
        min($"t").as("min_t"), max($"t").as("max_t"))
    // workload from the data's own bounds: 4 strips on u with
    // overlapping t bands
    val w = Curation.rangeWorkload(pts, "u", "t", nQueries = 4)
    val wRows = w.orderBy($"q_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // bounds (0, 39): lo0 = 39q/4 floor, hi0 = 39(q+1)/4, hi1 = 39(q+2)/4
    assert(wRows == Seq(
      (0L, 0L, 9L, 0L, 19L), (1L, 9L, 19L, 9L, 29L),
      (2L, 19L, 29L, 19L, 39L), (3L, 29L, 39L, 29L, 48L)), s"got $wRows")
    val audit = Curation.layoutSkipAudit(
        Seq("scattered" -> scattered, "tight" -> tight), w,
        "min_u", "max_u", "min_t", "max_t")
      .orderBy($"layout", $"q_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // tight: q0's strip [0,9] sits inside file 0; later strips share an
    // endpoint with the previous file -> 2. scattered: all 4, always.
    assert(audit == Seq(
      ("scattered", 0L, 4L, 4L), ("scattered", 1L, 4L, 4L),
      ("scattered", 2L, 4L, 4L), ("scattered", 3L, 4L, 4L),
      ("tight", 0L, 4L, 1L), ("tight", 1L, 4L, 2L),
      ("tight", 2L, 4L, 2L), ("tight", 3L, 4L, 2L)), s"got $audit")
  }

  test("L204 affixOverlapPairs: suffix-prefix continuation pairs; hot " +
      "grams capped; self-overlap excluded") {
    import graft.ops.Dedup
    def toks(s: String) = s.split(" ").toSeq
    val docs = (Seq(
      (1L, toks("x y z a1 a2 a3 a4 a5 a6 a7 a8")),       // suffix a1..a8
      (2L, toks("a1 a2 a3 a4 a5 a6 a7 a8 tail words")),  // prefix a1..a8
      (3L, toks("s1 s2 s3 s4 s5 s6 s7 s8 s1 s2 s3 s4 s5 s6 s7 s8")) // self
    ) ++ (100L until 160L).map(i =>                       // 60 hot-gram docs
      (i, toks("h1 h2 h3 h4 h5 h6 h7 h8 filler")))
    ).toDF("doc_id", "toks")
    val got = Dedup.affixOverlapPairs(docs, "doc_id", "toks", k = 8,
        maxGramDf = 50L)
      .orderBy($"a", $"b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // only the planted (1, 2) pair: doc 3's self-match is filtered,
    // the 60-doc hot prefix gram is over the df cap
    assert(got == Seq((1L, 2L)), s"got $got")
    // with the cap lifted the hot block still yields no pairs (same
    // gram on the PREFIX side only — suffixes are h2..filler), but the
    // self-overlap doc stays excluded
    val loose = Dedup.affixOverlapPairs(docs, "doc_id", "toks", k = 8,
        maxGramDf = 1000L).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(loose == Seq((1L, 2L)), s"got $loose")
  }

  test("L197 scriptMix: range-table classification, dominance tie-break, " +
      "mixed + mojibake flags") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "hello world"),   // pure latin: 10 scripted of 11 chars
      (2L, "привет hello"),  // cyr 6 > latin 5 -> cyrillic dominant, mixed
      (3L, "ÃÂÃÂÃÂ"), // ÃÂ×3: mojibake leads
      (4L, "数据 데이터 ภาษา"), // cjk 2, hangul 3, thai 4 -> thai dominant
      (5L, "123 !!!"),       // nothing scripted -> none / share -1
      (6L, "שלום سلام"),     // hebrew 4 = arabic 4 -> alphabetical: arabic
      (7L, "×Ø")   // × excluded from latin, Ø included
    ).toDF("doc_id", "text")
    val got = TextOps.scriptMix(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_scripted"),
        r.getAs[String]("dominant_script"),
        r.getAs[Long]("dominant_share_e6"), r.getAs[Boolean]("mixed"),
        r.getAs[Boolean]("mojibake"))).toSeq
    assert(got == Seq(
      (1L, 10L, "latin", 1000000L, false, false),
      (2L, 11L, "cyrillic", 545454L, true, false),
      (3L, 6L, "latin", 1000000L, false, true),
      (4L, 9L, "thai", 444444L, true, false),
      (5L, 0L, "none", -1L, false, false),
      (6L, 8L, "arabic", 500000L, true, false),
      (7L, 1L, "latin", 1000000L, false, false)), s"got $got")
    // exact per-script columns on the three-script row
    val r4 = TextOps.scriptMix(docs, "doc_id", "text")
      .filter($"doc_id" === 4L).head
    assert(r4.getAs[Long]("n_cjk") == 2L && r4.getAs[Long]("n_hangul") == 3L
      && r4.getAs[Long]("n_thai") == 4L && r4.getAs[Long]("n_other") == 2L,
      s"got $r4")
  }

  test("L199 lshSCurve: exact endpoints, recall at the verify thresholds, " +
      "inflection bracket at J* = 1 - 2^(-1/8)") {
    import graft.ops.Dedup
    val t = Dedup.lshSCurve(spark, bands = 8, rows = 1)
      .orderBy($"j_e2").collect()
      .map(r => (r.getAs[Long]("j_e2"), r.getAs[Long]("p_e9"))).toMap
    assert(t(0L) == 0L && t(100L) == 1000000000L, s"endpoints $t")
    // divisions are exact at these grid points: p(0.5) = 1 - 0.5^8,
    // p(0.8) = 1 - 0.2^8 — the "why verify at 0.5 / 0.8" numbers
    assert(t(50L) == 996093750L, s"got ${t(50L)}")
    assert(t(80L) == 999997440L, s"got ${t(80L)}")
    // inflection (p = 1/2) sits between J=0.08 and J=0.09:
    // 0.92^8 = 0.513 > 1/2 >= 0.91^8 = 0.470
    assert(t(8L) < 500000000L && t(9L) >= 500000000L,
      s"bracket ${t(8L)} ${t(9L)}")
    // monotone nondecreasing across the whole grid
    val seq = (0L to 100L).map(t)
    assert(seq.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("L181 calibrationBins: out-of-domain score raises loudly") {
    import graft.ops.EvalOps
    val bad = Seq((1000001L, 1L)).toDF("s", "y")
    val ex = intercept[Exception] {
      EvalOps.calibrationBins(bad, $"s", $"y").collect()
    }
    assert(ex.getMessage.contains("calibrationBins") ||
      (ex.getCause != null
        && ex.getCause.getMessage.contains("calibrationBins")), s"got $ex")
    val neg = Seq((-1L, 0L)).toDF("s", "y")
    intercept[Exception] {
      EvalOps.calibrationBins(neg, $"s", $"y").collect()
    }
  }

  test("L191 spanDetection: IoU-threshold detection counts, label-blind, one-sided files flag") {
    import graft.ops.EvalOps
    val ref = Seq(
      (1L, 0L, 10L), (1L, 20L, 30L),  // second ref uncovered
      (3L, 0L, 10L)                    // ref-only file
    ).toDF("f", "s", "e")
    val hyp = Seq(
      (1L, 1L, 11L),   // IoU 9/11 >= 0.5: detects ref 1
      (1L, 40L, 50L),  // spurious
      (2L, 0L, 10L)    // hyp-only file
    ).toDF("f", "s", "e")
    val got = EvalOps.spanDetection(ref, hyp, "f", "s", "e", tauE6 = 500000L)
      .orderBy($"file").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 1L, 1L, 0.5, 0.5),
      (2L, 0L, 1L, 0L, 0L, 0.0, -1.0),
      (3L, 1L, 0L, 0L, 0L, -1.0, 0.0)), s"got $got")
    // a marginal overlap below the threshold is NOT a detection:
    // inter 4, union 16 -> IoU 0.25 < 0.5
    val m = EvalOps.spanDetection(
      Seq((1L, 0L, 10L)).toDF("f", "s", "e"),
      Seq((1L, 6L, 16L)).toDF("f", "s", "e"), "f", "s", "e", 500000L).head
    assert(m.getLong(3) == 0L && m.getLong(4) == 0L, s"got $m")
  }

  test("L189 hilbertKey: matches the canonical xy2d algorithm; consecutive cells always adjacent") {
    import graft.ops.Curation
    // direct port of the public-domain C reference (Wikipedia xy2d)
    def xy2d(n: Int, x0: Int, y0: Int): Long = {
      var x = x0; var y = y0; var d = 0L; var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1 else 0
        val ry = if ((y & s) > 0) 1 else 0
        d += s.toLong * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    val bits = 3; val n = 1 << bits
    val cells = (for { x <- 0 until n; y <- 0 until n }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val got = cells
      .select($"x", $"y", Curation.hilbertKey($"x", $"y", bits).as("d"))
      .collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getLong(2))).toMap
    for (x <- 0 until n; y <- 0 until n)
      assert(got((x, y)) == xy2d(n, x, y), s"cell ($x,$y)")
    // bijection onto 0..n^2-1 AND the Hilbert property: every step of
    // the curve moves to a Manhattan-adjacent cell (Z-order fails this
    // at every power-of-2 seam — the locality claim under test)
    assert(got.values.toSeq.sorted == (0L until n.toLong * n).toSeq)
    val byD = got.toSeq.sortBy(_._2).map(_._1)
    for (i <- 1 until byD.length) {
      val (ax, ay) = byD(i - 1); val (bx, by) = byD(i)
      assert(math.abs(ax - bx) + math.abs(ay - by) == 1,
        s"curve jumps between d=${i - 1} and d=$i")
    }
  }

  test("L179 tokenDrift: exact e6 shares, ties by token hash, absent snapshot sides price as zero share") {
    import graft.ops.Curation
    val snapA = Seq(
      ("s", Seq("a", "a", "b", "c")), // shares: a 500000, b 250000, c 250000
      ("t", Seq("x"))                 // source absent from snapshot B
    ).toDF("source", "toks")
    val snapB = Seq(
      ("s", Seq("a", "b", "b", "b"))  // shares: a 250000, b 750000, c 0
    ).toDF("source", "toks")
    val got = Curation.tokenDrift(snapA, snapB, "source", "toks", 3)
      .orderBy($"source", $"rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // drift = (Δshare)^2 div (sa+sb+1):
    //   c: 250000^2 div 250001 = 249999; b: 250000^2 div 1000001 = 249999
    //   (tie -> md5('c') = 4a8a.. < md5('b') = 92eb.. -> c first)
    //   a: 250000^2 div 750001 = 83333
    //   t/x: 1000000^2 div 1000001 = 999999 (snapshot B missing entirely)
    assert(got == Seq(
      ("s", 1L, "c", 250000L, 0L, 249999L),
      ("s", 2L, "b", 250000L, 750000L, 249999L),
      ("s", 3L, "a", 500000L, 250000L, 83333L),
      ("t", 1L, "x", 1000000L, 0L, 999999L)), s"got $got")
  }

  test("L176 sourceVocabOverlap: top-k Jaccard, zero-overlap pairs still emit rows") {
    import graft.ops.Curation
    val df = Seq(
      ("A", "a a b c"), ("B", "a d d"), ("C", "z z")
    ).toDF("source", "text")
    val got = Curation.sourceVocabOverlap(df, "source", "text", 2)
      .orderBy($"src_a", $"src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    // A top2 {a,b}; B top2 {d,a}; C top {z} (under k)
    assert(got == Seq(
      ("A", "B", 2L, 2L, 1L, 1d / 3d),
      ("A", "C", 2L, 1L, 0L, 0.0),
      ("B", "C", 2L, 1L, 0L, 0.0)), s"got $got")
  }

  test("L159 rougeN: clipped multiset bigram overlap, loud -1 on empty gram sets") {
    import graft.ops.EvalOps
    val pairs = Seq(
      (1L, Seq("a", "b", "c", "d"), Seq("a", "b", "c", "d")),  // identical
      (2L, Seq("a", "b", "c", "d"), Seq("a", "b", "x", "d")),  // 1 of 3 bigrams
      (3L, Seq("a", "b", "a", "b", "a"), Seq("a", "b")),       // clipping: min(2,1)
      (4L, Seq("a"), Seq("a", "b"))                            // ref too short
    ).toDF("id", "ref", "hyp")
    val got = EvalOps.rougeN(pairs, "id", "ref", "hyp", 2)
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == Seq(
      (1L, 3L, 3L, 3L, 1.0),
      (2L, 3L, 3L, 1L, 1d / 3d),
      (3L, 4L, 1L, 1L, 0.25),
      (4L, 0L, 1L, 0L, -1.0)), s"got $got")
  }

  test("L160 bleuComponents: clipped per-order precisions, zero 4-gram zeroes the product") {
    import graft.ops.EvalOps
    val pairs = Seq(
      (1L, Seq("a", "b", "c", "d", "e"), Seq("a", "b", "c", "d", "e")),
      (2L, Seq("a", "b", "c", "d", "e"), Seq("a", "b", "c", "x", "e")),
      (3L, Seq("a", "a", "b"), Seq("a", "a", "a")), // clipping: m1 = min(3,2)
      (4L, Seq("a", "b", "c", "d"), Seq("a"))       // no hyp 2-grams -> -1
    ).toDF("id", "ref", "hyp")
    val got = EvalOps.bleuComponents(pairs, "id", "ref", "hyp")
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(9),
        r.getLong(10), r.getDouble(11))).toSeq
    // columns: id, ref_len, hyp_len, m1,t1,m2,t2,m3,t3,m4,t4, prec_prod
    assert(got == Seq(
      (1L, 5L, 5L, 2L, 2L, 1.0),
      (2L, 4L, 5L, 0L, 2L, 0.0),  // m1=4,t1=5 ... m4=0 -> product 0
      (3L, 2L, 3L, 0L, 0L, -1.0), // t4=0 -> flagged
      (4L, 1L, 1L, 0L, 0L, -1.0)), s"got $got")
    val r1 = EvalOps.bleuComponents(pairs, "id", "ref", "hyp")
      .filter($"id" === 2L).head
    assert(r1.getLong(3) == 4L && r1.getLong(4) == 5L) // m1/t1 of the sub case
  }

  test("L161 cpWer: the minimum-permutation mapping absorbs label rotations, not word edits") {
    import graft.ops.EvalOps
    val ref = Seq(
      (1L, 0, Seq("x", "y")), (1L, 1, Seq("p", "q")), (1L, 2, Seq("m", "n")),
      (2L, 0, Seq("x", "y")), (2L, 1, Seq("p", "q")), (2L, 2, Seq("m", "n"))
    ).toDF("f", "spk", "words")
    val hyp = Seq(
      // file 1: labels rotated by one, words intact -> cpwer 0
      (1L, 0, Seq("p", "q")), (1L, 1, Seq("m", "n")), (1L, 2, Seq("x", "y")),
      // file 2: labels intact, one substitution -> cpwer 1/6
      (2L, 0, Seq("x", "z")), (2L, 1, Seq("p", "q")), (2L, 2, Seq("m", "n"))
    ).toDF("f", "spk", "words")
    val got = EvalOps.cpWer(ref, hyp, "f", "spk", "words", maxSpeakers = 3)
      .orderBy($"file").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq((1L, 6L, 0L, 0.0), (2L, 6L, 1L, 1d / 6d)), s"got $got")
  }

  test("L161 cpWer: unpaired transcripts are PRICED — lost speakers cost deletions, invented ones insertions") {
    import graft.ops.EvalOps
    val ref = Seq(
      // file 1: 3 ref speakers, hyp lost speaker 2 entirely (the
      // diarizer merged a voice away — the failure cpWER exists to
      // grade). Its 2 words must cost 2 deletions under EVERY mapping,
      // never vanish and improve the score.
      (1L, 0, Seq("x", "y")), (1L, 1, Seq("p", "q")), (1L, 2, Seq("m", "n")),
      // file 2: hyp INVENTED a speaker the ref never had
      (2L, 0, Seq("x", "y")),
      // file 3: ref speaker id 5 breaks the 0..2 contract
      (3L, 5, Seq("x", "y"))
    ).toDF("f", "spk", "words")
    val hyp = Seq(
      (1L, 0, Seq("x", "y")), (1L, 1, Seq("p", "q")),
      (2L, 0, Seq("x", "y")), (2L, 1, Seq("w", "v", "u")),
      (3L, 0, Seq("x", "y"))
    ).toDF("f", "spk", "words")
    val got = EvalOps.cpWer(ref, hyp, "f", "spk", "words", maxSpeakers = 3)
      .orderBy($"file").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      (1L, 6L, 2L, 2d / 6d),  // lost speaker = its 2 words as deletions
      (2L, 2L, 3L, 3d / 2d),  // invented speaker = its 3 words as insertions
      (3L, 0L, -1L, -1.0)),   // contract violation flags loudly
      s"got $got")
  }

  test("L181 calibrationBins: exact bin edges, gap numerator, last bin closed at 1e6") {
    import graft.ops.EvalOps
    val rows = Seq(
      (50000L, 0L), (950000L, 1L), (1000000L, 1L), // 1e6 lands IN bin 9
      (150000L, 1L), (199999L, 0L)
    ).toDF("s", "y")
    val got = EvalOps.calibrationBins(rows, $"s", $"y", nBins = 10)
      .orderBy($"bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      (0L, 1L, 50000L, 0L, 50000L),
      (1L, 2L, 349999L, 1L, 650001L), // |349999 - 1e6| exact
      (9L, 2L, 1950000L, 2L, 50000L)), s"got $got")
    intercept[IllegalArgumentException] {
      EvalOps.calibrationBins(rows, $"s", $"y", nBins = 7) // 7 doesn't divide 1e6
    }
  }

  test("L182 eerBracket: step-function crossing bracket is exact; sentinel guarantees a crossing") {
    import graft.ops.EvalOps
    // targets at 40, 60, 80; non-targets at 30, 50, 70 (accept >= t):
    //   t=30: FA=3 FR=0 | t=40: FA=2 FR=0 | t=50: FA=2 FR=1
    //   t=60: FA=1 FR=1 <- first FA<=FR: hi=60, lo=50
    val trials = Seq(
      (40L, 1L), (60L, 1L), (80L, 1L),
      (30L, 0L), (50L, 0L), (70L, 0L)
    ).toDF("s", "y")
    val r = EvalOps.eerBracket(trials, $"s", $"y").head
    assert((r.getLong(0), r.getLong(1)) == ((3L, 3L)), s"totals: $r")
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((50L, 2L, 1L)), s"lo: $r")
    assert((r.getLong(5), r.getLong(6), r.getLong(7)) == ((60L, 1L, 1L)), s"hi: $r")
    // perfectly separated scores: crossing at the lowest target score,
    // FA=0 — and the bracket's lo row is the top non-target threshold
    val sep = Seq((10L, 0L), (20L, 0L), (90L, 1L), (95L, 1L)).toDF("s", "y")
    val r2 = EvalOps.eerBracket(sep, $"s", $"y").head
    assert((r2.getLong(5), r2.getLong(6), r2.getLong(7)) == ((90L, 0L, 0L)), s"got $r2")
    // all-nontarget input: only the sentinel crosses (FA=0, FR=0)
    val non = Seq((10L, 0L), (20L, 0L)).toDF("s", "y")
    val r3 = EvalOps.eerBracket(non, $"s", $"y").head
    assert((r3.getLong(5), r3.getLong(6), r3.getLong(7)) == ((21L, 0L, 0L)), s"got $r3")
  }

  test("L195 silenceTrimOffsets: exact first/last loud sample, all-silent flags -1") {
    import graft.ops.Multimodal
    import graft.model.AudioFile
    // q = |round(x*32768)|: [0, 0, 2500, 0, 3000, 0] with threshold 2000
    val w = Array(0f, 0f, 2500f, 0f, 3000f, 0f).map(_ / 32768f)
    val ds = spark.createDataset(Seq(
      AudioFile("1", 8000, w),
      AudioFile("2", 8000, Array(0f, 0f, 0f)) // all silent
    ))(org.apache.spark.sql.Encoders.product[AudioFile])
    val got = Multimodal.silenceTrimOffsets(ds, 2000)
      .orderBy($"file").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == Seq(
      (1L, 6L, 2L, 4L, 2L, 1L, 3L),
      (2L, 3L, -1L, -1L, 3L, 3L, 0L)), s"got $got")
  }

  test("L194 charsetMix: exact per-class counts on a hand-checked string") {
    import graft.ops.TextOps
    val docs = Seq((1L, "Ab 12, x\né!"), (2L, "")).toDF("doc_id", "text")
    // chars: A b space 1 2 , space x \n é ! = 11
    // alpha A,b,x = 3; digit 1,2 = 2; space: 2 spaces + \n = 3;
    // punct , ! = 2; nonascii é = 1
    val got = TextOps.charsetMix(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == Seq(
      (1L, 11L, 3L, 2L, 3L, 2L, 1L, 90909L),
      (2L, 0L, 0L, 0L, 0L, 0L, 0L, -1L)), s"got $got")
  }

  test("L188 zeroCrossingStats: strict sign flips, zeros break runs, frame gate exact") {
    import graft.ops.Multimodal
    import graft.model.AudioFile
    // quantized values: +1 -1 +1 0 -1 -1 +1 +1 (x = q/32768f)
    //   strict flips: (1,-1) (−1,1) (−1,1) = 3 of 7 pairs
    //   (0 breaks the (1,0,-1) run: neither pair counts)
    val w = Array(1f, -1f, 1f, 0f, -1f, -1f, 1f, 1f).map(_ / 32768f)
    val ds = spark.createDataset(Seq(AudioFile("7", 8000, w)))(
      org.apache.spark.sql.Encoders.product[AudioFile])
    val r = Multimodal.zeroCrossingStats(ds, frame = 4, maxZcLow = 1).head
    // frames of 4: [1,-1,1,0] has 2 internal flips (> 1), [-1,-1,1,1]
    // has 1 (<= 1) -> n_low_frames = 1
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((7L, 8L, 3L, 428571L, 2L, 1L)), s"got $r")
  }

  test("L184 rocAuc: Mann-Whitney with half-weight ties, exact numerator") {
    import graft.ops.EvalOps
    // targets {3, 5}, non-targets {1, 3}: pairs (3>1)=1, (3=3)=0.5,
    // (5>1)=1, (5>3)=1 -> AUC 3.5/4 = 0.875, num2 = 7
    val trials = Seq((3L, 1L), (5L, 1L), (1L, 0L), (3L, 0L)).toDF("s", "y")
    val r = EvalOps.rocAuc(trials, $"s", $"y").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      == ((2L, 2L, 7L, 0.875)), s"got $r")
    // single-class input is undefined -> loud -1
    val one = Seq((3L, 1L), (5L, 1L)).toDF("s", "y")
    assert(EvalOps.rocAuc(one, $"s", $"y").head.getDouble(3) == -1d)
    // perfect separation -> 1.0
    val sep = Seq((9L, 1L), (1L, 0L)).toDF("s", "y")
    assert(EvalOps.rocAuc(sep, $"s", $"y").head.getDouble(3) == 1d)
  }

  test("L193 rakeKeywords: degree/freq scoring on a hand-checked example") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "deep learning of the deep model and learning rate and model")
    ).toDF("doc_id", "text")
    // phrases: [deep learning] [deep model] [learning rate] [model]
    // freq: deep 2, learning 2, model 2, rate 1
    // deg:  deep 4, learning 4, model 3 (2+1), rate 2
    // wscore_e3: 2000, 2000, 1500, 2000
    // phrase scores: deep learning 4000, learning rate 4000 (tie ->
    // text order), deep model 3500, model 1500 (cut at k=3)
    val got = TextOps.rakeKeywords(docs, "doc_id", "text", k = 3)
      .orderBy($"rank").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, "deep learning", 2L, 4000L),
      (2L, "learning rate", 2L, 4000L),
      (3L, "deep model", 2L, 3500L)), s"got $got")
    // duplicate phrase occurrences collapse to one candidate
    val dup = Seq((2L, "big data and big data")).toDF("doc_id", "text")
    val got2 = TextOps.rakeKeywords(dup, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(4))).toSeq
    // freq big 2, data 2; deg big 4, data 4 -> phrase 4000, ONE row
    assert(got2 == Seq((1L, "big data", 4000L)), s"got $got2")
  }

  test("L193 rakeKeywords: Rose et al. 2010 worked example (canonical " +
      "stoplist + punctuation boundaries)") {
    import graft.ops.TextOps
    // The RAKE paper's own abstract fixture (Rose, Engel, Cramer, Cowley
    // 2010, Fig. 1): published word scores deg/freq give the phrase
    // ranking  minimal generating sets 8.67 > linear diophantine
    // equations 8.5 > minimal supporting set 7.67 > minimal set 4.67 >
    // linear constraints 4.5 — e3-floored here (8000 div 3 = 2666).
    // Reproducing it REQUIRES both canonical pieces: the comma after
    // "equations" must delimit (else a 5-word pseudo-phrase appears)
    // and the stoplist must keep considered/numbers/corresponding/types
    // as CONTENT words while stopping of/over/a/are/can/be/used/in/
    // these/given.
    val abstractTxt =
      "Compatibility of systems of linear constraints over the set of " +
      "natural numbers. Criteria of compatibility of a system of linear " +
      "Diophantine equations, strict inequations, and nonstrict " +
      "inequations are considered. Upper bounds for components of a " +
      "minimal set of solutions and algorithms of construction of " +
      "minimal generating sets of solutions for all types of systems " +
      "are given. These criteria and the corresponding algorithms for " +
      "constructing a minimal supporting set of solutions can be used " +
      "in solving all the considered types of systems and systems of " +
      "mixed types."
    val got = TextOps.rakeKeywords(
        Seq((1L, abstractTxt)).toDF("doc_id", "text"), "doc_id", "text",
        k = 5)
      .orderBy($"rank").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == Seq(
      (1L, "minimal generating sets", 3L, 8666L),
      (2L, "linear diophantine equations", 3L, 8500L),
      (3L, "minimal supporting set", 3L, 7666L),
      (4L, "minimal set", 2L, 4666L),
      (5L, "linear constraints", 2L, 4500L)), s"got $got")
    // the published 3.5-scored pair survives the stoplist ("corresponding"
    // is SMART-stopped but RAKE-content — the Fox-family membership this
    // fixture guards)
    val all = TextOps.rakeKeywords(
        Seq((1L, abstractTxt)).toDF("doc_id", "text"), "doc_id", "text",
        k = 30)
      .collect().map(r => (r.getString(2), r.getLong(4))).toMap
    assert(all("corresponding algorithms") == 3500L, s"got $all")
    assert(all("considered types") == 3166L, s"got $all")
    assert(all("natural numbers") == 4000L, s"got $all")
    assert(all("mixed types") == 3666L, s"got $all")
  }

  test("L185 tokenGini: textbook (1,3) split = 0.25, uniform = 0") {
    import graft.ops.Curation
    val df = Seq(
      ("s", Seq("a", "a", "a", "b")), // counts (1,3): gini 2/8 = 0.25
      ("u", Seq("x", "y"))            // uniform: 0
    ).toDF("source", "toks")
    val got = Curation.tokenGini(df, "source", "toks")
      .orderBy($"group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == Seq(
      ("s", 4L, 2L, 2L, 0.25),
      ("u", 2L, 2L, 0L, 0.0)), s"got $got")
  }

  test("L183 readability: exact counts and e3 rates on hand-checked prose") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "the cat sat. the dog ran!"),   // 6 words, 2 sents, 6 syll (e,a,a,e,o,a)
      (2L, "no punctuation here"),          // degenerate: 0 sentences
      (3L, "")                              // empty: 0 words
    ).toDF("doc_id", "text")
    val got = TextOps.readability(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    // doc 1: w/s = 3000, syl/w = 1000; fk = (390*3000 + 11800*1000)/1000 - 15590
    //      = (1170000 + 11800000)/1000 - 15590 = 12970 - 15590 = -2620
    assert(got == Seq(
      (1L, 6L, 2L, 6L, 3000L, 1000L, -2620L),
      (2L, 3L, 0L, 6L, -1L, 2000L, -999999L),
      (3L, 0L, 0L, 0L, -1L, -1L, -999999L)), s"got $got")
  }

  test("L163 cohensKappa: textbook 0.6 case, degenerate single-class flags -1") {
    import graft.ops.EvalOps
    val labels = Seq(
      ("x", "x"), ("x", "x"), ("x", "x"), ("x", "x"), ("x", "y"),
      ("y", "y"), ("y", "y"), ("y", "y"), ("y", "y"), ("y", "x")
    ).toDF("a", "b")
    val r = EvalOps.cohensKappa(labels, "a", "b").head
    // n=10, agree=8, marginals 5/5 each -> pe_num=50, kappa=30/50
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      == ((10L, 8L, 50L, 0.6)), s"got $r")
    val degenerate = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(EvalOps.cohensKappa(degenerate, "a", "b").head.getDouble(3) == -1d)
  }

  test("L164 confusionMetrics: per-class tp/fp/fn with -1 on empty prediction classes") {
    import graft.ops.EvalOps
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "b"), ("c", "b")
    ).toDF("actual", "pred")
    val got = EvalOps.confusionMetrics(df, "actual", "pred")
      .orderBy($"class").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == Seq(
      ("a", 3L, 0L, 1L, 1.0, 0.75, 6d / 7d),
      ("b", 2L, 2L, 0L, 0.5, 1.0, 4d / 6d),
      ("c", 0L, 0L, 1L, -1.0, 0.0, 0.0)), s"got $got")
  }

  test("L165 chrF: per-order char-gram counts over stripped strings, reduced F2 division") {
    import graft.ops.EvalOps
    val pairs = Seq((1L, Seq("abc"), Seq("abd"))).toDF("id", "ref", "hyp")
    val got = EvalOps.chrF(pairs, "id", "ref", "hyp", maxN = 4)
      .orderBy($"n").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))).toSeq
    // n=1: {a,b,c} vs {a,b,d} -> m=2; n=2: {ab,bc} vs {ab,bd} -> 1;
    // n=3: abc vs abd -> 0; n=4: both empty -> -1
    assert(got == Seq(
      (1, 2L, 3L, 3L, 10d / 15d),
      (2, 1L, 2L, 2L, 0.5),
      (3, 0L, 1L, 1L, 0.0),
      (4, 0L, 0L, 0L, -1.0)), s"got $got")
    // whitespace-stripping: multi-word refs concatenate before gramming
    val two = Seq((2L, Seq("ab", "cd"), Seq("ab", "cd"))).toDF("id", "ref", "hyp")
    val all1 = EvalOps.chrF(two, "id", "ref", "hyp", maxN = 4)
      .select($"chrf2").collect().map(_.getDouble(0)).toSeq
    assert(all1 == Seq(1.0, 1.0, 1.0, 1.0), s"got $all1")
  }

  test("L166 herfindahl: 1 for single-source, sum-sq/N^2 otherwise") {
    import graft.ops.Curation
    val df = Seq(
      ("x", "a"), ("x", "a"), ("x", "a"), ("x", "b"),
      ("y", "a"), ("y", "a")
    ).toDF("lang", "source")
    val got = Curation.herfindahl(df, "lang", "source")
      .orderBy($"lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == Seq(("x", 4L, 2L, 10L, 0.625), ("y", 2L, 1L, 4L, 1.0)),
      s"got $got")
  }

  test("L167 speakerTurnStats: turns are same-speaker runs, interruptions need overlap + change") {
    import graft.ops.EvalOps
    val seg = Seq(
      (1L, 0L, 10L, 0), (1L, 8L, 20L, 0),   // overlap, same spk: no interrupt
      (1L, 18L, 30L, 1), (1L, 28L, 40L, 1), // turn 2; 20>18 change: interrupt
      (1L, 38L, 50L, 0),                    // turn 3; 40>38 change: interrupt
      (2L, 0L, 5L, 0), (2L, 5L, 9L, 1)      // touching, not overlapping
    ).toDF("f", "s", "e", "spk")
    val got = EvalOps.speakerTurnStats(seg, "f", "s", "e", "spk")
      .orderBy($"file").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got == Seq(
      (1L, 5L, 3L, 2L, 58L, 2L, 58d / 3d),
      (2L, 2L, 2L, 2L, 9L, 0L, 4.5)), s"got $got")
  }

  test("L168 largestRemainderQuotas: quotas sum exactly to the target, ties break by key") {
    import graft.ops.Curation
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")).toDF("src")
    val got = Curation.largestRemainderQuotas(df, "src", 7L)
      .orderBy($"key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // tn = 35/21/14, base 3/2/1 (sum 6), rem 5/1/4 -> one extra to 'a'
    assert(got == Seq(("a", 5L, 3L, 1L, 4L), ("b", 3L, 2L, 0L, 2L),
      ("c", 2L, 1L, 0L, 1L)), s"got $got")
    assert(got.map(_._5).sum == 7L)
    // remainder tie: key order decides
    val tie = Seq("a", "b").toDF("src")
    val t = Curation.largestRemainderQuotas(tie, "src", 3L)
      .orderBy($"key").collect().map(r => (r.getString(0), r.getLong(4))).toSeq
    assert(t == Seq(("a", 2L), ("b", 1L)), s"got $t")
  }

  test("L170 lengthMoments: exact integer variance numerator") {
    import graft.ops.Curation
    val df = Seq(("x", 2L), ("x", 4L), ("x", 6L), ("y", 5L)).toDF("g", "len")
    val got = Curation.lengthMoments(df, "g", $"len")
      .orderBy($"group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    // x: n*sumsq - sum^2 = 3*56 - 144 = 24 -> var 24/9
    assert(got == Seq(("x", 3L, 12L, 56L, 4.0, 24d / 9d),
      ("y", 1L, 5L, 25L, 5.0, 0.0)), s"got $got")
  }

  test("L171 seqlenHistogram: bit-length buckets with exact edges") {
    import graft.ops.Curation
    val df = Seq(0L, 1L, 1L, 3L, 8L).toDF("n")
    val got = Curation.seqlenHistogram(df, $"n")
      .orderBy($"bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      (0L, 0L, 0L, 1L, 0L),
      (1L, 1L, 1L, 2L, 2L),
      (2L, 2L, 3L, 1L, 3L),
      (4L, 8L, 15L, 1L, 8L)), s"got $got")
    // the buckets cover the FULL long domain: an oversized length is
    // never absorbed under a mislabeled 2^21-1 range — bucket 63's hi
    // is Long.MaxValue = 2^63-1 itself (the shift would overflow)
    val big = Seq(1L << 21, (1L << 21) + 5L, Long.MaxValue).toDF("n")
    val gotBig = Curation.seqlenHistogram(big, $"n")
      .orderBy($"bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gotBig == Seq(
      (22L, 1L << 21, (1L << 22) - 1, 2L),
      (63L, 1L << 62, Long.MaxValue, 1L)), s"got $gotBig")
  }

  test("L173 skyline2d: dominated points drop, duplicate front points all survive") {
    import graft.ops.Curation
    val pts = Seq(
      (1L, 3L, 1L), (2L, 2L, 2L), (3L, 1L, 3L),
      (4L, 2L, 1L),              // dominated by (3,1) and (2,2)
      (5L, 1L, 3L)               // exact duplicate of id 3: both stay
    ).toDF("id", "x", "y")
    val got = Curation.skyline2d(pts, "id", $"x", $"y")
      .orderBy($"id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 3L, 5L), s"got $got")
    // a strictly dominating point empties everything below it
    val one = Seq((1L, 5L, 5L), (2L, 4L, 4L), (3L, 5L, 4L)).toDF("id", "x", "y")
    val g2 = Curation.skyline2d(one, "id", $"x", $"y")
      .collect().map(_.getLong(0)).toSeq
    assert(g2 == Seq(1L), s"got $g2")
  }

  test("L155 wordErrorRate equals the classic word-level DP on 40 seeded random pairs") {
    import graft.ops.TextOps
    // reference implementation: the textbook Wagner-Fischer DP
    def dp(a: Seq[String], b: Seq[String]): Long = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j.toLong else if (j == 0) i.toLong else 0L
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 12).map(i => s"w$i")
    val cases = (1L to 40L).map { id =>
      val ref = Seq.fill(1 + rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size)))
      val hyp = Seq.fill(1 + rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size)))
      (id, ref, hyp)
    }
    val got = TextOps.wordErrorRate(cases.toDF("id", "ref", "hyp"), "id", "ref", "hyp")
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    for ((id, ref, hyp) <- cases)
      assert(got(id) == dp(ref, hyp),
        s"pair $id: op ${got(id)} != dp ${dp(ref, hyp)} for $ref vs $hyp")
  }

  test("L215 krippendorffAlpha: the classic 4-coder/12-unit nominal " +
      "matrix with missing ratings; brute-force pair enumeration agrees") {
    import graft.ops.EvalOps
    // Krippendorff's canonical missing-data shape: 4 coders, 12 units,
    // '.' = missing; unit 11 has only two ratings, none are dropped
    // here (every unit has >= 2) — the dropped path is exercised below.
    val matrix: Seq[(String, Seq[Int])] = Seq(
      ("A", Seq(1, 2, 3, 3, 2, 1, 4, 1, 2, 0, 0, 0)),
      ("B", Seq(1, 2, 3, 3, 2, 2, 4, 1, 2, 5, 0, 3)),
      ("C", Seq(0, 3, 3, 3, 2, 3, 4, 2, 2, 5, 1, 3)),
      ("D", Seq(1, 2, 3, 3, 2, 4, 4, 1, 2, 5, 1, 0)))
    val rows = for {
      (_, vals) <- matrix
      (v, u) <- vals.zipWithIndex if v != 0
    } yield (u.toLong, s"v$v")
    val r = EvalOps.krippendorffAlpha(rows.toDF("item", "cat"),
      "item", "cat").head
    // hand-checked: P = 2e6 (u2) + 4e6 (u6) + 2e6 (u8) = 8e6 over
    // n = 42 pairable ratings; marginals 9/13/12/5/3 -> sc2 = 428
    assert(r.getAs[Long]("n_items") == 12L
      && r.getAs[Long]("n_dropped") == 0L
      && r.getAs[Long]("n_values") == 5L
      && r.getAs[Long]("do_e6") == 190476L
      && r.getAs[Long]("de_e6") == 775842L, s"got $r")
    assert(r.getAs[Double]("alpha") == (775842d - 190476d) / 775842d,
      s"got $r")
    // independent check: brute-force ordered-pair enumeration per unit
    // with the same e6 floor replays do_e6 exactly
    val byItem = rows.groupBy(_._1).filter(_._2.size >= 2)
    val pE6 = byItem.values.map { rs =>
      val vals = rs.map(_._2)
      val m = vals.size.toLong
      val disagree = (for (a <- vals; b <- vals) yield a != b)
        .count(identity).toLong
      disagree * 1000000L / (m - 1L)
    }.sum
    val n = byItem.values.map(_.size.toLong).sum
    assert(r.getAs[Long]("do_e6") == pE6 / n, "brute-force mismatch")
    // an unpairable unit is dropped and counted, never silently priced
    val r2 = EvalOps.krippendorffAlpha(
      (rows ++ Seq((99L, "v1"))).toDF("item", "cat"), "item", "cat").head
    assert(r2.getAs[Long]("n_dropped") == 1L
      && r2.getAs[Long]("do_e6") == r.getAs[Long]("do_e6"), s"got $r2")
  }

  test("L216 mcnemar: discordant cells only; concordant-only input " +
      "flags -1") {
    import graft.ops.EvalOps
    // b = 3 (only A), c = 1 (only B) -> chisq = (3-1)^2/(3+1) = 1.0
    val df = Seq((true, true), (true, true), (false, false),
      (true, false), (true, false), (true, false), (false, true))
      .toDF("a", "b")
    val r = EvalOps.mcnemar(df, "a", "b").head
    assert((r.getAs[Long]("n"), r.getAs[Long]("n_both"),
      r.getAs[Long]("n_only_a"), r.getAs[Long]("n_only_b"),
      r.getAs[Long]("n_neither"), r.getAs[Long]("chisq_num"))
      == ((7L, 2L, 3L, 1L, 1L, 4L)), s"got $r")
    assert(r.getAs[Double]("chisq") == 1.0, s"got $r")
    val r2 = EvalOps.mcnemar(Seq((true, true), (false, false))
      .toDF("a", "b"), "a", "b").head
    assert(r2.getAs[Double]("chisq") == -1.0, s"got $r2")
  }

  test("L217 spearmanRho: tie-respecting rho is exactly +-1 on monotone " +
      "data with matching tie structure; constant signal flags -2") {
    import graft.ops.EvalOps
    // the exact-integer identity num = dx = dy proves rho = +-1 up to
    // the sqrt(d)*sqrt(d) ulp (the double itself is deterministic —
    // both engines evaluate the identical expression — just not
    // exactly 1.0 when dx is not a perfect square)
    val up = Seq((1L, 10L), (2L, 20L), (2L, 20L), (3L, 40L)).toDF("x", "y")
    val comps = EvalOps.spearmanRho(up, "x", "y").head
    assert(comps.getAs[Long]("n") == 4L
      && comps.getAs[Long]("num") == comps.getAs[Long]("dx")
      && comps.getAs[Long]("dx") == comps.getAs[Long]("dy"), s"got $comps")
    assert(math.abs(comps.getAs[Double]("rho") - 1.0) < 1e-12, s"got $comps")
    val down = Seq((1L, 40L), (2L, 20L), (2L, 20L), (3L, 10L)).toDF("x", "y")
    assert(math.abs(EvalOps.spearmanRho(down, "x", "y").head
      .getAs[Double]("rho") + 1.0) < 1e-12)
    val const = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("x", "y")
    assert(EvalOps.spearmanRho(const, "x", "y").head
      .getAs[Double]("rho") == -2.0)
  }

  test("L218 adjustedRandIndex: hand-checked contingency example; " +
      "identical partitions score 1") {
    import graft.ops.EvalOps
    // A = [1,1,1,2,2,2], B = [1,1,2,2,2,2]: idx = 4, a = 6, b = 7,
    // T = 15 -> ARI = 2(60-42)/(13*15-84) = 36/111; purity = 5/6
    val df = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 2L), (2L, 2L),
      (2L, 2L)).toDF("la", "lb")
    val r = EvalOps.adjustedRandIndex(df, "la", "lb").head
    assert((r.getAs[Long]("n"), r.getAs[Long]("n_clusters"),
      r.getAs[Long]("n_classes"), r.getAs[Long]("idx_pairs"),
      r.getAs[Long]("a_pairs"), r.getAs[Long]("b_pairs"),
      r.getAs[Long]("purity_e6"))
      == ((6L, 2L, 2L, 4L, 6L, 7L, 833333L)), s"got $r")
    assert(r.getAs[Double]("ari") == 36d / 111d, s"got $r")
    val same = Seq((1L, 9L), (1L, 9L), (2L, 7L), (2L, 7L)).toDF("la", "lb")
    assert(EvalOps.adjustedRandIndex(same, "la", "lb").head
      .getAs[Double]("ari") == 1.0)
  }

  test("L219 averagePrecisionAtK: hand-checked floor-fold; no relevant " +
      "docs flags -1") {
    import graft.ops.Retrieval
    // rel at ranks 1, 3, 5 -> floors 1e6, 666666, 600000; / 3 = 755555
    val ranked = Seq(("q", 1L, 1L), ("q", 2L, 0L), ("q", 3L, 2L),
      ("q", 4L, 0L), ("q", 5L, 1L), ("z", 1L, 0L), ("z", 2L, 0L))
      .toDF("query", "rank", "rel")
    val r = Retrieval.averagePrecisionAtK(ranked, "query", "rank", "rel",
        k = 10)
      .orderBy($"query").collect()
    assert(r(0).getAs[Long]("n_rel") == 3L
      && r(0).getAs[Long]("ap_e6") == 755555L, s"got ${r(0)}")
    assert(r(1).getAs[Long]("ap_e6") == -1L, s"got ${r(1)}")
  }

  test("L220 modularity: two triangles + bridge score the textbook " +
      "Q = 5/14; unlabeled endpoints fail loudly") {
    import graft.ops.GraphOps
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"),
      (5L, "y"), (6L, "y")).toDF("node", "comm")
    val rows = GraphOps.modularity(edges, "src", "dst", labels, "node",
        "comm")
      .orderBy($"community").collect()
    // m = 7; per community: in = 3, degree mass = 7 ->
    // q_num = 4*7*3 - 49 = 35 each, q_den = 196, Q = 70/196 = 5/14
    assert(rows.length == 2)
    for (r <- rows)
      assert((r.getAs[Long]("n_nodes"), r.getAs[Long]("in_edges"),
        r.getAs[Long]("degree_sum"), r.getAs[Long]("m"),
        r.getAs[Long]("q_num"), r.getAs[Long]("q_den"))
        == ((3L, 3L, 7L, 7L, 35L, 196L)), s"got $r")
    // an edge endpoint missing from the labels is loud, never dropped
    val bad = GraphOps.modularity(
      Seq((1L, 2L), (2L, 9L)).toDF("src", "dst"),
      "src", "dst", labels, "node", "comm")
    intercept[Exception] { bad.collect() }
  }

  test("L222 assortativity: a path is perfectly disassortative (r = -1); " +
      "a regular cycle flags -2") {
    import graft.ops.GraphOps
    // path 1-2-3: degrees 1,2,1; edge degree pairs (1,2),(2,1) ->
    // Sjk=4, Sjpk=6, Sj2k2=10; num = 32-36 = -4, den = 40-36 = 4
    val r = GraphOps.assortativity(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), "src", "dst").head
    assert((r.getAs[Long]("m"), r.getAs[Long]("s_jk"),
      r.getAs[Long]("s_jpk"), r.getAs[Long]("s_j2k2"))
      == ((2L, 4L, 6L, 10L)), s"got $r")
    assert(r.getAs[Double]("r") == -1.0, s"got $r")
    // 3-cycle: all degrees 2 -> zero variance -> -2 flag
    val c = GraphOps.assortativity(
      Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"),
      "src", "dst").head
    assert(c.getAs[Double]("r") == -2.0, s"got $c")
  }

  test("L223 reciprocity: mutual pairs over the distinct edge set") {
    import graft.ops.GraphOps
    // (1,2) and (2,1) are mutual, (2,3) is not; the duplicate (1,2)
    // collapses
    val r = GraphOps.reciprocity(
      Seq((1L, 2L), (1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst"),
      "src", "dst").head
    assert((r.getAs[Long]("m"), r.getAs[Long]("n_recip"),
      r.getAs[Long]("recip_e6")) == ((3L, 2L, 666666L)), s"got $r")
  }

  test("L224 mattr: hand-checked windows; sub-window docs flag -1") {
    import graft.ops.TextOps
    val df = Seq(
      (1L, Seq("a", "b", "a", "b")),      // windows {a,b,a},{b,a,b} -> 2+2
      (2L, Seq("a", "b", "c", "d")),      // 3+3 -> exactly 1.0
      (3L, Seq("a", "a", "a")),           // one window, 1 type
      (4L, Seq("a", "b"))                 // shorter than w
    ).toDF("id", "toks")
    val got = TextOps.mattr(df, "id", "toks", w = 3)
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_windows"),
        r.getAs[Long]("mattr_e6")))
    assert(got.toSeq == Seq((1L, 2L, 666666L), (2L, 2L, 1000000L),
      (3L, 1L, 333333L), (4L, 0L, -1L)), s"got ${got.toSeq}")
  }

  test("L225 burstiness: clumped terms score VMR > 1e6, uniform terms 0") {
    import graft.ops.TextOps
    val df = Seq(
      (1L, Seq("zzzzz", "zzzzz", "zzzzz", "yyyyy")),
      (2L, Seq("zzzzz", "yyyyy"))).toDF("id", "toks")
    val got = TextOps.burstiness(df, "id", "toks", minLen = 5, topK = 10)
      .orderBy($"term").collect()
      .map(r => (r.getString(0), r.getAs[Long]("df"),
        r.getAs[Long]("total"), r.getAs[Long]("vmr_e6"))).toSeq
    // zzzzz: counts (3,1) -> (2*10-16)e6/(1*4) = 1e6 (burst);
    // yyyyy: counts (1,1) -> 0 (uniform)
    assert(got == Seq(("yyyyy", 2L, 2L, 0L), ("zzzzz", 2L, 4L, 1000000L)),
      s"got $got")
  }

  test("L228 gateAttrition: unique kills separate load-bearing gates " +
      "from redundant ones") {
    import graft.ops.Curation
    // d1 passes all; d2 fails A only; d3 fails B only; d4 fails A+B;
    // d5 fails all; d6 passes all
    val df = Seq(
      (1L, true, true, true), (2L, false, true, true),
      (3L, true, false, true), (4L, false, false, true),
      (5L, false, false, false), (6L, true, true, true))
      .toDF("id", "a", "b", "c")
    val got = Curation.gateAttrition(df,
        Seq("a" -> $"a", "b" -> $"b", "c" -> $"c"))
      .orderBy($"gate").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_fail"),
        r.getAs[Long]("n_unique_fail"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_killed"))).toSeq
    assert(got == Seq(("a", 3L, 1L, 6L, 4L), ("b", 3L, 1L, 6L, 4L),
      ("c", 1L, 0L, 6L, 4L)), s"got $got")
  }

  test("L229 ksTest: identical samples score 0, disjoint samples 1; " +
      "empty side flags -1") {
    import graft.ops.EvalOps
    val x = Seq(1L, 2L, 3L).toDF("v")
    assert(EvalOps.ksTest(x, x, "v").head.getAs[Long]("d_num") == 0L)
    val a = Seq(1L, 1L, 2L).toDF("v")
    val b = Seq(3L, 3L, 4L).toDF("v")
    val r = EvalOps.ksTest(a, b, "v").head
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("d_num")) == ((3L, 3L, 9L)), s"got $r")
    assert(r.getAs[Double]("ks") == 1.0, s"got $r")
    val e = EvalOps.ksTest(a.filter($"v" > 99L), b, "v").head
    assert(e.getAs[Double]("ks") == -1.0, s"got $e")
  }

  test("L230 neighborJaccard: hand-checked triangle + hub; the hub is " +
      "pruned from neighborhoods but still pairs as an owner") {
    import graft.ops.GraphOps
    // triangle 1-2-3 plus hub 9 -> {1..5}; degCap 3 prunes 9 (deg 5)
    // from every neighborhood; 9's own (pruned) neighborhood keeps
    // its low-degree members
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (9L, 1L), (9L, 2L),
      (9L, 3L), (9L, 4L), (9L, 5L)).toDF("src", "dst")
    val got = GraphOps.neighborJaccard(edges, "src", "dst", degCap = 3,
        topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("common"), r.getAs[Long]("jaccard_e6"))).toSeq
    assert(got.size == 6, s"got $got")
    // (x,9) pairs: common 2 of pruned degs 2 and 5 -> 2e6/5 = 400000;
    // triangle pairs: 1 of 2,2 -> 1e6/3 = 333333
    assert(got.take(3).toSet
      == Set((1L, 9L, 2L, 400000L), (2L, 9L, 2L, 400000L),
        (3L, 9L, 2L, 400000L)), s"got $got")
    assert(got.drop(3).map(_._4).forall(_ == 333333L), s"got $got")
  }

  test("L231 ocrArtifacts: each damage class counted exactly; clean " +
      "prose gates false") {
    import graft.ops.TextOps
    val df = Seq(
      (1L, Seq("normal", "words", "only", "here", "today", "and",
        "more", "filler", "tokens", "ten")),
      (2L, Seq("a", "b", "inter-", "l0ve", "ok", "x", "4chan",
        "word-", "A1a"))).toDF("id", "toks")
    val got = TextOps.ocrArtifacts(df, "id", "toks", thresholdE6 = 300000L)
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_single"),
        r.getAs[Long]("n_hyphen_break"), r.getAs[Long]("n_mixed"),
        r.getAs[Boolean]("ocr_suspect"))).toSeq
    // doc 2: singles {a,b,x}; hyphen stubs {inter-,word-}; mixed
    // {l0ve,A1a} — "4chan" starts with a digit, NOT letter-digit-letter
    assert(got == Seq((1L, 0L, 0L, 0L, false), (2L, 3L, 2L, 2L, true)),
      s"got $got")
  }

  test("L234 codeSignals: counts via length-difference strips; the " +
      "2-of-3 rule routes code") {
    import graft.ops.TextOps
    val df = Seq((1L, "plain english prose with no symbols at all"),
      (2L, "{x=1; y[2]=f(x);}")).toDF("id", "t")
    val got = TextOps.codeSignals(df, "id", "t").orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_semis"),
        r.getAs[Long]("n_braces"), r.getAs[Long]("n_eq"),
        r.getAs[Boolean]("is_code"))).toSeq
    // doc 2: 2 semicolons, 4 brace/bracket chars, 2 '='
    assert(got == Seq((1L, 0L, 0L, 0L, false), (2L, 2L, 4L, 2L, true)),
      s"got $got")
  }

  test("L238 dehyphenate: stub runs merge transitively; a trailing " +
      "unclosed run is emitted, never dropped; bare '-' is a token") {
    import graft.ops.TextOps
    val df = Seq(
      (1L, Seq("re-", "con-", "struction", "is", "a", "word")),
      (2L, Seq("plain", "text")),
      (3L, Seq("ends", "with", "stub-")),
      (4L, Seq("a", "-", "b"))).toDF("id", "toks")
    val got = TextOps.dehyphenate(df, "id", "toks").orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_before"),
        r.getAs[Long]("n_stubs"), r.getAs[Long]("n_after"),
        r.getAs[String]("text_joined"))).toSeq
    assert(got == Seq(
      (1L, 6L, 2L, 4L, "reconstruction is a word"),
      (2L, 2L, 0L, 2L, "plain text"),
      (3L, 3L, 1L, 3L, "ends with stub"),
      (4L, 3L, 0L, 3L, "a - b")), s"got $got")
  }

  test("L237 degreeProfile: exact log2 buckets from binary-string length") {
    import graft.ops.GraphOps
    // star 0->{1..8} plus edge 1->2: deg(0)=8 (bucket 3),
    // deg(1)=deg(2)=2 (bucket 1), deg(3..8)=1 (bucket 0)
    val edges = ((1L to 8L).map(i => (0L, i)) :+ ((1L, 2L))).toDF("src", "dst")
    val got = GraphOps.degreeProfile(edges, "src", "dst")
      .orderBy($"bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("lo_deg"),
        r.getAs[Long]("n_nodes"), r.getAs[Long]("sum_deg"))).toSeq
    assert(got == Seq((0L, 1L, 6L, 6L), (1L, 2L, 2L, 4L),
      (3L, 8L, 1L, 8L)), s"got $got")
  }

  test("L241 resamplePlan: gcd-derived L/M for the real rate ladder; " +
      "floor output length") {
    import graft.model.AudioFile
    import graft.ops.Multimodal
    val audio = Seq(
      AudioFile("1", 8000, new Array[Float](400)),   // L=2, M=1
      AudioFile("2", 22050, new Array[Float](441)),  // L=320, M=441
      AudioFile("3", 44100, new Array[Float](443))   // L=160, M=441
    ).toDS()
    val got = Multimodal.resamplePlan(audio, 16000).orderBy($"file")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("l_up"),
        r.getAs[Long]("m_down"), r.getAs[Long]("n_out"),
        r.getAs[Long]("n_taps"))).toSeq
    // 441·320/441 = 320 exactly; 443·160/441 = 70880/441 = 160 (floor)
    assert(got == Seq((1L, 2L, 1L, 800L, 48L),
      (2L, 320L, 441L, 320L, 7680L), (3L, 160L, 441L, 160L, 3840L)),
      s"got $got")
  }

  test("L242 pqDistortion: codeword vectors quantize to themselves " +
      "(zero error); a perturbed vector pays its exact squared delta") {
    import graft.ops.Similarity
    // 16 codewords (ids 0..15) with distinct constant slices, plus one
    // vector equal to codeword 3 with +5 on dim 0 only
    val rows = (0L to 15L).map(id =>
      (id, Array.fill(64)((id * 100).toFloat / 10000f))) :+
      (99L, Array.tabulate(64)(j =>
        (300f + (if (j == 0) 5f else 0f)) / 10000f))
    val q = Similarity.quantize(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val got = Similarity.pqDistortion(q, "vec_id")
      .orderBy($"sub_id").collect()
    assert(got.length == 8)
    // subspace 0 carries the single 5^2 = 25 error; all others zero
    assert(got.map(r => r.getAs[Long]("sum_d2")).toSeq
      == Seq(25L, 0L, 0L, 0L, 0L, 0L, 0L, 0L), s"got ${got.toSeq}")
    assert(got.forall(_.getAs[Long]("n_vecs") == 17L))
  }

  test("L243 wilcoxonSignedRank: doubled ranks exact, zeros dropped " +
      "and counted, hand-checked z") {
    import graft.ops.EvalOps
    // diffs +1, -2, +3, 0 -> |d| ranks 1,2,3 (r2 = 2,4,6);
    // W2+ = 8, W2- = 4; z = (8 - 6)/sqrt(14)
    val df = Seq((11L, 10L), (10L, 12L), (13L, 10L), (7L, 7L))
      .toDF("x", "y")
    val r = EvalOps.wilcoxonSignedRank(df, "x", "y").head
    assert((r.getAs[Long]("n"), r.getAs[Long]("n_zero"),
      r.getAs[Long]("w_plus_2x"), r.getAs[Long]("w_minus_2x"))
      == ((3L, 1L, 8L, 4L)), s"got $r")
    assert(r.getAs[Double]("z") == 2d / math.sqrt(14d), s"got $r")
    // tied |d| take average ranks: diffs +5, -5 -> r2 = 3 each, W2
    // splits evenly
    val t = EvalOps.wilcoxonSignedRank(
      Seq((15L, 10L), (10L, 15L)).toDF("x", "y"), "x", "y").head
    assert((t.getAs[Long]("w_plus_2x"), t.getAs[Long]("w_minus_2x"))
      == ((3L, 3L)), s"got $t")
  }

  test("L245 weightedKappa: hand-checked 3-class ordinal table; " +
      "perfect agreement scores 1; out-of-range labels are loud") {
    import graft.ops.EvalOps
    // O = [[2,1,0],[0,2,0],[0,1,2]] (n=8): wo = 1·1 + 1·1 = 2 (two
    // distance-1 misses); marginals r=(3,2,3), c=(2,4,2);
    // we = Σ(i-j)²·r_i·c_j = 1·(3·4) + 4·(3·2) + 1·(2·2) + 1·(2·2)
    //    + 4·(3·2) + 1·(3·4) = 12+24+4+4+24+12 = 80
    // kappa_w = 1 - 8·2/80 = 0.8
    val rows = Seq((0L, 0L), (0L, 0L), (0L, 1L), (1L, 1L), (1L, 1L),
      (2L, 1L), (2L, 2L), (2L, 2L))
    val r = EvalOps.weightedKappa(rows.toDF("g", "p"), "g", "p", k = 3)
      .head
    assert((r.getAs[Long]("n"), r.getAs[Long]("wo"), r.getAs[Long]("we"))
      == ((8L, 2L, 80L)), s"got $r")
    assert(r.getAs[Double]("kappa_w") == 0.8, s"got $r")
    val perfect = EvalOps.weightedKappa(
      Seq((0L, 0L), (1L, 1L), (2L, 2L)).toDF("g", "p"), "g", "p", k = 3)
      .head
    assert(perfect.getAs[Double]("kappa_w") == 1.0, s"got $perfect")
    intercept[Exception] {
      EvalOps.weightedKappa(Seq((0L, 5L)).toDF("g", "p"), "g", "p",
        k = 3).collect()
    }
  }

  test("L246 clusteringCoefficient: two triangles + bridge = 6/10; " +
      "a pure star has zero transitivity") {
    import graft.ops.GraphOps
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val r = GraphOps.clusteringCoefficient(edges, "src", "dst").head
    // degrees 2,2,3,3,2,2 -> wedges 1+1+3+3+1+1 = 10; triangles 2
    assert((r.getAs[Long]("n_nodes"), r.getAs[Long]("m_edges"),
      r.getAs[Long]("n_triangles"), r.getAs[Long]("n_wedges"))
      == ((6L, 7L, 2L, 10L)), s"got $r")
    assert(r.getAs[Double]("coeff") == 0.6, s"got $r")
    val star = GraphOps.clusteringCoefficient(
      (1L to 5L).map(i => (0L, i)).toDF("src", "dst"), "src", "dst").head
    assert(star.getAs[Double]("coeff") == 0.0, s"got $star")
  }

  test("L251 gwetsAc1: hand-checked paradox case — 90% agreement on a " +
      "skewed binary stays high where kappa would collapse") {
    import graft.ops.EvalOps
    // 9 agreeing (0,0) pairs + 1 (0,1) miss: pooled m = (19, 1),
    // pe_num = 19·1 + 1·19 = 38, pe_den = 400
    // -> AC1 = (9·400 − 10·38)/(10·362) = 3220/3620 ≈ 0.89
    // (Cohen's kappa on this table is 0 — the paradox AC1 fixes)
    val rows = Seq.fill(9)((0L, 0L)) :+ ((0L, 1L))
    val r = EvalOps.gwetsAc1(rows.toDF("a", "b"), "a", "b", k = 2).head
    assert((r.getAs[Long]("n"), r.getAs[Long]("n_agree"),
      r.getAs[Long]("pe_num"), r.getAs[Long]("pe_den"))
      == ((10L, 9L, 38L, 400L)), s"got $r")
    assert(r.getAs[Double]("ac1") == 3220d / 3620d, s"got $r")
    intercept[Exception] {
      EvalOps.gwetsAc1(Seq((0L, 9L)).toDF("a", "b"), "a", "b",
        k = 2).collect()
    }
  }

  test("L227 mcc: hand-checked 2x2; a zero marginal flags -2") {
    import graft.ops.EvalOps
    val rows = Seq.fill(4)((true, true)) ++ Seq.fill(1)((false, true)) ++
      Seq.fill(2)((true, false)) ++ Seq.fill(3)((false, false))
    val r = EvalOps.mcc(rows.toDF("g", "p"), "g", "p").head
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"),
      r.getAs[Long]("tn"), r.getAs[Long]("mcc_num"))
      == ((4L, 1L, 2L, 3L, 10L)), s"got $r")
    assert(r.getAs[Double]("mcc") == 10d / math.sqrt(600d), s"got $r")
    val degenerate = EvalOps.mcc(
      Seq((true, true), (true, false)).toDF("g", "p"), "g", "p").head
    assert(degenerate.getAs[Double]("mcc") == -2.0, s"got $degenerate")
  }

  test("L216/L227 paired stats fail loudly on null boolean inputs " +
      "(the table must sum to n, never silently drop cells)") {
    import graft.ops.EvalOps
    val withNull = Seq[(java.lang.Boolean, java.lang.Boolean)](
      (true, true), (null, true)).toDF("g", "p")
    intercept[Exception] { EvalOps.mcc(withNull, "g", "p").collect() }
    intercept[Exception] { EvalOps.mcnemar(withNull, "g", "p").collect() }
  }

  test("L217 spearmanRho rejects fractional values loudly (e6 " +
      "fixed-point contract) instead of silently quantizing") {
    import graft.ops.EvalOps
    val frac = Seq((1.5d, 2.0d), (2.0d, 3.0d)).toDF("x", "y")
    intercept[Exception] { EvalOps.spearmanRho(frac, "x", "y").collect() }
    // integral doubles pass the gate (exact long cast); perfect
    // monotone agreement reads as num == dx == dy in the exact fields
    val ok = EvalOps.spearmanRho(
      Seq((1.0d, 2.0d), (2.0d, 4.0d), (3.0d, 5.0d)).toDF("x", "y"),
      "x", "y").head
    assert(ok.getAs[Long]("num") == ok.getAs[Long]("dx")
      && ok.getAs[Long]("dx") == ok.getAs[Long]("dy")
      && ok.getAs[Long]("num") > 0L, s"got $ok")
  }

  test("L258 mannWhitneyU: hand-checked a=[1,2,3] b=[2,4] — U_a = 1.5 " +
      "(one win + half a tie), tie term from the shared 2") {
    import graft.ops.EvalOps
    val a = Seq(1L, 2L, 3L).toDF("v")
    val b = Seq(2L, 4L).toDF("v")
    val r = EvalOps.mannWhitneyU(a, b, "v").head
    // ranks over [1,2,2,3,4] = [1, 2.5, 2.5, 4, 5]; R_a = 7.5 so
    // ra_2x = 15, u_a_2x = 15 - 3*4 = 3 (U_a = 1.5); t=2 tie -> 6
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("u_a_2x"), r.getAs[Long]("tie_term"),
      r.getAs[Long]("d"), r.getAs[Long]("var_num"), r.getAs[Long]("var_den"))
      == ((3L, 2L, 3L, 6L, -3L, 684L, 60L)), s"got $r")
  }

  test("L259 cramersV: perfect 2x2 association reads V = 1 including " +
      "the zero cells a naive observed-only walk would drop") {
    import graft.ops.EvalOps
    val rows = Seq.fill(2)(("x", "1")) ++ Seq.fill(3)(("y", "2"))
    val r = EvalOps.cramersV(rows.toDF("a", "b"), "a", "b").head
    // chisq = n * min(r-1, c-1) = 5 exactly at perfect association;
    // the two ZERO cells contribute 1.2e6 each — dropping them would
    // read 2.6e6
    assert(r.getAs[Long]("n") == 5L && r.getAs[Long]("chisq_e6") == 5000000L
      && r.getAs[Double]("v") == 1.0, s"got $r")
    val indep = Seq(("x", "1"), ("x", "2"), ("y", "1"), ("y", "2"))
      .toDF("a", "b")
    val ri = EvalOps.cramersV(indep, "a", "b").head
    assert(ri.getAs[Long]("chisq_e6") == 0L && ri.getAs[Double]("v") == 0.0,
      s"got $ri")
  }

  test("L266 kendallTau: hand-checked 4 points with an x-tie, a y-tie, " +
      "and a discordance — tau = 2/5 exactly") {
    import graft.ops.EvalOps
    val pts = Seq((1L, 1L), (2L, 3L), (2L, 2L), (3L, 2L)).toDF("x", "y")
    val r = EvalOps.kendallTau(pts, "x", "y").head
    assert((r.getAs[Long]("n_pairs"), r.getAs[Long]("conc"),
      r.getAs[Long]("disc"), r.getAs[Long]("tie_x"), r.getAs[Long]("tie_y"),
      r.getAs[Long]("tie_both")) == ((6L, 3L, 1L, 1L, 1L, 0L)), s"got $r")
    assert(r.getAs[Double]("tau") == 0.4, s"got $r") // sqrt(25) exact
  }

  test("L267 linearFit: hand-checked perfect line y = 2x — slope 2, " +
      "intercept 0, exact dev components") {
    import graft.ops.EvalOps
    val pts = Seq((1L, 2L), (2L, 4L), (3L, 6L)).toDF("x", "y")
    val r = EvalOps.linearFit(pts, "x", "y").head
    assert((r.getAs[Long]("xy_dev"), r.getAs[Long]("xx_dev"),
      r.getAs[Long]("yy_dev")) == ((12L, 6L, 24L)), s"got $r")
    assert(r.getAs[Double]("slope") == 2.0
      && r.getAs[Double]("intercept") == 0.0, s"got $r")
    assert(r.getAs[Double]("r")
      == 12d / (math.sqrt(6d) * math.sqrt(24d)), s"got $r")
    // constant x flags, never divides by zero
    val const = EvalOps.linearFit(
      Seq((5L, 1L), (5L, 2L)).toDF("x", "y"), "x", "y").head
    assert(const.getAs[Double]("r") == -2.0
      && const.getAs[Double]("slope") == 0.0, s"got $const")
  }

  test("L253 nfcDedup: NFC collapses the composed/decomposed twins the " +
      "raw bytes and the L148 fold both keep distinct") {
    val docs = Seq((1L, "en", "alpha"), (2L, "en", "beta"),
      (3L, "de", "gamma")).toDF("doc_id", "lang", "text")
    val r = TextOps.nfcDedup(docs, "lang", "text")
      .orderBy(col("lang")).collect()
    val en = r.find(_.getAs[String]("lang") == "en").get
    // 2 docs -> 4 minted rows, 4 distinct raw, 2 distinct after NFC
    assert(en.getAs[Long]("n_rows") == 4L
      && en.getAs[Long]("n_distinct_raw") == 4L
      && en.getAs[Long]("n_distinct_nfc") == 2L
      && en.getAs[Long]("n_collapsed_nfc") == 2L, s"got $en")
    // the fold strips the composed accent but NOT the combining mark:
    // fold alone leaves the twins distinct; NFC∘fold collapses them
    assert(en.getAs[Long]("n_distinct_fold") == 4L
      && en.getAs[Long]("n_distinct_nfc_fold") == 2L
      && en.getAs[Long]("n_fold_missed") == 2L, s"got $en")
    val de = r.find(_.getAs[String]("lang") == "de").get
    assert(de.getAs[Long]("n_rows") == 2L
      && de.getAs[Long]("n_distinct_nfc") == 1L, s"got $de")
  }

  test("L280 bhFdr: the step-up property pulls a non-qualifying rank " +
    "into the rejection set when a later rank qualifies") {
    import graft.ops.EvalOps
    // p = .01 .026 .028 .04, q = .05, m = 4: thresholds .0125 .025
    // .0375 .05 — rank 2 (.026 > .025) fails alone but rank 4
    // qualifies, so ALL FOUR reject (step-up, not step-down)
    val up = Seq((1L, 10000L), (2L, 26000L), (3L, 28000L), (4L, 40000L))
      .toDF("test_id", "p_e6")
    val r1 = EvalOps.bhFdr(up, "test_id", "p_e6", 50000L)
      .orderBy($"rank").collect()
    assert(r1.forall(_.getAs[Boolean]("reject")), r1.mkString(","))
    // p = .01 .04 .03 .05 .20: only rank 1 qualifies -> only .01 rejects
    val classic = Seq((1L, 10000L), (2L, 40000L), (3L, 30000L),
      (4L, 50000L), (5L, 200000L)).toDF("test_id", "p_e6")
    val r2 = EvalOps.bhFdr(classic, "test_id", "p_e6", 50000L)
      .orderBy($"rank").collect()
    assert(r2.count(_.getAs[Boolean]("reject")) == 1
      && r2.head.getAs[Long]("id") == 1L, r2.mkString(","))
    // nothing qualifies -> nothing rejects
    val none = Seq((1L, 900000L), (2L, 990000L)).toDF("test_id", "p_e6")
    assert(EvalOps.bhFdr(none, "test_id", "p_e6", 50000L)
      .filter($"reject").count() == 0L)
  }

  test("L287 friedman: textbook identical-ordering case gives chisq 6 " +
    "exactly; incomplete blocks raise") {
    import graft.ops.EvalOps
    // 3 blocks, 3 treatments, same order everywhere: R = (3,6,9),
    // chisq = 12*126/36 - 36 = 6
    val cells = (for (b <- 1 to 3; t <- 0 until 3)
      yield (b.toLong, t.toLong, (10 * (t + 1) + b).toLong))
      .toDF("block", "system", "score")
    val r = EvalOps.friedman(cells, "block", "system", "score").head
    assert(r.getAs[Long]("n_blocks") == 3L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Double]("chisq") == 6.0, s"got $r")
    // an all-tied block contributes equal doubled ranks -> chisq 0
    val tied = (for (b <- 1 to 2; t <- 0 until 3)
      yield (b.toLong, t.toLong, 5L)).toDF("block", "system", "score")
    assert(EvalOps.friedman(tied, "block", "system", "score")
      .head.getAs[Double]("chisq") == 0.0)
    val incomplete = cells.filter(!($"block" === 1L && $"system" === 0L))
    intercept[Exception] {
      EvalOps.friedman(incomplete, "block", "system", "score").collect()
    }
  }

  test("L288 cochranQ: hand-worked 4x3 panel gives Q = 3 exactly; " +
    "unanimous panels report -1") {
    import graft.ops.EvalOps
    // items x raters: (1,1,0),(1,0,0),(1,1,1),(0,0,0)
    // C=(3,2,1) N=6 sumC2=14 sumR2=14 -> Q = 2*(42-36)/(18-14) = 3
    val bits = Seq(
      (1L, 0L, true), (1L, 1L, true), (1L, 2L, false),
      (2L, 0L, true), (2L, 1L, false), (2L, 2L, false),
      (3L, 0L, true), (3L, 1L, true), (3L, 2L, true),
      (4L, 0L, false), (4L, 1L, false), (4L, 2L, false))
      .toDF("item", "gate", "pass")
    val r = EvalOps.cochranQ(bits, "item", "gate", "pass").head
    assert(r.getAs[Long]("n_items") == 4L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Double]("q") == 3.0, s"got $r")
    // every item unanimous -> degenerate denominator -> -1
    val unam = Seq((1L, 0L, true), (1L, 1L, true),
      (2L, 0L, false), (2L, 1L, false)).toDF("item", "gate", "pass")
    assert(EvalOps.cochranQ(unam, "item", "gate", "pass")
      .head.getAs[Double]("q") == -1.0)
  }

  test("L295 runsTest: hand-counted 1,1,0,1,0 gives R=4 with exact " +
    "components; a constant sequence is degenerate") {
    import graft.ops.EvalOps
    val bits = Seq((1L, true), (2L, true), (3L, false), (4L, true),
      (5L, false)).toDF("o", "b")
    val r = EvalOps.runsTest(bits, "o", "b").head
    // n=5 n1=3 n2=2: runs 11|0|1|0 = 4; z_num = 5*4-12-5 = 3;
    // var = 12*(12-5)/(25*4) = 84/100
    assert(r.getAs[Long]("n") == 5L && r.getAs[Long]("n1") == 3L
      && r.getAs[Long]("runs") == 4L && r.getAs[Long]("z_num") == 3L
      && r.getAs[Long]("var_num") == 84L
      && r.getAs[Long]("var_den") == 100L, s"got $r")
    assert(math.abs(r.getAs[Double]("z") -
      0.6 / math.sqrt(0.84)) < 1e-12)
    val const = Seq((1L, true), (2L, true)).toDF("o", "b")
    val c = EvalOps.runsTest(const, "o", "b").head
    assert(c.getAs[Long]("runs") == 1L && c.getAs[Double]("z") == 0.0)
  }

  test("L298 pageTrend: perfect monotone order gives z = 2 exactly " +
    "for n=2, k=3; a shuffled treatment labeling raises") {
    import graft.ops.EvalOps
    // scores = t in every block: L2 = 2*n*sum(j*j) = 56,
    // mu = n*k(k+1)^2/2 = 48, var_num = n*k^2(k+1)(k^2-1) = 576,
    // sigma(L2) = sqrt(576/36) = 4 -> z = 2
    val cells = (for (b <- 1 to 2; t <- 1 to 3)
      yield (b.toLong, t.toLong, (t * 10).toLong))
      .toDF("block", "version", "score")
    val r = EvalOps.pageTrend(cells, "block", "version", "score").head
    assert(r.getAs[Long]("l2") == 56L && r.getAs[Long]("mu_l2") == 48L
      && r.getAs[Long]("var_num") == 576L, s"got $r")
    assert(r.getAs[Double]("z") == 2.0, s"got $r")
    // treatments must be the 1..k order
    val bad = cells.withColumn("version", $"version" + 1L)
    intercept[Exception] {
      EvalOps.pageTrend(bad, "block", "version", "score").collect()
    }
  }

  test("L302 oneWayAnova: textbook F=73 on three groups; unbalanced " +
    "is loud") {
    import graft.ops.EvalOps
    val cells = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 2L), (2L, 3L),
      (2L, 4L), (3L, 10L), (3L, 11L), (3L, 12L)).toDF("g", "v")
    val r = EvalOps.oneWayAnova(cells, "g", "v").head
    assert(r.getLong(0) == 9L && r.getLong(1) == 3L)
    assert(r.getAs[java.math.BigDecimal]("f_num").longValueExact == 7884L)
    assert(r.getAs[java.math.BigDecimal]("f_den").longValueExact == 108L)
    assert(r.getAs[Double]("f") == 73.0, s"got $r")
    intercept[Exception] {
      EvalOps.oneWayAnova(cells.limit(8), "g", "v").collect()
    }
  }

  test("L303 kruskalWallis: textbook H=4.571 on untied 2/2/2 groups") {
    import graft.ops.EvalOps
    val cells = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L), (3L, 5L),
      (3L, 6L)).toDF("g", "v")
    val r = EvalOps.kruskalWallis(cells, "g", "v").head
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L)
    assert(r.getLong(r.fieldIndex("h_s")) == 358L)
    assert(r.getLong(r.fieldIndex("tie_term")) == 0L)
    assert(math.abs(r.getAs[Double]("h") - 40320.0 / 8820.0) < 1e-12,
      s"got $r")
  }

  test("L304 kaplanMeier: hand-folded survival ladder with censoring") {
    import graft.ops.EvalOps
    val obs = Seq((1L, true), (2L, false), (3L, true), (3L, true),
      (4L, false)).toDF("t", "e")
    val got = EvalOps.kaplanMeier(obs, "t", "e")
      .orderBy($"t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 5L, 1L, 0L, 800000L),
      (2L, 4L, 0L, 1L, 800000L),
      (3L, 3L, 2L, 0L, 266666L),
      (4L, 1L, 0L, 1L, 266666L)), s"got $got")
  }

  test("L313 scd2Intervals: episodes collapse repeats, reopen on " +
    "re-appearance; duplicate ts is loud") {
    import graft.ops.Curation
    val log = Seq(("k1", 10L, "a"), ("k1", 20L, "a"), ("k1", 30L, "b"),
      ("k1", 40L, "a"), ("k2", 5L, "x")).toDF("k", "ts", "v")
    val got = Curation.scd2Intervals(log, "k", "ts", "v")
      .orderBy($"key", $"valid_from").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    assert(got == Seq(
      ("k1", "a", 10L, 30L, false),
      ("k1", "b", 30L, 40L, false),
      ("k1", "a", 40L, Long.MaxValue, true),
      ("k2", "x", 5L, Long.MaxValue, true)), s"got $got")
    intercept[Exception] {
      Curation.scd2Intervals(
        log.union(Seq(("k1", 10L, "z")).toDF("k", "ts", "v")),
        "k", "ts", "v").collect()
    }
  }

  test("L314 resourceAllocation: rare shared neighbor outweighs hubs") {
    import graft.ops.GraphOps
    // square 1-2-3-4-1 with diagonal 1-3: pair (1,3) shares {2,4}
    // (deg 2 each -> 10^6), pair (2,4) shares {1,3} (deg 3 -> 666666)
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("a", "b")
    val got = GraphOps.resourceAllocation(g, "a", "b", degCap = 10,
        topK = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 666666L)),
      s"got $got")
  }

  test("L319 welchT: hand-worked unequal-variance t; degenerate is -99") {
    import graft.ops.EvalOps
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    val b = Seq(2L, 4L, 6L).toDF("v")
    val r = EvalOps.welchT(a, b, "v").head
    assert(r.getLong(r.fieldIndex("va_num")) == 20L &&
      r.getLong(r.fieldIndex("va_den")) == 48L &&
      r.getLong(r.fieldIndex("vb_num")) == 24L &&
      r.getLong(r.fieldIndex("vb_den")) == 18L)
    val t = r.getAs[Double]("t")
    assert(math.abs(t - (-1.5 / math.sqrt(20.0 / 48.0 + 24.0 / 18.0)))
      < 1e-15, s"got $t")
    // constant both sides -> degenerate
    val c = Seq(5L, 5L).toDF("v")
    assert(EvalOps.welchT(c, c, "v").head.getAs[Double]("t") == -99d)
  }

  test("L326 harmonicCentrality: exact 1/d ball sums on a path") {
    import graft.ops.GraphOps
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = GraphOps.harmonicCentrality(g, "a", "b", rounds = 2,
        topK = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // inner nodes see {1,1,2} -> 2.5e6; ends see {1,2} -> 1.5e6
    assert(got == Seq((2L, 3L, 2500000L), (3L, 3L, 2500000L),
      (1L, 2L, 1500000L), (4L, 2L, 1500000L)), s"got $got")
  }

  test("L327 jonckheereTerpstra: perfectly ordered groups give the " +
    "textbook z; bad group order is loud") {
    import graft.ops.EvalOps
    val cells = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L), (3L, 5L),
      (3L, 6L)).toDF("g", "v")
    val r = EvalOps.jonckheereTerpstra(cells, "g", "v").head
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L)
    assert(r.getLong(r.fieldIndex("j2")) == 24L &&
      r.getLong(r.fieldIndex("mu2")) == 12L &&
      r.getLong(r.fieldIndex("var_num")) == 456L)
    assert(math.abs(r.getAs[Double]("z") - 6.0 / math.sqrt(456.0 / 72.0))
      < 1e-12, s"got $r")
    intercept[Exception] {
      EvalOps.jonckheereTerpstra(
        cells.withColumn("g", $"g" + 1L), "g", "v").collect()
    }
  }

  test("L325 bootstrapMeanCI: deterministic draws, ordered CI brackets " +
    "the mean; non-contiguous ids are loud") {
    import graft.ops.EvalOps
    val df = (0L until 50L).map(i => (i, 100L + (i * 7) % 31)).toDF("i", "v")
    val r = EvalOps.bootstrapMeanCI(df, "i", "v", b = 40, loIdx = 2,
      hiIdx = 39).head
    val (n, b, mean, lo, hi) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    assert(n == 50L && b == 40L)
    assert(lo <= hi && lo <= mean + 5000 && hi >= mean - 5000,
      s"CI ($lo, $hi) should bracket near mean $mean")
    // identical inputs -> identical CI (the whole point)
    val r2 = EvalOps.bootstrapMeanCI(df, "i", "v", b = 40, loIdx = 2,
      hiIdx = 39).head
    assert(r2.getLong(3) == lo && r2.getLong(4) == hi)
    intercept[Exception] {
      EvalOps.bootstrapMeanCI(df.filter($"i" =!= 7L), "i", "v",
        b = 40, loIdx = 2, hiIdx = 39).collect()
    }
  }

  test("L320 bcubed: per-item precision/recall from the cell rollup") {
    import graft.ops.EvalOps
    // clusters A=[x,x,y], B=[y,y]: symmetric P=R=733333 by hand
    val items = Seq(("A", "x"), ("A", "x"), ("A", "y"), ("B", "y"),
      ("B", "y")).toDF("k", "j")
    val r = EvalOps.bcubed(items, "k", "j").head
    assert(r.getLong(0) == 5L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(r.fieldIndex("p_e6")) == 733333L &&
      r.getLong(r.fieldIndex("r_e6")) == 733333L &&
      r.getLong(r.fieldIndex("f_e6")) == 733333L, s"got $r")
    // a perfect clustering scores 1e6 across the board
    val perfect = Seq(("A", "x"), ("A", "x"), ("B", "y")).toDF("k", "j")
    val p = EvalOps.bcubed(perfect, "k", "j").head
    assert(p.getLong(p.fieldIndex("p_e6")) == 1000000L &&
      p.getLong(p.fieldIndex("r_e6")) == 1000000L &&
      p.getLong(p.fieldIndex("f_e6")) == 1000000L)
  }

  test("L311 yuleK: spectrum-exact K on a planted frequency profile") {
    import graft.ops.TextOps
    // g1: tokens a,a,a,b -> N=4, V3=1, V1=1, sum m^2 V = 10 -> K=3750
    val docs = Seq(("g1", "a a a b"), ("g2", "x y")).toDF("src", "text")
    val got = TextOps.yuleK(docs, "src", "text")
      .orderBy($"g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(("g1", 4L, 2L, 60000L, 16L),
      ("g2", 2L, 2L, 0L, 4L)), s"got $got")
  }

  test("L312 wordpieceScores: likelihood ratio beats raw frequency") {
    import graft.ops.TextOps
    // pairs: (a,b) cnt 2 but a,b both frequent; (c,b) cnt 1 with rare c
    val docs = Seq(("ab ab ba cb")).toDF("text")
    val got = TextOps.wordpieceScores(docs, "text", k = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(5))).toSeq
    assert(got == Seq(
      ("c", "b", 1L, 250000000L),  // 1e9 / (1*4)
      ("a", "b", 2L, 166666666L),  // 2e9 / (3*4)
      ("b", "a", 1L, 83333333L)),  // 1e9 / (4*3)
      s"got $got")
  }
}
