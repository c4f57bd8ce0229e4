package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evaluation metrics for the speech/text pipeline's model stages —
  * the numbers a production curation run reports after every
  * diarization/ASR/summarization model swap. Everything stays in
  * exact integer domains (microseconds, n-gram counts); the only
  * doubles are single divisions of two exact integers, the engine's
  * established cross-engine-exactness discipline.
  */
object EvalOps {

  /** All permutations of 0..n-1 flattened to (permId, from, to) rows,
    * permId in lexicographic order — the fixed assignment lattice
    * [[diarizationErrorRate]] broadcasts (n ≤ 4 → ≤ 96 rows), shared
    * verbatim with the SQL oracle.
    */
  private[graft] def permRows(n: Int): Seq[(Int, Int, Int)] = {
    require(n >= 1 && n <= 4, s"speaker count must be 1..4, got $n")
    (0 until n).permutations.toSeq.sortBy(_.mkString).zipWithIndex.flatMap {
      case (p, pid) => p.indices.map(r => (pid, r, p(r)))
    }
  }

  /** L158 — DIARIZATION ERROR RATE (the NIST RT metric; the reference's
    * diarizer is a 4-speaker model, `sortformer_diar_4spk-v2.yaml`) for
    * single-speaker-at-a-time segment streams, with the OPTIMAL
    * reference↔hypothesis speaker mapping computed exactly: with ≤ 4
    * speakers the assignment problem is a 24-permutation enumeration —
    * a broadcast literal lattice, not a Hungarian solver — so the whole
    * metric unrolls to equi joins a SQL oracle replays verbatim.
    *
    * DER = (T_miss + T_fa + T_conf) / T_ref, all in exact integer
    * microseconds:
    *  - co-occurrence matrix C[r][h] = Σ overlap(ref seg of spk r,
    *    hyp seg of spk h) via the interval-intersection equi+range
    *    join (per-file key, never cartesian across files);
    *  - T_miss = T_ref − ΣC, T_fa = T_hyp − ΣC (valid because each
    *    stream is non-overlapping: at most one speaker active per
    *    stream at any instant — the shape a diarizer emits);
    *  - T_conf = ΣC − max over the ≤ 24 mappings p of Σ_r C[r][p(r)].
    *
    * Scale shape: one interval join + two map-side-combined aggs per
    * input, one ≤ 96-row broadcast; per-file work bounded by segment
    * count — nothing quadratic in files.
    *
    * A file with hypothesis speech but NO reference speech still emits
    * its row (full-outer assembly): t_ref = 0, t_fa = t_hyp, der = −1
    * (the loud-flag posture — FA time must surface, and 0/0 is not a
    * score). A file carrying any speaker id outside 0..maxSpeakers−1
    * breaks the lattice contract and flags der = −1 likewise, never a
    * silently understated t_correct.
    *
    * Output: (file, t_ref, t_hyp, t_both, t_correct, t_miss, t_fa,
    * t_conf, der) with der = (miss+fa+conf)/t_ref as the single
    * exact-integer division (−1 on t_ref = 0 or contract violation).
    */
  def diarizationErrorRate(ref: DataFrame, hyp: DataFrame, fileCol: String,
      startCol: String, endCol: String, spkCol: String,
      maxSpeakers: Int = 4): DataFrame = {
    val spark = ref.sparkSession
    import spark.implicits._
    def norm(df: DataFrame, tag: String): DataFrame =
      df.select(col(fileCol).cast("long").as("f"),
        col(startCol).cast("long").as(s"s_$tag"),
        col(endCol).cast("long").as(s"e_$tag"),
        col(spkCol).cast("int").as(s"k_$tag"))
    val r = norm(ref, "r")
    val h = norm(hyp, "h")
    val tr = r.groupBy(col("f"))
      .agg(sum(col("e_r") - col("s_r")).as("t_ref"),
        max(col("k_r") < 0 || col("k_r") >= maxSpeakers).as("bad_r"))
    val th = h.groupBy(col("f"))
      .agg(sum(col("e_h") - col("s_h")).as("t_hyp"),
        max(col("k_h") < 0 || col("k_h") >= maxSpeakers).as("bad_h"))
    // co-occurrence: per-file interval intersection, equi on file
    val c = r.join(h, Seq("f"))
      .filter(col("s_r") < col("e_h") && col("s_h") < col("e_r"))
      .groupBy(col("f"), col("k_r"), col("k_h"))
      .agg(sum(least(col("e_r"), col("e_h"))
        - greatest(col("s_r"), col("s_h"))).as("ov"))
    val both = c.groupBy(col("f")).agg(sum(col("ov")).as("t_both"))
    val perms = permRows(maxSpeakers).toDF("perm_id", "k_r", "k_h")
    val correct = c.join(broadcast(perms), Seq("k_r", "k_h"))
      .groupBy(col("f"), col("perm_id")).agg(sum(col("ov")).as("cor"))
      .groupBy(col("f")).agg(max(col("cor")).as("t_correct"))
    tr.join(th, Seq("f"), "full_outer")
      .join(both, Seq("f"), "left")
      .join(correct, Seq("f"), "left")
      .select(col("f").as("file"),
        coalesce(col("t_ref"), lit(0L)).as("t_ref"),
        coalesce(col("t_hyp"), lit(0L)).as("t_hyp"),
        coalesce(col("t_both"), lit(0L)).as("t_both"),
        coalesce(col("t_correct"), lit(0L)).as("t_correct"),
        (coalesce(col("bad_r"), lit(false))
          || coalesce(col("bad_h"), lit(false))).as("__bad"))
      .withColumn("t_miss", col("t_ref") - col("t_both"))
      .withColumn("t_fa", col("t_hyp") - col("t_both"))
      .withColumn("t_conf", col("t_both") - col("t_correct"))
      .withColumn("der",
        when(col("t_ref") > 0L && !col("__bad"),
          (col("t_miss") + col("t_fa") + col("t_conf")).cast("double")
            / col("t_ref").cast("double"))
          .otherwise(lit(-1d)))
      .drop("__bad")
  }

  /** Clipped multiset intersection size Σ_g min(cntA(g), cntB(g)) —
    * iterating distinct grams of EITHER side gives the same sum (a
    * gram absent from one side contributes min(·,0)=0), so ROUGE
    * (ref-side recall) and BLEU (hyp-side clipped precision) share it.
    */
  private def clippedMatch(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(
      transform(array_distinct(a), g =>
        least(size(filter(a, x => x === g)),
          size(filter(b, x => x === g)))),
      lit(0L), (acc, x) => acc + x)

  /** L160 — BLEU COMPONENTS (Papineni et al. 2002), the exactly-
    * computable core: per order n = 1..4 the clipped (modified)
    * n-gram precision's integer numerator mₙ = Σ_g min(cnt_hyp,
    * cnt_ref) and denominator tₙ = #hyp n-grams, plus ref/hyp token
    * lengths. BLEU itself is BP·exp(Σ¼ ln pₙ) — transcendental, so
    * the score this emits is `prec_prod` = Πmₙ/Πtₙ (the 4th power of
    * the geometric mean — same ORDER over systems, exact: one
    * division of two exact ≤10¹⁶ integer products for docs under 10⁴
    * tokens) and `len_ratio` = ref_len/hyp_len (BP = min(1,
    * e^{1−len_ratio}) is monotone in it). −1 flags when any tₙ = 0.
    * Pure per-row HOFs — zero shuffle.
    */
  def bleuComponents(pairs: DataFrame, idCol: String, refCol: String,
      hypCol: String): DataFrame = {
    val withGrams = (1 to 4).foldLeft(pairs) { (df, n) =>
      df.withColumn(s"__gr$n", TextOps.shingles(col(refCol), n))
        .withColumn(s"__gh$n", TextOps.shingles(col(hypCol), n))
        .withColumn(s"m$n", clippedMatch(col(s"__gh$n"), col(s"__gr$n")))
        .withColumn(s"t$n", size(col(s"__gh$n")).cast("long"))
    }
    withGrams
      .select(col(idCol) +: (
        Seq(size(col(refCol)).cast("long").as("ref_len"),
          size(col(hypCol)).cast("long").as("hyp_len")) ++
        (1 to 4).flatMap(n => Seq(col(s"m$n"), col(s"t$n")))): _*)
      .withColumn("prec_prod",
        when((1 to 4).map(n => col(s"t$n") > 0L).reduce(_ && _),
          (col("m1") * col("m2") * col("m3") * col("m4")).cast("double")
            / (col("t1") * col("t2") * col("t3") * col("t4")).cast("double"))
          .otherwise(lit(-1d)))
      .withColumn("len_ratio",
        when(col("hyp_len") > 0L,
          col("ref_len").cast("double") / col("hyp_len").cast("double"))
          .otherwise(lit(-1d)))
  }

  /** L161 — SPEAKER-ATTRIBUTED WER (cpWER — concatenated minimum-
    * permutation word error rate, the CHiME-6 multi-speaker ASR
    * metric): each file carries one reference transcript per speaker
    * and one hypothesis transcript per (diarized) speaker label; the
    * metric pairs them under every speaker mapping of the
    * [[permRows]] lattice, scores each pair with the L155 code-point
    * word-Levenshtein ([[TextOps.wordErrorRate]]), and the mapping
    * minimizing TOTAL distance wins — the M3∘M7 composite: diarization
    * label permutations must not count as ASR errors.
    *
    * Contract: both streams carry speaker ids 0..maxSpeakers−1 with
    * word arrays under the L155/L156 encodability bound; a pair whose
    * union vocabulary overflows flags dist −1 and its mappings are
    * excluded (best_dist −1 if every mapping is poisoned — loud), and
    * a file carrying ANY speaker id outside 0..maxSpeakers−1 flags
    * best_dist/cpwer −1 outright (contract violation — never a
    * silently dropped transcript).
    *
    * UNPAIRED transcripts are PRICED, not dropped (the metric's whole
    * point is grading diarizers that lose or invent speakers): under a
    * mapping, a reference speaker whose mapped hypothesis label is
    * absent for the file scores |ref words| deletions, and a
    * hypothesis label no present reference speaker maps to scores
    * |hyp words| insertions — the full-outer pairing per (file,
    * mapping, hyp label) with the missing side as the empty
    * transcript. n_ref is the file's total reference word count,
    * identical under every mapping by construction.
    *
    * Scale shape: one ≤24-row broadcast, equi joins on (file,
    * mapping, speaker), per-pair codegen'd levenshtein, two hash aggs.
    *
    * Output: (file, n_ref, best_dist, cpwer) with cpwer =
    * best_dist/n_ref (−1 when n_ref = 0, all mappings poisoned, or a
    * speaker id breaks the contract).
    */
  def cpWer(ref: DataFrame, hyp: DataFrame, fileCol: String,
      spkCol: String, wordsCol: String, maxSpeakers: Int = 4): DataFrame = {
    val spark = ref.sparkSession
    import spark.implicits._
    val r = ref.select(col(fileCol).cast("long").as("f"),
      col(spkCol).cast("int").as("k_r"), col(wordsCol).as("rw"))
    val h = hyp.select(col(fileCol).cast("long").as("f"),
      col(spkCol).cast("int").as("k_h"), col(wordsCol).as("hw"))
    val perms = permRows(maxSpeakers).toDF("perm_id", "k_r", "k_h")
    val permIds = permRows(maxSpeakers).map(_._1).distinct.toDF("perm_id")
    // contract gate: any id outside 0..maxSpeakers-1 poisons its file
    val spkBad = r.select(col("f"), col("k_r").as("k"))
      .unionByName(h.select(col("f"), col("k_h").as("k")))
      .groupBy(col("f"))
      .agg(max(col("k") < 0 || col("k") >= maxSpeakers).as("spk_bad"))
    // every mapping pairs each present ref speaker with its mapped hyp
    // label and each hyp label with its pre-image: full outer per
    // (file, mapping, hyp label), missing side = empty transcript
    val refm = r.join(broadcast(perms), Seq("k_r"))
      .select(col("f"), col("perm_id"), col("k_h"), col("rw"))
    val hypm = h.crossJoin(broadcast(permIds))
      .select(col("f"), col("perm_id"), col("k_h"), col("hw"))
    val paired = refm.join(hypm, Seq("f", "perm_id", "k_h"), "full_outer")
      .withColumn("rw", coalesce(col("rw"), filter(col("hw"), _ => lit(false))))
      .withColumn("hw", coalesce(col("hw"), filter(col("rw"), _ => lit(false))))
    val scored = TextOps.wordErrorRate(paired, Seq("f", "perm_id"), "rw", "hw")
    val perMapping = scored.groupBy(col("f"), col("perm_id"))
      .agg(sum(col("n_ref")).as("n_ref"),
        when(min(col("dist")) < 0L, lit(-1L))
          .otherwise(sum(col("dist"))).as("d"))
    perMapping.groupBy(col("f"))
      .agg(max(col("n_ref")).as("n_ref"),
        coalesce(min(when(col("d") >= 0L, col("d"))), lit(-1L)).as("best_dist"))
      .join(spkBad, Seq("f"), "left")
      .select(col("f").as("file"), col("n_ref"),
        when(coalesce(col("spk_bad"), lit(false)), lit(-1L))
          .otherwise(col("best_dist")).as("best_dist"))
      .withColumn("cpwer",
        when(col("best_dist") >= 0L && col("n_ref") > 0L,
          col("best_dist").cast("double") / col("n_ref").cast("double"))
          .otherwise(lit(-1d)))
  }

  /** L174 — PER-SPEAKER CONFUSION under the OPTIMAL mapping — the
    * diagnostic behind [[diarizationErrorRate]]'s single number: which
    * reference speaker lost how much time to missing coverage vs to
    * being CONFUSED with other hypothesis speakers, under the same
    * ≤24-permutation argmax (ties to the lowest permId — deterministic
    * and oracle-replayable). A diarizer that merges two voices shows
    * up here as one row with large t_confused, not just a worse DER.
    *
    * Contract-violation surfaces (ids are expected in
    * 0..maxSpeakers−1, the lattice contract): a reference speaker id
    * OUTSIDE the range can never map and emits spk_mapped = −1 (the
    * loud flag — its time reads as confused/missed, never vanishes);
    * an out-of-range HYPOTHESIS label's overlap lands in t_confused
    * (it is not the mapped label of any reference speaker). Files with
    * hypothesis speech but no reference speech have no per-ref-speaker
    * row by definition — [[diarizationErrorRate]] surfaces their FA
    * time.
    *
    * Output: one row per (file, ref speaker present in ref):
    * (file, spk_ref, spk_mapped, t_spk_ref, t_matched, t_confused,
    * t_missed) with t_spk_ref = that speaker's total reference time,
    * t_matched = co-occurrence with the mapped hypothesis speaker,
    * t_confused = co-occurrence with every OTHER hypothesis speaker,
    * t_missed = t_spk_ref − t_matched − t_confused. All exact integer
    * microseconds; same join shapes as the DER (equi + ≤96-row
    * broadcast lattice).
    */
  def speakerConfusion(ref: DataFrame, hyp: DataFrame, fileCol: String,
      startCol: String, endCol: String, spkCol: String,
      maxSpeakers: Int = 4): DataFrame = {
    val spark = ref.sparkSession
    import spark.implicits._
    def norm(df: DataFrame, tag: String): DataFrame =
      df.select(col(fileCol).cast("long").as("f"),
        col(startCol).cast("long").as(s"s_$tag"),
        col(endCol).cast("long").as(s"e_$tag"),
        col(spkCol).cast("int").as(s"k_$tag"))
    val r = norm(ref, "r")
    val h = norm(hyp, "h")
    val c = r.join(h, Seq("f"))
      .filter(col("s_r") < col("e_h") && col("s_h") < col("e_r"))
      .groupBy(col("f"), col("k_r"), col("k_h"))
      .agg(sum(least(col("e_r"), col("e_h"))
        - greatest(col("s_r"), col("s_h"))).as("ov"))
    val perms = permRows(maxSpeakers).toDF("perm_id", "k_r", "k_h")
    val per = c.join(broadcast(perms), Seq("k_r", "k_h"))
      .groupBy(col("f"), col("perm_id")).agg(sum(col("ov")).as("cor"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("f"))
      .orderBy(col("cor").desc, col("perm_id"))
    val best = per.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select(col("f"), col("perm_id"))
    val chosen = best.join(broadcast(perms), Seq("perm_id"))
      .select(col("f"), col("k_r"), col("k_h").as("spk_mapped"))
    val tRef = r.groupBy(col("f"), col("k_r"))
      .agg(sum(col("e_r") - col("s_r")).as("t_spk_ref"))
    val perRef = c.groupBy(col("f"), col("k_r"))
      .agg(sum(col("ov")).as("t_overlap"))
    val matched = c.join(chosen.withColumnRenamed("spk_mapped", "k_h"),
        Seq("f", "k_r", "k_h"))
      .select(col("f"), col("k_r"), col("ov").as("t_matched"))
    tRef
      .join(chosen, Seq("f", "k_r"), "left")
      .join(perRef, Seq("f", "k_r"), "left")
      .join(matched, Seq("f", "k_r"), "left")
      .select(col("f").as("file"), col("k_r").cast("long").as("spk_ref"),
        coalesce(col("spk_mapped"), lit(-1)).cast("long").as("spk_mapped"),
        col("t_spk_ref"),
        coalesce(col("t_matched"), lit(0L)).as("t_matched"),
        (coalesce(col("t_overlap"), lit(0L))
          - coalesce(col("t_matched"), lit(0L))).as("t_confused"))
      .withColumn("t_missed",
        col("t_spk_ref") - col("t_matched") - col("t_confused"))
  }

  /** L165 — chrF (Popović 2015): character-n-gram F-β between the
    * whitespace-stripped ref/hyp strings, one output row per order
    * n = 1..maxN with exact integer counts and the F2 score as ONE
    * exact division — the (1+β²)PR/(β²P+R) form algebraically reduces
    * to (1+β²)·m / (β²·t_ref + t_hyp), so no intermediate P/R doubles
    * exist to accumulate error. The MT/ASR eval that is robust to
    * tokenization differences (it never tokenizes), next to BLEU/ROUGE
    * in the eval family. −1 when both gram sets are empty.
    *
    * Pure per-row HOFs (substr grams + the shared clipped-intersection
    * kernel) — zero shuffle.
    *
    * Output: (id, n, m, t_ref, t_hyp, chrf2) — one row per order.
    */
  def chrF(pairs: DataFrame, idCol: String, refCol: String,
      hypCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 6, s"maxN must be in 1..6, got $maxN")
    // bind each stripped string once (one-element-array let) so the
    // per-gram lambda never re-runs the concat per element
    def grams(words: org.apache.spark.sql.Column, n: Int) =
      element_at(transform(array(concat_ws("", words)), s =>
        when(length(s) >= n,
          transform(sequence(lit(0), length(s) - n),
            i => s.substr(i + 1, lit(n))))
          .otherwise(array().cast("array<string>"))), 1)
    val orders = (1 to maxN).map { n =>
      pairs.select(col(idCol), lit(n).as("n"),
          grams(col(refCol), n).as("__gr"), grams(col(hypCol), n).as("__gh"))
        .select(col(idCol), col("n"),
          clippedMatch(col("__gr"), col("__gh")).as("m"),
          size(col("__gr")).cast("long").as("t_ref"),
          size(col("__gh")).cast("long").as("t_hyp"))
    }
    orders.reduce(_ unionByName _)
      .withColumn("chrf2",
        when(col("t_ref") * 4L + col("t_hyp") > 0L,
          (col("m") * 5L).cast("double")
            / (col("t_ref") * 4L + col("t_hyp")).cast("double"))
          .otherwise(lit(-1d)))
  }

  /** L167 — SPEAKER-TURN STATISTICS over a diarized segment stream —
    * the conversation-shape QA a diarization rollout reads next to
    * DER: per file, segment/turn counts (a TURN is a maximal run of
    * consecutive same-speaker segments — the W2 sessionize-by-change
    * idiom), total speech time, distinct speakers, interruption count
    * (consecutive segments that OVERLAP with different speakers), and
    * mean turn length as the single exact division. All integer
    * microseconds.
    *
    * Scale shape: one hash shuffle on the file key for the
    * lag/cumsum windows, then one hash agg — per-file work linear in
    * its segment count.
    *
    * Output: (file, n_segments, n_turns, n_speakers, total_speech_us,
    * n_interruptions, mean_turn_us).
    */
  def speakerTurnStats(segments: DataFrame, fileCol: String,
      startCol: String, endCol: String, spkCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("f"))
      .orderBy(col("s"), col("e"), col("spk"))
    segments.select(col(fileCol).cast("long").as("f"),
        col(startCol).cast("long").as("s"), col(endCol).cast("long").as("e"),
        col(spkCol).cast("int").as("spk"))
      .withColumn("turn_break",
        when(lag(col("spk"), 1).over(w).isNull
          || lag(col("spk"), 1).over(w) =!= col("spk"), 1L).otherwise(0L))
      .withColumn("interrupt",
        when(lag(col("e"), 1).over(w) > col("s")
          && lag(col("spk"), 1).over(w) =!= col("spk"), 1L).otherwise(0L))
      .groupBy(col("f"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("turn_break")).as("n_turns"),
        countDistinct(col("spk")).as("n_speakers"),
        sum(col("e") - col("s")).as("total_speech_us"),
        sum(col("interrupt")).as("n_interruptions"))
      .select(col("f").as("file"), col("n_segments"), col("n_turns"),
        col("n_speakers"), col("total_speech_us"), col("n_interruptions"))
      .withColumn("mean_turn_us",
        when(col("n_turns") > 0L,
          col("total_speech_us").cast("double") / col("n_turns").cast("double"))
          .otherwise(lit(-1d)))
  }

  /** L163 — COHEN'S KAPPA (Cohen 1960), the chance-corrected
    * inter-annotator agreement every labeling/QA campaign reports:
    * κ = (p_o − p_e)/(1 − p_e) computed as the single exact-integer
    * division (n·agree − Σ_c n_a(c)·n_b(c)) / (n² − Σ_c n_a(c)·n_b(c))
    * — numerator and denominator are exact BIGINTs (n ≤ ~3·10⁹ rows
    * before n² leaves the long domain; far beyond any label-audit
    * slice), so no IEEE accumulation anywhere.
    *
    * Scale shape: two map-side-combined class histograms + one row
    * count, a class-keyed equi join (class cardinality-sized), and a
    * 1×1 broadcast combine. −1 when p_e = 1 (degenerate single-class).
    *
    * Output: one row (n, agree, pe_num, kappa).
    */
  def cohensKappa(labels: DataFrame, aCol: String, bCol: String): DataFrame = {
    val tot = labels.agg(count(lit(1)).as("n"),
      sum(when(col(aCol) === col(bCol), 1L).otherwise(0L)).as("agree"))
    val ca = labels.groupBy(col(aCol).as("c")).agg(count(lit(1)).as("na"))
    val cb = labels.groupBy(col(bCol).as("c")).agg(count(lit(1)).as("nb"))
    // classes used by only one annotator contribute 0 to p_e: inner join
    val pe = ca.join(cb, Seq("c"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("pe_num"))
    tot.crossJoin(broadcast(pe))
      .withColumn("kappa",
        when(col("n") * col("n") - col("pe_num") > 0L,
          (col("n") * col("agree") - col("pe_num")).cast("double")
            / (col("n") * col("n") - col("pe_num")).cast("double"))
          .otherwise(lit(-1d)))
  }

  /** L164 — PER-CLASS CONFUSION METRICS for a classifier audit
    * (precision/recall/F1 per class from exact tp/fp/fn counts) — the
    * derived-metric layer over a (actual, predicted) confusion table,
    * e.g. the engine's own language-ID against the corpus's ground-
    * truth lang column. Ratios are single divisions of exact longs,
    * −1 on zero denominators.
    *
    * Scale shape: one hash agg to the confusion table (class² rows at
    * most), then class-keyed outer joins — everything after the first
    * agg is class-cardinality-sized.
    *
    * Output: (class, tp, fp, fn, precision, recall, f1).
    */
  def confusionMetrics(df: DataFrame, actualCol: String,
      predCol: String): DataFrame = {
    val cm = df.groupBy(col(actualCol).as("a"), col(predCol).as("p"))
      .agg(count(lit(1)).as("n"))
    val byActual = cm.groupBy(col("a").as("class")).agg(sum(col("n")).as("n_actual"))
    val byPred = cm.groupBy(col("p").as("class")).agg(sum(col("n")).as("n_pred"))
    val diag = cm.filter(col("a") === col("p"))
      .select(col("a").as("class"), col("n").as("tp"))
    byActual.join(byPred, Seq("class"), "full_outer")
      .join(diag, Seq("class"), "left")
      .select(col("class"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("n_pred"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("n_actual"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0L,
          col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .otherwise(lit(-1d)))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0L,
          col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
          .otherwise(lit(-1d)))
      .withColumn("f1",
        when(col("tp") * 2L + col("fp") + col("fn") > 0L,
          (col("tp") * 2L).cast("double")
            / (col("tp") * 2L + col("fp") + col("fn")).cast("double"))
          .otherwise(lit(-1d)))
  }

  /** L191 — SPAN-LEVEL DETECTION PRECISION/RECALL at an IoU threshold —
    * the detection-grade companion to [[diarizationErrorRate]]'s time
    * accounting (the first question after a VAD/diarizer swap is "did
    * we find the speech regions at all", before DER prices the
    * boundaries): a hypothesis segment is a TRUE DETECTION iff some
    * same-file reference segment overlaps it with IoU ≥ τ, a reference
    * segment is COVERED iff some hypothesis segment does — no 1-1
    * matching (the detection-metric convention — deterministic and
    * join-expressible; assignment variants are order-dependent). IoU
    * compares CROSS-MULTIPLIED: inter·10⁶ ≥ τ_e6·union, exact longs,
    * no division. Spans are identified by their (start, end)
    * coordinates — exact duplicates collapse.
    *
    * Scale shape: one per-file interval equi join, two distinct-spans
    * aggs, a full-outer per-file total merge — per-file work bounded
    * by segment count, nothing cross-file. Files present in only one
    * stream still emit (the L158 FA-only posture): zero denominators
    * flag the ratio −1.
    *
    * Output: (file, n_ref, n_hyp, n_cov, n_det, precision, recall,
    * f1) with precision = n_det/n_hyp, recall = n_cov/n_ref, f1 =
    * 2·n_det·n_cov / (n_det·n_ref + n_cov·n_hyp).
    */
  def spanDetection(ref: DataFrame, hyp: DataFrame, fileCol: String,
      startCol: String, endCol: String, tauE6: Long): DataFrame = {
    require(tauE6 >= 0L && tauE6 <= 1000000L, s"tau_e6 in 0..1e6, got $tauE6")
    def norm(df: DataFrame, tag: String): DataFrame =
      df.select(col(fileCol).cast("long").as("f"),
        col(startCol).cast("long").as(s"s_$tag"),
        col(endCol).cast("long").as(s"e_$tag"))
    val r = norm(ref, "r")
    val h = norm(hyp, "h")
    val pairs = r.join(h, Seq("f"))
      .filter(col("s_r") < col("e_h") && col("s_h") < col("e_r"))
      .withColumn("__inter",
        least(col("e_r"), col("e_h")) - greatest(col("s_r"), col("s_h")))
      .withColumn("__union",
        col("e_r") - col("s_r") + col("e_h") - col("s_h") - col("__inter"))
      .filter(col("__inter") * 1000000L >= lit(tauE6) * col("__union"))
    val cov = pairs.select(col("f"), col("s_r"), col("e_r")).distinct()
      .groupBy(col("f")).agg(count(lit(1)).as("n_cov"))
    val det = pairs.select(col("f"), col("s_h"), col("e_h")).distinct()
      .groupBy(col("f")).agg(count(lit(1)).as("n_det"))
    val nr = r.groupBy(col("f")).agg(count(lit(1)).as("n_ref"))
    val nh = h.groupBy(col("f")).agg(count(lit(1)).as("n_hyp"))
    nr.join(nh, Seq("f"), "full_outer")
      .join(cov, Seq("f"), "left")
      .join(det, Seq("f"), "left")
      .select(col("f").as("file"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_hyp"), lit(0L)).as("n_hyp"),
        coalesce(col("n_cov"), lit(0L)).as("n_cov"),
        coalesce(col("n_det"), lit(0L)).as("n_det"))
      .withColumn("precision",
        when(col("n_hyp") > 0L,
          col("n_det").cast("double") / col("n_hyp").cast("double"))
          .otherwise(lit(-1d)))
      .withColumn("recall",
        when(col("n_ref") > 0L,
          col("n_cov").cast("double") / col("n_ref").cast("double"))
          .otherwise(lit(-1d)))
      .withColumn("f1",
        when(col("n_det") * col("n_ref") + col("n_cov") * col("n_hyp") > 0L,
          (col("n_det") * col("n_cov") * 2L).cast("double")
            / (col("n_det") * col("n_ref") + col("n_cov") * col("n_hyp"))
              .cast("double"))
          .otherwise(lit(-1d)))
  }

  /** L181 — CALIBRATION BINS / ECE COMPONENTS (Naeini 2015, Guo 2017):
    * the reliability-diagram table behind Expected Calibration Error —
    * what a quality-classifier rollout reads before trusting its
    * scores as probabilities (DSIR/FineWeb-style gates assume
    * calibrated scores; an over-confident classifier silently skews
    * the mixture). Scores arrive e6-scaled (0..10⁶); equal-width bins
    * by integer division (the last bin closed at 10⁶), per bin the
    * exact integer triple (n, Σ confidence_e6, #positives) plus
    * gap_e6_num = |Σconf − n_pos·10⁶| — the UNNORMALIZED per-bin ECE
    * numerator, exact; ECE itself is Σ gap/(N·10⁶), left to the reader
    * as it mixes bins. conf/acc are single divisions of exact longs.
    *
    * Scale shape: one map-side-combined hash agg to ≤ nBins rows —
    * nothing else.
    *
    * CONTRACT (loud): scores must already be e6-scaled probabilities
    * in 0..10⁶ — a negative score or one above 10⁶ is a caller bug
    * (it would mint a phantom bin or silently clamp conf above 1.0),
    * so it raises instead of flowing into the reliability table; null
    * scores/labels raise for the same reason.
    *
    * Output: (bin, n, sum_conf_e6, n_pos, gap_e6_num, conf, acc).
    */
  def calibrationBins(df: DataFrame, scoreE6Col: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column, nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && 1000000 % nBins == 0,
      s"nBins must divide 1e6 exactly, got $nBins")
    val width = 1000000L / nBins
    df.select(scoreE6Col.cast("long").as("s"), labelCol.cast("long").as("y"))
      .withColumn("s",
        when(col("s").isNull || col("s") < 0L || col("s") > 1000000L,
          raise_error(concat(
            lit("calibrationBins: score_e6 outside 0..1000000: "),
            coalesce(col("s").cast("string"), lit("null")))).cast("long"))
          .otherwise(col("s")))
      .withColumn("y",
        when(col("y").isNull || col("y") < 0L || col("y") > 1L,
          raise_error(concat(lit("calibrationBins: label outside 0..1: "),
            coalesce(col("y").cast("string"), lit("null")))).cast("long"))
          .otherwise(col("y")))
      .withColumn("bin", least(expr(s"s div ${width}L"), lit(nBins - 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("sum_conf_e6"),
        sum(col("y")).as("n_pos"))
      .withColumn("gap_e6_num",
        abs(col("sum_conf_e6") - col("n_pos") * 1000000L))
      .withColumn("conf",
        col("sum_conf_e6").cast("double") / (col("n") * 1000000L).cast("double"))
      .withColumn("acc", col("n_pos").cast("double") / col("n").cast("double"))
  }

  /** L210 — FLEISS' KAPPA (multi-rater chance-corrected agreement):
    * the n-rater generalization of Cohen's (L163) — the number a
    * labeling campaign reads before trusting its rubric (pairwise
    * Cohen's on n raters overweights shared raters). Requires the
    * SAME rater count per item (Fleiss' precondition) — enforced
    * loudly up front. All components exact e6-floored integers (the
    * L154 share discipline): per-item agreement P_i = (Σ_k n_ik² − n)
    * / (n(n−1)), chance agreement from squared category shares; kappa
    * itself one double division of the two e6 integers.
    *
    * Scale shape: one (item, category) map-side-combined count, one
    * item rollup, one category rollup — nothing pairwise in raters.
    *
    * Output: one row (n_items, n_raters, p_bar_e6, p_e_e6, kappa).
    */
  def fleissKappa(ratings: DataFrame, itemCol: String,
      catCol: String): DataFrame = {
    val r = ratings.select(col(itemCol).as("item"), col(catCol).as("cat"))
    val perItem = r.groupBy(col("item")).agg(count(lit(1)).as("nr"))
    val minMax = perItem.agg(min(col("nr")), max(col("nr")), count(lit(1)))
      .head
    val (nLo, nHi, nItems) =
      (minMax.getLong(0), minMax.getLong(1), minMax.getLong(2))
    require(nLo == nHi,
      s"fleissKappa: rater count varies across items ($nLo..$nHi) — " +
        "Fleiss requires a constant panel size")
    require(nLo >= 2L, s"fleissKappa: need >= 2 raters, got $nLo")
    val n = nLo
    val ic = r.groupBy(col("item"), col("cat")).agg(count(lit(1)).as("nik"))
    val pBar = ic.groupBy(col("item"))
      .agg(sum(col("nik") * col("nik")).as("ssq"))
      .select(expr(s"((ssq - ${n}L) * 1000000L) div ${n * (n - 1)}L")
        .as("p_i_e6"))
      .agg(expr(s"sum(p_i_e6) div ${nItems}L").as("p_bar_e6"))
    val pE = ic.groupBy(col("cat")).agg(sum(col("nik")).as("ck"))
      .select(expr(s"(ck * 1000000L) div ${nItems * n}L").as("share_e6"))
      .agg(expr("sum(share_e6 * share_e6) div 1000000L").as("p_e_e6"))
    pBar.crossJoin(pE)
      .select(lit(nItems).as("n_items"), lit(n).as("n_raters"),
        col("p_bar_e6"), col("p_e_e6"),
        when(lit(1000000L) - col("p_e_e6") > 0L,
          (col("p_bar_e6") - col("p_e_e6")).cast("double")
            / (lit(1000000L) - col("p_e_e6")).cast("double"))
          .otherwise(lit(-1d)).as("kappa"))
  }

  /** L212 — BRIER SCORE with the MURPHY DECOMPOSITION: the proper
    * scoring rule companion to the L181 reliability bins and L184 AUC
    * — mean squared error of the e6 probability against the 0/1 label,
    * split into REL (calibration gap, what recalibration can fix) −
    * RES (resolution, what the model actually knows) + UNC (base-rate
    * entropy, the floor nothing can beat). Bin means are e6-floored
    * integers (documented: the decomposition is over the BINNED
    * forecaster, the standard practice), every component an exact
    * integer after that floor; squares bounded by n·10¹² so nothing
    * overflows at any corpus size that fits a partition count.
    *
    * Scale shape: one pass for the global sums + one ≤ nBins hash agg
    * — the m_ece shape.
    *
    * Output: one row (n, brier_e12, ybar_e6, rel_e12, res_e12,
    * unc_e12).
    */
  def brierDecomposition(df: DataFrame,
      scoreE6Col: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column, nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && 1000000 % nBins == 0,
      s"nBins must divide 1e6 exactly, got $nBins")
    val width = 1000000L / nBins
    val base = df.select(scoreE6Col.cast("long").as("s"),
        labelCol.cast("long").as("y"))
      .withColumn("s",
        when(col("s").isNull || col("s") < 0L || col("s") > 1000000L,
          raise_error(concat(
            lit("brierDecomposition: score_e6 outside 0..1000000: "),
            coalesce(col("s").cast("string"), lit("null")))).cast("long"))
          .otherwise(col("s")))
      .withColumn("bin", least(expr(s"s div ${width}L"), lit(nBins - 1L)))
    val tot = base.agg(count(lit(1)).as("n"), sum(col("y")).as("sum_y"),
      sum(expr("(s - y * 1000000L) * (s - y * 1000000L)")).as("ssq"))
    val bins = base.groupBy(col("bin"))
      .agg(count(lit(1)).as("nk"), sum(col("s")).as("sp"),
        sum(col("y")).as("sy"))
    val comps = bins.crossJoin(broadcast(tot))
      .withColumn("ybar_e6", expr("(sum_y * 1000000L) div n"))
      .withColumn("pbar_k", expr("sp div nk"))
      .withColumn("ybar_k", expr("(sy * 1000000L) div nk"))
      .agg(first(col("n")).as("n"), first(col("ssq")).as("ssq"),
        first(col("ybar_e6")).as("ybar_e6"),
        sum(expr("nk * (pbar_k - ybar_k) * (pbar_k - ybar_k)")).as("reln"),
        sum(expr("nk * (ybar_k - ybar_e6) * (ybar_k - ybar_e6)")).as("resn"))
    comps.select(col("n"),
      expr("ssq div n").as("brier_e12"),
      col("ybar_e6"),
      expr("reln div n").as("rel_e12"),
      expr("resn div n").as("res_e12"),
      expr("ybar_e6 * (1000000L - ybar_e6)").as("unc_e12"))
  }

  /** L211 — SPLIT-CONFORMAL CALIBRATION THRESHOLD + COVERAGE AUDIT:
    * per group the ⌈(n+1)(1−α)⌉-th smallest calibration score — the
    * distribution-free threshold with the finite-sample guarantee
    * P(test score ≤ q̂) ≥ 1−α (Vovk; the gate an LLM-scoring pipeline
    * uses to turn raw scores into "accept with 90% coverage") — and
    * the empirical coverage of that threshold on a held-out test
    * split, so the guarantee is AUDITED, not assumed. α = num/den as
    * exact integers; the order statistic's VALUE is deterministic
    * under ties regardless of tie order. k > n (too little
    * calibration data) flags −1 loudly.
    *
    * Scale shape: one per-group rank window over the calibration
    * split + one broadcast threshold join for the coverage count.
    *
    * Output: (group, n_cal, k, qhat_e6, n_test, n_covered,
    * coverage_e6).
    */
  def conformalAudit(cal: DataFrame, test: DataFrame, grpCol: String,
      scoreE6Col: String, alphaNum: Int, alphaDen: Int): DataFrame = {
    require(alphaDen >= 2 && alphaNum >= 1 && alphaNum < alphaDen,
      s"need 1 <= alphaNum < alphaDen, got $alphaNum/$alphaDen")
    import org.apache.spark.sql.expressions.Window
    val cov = alphaDen - alphaNum // (den-num)/den = 1 - alpha
    val c = cal.select(col(grpCol).as("grp"),
      col(scoreE6Col).cast("long").as("s"))
    val w = Window.partitionBy(col("grp")).orderBy(col("s"))
    val ranked = c
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n_cal", count(lit(1)).over(
        Window.partitionBy(col("grp"))).cast("long"))
      .withColumn("k", expr(s"((n_cal + 1L) * ${cov}L + ${alphaDen - 1}L) div ${alphaDen}L"))
    val qhat = ranked.filter(col("rn") === col("k"))
      .select(col("grp"), col("n_cal"), col("k"), col("s").as("qhat_e6"))
      .unionByName(
        // k > n: no qualifying row — surface the group loudly
        ranked.filter(col("k") > col("n_cal")).filter(col("rn") === 1L)
          .select(col("grp"), col("n_cal"), col("k"),
            lit(-1L).as("qhat_e6")))
    val t = test.select(col(grpCol).as("grp"),
      col(scoreE6Col).cast("long").as("s"))
    val tc = t.join(qhat.select(col("grp"), col("qhat_e6")), Seq("grp"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("qhat_e6") >= 0L && col("s") <= col("qhat_e6"), 1L)
          .otherwise(0L)).as("n_covered"))
    qhat.join(tc, Seq("grp"), "left")
      .select(col("grp").as("group"), col("n_cal"), col("k"),
        col("qhat_e6"),
        coalesce(col("n_test"), lit(0L)).as("n_test"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"))
      .withColumn("coverage_e6",
        expr("IF(n_test > 0L AND qhat_e6 >= 0L, (n_covered * 1000000L) div n_test, -1L)"))
  }

  /** L182 — EQUAL-ERROR-RATE BRACKET for verification trial scores —
    * the operating point the M6 speaker-verification stage is tuned
    * to: sweep the accept threshold over the DISTINCT trial scores
    * (plus the accept-nothing sentinel max+1, so a crossing always
    * exists); at threshold t the false accepts are non-targets with
    * score ≥ t (monotone non-increasing) and the false rejects targets
    * with score < t (non-decreasing); EER lies where they cross. Since
    * the curves are step functions the exact answer is a BRACKET: the
    * first threshold with FA ≤ FR and its predecessor, all counts
    * exact integers, rates e6-scaled single divisions.
    *
    * Scale shape: one hash agg to the distinct-score table, then
    * windows over it — DOMAIN-BOUNDED (distinct e6 scores ≤ 10⁶+1
    * rows; the quantile-norm single-partition posture, documented
    * tradeoff for exact rank semantics).
    *
    * Output: one row (n_target, n_nontarget, thr_lo, fa_lo, fr_lo,
    * thr_hi, fa_hi, fr_hi) — lo = last threshold with FA > FR (−1s
    * when the crossing is at the lowest threshold), hi = first with
    * FA ≤ FR.
    */
  def eerBracket(df: DataFrame, scoreE6Col: org.apache.spark.sql.Column,
      targetCol: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val t = df.select(scoreE6Col.cast("long").as("s"),
      targetCol.cast("long").as("y"))
    val per = t.groupBy(col("s"))
      .agg(sum(col("y")).as("tar"), sum(lit(1L) - col("y")).as("non"))
    val sentinel = per.agg(max(col("s")).as("s"))
      .select((col("s") + 1L).as("s"), lit(0L).as("tar"), lit(0L).as("non"))
    val all = per.unionByName(sentinel)
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = t.agg(sum(col("y")).as("n_target"),
      sum(lit(1L) - col("y")).as("n_nontarget"))
    val curves = all.crossJoin(broadcast(tot))
      .withColumn("fr", coalesce(sum(col("tar")).over(w), lit(0L)))
      .withColumn("fa",
        col("n_nontarget") - coalesce(sum(col("non")).over(w), lit(0L)))
    val lagW = Window.orderBy(col("s"))
    val bracket = curves
      .withColumn("thr_lo", lag(col("s"), 1).over(lagW))
      .withColumn("fa_lo", lag(col("fa"), 1).over(lagW))
      .withColumn("fr_lo", lag(col("fr"), 1).over(lagW))
      .filter(col("fa") <= col("fr"))
      .orderBy(col("s")).limit(1)
    bracket.select(col("n_target"), col("n_nontarget"),
      coalesce(col("thr_lo"), lit(-1L)).as("thr_lo"),
      coalesce(col("fa_lo"), lit(-1L)).as("fa_lo"),
      coalesce(col("fr_lo"), lit(-1L)).as("fr_lo"),
      col("s").as("thr_hi"), col("fa").as("fa_hi"), col("fr").as("fr_hi"))
  }

  /** L184 — EXACT ROC-AUC over verification/classifier trial scores —
    * the threshold-free companion to the L182 EER bracket: AUC =
    * P(target score > non-target score) + ½·P(equal), computed EXACTLY
    * as the Mann–Whitney U statistic over the distinct-score
    * histogram: 2·U = Σ_s tar_s · (2·non_below(s) + non_s) — every
    * term an exact long (ties counted once, hence the 2× numerator) —
    * and AUC the single division 2U / (2·n_t·n_n). No sampling, no
    * trapezoid approximation: the step-ROC's area is this sum.
    *
    * Scale shape: one hash agg to the distinct-score table, one
    * cumsum window over it (domain-bounded: ≤ 10⁶+1 e6-score rows —
    * the L182/quantile-norm posture), one 1-row broadcast combine.
    *
    * Output: one row (n_target, n_nontarget, auc_num2, auc) — auc −1
    * when either class is empty (undefined, loud).
    */
  def rocAuc(df: DataFrame, scoreE6Col: org.apache.spark.sql.Column,
      targetCol: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = df.select(scoreE6Col.cast("long").as("s"),
      targetCol.cast("long").as("y"))
    val per = t.groupBy(col("s"))
      .agg(sum(col("y")).as("tar"), sum(lit(1L) - col("y")).as("non"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = t.agg(sum(col("y")).as("n_target"),
      sum(lit(1L) - col("y")).as("n_nontarget"))
    per
      .withColumn("nb", coalesce(sum(col("non")).over(w), lit(0L)))
      .agg(sum(col("tar") * (col("nb") * 2L + col("non"))).as("auc_num2"))
      .crossJoin(broadcast(tot))
      .select(col("n_target"), col("n_nontarget"),
        coalesce(col("auc_num2"), lit(0L)).as("auc_num2"))
      .withColumn("auc",
        when(col("n_target") > 0L && col("n_nontarget") > 0L,
          col("auc_num2").cast("double")
            / (col("n_target") * col("n_nontarget") * 2L).cast("double"))
          .otherwise(lit(-1d)))
  }

  /** L159 — ROUGE-N OVERLAP (Lin 2004) between reference and
    * hypothesis token arrays: clipped n-gram multiset intersection —
    * for each distinct ref n-gram, min(count in ref, count in hyp) —
    * with recall = matched/ref-grams, precision = matched/hyp-grams,
    * F1 = 2·m/(r+h). The summarization/ASR-adjacent eval every
    * generation-stage change reports, next to [[TextOps.wordErrorRate]]
    * in the eval family and fed by the same L156 utterance chunker
    * (bounded token counts keep the per-row O(d·(|r|+|h|)) scan flat).
    *
    * Pure per-row HOFs — zero shuffle; counts are exact integers, the
    * three ratios single divisions (−1 when the denominator is 0, the
    * loud-flag posture).
    *
    * Output: (id, n_ref_grams, n_hyp_grams, n_match, rouge_r, rouge_p,
    * rouge_f).
    */
  def rougeN(pairs: DataFrame, idCol: String, refCol: String,
      hypCol: String, n: Int): DataFrame = {
    require(n >= 1 && n <= 4, s"n must be in 1..4, got $n")
    val gr = TextOps.shingles(col(refCol), n)
    val gh = TextOps.shingles(col(hypCol), n)
    pairs
      .withColumn("__gr", gr).withColumn("__gh", gh)
      .withColumn("__match", clippedMatch(col("__gr"), col("__gh")))
      .select(col(idCol),
        size(col("__gr")).cast("long").as("n_ref_grams"),
        size(col("__gh")).cast("long").as("n_hyp_grams"),
        col("__match").as("n_match"))
      .withColumn("rouge_r",
        when(col("n_ref_grams") > 0L,
          col("n_match").cast("double") / col("n_ref_grams").cast("double"))
          .otherwise(lit(-1d)))
      .withColumn("rouge_p",
        when(col("n_hyp_grams") > 0L,
          col("n_match").cast("double") / col("n_hyp_grams").cast("double"))
          .otherwise(lit(-1d)))
      .withColumn("rouge_f",
        when(col("n_ref_grams") + col("n_hyp_grams") > 0L,
          (col("n_match") * 2L).cast("double")
            / (col("n_ref_grams") + col("n_hyp_grams")).cast("double"))
          .otherwise(lit(-1d)))
  }

  /** L215 — KRIPPENDORFF'S ALPHA (nominal data): the chance-corrected
    * agreement coefficient that tolerates VARYING rater counts and
    * missing ratings — the case Fleiss' kappa (L210) rejects loudly.
    * A real labeling campaign is never a constant panel: raters drop
    * items, overflow pools rotate — this is the number it reports.
    *
    * Exact arithmetic (Krippendorff 2011, the coincidence-matrix
    * formulation): items with fewer than 2 ratings are unpairable and
    * excluded (counted in `n_dropped`); per pairable item u with m_u
    * ratings and per-category counts n_uc, the pairwise disagreement
    * mass is A_u = Σ_c n_uc·(m_u − n_uc), and the item contributes
    * A_u/(m_u − 1) to the observed disagreement — e6-FLOORED per item
    * (the L210 P_i discipline; the floor is the documented
    * quantization, identical in both engines). Expected disagreement
    * is exact from the marginals: De = (n² − Σ_c n_c²)/(n(n−1)) with
    * n = Σ m_u, again e6-floored once. alpha = (de − do)/de, one
    * double division. Components bounded by n²·10⁶ — exact in longs
    * for n up to ~3·10⁶ ratings per invocation (document scope: this
    * is a per-campaign metric, not a per-corpus scan).
    *
    * Scale shape: one (item, category) map-side-combined count, one
    * item rollup, one category rollup — nothing pairwise in raters,
    * the L210 shape.
    *
    * Output: one row (n_items, n_dropped, n_values, do_e6, de_e6,
    * alpha); alpha −2 when De = 0 (all ratings one category).
    */
  def krippendorffAlpha(ratings: DataFrame, itemCol: String,
      catCol: String): DataFrame = {
    val r = ratings.select(col(itemCol).as("item"), col(catCol).as("cat"))
    val ic = r.groupBy(col("item"), col("cat")).agg(count(lit(1)).as("nuc"))
    val perItem = ic.groupBy(col("item"))
      .agg(sum(col("nuc")).as("mu"),
        sum(col("nuc") * col("nuc")).as("ssq"))
    val pairable = perItem.filter(col("mu") >= 2L)
    val dropped = perItem.filter(col("mu") < 2L)
      .agg(count(lit(1)).as("n_dropped"))
    // A_u = Σ n_uc(m_u − n_uc) = m_u² − Σ n_uc²; floor per item at e6
    val doAgg = pairable
      .select(col("mu"),
        expr("((mu * mu - ssq) * 1000000L) div (mu - 1L)").as("contrib_e6"))
      .agg(count(lit(1)).as("n_items"), sum(col("mu")).as("n"),
        sum(col("contrib_e6")).as("p_e6"))
      .select(col("n_items"), col("n"),
        expr("IF(n > 0L, p_e6 div n, 0L)").as("do_e6"))
    // marginals over pairable items only (the coincidence matrix)
    val marg = ic.join(pairable.select(col("item")), Seq("item"))
      .groupBy(col("cat")).agg(sum(col("nuc")).as("nc"))
    val deAgg = marg.agg(count(lit(1)).as("n_values"),
      sum(col("nc")).as("n2"), sum(col("nc") * col("nc")).as("sc2"))
    doAgg.crossJoin(broadcast(deAgg)).crossJoin(broadcast(dropped))
      .select(col("n_items"), col("n_dropped"), col("n_values"),
        col("do_e6"),
        expr("IF(n > 1L, ((n * n - sc2) * 1000000L) div (n * (n - 1L)), 0L)")
          .as("de_e6"))
      .withColumn("alpha",
        when(col("de_e6") > 0L,
          (col("de_e6") - col("do_e6")).cast("double")
            / col("de_e6").cast("double"))
          .otherwise(lit(-2d)))
  }

  /** L216 — McNEMAR'S TEST for PAIRED classifiers: two models scored
    * on the SAME items (the A/B the curation stack runs before
    * swapping a quality filter or langid model) — accuracy deltas
    * alone mislead when the models err on different items; the test
    * statistic reads only the DISCORDANT cells. chisq =
    * (b − c)²/(b + c) with b = only-A-correct, c = only-B-correct
    * counts (the continuity-uncorrected form, documented); exact
    * integer numerator, one double division; b + c = 0 → −1 flag.
    *
    * Scale shape: one map-side-combined 2×2 count — a single agg.
    *
    * Output: one row (n, n_both, n_only_a, n_only_b, n_neither,
    * chisq_num, chisq).
    */
  /** Loud integral-value gate shared by the rank/distribution stats
    * (spearmanRho, ksTest, wilcoxonSignedRank): they operate on an
    * integer domain (e6 fixed-point scores, counts, ranks) and a
    * silent long cast would quantize a caller's fractional signal and
    * collapse ties — raise_error on null or non-integral input
    * instead (the calibrationBins posture). Callers with double
    * scores scale to e6 first.
    */
  private def integralChecked(c: org.apache.spark.sql.Column,
      op: String): org.apache.spark.sql.Column =
    when(c.isNull || c.cast("double") =!= c.cast("long").cast("double"),
      raise_error(concat(lit(s"$op: null or non-integral value: "),
        coalesce(c.cast("string"), lit("null")))).cast("long"))
      .otherwise(c.cast("long"))

  /** Loud boolean gate for the paired 2×2 stats (mcnemar, mcc): a
    * null boolean-cast input would count in n but fall into none of
    * the four cells, silently breaking the table-sums-to-n invariant.
    */
  private def boolChecked(c: org.apache.spark.sql.Column,
      op: String): org.apache.spark.sql.Column =
    when(c.isNull,
      raise_error(lit(s"$op: null or non-boolean input")).cast("boolean"))
      .otherwise(c)

  def mcnemar(df: DataFrame, aCorrectCol: String,
      bCorrectCol: String): DataFrame =
    df.select(boolChecked(col(aCorrectCol).cast("boolean"), "mcnemar").as("a"),
        boolChecked(col(bCorrectCol).cast("boolean"), "mcnemar").as("b"))
      .agg(count(lit(1)).as("n"),
        // coalesce: an empty input reads as an all-zero table, not nulls
        coalesce(sum(when(col("a") && col("b"), 1L).otherwise(0L)), lit(0L))
          .as("n_both"),
        coalesce(sum(when(col("a") && !col("b"), 1L).otherwise(0L)), lit(0L))
          .as("n_only_a"),
        coalesce(sum(when(!col("a") && col("b"), 1L).otherwise(0L)), lit(0L))
          .as("n_only_b"),
        coalesce(sum(when(!col("a") && !col("b"), 1L).otherwise(0L)), lit(0L))
          .as("n_neither"))
      .withColumn("chisq_num",
        (col("n_only_a") - col("n_only_b"))
          * (col("n_only_a") - col("n_only_b")))
      .withColumn("chisq",
        when(col("n_only_a") + col("n_only_b") > 0L,
          col("chisq_num").cast("double")
            / (col("n_only_a") + col("n_only_b")).cast("double"))
          .otherwise(lit(-1d)))

  /** L217 — SPEARMAN RANK CORRELATION with exact average-rank ties:
    * the monotone-agreement check between two scoring signals — the
    * question "does my cheap quality score rank documents the way the
    * expensive one does" answered before swapping filters at 100 TB.
    *
    * Exactness: average ranks are the only fractional quantity and
    * they are halves, so DOUBLED ranks r2 = 2·rank_min + tie_size − 1
    * are exact integers; Pearson over the doubled ranks equals
    * Pearson over the ranks (scale-invariant). num = n·Σxy − Σx·Σy
    * and the two variance terms are exact BIGINTs (bounded by 4n⁴ —
    * exact in longs to n ≈ 40k rows per invocation, documented); rho
    * = num / (√dx·√dy) — IEEE sqrt is correctly rounded, so both
    * engines produce the identical double.
    *
    * Scale shape: two rank windows + one global agg. The rank windows
    * shuffle once each on the score column — for a corpus-wide run,
    * sample first (the documented use is validating one signal
    * against another, which a deterministic hash-sample of 10⁴ rows
    * answers).
    *
    * Output: one row (n, num, dx, dy, rho); rho −2 when either
    * variance is 0 (a constant signal).
    */
  def spearmanRho(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def r2(c: String) = {
      val wv = Window.partitionBy(col(c))
      val wo = Window.orderBy(col(c))
      rank().over(wo).cast("long") * 2L + count(lit(1)).over(wv) - 1L
    }
    df.select(integralChecked(col(xCol), "spearmanRho").as("xv"),
        integralChecked(col(yCol), "spearmanRho").as("yv"))
      .select(r2("xv").as("x"), r2("yv").as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("dx"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("dy"))
      .withColumn("rho",
        when(col("dx") > 0L && col("dy") > 0L,
          col("num").cast("double")
            / (sqrt(col("dx").cast("double")) * sqrt(col("dy").cast("double"))))
          .otherwise(lit(-2d)))
  }

  /** L229 — TWO-SAMPLE KOLMOGOROV–SMIRNOV STATISTIC, exact: D =
    * max_v |F_a(v) − F_b(v)| over the merged value domain — the
    * distribution-drift test that reads the WHOLE shape where CUSUM
    * (L89) reads the mean and the quantile sketch (L45) fixed points.
    * The number a feed audit reports when "same mean, different
    * distribution" is the failure mode (a quality-score distribution
    * silently bimodalizing).
    *
    * Exactness: with integer values, D·n_a·n_b = max over distinct
    * values of |n_b·cumcount_a − n_a·cumcount_b| is an exact BIGINT;
    * D itself one double division. Step functions only change at
    * sample points, so scanning distinct values is exact, not a grid
    * approximation.
    *
    * Scale shape: one hash agg to the distinct-value table, then one
    * ordered window over it — DOMAIN-BOUNDED (distinct values, the
    * EER/quantile-norm single-partition posture; integer-valued
    * scores make this ≤ value-range rows, documented tradeoff for
    * exact sup semantics).
    *
    * Output: one row (n_a, n_b, d_num, ks); either side empty → −1.
    */
  def ksTest(a: DataFrame, b: DataFrame, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val merged = a.select(integralChecked(col(valCol), "ksTest").as("v"))
      .withColumn("__ca", lit(1L)).withColumn("__cb", lit(0L))
      .unionByName(b.select(integralChecked(col(valCol), "ksTest").as("v"))
        .withColumn("__ca", lit(0L)).withColumn("__cb", lit(1L)))
      .groupBy(col("v"))
      .agg(sum(col("__ca")).as("na_v"), sum(col("__cb")).as("nb_v"))
    val tot = merged.agg(coalesce(sum(col("na_v")), lit(0L)).as("n_a"),
      coalesce(sum(col("nb_v")), lit(0L)).as("n_b"))
    val w = Window.orderBy(col("v"))
    merged
      .withColumn("ca", sum(col("na_v")).over(w))
      .withColumn("cb", sum(col("nb_v")).over(w))
      .crossJoin(broadcast(tot))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        max(abs(col("n_b") * col("ca") - col("n_a") * col("cb")))
          .as("d_num"))
      .select(coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("d_num"), lit(0L)).as("d_num"))
      .withColumn("ks",
        when(col("n_a") > 0L && col("n_b") > 0L,
          col("d_num").cast("double")
            / (col("n_a") * col("n_b")).cast("double"))
          .otherwise(lit(-1d)))
  }

  /** L258 — MANN–WHITNEY U (two-sample rank-sum test), exact ties: the
    * UNPAIRED sibling of the Wilcoxon signed-rank (L243) — "are scores
    * from source A stochastically larger than source B" when the rows
    * are different documents, not before/after pairs (the usual shape
    * of a between-source quality comparison; the KS test L229 reads
    * distribution SHAPE, U reads stochastic dominance).
    *
    * Exactness: doubled average ranks over the merged per-value count
    * table are exact integers (the L217/L243 discipline), so
    * `u_a_2x = R_a·2 − n_a(n_a+1)` and the tie term T = Σ(t³−t) are
    * exact BIGINTs. The normal-approximation z uses
    * σ² = n_a·n_b·(N³−N−T)/(12·N(N−1)), folded to
    * z = d / sqrt(var_num/var_den) with d = 2(U−μ) = u_a_2x − n_a·n_b,
    * var_num = n_a·n_b·(N³−N−T), var_den = 3N(N−1) — a fixed
    * three-op IEEE sequence both engines evaluate identically.
    * var_num ≤ N⁵/4 bounds exact longs to N ≈ 8k rows per invocation
    * (documented: rank tests run on deterministic samples or
    * per-shard, the L217 posture).
    *
    * Scale shape: one hash agg to the distinct-value table, one
    * ordered window over it (DOMAIN-BOUNDED, the ksTest posture), one
    * global agg.
    *
    * Output: one row (n_a, n_b, u_a_2x, tie_term, d, var_num, var_den,
    * z); degenerate inputs flag z = −99.
    */
  def mannWhitneyU(a: DataFrame, b: DataFrame, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = a.select(integralChecked(col(valCol), "mannWhitneyU").as("v"))
      .withColumn("__ca", lit(1L)).withColumn("__cb", lit(0L))
      .unionByName(b.select(
          integralChecked(col(valCol), "mannWhitneyU").as("v"))
        .withColumn("__ca", lit(0L)).withColumn("__cb", lit(1L)))
      .groupBy(col("v"))
      .agg(sum(col("__ca")).as("na_v"), sum(col("__cb")).as("nb_v"))
      .withColumn("t", col("na_v") + col("nb_v"))
    val w = Window.orderBy(col("v"))
    counts
      // doubled average rank of value v: 2·(cum-before) + t + 1
      .withColumn("r2", (sum(col("t")).over(w) - col("t")) * 2L
        + col("t") + 1L)
      .agg(coalesce(sum(col("na_v")), lit(0L)).as("n_a"),
        coalesce(sum(col("nb_v")), lit(0L)).as("n_b"),
        coalesce(sum(col("na_v") * col("r2")), lit(0L)).as("ra_2x"),
        coalesce(sum(col("t") * col("t") * col("t") - col("t")), lit(0L))
          .as("tie_term"))
      .withColumn("n", col("n_a") + col("n_b"))
      .withColumn("u_a_2x",
        col("ra_2x") - col("n_a") * (col("n_a") + 1L))
      .withColumn("d", col("u_a_2x") - col("n_a") * col("n_b"))
      .withColumn("var_num", col("n_a") * col("n_b")
        * (col("n") * col("n") * col("n") - col("n") - col("tie_term")))
      .withColumn("var_den", lit(3L) * col("n") * (col("n") - 1L))
      .withColumn("z",
        when(col("var_num") > 0L,
          col("d").cast("double")
            / sqrt(col("var_num").cast("double")
              / col("var_den").cast("double")))
          .otherwise(lit(-99d)))
      .select(col("n_a"), col("n_b"), col("u_a_2x"), col("tie_term"),
        col("d"), col("var_num"), col("var_den"), col("z"))
  }

  /** L259 — CHI-SQUARE TEST OF INDEPENDENCE + CRAMÉR'S V over two
    * categorical columns: "is document source independent of language"
    * (or event type of daypart) — the effect-size read a corpus
    * balance audit reports next to the raw contingency table; χ²
    * alone grows with n, V = sqrt(χ²/(n·min(r−1,c−1))) is the
    * comparable 0..1 number.
    *
    * Exactness: per-cell terms (n·o_ij − r_i·c_j)²·10⁶ div (n·r_i·c_j)
    * in DECIMAL(38,0) (HUGEINT in the mirror — (n·o)² can pass 2⁶³),
    * e6-floored per cell (the L154 share discipline), summed exactly;
    * V = sqrt of the single quotient of two exact integers.
    *
    * Scale shape: one (a, b) map-side-combined count, two broadcast
    * marginal rollups — nothing pairwise in rows.
    *
    * Output: one row (n, n_rows_a, n_cols_b, chisq_e6, v); degenerate
    * (single row/col) flags v = −1.
    */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val ct = df.select(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
    val aSide = ct.groupBy(col("a")).agg(sum(col("o")).as("r_i"))
    val bSide = ct.groupBy(col("b")).agg(sum(col("o")).as("c_j"))
    val tot = ct.agg(sum(col("o")).as("n"),
      countDistinct(col("a")).as("n_rows_a"),
      countDistinct(col("b")).as("n_cols_b"))
    // the FULL r×c grid, not just observed cells: a zero cell still
    // contributes (r_i·c_j)²/(n·r_i·c_j) to chi-square
    aSide.crossJoin(broadcast(bSide))
      .join(ct, Seq("a", "b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("n"), col("n_rows_a"), col("n_cols_b"),
        ((col("n").cast(dec) * col("o").cast(dec)
          - col("r_i").cast(dec) * col("c_j").cast(dec)).as("dev")),
        (col("n").cast(dec) * col("r_i").cast(dec) * col("c_j").cast(dec))
          .as("den"))
      .select(col("n"), col("n_rows_a"), col("n_cols_b"),
        // IntegralDivide on decimals yields BIGINT; each term is
        // ≤ n·10⁶, safely in range
        expr("(dev * dev * 1000000) div den").as("term_e6"))
      .groupBy(col("n"), col("n_rows_a"), col("n_cols_b"))
      .agg(sum(col("term_e6")).as("chisq_e6"))
      .withColumn("k",
        least(col("n_rows_a") - 1L, col("n_cols_b") - 1L))
      .withColumn("v",
        when(col("k") > 0L && col("n") > 0L,
          sqrt(col("chisq_e6").cast("double")
            / (col("n") * col("k") * 1000000L).cast("double")))
          .otherwise(lit(-1d)))
      .select(col("n"), col("n_rows_a"), col("n_cols_b"),
        col("chisq_e6"), col("v"))
  }

  /** L266 — KENDALL'S TAU-B (pair-concordance rank correlation), exact
    * ties: the third rank-correlation read next to Spearman (L217) and
    * Mann–Whitney (L258) — tau counts concordant vs discordant PAIRS,
    * which makes it the robust choice when the signal is ordinal with
    * heavy ties (quality buckets, star ratings). tau_b corrects both
    * margins: (C − D) / sqrt((C+D+T_y)·(C+D+T_x)) with T_x/T_y the
    * pairs tied ONLY in that variable.
    *
    * Exactness: every pair falls in exactly one of five integer
    * buckets (C, D, tie-x-only, tie-y-only, tie-both) by pure sign
    * comparisons — NO arithmetic on the values, so magnitudes never
    * overflow; tau is num / sqrt of the product of two exact counts
    * (≤ (n²/2)², exact in longs to n ≈ 85k — far past the documented
    * sample bound).
    *
    * Scale shape: an O(n²) pair self-join BY CONTRACT — exact tau is
    * quadratic; callers pass a deterministic sample (n ≤ ~2k, the
    * documented posture; row ids come from one bounded sort window).
    *
    * Output: one row (n, n_pairs, conc, disc, tie_x, tie_y, tie_both,
    * tau); a degenerate margin flags tau = −2.
    */
  def kendallTau(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = df.select(integralChecked(col(xCol), "kendallTau").as("x"),
        integralChecked(col(yCol), "kendallTau").as("y"))
      .withColumn("rid",
        row_number().over(Window.orderBy(col("x"), col("y"))))
    val a = pts.select(col("rid").as("ra"), col("x").as("xa"),
      col("y").as("ya"))
    val b = pts.select(col("rid").as("rb"), col("x").as("xb"),
      col("y").as("yb"))
    a.crossJoin(b).filter(col("ra") < col("rb"))
      .select(
        when((col("xa") < col("xb") && col("ya") < col("yb"))
          || (col("xa") > col("xb") && col("ya") > col("yb")), "c")
          .when((col("xa") < col("xb") && col("ya") > col("yb"))
            || (col("xa") > col("xb") && col("ya") < col("yb")), "d")
          .when(col("xa") === col("xb") && col("ya") === col("yb"), "tb")
          .when(col("xa") === col("xb"), "tx")
          .otherwise("ty").as("k"))
      .agg(
        coalesce(sum(when(col("k") === "c", 1L).otherwise(0L)), lit(0L))
          .as("conc"),
        coalesce(sum(when(col("k") === "d", 1L).otherwise(0L)), lit(0L))
          .as("disc"),
        coalesce(sum(when(col("k") === "tx", 1L).otherwise(0L)), lit(0L))
          .as("tie_x"),
        coalesce(sum(when(col("k") === "ty", 1L).otherwise(0L)), lit(0L))
          .as("tie_y"),
        coalesce(sum(when(col("k") === "tb", 1L).otherwise(0L)), lit(0L))
          .as("tie_both"),
        count(lit(1)).as("n_pairs"))
      .withColumn("tau",
        when((col("conc") + col("disc") + col("tie_y")) > 0L
          && (col("conc") + col("disc") + col("tie_x")) > 0L,
          (col("conc") - col("disc")).cast("double")
            / sqrt(((col("conc") + col("disc") + col("tie_y"))
              * (col("conc") + col("disc") + col("tie_x"))).cast("double")))
          .otherwise(lit(-2d)))
      .select(col("n_pairs"), col("conc"), col("disc"), col("tie_x"),
        col("tie_y"), col("tie_both"), col("tau"))
  }

  /** L267 — EXACT OLS LINEAR FIT (one regressor): slope/intercept/r of
    * y on x — the trend read a feed audit runs over sequence position
    * or time ("is quality drifting as the crawl progresses" — CUSUM
    * L89 detects a break, this measures the gradient). All five sums
    * are exact BIGINTs; slope = xy_dev / xx_dev and intercept =
    * (Σy·xx_dev − xy_dev·Σx) / (n·xx_dev) are SINGLE divisions of
    * exact integers (the intercept's numerator/denominator in
    * DECIMAL(38,0) — the products can pass 2⁶³; deliberately NOT a
    * floored `div`, whose truncate-vs-floor semantics diverge between
    * engines on negative numerators); r = xy_dev /
    * (sqrt(xx_dev)·sqrt(yy_dev)) — the mcc double discipline.
    *
    * Scale shape: one map-side-combined global agg — nothing else.
    *
    * Output: one row (n, sx, sy, xy_dev, xx_dev, yy_dev, slope,
    * intercept, r); a constant x or y flags r = −2 and slope/intercept
    * 0.
    */
  def linearFit(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    df.select(integralChecked(col(xCol), "linearFit").as("x"),
        integralChecked(col(yCol), "linearFit").as("y"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("x")), lit(0L)).as("sx"),
        coalesce(sum(col("y")), lit(0L)).as("sy"),
        coalesce(sum(col("x") * col("y")), lit(0L)).as("sxy"),
        coalesce(sum(col("x") * col("x")), lit(0L)).as("sxx"),
        coalesce(sum(col("y") * col("y")), lit(0L)).as("syy"))
      .withColumn("xy_dev", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("xx_dev", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("yy_dev", col("n") * col("syy") - col("sy") * col("sy"))
      .withColumn("slope",
        when(col("xx_dev") > 0L,
          col("xy_dev").cast("double") / col("xx_dev").cast("double"))
          .otherwise(lit(0d)))
      .withColumn("intercept",
        when(col("xx_dev") > 0L,
          expr(s"CAST(CAST(sy AS $dec) * xx_dev - CAST(xy_dev AS $dec) * sx" +
            s" AS DOUBLE)")
            / expr(s"CAST(CAST(n AS $dec) * xx_dev AS DOUBLE)"))
          .otherwise(lit(0d)))
      .withColumn("r",
        when(col("xx_dev") > 0L && col("yy_dev") > 0L,
          col("xy_dev").cast("double")
            / (sqrt(col("xx_dev").cast("double"))
              * sqrt(col("yy_dev").cast("double"))))
          .otherwise(lit(-2d)))
      .select(col("n"), col("sx"), col("sy"), col("xy_dev"), col("xx_dev"),
        col("yy_dev"), col("slope"), col("intercept"), col("r"))
  }

  /** L269 — BENFORD FIRST-DIGIT AUDIT: the leading-digit distribution
    * of positive integer measurements against Benford's law — the
    * classic fabricated/synthetic-data and unit-mixing detector (organic
    * multi-scale magnitudes follow log10(1+1/d); capped, minted, or
    * unit-spliced feeds don't). The expected shares are e6-floored
    * PUBLIC constants shared verbatim with the SQL mirror — neither
    * engine evaluates a log.
    *
    * Scale shape: one map-side-combined digit count (≤ 9 groups) + a
    * broadcast total. Output per observed digit: (digit, n_d, n,
    * share_e6, expected_e6, dev_e6).
    */
  def benfordAudit(df: DataFrame, valCol: String): DataFrame = {
    val expected = Seq(301029L, 176091L, 124938L, 96910L, 79181L,
      66946L, 57991L, 51152L, 45757L)
    val pos = df.select(integralChecked(col(valCol), "benfordAudit").as("v"))
      .filter(col("v") > 0L)
    val tot = pos.agg(count(lit(1)).as("n"))
    pos.withColumn("digit",
        substring(col("v").cast("string"), 1, 1).cast("long"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_d"))
      .crossJoin(broadcast(tot))
      .withColumn("share_e6", expr("(n_d * 1000000L) div n"))
      .withColumn("expected_e6",
        element_at(array(expected.map(lit): _*), col("digit").cast("int")))
      .withColumn("dev_e6", col("share_e6") - col("expected_e6"))
      .select(col("digit"), col("n_d"), col("n"), col("share_e6"),
        col("expected_e6"), col("dev_e6"))
      .orderBy(col("digit"))
  }

  /** L227 — MATTHEWS CORRELATION COEFFICIENT: the single-number
    * binary-classification score that stays honest under class
    * imbalance (accuracy and F1 both saturate when one class
    * dominates — the usual shape of a quality-filter gold set). MCC =
    * (TP·TN − FP·FN)/√((TP+FP)(TP+FN)(TN+FP)(TN+FN)) — the four
    * marginal products are exact integers whose product stays below
    * 2⁵³ for n up to ~50k rows per audit (documented; gold sets are
    * samples), so the double sqrt is of an EXACTLY-represented
    * integer and correctly rounded — identical in both engines. Any
    * zero marginal → −2 flag (MCC undefined), loud.
    *
    * Scale shape: one map-side-combined 2×2 count — the McNemar
    * shape.
    *
    * Output: one row (n, tp, fp, fn, tn, mcc_num, mcc).
    */
  def mcc(df: DataFrame, goldCol: String, predCol: String): DataFrame =
    df.select(boolChecked(col(goldCol).cast("boolean"), "mcc").as("g"),
        boolChecked(col(predCol).cast("boolean"), "mcc").as("p"))
      .agg(count(lit(1)).as("n"),
        // coalesce: an empty input reads as an all-zero table, not nulls
        coalesce(sum(when(col("g") && col("p"), 1L).otherwise(0L)), lit(0L))
          .as("tp"),
        coalesce(sum(when(!col("g") && col("p"), 1L).otherwise(0L)), lit(0L))
          .as("fp"),
        coalesce(sum(when(col("g") && !col("p"), 1L).otherwise(0L)), lit(0L))
          .as("fn"),
        coalesce(sum(when(!col("g") && !col("p"), 1L).otherwise(0L)), lit(0L))
          .as("tn"))
      .withColumn("mcc_num", col("tp") * col("tn") - col("fp") * col("fn"))
      .withColumn("mcc",
        when((col("tp") + col("fp")) * (col("tp") + col("fn"))
            * (col("tn") + col("fp")) * (col("tn") + col("fn")) > 0L,
          col("mcc_num").cast("double")
            / sqrt(((col("tp") + col("fp")) * (col("tp") + col("fn"))
              * (col("tn") + col("fp")) * (col("tn") + col("fn")))
              .cast("double")))
          .otherwise(lit(-2d)))

  /** L245 — QUADRATIC-WEIGHTED COHEN'S KAPPA for ORDINAL labels: the
    * agreement coefficient a rating campaign with an ORDERED rubric
    * (quality 0..4, toxicity severity) reports — plain kappa (L163)
    * prices "4 vs 3" and "4 vs 0" identically; the quadratic weight
    * (i−j)² charges disagreement by its distance. κ_w = 1 −
    * n·Σw·O / Σ(i−j)²·r_i·c_j with the observed-cell and
    * marginal-product sums exact BIGINTs (labels validated 0..k−1
    * loudly, the speaker-id contract posture), one double division.
    *
    * Scale shape: one (gold, pred) map-side-combined count, two ≤ k
    * marginal rollups, one k×k broadcast cross of the marginals.
    *
    * Output: one row (n, k, wo, we, kappa_w); κ_w = −2 when the
    * expected disagreement is 0 (a constant marginal).
    */
  def weightedKappa(df: DataFrame, goldCol: String, predCol: String,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 64, s"need 2 <= k <= 64 classes, got $k")
    def checked(c: String) =
      when(col(c).isNull || col(c) < 0L || col(c) >= k.toLong,
        raise_error(concat(lit(s"weightedKappa: label outside 0..${k - 1}: "),
          coalesce(col(c).cast("string"), lit("null")))).cast("long"))
        .otherwise(col(c))
    val o = df.select(col(goldCol).cast("long").as("g"),
        col(predCol).cast("long").as("p"))
      .select(checked("g").as("g"), checked("p").as("p"))
      .groupBy(col("g"), col("p")).agg(count(lit(1)).as("o"))
    val tot = o.agg(sum(col("o")).as("n"),
      sum(expr("(g - p) * (g - p) * o")).as("wo"))
    val ri = o.groupBy(col("g")).agg(sum(col("o")).as("r"))
    val cj = o.groupBy(col("p")).agg(sum(col("o")).as("c"))
    val we = broadcast(ri).crossJoin(broadcast(cj))
      .agg(sum(expr("(g - p) * (g - p) * r * c")).as("we"))
    tot.crossJoin(broadcast(we))
      .select(col("n"), lit(k.toLong).as("k"), col("wo"), col("we"),
        when(col("we") > 0L,
          (col("we") - col("n") * col("wo")).cast("double")
            / col("we").cast("double"))
          .otherwise(lit(-2d)).as("kappa_w"))
  }

  /** L251 — GWET'S AC1 (two raters, nominal): the agreement
    * coefficient that survives the KAPPA PARADOX — when one category
    * dominates (the usual shape of a "is this spam" campaign), Cohen's
    * kappa (L163) collapses toward 0 on near-perfect agreement because
    * its chance term inflates with the prevalence; AC1's chance model
    * (Gwet 2008) uses π_q(1−π_q)/(Q−1) over the POOLED marginals and
    * stays calibrated. Exact integers: agree count, pooled label
    * counts m_q (Σ m_q = 2n), pe_num = Σ m_q(2n−m_q), pe_den =
    * 4n²(Q−1); AC1 = (agree·pe_den − n·pe_num) / (n·(pe_den −
    * pe_num)), one double division of two exact BIGINTs (bounded by
    * 4n³Q — longs to n ≈ 10⁵ per audit, documented). Labels validated
    * 0..k−1 loudly.
    *
    * Scale shape: one agreement agg + one pooled-label rollup — the
    * McNemar shape.
    *
    * Output: one row (n, k, n_agree, pe_num, pe_den, ac1); −2 when
    * the correction denominator is 0.
    */
  def gwetsAc1(df: DataFrame, aCol: String, bCol: String,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 64, s"need 2 <= k <= 64 classes, got $k")
    def checked(c: String) =
      when(col(c).isNull || col(c) < 0L || col(c) >= k.toLong,
        raise_error(concat(lit(s"gwetsAc1: label outside 0..${k - 1}: "),
          coalesce(col(c).cast("string"), lit("null")))).cast("long"))
        .otherwise(col(c))
    val base = df.select(col(aCol).cast("long").as("a"),
        col(bCol).cast("long").as("b"))
      .select(checked("a").as("a"), checked("b").as("b"))
    val tot = base.agg(count(lit(1)).as("n"),
      coalesce(sum(when(col("a") === col("b"), 1L).otherwise(0L)), lit(0L))
        .as("n_agree"))
    val pooled = base.select(col("a").as("q"))
      .unionByName(base.select(col("b").as("q")))
      .groupBy(col("q")).agg(count(lit(1)).as("m"))
    val pe = pooled.crossJoin(broadcast(tot.select(col("n").as("__n"))))
      .agg(coalesce(sum(expr("m * (2L * __n - m)")), lit(0L)).as("pe_num"))
    tot.crossJoin(broadcast(pe))
      .select(col("n"), lit(k.toLong).as("k"), col("n_agree"),
        col("pe_num"),
        expr(s"4L * n * n * ${k - 1}L").as("pe_den"))
      .withColumn("ac1",
        when(col("n") * (col("pe_den") - col("pe_num")) =!= 0L,
          (col("n_agree") * col("pe_den") - col("n") * col("pe_num"))
            .cast("double")
            / (col("n") * (col("pe_den") - col("pe_num"))).cast("double"))
          .otherwise(lit(-2d)))
  }

  /** L243 — WILCOXON SIGNED-RANK TEST for paired CONTINUOUS scores:
    * the companion to McNemar (L216, which only reads right/wrong) —
    * two quality scorers on the SAME documents, "does B systematically
    * score higher than A, beyond symmetric noise". Zero differences
    * are dropped and counted (the standard convention, loud in
    * `n_zero`); |differences| take DOUBLED average ranks (the L217
    * exact-tie device), so W2 = Σ ranks over positive differences =
    * 2·W⁺ is an exact BIGINT. The normal approximation z =
    * (W2 − n(n+1)/2)/√(n(n+1)(2n+1)/6) uses an exactly-represented
    * integer under the correctly-rounded IEEE sqrt (n ≤ ~200k per
    * audit, documented) — identical doubles both engines; the tie
    * variance correction is omitted (documented: audits with heavy
    * ties should read the exact W2/W2m instead).
    *
    * Scale shape: one rank window over the non-zero differences + one
    * global agg — the Spearman shape.
    *
    * Output: one row (n, n_zero, w_plus_2x, w_minus_2x, z); z = −99
    * when n = 0.
    */
  def wilcoxonSignedRank(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = df.select((integralChecked(col(xCol), "wilcoxonSignedRank")
      - integralChecked(col(yCol), "wilcoxonSignedRank")).as("d"))
    val zeros = d.filter(col("d") === 0L).agg(count(lit(1)).as("n_zero"))
    val nz = d.filter(col("d") =!= 0L).withColumn("ad", abs(col("d")))
    val wv = Window.partitionBy(col("ad"))
    val wo = Window.orderBy(col("ad"))
    nz.withColumn("r2",
        rank().over(wo).cast("long") * 2L + count(lit(1)).over(wv) - 1L)
      .agg(count(lit(1)).as("n"),
        // all-zero-diff input leaves the agg empty-summed: coalesce so
        // the degenerate audit reads (0, n_zero, 0, 0, -99), not nulls
        coalesce(sum(when(col("d") > 0L, col("r2")).otherwise(0L)), lit(0L))
          .as("w_plus_2x"),
        coalesce(sum(when(col("d") < 0L, col("r2")).otherwise(0L)), lit(0L))
          .as("w_minus_2x"))
      .crossJoin(broadcast(zeros))
      .select(col("n"), col("n_zero"), col("w_plus_2x"), col("w_minus_2x"),
        when(col("n") > 0L,
          expr("CAST(w_plus_2x - (n * (n + 1L)) div 2L AS DOUBLE)")
            / sqrt(expr("(n * (n + 1L) * (2L * n + 1L)) div 6L")
              .cast("double")))
          .otherwise(lit(-99d)).as("z"))
  }

  /** L218 — ADJUSTED RAND INDEX + PURITY (pair-counting cluster
    * agreement): the chance-corrected score for comparing a produced
    * clustering against a reference partition — "did my dedup/topic
    * clustering recover the gold grouping, beyond what random
    * clustering of the same sizes would". Raw pair-agreement rewards
    * trivial clusterings; ARI's expected-index correction (Hubert &
    * Arabie 1985) is the standard fix.
    *
    * Exactness: contingency pair counts C(n_ij,2), the marginal sums
    * a = Σ C(a_i,2), b = Σ C(b_j,2), and T = C(n,2) are exact BIGINTs;
    * ARI = 2(idx·T − a·b) / ((a+b)·T − 2ab), numerator and denominator
    * exact (bounded by n⁴ — exact in longs to n ≈ 50k rows per
    * invocation, documented: cluster-agreement audits run on samples
    * or per-shard, not the raw corpus), the ratio one double
    * division. Purity = Σ_i max_j n_ij / n, e6-floored.
    *
    * Scale shape: one (labelA, labelB) map-side-combined count, two
    * marginal rollups, one argmax window — nothing pairwise in rows.
    *
    * Output: one row (n, n_clusters, n_classes, idx_pairs, a_pairs,
    * b_pairs, purity_e6, ari); ari −2 when the correction denominator
    * is 0 (both partitions trivial).
    */
  def adjustedRandIndex(df: DataFrame, labelACol: String,
      labelBCol: String): DataFrame = {
    val ct = df.select(col(labelACol).as("la"), col(labelBCol).as("lb"))
      .groupBy(col("la"), col("lb")).agg(count(lit(1)).as("nij"))
    val idx = ct.agg(sum(expr("(nij * (nij - 1L)) div 2L")).as("idx_pairs"),
      sum(col("nij")).as("n"))
    val aSide = ct.groupBy(col("la")).agg(sum(col("nij")).as("ai"),
        max(col("nij")).as("mx"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(expr("(ai * (ai - 1L)) div 2L")).as("a_pairs"),
        sum(col("mx")).as("sum_max"))
    val bSide = ct.groupBy(col("lb")).agg(sum(col("nij")).as("bj"))
      .agg(count(lit(1)).as("n_classes"),
        sum(expr("(bj * (bj - 1L)) div 2L")).as("b_pairs"))
    idx.crossJoin(broadcast(aSide)).crossJoin(broadcast(bSide))
      .withColumn("t_pairs", expr("(n * (n - 1L)) div 2L"))
      .select(col("n"), col("n_clusters"), col("n_classes"),
        col("idx_pairs"), col("a_pairs"), col("b_pairs"),
        expr("(sum_max * 1000000L) div n").as("purity_e6"),
        (lit(2L) * (col("idx_pairs") * col("t_pairs")
          - col("a_pairs") * col("b_pairs"))).as("ari_num"),
        ((col("a_pairs") + col("b_pairs")) * col("t_pairs")
          - lit(2L) * col("a_pairs") * col("b_pairs")).as("ari_den"))
      .withColumn("ari",
        when(col("ari_den") =!= 0L,
          col("ari_num").cast("double") / col("ari_den").cast("double"))
          .otherwise(lit(-2d)))
      .drop("ari_num", "ari_den")
  }

  /** L280 — BENJAMINI–HOCHBERG FDR step-up over a table of e6
    * fixed-point p-values: with the m p-values ranked ascending,
    * k* = max{ k : p_(k)·m ≤ k·q } and every rank ≤ k* rejects (the
    * STEP-UP property — a qualifying later rank pulls in earlier
    * non-qualifying ones). The multiple-comparisons correction a
    * curation run needs the moment it fans one test (KS, McNemar,
    * chi-square, …) across many sources: at q=0.05 a 1000-source scan
    * expects 50 false "drifting source" flags without it.
    *
    * Everything is exact: p_e6·m ≤ rank·q_e6 compares longs (p ≤ 1e6,
    * m bounded by the rank-test contract), ties order by (p, id) so
    * both engines rank identically. The single unpartitioned window
    * follows the L22 bounded-input pattern: a p-value table is one row
    * per hypothesis test, ≤ thousands by construction, never corpus-
    * sized (documented contract, cf. mannWhitneyU).
    */
  def bhFdr(df: DataFrame, idCol: String, pE6Col: String,
      qE6: Long): DataFrame = {
    require(qE6 > 0 && qE6 <= 1000000L, s"q out of (0,1]: $qE6")
    val checked = df.select(col(idCol).cast("long").as("id"),
      integralChecked(col(pE6Col), "bhFdr").as("p_e6"))
    val ranked = checked
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("p_e6"), col("id"))).cast("long"))
    val m = ranked.agg(count(lit(1)).as("m"))
    val withQ = ranked.crossJoin(broadcast(m))
      .withColumn("qualifies", col("p_e6") * col("m") <= col("rank") * qE6)
    val kMax = withQ.agg(coalesce(max(when(col("qualifies"), col("rank"))),
      lit(0L)).as("k_max"))
    withQ.crossJoin(broadcast(kMax))
      .select(col("id"), col("p_e6"), col("rank"), col("m"),
        (col("rank") <= col("k_max")).as("reject"))
  }

  /** L287 — FRIEDMAN TEST: the k-treatment repeated-measures rank test
    * (the k>2 sibling of Wilcoxon L243) — "do k systems rank the same
    * across n blocks?", the question a bake-off of k rankers/gates over
    * n shared slices asks before trusting a winner. Within-block
    * DOUBLED average ranks keep ties exact (the spearman idiom:
    * rank2 = 2·#less + #tied + 1), and with R2_j = Σ_blocks rank2:
    * chisq = (3·ΣR2_j² − 3·n²·k·(k+1)²) / (n·k·(k+1)) — one division
    * of two exact integers. Classic untied formula with average ranks
    * (no tie-correction factor — documented contract). Blocks must be
    * complete (one row per block×treatment) — validated loudly.
    *
    * Scale shape: two bounded windows inside each block (k rows) + one
    * k-row rollup; n·k input rows, k output.
    */
  /** Within-block DOUBLED average ranks (the spearman tie idiom:
    * rank2 = 2·#less + #tied + 1) over (blockCol, treatCol, valCol)
    * rows — the shared core of [[friedman]] and [[pageTrend]].
    * Returns (b, t, rank2, k_in_block).
    */
  private def blockDoubledRanks(df: DataFrame, blockCol: String,
      treatCol: String, valCol: String, op: String): DataFrame = {
    val base = df.select(col(blockCol).as("b"), col(treatCol).as("t"),
      integralChecked(col(valCol), op).as("v"))
    base
      .withColumn("less", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("b"))
          .orderBy(col("v")).rangeBetween(Long.MinValue, -1)))
      .withColumn("tied", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("b"), col("v"))))
      .withColumn("rank2", lit(2L) * col("less") + col("tied") + 1L)
      .withColumn("k_in_block", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("b"))))
      .select(col("b"), col("t"), col("rank2"), col("k_in_block"))
  }

  def friedman(df: DataFrame, blockCol: String, treatCol: String,
      valCol: String): DataFrame = {
    val ranked = blockDoubledRanks(df, blockCol, treatCol, valCol,
      "friedman")
    val perTreat = ranked.groupBy(col("t"))
      .agg(sum(col("rank2")).as("r2"), count(lit(1)).as("n_b"),
        min(col("k_in_block")).as("k_min"), max(col("k_in_block")).as("k_max"))
    val tot = perTreat.agg(count(lit(1)).as("k"), sum(col("r2")).as("sum_r2"),
      sum(col("r2") * col("r2")).as("sum_r2_sq"),
      min(col("n_b")).as("n_min"), max(col("n_b")).as("n_max"),
      min(col("k_min")).as("kb_min"), max(col("k_max")).as("kb_max"))
    tot.select(
        when(col("n_min") =!= col("n_max") ||
          col("kb_min") =!= col("k") || col("kb_max") =!= col("k"),
          raise_error(lit("friedman: incomplete blocks (need one row " +
            "per block x treatment)")).cast("long"))
          .otherwise(col("n_min")).as("n_blocks"),
        col("k"), col("sum_r2_sq"))
      .withColumn("chisq_num", lit(3L) * col("sum_r2_sq") -
        lit(3L) * col("n_blocks") * col("n_blocks") * col("k") *
        (col("k") + 1L) * (col("k") + 1L))
      .withColumn("chisq", col("chisq_num").cast("double") /
        (col("n_blocks") * col("k") * (col("k") + 1L)).cast("double"))
  }

  /** L298 — PAGE'S TREND TEST: the ORDERED-alternative sibling of
    * [[friedman]] — "do the k treatments not merely differ, but
    * improve MONOTONICALLY in the hypothesized order?" (the question
    * a k-stage gate cascade or model-version ladder asks). `treatCol`
    * IS the hypothesized order 1..k (validated). With doubled ranks,
    * L₂ = Σ_j j·R2_j is exact; μ(L₂) = n·k(k+1)²/2 is always integral
    * (k(k+1)² is even); var(L₂) = n·k²(k+1)(k²−1)/36 (classic untied
    * formula — ties are allowed in the ranks, both engines replay the
    * same doubled-rank L; documented contract). z is the identical
    * three-op IEEE tree.
    */
  def pageTrend(df: DataFrame, blockCol: String, treatCol: String,
      valCol: String): DataFrame = {
    val ranked = blockDoubledRanks(df, blockCol, treatCol, valCol,
      "pageTrend")
    val perTreat = ranked.groupBy(col("t"))
      .agg(sum(col("rank2")).as("r2"), count(lit(1)).as("n_b"),
        min(col("k_in_block")).as("k_min"),
        max(col("k_in_block")).as("k_max"))
    val tot = perTreat.agg(count(lit(1)).as("k"),
      sum(col("t") * col("r2")).as("l2"),
      min(col("t")).as("t_min"), max(col("t")).as("t_max"),
      min(col("n_b")).as("n_min"), max(col("n_b")).as("n_max"),
      min(col("k_min")).as("kb_min"), max(col("k_max")).as("kb_max"))
    tot.select(
        when(col("n_min") =!= col("n_max") ||
          col("kb_min") =!= col("k") || col("kb_max") =!= col("k") ||
          col("t_min") =!= 1L || col("t_max") =!= col("k"),
          raise_error(lit("pageTrend: treatments must be a complete " +
            "1..k order over complete blocks")).cast("long"))
          .otherwise(col("n_min")).as("n_blocks"),
        col("k"), col("l2"))
      .withColumn("mu_l2",
        expr("(n_blocks * k * (k + 1L) * (k + 1L)) div 2L"))
      .withColumn("var_num", col("n_blocks") * col("k") * col("k") *
        (col("k") + 1L) * (col("k") * col("k") - 1L))
      .withColumn("var_den", lit(36L))
      .withColumn("z", when(col("var_num") > 0L,
        (col("l2") - col("mu_l2")).cast("double") /
          sqrt(col("var_num").cast("double") / lit(36.0)))
        .otherwise(lit(0d)))
  }

  /** L288 — COCHRAN'S Q: do k binary classifiers/gates have the same
    * success rate over n shared items? — the k>2 sibling of McNemar
    * (L216), the question a panel of quality gates faces before one is
    * declared stricter. With column successes C_j, row successes R_i,
    * N = ΣC: Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²) — one division
    * of exact integers. Degenerate denominator (every item unanimous)
    * reports q = −1 loudly rather than 0/0. Null inputs raise (the
    * mcnemar posture).
    *
    * Scale shape: one map-side row rollup + one k-group column rollup.
    */
  def cochranQ(df: DataFrame, itemCol: String, raterCol: String,
      successCol: String): DataFrame = {
    val base = df.select(col(itemCol).as("i"), col(raterCol).as("r"),
      when(col(successCol).isNull,
        raise_error(lit("cochranQ: null success input")).cast("long"))
        .otherwise(col(successCol).cast("boolean").cast("long")).as("x"))
    val rows = base.groupBy(col("i")).agg(sum(col("x")).as("ri"),
      count(lit(1)).as("k_i"))
    val rowAgg = rows.agg(count(lit(1)).as("n"),
      sum(col("ri") * col("ri")).as("sum_ri_sq"),
      min(col("k_i")).as("k_lo"), max(col("k_i")).as("k_hi"))
    val colAgg = base.groupBy(col("r")).agg(sum(col("x")).as("cj"))
      .agg(count(lit(1)).as("k"), sum(col("cj")).as("big_n"),
        sum(col("cj") * col("cj")).as("sum_cj_sq"))
    rowAgg.crossJoin(broadcast(colAgg))
      .select(
        when(col("k_lo") =!= col("k") || col("k_hi") =!= col("k"),
          raise_error(lit("cochranQ: incomplete items (need one row " +
            "per item x rater)")).cast("long"))
          .otherwise(col("n")).as("n_items"),
        col("k"), col("big_n").as("n_success"),
        ((col("k") - 1L) * (col("k") * col("sum_cj_sq") -
          col("big_n") * col("big_n"))).as("q_num"),
        (col("k") * col("big_n") - col("sum_ri_sq")).as("q_den"))
      .withColumn("q", when(col("q_den") > 0L,
        col("q_num").cast("double") / col("q_den").cast("double"))
        .otherwise(lit(-1d)))
  }

  /** L295 — WALD–WOLFOWITZ RUNS TEST: is a binary sequence random in
    * ORDER, not just in rate? — the check a gate's pass/fail stream
    * needs when drift is suspected but the rate looks flat (a gate
    * that fails in bursts has the same mean as one failing uniformly;
    * CUSUM sees level shifts, the runs test sees clustering). Exact
    * components: R runs counted by a lag window, z_num = n·R − 2n₁n₂
    * − n, var = 2n₁n₂(2n₁n₂−n) / n²(n−1); z = (z_num/n)/√(var_num/
    * var_den) — the identical op tree both engines evaluate (division,
    * division, correctly-rounded sqrt, division: each IEEE-exact on
    * the same inputs). Degenerate sequences (all one symbol) report
    * z = 0 with var_num = 0. Single unpartitioned window — the L22
    * bounded-sample contract (a diagnostic sequence, never a corpus).
    */
  def runsTest(df: DataFrame, ordCol: String, bitCol: String): DataFrame = {
    val base = df.select(col(ordCol).cast("long").as("o"),
      when(col(bitCol).isNull,
        raise_error(lit("runsTest: null bit input")).cast("long"))
        .otherwise(col(bitCol).cast("boolean").cast("long")).as("b"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("o"))
    val agg = base.withColumn("prev", lag(col("b"), 1).over(w))
      .agg(count(lit(1)).as("n"), sum(col("b")).as("n1"),
        sum(when(col("prev").isNull || col("prev") =!= col("b"), 1L)
          .otherwise(0L)).as("runs"))
    agg.select(col("n"), col("n1"), (col("n") - col("n1")).as("n2"),
        col("runs"))
      .withColumn("z_num",
        col("n") * col("runs") - lit(2L) * col("n1") * col("n2") - col("n"))
      .withColumn("var_num", lit(2L) * col("n1") * col("n2") *
        (lit(2L) * col("n1") * col("n2") - col("n")))
      .withColumn("var_den", col("n") * col("n") * (col("n") - 1L))
      .withColumn("z", when(col("var_num") > 0L,
        (col("z_num").cast("double") / col("n").cast("double")) /
          sqrt(col("var_num").cast("double") / col("var_den").cast("double")))
        .otherwise(lit(0d)))
  }

  /** L302 — ONE-WAY ANOVA (balanced): do k systems scored on the SAME
    * m items have the same mean? — the parametric sibling of
    * [[friedman]] for when the scores themselves (not just their
    * ranks) carry meaning (an e6-scaled quality metric, a latency).
    * The BALANCED contract (equal group sizes, validated loudly) is
    * what eval grids produce (k models × one shared item set) and is
    * what keeps the statistic EXACT: with m = n_g ∀g and N = k·m,
    *   F = ((N−k)·(k·ΣT_g² − T²)) / ((k−1)·k·(m·Σx² − ΣT_g²))
    * — numerator and denominator exact integers (DECIMAL(38,0): the
    * products pass 2⁶³ at corpus scale), F one division. A zero
    * within-group sum of squares reports f = −1.
    *
    * Scale shape: one per-group rollup + one k-row global agg.
    *
    * Output: one row (n, k, f_num, f_den, f).
    */
  def oneWayAnova(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("g"),
      integralChecked(col(valCol), "oneWayAnova").as("v"))
    val perG = base.groupBy(col("g"))
      .agg(sum(col("v")).as("tg"), count(lit(1)).as("ng"),
        sum(col("v") * col("v")).as("sxx_g"))
    val d38 = "decimal(38,0)"
    perG.agg(count(lit(1)).as("k"), sum(col("tg")).as("t"),
        sum(col("tg").cast(d38) * col("tg")).as("sum_tg_sq"),
        sum(col("sxx_g")).as("sxx"),
        min(col("ng")).as("m_lo"), max(col("ng")).as("m_hi"))
      .select(
        when(col("m_lo") =!= col("m_hi"),
          raise_error(lit("oneWayAnova: balanced design required " +
            "(equal group sizes)")).cast("long"))
          .otherwise(col("m_lo") * col("k")).as("n"),
        col("k"), col("m_lo").as("m"), col("t"), col("sum_tg_sq"),
        col("sxx"))
      .select(col("n"), col("k"),
        ((col("n") - col("k")).cast(d38) *
          (col("k").cast(d38) * col("sum_tg_sq") -
            col("t").cast(d38) * col("t"))).as("f_num"),
        ((col("k") - 1L).cast(d38) * col("k") *
          (col("m").cast(d38) * col("sxx") - col("sum_tg_sq")))
          .as("f_den"))
      .withColumn("f", when(col("f_den") > 0,
        col("f_num").cast("double") / col("f_den").cast("double"))
        .otherwise(lit(-1d)))
  }

  /** L303 — KRUSKAL–WALLIS H (k-sample rank test, exact ties): the
    * UNBALANCED, k>2 sibling of Mann–Whitney (L258) — "do documents
    * from k sources score stochastically the same?" asked of groups
    * of DIFFERENT sizes, where [[oneWayAnova]]'s balanced contract
    * and normality both fail. Doubled global average ranks (the L217
    * discipline) are exact integers; the one rational step Σ R2_g²/n_g
    * is folded as h_s = Σ_g (R2_g² div n_g) — FLOORED fixed-point,
    * error < k in h_s units (< 3k/(N(N+1)) in H, negligible) and
    * DETERMINISTIC: the oracle replays the identical floor. With the
    * tie term T = Σ(t³−t) the corrected statistic is ONE division:
    *   h = (3·h_s − 3·N·(N+1)²)·(N³−N) / (N·(N+1)·(N³−N−T))
    * (DECIMAL(38,0) products; all-tied input → h_den 0 → h = −99).
    *
    * Scale shape: one distinct-value rollup (domain-bounded, the L229
    * posture), one per-group rollup, one global agg.
    *
    * Output: one row (n, k, h_s, tie_term, h_num, h_den, h).
    */
  def kruskalWallis(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("g"),
      integralChecked(col(valCol), "kruskalWallis").as("v"))
    // doubled average rank per distinct value: 2·#less + #tied + 1
    val byVal = base.groupBy(col("v")).agg(count(lit(1)).as("t"))
      .withColumn("r2",
        (sum(col("t")).over(Window.orderBy(col("v"))) - col("t")) * 2L
          + col("t") + 1L)
    val perG = base.join(byVal.select(col("v"), col("r2")), Seq("v"))
      .groupBy(col("g"))
      .agg(sum(col("r2")).as("r2g"), count(lit(1)).as("ng"))
    val d38 = "decimal(38,0)"
    val ties = byVal.agg(
      coalesce(sum(col("t") * col("t") * col("t") - col("t")), lit(0L))
        .as("tie_term"))
    perG.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sum(expr("CAST(r2g AS decimal(38,0)) * r2g div ng")).as("h_s"))
      .crossJoin(broadcast(ties))
      .select(col("n"), col("k"), col("h_s"), col("tie_term"),
        ((lit(3L).cast(d38) * col("h_s") -
          lit(3L).cast(d38) * col("n") * (col("n") + 1L) * (col("n") + 1L))
          * (col("n").cast(d38) * col("n") * col("n") - col("n")))
          .as("h_num"),
        (col("n").cast(d38) * (col("n") + 1L) *
          (col("n").cast(d38) * col("n") * col("n") - col("n")
            - col("tie_term"))).as("h_den"))
      .withColumn("h", when(col("h_den") > 0,
        col("h_num").cast("double") / col("h_den").cast("double"))
        .otherwise(lit(-99d)))
  }

  /** L319 — WELCH'S T (unequal-variance two-sample test): the
    * parametric unpaired comparison next to Mann–Whitney (L258) —
    * right when the scores are interval-scaled and the two sources
    * have DIFFERENT spreads (Student's pooled variance silently
    * assumes equality; Welch is the default in every modern stats
    * stack). All four moments are exact BIGINTs; the sample variances
    * are single divisions va = va_num/va_den with
    * va_num = n·Σx² − S², va_den = n²(n−1)·(scaled by 1/n for the
    * standard error fold: we fold s²/n directly, den = n²(n−1));
    * t = dm / sqrt(va + vb) with dm = (S_a·n_b − S_b·n_a)/(n_a·n_b) —
    * a fixed five-op IEEE tree (div, div, div, add, sqrt, div) both
    * engines evaluate identically on identical exact inputs (the
    * L258/L295 discipline). Degenerate spread (va+vb = 0) or n < 2 on
    * either side reports t = −99. The Welch–Satterthwaite df is NOT
    * emitted (a longer double chain than the discipline allows —
    * callers needing df compute it from the exact components).
    *
    * Scale shape: two map-side-combined global aggs.
    *
    * Output: one row (n_a, n_b, sum_a, sum_b, va_num, vb_num, va_den,
    * vb_den, t).
    */
  def welchT(a: DataFrame, b: DataFrame, valCol: String): DataFrame = {
    def side(df: DataFrame, tag: String) =
      df.select(integralChecked(col(valCol), "welchT").as("v"))
        .agg(count(lit(1)).as(s"n_$tag"), sum(col("v")).as(s"sum_$tag"),
          sum(col("v") * col("v")).as(s"sxx_$tag"))
    side(a, "a").crossJoin(broadcast(side(b, "b")))
      .select(col("n_a"), col("n_b"),
        coalesce(col("sum_a"), lit(0L)).as("sum_a"),
        coalesce(col("sum_b"), lit(0L)).as("sum_b"),
        (col("n_a") * coalesce(col("sxx_a"), lit(0L))
          - coalesce(col("sum_a"), lit(0L)) * coalesce(col("sum_a"), lit(0L)))
          .as("va_num"),
        (col("n_b") * coalesce(col("sxx_b"), lit(0L))
          - coalesce(col("sum_b"), lit(0L)) * coalesce(col("sum_b"), lit(0L)))
          .as("vb_num"),
        (col("n_a") * col("n_a") * (col("n_a") - 1L)).as("va_den"),
        (col("n_b") * col("n_b") * (col("n_b") - 1L)).as("vb_den"))
      .withColumn("t",
        when(col("n_a") >= 2L && col("n_b") >= 2L &&
          (col("va_num") > 0L || col("vb_num") > 0L),
          ((col("sum_a") * col("n_b") - col("sum_b") * col("n_a"))
            .cast("double") / (col("n_a") * col("n_b")).cast("double")) /
            sqrt(col("va_num").cast("double") / col("va_den").cast("double")
              + col("vb_num").cast("double") / col("vb_den").cast("double")))
          .otherwise(lit(-99d)))
  }

  /** L327 — JONCKHEERE–TERPSTRA ORDERED-ALTERNATIVE TEST: the
    * k-sample trend test for UNPAIRED groups in a hypothesized order
    * (does quality rise across crawl snapshots 1..k?) — the sibling
    * of Page's trend (L298, which needs paired blocks) built from
    * pairwise Mann–Whitney counts: J = Σ_{g<h} U_gh. DOUBLED J
    * (2·#{x<y} + #{x=y} summed over ordered group pairs) is an exact
    * integer from the per-group distinct-value tables (domain-bounded,
    * the L229 posture); μ2 = (N² − Σn_g²)/2 is always integral; the
    * classic untied variance var = [N²(2N+3) − Σn_g²(2n_g+3)]/72
    * (ties allowed in J, documented contract — the pageTrend stance);
    * z = ((J2 − μ2)/2) / sqrt(var_num/72), the fixed IEEE tree.
    * groupCol must be 1..k (validated).
    *
    * Output: one row (n, k, j2, mu2, var_num, z).
    */
  def jonckheereTerpstra(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val base = df.select(col(groupCol).cast("long").as("g"),
      integralChecked(col(valCol), "jonckheereTerpstra").as("v"))
    val vc = base.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val sizes = base.groupBy(col("g")).agg(count(lit(1)).as("ng"))
    val gate = sizes.agg(count(lit(1)).as("k"), min(col("g")).as("g_lo"),
      max(col("g")).as("g_hi"), sum(col("ng")).as("n"),
      sum(col("ng") * col("ng")).as("sum_ng_sq"),
      sum(col("ng") * col("ng") * (lit(2L) * col("ng") + 3L))
        .as("sum_ng_var"))
    val a = vc.select(col("g").as("ga"), col("v").as("va"), col("c").as("ca"))
    val b = vc.select(col("g").as("gb"), col("v").as("vb"), col("c").as("cb"))
    val j2 = a.join(b, col("ga") < col("gb"))
      .select(
        when(col("va") < col("vb"), lit(2L) * col("ca") * col("cb"))
          .when(col("va") === col("vb"), col("ca") * col("cb"))
          .otherwise(lit(0L)).as("term"))
      .agg(coalesce(sum(col("term")), lit(0L)).as("j2"))
    j2.crossJoin(broadcast(gate))
      .select(
        when(col("g_lo") =!= 1L || col("g_hi") =!= col("k"),
          raise_error(lit("jonckheereTerpstra: groups must be a " +
            "complete 1..k order")).cast("long"))
          .otherwise(col("n")).as("n"),
        col("k"), col("j2"),
        expr("(n * n - sum_ng_sq) div 2L").as("mu2"),
        (col("n") * col("n") * (lit(2L) * col("n") + 3L)
          - col("sum_ng_var")).as("var_num"))
      .withColumn("z", when(col("var_num") > 0L,
        ((col("j2") - col("mu2")).cast("double") / lit(2.0)) /
          sqrt(col("var_num").cast("double") / lit(72.0)))
        .otherwise(lit(0d)))
  }

  /** L325 — DETERMINISTIC BOOTSTRAP CI of the mean (Efron 1979, with
    * the randomness replaced by a public hash — the L131 Feistel
    * stance applied to resampling): B replicates each draw n items
    * WITH replacement, draw (b, i) reading item H(b,i) mod n where H
    * is the first 15 hex digits of md5 — a pure column expression
    * both engines evaluate identically, so the "random" resample is
    * REPRODUCIBLE across runs, engines, and restarts (a property real
    * bootstrap pipelines give up the moment they call rand()). Means
    * are exact e6-floored integers; the CI bounds are the loIdx-th /
    * hiIdx-th ORDER STATISTICS of the B replicate means (exact, not
    * interpolated — documented convention). Ids must be contiguous
    * 0..n−1 (validated loudly: H mod n must hit every item).
    *
    * Scale shape: the draw table is B·n rows built by an explode —
    * embarrassingly parallel, one equi-join on the drawn id, one
    * B-group rollup; B is a constant (≤ 1000, validated), so this is
    * linear in the sample with no shuffle wider than B groups.
    *
    * Output: one row (n, b, mean_e6, lo_e6, hi_e6).
    */
  def bootstrapMeanCI(df: DataFrame, idCol: String, valCol: String,
      b: Int, loIdx: Int, hiIdx: Int): DataFrame = {
    require(b >= 10 && b <= 1000, s"b must be 10..1000, got $b")
    require(loIdx >= 1 && hiIdx <= b && loIdx < hiIdx,
      s"order-statistic indices out of range: $loIdx..$hiIdx of $b")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).cast("long").as("i"),
      integralChecked(col(valCol), "bootstrapMeanCI").as("v"))
    val n = base.agg(count(lit(1)).as("n"), min(col("i")).as("i_lo"),
      max(col("i")).as("i_hi"))
    val gated = base.crossJoin(broadcast(n))
      .select(
        when(col("i_lo") =!= 0L || col("i_hi") =!= col("n") - 1L,
          raise_error(lit("bootstrapMeanCI: ids must be contiguous " +
            "0..n-1")).cast("long")).otherwise(col("i")).as("i"),
        col("v"), col("n"))
    val draws = gated
      .select(col("n"), col("i"), explode(sequence(lit(0), lit(b - 1)))
        .as("rep"))
      .select(col("n"), col("rep"),
        pmod(conv(substring(md5(concat(col("rep").cast("string"), lit("_"),
          col("i").cast("string"))), 1, 15), 16, 10).cast("long"),
          col("n")).as("draw"))
    val means = draws
      .join(gated.select(col("i").as("draw"), col("v")), Seq("draw"))
      .groupBy(col("rep"))
      .agg(first(col("n")).as("n"),
        expr("(1000000L * sum(v)) div first(n)").as("rep_mean_e6"))
    val ranked = means.withColumn("r",
      row_number().over(Window.orderBy(col("rep_mean_e6"), col("rep"))))
    val overall = gated.agg(first(col("n")).as("n"),
      expr("(1000000L * sum(v)) div first(n)").as("mean_e6"))
    overall.crossJoin(broadcast(
        ranked.filter(col("r") === loIdx)
          .select(col("rep_mean_e6").as("lo_e6"))))
      .crossJoin(broadcast(
        ranked.filter(col("r") === hiIdx)
          .select(col("rep_mean_e6").as("hi_e6"))))
      .select(col("n"), lit(b.toLong).as("b"), col("mean_e6"),
        col("lo_e6"), col("hi_e6"))
  }

  /** L320 — B-CUBED CLUSTERING EVALUATION (Bagga & Baldwin 1998): the
    * per-ITEM precision/recall view of a clustering against gold
    * classes — unlike ARI/purity (L218) it weights every item equally
    * and punishes both over-merging (precision) and over-splitting
    * (recall), which is why dedup-cluster audits report it. For item i
    * in cluster k with class j: P_i = c_kj/n_k, R_i = c_kj/m_j — all
    * items in the same (k,j) cell share the value, so the whole metric
    * is one cell rollup: total_p_e6 = Σ_cells c_kj·((c_kj·10⁶) div
    * n_k), p_e6 = total div N (floored fixed-point, deterministic,
    * the oracle replays the identical floors); F1 one more integer
    * fold: f_e6 = (2·p_e6·r_e6) div (p_e6 + r_e6).
    *
    * Scale shape: one (cluster, class) rollup + two broadcast-size
    * side rollups — nothing pairwise, the exact-by-cell factoring.
    *
    * Output: one row (n, n_clusters, n_classes, p_e6, r_e6, f_e6).
    */
  def bcubed(df: DataFrame, clusterCol: String,
      classCol: String): DataFrame = {
    val cells = df.select(col(clusterCol).as("k"), col(classCol).as("j"))
      .groupBy(col("k"), col("j")).agg(count(lit(1)).as("c"))
    val byK = cells.groupBy(col("k")).agg(sum(col("c")).as("nk"))
    val byJ = cells.groupBy(col("j")).agg(sum(col("c")).as("mj"))
    cells
      .join(broadcast(byK), Seq("k")).join(broadcast(byJ), Seq("j"))
      .agg(sum(col("c")).as("n"),
        countDistinct(col("k")).as("n_clusters"),
        countDistinct(col("j")).as("n_classes"),
        sum(col("c") * expr("(c * 1000000L) div nk")).as("tp"),
        sum(col("c") * expr("(c * 1000000L) div mj")).as("tr"))
      .select(col("n"), col("n_clusters"), col("n_classes"),
        expr("tp div n").as("p_e6"), expr("tr div n").as("r_e6"))
      .withColumn("f_e6",
        when(col("p_e6") + col("r_e6") > 0L,
          expr("(2L * p_e6 * r_e6) div (p_e6 + r_e6)")).otherwise(lit(0L)))
  }

  /** L304 — KAPLAN–MEIER PRODUCT-LIMIT SURVIVAL: how long does a
    * document LIVE in the corpus? — the estimator a recrawl/refresh
    * audit runs over page lifetimes when some pages are still alive
    * at observation end (right-censored — dropping them biases naive
    * lifetime means; KM is the standard fix). At each distinct event
    * time t: n_risk = N − (departures before t), d = events at t, and
    * survival steps s ← (s·(n_risk−d)) div n_risk — an e6 integer
    * fold (error < 1e-6 per step, DETERMINISTIC; the oracle replays
    * the identical recurrence via a recursive CTE — an independent
    * mechanism). Censor-only times keep s unchanged (d = 0), the
    * classic KM step-only-at-events shape, but stay in the output as
    * the n_risk ledger.
    *
    * Scale shape: distinct-time rollup (domain-bounded, the L229
    * posture) + one ordered fold over the collected time table —
    * bounded by DISTINCT TIMES, not rows; documented contract.
    *
    * Output: one row per distinct time (t, n_risk, d, c, s_e6).
    */
  def kaplanMeier(df: DataFrame, timeCol: String,
      eventCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(
      integralChecked(col(timeCol), "kaplanMeier").as("t"),
      when(col(eventCol).isNull,
        raise_error(lit("kaplanMeier: null event flag")).cast("long"))
        .otherwise(col(eventCol).cast("boolean").cast("long")).as("e"))
    val byT = base.groupBy(col("t"))
      .agg(sum(col("e")).as("d"), sum(lit(1L) - col("e")).as("c"))
      .withColumn("n_risk",
        sum(col("d") + col("c")).over(
          Window.orderBy(col("t"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    byT.agg(
        aggregate(
          sort_array(collect_list(struct(col("t").as("t"),
            col("n_risk").as("nr"), col("d").as("d"), col("c").as("c")))),
          struct(lit(1000000L).as("s"),
            array().cast("array<struct<t:bigint,nr:bigint,d:bigint," +
              "c:bigint,s_e6:bigint>>").as("rows")),
          (acc, x) => {
            // integral divide inside a lambda: (a − a mod b)/b, exact
            // for 0 ≤ a < 2^53 (s ≤ 1e6, nr ≤ N keeps a well inside)
            val a = acc.getField("s") * (x.getField("nr") - x.getField("d"))
            val sNext =
              ((a - pmod(a, x.getField("nr"))) / x.getField("nr"))
                .cast("long")
            struct(sNext.as("s"),
              concat(acc.getField("rows"), array(struct(
                x.getField("t").as("t"), x.getField("nr").as("nr"),
                x.getField("d").as("d"), x.getField("c").as("c"),
                sNext.as("s_e6")))).as("rows"))
          },
          acc => acc.getField("rows")).as("rows"))
      .select(explode(col("rows")).as("r"))
      .select(col("r.t").as("t"), col("r.nr").as("n_risk"),
        col("r.d").as("d"), col("r.c").as("c"), col("r.s_e6").as("s_e6"))
  }
}
