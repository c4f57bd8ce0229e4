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
    * Output: (file, t_ref, t_hyp, t_both, t_correct, t_miss, t_fa,
    * t_conf, der) with der = (miss+fa+conf)/t_ref as the single
    * exact-integer division.
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
      .agg(sum(col("e_r") - col("s_r")).as("t_ref"))
    val th = h.groupBy(col("f"))
      .agg(sum(col("e_h") - col("s_h")).as("t_hyp"))
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
    tr.join(th, Seq("f"), "left")
      .join(both, Seq("f"), "left")
      .join(correct, Seq("f"), "left")
      .select(col("f").as("file"), col("t_ref"),
        coalesce(col("t_hyp"), lit(0L)).as("t_hyp"),
        coalesce(col("t_both"), lit(0L)).as("t_both"),
        coalesce(col("t_correct"), lit(0L)).as("t_correct"))
      .withColumn("t_miss", col("t_ref") - col("t_both"))
      .withColumn("t_fa", col("t_hyp") - col("t_both"))
      .withColumn("t_conf", col("t_both") - col("t_correct"))
      .withColumn("der",
        (col("t_miss") + col("t_fa") + col("t_conf")).cast("double")
          / col("t_ref").cast("double"))
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
      .withColumn("__match", aggregate(
        transform(array_distinct(col("__gr")), g =>
          least(size(filter(col("__gr"), x => x === g)),
            size(filter(col("__gh"), x => x === g)))),
        lit(0L), (acc, x) => acc + x))
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
}
