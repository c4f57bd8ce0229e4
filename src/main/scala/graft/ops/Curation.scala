package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * beyond dedup/similarity: benchmark decontamination, deterministic
  * sampling, and mixture-weight allocation. All three are exact integer /
  * string-domain computations, so an external SQL engine mirrors them
  * bit-for-bit — the same oracle posture as the dedup family.
  */
object Curation {

  /** Benchmark DECONTAMINATION: flag corpus documents sharing at least
    * `minHits` distinct word n-gram shingles with ANY probe (benchmark)
    * document. The industry-standard pre-training step — training data
    * containing evaluation n-grams inflates benchmark scores, so such
    * docs are dropped or audited before training.
    *
    * Scale shape: the probe shingle set is TINY (benchmarks are a few
    * thousand rows) — the join on the shingle equi key broadcasts the
    * probe side, so the corpus streams by in one pass with no shuffle of
    * the big side; candidate volume is bounded by probe-shingle document
    * frequency, never all-pairs.
    *
    * Output: (id, n_hits = distinct contaminated shingles,
    * n_probes = distinct probe docs hit) per flagged corpus doc.
    */
  def decontaminate(corpus: DataFrame, probes: DataFrame, idCol: String,
                    textCol: String, shingleN: Int, minHits: Long): DataFrame = {
    val cs = TextOps.shingleTable(corpus, idCol, textCol, shingleN)
    val ps = TextOps.shingleTable(probes, idCol, textCol, shingleN)
      .select(col(idCol).as("probe_id"), col("shingle"))
    cs.join(broadcast(ps), "shingle")
      .groupBy(col(idCol))
      .agg(countDistinct(col("shingle")).as("n_hits"),
        countDistinct(col("probe_id")).as("n_probes"))
      .filter(col("n_hits") >= minHits)
  }

  /** Deterministic hash-gate sampling: keep a row iff the first
    * `prefixLen` hex chars of `md5(key)` sort strictly below
    * `hexUpper` — a portable, engine-independent Bernoulli gate with
    * rate `parseHex(hexUpper) / 16^prefixLen`, stable under reruns,
    * repartitions, and engine swaps (unlike `rand()` or engine-native
    * `hash()`). The standard way to cut a reproducible corpus sample.
    */
  def hashSampleGate(key: Column, hexUpper: String, prefixLen: Int): Column =
    substring(md5(key.cast("string")), 1, prefixLen) < lit(hexUpper)

  /** Mixture-weight ALLOCATION by largest remainder (Hamilton's method):
    * split an integer token `budget` across groups proportionally to
    * their token counts, exactly — allocations sum to the budget, every
    * group gets `floor(budget·tᵢ/T)` plus one extra token for the
    * `budget − Σfloor` largest remainders (ties by group key for
    * determinism). How a training run turns per-domain token counts into
    * a sampling plan. All arithmetic is exact integer (`budget·tᵢ` as
    * long — callers keep `budget ≤ 2⁶³/T`); the remainder comparison is
    * `budget·tᵢ mod T`, never a double.
    *
    * Input: (groupCol, tokensCol), ONE ROW PER GROUP — a mixing plan has
    * a handful of domains, so the single-partition windows here are
    * trivially cheap (the heavy per-doc aggregation producing the totals
    * is the caller's distributed groupBy). Output: (groupCol, tokens,
    * alloc).
    */
  def allocateBudget(totals: DataFrame, groupCol: String, tokensCol: String,
                     budget: Long): DataFrame = {
    // `div`, not `/`: Column./ on longs is DOUBLE division — inexact
    // past 2^53 and a different value domain than the SQL mirror.
    val withT = totals.select(col(groupCol), col(tokensCol).cast("long").as("tokens"))
      .withColumn("__T", sum(col("tokens")).over(Window.partitionBy()))
      .withColumn("__floor", expr(s"(${budget}L * tokens) div __T"))
      .withColumn("__rem", expr(s"(${budget}L * tokens) % __T"))
    val w = Window.partitionBy().orderBy(col("__rem").desc, col(groupCol))
    withT
      .withColumn("__rank", row_number().over(w))
      .withColumn("__leftover",
        lit(budget) - sum(col("__floor")).over(Window.partitionBy()))
      .withColumn("alloc",
        col("__floor") + when(col("__rank") <= col("__leftover"), 1L).otherwise(0L))
      .select(col(groupCol), col("tokens"), col("alloc"))
  }
}
