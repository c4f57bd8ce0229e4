package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword retrieval over the document corpus — the probe-side search
  * capability a training-data pipeline needs for corpus exploration,
  * targeted decontamination ("which documents score highest for this
  * benchmark phrase?"), and eval-set mining.
  *
  * Scoring is the BM25 family (Robertson & Walker; k1 = 6/5, b = 3/4 —
  * the canonical 1.2/0.75 as exact rationals) with the log idf replaced
  * by its log-free monotone surrogate (2(N−df)+1)/(2df+1) — the same
  * odds ratio that sits inside the BM25 log, so per-term ranking is
  * preserved while every score stays an exact integer an external SQL
  * engine reproduces bit-for-bit (same rule as TF-IDF's tf·10⁹ div df
  * surrogate in [[TextOps.tfidfTopK]]).
  */
object Retrieval {

  /** Deterministic data-derived probe terms: the `k` most document-
    * frequent tokens of length ≥ `minLen` (ties by token asc) — a
    * self-contained way to exercise retrieval without an external query
    * log. df is over distinct (doc, term); the result is ≤ k rows.
    */
  def probeTerms(docs: DataFrame, idCol: String, textCol: String,
                 minLen: Int, k: Int): DataFrame =
    docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("term"))
      .where(length(col("term")) >= minLen)
      .distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term")).limit(k)
      .select(col("term"))

  /** BM25 top-`k` documents per probe term, integer-exact.
    *
    * With N docs, T total tokens (avgdl = T/N), per-doc length dl and
    * per-(term, doc) frequency tf, the BM25 tf part
    * tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) at k1 = 6/5, b = 3/4 equals
    * 22·tf·T / (10·tf·T + 3·T + 9·N·dl) exactly (both sides multiplied
    * by 10T) — floored once at `scale` parts: s1. The idf odds ratio
    * multiplies in a second floor: score = s1·(2(N−df)+1) div (2df+1).
    * Two integer divisions, mirrored verbatim in SQL; magnitudes stay
    * under 2⁶³ while scale·22·tf·T < 2⁶³ (T ≲ 4·10¹¹ at tf ~ 100 —
    * beyond that, divide tf·T terms by a common power of ten or move
    * the products to DECIMAL(38,0) on both engines).
    *
    * Plan shape at corpus scale: one token explode feeds the dl
    * aggregate and the tf aggregate (the probe join is a broadcast
    * semi — tf rows exist only for probe terms); df and the one-row
    * corpus totals broadcast back. The per-term top-k runs as the
    * bounded-state [[graft.expr.TopKAgg]] partial-merge aggregate — at
    * most k pairs per term per map partition cross the wire, no
    * per-term window sort (hot probe terms match millions of docs).
    *
    * Output: (term, rank, doc_id, score), rank 1..k by score desc with
    * doc-id ties ascending.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               probes: DataFrame, k: Int, scale: Long): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextOps.tokens(col(textCol))).as("term"))
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val totals = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("n_toks")) // one row
    val tf = toks.join(broadcast(probes), Seq("term"))
      .groupBy(col("term"), col(idCol)).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(dl, Seq(idCol))
      .join(broadcast(dfq), Seq("term"))
      .crossJoin(broadcast(totals))
      .withColumn("s1", expr(
        s"($scale * 22 * tf * n_toks) div (10 * tf * n_toks + 3 * n_toks + 9 * n_docs * dl)"))
      .withColumn("score", expr(
        "(s1 * (2 * (n_docs - df) + 1)) div (2 * df + 1)"))
    val topk = udaf(new graft.expr.TopKAgg(k))
    scored
      .groupBy(col("term"))
      .agg(topk(col("score"), col(idCol)).as("tk"))
      .select(col("term"), posexplode(col("tk")))
      .select(col("term"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idCol), col("col.value").as("score"))
  }
}
