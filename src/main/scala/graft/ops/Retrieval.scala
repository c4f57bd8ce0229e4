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
               probes: DataFrame, k: Int, scale: Long): DataFrame =
    bm25FromToks(tokenTable(docs, idCol, textCol), idCol, probes, k, scale)

  /** The exploded (id, term) token table of a corpus — the shared
    * input of [[probeTerms]] and [[bm25TopK]]. Cached EAGERLY: the
    * token explode is the only full-corpus pass of the retrieval
    * family and it feeds four plan branches (probe df, per-doc
    * lengths, corpus totals, per-term tf) — uncached, each branch
    * re-tokenized the whole corpus (measured: r_bm25_topk ran the
    * explode 4×; one tokenize cut the r_* bm25 queries ~2× at sf0.1).
    * MEMORY_AND_DISK with LRU eviction, the dedup-path cache posture.
    */
  def tokenTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextOps.tokens(col(textCol))).as("term")).cache()
    toks.count()
    toks
  }

  /** [[probeTerms]] over a pre-built [[tokenTable]] — same result,
    * no second tokenize pass. */
  def probeTermsFromToks(toks: DataFrame, idCol: String,
                         minLen: Int, k: Int): DataFrame =
    toks.where(length(col("term")) >= minLen)
      .distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term")).limit(k)
      .select(col("term"))

  /** [[bm25TopK]] over a pre-built [[tokenTable]]. */
  def bm25FromToks(toks: DataFrame, idCol: String,
                   probes: DataFrame, k: Int, scale: Long): DataFrame = {
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

  /** The 1/log2(r+1) position discounts of [[ndcgAtK]], QUANTIZED to
    * e6 integers (round(10⁶/log2(r+1))). An IEEE double-weight sum is
    * association-sensitive (measured: Spark's left fold and DuckDB's
    * chain disagreed by one ulp), so the engine's integer-domain
    * policy applies: integer weights make each DCG an order-free
    * BIGINT sum — partial-agg merge order cannot perturb a bit — at
    * the price of a documented 1e-6 weight quantization, far below
    * any decision threshold a ranking eval drives.
    */
  val dcgWeightsE6: Seq[Long] = Seq(
    1000000L, 630930L, 500000L, 430677L, 386853L,
    356207L, 333333L, 315465L, 301030L, 289065L)

  /** L147 — RANKING-QUALITY EVALUATION, nDCG@k (Järvelin & Kekäläinen
    * 2002): the standard graded-relevance metric a retrieval stack
    * reports for every index/ranker change — here closing the loop on
    * [[bm25TopK]] (and the ANN top-k family): given per-query ranked
    * results with integer relevance grades, emit DCG, the ideal DCG of
    * the same grade multiset, and their ratio.
    *
    * Exactness: grades are BIGINTs and the [[dcgWeightsE6]] discounts
    * are integers, so dcg_e6/idcg_e6 are order-free exact sums; nDCG
    * is their single double division. A query whose grades are all
    * zero reports nDCG 0 (not NULL) — the convention that keeps means
    * well-defined.
    *
    * Scale shape: one row_number window per query for the ideal
    * ordering plus one keyed aggregation — nothing quadratic; k is a
    * small constant and the weight lookup is a literal array index.
    *
    * Input: (queryCol, rankCol 1-based, relCol) rows, ≤ one row per
    * (query, rank). Output: (query, dcg_e6, idcg_e6, ndcg).
    */
  def ndcgAtK(ranked: DataFrame, queryCol: String, rankCol: String,
              relCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= dcgWeightsE6.length,
      s"k must be in 1..${dcgWeightsE6.length}, got $k")
    val wArr = array(dcgWeightsE6.take(k).map(lit): _*)
    val ideal = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryCol)).orderBy(col(relCol).desc, col(rankCol))
    val agg = ranked.filter(col(rankCol) <= k)
      .withColumn("__ir", row_number().over(ideal))
      .groupBy(col(queryCol))
      .agg(
        sum(col(relCol) * element_at(wArr, col(rankCol).cast("int")))
          .as("dcg_e6"),
        sum(col(relCol) * element_at(wArr, col("__ir"))).as("idcg_e6"))
    agg.select(col(queryCol), col("dcg_e6"), col("idcg_e6"),
      when(col("idcg_e6") > 0L,
        col("dcg_e6").cast("double") / col("idcg_e6").cast("double"))
        .otherwise(lit(0d)).as("ndcg"))
  }

  /** L219 — AVERAGE PRECISION @ k (the binary-relevance companion to
    * [[ndcgAtK]]): AP is the area under the precision-recall curve of
    * one ranked list — the retrieval metric that, unlike nDCG,
    * punishes EVERY relevant document pushed below an irrelevant one
    * with weight 1/rank. Reported per query; the macro mean over
    * queries is MAP.
    *
    * Exactness: precision at each relevant rank is e6-FLOORED
    * ((tp_k·10⁶) div k — the defined-fold discipline both engines
    * replay), summed exactly, then divided by the relevant count with
    * one more floor. A grade > 0 counts as relevant (binary
    * collapse, the TREC convention for graded corpora). No relevant
    * docs in the ranking → ap_e6 = −1, loud.
    *
    * Scale shape: one cumulative window per query over ≤ k rows + one
    * keyed agg — the ndcg shape.
    *
    * Input: (queryCol, rankCol 1-based, relCol ≥ 0) rows. Output:
    * (query, n_ranked, n_rel, ap_e6).
    */
  def averagePrecisionAtK(ranked: DataFrame, queryCol: String,
      rankCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryCol)).orderBy(col(rankCol))
    ranked.filter(col(rankCol) <= k)
      .withColumn("__b", (col(relCol) > 0L).cast("long"))
      .withColumn("__tp", sum(col("__b")).over(w))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_ranked"), sum(col("__b")).as("n_rel"),
        sum(when(col("__b") === 1L,
          expr(s"(__tp * 1000000L) div $rankCol")).otherwise(0L))
          .as("__sp"))
      .withColumn("ap_e6",
        when(col("n_rel") > 0L, expr("__sp div n_rel")).otherwise(lit(-1L)))
      .drop("__sp")
  }

  /** L282 — EXPECTED RECIPROCAL RANK @ k (Chapelle et al., CIKM 2009):
    * the cascade-model ranking metric next to [[ndcgAtK]] — a user
    * scans down the list and stops at rank r with probability
    * R_r·Π_{i<r}(1−R_i), R = (2^g−1)/2^gmax; ERR = Σ (1/r)·P(stop=r).
    * Unlike nDCG, a satisfying result ABOVE hides everything below —
    * the metric that punishes near-dup results at the top.
    *
    * Exactness: with gmax=3, R_r = n_r/8 (n ∈ {0,1,3,7}), so
    * S·ERR = Σ (2520/r)·8^(k−r)·n_r·Π_{i<r}(8−n_i) with S = 2520·8^k
    * is EXACT integer arithmetic (2520 = lcm(1..10) makes every
    * 2520/r integral; the 8-power ladder is a literal array — no pow,
    * no float). The cumulative no-stop product runs in ONE aggregate
    * HOF fold over the ≤ k collected ranks; the SQL mirror re-derives
    * the same product via a window `product()` — an independent
    * mechanism. `err` itself is the single division err_s/S.
    *
    * Input: (queryCol, rankCol 1-based contiguous ≤ k, gradeCol
    * 0..3 — out-of-contract grades raise, and so do duplicate or
    * gapped ranks: distinct count, min and max are checked per query,
    * which pins the rank multiset to exactly {1..n}). Output:
    * (query, n_ranked, err_s, err).
    */
  def errAtK(ranked: DataFrame, queryCol: String, rankCol: String,
      gradeCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 10, s"k must be 1..10, got $k")
    val g = col(gradeCol)
    val nSat = when(g.isNull || g < 0L || g > 3L,
      raise_error(concat(lit("errAtK: grade out of 0..3: "),
        coalesce(g.cast("string"), lit("null")))).cast("long"))
      .otherwise(element_at(array(lit(0L), lit(1L), lit(3L), lit(7L)),
        g.cast("int") + 1))
    // 8^(k-r) for r = 1..k, a literal ladder (exact, no pow)
    val w8 = array((1 to k).map(r => lit(1L << (3 * (k - r)))): _*)
    val sTotal = 2520L * (1L << (3 * k))
    ranked.filter(col(rankCol) <= k)
      .select(col(queryCol), col(rankCol).cast("long").as("__r"),
        nSat.as("__n"))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_ranked"),
        min(col("__r")).as("__rmin"), max(col("__r")).as("__rmax"),
        countDistinct(col("__r")).as("__rdist"),
        aggregate(
          sort_array(collect_list(struct(col("__r").as("rank"),
            col("__n").as("n")))),
          struct(lit(0L).as("err_s"), lit(1L).as("prod")),
          (acc, x) => struct(
            (acc.getField("err_s") +
              (lit(2520L) / x.getField("rank")).cast("long") *
              element_at(w8, x.getField("rank").cast("int")) *
              x.getField("n") * acc.getField("prod")).as("err_s"),
            (acc.getField("prod") * (lit(8L) - x.getField("n")))
              .as("prod")),
          acc => acc.getField("err_s")).as("err_s"))
      // Rank contract gate: n distinct values with min 1 and max n IS
      // {1..n} (pigeonhole) — duplicates or gaps would otherwise fold
      // into a wrong-but-deterministic err_s silently.
      .select(col(queryCol), col("n_ranked"),
        when(col("__rmin") =!= 1L || col("__rmax") =!= col("n_ranked") ||
            col("__rdist") =!= col("n_ranked"),
          raise_error(concat(lit("errAtK: rankCol must be 1-based " +
            "contiguous distinct per query; got min="), col("__rmin"),
            lit(" max="), col("__rmax"), lit(" distinct="),
            col("__rdist"), lit(" n="), col("n_ranked"))).cast("long"))
          .otherwise(col("err_s")).as("err_s"))
      .select(col(queryCol), col("n_ranked"), col("err_s"),
        (col("err_s").cast("double") / lit(sTotal.toDouble)).as("err"))
  }
}
