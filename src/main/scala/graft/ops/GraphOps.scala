package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Link-graph centrality and label-diffusion operators — the graph
  * pass of a web-scale curation pipeline (reference's corpus hygiene
  * stage generalized the way `modules/` composes per-file ops; cf.
  * `run.sh:12-19` for the stage chain the ops slot into). Both ops are
  * fixed-iteration Pregel-style loops expressed as DataFrame joins:
  * the driver composes one plan per iteration (never touches data),
  * each iteration is one equi join on the edge key plus one
  * aggregation, and lineage is truncated per round with an eager
  * `localCheckpoint` so iteration k never replays 1..k−1.
  *
  * Everything stays in the exact integer domain — fixed-point ranks
  * with floor division, integer label votes — so results are
  * bit-replayable by any engine with the same division semantics
  * (Spark `div` ≡ DuckDB `//` on non-negative BIGINT), which is what
  * makes a 2-iteration unrolled SQL oracle possible.
  */
object GraphOps {

  /** INTEGER-EXACT PAGERANK (Page/Brin/Motwani/Winograd 1999) over a
    * directed multigraph — the link-centrality quality weight of
    * web-corpus curation (OPIC/harmonic-centrality stand-ins in
    * CommonCrawl-scale pipelines rank hosts before sampling).
    *
    * Fixed-point semantics, no IEEE anywhere: every node starts at
    * `scale`; one iteration sends `floor(rank / out_degree)` along each
    * out-edge (duplicate edges are distinct conductances — multigraph
    * semantics; `out_degree` counts them) and re-seats each node at
    * `floor(scale·15/100) + floor(85·Σ incoming / 100)`. Mass routed to
    * a dangling node (no out-edges) drops out of circulation — the
    * documented deterministic choice (no teleport redistribution, which
    * would need a global scalar per iteration); ranks therefore bleed
    * slightly low in absolute terms but the ORDER — the signal curation
    * consumes — is the standard damped one. Floor division makes the
    * result identical on every engine: sums of longs are
    * order-independent, so partition count and merge order cannot
    * perturb a single bit.
    *
    * Scale shape per iteration: one shuffle join of the rank table with
    * the (edge, out-degree) table on `src` — the edge table is built
    * once, cached, and reused by every iteration so the per-round cost
    * is one shuffle of the O(|V|) rank table plus one map-side-combined
    * sum to `dst` — and one left join back to the node set. `iters` is
    * small and fixed; the loop is driver-side plan composition only.
    *
    * Input: (srcCol, dstCol) edge table. Output: (node, pr) for every
    * node appearing as an endpoint.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters must be in 1..16, got $iters")
    require(scale >= 100L, s"scale must be >= 100, got $scale")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    // (src, dst, odeg) — one build, reused by every iteration
    val eo = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("odeg")), "src")
      .localCheckpoint(true)
    val base = scale * 15L / 100L
    var ranks = nodes.withColumn("pr", lit(scale))
    var it = 0
    while (it < iters) {
      val in = eo.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("pr div odeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(in, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + expr("(85L * coalesce(s, 0L)) div 100L")).as("pr"))
        .localCheckpoint(true)
      it += 1
    }
    ranks
  }

  /** PERSONALIZED PAGERANK (Haveliwala 2002 topic-sensitive variant)
    * — the seed-expansion op of corpus curation: rank every node by
    * random-walk proximity to a TRUSTED SEED SET (known-good domains,
    * hand-audited docs), then keep/upweight the high-PPR tail. Same
    * integer fixed-point semantics as [[pageRank]] with one change:
    * the teleport/base term lands ONLY on seed nodes — seeds start at
    * `scale` and keep the `floor(scale·15/100)` restart mass, non-seeds
    * start at 0 and receive damped inflow only, so mass measures
    * proximity to the seeds rather than global centrality. Dangling
    * drop, floor division, multigraph conductance: all identical to
    * [[pageRank]], and identically bit-exact cross-engine.
    *
    * Scale shape: the seed table joins the node set once up front
    * (seed sets are small — broadcast — but the join is keyed either
    * way); per-iteration cost is exactly [[pageRank]]'s.
    *
    * Input: edges + a 1-column seed id table. Output: (node, ppr).
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, seedCol: String,
                           iters: Int, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters must be in 1..16, got $iters")
    require(scale >= 100L, s"scale must be >= 100, got $scale")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val sd = seeds.select(col(seedCol).cast("long").as("node"))
      .distinct().withColumn("__seed", lit(1))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .join(sd, Seq("node"), "left")
      .select(col("node"), coalesce(col("__seed"), lit(0)).as("seed"))
      .localCheckpoint(true)
    val eo = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("odeg")), "src")
      .localCheckpoint(true)
    val base = scale * 15L / 100L
    var ranks = nodes.withColumn("pr",
      when(col("seed") === 1, lit(scale)).otherwise(lit(0L)))
    var it = 0
    while (it < iters) {
      val in = eo.join(ranks.select(col("node"), col("pr")), col("src") === col("node"))
        .select(col("dst"), expr("pr div odeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(in, col("node") === col("dst"), "left")
        .select(col("node"), col("seed"),
          (when(col("seed") === 1, lit(base)).otherwise(lit(0L)) +
            expr("(85L * coalesce(s, 0L)) div 100L")).as("pr"))
        .localCheckpoint(true)
      it += 1
    }
    ranks.select(col("node"), col("pr").as("ppr"))
  }

  /** SYNCHRONOUS LABEL PROPAGATION (Raghavan et al. 2007) over an
    * undirected pair graph — the community-refinement pass downstream
    * of a near-dup candidate graph: where connected components
    * transitively glue everything a chain touches (one spurious LSH
    * edge merges two clusters), LPA votes, so a cluster absorbs a node
    * only when the MAJORITY of its neighbors agree — the standard
    * chain-breaker between `minhashLshPairs` and canonical selection.
    *
    * Deterministic by construction: labels start as node ids; every
    * iteration each node adopts the neighbor label with the highest
    * vote count, ties to the SMALLEST label, all nodes updating from
    * the PREVIOUS iteration's labels (synchronous — no asynchronous
    * scan-order dependence). Duplicate pairs vote once per occurrence.
    * Integer domain throughout; a fixed `iters` unrolls to SQL exactly.
    *
    * Scale shape per iteration: one shuffle join of the O(|V|) label
    * table against the cached symmetrized edge table on the neighbor
    * key, one count aggregation on (node, label), and one row_number
    * argmax partitioned by node — every stage keyed, nothing quadratic,
    * hot nodes bounded by their degree (the LSH `maxPairDf`-style caps
    * upstream bound degree before this op ever sees the graph).
    *
    * Input: (aCol, bCol) undirected pairs. Output: (node, label) for
    * every node with at least one pair.
    */
  def labelPropagation(pairs: DataFrame, aCol: String, bCol: String,
                       iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters must be in 1..16, got $iters")
    val sym = pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .unionByName(
        pairs.select(col(bCol).cast("long").as("u"), col(aCol).cast("long").as("v")))
      .localCheckpoint(true)
    var lbl = sym.select(col("u").as("node")).distinct()
      .withColumn("lbl", col("node"))
    val byVotes = Window.partitionBy(col("node"))
      .orderBy(col("cnt").desc, col("lbl"))
    var it = 0
    while (it < iters) {
      val votes = sym.join(lbl.select(col("node").as("v"), col("lbl")), "v")
        .groupBy(col("u").as("node"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
      lbl = votes.withColumn("__rn", row_number().over(byVotes))
        .filter(col("__rn") === 1)
        .select(col("node"), col("lbl"))
        .localCheckpoint(true)
      it += 1
    }
    lbl
  }
}
