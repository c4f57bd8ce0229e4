package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.Polyval
import graft.ops.{Curation, Dedup, EventAnalytics, GraphOps, MLlibOps, Multimodal, Retrieval, SegmentAlgebra, SegmentOps, Similarity, TextOps}

/** Driver contract (see SURVEY.md §7): one `queries` entry per implemented
  * operator from SURVEY §2, each with a DuckDB-equivalent `oracleSql`.
  *
  * Determinism policy: every oracle-checked value is computed in an exact
  * integer domain — epoch-microseconds for time (`events.ts` is read as a
  * long of nanos, equal to DuckDB's `epoch_us(ts)`) and scaled integer
  * cents/e4/e6 for money (scaled so the true decimal value is integral
  * before rounding). Doubles only appear as single divisions of two exact
  * integers, which IEEE-754 evaluates identically in both engines. Every
  * query ends in a total deterministic ORDER BY.
  */
object SparkEntry {

  private val HOUR_US = 3600L * 1000000L

  /** events as (user_id, event_id, tus, cents) point rows; time in exact
    * integer microseconds (= DuckDB `epoch_us(ts)`).
    */
  private def evPoints(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    ev.select(
      col("user_id"), col("event_id"), col("event_type"),
      Tables.tsUs(ev).as("tus"),
      round(col("value") * 100d).cast("long").as("cents"))
  }

  private val evPointsSqlCte =
    """e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
      |  CAST(round(value*100) AS BIGINT) AS cents FROM events)""".stripMargin

  /** The derived event link graph shared by the L115/L117 centrality
    * oracles: browse-chain edges (each event → the user's next) plus
    * type-hub edges (each event → the earliest event of its type), with
    * node set and out-degrees. Mirrors the Spark-side derivation in
    * `g_pagerank`/`g_ppr` exactly.
    */
  private val eventGraphSqlCte =
    s"""$evPointsSqlCte,
       |ch AS (SELECT event_id AS src, lead(event_id) OVER (
       |    PARTITION BY user_id ORDER BY tus, event_id) AS dst FROM e),
       |hb AS (SELECT event_type, MIN(event_id) AS hub FROM e GROUP BY 1),
       |ed AS (SELECT src, dst FROM ch WHERE dst IS NOT NULL
       |  UNION ALL SELECT e.event_id AS src, hb.hub AS dst
       |    FROM e JOIN hb USING (event_type) WHERE e.event_id <> hb.hub),
       |nd AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM ed UNION ALL SELECT dst AS node FROM ed)),
       |od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS odeg FROM ed GROUP BY 1)""".stripMargin

  /** The L119/L122 shot-detection oracle — the cut/cumsum/rollup chain
    * over the synthesized frame hashes; shared by the batch query and
    * the run-to-completion streaming twin.
    */
  private val shotOracleSql =
    """WITH f AS (SELECT doc_id, unnest(range(0, 24 + doc_id % 17)) AS frame
      |  FROM documents WHERE doc_id < 500),
      |h AS (SELECT doc_id, frame,
      |  (doc_id % 256) * 4294967296 + CASE ((frame // 8) % 4)
      |    WHEN 0 THEN 0 WHEN 1 THEN 4080 WHEN 2 THEN 65280
      |    ELSE 16711680 END + (frame % 2) AS fhash FROM f),
      |c AS (SELECT doc_id, frame, CASE WHEN lag(fhash) OVER w IS NULL THEN 1
      |    WHEN bit_count(xor(lag(fhash) OVER w, fhash)) > 3 THEN 1 ELSE 0 END AS cut
      |  FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY frame)),
      |sid AS (SELECT doc_id, frame, CAST(SUM(cut) OVER (
      |    PARTITION BY doc_id ORDER BY frame) AS BIGINT) AS shot_id FROM c)
      |SELECT doc_id, shot_id, MIN(frame) AS key_frame,
      |  CAST(COUNT(*) AS BIGINT) AS n_frames
      |FROM sid GROUP BY doc_id, shot_id
      |ORDER BY doc_id, shot_id""".stripMargin

  private val evIntervalsSqlCte =
    """i AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS s_us,
      |  epoch_us(ts) + CAST(round(value*1.0E6) AS BIGINT) AS e_us,
      |  CAST(round(value*100) AS BIGINT) AS cents FROM events)""".stripMargin

  /** Merged interval chunks per user (gap 1 h), the W1 interval-union CTE
    * shared by several queries.
    */
  private def chunks(s: SparkSession, dir: String): DataFrame =
    SegmentOps.coalesceIntervals(
        Tables.eventIntervals(s, dir), "user_id", "s_us", "e_us", "event_id",
        lit(HOUR_US))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("s_us")).as("start_us"), max(col("e_us")).as("end_us"),
        count(lit(1)).as("n_merged"))

  private val chunksSqlCte =
    s"""$evIntervalsSqlCte,
       |cf AS (SELECT user_id, event_id, s_us, e_us,
       |  MAX(e_us) OVER (PARTITION BY user_id ORDER BY s_us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end FROM i),
       |cg AS (SELECT user_id, event_id, s_us, e_us,
       |  CASE WHEN prev_end IS NULL OR s_us - prev_end > 3600000000 THEN 1 ELSE 0 END AS newflag FROM cf),
       |cs AS (SELECT user_id, s_us, e_us,
       |  CAST(SUM(newflag) OVER (PARTITION BY user_id ORDER BY s_us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM cg),
       |ch AS (SELECT user_id, session_id, MIN(s_us) AS start_us, MAX(e_us) AS end_us,
       |  COUNT(*) AS n_merged FROM cs GROUP BY user_id, session_id)""".stripMargin

  // ---------------------------------------------------------------------
  // Flagship: 5-table star join with broadcast dims (driver smoke check).
  // ---------------------------------------------------------------------
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(round(col("l_extendedprice") * (lit(1d) - col("l_discount")) * 10000d)
          .cast("long")).as("revenue_e4"))
      .orderBy(col("r_name"), col("o_orderpriority"))
  }

  // ---------------------------------------------------------------------
  // Query registry. Names carry the SURVEY §2 operator ids they cover.
  // ---------------------------------------------------------------------
  private case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      sql: Option[String])

  /** Best-effort recursive delete of the one-shot streaming staging and
    * checkpoint dirs a query created: once the AvailableNow run has
    * terminated, the result lives entirely in the memory sink, so
    * nothing on disk needs to outlive the stream (a Verify/Bench session
    * runs many queries — without the janitor every run leaks its temp
    * trees).
    */
  private def cleanupDirs(paths: java.nio.file.Path*): Unit =
    paths.foreach { p =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      } catch { case _: Exception => () }
    }

  /** Session-lifetime cache of staged streaming-source directories. The
    * file-stream source consumes a DIRECTORY, so the batch parquet gets
    * staged into a temp dir; staging used to run per query — at sf0.1
    * the 14 streaming queries re-wrote the same documents/events tables
    * eleven times, a fixed ~1 s floor each. Staged once per
    * (tag, sf dir) per JVM now, shared by every query that streams the
    * same shape, deleted at JVM exit instead of per query.
    */
  private val streamStageCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Session-keyed cache of the streaming-familiarity LM model tables
    * (bigram counts, unigram counts, vocab) — deterministic per corpus.
    * Keyed by the SparkSession INSTANCE (identity equality), never by a
    * hash: identityHashCode can collide across sessions and would hand
    * a new session DataFrames bound to a stopped one. Sessions per JVM
    * are few (one in Verify/Bench), so the pin is bounded.
    */
  private val lmModelCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      (DataFrame, DataFrame, DataFrame)]()

  /** Session-lifetime memo of the two intermediates the dedup family
    * shares: the full-corpus 3-gram shingle table (eight queries) and
    * the 8-band J≥0.5 MinHash pair graph (five queries). One
    * tokenize+explode+distinct and one LSH candidate+verify per
    * session instead of one per query. Keyed by the SparkSession
    * INSTANCE + sf dir (identity, cf. lmModelCache); two separate maps
    * because the pair loader calls the shingle loader (nested
    * computeIfAbsent on one ConcurrentHashMap throws).
    */
  private val shingleMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val minhashPairMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def sessionShingles(s: SparkSession, dir: String): DataFrame =
    shingleMemo.computeIfAbsent((s, dir), { _ =>
      val sd = graft.ops.TextOps.shingleTable(
        Tables.documents(s, dir), "doc_id", "text", 3).cache()
      sd.count()
      sd
    })

  private def sessionMinhashPairs(s: SparkSession, dir: String): DataFrame =
    minhashPairMemo.computeIfAbsent((s, dir), { _ =>
      val p = graft.ops.Dedup.minhashLshPairs(
        sessionShingles(s, dir), "doc_id", 8, 0.5).cache()
      p.count()
      p
    })

  /** The CC labels over [[sessionMinhashPairs]] — four queries
    * (components, source_flow, canonical_best, leakage split) each ran
    * the full O(log² n) star-contraction loop on the same graph; one
    * run per session now. Separate map: the loader calls
    * sessionMinhashPairs (same nesting rule as above).
    */
  private val ccLabelMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def sessionCcLabels(s: SparkSession, dir: String): DataFrame =
    ccLabelMemo.computeIfAbsent((s, dir), { _ =>
      val cc = graft.ops.Dedup.connectedComponents(
        sessionMinhashPairs(s, dir), "a", "b")
        .withColumnRenamed("id", "doc_id").cache()
      cc.count()
      cc
    })

  /** Session-lifetime memo of the IVF family's shared intermediates
    * (same key/nesting rules as the shingle memos): the quantized
    * full-corpus embedding table, the rank-1 cell assignment over it,
    * and the verified cos≥0.45 same-cell pair set. dedup_semdedup and
    * dedup_embedding_ivf consume the SAME pair table; the profile reads
    * the assignment; the recall audit reuses the assignment restricted
    * to its bounded slice (rank-1 assignment is row-local given the
    * broadcast seeds, so the restriction is exact).
    */
  private val quantEmbMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val ivfCellMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val ivfPairMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def sessionQuantEmb(s: SparkSession, dir: String): DataFrame =
    quantEmbMemo.computeIfAbsent((s, dir), { _ =>
      val q = Similarity.quantize(
        Tables.embeddings(s, dir), "vec_id", "embedding").cache()
      q.count()
      q
    })

  private def sessionIvfCells(s: SparkSession, dir: String): DataFrame =
    ivfCellMemo.computeIfAbsent((s, dir), { _ =>
      val c = Similarity.ivfCells(sessionQuantEmb(s, dir), "vec_id").cache()
      c.count()
      c
    })

  private def sessionIvfPairs(s: SparkSession, dir: String): DataFrame =
    ivfPairMemo.computeIfAbsent((s, dir), { _ =>
      val p = Similarity.verifyPairs(
        Similarity.ivfCandidatesFrom(sessionIvfCells(s, dir), "vec_id"),
        sessionQuantEmb(s, dir), "vec_id", 0.45).cache()
      p.count()
      p
    })

  /** One BPE training run per session serves induction (t_bpe_merges)
    * AND application (t_bpe_encode) — same key rules as the shingle
    * memos. Value = (merge-rule table: a driver-local relation; fully
    * merged word table: already eagerly localCheckpoint-materialized
    * by the training loop, nothing further to cache).
    */
  private val bpeMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (DataFrame, DataFrame)]()

  private def sessionBpe(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    bpeMemo.computeIfAbsent((s, dir), { _ =>
      TextOps.bpeTrainFull(Tables.documents(s, dir), "text", 4)
    })

  /** Session-lifetime token-count fixture service driving
    * `svc_batch_inference` (one loopback server per JVM, closed at
    * exit). Wire: request `tag TAB doc_id TAB b64(text)` → response
    * `doc_id TAB n_tok`; any body containing the POISON tag answers 500
    * unconditionally (the injected-fault leg).
    */
  private lazy val tokenCountService: graft.pipeline.LineService = {
    val svc = new graft.pipeline.LineService(
      lines => lines.map { l =>
        val f = l.split("\t", 3)
        val n = graft.pipeline.HttpInference.unb64t(f(2))
          .split(" ").count(_.nonEmpty)
        s"${f(1)}\t$n"
      },
      poisonMarker = Some("POISON\t"))
    Runtime.getRuntime.addShutdownHook(new Thread(() => svc.close()))
    svc
  }

  private def stagedStreamSource(tag: String, dir: String)(
      build: java.nio.file.Path => Unit): String =
    streamStageCache.computeIfAbsent(s"$tag|$dir", { _ =>
      val d = java.nio.file.Files.createTempDirectory(s"graft_stream_$tag")
      build(d)
      Runtime.getRuntime.addShutdownHook(new Thread(() => cleanupDirs(d)))
      d.toString
    })

  /** coalesce(1)-write `sentinel` to a temp dir, copy its single part
    * file into `dest` as `asName` (default `zz_heartbeat.parquet`,
    * sorting after every data file, so it forms the final micro-batch;
    * synthesized DATA files pass an `aa_`-prefixed name to sort first),
    * drop the temp dir. The Files.list stream is closed explicitly —
    * it holds a directory fd that would otherwise leak per staging.
    */
  private def writeHeartbeat(sentinel: DataFrame, dest: java.nio.file.Path,
                             asName: String = "zz_heartbeat.parquet"): Unit = {
    val sentDir = java.nio.file.Files.createTempDirectory("graft_stream_sent")
    sentinel.coalesce(1).write.mode("overwrite").parquet(sentDir.toString)
    val st = java.nio.file.Files.list(sentDir)
    val part =
      try st.filter(q => q.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      finally st.close()
    java.nio.file.Files.copy(part, dest.resolve(asName))
    cleanupDirs(sentDir)
  }

  /** events + one far-future purchase heartbeat row (user −1, value 0,
    * +10 days past the global max event time), staged once per session —
    * the watermark-advancing source shared by `streaming_asof` and
    * `streaming_attribution` (the sentinel purchase is a touchless
    * conversion for key −1, so attribution emits nothing for it).
    */
  private def eventsWithPurchaseHeartbeat(s: SparkSession, dir: String,
      path: String, base: DataFrame,
      schema: org.apache.spark.sql.types.StructType): String =
    stagedStreamSource("asofsrc", dir) { p =>
      linkInto(p, path, "events.parquet")
      val maxUs = base.select(Tables.tsUs(base).as("us"))
        .agg(max(col("us"))).head.getLong(0)
      val sentinel = s.range(1).select(schema.fields.toSeq.map { f => f.name match {
        case "user_id" => lit(-1L).cast(f.dataType).as("user_id")
        case "event_id" => lit(-1L).cast(f.dataType).as("event_id")
        case "event_type" => lit("purchase").as("event_type")
        case "value" => lit(0d).cast(f.dataType).as("value")
        case "ts" =>
          Tables.usToTs(lit(maxUs + 864000L * 1000000L), f.dataType).as("ts")
        case other => lit(null).cast(f.dataType).as(other)
      }}: _*)
      writeHeartbeat(sentinel, p)
    }

  /** Hardlink (copy fallback) staging of one parquet file into `d`. */
  private def linkInto(d: java.nio.file.Path, path: String, asName: String): Unit = {
    val src = java.nio.file.Paths.get(path)
    val dst = d.resolve(asName)
    try java.nio.file.Files.createLink(dst, src)
    catch { case _: Exception => java.nio.file.Files.copy(src, dst) }
  }

  /** Scope the session's shuffle-partition count down while building and
    * running one streaming query: every state-store partition writes a
    * delta + checkpoint per micro-batch, so at bench scale 32 partitions
    * of near-empty state are pure fixed overhead (measured: the state
    * checkpoint cycle dominates every streaming query's time at sf0.1).
    * The conf is read at the stream's first batch and fixes the state
    * layout for that checkpoint; production sizes it to the cluster.
    * Restores the previous value even on failure.
    */
  private def withStreamingPartitions[T](s: SparkSession)(body: => T): T = {
    Tables.tune(s) // checkpoint-manager + tz confs, whoever built the session
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, math.min(8, old.toInt).toString)
    try body finally s.conf.set(key, old)
  }

  private def registry: Seq[Q] = Seq(

    // A1/A5/A9 + S1 scan: pricing summary, exact scaled-integer money.
    Q("a1_pricing_summary",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        // literal cast to the column's own type (TIMESTAMP vs NTZ varies by
        // parquet writer) so the comparison stays same-type and pushes down
        li.filter(col("l_shipdate") <=
          lit("1998-09-02").cast(li.schema("l_shipdate").dataType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100d).cast("long")).as("sum_base_cents"),
          sum(round(col("l_extendedprice") * (lit(1d) - col("l_discount")) * 10000d)
            .cast("long")).as("sum_disc_e4"),
          sum(round(col("l_extendedprice") * (lit(1d) - col("l_discount"))
              * (lit(1d) + col("l_tax")) * 1000000d)
            .cast("long")).as("sum_charge_e6"),
          count(lit(1)).as("n"))
        .withColumn("avg_qty", col("sum_qty").cast("double") / col("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
        |  CAST(SUM(CAST(round(((l_extendedprice * (1 - l_discount)) * (1 + l_tax)) * 1000000) AS BIGINT)) AS BIGINT) AS sum_charge_e6,
        |  COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_qty
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // S1 + P2-style predicates: selective scan with pushed filters.
    Q("s1_scan_prune",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.filter(col("l_shipdate") >=
            lit("1995-01-01").cast(li.schema("l_shipdate").dataType)
          && col("l_discount").between(0.02, 0.08) && col("l_quantity") < 24)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(round(col("l_quantity")).cast("long")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.08 AND l_quantity < 24
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Large-large shuffled equi join + agg (engine inherits from Spark;
    // declared per SURVEY §2.3 coverage note).
    Q("j2_equi_agg",
      (s, dir) => Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_extendedprice") * (lit(1d) - col("l_discount")) * 10000d)
            .cast("long")).as("revenue_e4"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // J5/J7 — broadcast star join over the dimension chain.
    Q("j5_broadcast_star",
      (s, dir) => Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100d).cast("long")).as("sum_cents"))
        .orderBy(col("r_name"), col("n_name")),
      Some("""SELECT r_name, n_name, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // J7/S9 — semi + anti join (EXISTS / NOT EXISTS; the incremental-skip
    // dual of skip_if_exist).
    Q("j7_semi_anti",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
          .withColumn("tag", lit("with_orders"))
        val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
          .withColumn("tag", lit("no_orders"))
        semi.unionByName(anti).select(col("tag"), col("c_mktsegment"), col("n"))
          .orderBy(col("tag"), col("c_mktsegment"))
      },
      Some("""SELECT * FROM (
        |  SELECT 'with_orders' AS tag, c_mktsegment, COUNT(*) AS n FROM customer
        |    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) GROUP BY c_mktsegment
        |  UNION ALL
        |  SELECT 'no_orders' AS tag, c_mktsegment, COUNT(*) AS n FROM customer
        |    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) GROUP BY c_mktsegment
        |) t ORDER BY tag, c_mktsegment""".stripMargin)),

    // O4/O6 — global top-k with deterministic tie-break.
    Q("o6_topk",
      (s, dir) => Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice") * 100d).cast("long").as("cents"))
        .orderBy(col("cents").desc, col("o_orderkey"))
        .limit(15)
        .orderBy(col("cents").desc, col("o_orderkey")),
      Some("""SELECT * FROM (
        |  SELECT o_orderkey, o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders ORDER BY cents DESC, o_orderkey LIMIT 15
        |) t ORDER BY cents DESC, o_orderkey""".stripMargin)),

    // A-agg extension: rollup (grouping sets) — free from Spark, declared
    // per SURVEY §2.4 note.
    Q("a_rollup",
      (s, dir) => Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(round(col("l_quantity")).cast("long")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy(col("rf"), col("ls")),
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS n, CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin)),

    // U-ops — exact set operations (SURVEY §2.7 note).
    Q("u_setops",
      (s, dir) => {
        val ck = Tables.customer(s, dir)
          .select(col("c_nationkey").cast("long").as("k")).distinct()
        val sk = Tables.supplier(s, dir)
          .select(col("s_nationkey").cast("long").as("k")).distinct()
        ck.except(sk).withColumn("tag", lit("except"))
          .unionByName(ck.intersect(sk).withColumn("tag", lit("intersect")))
          .select(col("tag"), col("k"))
          .orderBy(col("tag"), col("k"))
      },
      Some("""SELECT * FROM (
        |  SELECT 'except' AS tag, k FROM (
        |    SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS k FROM customer
        |    EXCEPT SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS k FROM supplier) a
        |  UNION ALL
        |  SELECT 'intersect' AS tag, k FROM (
        |    SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS k FROM customer
        |    INTERSECT SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS k FROM supplier) b
        |) t ORDER BY tag, k""".stripMargin)),

    // W1 — gap-based sessionization of point events (utils.py:64-102,
    // uncapped flavor; gap = 4 h).
    Q("w1_sessionize",
      (s, dir) => SegmentOps.sessionizePoints(
          evPoints(s, dir), "user_id", "tus", "event_id", lit(4L * HOUR_US))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("tus")).as("start_us"), max(col("tus")).as("end_us"),
          count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
        .orderBy(col("user_id"), col("session_id")),
      Some(s"""WITH $evPointsSqlCte,
        |f AS (SELECT user_id, event_id, tus, cents,
        |  CASE WHEN lag(tus) OVER w IS NULL
        |         OR tus - lag(tus) OVER w > 14400000000
        |       THEN 1 ELSE 0 END AS newflag
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s AS (SELECT user_id, tus, cents,
        |  CAST(SUM(newflag) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, MIN(tus) AS start_us, MAX(tus) AS end_us,
        |  COUNT(*) AS n_events, CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin)),

    // W1 interval flavor — interval-union coalescing (the separation-
    // economy merge, separation_filter.py:168).
    Q("w1_coalesce_intervals",
      (s, dir) => chunks(s, dir)
        .select(col("user_id"), col("session_id"), col("start_us"), col("end_us"), col("n_merged"))
        .orderBy(col("user_id"), col("session_id")),
      Some(s"""WITH $chunksSqlCte
        |SELECT user_id, session_id, start_us, end_us, n_merged
        |FROM ch ORDER BY user_id, session_id""".stripMargin)),

    // J4 — adjacent-row gap construction with neighbor features
    // (separation_filter.py:108-157) as lead/lag, not a join.
    Q("j4_adjacent_gaps",
      (s, dir) => SegmentOps.adjacentGaps(
          Tables.eventIntervals(s, dir), "user_id", "s_us", "e_us", "event_id", "cents")
        .select(col("user_id"), col("prev_id"), col("gap_start"), col("gap_end"),
          col("prev_feature"), col("next_feature"),
          (col("prev_feature").cast("double") /
            (col("prev_feature") + col("next_feature")).cast("double")).as("r_prev"))
        .orderBy(col("user_id"), col("prev_id")),
      Some(s"""WITH $evIntervalsSqlCte,
        |l AS (SELECT user_id, event_id AS prev_id, s_us, e_us, cents,
        |  lead(s_us) OVER w AS next_start, lead(cents) OVER w AS next_feature
        |  FROM i WINDOW w AS (PARTITION BY user_id ORDER BY s_us, event_id))
        |SELECT user_id, prev_id, e_us AS gap_start, next_start AS gap_end,
        |  cents AS prev_feature, next_feature,
        |  CAST(cents AS DOUBLE) / CAST(cents + next_feature AS DOUBLE) AS r_prev
        |FROM l WHERE next_start IS NOT NULL AND next_start >= e_us
        |ORDER BY user_id, prev_id""".stripMargin)),

    // W6 — cumulative-sum budget cap (host_rematch.py:100-109).
    Q("w6_cumsum_cap",
      (s, dir) => SegmentOps.cumsumCap(
          Tables.orders(s, dir).select(col("o_custkey"), col("o_orderkey"),
            round(col("o_totalprice") * 100d).cast("long").as("cents")),
          "o_custkey", "cents", "o_orderkey", "cents", lit(40000000L))
        .select(col("o_custkey"), col("o_orderkey"), col("cents"), col("cum"))
        .orderBy(col("o_custkey"), col("cum")),
      Some("""WITH o AS (SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |c AS (SELECT o_custkey, o_orderkey, cents,
        |  CAST(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY cents DESC, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM o)
        |SELECT o_custkey, o_orderkey, cents, cum FROM c WHERE cum <= 40000000
        |ORDER BY o_custkey, cum""".stripMargin)),

    // W7/P7 — monotone running-max dedup (silero_vad.py:129-139).
    Q("w7_runmax_dedup",
      (s, dir) => SegmentOps.runningMaxDedup(
          evPoints(s, dir), "user_id", "tus", "event_id", "cents")
        .select(col("user_id"), col("event_id"), col("cents"))
        .orderBy(col("user_id"), col("event_id")),
      Some(s"""WITH $evPointsSqlCte,
        |m AS (SELECT user_id, event_id, cents,
        |  MAX(cents) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
        |  FROM e)
        |SELECT user_id, event_id, cents FROM m
        |WHERE runmax IS NULL OR cents > runmax
        |ORDER BY user_id, event_id""".stripMargin)),

    // A6/O4 — argmax per group with deterministic tie-break
    // (speaker_rematch.py:214-221).
    Q("a6_argmax",
      (s, dir) => evPoints(s, dir)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("cents").desc, col("event_id"))))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("cents"))
        .orderBy(col("user_id")),
      Some(s"""WITH $evPointsSqlCte,
        |r AS (SELECT user_id, event_id, cents,
        |  row_number() OVER (PARTITION BY user_id ORDER BY cents DESC, event_id) AS rn FROM e)
        |SELECT user_id, event_id, cents FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // A8 — distinct-set accumulation (silero_vad.py:130,143-144), both as
    // an exact distinct count and an order-normalized set string.
    Q("a8_distinct_sets",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(countDistinct(col("event_type")).as("n_types"),
          array_join(array_sort(collect_set(col("event_type"))), ",").as("types"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, COUNT(DISTINCT event_type) AS n_types,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // J8/W9 — sweep-line over overlapping intervals: elementary intervals
    // with active-interval counts (diarization.py:24-64; ends sort before
    // starts at boundary ties, diarization.py:39).
    Q("j8_sweepline",
      (s, dir) => SegmentOps.sweepLineCounts(
          Tables.eventIntervals(s, dir), "user_id", "s_us", "e_us")
        .orderBy(col("user_id"), col("s")),
      Some(s"""WITH $evIntervalsSqlCte,
        |b AS (SELECT user_id, s_us AS t, CAST(1 AS BIGINT) AS delta FROM i
        |      UNION ALL SELECT user_id, e_us AS t, CAST(-1 AS BIGINT) AS delta FROM i),
        |c AS (SELECT user_id, t, delta,
        |  CAST(SUM(delta) OVER w AS BIGINT) AS n_active,
        |  lead(t) OVER w AS next_t
        |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY t, delta
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, t AS s, next_t AS e, n_active FROM c
        |WHERE n_active > 0 AND next_t > t ORDER BY user_id, s""".stripMargin)),

    // J1 — interval-containment join: assign each 'click' interval to its
    // merged chunk (separation_filter.py:190-236). Equi key on user keeps
    // it a hash/SMJ join, never a nested loop.
    Q("j1_containment",
      (s, dir) => {
        val segs = Tables.eventIntervals(s, dir)
          .filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), col("s_us"), col("e_us"))
        SegmentOps.containmentJoin(segs, chunks(s, dir), "user_id",
            "s_us", "e_us", "start_us", "end_us")
          .select(col("s.user_id").as("user_id"), col("s.event_id").as("event_id"),
            col("c.start_us").as("chunk_start"), col("c.end_us").as("chunk_end"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some(s"""WITH $chunksSqlCte,
        |seg AS (SELECT user_id, event_id, s_us, e_us FROM i WHERE event_type = 'click')
        |SELECT seg.user_id AS user_id, seg.event_id AS event_id,
        |  ch.start_us AS chunk_start, ch.end_us AS chunk_end
        |FROM seg JOIN ch ON seg.user_id = ch.user_id
        |  AND seg.s_us >= ch.start_us AND seg.e_us <= ch.end_us
        |ORDER BY user_id, event_id""".stripMargin)),

    // J1 via the custom physical operator (plans/ContainmentJoin):
    // same semantics and oracle as j1_containment, executed by the
    // sorted-merge monotone-cursor SparkPlan instead of a generic join.
    Q("j1_sorted_containment",
      (s, dir) => {
        val segs = Tables.eventIntervals(s, dir)
          .filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), col("s_us"), col("e_us"))
        val ch = chunks(s, dir)
          .select(col("user_id").as("c_user"),
            col("start_us").as("chunk_start"), col("end_us").as("chunk_end"))
        graft.plans.ContainmentJoin.sortedContainmentJoin(
            segs, ch, "user_id", "c_user", "s_us", "e_us", "chunk_start", "chunk_end")
          .select(col("user_id"), col("event_id"), col("chunk_start"), col("chunk_end"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some(s"""WITH $chunksSqlCte,
        |seg AS (SELECT user_id, event_id, s_us, e_us FROM i WHERE event_type = 'click')
        |SELECT seg.user_id AS user_id, seg.event_id AS event_id,
        |  ch.start_us AS chunk_start, ch.end_us AS chunk_end
        |FROM seg JOIN ch ON seg.user_id = ch.user_id
        |  AND seg.s_us >= ch.start_us AND seg.e_us <= ch.end_us
        |ORDER BY user_id, event_id""".stripMargin)),

    // J3 — max-overlap interval join, argmax with first-max tie-break
    // (speaker_rematch.py:224-234).
    Q("j3_max_overlap",
      (s, dir) => {
        // Durations widened 100× (exact integer multiply) so intervals of
        // different types genuinely overlap and the argmax is exercised.
        val ev = Tables.events(s, dir)
        val t = Tables.tsUs(ev)
        val i = ev.select(
          col("user_id"), col("event_id"), col("event_type"),
          t.as("s_us"),
          (t + round(col("value") * 1e6d).cast("long") * lit(100L))
            .as("e_us"))
        val a = i.filter(col("event_type") === "click")
        val b = i.filter(col("event_type") === "view")
        SegmentOps.maxOverlapJoin(a, b, "user_id", "event_id", "event_id",
            "s_us", "e_us", "s_us", "e_us")
          .select(col("l.user_id").as("user_id"), col("l.event_id").as("a_id"),
            col("r.event_id").as("b_id"), col("overlap"))
          .orderBy(col("user_id"), col("a_id"))
      },
      Some("""WITH i AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS s_us,
        |  epoch_us(ts) + CAST(round(value*1.0E6) AS BIGINT) * 100 AS e_us FROM events),
        |a AS (SELECT user_id, event_id, s_us, e_us FROM i WHERE event_type = 'click'),
        |b AS (SELECT user_id, event_id, s_us, e_us FROM i WHERE event_type = 'view'),
        |j AS (SELECT a.user_id AS user_id, a.event_id AS a_id, b.event_id AS b_id,
        |  least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS overlap
        |  FROM a JOIN b ON a.user_id = b.user_id AND a.s_us < b.e_us AND b.s_us < a.e_us),
        |r AS (SELECT user_id, a_id, b_id, overlap,
        |  row_number() OVER (PARTITION BY user_id, a_id ORDER BY overlap DESC, b_id) AS rn
        |  FROM j WHERE overlap > 0)
        |SELECT user_id, a_id, b_id, overlap FROM r WHERE rn = 1
        |ORDER BY user_id, a_id""".stripMargin)),

    // U4 — interval anti-overlap exclusion (utils.py:155-183): 'view'
    // intervals overlapping no 'error' interval of the same user.
    Q("u4_anti_overlap",
      (s, dir) => {
        val i = Tables.eventIntervals(s, dir)
        SegmentOps.antiOverlapJoin(
            i.filter(col("event_type") === "view"),
            i.filter(col("event_type") === "error"),
            "user_id", "s_us", "e_us", "s_us", "e_us")
          .select(col("user_id"), col("event_id"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some(s"""WITH $evIntervalsSqlCte
        |SELECT v.user_id AS user_id, v.event_id AS event_id
        |FROM i v WHERE v.event_type = 'view' AND NOT EXISTS (
        |  SELECT 1 FROM i n WHERE n.event_type = 'error'
        |    AND n.user_id = v.user_id AND v.s_us < n.e_us AND n.s_us < v.e_us)
        |ORDER BY user_id, event_id""".stripMargin)),

    // U4 full composite — merge-with-noisy-skipping (utils.py:155-183):
    // drop segments overlapping noise (anti-overlap), then sessionize
    // with an EXTRA break whenever a noisy interval sits inside the gap
    // between consecutive members (the reference's session split at
    // noisy boundaries).
    Q("u4_noisy_sessions",
      (s, dir) => {
        val i = Tables.eventIntervals(s, dir)
        val noisy = i.filter(col("event_type") === "error")
          .select(col("user_id").as("n_user"), col("s_us").as("n_s"), col("e_us").as("n_e"))
        val clean = SegmentOps.antiOverlapJoin(
          i.filter(col("event_type") =!= "error"),
          i.filter(col("event_type") === "error"),
          "user_id", "s_us", "e_us", "s_us", "e_us")
        val w = Window.partitionBy(col("user_id")).orderBy(col("s_us"), col("event_id"))
        val withPrev = clean.withColumn("prev_end",
          max(col("e_us")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
        val noisyBreaks = withPrev.filter(col("prev_end").isNotNull)
          .select(col("user_id"), col("event_id"), col("prev_end"), col("s_us"))
          .join(noisy, col("user_id") === col("n_user") &&
            col("n_s") >= col("prev_end") && col("n_e") <= col("s_us"), "left_semi")
          .select(col("user_id"), col("event_id"))
          .withColumn("noisy_break", lit(1L))
        withPrev.join(noisyBreaks, Seq("user_id", "event_id"), "left")
          .withColumn("brk",
            when(col("prev_end").isNull || col("s_us") - col("prev_end") > lit(4L * HOUR_US)
              || col("noisy_break") === 1L, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("brk"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(min(col("s_us")).as("start_us"), max(col("e_us")).as("end_us"),
            count(lit(1)).as("n_members"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some(s"""WITH $evIntervalsSqlCte,
        |clean AS (SELECT v.user_id, v.event_id, v.s_us, v.e_us FROM i v
        |  WHERE v.event_type <> 'error' AND NOT EXISTS (
        |    SELECT 1 FROM i n WHERE n.event_type = 'error'
        |      AND n.user_id = v.user_id AND v.s_us < n.e_us AND n.s_us < v.e_us)),
        |p AS (SELECT user_id, event_id, s_us, e_us,
        |  MAX(e_us) OVER (PARTITION BY user_id ORDER BY s_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM clean),
        |f AS (SELECT user_id, event_id, s_us, e_us,
        |  CASE WHEN prev_end IS NULL OR s_us - prev_end > 14400000000
        |    OR EXISTS (SELECT 1 FROM i n WHERE n.event_type = 'error'
        |      AND n.user_id = p.user_id AND n.s_us >= p.prev_end AND n.e_us <= p.s_us)
        |  THEN 1 ELSE 0 END AS brk FROM p),
        |s AS (SELECT user_id, s_us, e_us,
        |  CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY s_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, MIN(s_us) AS start_us, MAX(e_us) AS end_us,
        |  COUNT(*) AS n_members
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin)),

    // W3 — sliding hop windows over long segments with early-stop
    // semantics (separation_filter.py:242-260): window 60 s, hop 25 s.
    Q("w3_sliding_windows",
      (s, dir) => SegmentOps.slidingWindows(chunks(s, dir), "start_us", "end_us",
          60000000L, 25000000L)
        .select(col("user_id"), col("start_us"), col("win_start"), col("win_end"))
        .orderBy(col("user_id"), col("win_start")),
      Some(s"""WITH $chunksSqlCte,
        |w AS (SELECT user_id, start_us, end_us,
        |  unnest(generate_series(0, (end_us - start_us) // 25000000)) AS i FROM ch)
        |SELECT user_id, start_us, start_us + i * 25000000 AS win_start,
        |  least(start_us + i * 25000000 + 60000000, end_us) AS win_end
        |FROM w WHERE i = 0 OR start_us + (i - 1) * 25000000 + 60000000 < end_us
        |ORDER BY user_id, win_start""".stripMargin)),

    // W4 — hopped fixed-length windows (batch flavor; dnsmos.py:130-147
    // hop structure): every event lands in window/hop windows; explode
    // the hop index and aggregate per aligned window start.
    Q("w4_hopped_windows",
      (s, dir) => {
        // 4 h windows hopping by 1 h: every event lands in exactly
        // win/hop = 4 aligned windows, generated by exploding the hop
        // index — the batch dual of streaming window(ts, "4h", "1h").
        val hop = HOUR_US
        evPoints(s, dir)
          .withColumn("k", explode(sequence(lit(0L), lit(3L))))
          .withColumn("ws", (expr("tus div 3600000000") - col("k")) * lit(hop))
          .groupBy(col("user_id"), col("ws"))
          .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
          .orderBy(col("user_id"), col("ws"))
      },
      Some(s"""WITH $evPointsSqlCte,
        |h AS (SELECT user_id, cents,
        |  (tus // 3600000000 - r.k) * 3600000000 AS ws
        |  FROM e, range(4) r(k))
        |SELECT user_id, ws, COUNT(*) AS n_events, CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM h GROUP BY user_id, ws ORDER BY user_id, ws""".stripMargin)),

    // A4-exact — interval-union length per key via a custom typed
    // Aggregator with true partial-merge semantics (map-side combine);
    // oracle = the sweep-line formulation of the same quantity.
    Q("a_union_length",
      (s, dir) => {
        val unionLen = udaf(new graft.expr.IntervalUnionAgg())
        Tables.eventIntervals(s, dir)
          .groupBy(col("user_id"))
          .agg(unionLen(col("s_us"), col("e_us")).as("union_us"),
            sum(col("e_us") - col("s_us")).as("naive_sum_us"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH $evIntervalsSqlCte,
        |b AS (SELECT user_id, s_us AS t, CAST(1 AS BIGINT) AS delta FROM i
        |      UNION ALL SELECT user_id, e_us AS t, CAST(-1 AS BIGINT) AS delta FROM i),
        |c AS (SELECT user_id, t, delta,
        |  CAST(SUM(delta) OVER w AS BIGINT) AS n_active,
        |  lead(t) OVER w AS next_t
        |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY t, delta
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |u AS (SELECT user_id, CAST(SUM(next_t - t) AS BIGINT) AS union_us
        |  FROM c WHERE n_active > 0 AND next_t > t GROUP BY user_id),
        |n AS (SELECT user_id, CAST(SUM(e_us - s_us) AS BIGINT) AS naive_sum_us
        |  FROM i GROUP BY user_id)
        |SELECT u.user_id, u.union_us, n.naive_sum_us
        |FROM u JOIN n ON n.user_id = u.user_id ORDER BY u.user_id""".stripMargin)),

    // P1 — pad + clamp segment bounds (vad_multi.py:33-35), clamped to the
    // per-user observed span (the reference clamps to [0, file duration]).
    Q("p1_pad_clamp",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
        Tables.eventIntervals(s, dir)
          .withColumn("lo", min(col("s_us")).over(w))
          .withColumn("hi", max(col("e_us")).over(w))
          .select(col("user_id"), col("event_id"),
            greatest(col("s_us") - lit(5000000L), col("lo")).as("pad_start"),
            least(col("e_us") + lit(5000000L), col("hi")).as("pad_end"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some(s"""WITH $evIntervalsSqlCte
        |SELECT user_id, event_id,
        |  greatest(s_us - 5000000, MIN(s_us) OVER (PARTITION BY user_id)) AS pad_start,
        |  least(e_us + 5000000, MAX(e_us) OVER (PARTITION BY user_id)) AS pad_end
        |FROM i ORDER BY user_id, event_id""".stripMargin)),

    // P3 — silence predicate with the reference's double-append quirk
    // (utils.py:127-143 appends a gap once per satisfied condition, so a
    // short AND quiet gap lands twice): UNION ALL of both branches.
    Q("p3_silence_union",
      (s, dir) => {
        val gaps = SegmentOps.adjacentGaps(
          Tables.eventIntervals(s, dir), "user_id", "s_us", "e_us", "event_id", "cents")
        val short = gaps.filter(col("gap_end") - col("gap_start") < lit(60000000L))
        val quiet = gaps.filter(col("prev_feature") < 1000 && col("next_feature") < 1000)
        short.select(col("user_id"), col("gap_start"), col("gap_end"))
          .unionAll(quiet.select(col("user_id"), col("gap_start"), col("gap_end")))
          .orderBy(col("user_id"), col("gap_start"), col("gap_end"))
      },
      Some(s"""WITH $evIntervalsSqlCte,
        |l AS (SELECT user_id, e_us, cents,
        |  lead(s_us) OVER w AS next_start, lead(cents) OVER w AS next_feature
        |  FROM i WINDOW w AS (PARTITION BY user_id ORDER BY s_us, event_id)),
        |g AS (SELECT user_id, e_us AS gap_start, next_start AS gap_end,
        |  cents AS prev_feature, next_feature
        |  FROM l WHERE next_start IS NOT NULL AND next_start >= e_us)
        |SELECT user_id, gap_start, gap_end FROM (
        |  SELECT user_id, gap_start, gap_end FROM g WHERE gap_end - gap_start < 60000000
        |  UNION ALL
        |  SELECT user_id, gap_start, gap_end FROM g WHERE prev_feature < 1000 AND next_feature < 1000
        |) t ORDER BY user_id, gap_start, gap_end""".stripMargin)),

    // F5/F6 — string functions: zfill, label concat, path-ish head
    // (silero_vad.py:149, speaker_rematch.py:144, utils.py:18-22).
    Q("f5_strings",
      (s, dir) => Tables.part(s, dir)
        .select(col("p_partkey"),
          lpad(col("p_partkey").cast("string"), 7, "0").as("zfill"),
          concat(lit("speaker_"), regexp_extract(col("p_brand"), "([0-9]+)", 1)).as("label"),
          substring_index(col("p_type"), " ", 1).as("type_head"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, lpad(CAST(p_partkey AS VARCHAR), 7, '0') AS zfill,
        |  'speaker_' || regexp_extract(p_brand, '([0-9]+)', 1) AS label,
        |  split_part(p_type, ' ', 1) AS type_head
        |FROM part ORDER BY p_partkey""".stripMargin)),

    // F3 — fixed-coefficient polynomial as a native codegen'd Catalyst
    // Expression (dnsmos.py:91-104), aggregated in the exact domain.
    Q("f3_polyval",
      (s, dir) => {
        val fname = Polyval.register(s, "mos", Seq(0.99, -2.5, 1.7, 0.06))
        Tables.lineitem(s, dir)
          .withColumn("p", expr(s"$fname(l_discount)"))
          .groupBy(col("l_returnflag"))
          .agg(sum(round(col("p") * 100000000d).cast("long")).as("sum_p_e8"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        |  CAST(SUM(CAST(round(((((0.99 * l_discount) + (-2.5)) * l_discount + 1.7) * l_discount + 0.06) * 100000000) AS BIGINT)) AS BIGINT) AS sum_p_e8,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Multimodal plumbing — opaque payload bytes with typed metadata
    // rollup (SURVEY §7.0; binary treated as octets, decode kept out of
    // the relational layer).
    Q("mm_binary_meta",
      (s, dir) => Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(octet_length(col("text")).cast("long")).as("total_bytes"),
          max(octet_length(col("text")).cast("long")).as("max_bytes"))
        .orderBy(col("source")),
      Some("""SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
        |  CAST(MAX(strlen(text)) AS BIGINT) AS max_bytes
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // F11-adjacent — JSON attribute extraction from the events props
    // column (the reference's config/JSON surface, utils.py:25-46).
    Q("f_json_extract",
      (s, dir) => Tables.events(s, dir)
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("user_id"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))
    ,

    // F11 — JSON serialize (to_json over a struct) verified by a
    // roundtrip: every value extracted back out of the serialized string
    // must aggregate identically to the base columns the oracle reads
    // directly — the serialize→extract pair is the identity.
    Q("f_json_roundtrip",
      (s, dir) => Tables.events(s, dir)
        .select(col("user_id"),
          to_json(struct(col("event_id").as("id"), col("event_type").as("t"))).as("j"))
        .select(col("user_id"),
          get_json_object(col("j"), "$.id").cast("long").as("rt_id"),
          get_json_object(col("j"), "$.t").as("rt_type"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("rt_id")).as("sum_id"),
          countDistinct(col("rt_type")).as("n_types"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, COUNT(*) AS n,
        |  CAST(SUM(event_id) AS BIGINT) AS sum_id,
        |  COUNT(DISTINCT event_type) AS n_types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))
  ) ++ textRegistry

  /** DuckDB CTEs shared by the text/dedup queries: tokens and distinct
    * word-3-gram shingles (the Spark side builds shingles with
    * higher-order functions — same result set, no window shuffle).
    */
  private val toksSqlCte =
    """d AS (SELECT doc_id, lang,
      |  list_filter(string_split(text, ' '), x -> x != '') AS toks FROM documents)""".stripMargin

  /** The decayed-counts oracle — shared by the batch
    * (`c_decayed_counts`) and streaming (`streaming_decayed`) flavors:
    * the weighted count is a sum of integer shifts, order-independent,
    * so one SQL mirror checks both.
    */
  private val decayedOracleSql: String =
    """WITH e AS (SELECT event_type,
      |    epoch_us(ts) // 86400000000 AS day FROM events),
      |b AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM e)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(1::BIGINT << CAST(day - b.dmin AS INTEGER)) AS BIGINT) AS decayed_num,
      |  CAST(b.dmax - b.dmin AS BIGINT) AS scale,
      |  CAST(SUM(1::BIGINT << CAST(day - b.dmin AS INTEGER)) AS DOUBLE)
      |    / CAST(1::BIGINT << CAST(b.dmax - b.dmin AS INTEGER) AS DOUBLE) AS decayed
      |FROM e, b GROUP BY event_type, b.dmin, b.dmax
      |ORDER BY event_type""".stripMargin

  /** Exact per-lang token counts, top-10 by (count desc, token) — the
    * oracle for BOTH Space-Saving flavors: within capacity the summary
    * is exact with err = 0 on every path (see
    * [[graft.expr.SpaceSavingAgg]]).
    */
  private val hhOracleSql: String =
    s"""WITH d AS (SELECT doc_id, lang,
      |  list_filter(string_split(text, ' '), x -> x != '') AS toks FROM documents),
      |t AS (SELECT lang, unnest(toks) AS tok FROM d),
      |c AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS est FROM t GROUP BY 1, 2),
      |r AS (SELECT lang, tok, est, CAST(row_number() OVER (PARTITION BY lang
      |    ORDER BY est DESC, tok) AS BIGINT) AS rank FROM c)
      |SELECT lang, rank, tok, est, CAST(0 AS BIGINT) AS err
      |FROM r WHERE rank <= 10 ORDER BY lang, rank""".stripMargin

  /** Mirror of [[graft.ops.Curation.zorderLayout]] on events: the same
    * min/max bounds, `bits`-bit integer-division buckets, and unrolled
    * shift/mask/or interleave, then `row_number`-assigned files and the
    * per-file stats rollup. Bucket and interleave terms are generated
    * from the same (bits, rowsPerFile) parameters as the Spark plan.
    */
  private def zorderOracleSql(bits: Int, rowsPerFile: Int): String = {
    val top = (1L << bits) - 1L
    val inter = (0 until bits).map { i =>
      s"(((b0 >> $i) & 1) << ${2 * i}) | (((b1 >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" | ")
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id FROM events),
       |bn AS (SELECT MIN(user_id) AS n0, MAX(user_id) AS x0,
       |    MIN(tus) AS n1, MAX(tus) AS x1 FROM e),
       |k AS (SELECT e.*,
       |    CASE WHEN x0 = n0 THEN 0 ELSE ((user_id - n0) * $top) // (x0 - n0) END AS b0,
       |    CASE WHEN x1 = n1 THEN 0 ELSE ((tus - n1) * $top) // (x1 - n1) END AS b1
       |  FROM e, bn),
       |z AS (SELECT *, $inter AS zkey FROM k),
       |r AS (SELECT *, row_number() OVER (ORDER BY zkey, event_id) AS rn FROM z)
       |SELECT CAST((rn - 1) // $rowsPerFile AS BIGINT) AS file_id,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  MIN(user_id) AS min_user_id, MAX(user_id) AS max_user_id,
       |  MIN(tus) AS min_tus, MAX(tus) AS max_tus
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** The k-round BPE training loop unrolled as chained CTEs — each
    * round: adjacent-pair counts over the delimited symbol strings, the
    * deterministic argmax, and the greedy `replace` merge feeding the
    * next round (every round's merge applied, so w`k` is the fully
    * encoded word table [[bpeEncodeOracleSql]] reads). Mirrors
    * [[graft.ops.TextOps.bpeTrainMerges]]/`bpeEncode` exactly.
    */
  private def bpeChainSql(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH $toksSqlCte,
t0 AS (SELECT unnest(toks) AS w FROM d),
wf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM t0
  WHERE regexp_matches(w, '^[a-z]+$$') AND length(w) >= 2 GROUP BY 1),
w0 AS (SELECT w, '|' || array_to_string(string_split(w, ''), '||') || '|' AS repr, freq FROM wf)"""
    for (r <- 1 to rounds) {
      sb ++= s""",
s$r AS (SELECT string_split(substr(repr, 2, length(repr) - 2), '||') AS syms, freq
  FROM w${r - 1}),
p$r AS (SELECT string_split(p, chr(1))[1] AS a, string_split(p, chr(1))[2] AS b, freq
  FROM (SELECT unnest(list_filter(list_transform(syms, (x, i) ->
      CASE WHEN i < len(syms) THEN x || chr(1) || syms[i + 1] END),
      y -> y IS NOT NULL)) AS p, freq
    FROM s$r WHERE len(syms) >= 2)),
b$r AS (SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt FROM p$r GROUP BY a, b
  ORDER BY cnt DESC, a, b LIMIT 1),
w$r AS (SELECT w, replace(repr, '|' || b$r.a || '||' || b$r.b || '|',
    '|' || b$r.a || b$r.b || '|') AS repr, freq FROM w${r - 1}, b$r)"""
    }
    sb.toString
  }

  private def bpeOracleSql(rounds: Int): String =
    bpeChainSql(rounds) +
      (1 to rounds).map(r =>
        s"\nSELECT $r AS round, a, b, a || b AS merged, cnt FROM b$r")
        .mkString("", "\nUNION ALL", "") +
      "\nORDER BY round"

  /** Tokenize-the-corpus mirror: split the fully merged word table back
    * into symbols and roll the frequency-weighted vocabulary histogram.
    */
  private def bpeEncodeOracleSql(rounds: Int): String =
    bpeChainSql(rounds) + s""",
enc AS (SELECT string_split(substr(repr, 2, length(repr) - 2), '||') AS syms, freq
  FROM w$rounds)
SELECT token, CAST(SUM(freq) AS BIGINT) AS cnt
FROM (SELECT unnest(syms) AS token, freq FROM enc)
GROUP BY token ORDER BY cnt DESC, token"""

  /** The char-trigram langid profile rendered as a SQL VALUES literal —
    * generated from the SAME Scala constant the Spark side broadcasts,
    * so the two engines cannot drift.
    */
  private val langProfileSqlValues: String = TextOps.langTrigramProfiles
    .map { case (l, i, t, w) => s"('$l', $i, '$t', $w)" }.mkString(", ")

  private val shingleSqlCte =
    s"""$toksSqlCte,
       |tt AS (SELECT doc_id, unnest(toks) AS tok, unnest(range(len(toks))) AS i FROM d),
       |s0 AS (SELECT doc_id, tok || ' ' || lead(tok,1) OVER w || ' ' || lead(tok,2) OVER w AS shingle
       |  FROM tt WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
       |sd AS (SELECT DISTINCT doc_id, shingle FROM s0 WHERE shingle IS NOT NULL)""".stripMargin

  /** Near-dup connected-component labels (MinHash 8-band candidates →
    * exact Jaccard ≥ 0.5 pairs → transitive closure via recursive CTE →
    * min-id component per doc, singletons labeled by themselves) —
    * shared by the `dedup_components` and `c_split_leakage_safe`
    * oracles. Callers must open with `WITH RECURSIVE`.
    */
  private val nearDupCcSqlCtes =
    s"""$shingleSqlCte,
       |mh AS (SELECT doc_id, r.band AS band,
       |  MIN(('0x' || substr(md5(shingle) || md5(shingle), CAST(r.band*4+1 AS INTEGER), 15))::BIGINT) AS sig
       |  FROM sd, range(8) r(band) GROUP BY doc_id, r.band),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM mh x JOIN mh y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
       |co AS (SELECT t.a, t.b, COUNT(*) AS common FROM (
       |    SELECT c.a, c.b, x.shingle FROM cand c
       |    JOIN sd x ON x.doc_id = c.a
       |    JOIN sd y ON y.doc_id = c.b AND y.shingle = x.shingle) t
       |  GROUP BY t.a, t.b),
       |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sd GROUP BY doc_id),
       |jp AS (SELECT co.a, co.b FROM co
       |  JOIN n na ON na.doc_id = co.a JOIN n nb ON nb.doc_id = co.b
       |  WHERE CAST(co.common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - co.common AS DOUBLE) >= 0.5),
       |e AS (SELECT a AS u, b AS v FROM jp UNION SELECT b AS u, a AS v FROM jp),
       |cc AS (
       |  SELECT doc_id AS id, doc_id AS r FROM documents
       |  UNION
       |  SELECT cc.id, e.v FROM cc JOIN e ON e.u = cc.r),
       |lbl AS (SELECT id AS doc_id, MIN(r) AS component FROM cc GROUP BY id)""".stripMargin

  private val quantSqlCte =
    """q AS (SELECT vec_id, list_transform(embedding,
      |  x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS qv FROM embeddings),
      |nm AS (SELECT vec_id, CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS nn FROM q)""".stripMargin

  /** PQ encode + reconstruct over `q` — subspace split, 16-seed-row
    * codebooks, per-subspace argmin, lossless reassembly into `rec` —
    * mirror of [[graft.ops.Similarity]]'s `pqRecon`, shared by the
    * `sim_pq_adc_topk` and `sim_ivfpq_topk` oracles. Requires
    * `quantSqlCte` upstream.
    */
  private val pqReconSqlCtes =
    """sb AS (SELECT vec_id, j.j AS sub_id,
      |    qv[j.j * 8 + 1 : j.j * 8 + 8] AS v FROM q, range(8) j(j)),
      |bk AS (SELECT vec_id AS code, sub_id, v AS cvec FROM sb WHERE vec_id < 16),
      |dd AS (SELECT s.vec_id, s.sub_id, b.code, b.cvec,
      |    CAST(list_sum(list_transform(range(1, 9),
      |      i -> (s.v[i] - b.cvec[i]) * (s.v[i] - b.cvec[i]))) AS BIGINT) AS d2
      |  FROM sb s JOIN bk b ON b.sub_id = s.sub_id),
      |asg AS (SELECT vec_id, sub_id, cvec FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub_id
      |      ORDER BY d2, code) AS rn FROM dd) WHERE rn = 1),
      |rec AS (SELECT vec_id, flatten(list(cvec ORDER BY sub_id)) AS recon
      |  FROM asg GROUP BY vec_id)""".stripMargin

  /** The SQ-ADC oracle — shared verbatim by `sim_sq_adc_topk` and
    * `sim_sq_packed_topk`: both plans produce the same exact integer
    * scores, so one SQL mirror checks both.
    */
  private val sqAdcOracleSql: String =
    s"""WITH $quantSqlCte,
      |st AS (SELECT i, MIN(qv[CAST(i AS INTEGER)]) AS mn,
      |    MAX(qv[CAST(i AS INTEGER)]) - MIN(qv[CAST(i AS INTEGER)]) + 1 AS w
      |  FROM q, range(1,65) t(i) GROUP BY 1),
      |rc AS (SELECT q.vec_id, st.i,
      |    32*st.mn + (2*(((q.qv[CAST(st.i AS INTEGER)] - st.mn)*16) // st.w) + 1)*st.w AS r
      |  FROM q, st),
      |sc AS (SELECT qq.vec_id AS query_id, rc.vec_id AS neighbor_id,
      |    CAST(SUM(qq.qv[CAST(rc.i AS INTEGER)] * rc.r) AS BIGINT) AS score2l
      |  FROM rc JOIN q qq ON qq.vec_id < 8 AND rc.vec_id <> qq.vec_id
      |  GROUP BY 1, 2),
      |r AS (SELECT query_id, neighbor_id, score2l,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY score2l DESC, neighbor_id) AS BIGINT) AS rnk FROM sc)
      |SELECT query_id, rnk, neighbor_id, score2l
      |FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin


  /** DuckDB mirror of [[graft.ops.SrpLsh]]'s deterministic signature +
    * band-candidate stages, with the same fixed-seed coefficient matrix
    * rendered as a literal — bit-identical signatures on both engines.
    */
  private val srpSqlCte: String = {
    val bandBits = graft.ops.SrpLsh.DefaultBandBits
    val bands = graft.ops.SrpLsh.DefaultBands
    val cs = graft.ops.SrpLsh.coefficients(bandBits * bands, 64)
    val rl = graft.ops.SrpLsh.sqlCoefficientLiteral(cs)
    s"""sdots AS (SELECT vec_id, list_transform($rl,
       |  rj -> CAST(list_sum(list_transform(range(1,65), i -> rj[i]*qv[i])) AS BIGINT)) AS dots FROM q),
       |srp AS (SELECT vec_id, CAST(list_sum(list_transform(range(0,${cs.length}), j ->
       |  CASE WHEN dots[j+1] > 0 THEN CAST(power(2,j) AS BIGINT) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
       |  FROM sdots),
       |bb AS (SELECT vec_id, r.band AS band,
       |  (sig // CAST(power(2, r.band*$bandBits) AS BIGINT)) % ${1L << bandBits} AS bv
       |  FROM srp, range($bands) r(band)),
       |scand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       |  FROM bb x JOIN bb y ON x.band = y.band AND x.bv = y.bv AND x.vec_id < y.vec_id)""".stripMargin
  }

  private def docToks(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      TextOps.tokens(col("text")).as("toks"))

  private def textRegistry: Seq[Q] = Seq(

    // T-ops — token statistics (length/token counting per SURVEY §7.0).
    Q("t_token_stats",
      (s, dir) => docToks(s, dir)
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
          aggregate(col("toks"), lit(0L), (a, t) => a + length(t)).as("sum_tok_chars"))
        .withColumn("avg_tok_len", col("sum_tok_chars").cast("double") / col("n_tokens"))
        .orderBy(col("doc_id")),
      Some(s"""WITH $toksSqlCte
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        |  CAST(list_sum(list_transform(toks, t -> strlen(t))) AS BIGINT) AS sum_tok_chars,
        |  CAST(CAST(list_sum(list_transform(toks, t -> strlen(t))) AS BIGINT) AS DOUBLE)
        |    / CAST(len(toks) AS BIGINT) AS avg_tok_len
        |FROM d ORDER BY doc_id""".stripMargin)),

    // T-ops — quality scoring: stopword ratio + length gate.
    Q("t_quality_score",
      (s, dir) => docToks(s, dir)
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          TextOps.stopwordHits(col("toks"), TextOps.langMarkers.head._2).as("stop_hits"))
        .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
        .withColumn("quality_ok", col("n_tokens") >= 50 && col("stop_ratio") >= 0.02)
        .orderBy(col("doc_id")),
      Some(s"""WITH $toksSqlCte
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in'], t))) AS BIGINT) AS stop_hits,
        |  CAST(CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in'], t))) AS BIGINT) AS DOUBLE)
        |    / CAST(len(toks) AS BIGINT) AS stop_ratio,
        |  (CAST(len(toks) AS BIGINT) >= 50 AND
        |   CAST(CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in'], t))) AS BIGINT) AS DOUBLE)
        |    / CAST(len(toks) AS BIGINT) >= 0.02) AS quality_ok
        |FROM d ORDER BY doc_id""".stripMargin)),

    // T-ops — language-ID by stopword-set argmax (deterministic ties).
    Q("t_langid",
      (s, dir) => docToks(s, dir)
        .withColumn("pred", TextOps.langId(col("toks")))
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred")),
      Some(s"""WITH $toksSqlCte,
        |h AS (SELECT doc_id, lang,
        |  CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in'], t))) AS BIGINT) AS h_en,
        |  CAST(len(list_filter(toks, t -> list_contains(['el','la','de','que','y','en'], t))) AS BIGINT) AS h_es,
        |  CAST(len(list_filter(toks, t -> list_contains(['le','la','et','les','des','une'], t))) AS BIGINT) AS h_fr,
        |  CAST(len(list_filter(toks, t -> list_contains(['der','die','und','das','ist','ein'], t))) AS BIGINT) AS h_de
        |  FROM d),
        |p AS (SELECT lang,
        |  CASE WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_de THEN 'en'
        |       WHEN h_es >= h_fr AND h_es >= h_de THEN 'es'
        |       WHEN h_fr >= h_de THEN 'fr' ELSE 'de' END AS pred FROM h)
        |SELECT lang, pred, COUNT(*) AS n FROM p GROUP BY lang, pred
        |ORDER BY lang, pred""".stripMargin)),

    // T-ops — char-TRIGRAM language ID (Cavnar–Trenkle-style profile):
    // explode document trigrams, broadcast-join the static integer-weight
    // profile, per-(doc, lang) sum, deterministic argmax. A different
    // scale shape than the word-marker langid: explode + broadcast hash
    // join + two-level agg, still zero wide shuffles beyond the per-doc
    // score rows. Confusion-matrix rollup output.
    Q("t_langid_ngram",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        docs.select(col("doc_id"), col("lang"))
          .join(TextOps.langIdNgram(docs, "doc_id", "text"), Seq("doc_id"), "left")
          .select(col("lang"), coalesce(col("pred_lang"), lit("und")).as("pred"))
          .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("pred"))
      },
      Some(s"""WITH prof(plang, pidx, trigram, weight) AS (VALUES $langProfileSqlValues),
        |c AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS canon
        |  FROM documents),
        |tg0 AS (SELECT doc_id, canon, unnest(range(greatest(len(canon) - 2, 0))) AS i FROM c),
        |tg AS (SELECT doc_id, substr(canon, CAST(i + 1 AS INTEGER), 3) AS trigram FROM tg0),
        |sc AS (SELECT t.doc_id, p.plang, p.pidx, CAST(SUM(p.weight) AS BIGINT) AS score
        |  FROM tg t JOIN prof p ON p.trigram = t.trigram
        |  GROUP BY t.doc_id, p.plang, p.pidx),
        |b AS (SELECT doc_id, plang FROM (SELECT doc_id, plang,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, pidx ASC) AS rn
        |  FROM sc) t WHERE rn = 1),
        |pr AS (SELECT d.lang, COALESCE(b.plang, 'und') AS pred
        |  FROM documents d LEFT JOIN b ON b.doc_id = d.doc_id)
        |SELECT lang, pred, COUNT(*) AS n FROM pr GROUP BY lang, pred
        |ORDER BY lang, pred""".stripMargin)),

    // T-ops — BPE-ish pretokenization counts: letter runs, digit runs,
    // single punctuation (the GPT-2 pretokenizer shape, RE2-safe so the
    // identical pattern runs in the oracle).
    Q("t_bpe_tokens",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), TextOps.bpeTokens(col("text")).as("bt"))
        .select(col("doc_id"),
          size(col("bt")).cast("long").as("n_bpe"),
          size(filter(col("bt"), t => t.rlike("^\\p{L}"))).cast("long").as("n_word"),
          size(filter(col("bt"), t => t.rlike("^\\p{N}"))).cast("long").as("n_num"),
          aggregate(col("bt"), lit(0L), (a, t) => a + length(t)).as("sum_chars"))
        // token-free docs out: the engines disagree on empty-list
        // aggregates (0 vs NULL) and avg_len would divide by zero
        .filter(col("n_bpe") > 0)
        .withColumn("avg_len", col("sum_chars").cast("double") / col("n_bpe"))
        .orderBy(col("doc_id")),
      Some("""WITH b AS (SELECT doc_id,
        |  regexp_extract_all(text, '\p{L}+|\p{N}+|[^\s\p{L}\p{N}]') AS bt FROM documents
        |  ) , b2 AS (SELECT * FROM b WHERE len(bt) > 0)
        |SELECT doc_id, CAST(len(bt) AS BIGINT) AS n_bpe,
        |  CAST(len(list_filter(bt, t -> regexp_matches(t, '^\p{L}'))) AS BIGINT) AS n_word,
        |  CAST(len(list_filter(bt, t -> regexp_matches(t, '^\p{N}'))) AS BIGINT) AS n_num,
        |  CAST(list_sum(list_transform(bt, t -> strlen(t))) AS BIGINT) AS sum_chars,
        |  CAST(CAST(list_sum(list_transform(bt, t -> strlen(t))) AS BIGINT) AS DOUBLE)
        |    / CAST(len(bt) AS BIGINT) AS avg_len
        |FROM b2 ORDER BY doc_id""".stripMargin)),

    // T-ops — winnowing document fingerprints (MOSS rolling-hash scheme):
    // char-8-gram md5s, window-4 minima, distinct. Outputs are set
    // statistics, so the two engines' distinct orders don't matter.
    Q("t_winnow_fp",
      (s, dir) => {
        val fn = graft.expr.WinnowFingerprint.register(s, 8, 4)
        Tables.documents(s, dir)
          .withColumn("fps", expr(s"$fn(text)"))
          .select(col("doc_id"),
            greatest(length(regexp_replace(col("text"), "[^A-Za-z0-9]", "")) - 7,
              lit(0)).cast("long").as("n_grams"),
            size(col("fps")).cast("long").as("n_fp"),
            array_min(col("fps")).as("min_fp"), array_max(col("fps")).as("max_fp"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH c AS (SELECT doc_id,
        |  lower(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS canon FROM documents),
        |g AS (SELECT doc_id, CASE WHEN strlen(canon) >= 8
        |    THEN list_transform(range(0, strlen(canon) - 8 + 1), i -> md5(substr(canon, CAST(i + 1 AS INTEGER), 8)))
        |    ELSE [] END AS grams FROM c),
        |f AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
        |  CASE WHEN len(grams) >= 4
        |    THEN list_distinct(list_transform(range(0, len(grams) - 4 + 1),
        |      j -> list_min(grams[CAST(j + 1 AS INTEGER):CAST(j + 4 AS INTEGER)])))
        |    WHEN len(grams) > 0 THEN [list_min(grams)] ELSE [] END AS fps FROM g)
        |SELECT doc_id, n_grams, CAST(len(fps) AS BIGINT) AS n_fp,
        |  list_min(fps) AS min_fp, list_max(fps) AS max_fp
        |FROM f ORDER BY doc_id""".stripMargin)),

    // The end-to-end curation trace a training-data pipeline runs:
    // quality gate (token floor + stopword ratio) → exact-duplicate
    // removal keeping the min-id canonical → per-language corpus stats.
    // One composed plan: filters push to the scan, the dedup argmin is a
    // window over the fingerprint hash partition, the final rollup is a
    // two-level hash aggregate.
    Q("curation_pipeline",
      (s, dir) => {
        val scored = docToks(s, dir).select(col("doc_id"), col("lang"),
            size(col("toks")).cast("long").as("n_tokens"),
            TextOps.stopwordHits(col("toks"), TextOps.langMarkers.head._2).as("stop_hits"))
          .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
          .filter(col("n_tokens") >= 50 && col("stop_ratio") >= 0.02)
        // min-id canonical as a hash aggregate — no window sort
        val canonical = Tables.documents(s, dir)
          .select(col("doc_id"), TextOps.fingerprint(col("text"), 200).as("fp"))
          .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"))
        scored.join(canonical, "doc_id")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH $toksSqlCte,
        |sc AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in'], t))) AS BIGINT) AS DOUBLE)
        |    / CAST(len(toks) AS BIGINT) AS stop_ratio
        |  FROM d),
        |ql AS (SELECT doc_id, lang, n_tokens FROM sc
        |  WHERE n_tokens >= 50 AND stop_ratio >= 0.02),
        |fp AS (SELECT doc_id,
        |  md5(substr(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), 1, 200)) AS fp
        |  FROM documents),
        |canon AS (SELECT doc_id FROM (SELECT doc_id,
        |  row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM fp) t WHERE rn = 1)
        |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  MIN(ql.doc_id) AS first_doc
        |FROM ql JOIN canon ON canon.doc_id = ql.doc_id
        |GROUP BY lang ORDER BY lang""".stripMargin)),

    // Dedup — winnowing-fingerprint pairing (the MOSS copy-detection
    // stage): docs sharing >= 10 discriminative fingerprints (document
    // frequency <= 50 — over-common fingerprints are boilerplate AND the
    // quadratic hazard; here the cap genuinely binds, max df is ~1300).
    Q("dedup_winnow",
      (s, dir) => {
        val fn = graft.expr.WinnowFingerprint.register(s, 8, 4)
        Dedup.winnowPairs(
            Tables.documents(s, dir)
              .select(col("doc_id"), explode(expr(s"$fn(text)")).as("fp")),
            "doc_id", minShared = 10L, maxDocFreq = 50L)
          .orderBy(col("a"), col("b"))
      },
      Some("""WITH c AS (SELECT doc_id,
        |  lower(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS canon FROM documents),
        |g AS (SELECT doc_id, CASE WHEN strlen(canon) >= 8
        |    THEN list_transform(range(0, strlen(canon) - 8 + 1), i -> md5(substr(canon, CAST(i + 1 AS INTEGER), 8)))
        |    ELSE [] END AS grams FROM c),
        |f AS (SELECT doc_id, unnest(CASE WHEN len(grams) >= 4
        |    THEN list_distinct(list_transform(range(0, len(grams) - 4 + 1),
        |      j -> list_min(grams[CAST(j + 1 AS INTEGER):CAST(j + 4 AS INTEGER)])))
        |    WHEN len(grams) > 0 THEN [list_min(grams)] ELSE [] END) AS fp FROM g),
        |d AS (SELECT fp FROM f GROUP BY fp HAVING COUNT(*) <= 50),
        |r AS (SELECT f.doc_id, f.fp FROM f JOIN d ON d.fp = f.fp),
        |p AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS n_shared
        |  FROM r x JOIN r y ON x.fp = y.fp AND x.doc_id < y.doc_id GROUP BY 1, 2)
        |SELECT a, b, n_shared FROM p WHERE n_shared >= 10 ORDER BY a, b""".stripMargin)),

    // Dedup — CONTENT-DEFINED CHUNKING (rsync/LBFS family): a rolling
    // polynomial hash cuts chunk boundaries wherever hash % 64 == 0,
    // so boundaries depend only on local content and an edit re-chunks
    // at most its own window — shifted/partially-edited documents
    // still share every untouched chunk (fixed-size chunking shares
    // none). One fused codegen Expression (O(1) rolling update per
    // char); the oracle recomputes each boundary from the equivalent
    // per-window Σ c_j·B^(k−1−j) mod M in exact integers. Output: the
    // cross-document shared-chunk table (the dedup signal).
    Q("dedup_cdc_chunks",
      (s, dir) => {
        val fn = graft.expr.CdcChunks.register(s)
        Tables.documents(s, dir)
          .select(col("doc_id"), explode(expr(s"$fn(text)")).as("chunk"))
          .groupBy(md5(col("chunk")).as("chunk_fp"))
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_occ"),
            min(length(col("chunk"))).cast("long").as("clen"))
          .filter(col("n_docs") > 1L)
          .orderBy(col("chunk_fp"))
      },
      Some("""WITH c AS (SELECT doc_id,
        |  lower(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS canon FROM documents),
        |b AS (SELECT doc_id, canon, CAST(strlen(canon) AS BIGINT) AS n
        |  FROM c WHERE strlen(canon) > 0),
        |k AS (SELECT doc_id, canon, n,
        |  CASE WHEN n >= 8 THEN list_filter(range(8, n + 1), e ->
        |    (((ord(substr(canon, CAST(e - 7 AS INTEGER), 1)) * 531575
        |      + ord(substr(canon, CAST(e - 6 AS INTEGER), 1)) * 501020
        |      + ord(substr(canon, CAST(e - 5 AS INTEGER), 1)) * 629067
        |      + ord(substr(canon, CAST(e - 4 AS INTEGER), 1)) * 923521
        |      + ord(substr(canon, CAST(e - 3 AS INTEGER), 1)) * 29791
        |      + ord(substr(canon, CAST(e - 2 AS INTEGER), 1)) * 961
        |      + ord(substr(canon, CAST(e - 1 AS INTEGER), 1)) * 31
        |      + ord(substr(canon, CAST(e AS INTEGER), 1))) % 1000003) % 64) = 0)
        |  ELSE [] END AS cuts FROM b),
        |ch AS (SELECT doc_id,
        |  CASE WHEN n < 8 THEN [canon]
        |  ELSE list_filter(list_transform(range(0, len(cuts) + 1), i ->
        |    substr(canon,
        |      CAST((CASE WHEN i = 0 THEN 0 ELSE cuts[CAST(i AS INTEGER)] END) + 1 AS INTEGER),
        |      CAST((CASE WHEN i = CAST(len(cuts) AS BIGINT) THEN n
        |            ELSE cuts[CAST(i + 1 AS INTEGER)] END)
        |        - (CASE WHEN i = 0 THEN 0 ELSE cuts[CAST(i AS INTEGER)] END) AS INTEGER))),
        |    x -> strlen(x) > 0) END AS chunks FROM k),
        |u AS (SELECT doc_id, unnest(chunks) AS chunk FROM ch)
        |SELECT md5(chunk) AS chunk_fp, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  COUNT(*) AS n_occ, CAST(MIN(strlen(chunk)) AS BIGINT) AS clen
        |FROM u GROUP BY 1 HAVING COUNT(DISTINCT doc_id) > 1 ORDER BY 1""".stripMargin)),

    // L-series — MULTI-PATTERN LITERAL MATCHING via one broadcast
    // Aho-Corasick automaton: per-document cost is one linear pass
    // regardless of pattern count — the blocklist/PII-term shape at
    // 100 TB, vs per-pattern regexp scans that rescan every byte. The
    // chosen patterns are all BORDER-FREE (no proper prefix equals a
    // suffix — note 'window' would border on 'w' and self-overlap in
    // text like 'windowindow'), so the oracle's disjoint replace-count
    // equals the automaton's all-occurrence count.
    Q("t_multi_match",
      (s, dir) => graft.ops.TextMatch.matchCounts(
          Tables.documents(s, dir), "doc_id", "text",
          Seq("spark", "table", "join", "scan", "query", "filter"))
        .orderBy(col("doc_id"), col("pattern")),
      Some("""WITH p(pattern) AS (SELECT * FROM (VALUES ('spark'), ('table'),
        |  ('join'), ('scan'), ('query'), ('filter'))),
        |m AS (SELECT doc_id, pattern,
        |  CAST((strlen(text) - strlen(replace(text, pattern, ''))) // strlen(pattern)
        |    AS BIGINT) AS n
        |  FROM documents, p)
        |SELECT doc_id, pattern, n FROM m WHERE n > 0
        |ORDER BY doc_id, pattern""".stripMargin)),

    // Curation — URL CANONICALIZATION: the normalization every
    // web-scale URL-level dedup runs first (scheme/host lowercased,
    // www. and default ports stripped, utm_* dropped, query keys
    // sorted, fragment discarded, path case preserved). Pure column
    // expressions over synthesized messy URLs; the oracle states the
    // expected canonical form directly from the synthesis parameters.
    Q("c_url_canonical",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val url = concat(
          when(pmod(col("doc_id"), lit(2L)) === 0L, lit("HTTP://WWW."))
            .otherwise(lit("https://")),
          col("source"), lit(".Example.COM"),
          when(pmod(col("doc_id"), lit(2L)) === 0L, lit(":80")).otherwise(lit(":443")),
          lit("/Docs/"), col("doc_id"),
          lit("?utm_source=feed&b=2&a=1&utm_medium=m#sec"))
        docs.select(col("doc_id"), Curation.canonicalUrl(url).as("canon_url"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
        |  concat(CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END,
        |    '://', lower(source), '.example.com/Docs/', doc_id, '?a=1&b=2') AS canon_url
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Dedup — exact (prefix) fingerprint groups; md5 over normalized text
    // head catches head-identical near-dups as exact groups.
    Q("dedup_exact",
      (s, dir) => Dedup.exactGroups(
          Tables.documents(s, dir).select(col("doc_id"),
            TextOps.fingerprint(col("text"), 200).as("fp")),
          "doc_id", "fp")
        .select(col("fp"), col("n_dups"), col("canonical"))
        .orderBy(col("fp")),
      Some("""SELECT fp, COUNT(*) AS n_dups, MIN(doc_id) AS canonical FROM (
        |  SELECT doc_id, md5(substr(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 200)) AS fp
        |  FROM documents) t
        |GROUP BY fp HAVING COUNT(*) > 1 ORDER BY fp""".stripMargin)),

    // Dedup — exhaustive word-3-gram Jaccard pairs: candidates share a
    // rare shingle (document-frequency cap 50 bounds hot-shingle fan-out
    // at scale; a no-op on this corpus, max df = 25), then exact verify
    // over ALL shingles — reported Jaccard values are uncapped.
    Q("dedup_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccardPairs(
          sessionShingles(s, dir),
          "doc_id", 0.8, maxShingleDocFreq = 50L)
        .orderBy(col("a"), col("b")),
      Some(s"""WITH $shingleSqlCte,
        |fq AS (SELECT shingle FROM (SELECT shingle, COUNT(*) AS df FROM sd GROUP BY shingle) t
        |  WHERE df <= 50),
        |rs AS (SELECT sd.doc_id, sd.shingle FROM sd JOIN fq ON fq.shingle = sd.shingle),
        |cand AS (SELECT DISTINCT sa.doc_id AS a, sb.doc_id AS b
        |  FROM rs sa JOIN rs sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id),
        |co AS (SELECT t.a, t.b, COUNT(*) AS common FROM (
        |    SELECT c.a, c.b, x.shingle FROM cand c
        |    JOIN sd x ON x.doc_id = c.a
        |    JOIN sd y ON y.doc_id = c.b AND y.shingle = x.shingle) t
        |  GROUP BY t.a, t.b),
        |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sd GROUP BY doc_id),
        |j AS (SELECT co.a, co.b, co.common,
        |  CAST(co.common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - co.common AS DOUBLE) AS jaccard
        |  FROM co JOIN n na ON na.doc_id = co.a JOIN n nb ON nb.doc_id = co.b)
        |SELECT a, b, common, jaccard FROM j WHERE jaccard >= 0.8 ORDER BY a, b""".stripMargin)),

    // L101 — DEDUP THRESHOLD SENSITIVITY CURVE: pair yield at five
    // Jaccard thresholds from ONE commons pass (the candidate stage is
    // threshold-independent); gates integer cross-multiplied, unpivot
    // via stack. The tuning artifact every dedup rollout reads first.
    Q("dedup_threshold_curve",
      (s, dir) => Dedup.thresholdCurve(
          sessionShingles(s, dir),
          "doc_id", 50L, Seq((5, 10), (6, 10), (7, 10), (8, 10), (9, 10)))
        .orderBy(col("t_permille")),
      Some(s"""WITH $shingleSqlCte,
        |fq AS (SELECT shingle FROM (SELECT shingle, COUNT(*) AS df FROM sd GROUP BY shingle) t
        |  WHERE df <= 50),
        |rs AS (SELECT sd.doc_id, sd.shingle FROM sd JOIN fq ON fq.shingle = sd.shingle),
        |cand AS (SELECT DISTINCT sa.doc_id AS a, sb.doc_id AS b
        |  FROM rs sa JOIN rs sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id),
        |co AS (SELECT t.a, t.b, COUNT(*) AS common FROM (
        |    SELECT c.a, c.b, x.shingle FROM cand c
        |    JOIN sd x ON x.doc_id = c.a
        |    JOIN sd y ON y.doc_id = c.b AND y.shingle = x.shingle) t
        |  GROUP BY t.a, t.b),
        |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sd GROUP BY doc_id),
        |j AS (SELECT co.common, na.n_sh AS na, nb.n_sh AS nb
        |  FROM co JOIN n na ON na.doc_id = co.a JOIN n nb ON nb.doc_id = co.b),
        |th(t_permille, num, den) AS (VALUES (500, 5, 10), (600, 6, 10),
        |  (700, 7, 10), (800, 8, 10), (900, 9, 10))
        |SELECT CAST(th.t_permille AS BIGINT) AS t_permille,
        |  CAST(SUM(CASE WHEN j.common IS NOT NULL
        |    AND j.common * th.den >= th.num * (j.na + j.nb - j.common)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs
        |FROM th LEFT JOIN j ON TRUE
        |GROUP BY th.t_permille ORDER BY t_permille""".stripMargin)),

    // L104 — LSH RECALL AUDIT: the first question a production dedup
    // asks — is the banded index missing pairs? Exhaustive rare-shingle
    // pairs at J ≥ 0.5 are ground truth; the 8-band MinHash pairs are
    // the candidate path; the query reports both counts, the overlap,
    // and the recall fraction on a documented bounded slice
    // (doc_id < 1500, cf. the minhash_mllib slice). A recall printed per
    // corpus beats the (1−J)^bands formula assumed per paper.
    Q("dedup_lsh_recall",
      (s, dir) => {
        val sd = TextOps.shingleTable(
          Tables.documents(s, dir).filter(col("doc_id") < 1500),
          "doc_id", "text", 3)
        // each pair set feeds its own count AND the overlap join — eager
        // caches keep the pair pipelines single-evaluation
        val truth = Dedup.ngramJaccardPairs(sd, "doc_id", 0.5,
          maxShingleDocFreq = 50L).select(col("a"), col("b")).cache()
        truth.count()
        val lsh = Dedup.minhashLshPairs(sd, "doc_id", 8, 0.5)
          .select(col("a"), col("b")).cache()
        lsh.count()
        truth.agg(count(lit(1)).as("n_true"))
          .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
          .crossJoin(truth.join(lsh, Seq("a", "b"))
            .agg(count(lit(1)).as("n_common")))
          // zero-guard: with no true pairs Spark's x/0 = NaN but
          // DuckDB's is NULL — agree on NULL in the degenerate case
          .select(col("n_true"), col("n_lsh"), col("n_common"),
            when(col("n_true") === 0L, lit(null).cast("double"))
              .otherwise(col("n_common").cast("double")
                / col("n_true").cast("double")).as("recall"))
      },
      Some(s"""WITH $shingleSqlCte,
        |sds AS (SELECT * FROM sd WHERE doc_id < 1500),
        |fq AS (SELECT shingle FROM (SELECT shingle, COUNT(*) AS df FROM sds GROUP BY shingle) t
        |  WHERE df <= 50),
        |rs AS (SELECT sds.doc_id, sds.shingle FROM sds JOIN fq ON fq.shingle = sds.shingle),
        |cand AS (SELECT DISTINCT sa.doc_id AS a, sb.doc_id AS b
        |  FROM rs sa JOIN rs sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id),
        |co AS (SELECT t.a, t.b, COUNT(*) AS common FROM (
        |    SELECT c.a, c.b, x.shingle FROM cand c
        |    JOIN sds x ON x.doc_id = c.a
        |    JOIN sds y ON y.doc_id = c.b AND y.shingle = x.shingle) t
        |  GROUP BY t.a, t.b),
        |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sds GROUP BY doc_id),
        |truth AS (SELECT co.a, co.b FROM co
        |  JOIN n na ON na.doc_id = co.a JOIN n nb ON nb.doc_id = co.b
        |  WHERE CAST(co.common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - co.common AS DOUBLE) >= 0.5),
        |mh AS (SELECT doc_id, r.band AS band,
        |  MIN(('0x' || substr(md5(shingle) || md5(shingle), CAST(r.band*4+1 AS INTEGER), 15))::BIGINT) AS sig
        |  FROM sds, range(8) r(band) GROUP BY doc_id, r.band),
        |cand2 AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM mh x JOIN mh y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
        |co2 AS (SELECT t.a, t.b, COUNT(*) AS common FROM (
        |    SELECT c.a, c.b, x.shingle FROM cand2 c
        |    JOIN sds x ON x.doc_id = c.a
        |    JOIN sds y ON y.doc_id = c.b AND y.shingle = x.shingle) t
        |  GROUP BY t.a, t.b),
        |lsh AS (SELECT co2.a, co2.b FROM co2
        |  JOIN n na ON na.doc_id = co2.a JOIN n nb ON nb.doc_id = co2.b
        |  WHERE CAST(co2.common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - co2.common AS DOUBLE) >= 0.5),
        |ct AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM truth),
        |cl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_lsh FROM lsh),
        |cc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM truth t JOIN lsh l ON t.a = l.a AND t.b = l.b)
        |SELECT ct.n_true, cl.n_lsh, cc.n_common,
        |  CAST(cc.n_common AS DOUBLE) / CAST(NULLIF(ct.n_true, 0) AS DOUBLE)
        |    AS recall
        |FROM ct, cl, cc""".stripMargin)),

    // Dedup — MinHash+LSH: 8 band-min signatures, bucket-join candidates,
    // exact-Jaccard verify (the 100 TB dedup path).
    Q("dedup_minhash_lsh",
      (s, dir) => sessionMinhashPairs(s, dir)
        .orderBy(col("a"), col("b")),
      Some(s"""WITH $shingleSqlCte,
        |mh AS (SELECT doc_id, r.band AS band,
        |  MIN(('0x' || substr(md5(shingle) || md5(shingle), CAST(r.band*4+1 AS INTEGER), 15))::BIGINT) AS sig
        |  FROM sd, range(8) r(band) GROUP BY doc_id, r.band),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM mh x JOIN mh y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
        |co AS (SELECT t.a, t.b, COUNT(*) AS common FROM (
        |    SELECT c.a, c.b, x.shingle FROM cand c
        |    JOIN sd x ON x.doc_id = c.a
        |    JOIN sd y ON y.doc_id = c.b AND y.shingle = x.shingle) t
        |  GROUP BY t.a, t.b),
        |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sd GROUP BY doc_id),
        |j AS (SELECT co.a, co.b, co.common,
        |  CAST(co.common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - co.common AS DOUBLE) AS jaccard
        |  FROM co JOIN n na ON na.doc_id = co.a JOIN n nb ON nb.doc_id = co.b)
        |SELECT a, b, common, jaccard FROM j WHERE jaccard >= 0.5 ORDER BY a, b""".stripMargin)),

    // Dedup — 16-bit SimHash signatures + Hamming-distance pairs. The
    // Spark side generates candidates with the pigeonhole band join
    // (recall 1 by construction, no cross join); the oracle's brute-force
    // formulation is therefore the same result set.
    Q("dedup_simhash",
      (s, dir) => Dedup.simhashPairs(
          TextOps.simhash16(
            sessionShingles(s, dir),
            "doc_id"),
          "doc_id", 1)
        .orderBy(col("a"), col("b")),
      Some(s"""WITH $shingleSqlCte,
        |bits AS (SELECT doc_id, r.band AS b,
        |  substr(md5(shingle), CAST(r.band + 1 AS INTEGER), 1) IN ('1','3','5','7','9','b','d','f') AS odd
        |  FROM sd, range(16) r(band)),
        |v AS (SELECT doc_id, b, CAST(SUM(CASE WHEN odd THEN 1 ELSE -1 END) AS BIGINT) AS v
        |  FROM bits GROUP BY doc_id, b),
        |sh AS (SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN CAST(power(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM v GROUP BY doc_id)
        |SELECT x.doc_id AS a, y.doc_id AS b,
        |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
        |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.simhash, y.simhash)) <= 1 ORDER BY a, b""".stripMargin)),

    // Dedup — exact duplicated-substring spans (L29, the suffix-array
    // dedup of Lee et al. 2022 re-expressed as k-gram seeds + diagonal
    // merge; recall 1 for shared runs of >= 10 tokens by construction).
    Q("dedup_substring",
      (s, dir) => Dedup.substringDupSpans(
          Tables.documents(s, dir), "doc_id", "text", 10)
        .orderBy(col("a"), col("b"), col("a_start"), col("b_start")),
      Some(s"""WITH $toksSqlCte,
        |tt AS (SELECT doc_id, unnest(range(len(toks) - 9)) AS i FROM d WHERE len(toks) >= 10),
        |g AS (SELECT t.doc_id, CAST(t.i AS BIGINT) AS pos,
        |    array_to_string(d.toks[CAST(t.i + 1 AS INTEGER):CAST(t.i + 10 AS INTEGER)], ' ') AS gram
        |  FROM tt t JOIN d ON d.doc_id = t.doc_id),
        |m AS (SELECT x.doc_id AS a, y.doc_id AS b, x.pos AS pa, y.pos AS pb
        |  FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id),
        |runs AS (SELECT a, b, pa - pb AS diag, pa,
        |  pa - ROW_NUMBER() OVER (PARTITION BY a, b, pa - pb ORDER BY pa) AS grp FROM m)
        |SELECT a, b, MIN(pa) AS a_start, CAST(MIN(pa) - diag AS BIGINT) AS b_start,
        |  CAST(COUNT(*) + 9 AS BIGINT) AS span_len
        |FROM runs GROUP BY a, b, diag, grp
        |ORDER BY a, b, a_start, b_start""".stripMargin)),

    // L29 ∘ A4 — per-doc duplicated-token fraction (the Lee et al. 2022
    // headline metric): union the substring spans each doc participates
    // in (both orientations) with the exact IntervalUnionAgg, divide by
    // the doc's token count. One extra shuffle over the span table.
    Q("dedup_substring_stats",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val spans = Dedup.substringDupSpans(docs, "doc_id", "text", 10)
        val ivs = spans.select(col("a").as("doc_id"), col("a_start").as("s"),
            (col("a_start") + col("span_len")).as("e"))
          .unionAll(spans.select(col("b").as("doc_id"), col("b_start").as("s"),
            (col("b_start") + col("span_len")).as("e")))
        val unionLen = udaf(new graft.expr.IntervalUnionAgg())
        docs.select(col("doc_id"),
            size(TextOps.tokens(col("text"))).cast("long").as("n_toks"))
          .join(ivs.groupBy(col("doc_id"))
              .agg(unionLen(col("s"), col("e")).as("dup_toks")),
            Seq("doc_id"))
          .withColumn("dup_frac",
            col("dup_toks").cast("double") / col("n_toks").cast("double"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $toksSqlCte,
        |tt AS (SELECT doc_id, unnest(range(len(toks) - 9)) AS i FROM d WHERE len(toks) >= 10),
        |g AS (SELECT t.doc_id, CAST(t.i AS BIGINT) AS pos,
        |    array_to_string(d.toks[CAST(t.i + 1 AS INTEGER):CAST(t.i + 10 AS INTEGER)], ' ') AS gram
        |  FROM tt t JOIN d ON d.doc_id = t.doc_id),
        |m AS (SELECT x.doc_id AS a, y.doc_id AS b, x.pos AS pa, y.pos AS pb
        |  FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id),
        |runs AS (SELECT a, b, pa - pb AS diag, pa,
        |  pa - ROW_NUMBER() OVER (PARTITION BY a, b, pa - pb ORDER BY pa) AS grp FROM m),
        |spans AS (SELECT a, b, diag, MIN(pa) AS a_start,
        |  CAST(COUNT(*) + 9 AS BIGINT) AS span_len
        |  FROM runs GROUP BY a, b, diag, grp),
        |iv AS (SELECT a AS doc_id, a_start AS s, a_start + span_len AS e FROM spans
        |  UNION ALL SELECT b, a_start - diag, a_start - diag + span_len FROM spans),
        |ev AS (SELECT doc_id, s AS t, CAST(1 AS BIGINT) AS delta FROM iv
        |  UNION ALL SELECT doc_id, e AS t, CAST(-1 AS BIGINT) AS delta FROM iv),
        |c AS (SELECT doc_id, t, delta,
        |  CAST(SUM(delta) OVER w AS BIGINT) AS n_active, lead(t) OVER w AS next_t
        |  FROM ev WINDOW w AS (PARTITION BY doc_id ORDER BY t, delta
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |u AS (SELECT doc_id, CAST(SUM(next_t - t) AS BIGINT) AS dup_toks
        |  FROM c WHERE n_active > 0 AND next_t > t GROUP BY doc_id),
        |n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks FROM d)
        |SELECT u.doc_id, n.n_toks, u.dup_toks,
        |  CAST(u.dup_toks AS DOUBLE) / CAST(n.n_toks AS DOUBLE) AS dup_frac
        |FROM u JOIN n ON n.doc_id = u.doc_id ORDER BY u.doc_id""".stripMargin)),

    // L135 — SPAN SURGERY: the end product of substring dedup (the Lee
    // et al. 2022 pipeline CUTS the duplicated spans): every token
    // position a doc contributes as the LATER (b) side of a span pair
    // is removed — first occurrence keeps its text — and the cleaned
    // document is rebuilt as the canonical single-space token join.
    // Overlap needs no pre-merge: removal is the set union of covered
    // positions, decided per token by an exists() HOF over the doc's
    // own collected span list (no range join).
    Q("dedup_span_surgery",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.removeDupSpans(docs,
            Dedup.substringDupSpans(docs, "doc_id", "text", 10),
            "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $toksSqlCte,
        |tt AS (SELECT doc_id, unnest(range(len(toks) - 9)) AS i FROM d WHERE len(toks) >= 10),
        |g AS (SELECT t.doc_id, CAST(t.i AS BIGINT) AS pos,
        |    array_to_string(d.toks[CAST(t.i + 1 AS INTEGER):CAST(t.i + 10 AS INTEGER)], ' ') AS gram
        |  FROM tt t JOIN d ON d.doc_id = t.doc_id),
        |m AS (SELECT x.doc_id AS a, y.doc_id AS b, x.pos AS pa, y.pos AS pb
        |  FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id),
        |runs AS (SELECT a, b, pa - pb AS diag, pa,
        |  pa - ROW_NUMBER() OVER (PARTITION BY a, b, pa - pb ORDER BY pa) AS grp FROM m),
        |sp AS (SELECT b AS doc_id, CAST(MIN(pa) - diag AS BIGINT) AS s,
        |  CAST(MIN(pa) - diag + COUNT(*) + 9 AS BIGINT) AS e
        |  FROM runs GROUP BY a, b, diag, grp),
        |tp AS (SELECT doc_id, unnest(range(len(toks))) AS i FROM d),
        |tk AS (SELECT t.doc_id, CAST(t.i AS BIGINT) AS pos,
        |    d.toks[CAST(t.i + 1 AS INTEGER)] AS tok
        |  FROM tp t JOIN d ON d.doc_id = t.doc_id),
        |rm AS (SELECT DISTINCT tk.doc_id, tk.pos FROM tk
        |  JOIN sp ON sp.doc_id = tk.doc_id AND tk.pos >= sp.s AND tk.pos < sp.e),
        |keep AS (SELECT tk.doc_id, tk.pos, tk.tok FROM tk
        |  LEFT JOIN rm ON rm.doc_id = tk.doc_id AND rm.pos = tk.pos
        |  WHERE rm.pos IS NULL),
        |res AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  string_agg(tok, ' ' ORDER BY pos) AS clean_text FROM keep GROUP BY doc_id)
        |SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_toks,
        |  CAST(len(d.toks) AS BIGINT) - COALESCE(res.n_kept, 0) AS n_removed,
        |  COALESCE(res.clean_text, '') AS clean_text
        |FROM d LEFT JOIN res ON res.doc_id = d.doc_id ORDER BY d.doc_id""".stripMargin)),

    // Dedup — embedding-cosine near-dups on integer-quantized vectors
    // (exact longs: summation-order-free, bit-identical across engines).
    // The all-pairs kernel is the VERIFY BASELINE, registered on a
    // bounded slice (vec_id < 1500) like the MLlib integration flavors —
    // the full-corpus production paths are dedup_embedding_lsh (SRP
    // bands) and dedup_embedding_ivf (cells); no registered query runs
    // an unbounded cartesian (PlanSpec enforces this).
    Q("dedup_embedding_cosine",
      (s, dir) => Similarity.nearDupPairs(
          Similarity.quantize(
            Tables.embeddings(s, dir).filter(col("vec_id") < 1500),
            "vec_id", "embedding"),
          "vec_id", 0.45)
        .orderBy(col("a"), col("b")),
      Some(s"""WITH $quantSqlCte,
        |p AS (SELECT a.vec_id AS a, b.vec_id AS b, unnest(a.qv) AS av, unnest(b.qv) AS bv
        |  FROM q a, q b WHERE a.vec_id < b.vec_id AND a.vec_id < 1500 AND b.vec_id < 1500),
        |dt AS (SELECT a, b, CAST(SUM(av*bv) AS BIGINT) AS dot FROM p GROUP BY a, b),
        |sc AS (SELECT a, b, dot,
        |  CAST(dot AS DOUBLE)/(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |  FROM dt JOIN nm na ON na.vec_id = a JOIN nm nb ON nb.vec_id = b)
        |SELECT a, b, dot, cos FROM sc WHERE cos >= 0.45 ORDER BY a, b""".stripMargin)),

    // Similarity — brute-force cosine top-k (query side broadcast), the
    // ANN correctness baseline.
    Q("sim_cosine_topk",
      (s, dir) => {
        val q = Similarity.quantize(Tables.embeddings(s, dir), "vec_id", "embedding")
        Similarity.cosineTopK(q.filter(col("vec_id") < 10), q, "vec_id", 10)
          .orderBy(col("query_id"), col("rnk"))
      },
      Some(s"""WITH $quantSqlCte,
        |p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, unnest(a.qv) AS av, unnest(b.qv) AS bv
        |  FROM q a, q b WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id),
        |dt AS (SELECT query_id, neighbor_id, CAST(SUM(av*bv) AS BIGINT) AS dot FROM p GROUP BY query_id, neighbor_id),
        |sc AS (SELECT query_id, neighbor_id, dot,
        |  CAST(dot AS DOUBLE)/(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |  FROM dt JOIN nm na ON na.vec_id = query_id JOIN nm nb ON nb.vec_id = neighbor_id),
        |r AS (SELECT query_id, neighbor_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk,
        |  dot, cos FROM sc)
        |SELECT query_id, neighbor_id, rnk, dot, cos FROM r WHERE rnk <= 10
        |ORDER BY query_id, rnk""".stripMargin)),

    // Similarity — IVF-probe ANN top-k: corpus assigned to nearest seed
    // cell (rank 1), each query probes its 4 nearest of 16 cells, exact
    // rank within the probed population only — ~4/16 of the corpus per
    // query instead of all of it, the inverted-file search shape. The
    // oracle mirrors the probe scheme, so the ANN result (not the brute
    // answer) is what's checked.
    Q("sim_ann_ivf_topk",
      (s, dir) => {
        val q = Similarity.quantize(Tables.embeddings(s, dir), "vec_id", "embedding")
        Similarity.ivfTopK(q.filter(col("vec_id") < 10), q, "vec_id", 10,
            nCells = 16, nProbe = 4)
          .orderBy(col("query_id"), col("rnk"))
      },
      Some(s"""WITH $quantSqlCte,
        |seeds AS (SELECT vec_id AS seed_id, qv AS sv,
        |  sqrt(CAST(CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS DOUBLE)) AS snorm
        |  FROM q WHERE vec_id < 16),
        |cscored AS (SELECT q.vec_id, s.seed_id,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*s.sv[i])) AS BIGINT) AS DOUBLE)
        |    / s.snorm AS score
        |  FROM q CROSS JOIN seeds s),
        |cells AS (SELECT vec_id AS neighbor_id, seed_id AS cell FROM (
        |  SELECT vec_id, seed_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY score DESC, seed_id) AS rn FROM cscored) t WHERE rn = 1),
        |probes AS (SELECT vec_id AS query_id, seed_id AS cell FROM (
        |  SELECT vec_id, seed_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY score DESC, seed_id) AS rn FROM cscored WHERE vec_id < 10) t
        |  WHERE rn <= 4),
        |cand AS (SELECT p.query_id, c.neighbor_id FROM probes p
        |  JOIN cells c ON c.cell = p.cell AND c.neighbor_id <> p.query_id),
        |vd AS (SELECT query_id, neighbor_id,
        |  CAST(list_sum(list_transform(range(1,65), i -> qa.qv[i]*qb.qv[i])) AS BIGINT) AS dot
        |  FROM cand JOIN q qa ON qa.vec_id = query_id JOIN q qb ON qb.vec_id = neighbor_id),
        |sc AS (SELECT query_id, neighbor_id, dot,
        |  CAST(dot AS DOUBLE)/(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |  FROM vd JOIN nm na ON na.vec_id = query_id JOIN nm nb ON nb.vec_id = neighbor_id),
        |r AS (SELECT query_id, neighbor_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk,
        |  dot, cos FROM sc)
        |SELECT query_id, neighbor_id, rnk, dot, cos FROM r WHERE rnk <= 10
        |ORDER BY query_id, rnk""".stripMargin)),

    // Similarity — MLlib random-projection LSH candidates + exact
    // quantized-cosine verify. The candidate radius has a 0.1 cosine
    // slack and 12 seeded hash tables, so at this corpus's margin the
    // candidate stage provably covers every pair at cos ≥ 0.5 (per-pair
    // miss ≈ 0.39^12); the verify stage restores exact precision, making
    // the composition oracle-checkable against the brute-force SQL.
    // Secondary integration flavor on a bounded slice (vec_id < 1000):
    // approxSimilarityJoin's bucket-collision volume is quadratic on this
    // uniform synthetic corpus (no cluster structure for LSH to exploit),
    // so the full-corpus primaries are the deterministic SRP/minhash
    // paths; this entry demonstrates the MLlib integration end-to-end.
    Q("sim_ann_lsh",
      (s, dir) => MLlibOps.annVerifiedNearDups(
          Tables.embeddings(s, dir).filter(col("vec_id") < 1000),
          "vec_id", "embedding", 0.5)
        .orderBy(col("a"), col("b")),
      Some(s"""WITH $quantSqlCte,
        |p AS (SELECT a.vec_id AS a, b.vec_id AS b, unnest(a.qv) AS av, unnest(b.qv) AS bv
        |  FROM q a, q b WHERE a.vec_id < b.vec_id AND a.vec_id < 1000 AND b.vec_id < 1000),
        |dt AS (SELECT a, b, CAST(SUM(av*bv) AS BIGINT) AS dot FROM p GROUP BY a, b),
        |sc AS (SELECT a, b, dot,
        |  CAST(dot AS DOUBLE)/(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |  FROM dt JOIN nm na ON na.vec_id = a JOIN nm nb ON nb.vec_id = b)
        |SELECT a, b, dot, cos FROM sc WHERE cos >= 0.5 ORDER BY a, b""".stripMargin)),

    // L125 — STREAMING EMBEDDING NEAR-DUP: the vector feed quantized,
    // SRP-signed, and band-exploded upstream (stateless, codegen'd);
    // per-bucket state holds ONE canonical vector and every later
    // arrival verifies against it at ingest. One staged file = one
    // micro-batch (file-source batches are per-file), so the sorted
    // single pass reproduces the batch twin: (bucket-min, other) pairs
    // at cos ≥ 0.45 per band bucket.
    Q("streaming_near_dup",
      (s, dir) => withStreamingPartitions(s) {
        import s.implicits._
        val name = "snd_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_snd").toString
        val srcDir = stagedStreamSource("sndsrc", dir) { p =>
          graft.expr.LongArrayDot.register(s)
          val cs = graft.ops.SrpLsh.coefficients(60, 64)
          val q = Similarity.quantize(
            Tables.embeddings(s, dir), "vec_id", "embedding")
          val sig = q.withColumn("sig", graft.ops.SrpLsh.signature(col("qv"), cs))
          val banded = sig.select(col("vec_id"), col("qv"),
              posexplode(array((0 until 10).map(b =>
                expr(s"shiftright(sig, ${b * 6}) & 63")): _*)).as(Seq("band", "bv")))
            .select(col("band").cast("int").as("band"), col("bv"),
              col("vec_id").as("vecId"), col("qv"))
          writeHeartbeat(banded, p, "aa_vecs.parquet")
        }
        val schema = org.apache.spark.sql.Encoders.product[
          graft.streaming.StreamingOps.VecBucket].schema
        val raw = s.readStream.schema(schema).parquet(srcDir)
          .as[graft.streaming.StreamingOps.VecBucket]
        val q = graft.streaming.StreamingOps.streamingNearDup(raw, minCos = 0.45)
          .writeStream.format("memory").queryName(name).outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt))
        s.table(name).select(col("band").cast("long").as("band"), col("bv"),
            col("a"), col("b"), col("dot"), col("cos"))
          .orderBy(col("band"), col("bv"), col("b"))
      },
      Some(s"""WITH $quantSqlCte,
        |$srpSqlCte,
        |mn AS (SELECT band, bv, MIN(vec_id) AS a FROM bb GROUP BY 1, 2),
        |oth AS (SELECT bb.band, bb.bv, mn.a, bb.vec_id AS b FROM bb
        |  JOIN mn ON mn.band = bb.band AND mn.bv = bb.bv WHERE bb.vec_id > mn.a),
        |vd AS (SELECT o.band, o.bv, o.a, o.b,
        |  CAST(list_sum(list_transform(range(1,65), i -> qa.qv[i]*qb.qv[i])) AS BIGINT) AS dot
        |  FROM oth o JOIN q qa ON qa.vec_id = o.a JOIN q qb ON qb.vec_id = o.b),
        |sc AS (SELECT band, bv, a, b, dot,
        |  CAST(dot AS DOUBLE)/(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |  FROM vd JOIN nm na ON na.vec_id = a JOIN nm nb ON nb.vec_id = b)
        |SELECT band, bv, a, b, dot, cos FROM sc WHERE cos >= 0.45
        |ORDER BY band, bv, b""".stripMargin)),

    // Dedup — deterministic SRP-LSH band candidates + exact verify, the
    // 100 TB embedding-dedup composition. Both stages (fixed-seed ±1
    // projections, integer dots, band join, cosine verify) are mirrored
    // verbatim in the oracle, so the check is exact regardless of the
    // LSH recall curve.
    Q("dedup_embedding_lsh",
      (s, dir) => Similarity.srpNearDupPairs(
          Tables.embeddings(s, dir), "vec_id", "embedding", 0.45, dim = 64)
        .orderBy(col("a"), col("b")),
      Some(s"""WITH $quantSqlCte,
        |$srpSqlCte,
        |vd AS (SELECT c.a, c.b,
        |  CAST(list_sum(list_transform(range(1,65), i -> qa.qv[i]*qb.qv[i])) AS BIGINT) AS dot
        |  FROM scand c JOIN q qa ON qa.vec_id = c.a JOIN q qb ON qb.vec_id = c.b),
        |sc AS (SELECT a, b, dot,
        |  CAST(dot AS DOUBLE)/(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |  FROM vd JOIN nm na ON na.vec_id = a JOIN nm nb ON nb.vec_id = b)
        |SELECT a, b, dot, cos FROM sc WHERE cos >= 0.45 ORDER BY a, b""".stripMargin)),

    // Dedup — MLlib MinHash-LSH candidates + exact set-Jaccard verify
    // over the true shingle table. True near-dups here sit at Jaccard
    // ≥ 0.8, so 6 seeded hash tables give per-pair candidate miss
    // ≤ 0.2^6; the oracle is the exhaustive shared-shingle formulation.
    // Dedup — IVF-style ANN: nearest-centroid cell assignment (argmax
    // cosine against the 16 deterministic seed vectors), same-cell
    // candidate pairs, exact verify. The inverted-file shape: candidate
    // volume is sum of squared cell sizes, not n²; the oracle mirrors
    // the cell assignment relationally.
    Q("dedup_embedding_ivf",
      (s, dir) => sessionIvfPairs(s, dir)
        .orderBy(col("a"), col("b")),
      Some(s"""WITH $quantSqlCte,
        |seeds AS (SELECT vec_id AS seed_id, qv AS sv,
        |  sqrt(CAST(CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS DOUBLE)) AS snorm
        |  FROM q WHERE vec_id < 16),
        |scored AS (SELECT q.vec_id, s.seed_id,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*s.sv[i])) AS BIGINT) AS DOUBLE)
        |    / s.snorm AS score
        |  FROM q CROSS JOIN seeds s),
        |cells AS (SELECT vec_id, seed_id AS cell FROM (
        |  SELECT vec_id, seed_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY score DESC, seed_id) AS rn FROM scored) t WHERE rn = 1),
        |cand AS (SELECT x.vec_id AS a, y.vec_id AS b FROM cells x
        |  JOIN cells y ON x.cell = y.cell AND x.vec_id < y.vec_id),
        |vd AS (SELECT c.a, c.b,
        |  CAST(list_sum(list_transform(range(1,65), i -> qa.qv[i]*qb.qv[i])) AS BIGINT) AS dot
        |  FROM cand c JOIN q qa ON qa.vec_id = c.a JOIN q qb ON qb.vec_id = c.b),
        |sc AS (SELECT a, b, dot,
        |  CAST(dot AS DOUBLE)/(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |  FROM vd JOIN nm na ON na.vec_id = a JOIN nm nb ON nb.vec_id = b)
        |SELECT a, b, dot, cos FROM sc WHERE cos >= 0.45 ORDER BY a, b""".stripMargin)),

    // L102 — IVF CELL OCCUPANCY PROFILE: per-cell member counts + share
    // under the shared rank-1 quantized assignment — the index-health
    // table an IVF rollout reads before choosing nCells/seeds (skewed
    // occupancy = wildly varying probe cost + Σ|cell|² concentration).
    Q("sim_ivf_cell_profile",
      (s, dir) => Similarity.ivfCellProfileFrom(sessionIvfCells(s, dir))
        .orderBy(col("cell")),
      Some(s"""WITH $quantSqlCte,
        |seeds AS (SELECT vec_id AS seed_id, qv AS sv,
        |  sqrt(CAST(CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS DOUBLE)) AS snorm
        |  FROM q WHERE vec_id < 16),
        |scored AS (SELECT q.vec_id, s.seed_id,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*s.sv[i])) AS BIGINT) AS DOUBLE)
        |    / s.snorm AS score
        |  FROM q CROSS JOIN seeds s),
        |cells AS (SELECT vec_id, seed_id AS cell FROM (
        |  SELECT vec_id, seed_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY score DESC, seed_id) AS rn FROM scored) t WHERE rn = 1),
        |ct AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM cells GROUP BY cell),
        |tt AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS tot FROM ct)
        |SELECT ct.cell, ct.n_vecs,
        |  CAST(ct.n_vecs AS DOUBLE) / CAST(tt.tot AS DOUBLE) AS share
        |FROM ct, tt ORDER BY ct.cell""".stripMargin)),

    // L113 — IVF CODEBOOK TRAINING (FAISS train step): two Lloyd
    // iterations on the unit sphere from the shared seed init, with
    // EXACT integer sum-centroids (cosine vs the mean == cosine vs the
    // sum, so training is integer-replayable — the centroidClassify
    // posture applied to the refinement loop). The oracle unrolls both
    // iterations: seed-score argmax -> per-cell dim-parallel sums ->
    // re-score argmax -> final sums + counts.
    Q("sim_ivf_train",
      (s, dir) => Similarity.ivfTrain(sessionQuantEmb(s, dir), "vec_id",
          dim = 64, nCells = 16, iters = 2)
        .orderBy(col("cell")),
      Some(s"""WITH $quantSqlCte,
        |c0 AS (SELECT vec_id AS cell, qv AS cv FROM q WHERE vec_id < 16),
        |n0 AS (SELECT cell, cv, sqrt(CAST(CAST(list_sum(list_transform(cv, x -> x*x)) AS BIGINT) AS DOUBLE)) AS cnorm FROM c0),
        |s0 AS (SELECT q.vec_id, n.cell,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*n.cv[i])) AS BIGINT) AS DOUBLE) / n.cnorm AS score
        |  FROM q CROSS JOIN n0 n),
        |a0 AS (SELECT vec_id, cell FROM (SELECT vec_id, cell,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn FROM s0) t WHERE rn = 1),
        |cx1 AS (SELECT a0.cell, u.i AS i, CAST(SUM(q.qv[CAST(u.i AS INTEGER)]) AS BIGINT) AS s
        |  FROM a0 JOIN q ON q.vec_id = a0.vec_id, range(1, 65) u(i) GROUP BY 1, 2),
        |c1 AS (SELECT cell, list(s ORDER BY i) AS cv FROM cx1 GROUP BY cell),
        |n1 AS (SELECT cell, cv, sqrt(CAST(CAST(list_sum(list_transform(cv, x -> x*x)) AS BIGINT) AS DOUBLE)) AS cnorm FROM c1),
        |s1 AS (SELECT q.vec_id, n.cell,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*n.cv[i])) AS BIGINT) AS DOUBLE) / n.cnorm AS score
        |  FROM q CROSS JOIN n1 n),
        |a1 AS (SELECT vec_id, cell FROM (SELECT vec_id, cell,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn FROM s1) t WHERE rn = 1),
        |cx2 AS (SELECT a1.cell, u.i AS i, CAST(SUM(q.qv[CAST(u.i AS INTEGER)]) AS BIGINT) AS s
        |  FROM a1 JOIN q ON q.vec_id = a1.vec_id, range(1, 65) u(i) GROUP BY 1, 2),
        |c2 AS (SELECT cell, list(s ORDER BY i) AS cv FROM cx2 GROUP BY cell),
        |nv AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM a1 GROUP BY cell)
        |SELECT c2.cell, nv.n_vecs,
        |  CAST(list_sum(list_transform(c2.cv, x -> x*x)) AS BIGINT) AS csum_sq
        |FROM c2 JOIN nv ON nv.cell = c2.cell ORDER BY c2.cell""".stripMargin)),

    // L121 — DBSCAN DENSITY CLUSTERING over the IVF pair graph at the
    // looser ε = cos ≥ 0.30 (the SemDeDup 0.45 graph has degree ≤ 1
    // almost everywhere at this sf — everything would be noise): core
    // = degree ≥ 2, clusters = CC over core-core edges only, borders
    // adopt the min core-neighbor cluster, isolated matches drop as
    // noise — the density gate CC (L19) and LPA (L116) lack. Reuses
    // the session cell/quant memos; only the verify gate differs.
    // Oracle replays the pair CTEs and the core/border chain with a
    // recursive closure on cores.
    Q("sim_dbscan",
      (s, dir) => Similarity.dbscanClusters(
          Similarity.verifyPairs(
            Similarity.ivfCandidatesFrom(sessionIvfCells(s, dir), "vec_id"),
            sessionQuantEmb(s, dir), "vec_id", 0.30)
            .select(col("a"), col("b")),
          "a", "b", minPts = 2)
        .withColumnRenamed("node", "vec_id")
        .orderBy(col("vec_id")),
      Some(s"""WITH RECURSIVE $quantSqlCte,
        |seeds AS (SELECT vec_id AS seed_id, qv AS sv,
        |  sqrt(CAST(CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS DOUBLE)) AS snorm
        |  FROM q WHERE vec_id < 16),
        |cscore AS (SELECT q.vec_id, s.seed_id,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*s.sv[i])) AS BIGINT) AS DOUBLE)
        |    / s.snorm AS score
        |  FROM q CROSS JOIN seeds s),
        |cells AS (SELECT vec_id, seed_id AS cell FROM (
        |  SELECT vec_id, seed_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY score DESC, seed_id) AS rn FROM cscore) t WHERE rn = 1),
        |cand AS (SELECT x.vec_id AS a, y.vec_id AS b FROM cells x
        |  JOIN cells y ON x.cell = y.cell AND x.vec_id < y.vec_id),
        |vd AS (SELECT c.a, c.b,
        |  CAST(list_sum(list_transform(range(1,65), i -> qa.qv[i]*qb.qv[i])) AS BIGINT) AS dot
        |  FROM cand c JOIN q qa ON qa.vec_id = c.a JOIN q qb ON qb.vec_id = c.b),
        |jp AS (SELECT a, b FROM (SELECT a, b,
        |  CAST(dot AS DOUBLE)/(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |  FROM vd JOIN nm na ON na.vec_id = a JOIN nm nb ON nb.vec_id = b) t
        |  WHERE cos >= 0.30),
        |sym AS (SELECT a AS u, b AS v FROM jp UNION ALL SELECT b AS u, a AS v FROM jp),
        |core AS (SELECT u AS node FROM sym GROUP BY u HAVING COUNT(*) >= 2),
        |ce AS (SELECT s.u, s.v FROM sym s JOIN core cu ON cu.node = s.u
        |  JOIN core cv ON cv.node = s.v WHERE s.u < s.v),
        |cedir AS (SELECT u, v FROM ce UNION SELECT v AS u, u AS v FROM ce),
        |cc AS (SELECT node AS id, node AS r FROM core
        |  UNION SELECT cc.id, d.v FROM cc JOIN cedir d ON d.u = cc.r),
        |clab AS (SELECT id AS node, MIN(r) AS cluster FROM cc GROUP BY id),
        |blab AS (SELECT s.u AS node, MIN(cl.cluster) AS cluster FROM sym s
        |  JOIN clab cl ON cl.node = s.v
        |  WHERE s.u NOT IN (SELECT node FROM core) GROUP BY s.u)
        |SELECT node AS vec_id, 'core' AS role, cluster FROM clab
        |UNION ALL SELECT node AS vec_id, 'border' AS role, cluster FROM blab
        |ORDER BY vec_id""".stripMargin)),

    // L118 — MARGIN-BASED CROSS-SIDE PAIR MINING (the CCMatrix/LASER
    // criterion): sides = label parity; candidates = same IVF cell
    // cross-side; accept = mutual best both directions AND ratio
    // margin best/runner-up ≥ 1.02 with a positive runner-up. Margin
    // and cosine are the established dot/(sqrt·sqrt) idiom plus one
    // more division — every double the quotient of identically-
    // computed operands in both engines.
    Q("sim_margin_mine",
      (s, dir) => Similarity.marginMine(
          Tables.embeddings(s, dir)
            .withColumn("side", (col("label") % 2).cast("int")),
          "vec_id", "embedding", "side", minMargin = 1.02)
        .orderBy(col("a")),
      Some(s"""WITH $quantSqlCte,
        |sides AS (SELECT vec_id, CAST(label % 2 AS INTEGER) AS side FROM embeddings),
        |seeds AS (SELECT vec_id AS seed_id, qv AS sv,
        |  sqrt(CAST(CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS DOUBLE)) AS snorm
        |  FROM q WHERE vec_id < 16),
        |cscore AS (SELECT q.vec_id, s.seed_id,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*s.sv[i])) AS BIGINT) AS DOUBLE)
        |    / s.snorm AS score
        |  FROM q CROSS JOIN seeds s),
        |cells AS (SELECT vec_id, seed_id AS cell FROM (
        |  SELECT vec_id, seed_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY score DESC, seed_id) AS rn FROM cscore) t WHERE rn = 1),
        |qa AS (SELECT q.vec_id, q.qv, nm.nn, c.cell FROM q
        |  JOIN nm ON nm.vec_id = q.vec_id JOIN cells c ON c.vec_id = q.vec_id
        |  JOIN sides sd ON sd.vec_id = q.vec_id WHERE sd.side = 0),
        |qb AS (SELECT q.vec_id, q.qv, nm.nn, c.cell FROM q
        |  JOIN nm ON nm.vec_id = q.vec_id JOIN cells c ON c.vec_id = q.vec_id
        |  JOIN sides sd ON sd.vec_id = q.vec_id WHERE sd.side = 1),
        |sc AS (SELECT qa.vec_id AS a, qb.vec_id AS b,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> qa.qv[i]*qb.qv[i])) AS BIGINT) AS DOUBLE)
        |    / (sqrt(CAST(qa.nn AS DOUBLE)) * sqrt(CAST(qb.nn AS DOUBLE))) AS cos
        |  FROM qa JOIN qb ON qa.cell = qb.cell),
        |ra AS (SELECT a, b, cos, row_number() OVER (PARTITION BY a
        |    ORDER BY cos DESC, b) AS rn FROM sc),
        |b1 AS (SELECT a, b, cos AS c1 FROM ra WHERE rn = 1),
        |r2 AS (SELECT a, cos AS c2 FROM ra WHERE rn = 2),
        |bb AS (SELECT b, a FROM (SELECT a, b, row_number() OVER (PARTITION BY b
        |    ORDER BY cos DESC, a) AS rn FROM sc) t WHERE rn = 1)
        |SELECT b1.a, b1.b, b1.c1 AS cos, b1.c1 / r2.c2 AS margin
        |FROM b1 JOIN r2 ON r2.a = b1.a JOIN bb ON bb.b = b1.b AND bb.a = b1.a
        |WHERE r2.c2 > 0 AND b1.c1 / r2.c2 >= 1.02
        |ORDER BY b1.a""".stripMargin)),

    // L126 — SEMANTIC DECONTAMINATION: embedding-space benchmark
    // leakage scan (paraphrased eval rows share no shingles with the
    // benchmark — c_decontaminate misses them — but sit close in
    // embedding space). Probe set = vec_id % 37 == 0; both sides take
    // cells from the SHARED session IVF assignment, so candidates are
    // an equi join on the cell id against the tiny probe side; exact
    // cosine verify at 0.30, then per flagged vector the nearest probe
    // + hit count — the removal list with its evidence.
    Q("sim_semantic_decon",
      (s, dir) => Similarity.semanticDecontaminate(
          sessionIvfCells(s, dir), sessionQuantEmb(s, dir), "vec_id",
          probeMod = 37L, minCos = 0.30)
        .orderBy(col("vec_id")),
      Some(s"""WITH $quantSqlCte,
        |seeds AS (SELECT vec_id AS seed_id, qv AS sv,
        |  sqrt(CAST(CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS DOUBLE)) AS snorm
        |  FROM q WHERE vec_id < 16),
        |scored AS (SELECT q.vec_id, s.seed_id,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*s.sv[i])) AS BIGINT) AS DOUBLE)
        |    / s.snorm AS score
        |  FROM q CROSS JOIN seeds s),
        |cells AS (SELECT vec_id, seed_id AS cell FROM (
        |  SELECT vec_id, seed_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY score DESC, seed_id) AS rn FROM scored) t WHERE rn = 1),
        |cand AS (SELECT c.vec_id AS a, p.vec_id AS b FROM cells c
        |  JOIN cells p ON p.cell = c.cell AND p.vec_id % 37 = 0
        |  WHERE c.vec_id % 37 <> 0),
        |vd AS (SELECT c.a, c.b,
        |  CAST(list_sum(list_transform(range(1,65), i -> qa.qv[i]*qb.qv[i])) AS BIGINT) AS dot
        |  FROM cand c JOIN q qa ON qa.vec_id = c.a JOIN q qb ON qb.vec_id = c.b),
        |h AS (SELECT a, b, dot,
        |  CAST(dot AS DOUBLE)/(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |  FROM vd JOIN nm na ON na.vec_id = a JOIN nm nb ON nb.vec_id = b
        |  WHERE CAST(dot AS DOUBLE)/(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) >= 0.30),
        |ag AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS n_hits FROM h GROUP BY a),
        |bst AS (SELECT a, b, dot, cos FROM (SELECT *, row_number() OVER (
        |  PARTITION BY a ORDER BY cos DESC, b) AS rn FROM h) t WHERE rn = 1)
        |SELECT bst.a AS vec_id, bst.b AS nearest_probe, bst.dot, bst.cos, ag.n_hits
        |FROM bst JOIN ag ON ag.a = bst.a ORDER BY vec_id""".stripMargin)),

    // L127 — MMR DIVERSIFIED TOP-K: greedy Maximal-Marginal-Relevance
    // re-rank of the brute top-10 pool (selectK = 3, λ = ½ up to the
    // common positive scale: score = rel − max cos to the already-
    // selected). The greedy loop runs per query inside flatMapGroups
    // over ≤ 10 candidates; every decision is exact-long dots + one
    // double division, so the oracle unrolls all three picks
    // relationally and matches bit-for-bit.
    Q("sim_mmr_topk",
      (s, dir) => Similarity.mmrTopK(
          sessionQuantEmb(s, dir).filter(col("vec_id") < 8),
          sessionQuantEmb(s, dir), "vec_id", poolK = 10, selectK = 3)
        .orderBy(col("query_id"), col("sel_rank")),
      Some(s"""WITH $quantSqlCte,
        |sc AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |  CAST(list_sum(list_transform(range(1,65), i -> a.qv[i]*b.qv[i])) AS BIGINT) AS dot
        |  FROM q a, q b WHERE a.vec_id < 8 AND a.vec_id <> b.vec_id),
        |rl AS (SELECT query_id, neighbor_id,
        |  CAST(dot AS DOUBLE)/(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) AS rel
        |  FROM sc JOIN nm na ON na.vec_id = query_id JOIN nm nb ON nb.vec_id = neighbor_id),
        |pool AS (SELECT query_id, neighbor_id, rel FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY rel DESC, neighbor_id) AS rn FROM rl) t WHERE rn <= 10),
        |ps AS (SELECT x.query_id, x.neighbor_id AS a, y.neighbor_id AS b,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> qa.qv[i]*qb.qv[i])) AS BIGINT) AS DOUBLE)
        |    /(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) AS cs
        |  FROM pool x JOIN pool y ON y.query_id = x.query_id AND y.neighbor_id <> x.neighbor_id
        |  JOIN q qa ON qa.vec_id = x.neighbor_id JOIN q qb ON qb.vec_id = y.neighbor_id
        |  JOIN nm na ON na.vec_id = x.neighbor_id JOIN nm nb ON nb.vec_id = y.neighbor_id),
        |p1 AS (SELECT query_id, neighbor_id AS s1, rel AS m1 FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY rel DESC, neighbor_id) AS rn FROM pool) t WHERE rn = 1),
        |c2 AS (SELECT p.query_id, p.neighbor_id, p.rel - ps.cs AS m
        |  FROM pool p JOIN p1 ON p1.query_id = p.query_id AND p.neighbor_id <> p1.s1
        |  JOIN ps ON ps.query_id = p.query_id AND ps.a = p.neighbor_id AND ps.b = p1.s1),
        |p2 AS (SELECT query_id, neighbor_id AS s2, m AS m2 FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY m DESC, neighbor_id) AS rn FROM c2) t WHERE rn = 1),
        |c3 AS (SELECT p.query_id, p.neighbor_id, p.rel - greatest(pa.cs, pb.cs) AS m
        |  FROM pool p JOIN p1 ON p1.query_id = p.query_id JOIN p2 ON p2.query_id = p.query_id
        |  JOIN ps pa ON pa.query_id = p.query_id AND pa.a = p.neighbor_id AND pa.b = p1.s1
        |  JOIN ps pb ON pb.query_id = p.query_id AND pb.a = p.neighbor_id AND pb.b = p2.s2
        |  WHERE p.neighbor_id <> p1.s1 AND p.neighbor_id <> p2.s2),
        |p3 AS (SELECT query_id, neighbor_id AS s3, m AS m3 FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY m DESC, neighbor_id) AS rn FROM c3) t WHERE rn = 1)
        |SELECT query_id, CAST(1 AS BIGINT) AS sel_rank, s1 AS neighbor_id, m1 AS mmr FROM p1
        |UNION ALL SELECT query_id, CAST(2 AS BIGINT), s2, m2 FROM p2
        |UNION ALL SELECT query_id, CAST(3 AS BIGINT), s3, m3 FROM p3
        |ORDER BY query_id, sel_rank""".stripMargin)),

    // L133 — LATE-INTERACTION (ColBERT MaxSim) RETRIEVAL: both sides
    // split into 4 sub-vector facets; pair score = Σ_i max_j
    // dot(q_i, d_j) — per query facet the best doc facet, summed. All
    // integer (dots, max, sum — order-free, partial-agg-commuting);
    // query bag broadcast, corpus exploded ×4 once, two map-side
    // aggregates + a top-k window.
    Q("sim_late_interaction",
      (s, dir) => Similarity.lateInteractionTopK(
          sessionQuantEmb(s, dir).filter(col("vec_id") < 6),
          sessionQuantEmb(s, dir), "vec_id", dim = 64, nSub = 4, k = 10)
        .orderBy(col("query_id"), col("rnk")),
      Some(s"""WITH $quantSqlCte,
        |qs AS (SELECT vec_id AS query_id, i.i AS qi,
        |  qv[CAST(i.i*16 + 1 AS INTEGER) : CAST(i.i*16 + 16 AS INTEGER)] AS qsub
        |  FROM q, range(4) i(i) WHERE vec_id < 6),
        |ds AS (SELECT vec_id AS neighbor_id, j.j AS dj,
        |  qv[CAST(j.j*16 + 1 AS INTEGER) : CAST(j.j*16 + 16 AS INTEGER)] AS dsub
        |  FROM q, range(4) j(j)),
        |dt AS (SELECT qs.query_id, ds.neighbor_id, qs.qi,
        |  MAX(CAST(list_sum(list_transform(range(1,17), t -> qs.qsub[t]*ds.dsub[t])) AS BIGINT)) AS ms
        |  FROM qs JOIN ds ON ds.neighbor_id <> qs.query_id
        |  GROUP BY 1, 2, 3),
        |sc AS (SELECT query_id, neighbor_id, CAST(SUM(ms) AS BIGINT) AS score
        |  FROM dt GROUP BY 1, 2),
        |r AS (SELECT query_id, neighbor_id, score,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk FROM sc)
        |SELECT query_id, rnk, neighbor_id, score FROM r WHERE rnk <= 10
        |ORDER BY query_id, rnk""".stripMargin)),

    // L136 — DIMENSION-TRUNCATION RECALL AUDIT (Matryoshka serving):
    // top-10 under the full 64 dims vs top-10 under the 16-dim prefix,
    // per-query overlap + recall. Two broadcast top-k passes, one equi
    // join; the oracle mirrors both rank chains.
    Q("sim_truncation_recall",
      (s, dir) => Similarity.truncationRecall(
          sessionQuantEmb(s, dir).filter(col("vec_id") < 8),
          sessionQuantEmb(s, dir), "vec_id", prefixDim = 16, k = 10)
        .orderBy(col("query_id")),
      Some(s"""WITH $quantSqlCte,
        |p64 AS (SELECT query_id, neighbor_id FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |      CAST(CAST(list_sum(list_transform(range(1,65), i -> a.qv[i]*b.qv[i])) AS BIGINT) AS DOUBLE)
        |        /(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) DESC, b.vec_id) AS rn
        |  FROM q a JOIN q b ON a.vec_id < 8 AND a.vec_id <> b.vec_id
        |  JOIN nm na ON na.vec_id = a.vec_id JOIN nm nb ON nb.vec_id = b.vec_id) t
        |  WHERE rn <= 10),
        |q16 AS (SELECT vec_id, qv[1:16] AS qv FROM q),
        |n16 AS (SELECT vec_id, CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS nn FROM q16),
        |p16 AS (SELECT query_id, neighbor_id FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |      CAST(CAST(list_sum(list_transform(range(1,17), i -> a.qv[i]*b.qv[i])) AS BIGINT) AS DOUBLE)
        |        /(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) DESC, b.vec_id) AS rn
        |  FROM q16 a JOIN q16 b ON a.vec_id < 8 AND a.vec_id <> b.vec_id
        |  JOIN n16 na ON na.vec_id = a.vec_id JOIN n16 nb ON nb.vec_id = b.vec_id) t
        |  WHERE rn <= 10),
        |cm AS (SELECT p64.query_id, CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM p64 JOIN p16 ON p16.query_id = p64.query_id
        |    AND p16.neighbor_id = p64.neighbor_id GROUP BY 1)
        |SELECT qq.vec_id AS query_id, COALESCE(cm.n_common, 0) AS n_common,
        |  CAST(COALESCE(cm.n_common, 0) AS DOUBLE) / CAST(10 AS DOUBLE) AS recall
        |FROM q qq LEFT JOIN cm ON cm.query_id = qq.vec_id
        |WHERE qq.vec_id < 8 ORDER BY query_id""".stripMargin)),

    // L140 — CLUSTER-BALANCED SAMPLING (the D4 diversify step): k
    // representatives per IVF cell by deterministic md5 rank — a
    // diversity-preserving subset however skewed the cell occupancy.
    // One window over the shared session cell assignment.
    Q("sim_cluster_sample",
      (s, dir) => {
        val w = Window.partitionBy(col("cell"))
          .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        sessionIvfCells(s, dir)
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 5)
          .select(col("cell"), col("rk"), col("vec_id"))
          .orderBy(col("cell"), col("rk"))
      },
      Some(s"""WITH $quantSqlCte,
        |seeds AS (SELECT vec_id AS seed_id, qv AS sv,
        |  sqrt(CAST(CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS DOUBLE)) AS snorm
        |  FROM q WHERE vec_id < 16),
        |scored AS (SELECT q.vec_id, s.seed_id,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*s.sv[i])) AS BIGINT) AS DOUBLE)
        |    / s.snorm AS score
        |  FROM q CROSS JOIN seeds s),
        |cells AS (SELECT vec_id, seed_id AS cell FROM (
        |  SELECT vec_id, seed_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY score DESC, seed_id) AS rn FROM scored) t WHERE rn = 1),
        |rk AS (SELECT cell, vec_id, CAST(row_number() OVER (PARTITION BY cell
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS rk FROM cells)
        |SELECT cell, rk, vec_id FROM rk WHERE rk <= 5 ORDER BY cell, rk""".stripMargin)),

    // L141 — PROTOTYPICALITY PRUNING (D4 / SSL-prototypes): per IVF
    // cell, rank members by cosine to the EXACT integer sum-centroid
    // and flag the top fifth most prototypical for removal — the
    // redundant cluster core; the oracle rebuilds the centroids
    // dim-wise and mirrors rank + drop rule exactly.
    Q("sim_proto_prune",
      (s, dir) => Similarity.prototypicalPrune(
          sessionIvfCells(s, dir), sessionQuantEmb(s, dir), "vec_id",
          dim = 64, dropDenom = 5)
        .orderBy(col("cell"), col("rnk")),
      Some(s"""WITH $quantSqlCte,
        |seeds AS (SELECT vec_id AS seed_id, qv AS sv,
        |  sqrt(CAST(CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS DOUBLE)) AS snorm
        |  FROM q WHERE vec_id < 16),
        |scored AS (SELECT q.vec_id, s.seed_id,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*s.sv[i])) AS BIGINT) AS DOUBLE)
        |    / s.snorm AS score
        |  FROM q CROSS JOIN seeds s),
        |cells AS (SELECT vec_id, seed_id AS cell FROM (
        |  SELECT vec_id, seed_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY score DESC, seed_id) AS rn FROM scored) t WHERE rn = 1),
        |cd AS (SELECT c.cell, t.i, CAST(SUM(q.qv[CAST(t.i AS INTEGER)]) AS BIGINT) AS cv
        |  FROM cells c JOIN q ON q.vec_id = c.vec_id, range(1, 65) t(i)
        |  GROUP BY 1, 2),
        |ca AS (SELECT cell, list(cv ORDER BY i) AS cv FROM cd GROUP BY cell),
        |cn AS (SELECT ca.cell, CAST(COUNT(*) AS BIGINT) AS cn,
        |    sqrt(CAST(CAST(list_sum(list_transform(ca.cv, x -> x*x)) AS BIGINT) AS DOUBLE)) AS cnorm
        |  FROM ca JOIN cells ON cells.cell = ca.cell GROUP BY ca.cell, ca.cv),
        |pr AS (SELECT c.cell, c.vec_id,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*ca.cv[i])) AS BIGINT) AS DOUBLE)
        |    /(sqrt(CAST(nm.nn AS DOUBLE))*cn.cnorm) AS proto, cn.cn
        |  FROM cells c JOIN q ON q.vec_id = c.vec_id
        |  JOIN nm ON nm.vec_id = c.vec_id
        |  JOIN ca ON ca.cell = c.cell JOIN cn ON cn.cell = c.cell),
        |rk AS (SELECT cell, vec_id, proto, cn,
        |  CAST(row_number() OVER (PARTITION BY cell ORDER BY proto DESC, vec_id) AS BIGINT) AS rnk
        |  FROM pr)
        |SELECT cell, vec_id, rnk, proto, (rnk * 5 <= cn) AS dropped
        |FROM rk ORDER BY cell, rnk""".stripMargin)),

    // L132 — GREEDY k-CENTER CORESET (farthest-point sampling): 4
    // representatives, each wave one broadcast-scored corpus pass with
    // a TakeOrdered argmin of the max-cos-to-selected. The oracle
    // unrolls all four waves (greatest() chains = the max aggregate)
    // and matches every selection score bit-for-bit.
    Q("sim_coreset_fps",
      (s, dir) => Similarity.coresetGreedy(sessionQuantEmb(s, dir), "vec_id", 4)
        .orderBy(col("rank")),
      Some(s"""WITH $quantSqlCte,
        |r1 AS (SELECT MIN(vec_id) AS id FROM q),
        |v1 AS (SELECT q.vec_id, q.qv, nm.nn FROM q JOIN nm USING(vec_id)
        |  JOIN r1 ON q.vec_id = r1.id),
        |c1 AS (SELECT q.vec_id,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*v1.qv[i])) AS BIGINT) AS DOUBLE)
        |    /(sqrt(CAST(n.nn AS DOUBLE))*sqrt(CAST(v1.nn AS DOUBLE))) AS c
        |  FROM q JOIN nm n USING(vec_id) CROSS JOIN v1 WHERE q.vec_id <> v1.vec_id),
        |w2 AS (SELECT vec_id, c AS mc FROM c1 ORDER BY c, vec_id LIMIT 1),
        |v2 AS (SELECT q.vec_id, q.qv, nm.nn FROM q JOIN nm USING(vec_id)
        |  JOIN w2 ON q.vec_id = w2.vec_id),
        |c2 AS (SELECT q.vec_id,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*v2.qv[i])) AS BIGINT) AS DOUBLE)
        |    /(sqrt(CAST(n.nn AS DOUBLE))*sqrt(CAST(v2.nn AS DOUBLE))) AS c
        |  FROM q JOIN nm n USING(vec_id) CROSS JOIN v2 WHERE q.vec_id <> v2.vec_id),
        |m3 AS (SELECT c1.vec_id, greatest(c1.c, c2.c) AS mc
        |  FROM c1 JOIN c2 ON c2.vec_id = c1.vec_id),
        |w3 AS (SELECT vec_id, mc FROM m3 ORDER BY mc, vec_id LIMIT 1),
        |v3 AS (SELECT q.vec_id, q.qv, nm.nn FROM q JOIN nm USING(vec_id)
        |  JOIN w3 ON q.vec_id = w3.vec_id),
        |c3 AS (SELECT q.vec_id,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*v3.qv[i])) AS BIGINT) AS DOUBLE)
        |    /(sqrt(CAST(n.nn AS DOUBLE))*sqrt(CAST(v3.nn AS DOUBLE))) AS c
        |  FROM q JOIN nm n USING(vec_id) CROSS JOIN v3 WHERE q.vec_id <> v3.vec_id),
        |m4 AS (SELECT m3.vec_id, greatest(m3.mc, c3.c) AS mc
        |  FROM m3 JOIN c3 ON c3.vec_id = m3.vec_id),
        |w4 AS (SELECT vec_id, mc FROM m4 ORDER BY mc, vec_id LIMIT 1)
        |SELECT CAST(1 AS BIGINT) AS rank, id AS vec_id, CAST(-1.0 AS DOUBLE) AS sel_cos FROM r1
        |UNION ALL SELECT CAST(2 AS BIGINT), vec_id, mc FROM w2
        |UNION ALL SELECT CAST(3 AS BIGINT), vec_id, mc FROM w3
        |UNION ALL SELECT CAST(4 AS BIGINT), vec_id, mc FROM w4
        |ORDER BY rank""".stripMargin)),

    // ANN RECALL AUDIT (the dedup_lsh_recall pattern extended to the
    // vector indexes): exhaustive quantized-cosine pairs at cos ≥ 0.45
    // on the documented bounded slice (vec_id < 1500) are ground truth;
    // the SRP band candidates and IVF same-cell candidates are the two
    // production candidate paths, measured BEFORE their exact verify
    // (verify restores precision, only the candidate stage loses
    // recall). One row per index: a recall printed per corpus beats the
    // 1−(1−p^r)^L S-curve assumed per paper. Both candidate sets are
    // slice-stable: band membership and argmax-cell assignment depend
    // only on the pair's own vectors and the fixed seeds.
    Q("sim_ann_recall",
      (s, dir) => {
        val q = sessionQuantEmb(s, dir).filter(col("vec_id") < 1500).cache()
        q.count() // eager: truth, both candidate paths, and the joins
        val truth = Similarity.nearDupPairs(q, "vec_id", 0.45)
          .select(col("a"), col("b")).cache()
        truth.count()
        def audit(idx: String, cand0: DataFrame) = {
          val cand = cand0.select(col("a"), col("b")).cache()
          cand.count()
          truth.agg(count(lit(1)).as("n_true"))
            .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
            .crossJoin(truth.join(cand, Seq("a", "b"))
              .agg(count(lit(1)).as("n_common")))
            .select(lit(idx).as("idx"), col("n_true"), col("n_cand"),
              col("n_common"),
              when(col("n_true") === 0L, lit(null).cast("double"))
                .otherwise(col("n_common").cast("double")
                  / col("n_true").cast("double")).as("recall"))
        }
        // the session cell assignment restricted to the slice IS the
        // slice's assignment (row-local given the broadcast seeds)
        audit("ivf", Similarity.ivfCandidatesFrom(
            sessionIvfCells(s, dir).filter(col("vec_id") < 1500), "vec_id"))
          .unionAll(audit("srp", Similarity.srpCandidates(q, "vec_id", 64)))
          .orderBy(col("idx"))
      },
      Some(s"""WITH q AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS qv
        |  FROM embeddings WHERE vec_id < 1500),
        |nm AS (SELECT vec_id, CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS nn FROM q),
        |$srpSqlCte,
        |p AS (SELECT a.vec_id AS a, b.vec_id AS b, unnest(a.qv) AS av, unnest(b.qv) AS bv
        |  FROM q a, q b WHERE a.vec_id < b.vec_id),
        |dt AS (SELECT a, b, CAST(SUM(av*bv) AS BIGINT) AS dot FROM p GROUP BY a, b),
        |truth AS (SELECT a, b FROM (SELECT a, b,
        |    CAST(dot AS DOUBLE)/(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |    FROM dt JOIN nm na ON na.vec_id = a JOIN nm nb ON nb.vec_id = b) t
        |  WHERE cos >= 0.45),
        |seeds AS (SELECT vec_id AS seed_id, qv AS sv,
        |  sqrt(CAST(CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS DOUBLE)) AS snorm
        |  FROM q WHERE vec_id < 16),
        |scored AS (SELECT q.vec_id, s.seed_id,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*s.sv[i])) AS BIGINT) AS DOUBLE)
        |    / s.snorm AS score
        |  FROM q CROSS JOIN seeds s),
        |cells AS (SELECT vec_id, seed_id AS cell FROM (
        |  SELECT vec_id, seed_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY score DESC, seed_id) AS rn FROM scored) t WHERE rn = 1),
        |icand AS (SELECT x.vec_id AS a, y.vec_id AS b FROM cells x
        |  JOIN cells y ON x.cell = y.cell AND x.vec_id < y.vec_id),
        |stats AS (
        |  SELECT 'ivf' AS idx,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM icand) AS n_cand,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth t
        |       JOIN icand c ON c.a = t.a AND c.b = t.b) AS n_common
        |  UNION ALL
        |  SELECT 'srp',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth),
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM scand),
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth t
        |       JOIN scand c ON c.a = t.a AND c.b = t.b))
        |SELECT idx, n_true, n_cand, n_common,
        |  CAST(n_common AS DOUBLE) / CAST(NULLIF(n_true, 0) AS DOUBLE) AS recall
        |FROM stats ORDER BY idx""".stripMargin)),

    // Secondary integration flavor on a bounded slice (doc_id < 2500) —
    // see sim_ann_lsh; dedup_minhash_lsh is the full-corpus primary.
    Q("dedup_minhash_mllib",
      (s, dir) => MLlibOps.minhashVerifiedNearDups(
          Tables.documents(s, dir).filter(col("doc_id") < 2500),
          "doc_id", "text", 3, 0.5)
        .orderBy(col("a"), col("b")),
      Some(s"""WITH $shingleSqlCte,
        |cand AS (SELECT DISTINCT sa.doc_id AS a, sb.doc_id AS b
        |  FROM sd sa JOIN sd sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
        |  WHERE sa.doc_id < 2500 AND sb.doc_id < 2500),
        |co AS (SELECT t.a, t.b, COUNT(*) AS common FROM (
        |    SELECT c.a, c.b, x.shingle FROM cand c
        |    JOIN sd x ON x.doc_id = c.a
        |    JOIN sd y ON y.doc_id = c.b AND y.shingle = x.shingle) t
        |  GROUP BY t.a, t.b),
        |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sd GROUP BY doc_id),
        |j AS (SELECT co.a, co.b, co.common,
        |  CAST(co.common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - co.common AS DOUBLE) AS jaccard
        |  FROM co JOIN n na ON na.doc_id = co.a JOIN n nb ON nb.doc_id = co.b)
        |SELECT a, b, common, jaccard FROM j WHERE jaccard >= 0.5 ORDER BY a, b""".stripMargin)),

    // Curation — benchmark DECONTAMINATION: corpus docs sharing >= 3
    // distinct word-3-grams with any probe (benchmark) doc. The probe
    // side is tiny and broadcast; the corpus streams by on the shingle
    // equi key — the standard pre-training decontamination sweep.
    Q("c_decontaminate",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Curation.decontaminate(
            docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20),
            "doc_id", "text", shingleN = 3, minHits = 3L)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $shingleSqlCte,
        |cs AS (SELECT doc_id, shingle FROM sd WHERE doc_id >= 20),
        |ps AS (SELECT doc_id AS probe_id, shingle FROM sd WHERE doc_id < 20),
        |h AS (SELECT cs.doc_id, COUNT(DISTINCT cs.shingle) AS n_hits,
        |  COUNT(DISTINCT ps.probe_id) AS n_probes
        |  FROM cs JOIN ps ON ps.shingle = cs.shingle GROUP BY cs.doc_id)
        |SELECT doc_id, n_hits, n_probes FROM h WHERE n_hits >= 3
        |ORDER BY doc_id""".stripMargin)),

    // Curation — deterministic hash-gate sampling (md5-prefix Bernoulli
    // gate, rate 0x2a/0x100 ≈ 16.4%): reproducible across engines,
    // reruns, and repartitions, unlike rand(). Per-lang pre/post tallies.
    Q("c_hash_sample",
      (s, dir) => Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(Curation.hashSampleGate(col("doc_id"), "2a", 2), 1L)
            .otherwise(0L)).as("n_sampled"))
        .orderBy(col("lang")),
      Some("""SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,2) < '2a'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // Curation — mixture-weight allocation: split a 1M-token budget
    // across languages proportionally to corpus size by largest
    // remainder (Hamilton), exact integer arithmetic end to end.
    Q("c_mix_weights",
      (s, dir) => Curation.allocateBudget(
          Tables.documents(s, dir).groupBy(col("lang"))
            .agg(sum(col("n_chars")).as("tokens")),
          "lang", "tokens", budget = 1000000L)
        .orderBy(col("lang")),
      Some("""WITH t AS (SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS tokens
        |  FROM documents GROUP BY lang),
        |w AS (SELECT lang, tokens, CAST(SUM(tokens) OVER () AS BIGINT) AS T FROM t),
        |f AS (SELECT lang, tokens, (1000000 * tokens) // T AS fl,
        |  (1000000 * tokens) % T AS rem FROM w),
        |r AS (SELECT lang, tokens, fl,
        |  row_number() OVER (ORDER BY rem DESC, lang) AS rk,
        |  1000000 - CAST(SUM(fl) OVER () AS BIGINT) AS leftover FROM f)
        |SELECT lang, tokens,
        |  CAST(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r ORDER BY lang""".stripMargin)),

    // Curation — exact-quota stratified sample: Hamilton-allocated
    // per-lang quotas (budget 100 docs, proportional to stratum size)
    // filled by deterministic md5-rank within each stratum. Exactly 100
    // rows out, reproducible across engines — the L14+L15 composition.
    Q("c_stratified_sample",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
        val quotas = Curation.allocateBudget(
            docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs")),
            "lang", "n_docs", budget = 100L)
          .select(col("lang"), col("alloc").as("quota"))
        Curation.stratifiedSample(docs, "lang", "doc_id", quotas)
          .orderBy(col("lang"), col("doc_id"))
      },
      Some("""WITH t AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
        |w AS (SELECT lang, n_docs, CAST(SUM(n_docs) OVER () AS BIGINT) AS T FROM t),
        |f AS (SELECT lang, n_docs, (100 * n_docs) // T AS fl,
        |  (100 * n_docs) % T AS rem FROM w),
        |r AS (SELECT lang, fl,
        |  row_number() OVER (ORDER BY rem DESC, lang) AS rk,
        |  100 - CAST(SUM(fl) OVER () AS BIGINT) AS leftover FROM f),
        |qt AS (SELECT lang, fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS quota FROM r),
        |sr AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn FROM documents)
        |SELECT sr.doc_id, sr.lang FROM sr JOIN qt ON qt.lang = sr.lang AND sr.rn <= qt.quota
        |ORDER BY sr.lang, sr.doc_id""".stripMargin)),

    // J-series — salted replicate join: hot-key skew control when the
    // small side can't broadcast and AQE's skew split is pinned by a
    // reused shuffle. Result is exactly the plain inner join (the oracle
    // IS the plain join); the salt only reshapes the plan — partition-id
    // salt on the probe side, explode-replicated build side, equi join
    // on (key, salt).
    Q("j_salted_skew",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
        val p = Tables.part(s, dir)
          .select(col("p_partkey").as("l_partkey"), col("p_brand"))
        SegmentOps.saltedReplicateJoin(li, p, "l_partkey", 8)
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("l_extendedprice") * (lit(1d) - col("l_discount")) * 10000d)
              .cast("long")).as("revenue_e4"))
          .orderBy(col("p_brand"))
      },
      Some("""SELECT p_brand, COUNT(*) AS n,
        |  CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // J9 — AS-OF join (SegmentOps.asofJoin): each click event picks up
    // the user's most recent purchase at-or-before it. The merged-stream
    // window formulation — one shuffle on user_id, no join operator, no
    // range explosion. DuckDB's native ASOF LEFT JOIN is the oracle
    // (right side pre-deduped to one row per (user, ts), max event_id
    // wins, mirroring the operator's tie rule).
    Q("j9_asof_join",
      (s, dir) => {
        val ev0 = Tables.events(s, dir)
        val ev = ev0.select(col("event_id"), col("user_id"),
            Tables.tsUs(ev0).as("tus"), col("event_type"),
            round(col("value") * 100d).cast("long").as("cents"))
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "tus")
        val buys = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "tus", "cents")
        SegmentOps.asofJoin(clicks, buys, "user_id", "tus", "tus", "event_id",
            Seq("cents"))
          .select(col("user_id"), col("event_id"), col("tus"),
            col("asof.tus").as("prev_tus"), col("asof.cents").as("prev_cents"),
            (col("tus") - col("asof.tus")).as("lag_us"))
          .orderBy(col("user_id"), col("tus"), col("event_id"))
      },
      Some(s"""WITH $evPointsSqlCte,
        |l AS (SELECT user_id, event_id, tus FROM e WHERE event_type = 'click'),
        |r0 AS (SELECT user_id, event_id, tus, cents FROM e WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, tus, cents FROM (SELECT user_id, tus, cents,
        |  row_number() OVER (PARTITION BY user_id, tus ORDER BY event_id DESC) AS rn
        |  FROM r0) t WHERE rn = 1)
        |SELECT l.user_id, l.event_id, l.tus, r.tus AS prev_tus,
        |  r.cents AS prev_cents, l.tus - r.tus AS lag_us
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.tus >= r.tus
        |ORDER BY l.user_id, l.tus, l.event_id""".stripMargin)),

    // Curation — EXACT token-length quantiles, distributed shape:
    // per-value counts (hash shuffle on the value), then the running
    // count over sorted DISTINCT values picks ceil(q·n/100) — the exact
    // answer without a global row sort, and portable unlike sketch
    // percentiles. The length distribution is what quality gates (P4/P5
    // analogs, Gopher length filters) are calibrated against.
    Q("t_length_quantiles",
      (s, dir) => Curation.discreteQuantiles(
          Tables.documents(s, dir)
            .select(TextOps.tokenCount(col("text")).as("n_tok")),
          "n_tok", Seq(1, 10, 25, 50, 75, 90, 99)),
      Some("""WITH v AS (SELECT CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS v
        |  FROM documents),
        |c AS (SELECT v, COUNT(*) AS c FROM v GROUP BY v),
        |cum AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum,
        |  CAST(SUM(c) OVER () AS BIGINT) AS n FROM c),
        |q AS (SELECT CAST(unnest([1,10,25,50,75,90,99]) AS BIGINT) AS q_pct),
        |t AS (SELECT q.q_pct, (q.q_pct * cum.n + 99) // 100 AS target, cum.v, cum.cum
        |  FROM q CROSS JOIN cum)
        |SELECT q_pct, MIN(v) AS value FROM t WHERE cum >= target
        |GROUP BY q_pct ORDER BY q_pct""".stripMargin)),

    // L31 — KMV distinct-count sketch (Bar-Yossef et al. 2002): the
    // k smallest DISTINCT 60-bit md5 hashes per group in a bounded-state
    // custom Aggregator with true partial merge — approximate
    // COUNT(DISTINCT) without shuffling distinct values, and exactly
    // oracle-checkable because the hash is public md5 (an external
    // engine computes the IDENTICAL sketch; HLL internals are not
    // portable). est = (k−1)·2⁶⁰ / kth_min, one exact double division;
    // the exact distinct count rides along for calibration.
    Q("sketch_kmv_distinct",
      (s, dir) => {
        val k = 16
        val kmv = udaf(new graft.expr.KmvSketchAgg(k))
        val c = lit(15.0) * lit(1152921504606846976.0) // (k−1)·2⁶⁰ exact
        s.read.parquet(s"$dir/events.parquet")
          .select(col("event_type"), col("user_id"),
            conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
              .cast("long").as("hv"))
          .groupBy(col("event_type"))
          .agg(kmv(col("hv")).as("kmv"),
            countDistinct(col("user_id")).as("exact_distinct"))
          .select(col("event_type"), col("kmv.n_min").as("n_min"),
            col("kmv.kth_min").as("kth_min"),
            when(col("kmv.kth_min").isNull, col("kmv.n_min").cast("double"))
              .otherwise(c / col("kmv.kth_min").cast("double"))
              .as("est_distinct"),
            col("exact_distinct"))
          .orderBy(col("event_type"))
      },
      Some("""WITH h AS (SELECT DISTINCT event_type,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM events),
        |r AS (SELECT event_type, hv,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn FROM h),
        |a AS (SELECT event_type, COUNT(*) AS n_min,
        |    MAX(CASE WHEN rn = 16 THEN hv END) AS kth_min
        |  FROM r WHERE rn <= 16 GROUP BY event_type),
        |x AS (SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
        |  FROM events GROUP BY event_type)
        |SELECT a.event_type, a.n_min, a.kth_min,
        |  CASE WHEN a.kth_min IS NULL THEN CAST(a.n_min AS DOUBLE)
        |       ELSE (15.0 * 1152921504606846976.0) / CAST(a.kth_min AS DOUBLE)
        |  END AS est_distinct,
        |  x.exact_distinct
        |FROM a JOIN x ON x.event_type = a.event_type
        |ORDER BY a.event_type""".stripMargin)),

    // Curation — Gopher-style repetition metrics over word-2-grams:
    // duplicate-2-gram and top-2-gram fractions, the standard repetition
    // filters. One per-doc aggregation, ratios as single divisions of
    // exact integers.
    Q("c_repetition",
      (s, dir) => Curation.repetitionMetrics(
          Tables.documents(s, dir), "doc_id", "text", shingleN = 2)
        .orderBy(col("doc_id")),
      Some(s"""WITH $toksSqlCte,
        |tt AS (SELECT doc_id, unnest(toks) AS tok, unnest(range(len(toks))) AS i FROM d),
        |g0 AS (SELECT doc_id, tok || ' ' || lead(tok,1)
        |  OVER (PARTITION BY doc_id ORDER BY i) AS g FROM tt),
        |g AS (SELECT doc_id, g FROM g0 WHERE g IS NOT NULL),
        |c AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY doc_id, g),
        |m AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
        |  COUNT(*) AS n_distinct, CAST(MAX(c) AS BIGINT) AS top_count
        |  FROM c GROUP BY doc_id)
        |SELECT doc_id, n_grams, n_distinct, top_count,
        |  CAST(n_grams - n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_frac,
        |  CAST(top_count AS DOUBLE) / CAST(n_grams AS DOUBLE) AS top_frac
        |FROM m ORDER BY doc_id""".stripMargin)),

    // Curation — sequence packing (pack-then-split pretraining layout):
    // within each lang shard, docs in id order form one token stream cut
    // every 2048 tokens; one window cumsum per shard.
    Q("c_pack_sequences",
      (s, dir) => Curation.packSequences(
          docToks(s, dir).select(col("lang"), col("doc_id"),
            size(col("toks")).cast("long").as("n_tokens")),
          "lang", "doc_id", "n_tokens", seqLen = 2048L)
        .orderBy(col("lang"), col("seq_id")),
      Some(s"""WITH $toksSqlCte,
        |n AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS t FROM d),
        |o AS (SELECT doc_id, lang, t,
        |  COALESCE(CAST(SUM(t) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS off
        |  FROM n),
        |sq AS (SELECT lang, doc_id, t, off // 2048 AS seq_id FROM o)
        |SELECT lang, seq_id, COUNT(*) AS n_docs,
        |  CAST(SUM(t) AS BIGINT) AS sum_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM sq GROUP BY lang, seq_id ORDER BY lang, seq_id""".stripMargin)),

    // Curation — PII redaction (Curation.scrubPii). The synthetic corpus
    // carries no PII, so both engines append the SAME deterministic
    // doc_id-derived email/phone/IP suffixes before scrubbing — the scrub
    // logic (match, typed placeholder, ordered passes, per-category
    // counts) is what's under test, and the redacted text is compared
    // byte-for-byte. Patterns live in the RE2 ∩ java.util.regex subset.
    Q("c_pii_scrub",
      (s, dir) => {
        val aug = Tables.documents(s, dir).select(col("doc_id"), concat(
          col("text"),
          when(pmod(col("doc_id"), lit(3L)) === 0L, concat(
            lit(" contact u"), col("doc_id").cast("string"),
            lit("@ex"), pmod(col("doc_id"), lit(7L)).cast("string"),
            lit(".com"))).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5L)) === 0L, concat(
            lit(" call 555-"),
            lpad(pmod(col("doc_id"), lit(1000L)).cast("string"), 3, "0"),
            lit("-"),
            lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"))).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(7L)) === 0L, concat(
            lit(" from 10."), pmod(col("doc_id"), lit(256L)).cast("string"),
            lit(".0."), pmod(col("doc_id"), lit(250L)).cast("string"))).otherwise(lit(""))
        ).as("text"))
        Curation.scrubPii(aug, "doc_id", "text").orderBy(col("doc_id"))
      },
      Some("""WITH aug AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 3 = 0 THEN ' contact u' || CAST(doc_id AS VARCHAR)
        |    || '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.com' ELSE '' END ||
        |  CASE WHEN doc_id % 5 = 0 THEN ' call 555-'
        |    || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
        |  CASE WHEN doc_id % 7 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
        |    || '.0.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}[- ]\d{3}[- ]\d{4}\b', '<PHONE>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS clean,
        |  CAST(len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t,
        |    '\b\d{3}[- ]\d{3}[- ]\d{4}\b')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(strlen(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}[- ]\d{3}[- ]\d{4}\b', '<PHONE>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS BIGINT) AS clean_len
        |FROM aug ORDER BY doc_id""".stripMargin)),

    // Curation — corpus-level line dedup (Curation.dedupLines): keep the
    // globally first occurrence of each distinct 5-token line; nonzero
    // drops come from the corpus's planted near/exact-duplicate docs,
    // exactly the boilerplate case the pass exists for.
    Q("c_dedup_lines",
      (s, dir) => Curation.dedupLines(Tables.documents(s, dir),
          "doc_id", "text", lineLen = 5)
        .orderBy(col("doc_id")),
      Some(s"""WITH $toksSqlCte,
        |tt AS (SELECT doc_id, unnest(toks) AS tok, unnest(range(len(toks))) AS i FROM d),
        |ln AS (SELECT doc_id, i // 5 AS line_no,
        |  string_agg(tok, ' ' ORDER BY i) AS line, COUNT(*) AS n_toks
        |  FROM tt GROUP BY doc_id, i // 5),
        |k AS (SELECT doc_id, line_no, n_toks,
        |  row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn FROM ln)
        |SELECT doc_id, COUNT(*) AS n_lines,
        |  CAST(SUM(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
        |  CAST(SUM(CASE WHEN rn = 1 THEN n_toks ELSE 0 END) AS BIGINT) AS n_toks_kept
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // The production dedup CASCADE — exact canonical → MinHash+LSH text
    // near-dups → SRP-LSH embedding near-dups, each stage over the
    // previous stage's survivors (Dedup.cascadeSurvivors). The oracle
    // exploits that every drop rule is PAIRWISE (signatures/distances
    // depend only on the two docs), so candidate+verify pair tables can
    // be computed over the full corpus and filtered to survivors —
    // set restriction commutes with each stage.
    Q("dedup_cascade",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.cascadeSurvivors(
            docs,
            Tables.embeddings(s, dir)
              .select(col("vec_id").as("doc_id"), col("embedding")),
            "doc_id", fpPrefixLen = 200, shingleN = 3, bands = 8,
            minJaccard = 0.5, minCos = 0.45, dim = 64)
          .join(docs.select(col("doc_id"), col("lang")), "doc_id")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $shingleSqlCte,
        |fpt AS (SELECT doc_id, md5(substr(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), 1, 200)) AS fp
        |  FROM documents),
        |s1 AS (SELECT doc_id FROM (SELECT doc_id,
        |  row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM fpt) t WHERE rn = 1),
        |mh AS (SELECT doc_id, r.band AS band,
        |  MIN(('0x' || substr(md5(shingle) || md5(shingle), CAST(r.band*4+1 AS INTEGER), 15))::BIGINT) AS sig
        |  FROM sd, range(8) r(band) GROUP BY doc_id, r.band),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM mh x JOIN mh y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
        |co AS (SELECT t.a, t.b, COUNT(*) AS common FROM (
        |    SELECT c.a, c.b, x.shingle FROM cand c
        |    JOIN sd x ON x.doc_id = c.a
        |    JOIN sd y ON y.doc_id = c.b AND y.shingle = x.shingle) t
        |  GROUP BY t.a, t.b),
        |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sd GROUP BY doc_id),
        |jp AS (SELECT co.a, co.b FROM co
        |  JOIN n na ON na.doc_id = co.a JOIN n nb ON nb.doc_id = co.b
        |  WHERE CAST(co.common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - co.common AS DOUBLE) >= 0.5),
        |s2 AS (SELECT doc_id FROM s1 WHERE doc_id NOT IN (
        |  SELECT j.b FROM jp j JOIN s1 a1 ON a1.doc_id = j.a JOIN s1 b1 ON b1.doc_id = j.b)),
        |$quantSqlCte,
        |$srpSqlCte,
        |vp AS (SELECT c.a, c.b FROM scand c
        |  JOIN q qa ON qa.vec_id = c.a JOIN q qb ON qb.vec_id = c.b
        |  JOIN nm na ON na.vec_id = c.a JOIN nm nb ON nb.vec_id = c.b
        |  WHERE CAST(CAST(list_sum(list_transform(range(1,65), i -> qa.qv[i]*qb.qv[i])) AS BIGINT) AS DOUBLE)
        |    / (sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) >= 0.45),
        |s3 AS (SELECT doc_id FROM s2 WHERE doc_id NOT IN (
        |  SELECT v.b FROM vp v JOIN s2 a2 ON a2.doc_id = v.a JOIN s2 b2 ON b2.doc_id = v.b))
        |SELECT s3.doc_id AS doc_id, dd.lang AS lang
        |FROM s3 JOIN documents dd ON dd.doc_id = s3.doc_id
        |ORDER BY doc_id""".stripMargin)),

    // L-series — connected components over the MinHash near-dup pair
    // graph (alternating large-star/small-star, O(log² n) rounds): every
    // doc labeled with its component's minimum doc_id plus the cluster
    // size. The oracle computes min-reachable-id with a recursive CTE —
    // exactly the component minimum, since reachability over symmetric
    // edges enumerates the whole component.
    Q("dedup_components",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val cc = sessionCcLabels(s, dir)
        val lbl = docs.select(col("doc_id"))
          .join(cc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("component"))
        val sizes = lbl.groupBy(col("component"))
          .agg(count(lit(1)).as("cluster_size"))
        lbl.join(sizes, "component")
          .select(col("doc_id"), col("component"), col("cluster_size"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $nearDupCcSqlCtes,
        |sz AS (SELECT component, COUNT(*) AS cluster_size FROM lbl GROUP BY component)
        |SELECT l.doc_id, l.component, s.cluster_size
        |FROM lbl l JOIN sz s ON s.component = l.component
        |ORDER BY l.doc_id""".stripMargin)),

    // L116 — LABEL-PROPAGATION cluster refinement over the SAME
    // near-dup pair graph (the sessionMinhashPairs memo): where L19's
    // connected components transitively glue everything a chain
    // touches, LPA votes — majority neighbor label, ties to the
    // smallest, two synchronous iterations — the standard chain-breaker
    // between LSH candidates and canonical selection. Oracle reuses the
    // shared pair-graph CTEs up to `e` and unrolls both iterations.
    Q("dedup_lpa",
      (s, dir) => {
        val lpa = GraphOps.labelPropagation(
          sessionMinhashPairs(s, dir), "a", "b", iters = 2)
        val sizes = lpa.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size"))
        lpa.join(sizes, "lbl")
          .select(col("node").as("doc_id"), col("lbl").as("lpa_label"),
            col("cluster_size"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $nearDupCcSqlCtes,
        |l0 AS (SELECT DISTINCT u AS node FROM e),
        |c1 AS (SELECT e.u AS node, l.node AS lbl, COUNT(*) AS cnt
        |  FROM e JOIN l0 l ON l.node = e.v GROUP BY 1, 2),
        |l1 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number() OVER (
        |    PARTITION BY node ORDER BY cnt DESC, lbl) AS rn FROM c1) WHERE rn = 1),
        |c2 AS (SELECT e.u AS node, l.lbl AS lbl, COUNT(*) AS cnt
        |  FROM e JOIN l1 l ON l.node = e.v GROUP BY 1, 2),
        |l2 AS (SELECT node, lbl FROM (SELECT node, lbl, row_number() OVER (
        |    PARTITION BY node ORDER BY cnt DESC, lbl) AS rn FROM c2) WHERE rn = 1),
        |sz AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM l2 GROUP BY 1)
        |SELECT l2.node AS doc_id, l2.lbl AS lpa_label, sz.cluster_size
        |FROM l2 JOIN sz USING (lbl) ORDER BY doc_id""".stripMargin)),

    // L98 — BORDA RANK FUSION of three quality signals per language
    // (length, scaled type-token ratio, scaled avg word length):
    // scale-free blend = sum of within-group ranks, re-ranked; all
    // integers, deterministic ties by doc_id.
    Q("c_rank_fusion",
      (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val base = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("n_chars"), col("text"),
            size(array_distinct(toks)).cast("long").as("__dt"),
            greatest(size(toks).cast("long"), lit(1L)).as("__nt"))
          .select(col("doc_id"), col("lang"), col("n_chars"),
            expr("__dt * 1000000L div __nt").as("ttr_e6"),
            expr("cast(length(text) as bigint) * 1000L div __nt").as("awl_e3"))
        Curation.rankFusion(base, "lang", "doc_id",
            Seq("n_chars", "ttr_e6", "awl_e3"))
          .select(col("doc_id"), col("lang"), col("rank_n_chars"),
            col("rank_ttr_e6"), col("rank_awl_e3"), col("borda"),
            col("fused_rank"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $toksSqlCte,
        |sg AS (SELECT d.doc_id, d.lang, dd.n_chars,
        |    CAST(len(list_distinct(d.toks))::BIGINT * 1000000
        |      // greatest(len(d.toks), 1) AS BIGINT) AS ttr_e6,
        |    CAST(length(dd.text)::BIGINT * 1000
        |      // greatest(len(d.toks), 1) AS BIGINT) AS awl_e3
        |  FROM d JOIN documents dd USING (doc_id)),
        |r AS (SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank_n_chars,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY ttr_e6 DESC, doc_id) AS BIGINT) AS rank_ttr_e6,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY awl_e3 DESC, doc_id) AS BIGINT) AS rank_awl_e3
        |  FROM sg),
        |b AS (SELECT *, rank_n_chars + rank_ttr_e6 + rank_awl_e3 AS borda FROM r)
        |SELECT doc_id, lang, rank_n_chars, rank_ttr_e6, rank_awl_e3, borda,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY borda, doc_id) AS BIGINT) AS fused_rank
        |FROM b ORDER BY doc_id""".stripMargin)),

    // L107 — RECIPROCAL-RANK FUSION of the same three signals (the
    // SIGIR'09 standard complementing L98's Borda): contribution
    // ⌊1e9/(60+rank)⌋ per signal — top agreement dominates, the tail
    // flattens — summed in exact scaled integers, re-ranked desc.
    Q("c_rank_fusion_rrf",
      (s, dir) => {
        val toks = TextOps.tokens(col("text"))
        val base = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("n_chars"), col("text"),
            size(array_distinct(toks)).cast("long").as("__dt"),
            greatest(size(toks).cast("long"), lit(1L)).as("__nt"))
          .select(col("doc_id"), col("lang"), col("n_chars"),
            expr("__dt * 1000000L div __nt").as("ttr_e6"),
            expr("cast(length(text) as bigint) * 1000L div __nt").as("awl_e3"))
        Curation.rrfFusion(base, "lang", "doc_id",
            Seq("n_chars", "ttr_e6", "awl_e3"))
          .select(col("doc_id"), col("lang"), col("rank_n_chars"),
            col("rank_ttr_e6"), col("rank_awl_e3"), col("rrf_e9"),
            col("fused_rank"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $toksSqlCte,
        |sg AS (SELECT d.doc_id, d.lang, dd.n_chars,
        |    CAST(len(list_distinct(d.toks))::BIGINT * 1000000
        |      // greatest(len(d.toks), 1) AS BIGINT) AS ttr_e6,
        |    CAST(length(dd.text)::BIGINT * 1000
        |      // greatest(len(d.toks), 1) AS BIGINT) AS awl_e3
        |  FROM d JOIN documents dd USING (doc_id)),
        |r AS (SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank_n_chars,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY ttr_e6 DESC, doc_id) AS BIGINT) AS rank_ttr_e6,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY awl_e3 DESC, doc_id) AS BIGINT) AS rank_awl_e3
        |  FROM sg),
        |b AS (SELECT *, 1000000000 // (60 + rank_n_chars)
        |    + 1000000000 // (60 + rank_ttr_e6)
        |    + 1000000000 // (60 + rank_awl_e3) AS rrf_e9 FROM r)
        |SELECT doc_id, lang, rank_n_chars, rank_ttr_e6, rank_awl_e3,
        |  CAST(rrf_e9 AS BIGINT) AS rrf_e9,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY rrf_e9 DESC, doc_id) AS BIGINT) AS fused_rank
        |FROM b ORDER BY doc_id""".stripMargin)),

    // L103 — SKETCH-CALIBRATED QUALITY GATE: the documented 100 TB swap
    // for c_quality_calibrated made concrete — per-source thresholds
    // from the L45 log-histogram sketch (one partial-merge agg, no
    // per-source window) broadcast back as a MAP-SIDE gate, reported
    // side by side with the exact-rank keep count so the bucket-
    // resolution error is measured, not guessed.
    Q("c_quality_gate_sketch",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("n_chars").as("score"))
        val thr = Curation.logQuantiles(docs, "source", "score",
            Seq((70, 7L, 10L)))
          .select(col("source"), col("n"), col("bkt").as("thr_bkt"))
        val exact = Curation.calibratedQualityGate(
            docs, "doc_id", "source", "score", 3, 10)
          .groupBy(col("source"))
          .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("exact_kept"))
        val sk = docs.join(broadcast(thr), "source")
          .groupBy(col("source"))
          .agg(sum(when(
            graft.expr.LogHist.bucket(col("score")) > col("thr_bkt"), 1L)
            .otherwise(0L)).as("sketch_kept"))
        thr.join(exact, "source").join(sk, "source")
          .select(col("source"), col("n"), col("exact_kept"),
            col("thr_bkt").cast("long").as("thr_bkt"), col("sketch_kept"))
          .orderBy(col("source"))
      },
      Some("""WITH x AS (SELECT doc_id, source, n_chars AS score,
        |    greatest(n_chars, 1) AS v FROM documents),
        |b AS (SELECT doc_id, source, v,
        |    CAST(length(format('{:b}', v)) - 1 AS INTEGER) AS k FROM x),
        |bb AS (SELECT doc_id, source, CAST(k*8
        |    + ((v - (1::BIGINT << k))*8) // (1::BIGINT << k) AS BIGINT) AS bkt FROM b),
        |g AS (SELECT source, bkt, CAST(COUNT(*) AS BIGINT) AS cnt FROM bb GROUP BY 1, 2),
        |nn AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n FROM g GROUP BY 1),
        |c AS (SELECT source, bkt, CAST(SUM(cnt) OVER (PARTITION BY source
        |    ORDER BY bkt) AS BIGINT) AS cum FROM g),
        |thr AS (SELECT c.source, CAST(MIN(c.bkt) AS BIGINT) AS thr_bkt
        |  FROM c JOIN nn USING (source)
        |  WHERE c.cum >= (nn.n * 7 + 9) // 10 GROUP BY c.source),
        |ek AS (SELECT source, CAST(SUM(CASE WHEN rank * 10 <= 3 * n THEN 1 ELSE 0 END) AS BIGINT) AS exact_kept
        |  FROM (SELECT source,
        |      CAST(row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        |      CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |    FROM x) r GROUP BY source),
        |sk AS (SELECT bb.source, CAST(SUM(CASE WHEN bb.bkt > thr.thr_bkt THEN 1 ELSE 0 END) AS BIGINT) AS sketch_kept
        |  FROM bb JOIN thr USING (source) GROUP BY bb.source)
        |SELECT nn.source, nn.n, ek.exact_kept, thr.thr_bkt, sk.sketch_kept
        |FROM nn JOIN ek USING (source) JOIN thr USING (source) JOIN sk USING (source)
        |ORDER BY source""".stripMargin)),

    // L97 — PREFIX-FILTERING similarity join (PPJoin candidate rule):
    // shingles sorted by one global rarest-first order; a Jaccard ≥ 0.8
    // pair must collide inside each other's (n − ceil(0.8n) + 1)-token
    // prefix — recall 1 by theorem, candidates far tighter than
    // "shares any rare token"; exact verify restores precision. Same
    // output contract as dedup_ngram_jaccard (OpsSpec asserts result
    // equality with the uncapped Jaccard path).
    Q("dedup_ppjoin",
      (s, dir) => Dedup.prefixFilterPairs(
          sessionShingles(s, dir),
          "doc_id", tNum = 4, tDen = 5)
        .orderBy(col("a"), col("b")),
      Some(s"""WITH $shingleSqlCte,
        |f AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM sd GROUP BY shingle),
        |k AS (SELECT sd.doc_id, printf('%012d', f.df) || '|' || sd.shingle AS key
        |  FROM sd JOIN f USING (shingle)),
        |arr AS (SELECT doc_id, list_sort(list(key)) AS ks,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM k GROUP BY doc_id),
        |pre AS (SELECT doc_id, unnest(ks[1 : CAST(n - (4*n + 4)//5 + 1 AS INTEGER)]) AS key
        |  FROM arr),
        |cand AS (SELECT DISTINCT pa.doc_id AS a, pb.doc_id AS b
        |  FROM pre pa JOIN pre pb ON pa.key = pb.key AND pa.doc_id < pb.doc_id),
        |co AS (SELECT t.a, t.b, COUNT(*) AS common FROM (
        |    SELECT c.a, c.b, x.shingle FROM cand c
        |    JOIN sd x ON x.doc_id = c.a
        |    JOIN sd y ON y.doc_id = c.b AND y.shingle = x.shingle) t
        |  GROUP BY t.a, t.b),
        |n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sd GROUP BY doc_id)
        |SELECT co.a, co.b, CAST(co.common AS BIGINT) AS common,
        |  CAST(co.common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - co.common AS DOUBLE) AS jaccard
        |FROM co JOIN n na ON na.doc_id = co.a JOIN n nb ON nb.doc_id = co.b
        |WHERE CAST(co.common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - co.common AS DOUBLE) >= 0.8
        |ORDER BY a, b""".stripMargin)),

    // L100 — CROSS-SOURCE DUPLICATION FLOW: which sources copy which —
    // for every near-dup component spanning ≥2 sources, count the
    // (source, source) pairs it links; a hot (A, B) cell means A
    // scrapes/mirrors B and one of them should be down-weighted before
    // training. Per-component distinct source lists are tiny, so the
    // pair explosion is |sources-per-component|² — bounded — and the
    // rollup is one hash agg on the (sa, sb) cell.
    Q("dedup_source_flow",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val cc = sessionCcLabels(s, dir)
        val cs = docs.select(col("doc_id"), col("source")).join(cc, "doc_id")
          .select(col("component"), col("source")).distinct()
        cs.as("x").join(cs.as("y"), Seq("component"))
          .filter(col("x.source") < col("y.source"))
          .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
          .agg(countDistinct(col("component")).as("n_components"))
          .orderBy(col("src_a"), col("src_b"))
      },
      Some(s"""WITH RECURSIVE $nearDupCcSqlCtes,
        |multi AS (SELECT component FROM lbl GROUP BY component HAVING COUNT(*) > 1),
        |cs AS (SELECT DISTINCT l.component, d.source
        |  FROM lbl l JOIN multi m ON m.component = l.component
        |  JOIN documents d ON d.doc_id = l.doc_id)
        |SELECT x.source AS src_a, y.source AS src_b,
        |  CAST(COUNT(DISTINCT x.component) AS BIGINT) AS n_components
        |FROM cs x JOIN cs y ON x.component = y.component AND x.source < y.source
        |GROUP BY x.source, y.source ORDER BY src_a, src_b""".stripMargin)),

    // L99 — BEST-QUALITY CANONICAL per near-dup component: production
    // dedup keeps the best COPY, not the smallest id — per component,
    // canonical = argmax quality (tie: min doc_id) via one window over
    // the component partition; is_kept marks survivors. Composes L-CC
    // labels with the quality signal.
    Q("dedup_canonical_best",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val cc = sessionCcLabels(s, dir)
        val lbl = docs.select(col("doc_id"), col("n_chars"))
          .join(cc, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_chars"),
            coalesce(col("component"), col("doc_id")).as("component"))
        // argmax by order-insensitive struct-min (a windowed first() over
        // an unordered partition would be row-order-dependent)
        val cano = lbl.groupBy(col("component"))
          .agg(min(struct((lit(0L) - col("n_chars")).as("nq"),
            col("doc_id").as("id"))).as("m"))
          .select(col("component"), col("m.id").as("canonical"))
        lbl.join(cano, "component")
          .select(col("doc_id"), col("component"), col("n_chars"),
            col("canonical"), (col("doc_id") === col("canonical")).as("is_kept"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $nearDupCcSqlCtes,
        |lq AS (SELECT l.doc_id, l.component, d.n_chars
        |  FROM lbl l JOIN documents d USING (doc_id)),
        |cn AS (SELECT component, doc_id AS canonical FROM (
        |    SELECT component, doc_id, row_number() OVER (
        |      PARTITION BY component ORDER BY n_chars DESC, doc_id) AS rn
        |    FROM lq) t WHERE rn = 1)
        |SELECT lq.doc_id, lq.component, lq.n_chars, cn.canonical,
        |  lq.doc_id = cn.canonical AS is_kept
        |FROM lq JOIN cn USING (component) ORDER BY lq.doc_id""".stripMargin)),

    // L96 — PER-SOURCE QUALITY DRIFT: lower-median n_chars per (source,
    // ingest decile), then the per-source OLS slope with the division
    // cleared — (n·Σxy − ΣxΣy)/(n·Σx² − (Σx)²) — integers end to end,
    // the one division last. Ingest decile = (doc_id·10) div (max+1)
    // (ids are assigned on ingest; the corpus has no crawl timestamp).
    Q("c_quality_drift",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val mx = docs.agg(max(col("doc_id")).as("__mx"))
        Curation.qualityDrift(
            docs.crossJoin(broadcast(mx))
              .select(col("source"),
                expr("(doc_id * 10) div (__mx + 1)").as("wk"),
                col("n_chars")),
            "source", "wk", "n_chars")
          .orderBy(col("source"))
      },
      Some("""WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
        |b AS (SELECT source, (doc_id * 10) // (mx.m + 1) AS wk, n_chars
        |  FROM documents, mx),
        |r AS (SELECT source, wk, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source, wk ORDER BY n_chars) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY source, wk) AS BIGINT) AS n FROM b),
        |md AS (SELECT source, wk AS x, n_chars AS y FROM r WHERE rn = (n + 1) // 2),
        |ag AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |    SUM(x::HUGEINT) AS sx, SUM(y::HUGEINT) AS sy,
        |    SUM(x::HUGEINT * y::HUGEINT) AS sxy,
        |    SUM(x::HUGEINT * x::HUGEINT) AS sxx FROM md GROUP BY source)
        |SELECT source, n_buckets,
        |  CAST(n_buckets::HUGEINT * sxy - sx * sy AS BIGINT) AS slope_num,
        |  CAST(n_buckets::HUGEINT * sxx - sx * sx AS BIGINT) AS slope_den,
        |  CASE WHEN n_buckets::HUGEINT * sxx - sx * sx = 0 THEN NULL
        |    ELSE CAST(n_buckets::HUGEINT * sxy - sx * sy AS DOUBLE)
        |      / CAST(n_buckets::HUGEINT * sxx - sx * sx AS DOUBLE) END AS slope
        |FROM ag ORDER BY source""".stripMargin)),

    // L95 — INCREMENTAL connected components: the previous run's labels
    // are a star edge set (member—center, center = component min), so
    // folding a day's new pairs into them via CC over [stars ∪ delta]
    // reproduces full-history CC labels at O(|labels| + |delta|) cost —
    // the oracle runs the full-graph recursive-CTE CC and must agree on
    // every doc. "Old" = pairs among doc_id % 4 != 1 (the seen corpus),
    // "new" = pairs touching a % 4 == 1 doc.
    Q("dedup_components_incr",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = sessionMinhashPairs(s, dir)
          .select(col("a"), col("b"))
        val isNew = (c: org.apache.spark.sql.Column) =>
          pmod(c, lit(4L)) === 1L
        val oldLbl = Dedup.connectedComponents(
          pairs.where(not(isNew(col("a"))) && not(isNew(col("b")))), "a", "b")
        val merged = Dedup.incrementalComponents(
          oldLbl.withColumnRenamed("id", "doc_id"),
          pairs.where(isNew(col("a")) || isNew(col("b"))), "doc_id")
        docs.select(col("doc_id"))
          .join(merged.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("component"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $nearDupCcSqlCtes
        |SELECT doc_id, component FROM lbl ORDER BY doc_id""".stripMargin)),

    // L-series — INCREMENTAL dedup: the batch-arrival shape. Docs with
    // doc_id % 4 == 1 are the "new" batch; the rest are the seen corpus
    // whose signatures stand in for a persisted index. New signatures
    // probe seen ∪ new — seen–seen pairs are never generated, so the
    // per-batch cost is O(|new| · collisions) regardless of corpus size.
    // The oracle computes full-corpus signatures and applies the same
    // probe-side restriction.
    Q("dedup_incremental",
      (s, dir) => {
        val sd = sessionShingles(s, dir)
        Dedup.incrementalNearDups(
            sd.where(col("doc_id") % 4 =!= 1), sd.where(col("doc_id") % 4 === 1),
            "doc_id", 8, 0.5)
          .orderBy(col("new_id"), col("match_id"))
      },
      Some(s"""WITH $shingleSqlCte,
        |mh AS (SELECT doc_id, r.band AS band,
        |  MIN(('0x' || substr(md5(shingle) || md5(shingle), CAST(r.band*4+1 AS INTEGER), 15))::BIGINT) AS sig
        |  FROM sd, range(8) r(band) GROUP BY doc_id, r.band),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
        |  CASE WHEN y.doc_id % 4 = 1 THEN 'new' ELSE 'seen' END AS m_side
        |  FROM mh x JOIN mh y ON x.band = y.band AND x.sig = y.sig
        |  WHERE x.doc_id % 4 = 1
        |    AND ((y.doc_id % 4 != 1 AND x.doc_id != y.doc_id)
        |      OR (y.doc_id % 4 = 1 AND x.doc_id < y.doc_id))),
        |co AS (SELECT t.a, t.b, COUNT(*) AS common FROM (
        |    SELECT c.a, c.b, x.shingle FROM cand c
        |    JOIN sd x ON x.doc_id = c.a
        |    JOIN sd y ON y.doc_id = c.b AND y.shingle = x.shingle) t
        |  GROUP BY t.a, t.b),
        |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sd GROUP BY doc_id),
        |j AS (SELECT co.a, co.b, co.common,
        |  CAST(co.common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - co.common AS DOUBLE) AS jaccard
        |  FROM co JOIN n na ON na.doc_id = co.a JOIN n nb ON nb.doc_id = co.b)
        |SELECT j.a AS new_id, j.b AS match_id, c2.m_side AS match_side, j.common, j.jaccard
        |FROM j JOIN cand c2 ON c2.a = j.a AND c2.b = j.b
        |WHERE j.jaccard >= 0.5 ORDER BY new_id, match_id""".stripMargin)),

    // L40 / §2.10 — STREAMING Count-Min sketch: the token stream arrives
    // as four staged files consumed one per micro-batch
    // (maxFilesPerTrigger=1), and the CMS grid accumulates in streaming
    // aggregation state across batches (complete mode, AvailableNow).
    // Because the sketch's merge is element-wise sum — associative,
    // commutative, order-independent — the final streamed grid is
    // BIT-IDENTICAL to the batch grid no matter how the files split the
    // stream, which is what lets the batch SQL oracle check a streaming
    // sketch exactly. The estimates table then reads the one-row grid
    // exactly like the batch flavor (sketch_cms_topk).
    // L142 — STREAMING IVF INGEST: the index-maintenance path — a
    // vector feed assigned to its nearest coarse cell AT INGEST,
    // statelessly: the 16 seed vectors (tiny by construction) are
    // collected once and folded into a literal array, so per arrival
    // the argmax over seeds is one pure expression (strict > keeps the
    // earlier seed on ties ≡ the batch row_number tie rule), and the
    // only state is the complete-mode per-cell count. The oracle is
    // the batch cell-occupancy profile — streamed ingest must land
    // every vector in the same cell the batch assignment does.
    Q("streaming_ivf_ingest",
      (s, dir) => withStreamingPartitions(s) {
        val base = Tables.embeddings(s, dir)
        val seeds = sessionQuantEmb(s, dir).filter(col("vec_id") < 16)
          .select(col("vec_id"), col("qv")).collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
        // Batch-equality precondition, enforced loudly: a zero-norm seed
        // scores NaN, which the batch row_number (NaN sorts greatest)
        // would select but the strict-> fold below never would. Fail here
        // rather than silently diverge from the claimed batch contract.
        require(seeds.forall { case (_, v) => v.exists(_ != 0L) },
          "zero-norm IVF seed vector: streamed argmax would diverge from batch")
        val seedArr = array(seeds.map { case (id, v) =>
          struct(lit(id).as("sid"), array(v.map(lit(_)): _*).as("sv"),
            lit(math.sqrt(v.map(x => x.toDouble * x).sum)).as("snorm"))
        }: _*)
        val name = "ivfin_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ivfin").toString
        val srcDir = stagedStreamSource("emb_r2", dir)(p =>
          base.repartition(2).write.mode("overwrite").parquet(p.toString))
        val counts = s.readStream.schema(base.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
          .select(col("vec_id"),
            transform(col("embedding"),
              x => round(x.cast("double") * 10000d).cast("long")).as("qv"))
          .withColumn("best", aggregate(seedArr,
            struct(lit(-1L).as("sid"), lit(Double.NegativeInfinity).as("sc")),
            (acc, sd) => {
              val dot = aggregate(
                zip_with(col("qv"), sd("sv"), (a, b) => a * b),
                lit(0L), (x, y) => x + y)
              val sc = dot.cast("double") / sd("snorm")
              when(sc > acc("sc"),
                struct(sd("sid").as("sid"), sc.as("sc"))).otherwise(acc)
            }))
          .select(col("best.sid").as("cell"))
          .groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
        val q = counts.writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt))
        s.table(name).select(col("cell"), col("n_vecs")).orderBy(col("cell"))
      },
      Some(s"""WITH $quantSqlCte,
        |seeds AS (SELECT vec_id AS seed_id, qv AS sv,
        |  sqrt(CAST(CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS DOUBLE)) AS snorm
        |  FROM q WHERE vec_id < 16),
        |scored AS (SELECT q.vec_id, s.seed_id,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*s.sv[i])) AS BIGINT) AS DOUBLE)
        |    / s.snorm AS score
        |  FROM q CROSS JOIN seeds s),
        |cells AS (SELECT vec_id, seed_id AS cell FROM (
        |  SELECT vec_id, seed_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY score DESC, seed_id) AS rn FROM scored) t WHERE rn = 1)
        |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM cells
        |GROUP BY cell ORDER BY cell""".stripMargin)),

    // L143 — STREAMING SEMANTIC DECONTAMINATION: the L126 scan at
    // ingest time — every arriving corpus vector is checked against
    // the benchmark/eval probe set THE MOMENT IT LANDS (quarantine
    // before it ever enters the training pool). Stateless append mode:
    // the arrival's cell comes from the same literal-seed fold as
    // streaming_ivf_ingest, the per-cell PROBE table (tiny by
    // construction) is a stream-static broadcast equi join on the cell
    // id, and the exact quantized cosine gates emission. The oracle is
    // the batch candidate+verify chain (pre-argmax) — streamed flags
    // must equal the batch scan pair-for-pair, dot-for-dot.
    Q("streaming_semantic_decon",
      (s, dir) => withStreamingPartitions(s) {
        val base = Tables.embeddings(s, dir)
        val seeds = sessionQuantEmb(s, dir).filter(col("vec_id") < 16)
          .select(col("vec_id"), col("qv")).collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
        // Batch-equality precondition, enforced loudly: a zero-norm seed
        // scores NaN, which the batch row_number (NaN sorts greatest)
        // would select but the strict-> fold below never would. Fail here
        // rather than silently diverge from the claimed batch contract.
        require(seeds.forall { case (_, v) => v.exists(_ != 0L) },
          "zero-norm IVF seed vector: streamed argmax would diverge from batch")
        val seedArr = array(seeds.map { case (id, v) =>
          struct(lit(id).as("sid"), array(v.map(lit(_)): _*).as("sv"),
            lit(math.sqrt(v.map(x => x.toDouble * x).sum)).as("snorm"))
        }: _*)
        val probes = sessionIvfCells(s, dir)
          .filter(pmod(col("vec_id"), lit(37L)) === 0L)
          .join(sessionQuantEmb(s, dir), "vec_id")
          .select(col("cell"), col("vec_id").as("b"), col("qv").as("pqv"),
            aggregate(col("qv"), lit(0L), (a, x) => a + x * x).as("pnn"))
        val name = "sdec_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_sdec").toString
        val srcDir = stagedStreamSource("emb_r2", dir)(p =>
          base.repartition(2).write.mode("overwrite").parquet(p.toString))
        val hits = s.readStream.schema(base.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
          .filter(pmod(col("vec_id"), lit(37L)) =!= 0L)
          .select(col("vec_id").as("a"),
            transform(col("embedding"),
              x => round(x.cast("double") * 10000d).cast("long")).as("qv"))
          .withColumn("nn", aggregate(col("qv"), lit(0L), (a, x) => a + x * x))
          .withColumn("best", aggregate(seedArr,
            struct(lit(-1L).as("sid"), lit(Double.NegativeInfinity).as("sc")),
            (acc, sd) => {
              val dot = aggregate(
                zip_with(col("qv"), sd("sv"), (x, y) => x * y),
                lit(0L), (x, y) => x + y)
              val sc = dot.cast("double") / sd("snorm")
              when(sc > acc("sc"),
                struct(sd("sid").as("sid"), sc.as("sc"))).otherwise(acc)
            }))
          .withColumn("cell", col("best.sid"))
          .join(broadcast(probes), Seq("cell"))
          .withColumn("dot", aggregate(
            zip_with(col("qv"), col("pqv"), (x, y) => x * y),
            lit(0L), (x, y) => x + y))
          .withColumn("cos", col("dot").cast("double") /
            (sqrt(col("nn").cast("double")) * sqrt(col("pnn").cast("double"))))
          .filter(col("cos") >= 0.30)
          .select(col("a"), col("b"), col("dot"), col("cos"))
        val q = hits.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt))
        s.table(name).orderBy(col("a"), col("b"))
      },
      Some(s"""WITH $quantSqlCte,
        |seeds AS (SELECT vec_id AS seed_id, qv AS sv,
        |  sqrt(CAST(CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS DOUBLE)) AS snorm
        |  FROM q WHERE vec_id < 16),
        |scored AS (SELECT q.vec_id, s.seed_id,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*s.sv[i])) AS BIGINT) AS DOUBLE)
        |    / s.snorm AS score
        |  FROM q CROSS JOIN seeds s),
        |cells AS (SELECT vec_id, seed_id AS cell FROM (
        |  SELECT vec_id, seed_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY score DESC, seed_id) AS rn FROM scored) t WHERE rn = 1),
        |cand AS (SELECT c.vec_id AS a, p.vec_id AS b FROM cells c
        |  JOIN cells p ON p.cell = c.cell AND p.vec_id % 37 = 0
        |  WHERE c.vec_id % 37 <> 0),
        |vd AS (SELECT c.a, c.b,
        |  CAST(list_sum(list_transform(range(1,65), i -> qa.qv[i]*qb.qv[i])) AS BIGINT) AS dot
        |  FROM cand c JOIN q qa ON qa.vec_id = c.a JOIN q qb ON qb.vec_id = c.b)
        |SELECT a, b, dot,
        |  CAST(dot AS DOUBLE)/(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |FROM vd JOIN nm na ON na.vec_id = a JOIN nm nb ON nb.vec_id = b
        |WHERE CAST(dot AS DOUBLE)/(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) >= 0.30
        |ORDER BY a, b""".stripMargin)),

    Q("streaming_sketch",
      (s, dir) => withStreamingPartitions(s) {
        import graft.expr.{CmsSketch, CmsSketchAgg}
        val d = 3; val w = 256
        val cms = udaf(new CmsSketchAgg(d, w))
        val base = Tables.documents(s, dir)
        val name = "sk_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_cms").toString
        val srcDir = stagedStreamSource("docs_r2", dir)(p =>
          base.repartition(2).write.mode("overwrite").parquet(p.toString))
        val grid = s.readStream.schema(base.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
          .select(explode(TextOps.tokens(col("text"))).as("tok"))
          .select(CmsSketch.cells(col("tok"), d, w).as("cs"))
          .groupBy()
          .agg(cms(col("cs")).as("grid"))
        val q = grid.writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt)) // srcDir is shared, JVM-exit cleaned
        val g = s.table(name).select(col("grid"))
        base.select(explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("exact_count"))
          .orderBy(col("exact_count").desc, col("tok")).limit(15)
          .crossJoin(broadcast(g))
          .select(col("tok"), col("exact_count"),
            CmsSketch.estimate(col("grid"), CmsSketch.cells(col("tok"), d, w))
              .as("cms_est"))
          .orderBy(col("exact_count").desc, col("tok"))
      },
      Some(s"""WITH $toksSqlCte,
        |t AS (SELECT unnest(toks) AS tok FROM d),
        |cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_count FROM t GROUP BY tok),
        |cells AS (SELECT r.r AS r,
        |    ('0x' || substr(md5(tok), 1 + r.r*8, 8))::BIGINT % 256 AS p,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM t, range(3) r(r) GROUP BY 1, 2),
        |top AS (SELECT tok, exact_count FROM cnt
        |  ORDER BY exact_count DESC, tok LIMIT 15)
        |SELECT top.tok AS tok, top.exact_count AS exact_count, MIN(c.c) AS cms_est
        |FROM top JOIN cells c
        |  ON c.p = ('0x' || substr(md5(top.tok), 1 + c.r*8, 8))::BIGINT % 256
        |GROUP BY 1, 2
        |ORDER BY exact_count DESC, tok""".stripMargin)),

    // §2.10 — the curation rollup as a STREAMING query: readStream over
    // the documents parquet, the stateless quality gate, a streaming
    // per-lang aggregation run to completion with Trigger.AvailableNow
    // into a memory sink. One batch pass = the batch rollup exactly, so
    // the batch SQL is a true oracle for the streaming trace.
    Q("streaming_curation",
      (s, dir) => withStreamingPartitions(s) {
        val path = s"$dir/documents.parquet"
        val schema = s.read.parquet(path).schema
        val name = "sc_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_cur").toString
        // the file stream source consumes a DIRECTORY (the shape files
        // land in on a real feed); the oracle table is a single parquet
        // file, so stage it into a temp dir (hardlink, copy fallback)
        val srcDir = stagedStreamSource("docs_link", dir)(p =>
          linkInto(p, path, "documents.parquet"))
        val gated = s.readStream.schema(schema).parquet(srcDir)
          .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("lang"),
            size(col("toks")).cast("long").as("n_tokens"),
            TextOps.stopwordHits(col("toks"), TextOps.langMarkers.head._2).as("stop_hits"))
          .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
          .filter(col("n_tokens") >= 50 && col("stop_ratio") >= 0.02)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"),
            min(col("doc_id")).as("first_doc"))
        val q = gated.writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt)) // srcDir is shared, JVM-exit cleaned
        s.table(name).orderBy(col("lang"))
      },
      Some(s"""WITH $toksSqlCte,
        |sc AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in'], t))) AS BIGINT) AS DOUBLE)
        |    / CAST(len(toks) AS BIGINT) AS stop_ratio
        |  FROM d)
        |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  MIN(doc_id) AS first_doc
        |FROM sc WHERE n_tokens >= 50 AND stop_ratio >= 0.02
        |GROUP BY lang ORDER BY lang""".stripMargin)),

    // L50 — the BOTTOM-K SAMPLE AS A STREAMING AGGREGATE: TopKAgg
    // accumulating in streaming aggregation state across
    // maxFilesPerTrigger=1 micro-batches (complete mode, AvailableNow).
    // Bottom-k-by-hash is a lattice (the union's bottom-k is the
    // bottom-k of the parts' bottom-ks — associative, commutative,
    // idempotent), so the streamed sample is BIT-IDENTICAL to the batch
    // sample no matter how files split the stream, and the batch SQL is
    // an exact oracle for a streaming sample: every bounded-state
    // sketch in the engine (CMS, KMV, Bloom, top-k, log-hist) is
    // stream-mergeable by the same argument, demonstrated here and in
    // streaming_sketch.
    Q("streaming_bottomk",
      (s, dir) => withStreamingPartitions(s) {
        val base = Tables.documents(s, dir)
        val name = "bk_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_bk").toString
        val srcDir = stagedStreamSource("docs_r2", dir)(p =>
          base.repartition(2).write.mode("overwrite").parquet(p.toString))
        val topk = udaf(new graft.expr.TopKAgg(10))
        val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long")
        val agg = s.readStream.schema(base.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
          .select(col("lang"), col("doc_id"), h.as("__h"))
          .groupBy(col("lang"))
          .agg(topk(-col("__h"), col("doc_id")).as("tk"))
        val q = agg.writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt)) // srcDir is shared, JVM-exit cleaned
        s.table(name)
          .select(col("lang"), posexplode(col("tk")))
          .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
            col("col.id").as("doc_id"), (-col("col.value")).as("h"))
          .orderBy(col("lang"), col("rank"))
      },
      Some("""WITH h AS (SELECT lang, doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents),
        |r AS (SELECT lang, doc_id, h,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY h, doc_id) AS BIGINT) AS rank FROM h)
        |SELECT lang, rank, doc_id, h FROM r WHERE rank <= 10
        |ORDER BY lang, rank""".stripMargin)),

    // L51 — CORPUS SNAPSHOT DIFF (the incremental-ingest delta): two
    // snapshots derived deterministically from the corpus (old misses
    // the docs "added" later and carries pre-edit text for the
    // "changed" ones; new misses the "removed" ones — mirrored verbatim
    // in the oracle), then one full-outer join on doc_id comparing md5
    // content fingerprints — the wide text never crosses the shuffle.
    Q("c_snapshot_diff",
      (s, dir) => {
        val base = Tables.documents(s, dir)
        val oldSnap = base.filter(pmod(col("doc_id"), lit(17L)) =!= 3L)
          .withColumn("text",
            when(pmod(col("doc_id"), lit(13L)) === 5L,
              concat(col("text"), lit("#v1"))).otherwise(col("text")))
        val newSnap = base.filter(pmod(col("doc_id"), lit(19L)) =!= 7L)
        Curation.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
          .filter(col("status") =!= "unchanged")
          .orderBy(col("doc_id"))
      },
      Some("""WITH o AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 13 = 5 THEN text || '#v1' ELSE text END) AS ho
        |  FROM documents WHERE doc_id % 17 <> 3),
        |n AS (SELECT doc_id, md5(text) AS hn FROM documents WHERE doc_id % 19 <> 7),
        |j AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |         WHEN n.doc_id IS NULL THEN 'removed'
        |         WHEN o.ho = n.hn THEN 'unchanged'
        |         ELSE 'changed' END AS status
        |  FROM o FULL OUTER JOIN n ON n.doc_id = o.doc_id)
        |SELECT doc_id, status FROM j WHERE status <> 'unchanged'
        |ORDER BY doc_id""".stripMargin)),

    // L52 — DISTRIBUTED BPE TOKENIZER INDUCTION (Sennrich et al. 2016):
    // the first 4 merge rules learned over the corpus. The only
    // corpus-scale pass is the word-frequency agg; each round counts
    // adjacent symbol pairs over the compact distinct-word table, picks
    // the deterministic argmax (the scalar merge rule — the
    // broadcast-decision pattern of production tokenizer training), and
    // applies it as a greedy left-to-right `replace` on delimited
    // symbol strings, which both engines execute with identical
    // semantics — a 4-round training LOOP checked exactly.
    Q("t_bpe_merges",
      (s, dir) => sessionBpe(s, dir)._1,
      Some(bpeOracleSql(4))),

    // L114 — BPE tokenizer APPLICATION (the missing half of L52):
    // train the same 4 rules, then tokenize the corpus with them and
    // emit the realized vocabulary histogram. Zero extra corpus passes:
    // training's final working table IS the encoded distinct-word
    // table, so encode = split + frequency-weighted count.
    Q("t_bpe_encode",
      (s, dir) => TextOps.bpeHistogram(sessionBpe(s, dir)._2),
      Some(bpeEncodeOracleSql(4))),

    // L124 — TOKENIZER FERTILITY BY LANGUAGE: tokens-per-word and
    // chars-per-token of the session-trained vocabulary split by lang
    // — the multilingual fairness audit. One tokenize pass + an equi
    // join against the Heaps-small distinct-word table; ratios as
    // scaled integer divisions.
    Q("t_bpe_fertility",
      (s, dir) => TextOps.bpeFertility(
        Tables.documents(s, dir), "text", "lang", sessionBpe(s, dir)._2),
      Some(bpeChainSql(4) + s""",
wt AS (SELECT w, CAST(len(string_split(substr(repr, 2, length(repr) - 2), '||')) AS BIGINT) AS n_sym FROM w4),
dw AS (SELECT lang, unnest(toks) AS w FROM d),
ag AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
    CAST(SUM(length(dw.w)) AS BIGINT) AS n_chars,
    CAST(SUM(wt.n_sym) AS BIGINT) AS n_bpe_tokens
  FROM dw JOIN wt ON wt.w = dw.w GROUP BY lang)
SELECT lang, n_words, n_chars, n_bpe_tokens,
  (1000 * n_bpe_tokens) // n_words AS fertility_milli,
  (1000 * n_chars) // n_bpe_tokens AS cpt_milli
FROM ag ORDER BY lang""")),

    // L115 — LINK-GRAPH PAGERANK (integer fixed-point, 2 damped
    // iterations — GraphOps.pageRank scaladoc for the exact floor-
    // division semantics): the link-centrality quality weight of
    // web-corpus curation, run here over a corpus-sized derived graph
    // so |V| = |events|: each event links to the user's next event
    // (browse chains) and to the earliest event of its type (type
    // hubs). Floor division + long sums = bit-exact cross-engine; the
    // hub join broadcasts (|event_type| rows), the rank loop shuffles
    // only the O(|V|) rank table per iteration against the cached edge
    // table.
    Q("g_pagerank",
      (s, dir) => {
        val ev = evPoints(s, dir)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tus"), col("event_id"))
        val chain = ev.withColumn("nxt", lead(col("event_id"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .select(col("event_id").as("src"), col("nxt").as("dst"))
        val hubs = ev.groupBy(col("event_type"))
          .agg(min(col("event_id")).as("hub"))
        val hubEdges = ev.join(broadcast(hubs), "event_type")
          .filter(col("event_id") =!= col("hub"))
          .select(col("event_id").as("src"), col("hub").as("dst"))
        GraphOps.pageRank(chain.unionByName(hubEdges), "src", "dst", iters = 2)
          .orderBy(col("node"))
      },
      Some(s"""WITH $eventGraphSqlCte,
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nd),
        |c1 AS (SELECT ed.dst AS node, SUM(r.pr // od.odeg) AS s
        |  FROM ed JOIN od USING (src) JOIN r0 r ON r.node = ed.src GROUP BY 1),
        |r1 AS (SELECT nd.node, CAST(150000 + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS pr
        |  FROM nd LEFT JOIN c1 USING (node)),
        |c2 AS (SELECT ed.dst AS node, SUM(r.pr // od.odeg) AS s
        |  FROM ed JOIN od USING (src) JOIN r1 r ON r.node = ed.src GROUP BY 1),
        |r2 AS (SELECT nd.node, CAST(150000 + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS pr
        |  FROM nd LEFT JOIN c2 USING (node))
        |SELECT node, pr FROM r2 ORDER BY node""".stripMargin)),

    // L117 — PERSONALIZED PAGERANK seed expansion (Haveliwala 2002):
    // rank nodes by random-walk proximity to a trusted seed set (the
    // type-hub events here) — the "expand a hand-audited allowlist"
    // curation move. Teleport mass lands only on seeds; same integer
    // fixed point, same per-iteration join shape as g_pagerank.
    Q("g_ppr",
      (s, dir) => {
        val ev = evPoints(s, dir)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tus"), col("event_id"))
        val chain = ev.withColumn("nxt", lead(col("event_id"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .select(col("event_id").as("src"), col("nxt").as("dst"))
        val hubs = ev.groupBy(col("event_type"))
          .agg(min(col("event_id")).as("hub"))
        val hubEdges = ev.join(broadcast(hubs), "event_type")
          .filter(col("event_id") =!= col("hub"))
          .select(col("event_id").as("src"), col("hub").as("dst"))
        GraphOps.personalizedPageRank(chain.unionByName(hubEdges),
            "src", "dst", hubs, "hub", iters = 2)
          .filter(col("ppr") > 0L)
          .orderBy(col("node"))
      },
      Some(s"""WITH $eventGraphSqlCte,
        |sd AS (SELECT DISTINCT hub AS node FROM hb),
        |ns AS (SELECT nd.node, CASE WHEN sd.node IS NULL THEN 0 ELSE 1 END AS seed
        |  FROM nd LEFT JOIN sd ON sd.node = nd.node),
        |r0 AS (SELECT node, CAST(CASE WHEN seed = 1 THEN 1000000 ELSE 0 END AS BIGINT) AS pr FROM ns),
        |c1 AS (SELECT ed.dst AS node, SUM(r.pr // od.odeg) AS s
        |  FROM ed JOIN od USING (src) JOIN r0 r ON r.node = ed.src GROUP BY 1),
        |r1 AS (SELECT ns.node, CAST(CASE WHEN ns.seed = 1 THEN 150000 ELSE 0 END
        |    + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS pr
        |  FROM ns LEFT JOIN c1 USING (node)),
        |c2 AS (SELECT ed.dst AS node, SUM(r.pr // od.odeg) AS s
        |  FROM ed JOIN od USING (src) JOIN r1 r ON r.node = ed.src GROUP BY 1),
        |r2 AS (SELECT ns.node, CAST(CASE WHEN ns.seed = 1 THEN 150000 ELSE 0 END
        |    + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS ppr
        |  FROM ns LEFT JOIN c2 USING (node))
        |SELECT node, ppr FROM r2 WHERE ppr > 0 ORDER BY node""".stripMargin)),

    // L53 — deterministic SHARD ASSIGNMENT + training order: shard =
    // 60-bit md5 prefix mod 8, within-shard position by the same hash —
    // a reproducible global shuffle that decomposes into independent
    // per-shard sorts (one writer task per shard at 100 TB, no global
    // sort, no cross-shard coordination).
    Q("c_shard_assign",
      (s, dir) => Curation.shardAssign(Tables.documents(s, dir), "doc_id", 8),
      Some("""WITH h AS (SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents)
        |SELECT doc_id, h, h % 8 AS shard,
        |  CAST(row_number() OVER (PARTITION BY h % 8
        |    ORDER BY h, doc_id) AS BIGINT) AS pos
        |FROM h ORDER BY shard, pos""".stripMargin)),

    // L54 — CO-OCCURRENCE / PMI association mining: unordered token
    // pairs within a ±2 offset, ranked by the log-free PMI surrogate
    // lift = c_ab·N / (c_a·c_b) — numerator and denominator exact
    // integer products, the lift ONE division. Pair generation is
    // array-local shifted-slice zips (no positional self-join, nothing
    // shuffles before the counting aggregations).
    Q("t_cooccur_pmi",
      (s, dir) => TextOps.cooccurrencePmi(
        Tables.documents(s, dir), "text", window = 2, minPairCount = 5L, k = 20),
      Some(s"""WITH $toksSqlCte,
        |pr AS (SELECT unnest(ps) AS p FROM (
        |  SELECT list_filter(list_transform(toks, (x, i) -> CASE WHEN i + 1 <= len(toks)
        |      THEN [least(x, toks[i + 1]), greatest(x, toks[i + 1])] END), y -> y IS NOT NULL)
        |    || list_filter(list_transform(toks, (x, i) -> CASE WHEN i + 2 <= len(toks)
        |      THEN [least(x, toks[i + 2]), greatest(x, toks[i + 2])] END), y -> y IS NOT NULL) AS ps
        |  FROM d)),
        |pc AS (SELECT p[1] AS a, p[2] AS b, CAST(COUNT(*) AS BIGINT) AS c_ab
        |  FROM pr GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |u AS (SELECT unnest(toks) AS tok FROM d),
        |uc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM u GROUP BY 1),
        |nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM uc),
        |sc AS (SELECT pc.a, pc.b, pc.c_ab, ua.c AS c_a, ub.c AS c_b,
        |    pc.c_ab * nt.n_total AS num, ua.c * ub.c AS den,
        |    CAST(pc.c_ab * nt.n_total AS DOUBLE) / CAST(ua.c * ub.c AS DOUBLE) AS lift
        |  FROM pc JOIN uc ua ON ua.tok = pc.a JOIN uc ub ON ub.tok = pc.b, nt),
        |r AS (SELECT CAST(row_number() OVER (ORDER BY lift DESC, a, b) AS BIGINT) AS rank, *
        |  FROM sc)
        |SELECT rank, a, b, c_ab, c_a, c_b, num, den, lift FROM r
        |WHERE rank <= 20 ORDER BY rank""".stripMargin)),

    // §2.10 — STREAMING session windows over the event feed: Spark's
    // native session_window with a 0s watermark in append mode, run to
    // completion with AvailableNow. Append mode only emits sessions the
    // watermark has passed, so the stage dir carries a far-future
    // HEARTBEAT row per user (the standard production trick for closing
    // sessions at end-of-feed); the final no-data micro-batch flushes
    // every real session, while the heartbeat sessions stay unemitted in
    // state. Session merge is half-open ([t, t+gap)), so the batch
    // oracle breaks on diff >= gap — deliberately different from
    // w1_sessionize's diff > gap reference semantics.
    Q("streaming_sessions",
      (s, dir) => withStreamingPartitions(s) {
        val path = s"$dir/events.parquet"
        val base = s.read.parquet(path)
        val schema = base.schema
        val gapUs = 4L * 3600L * 1000000L
        val name = "ss_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ses").toString
        // events link + per-user heartbeat file (one row per user, +10
        // days past the global max event time, synthesized in the
        // file's own ts type, nulls elsewhere). Staged once per
        // session: the sentinel content is a deterministic function of
        // the input file, so warm-up and timed bench passes share it.
        val srcDir = stagedStreamSource("sessrc", dir) { p =>
          linkInto(p, path, "events.parquet")
          val maxUs = base.select(Tables.tsUs(base).as("us"))
            .agg(max(col("us"))).head.getLong(0)
          val tsType = schema("ts").dataType
          val sentinel = base.select(col("user_id")).distinct()
            .select(schema.fields.toSeq.map { f => f.name match {
              case "user_id" => col("user_id")
              case "ts" =>
                Tables.usToTs(lit(maxUs + 864000L * 1000000L), tsType).as("ts")
              case other => lit(null).cast(f.dataType).as(other)
            }}: _*)
          writeHeartbeat(sentinel, p)
        }
        val raw = s.readStream.schema(schema).parquet(srcDir)
        val sessions = raw
          .select(col("user_id"), Tables.tsUs(raw).as("tus"),
            round(col("value") * 100d).cast("long").as("cents"))
          .withColumn("etime", timestamp_micros(col("tus")))
          .withWatermark("etime", "0 seconds")
          .groupBy(col("user_id"), session_window(col("etime"), "4 hours"))
          .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
        val q = sessions.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt)) // srcDir shared, JVM-exit cleaned
        s.table(name).select(col("user_id"),
            unix_micros(col("session_window.start")).as("start_us"),
            (unix_micros(col("session_window.end")) - gapUs).as("end_us"),
            col("n_events"), col("sum_cents"))
          .orderBy(col("user_id"), col("start_us"))
      },
      Some(s"""WITH $evPointsSqlCte,
        |f AS (SELECT user_id, event_id, tus, cents,
        |  CASE WHEN lag(tus) OVER w IS NULL
        |         OR tus - lag(tus) OVER w >= 14400000000
        |       THEN 1 ELSE 0 END AS newflag
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s AS (SELECT user_id, tus, cents,
        |  CAST(SUM(newflag) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM f)
        |SELECT user_id, MIN(tus) AS start_us, MAX(tus) AS end_us,
        |  COUNT(*) AS n_events, CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM s GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin)),

    // L30 — STREAMING event-time as-of join run to completion: the
    // eventTimeAsof state operator over the same click/purchase split as
    // j9_asof_join, oracled by DuckDB's native ASOF LEFT JOIN. Event
    // MICROS ride in the watermark clock's millis field
    // (timestamp_millis(tus)) so as-of comparisons keep full
    // microsecond precision end to end. One far-future right row on a
    // sentinel key advances the global watermark past every real event;
    // the trailing timeout micro-batch then flushes every pending left
    // (event-time timeouts wake each group without new data on it).
    Q("streaming_asof",
      (s, dir) => withStreamingPartitions(s) {
        import s.implicits._
        val path = s"$dir/events.parquet"
        val base = s.read.parquet(path)
        val schema = base.schema
        val name = "sa_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_asof").toString
        val srcDir = eventsWithPurchaseHeartbeat(s, dir, path, base, schema)
        val rawStream = s.readStream.schema(schema).parquet(srcDir)
        val in = rawStream
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("user_id").cast("string").as("k"),
            timestamp_millis(Tables.tsUs(rawStream)).as("ts"),
            (col("event_type") === "purchase").as("isRight"),
            col("event_id").cast("long").as("tie"),
            coalesce(round(col("value") * 100d).cast("long"), lit(0L)).as("payload"))
          .as[graft.streaming.TemporalEnrich.TimedEnrichInput]
        val out = graft.streaming.TemporalEnrich.eventTimeAsof(in, "0 seconds")
        val q = out.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt)) // srcDir shared, JVM-exit cleaned
        s.table(name)
          .select(col("k").cast("long").as("user_id"), col("tie").as("event_id"),
            col("ts").as("tus"), col("asofTs").as("prev_tus"),
            col("asofPayload").as("prev_cents"),
            (col("ts") - col("asofTs")).as("lag_us"))
          .orderBy(col("user_id"), col("tus"), col("event_id"))
      },
      Some(s"""WITH $evPointsSqlCte,
        |l AS (SELECT user_id, event_id, tus FROM e WHERE event_type = 'click'),
        |r0 AS (SELECT user_id, event_id, tus, cents FROM e WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, tus, cents FROM (SELECT user_id, tus, cents,
        |  row_number() OVER (PARTITION BY user_id, tus ORDER BY event_id DESC) AS rn
        |  FROM r0) t WHERE rn = 1)
        |SELECT l.user_id, l.event_id, l.tus, r.tus AS prev_tus,
        |  r.cents AS prev_cents, l.tus - r.tus AS lag_us
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.tus >= r.tus
        |ORDER BY l.user_id, l.tus, l.event_id""".stripMargin)),

    // L28 — STREAMING latest-state temporal enrich (the PROCESSING-TIME
    // temporal join, Flink's temporal table function) run to completion:
    // latestStateEnrich over the same click/purchase split as
    // streaming_asof, but with constant per-key state (one latest right
    // row) and no watermark machinery. With the whole input in ONE
    // AvailableNow micro-batch (single source file, no
    // maxFilesPerTrigger cap) the kernel's in-batch (ts, right-first,
    // tie) sort makes latest-known-state EXACTLY the event-time as-of,
    // so the batch ASOF LEFT JOIN oracles it; the across-batch
    // latest-state refinement is pinned separately in StreamingSpec.
    Q("streaming_temporal_enrich",
      (s, dir) => withStreamingPartitions(s) {
        import s.implicits._
        val path = s"$dir/events.parquet"
        val base = s.read.parquet(path)
        val schema = base.schema
        val name = "ste_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_enrich").toString
        val srcDir = stagedStreamSource("enrichsrc", dir) { p =>
          linkInto(p, path, "events.parquet")
        }
        val rawStream = s.readStream.schema(schema).parquet(srcDir)
        val in = rawStream
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("user_id").cast("string").as("k"),
            Tables.tsUs(rawStream).as("ts"),
            (col("event_type") === "purchase").as("isRight"),
            col("event_id").cast("long").as("tie"),
            coalesce(round(col("value") * 100d).cast("long"), lit(0L)).as("payload"))
          .as[graft.streaming.EnrichInput]
        val out = graft.streaming.TemporalEnrich.latestStateEnrich(in)
        val q = out.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt)) // srcDir shared, JVM-exit cleaned
        s.table(name)
          .select(col("k").cast("long").as("user_id"), col("tie").as("event_id"),
            col("ts").as("tus"), col("asofTs").as("prev_tus"),
            col("asofPayload").as("prev_cents"))
          .orderBy(col("user_id"), col("tus"), col("event_id"))
      },
      Some(s"""WITH $evPointsSqlCte,
        |l AS (SELECT user_id, event_id, tus FROM e WHERE event_type = 'click'),
        |r0 AS (SELECT user_id, event_id, tus, cents FROM e WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, tus, cents FROM (SELECT user_id, tus, cents,
        |  row_number() OVER (PARTITION BY user_id, tus ORDER BY event_id DESC) AS rn
        |  FROM r0) t WHERE rn = 1)
        |SELECT l.user_id, l.event_id, l.tus, r.tus AS prev_tus, r.cents AS prev_cents
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.tus >= r.tus
        |ORDER BY l.user_id, l.tus, l.event_id""".stripMargin)),

    // §2.10 ∘ L88 — STREAMING MULTI-TOUCH LINEAR ATTRIBUTION: the
    // event-time flatMapGroupsWithState twin of e_attribution. Views
    // and purchases flow as one keyed stream (exact µs embedded in the
    // watermark clock); a conversion's credits finalize only when the
    // watermark passes it, touches leave state once no future window
    // can reach them. Run to completion (shared purchase heartbeat +
    // trailing timeout batch) the per-touch rollup equals the batch
    // operator bit-for-bit — e_attribution's SQL is the oracle
    // verbatim.
    Q("streaming_attribution",
      (s, dir) => withStreamingPartitions(s) {
        import s.implicits._
        val path = s"$dir/events.parquet"
        val base = s.read.parquet(path)
        val schema = base.schema
        val name = "sal_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_attr").toString
        val srcDir = eventsWithPurchaseHeartbeat(s, dir, path, base, schema)
        val rawStream = s.readStream.schema(schema).parquet(srcDir)
        val in = rawStream
          .filter(col("event_type").isin("view", "purchase"))
          .select(col("user_id").cast("string").as("k"),
            timestamp_millis(Tables.tsUs(rawStream)).as("ts"),
            (col("event_type") === "purchase").as("isConv"),
            col("event_id").cast("long").as("tie"),
            coalesce(round(col("value") * 100d).cast("long"), lit(0L)).as("cents"))
          .as[graft.streaming.TemporalEnrich.AttrInput]
        val credits = graft.streaming.TemporalEnrich.eventTimeAttribution(
          in, "0 seconds", window = 86400000000L)
        val q = credits.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt)) // srcDir shared, JVM-exit cleaned
        s.table(name).filter(col("k") =!= "-1")
          .groupBy(col("touchId").as("touch_id"),
            col("k").cast("long").as("user_id"))
          .agg(countDistinct(col("convId")).as("n_convs"),
            sum(col("credit")).as("attributed_cents"))
          .orderBy(col("touch_id"))
      },
      Some(s"""WITH $evPointsSqlCte,
        |v AS (SELECT user_id, event_id AS touch_id, tus FROM e WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS conv_id, tus, cents FROM e WHERE event_type = 'purchase'),
        |tp AS (SELECT p.user_id, p.conv_id, p.cents, v.touch_id, v.tus AS t_tus
        |  FROM p JOIN v ON v.user_id = p.user_id
        |    AND v.tus <= p.tus AND v.tus > p.tus - 86400000000),
        |rk AS (SELECT user_id, conv_id, cents, touch_id,
        |    CAST(row_number() OVER (PARTITION BY conv_id ORDER BY t_tus, touch_id) AS BIGINT) AS rk,
        |    CAST(COUNT(*) OVER (PARTITION BY conv_id) AS BIGINT) AS k FROM tp),
        |cr AS (SELECT user_id, conv_id, touch_id,
        |    cents // k + CASE WHEN rk <= cents % k THEN 1 ELSE 0 END AS credit FROM rk)
        |SELECT touch_id, user_id, CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
        |  CAST(SUM(credit) AS BIGINT) AS attributed_cents
        |FROM cr GROUP BY touch_id, user_id ORDER BY touch_id""".stripMargin)),

    // §2.10 + L1 — STREAMING exact dedup, AGGREGATION flavor: the
    // stateful fingerprint aggregation (state = one entry per distinct
    // (lang, fp)) run to completion with AvailableNow, then a batch
    // rollup of the memory sink — per-lang distinct fingerprints, doc
    // totals, and surplus dup copies. Survivor-independent outputs, so
    // the batch SQL is an exact oracle regardless of micro-batch
    // arrival order. (L82's `streaming_dedup` is the dropDuplicates
    // operator flavor — same semantics, different state operator.)
    Q("streaming_dedup_agg",
      (s, dir) => withStreamingPartitions(s) {
        val path = s"$dir/documents.parquet"
        val schema = s.read.parquet(path).schema
        val name = "sdp_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_dd").toString
        val srcDir = stagedStreamSource("docs_link", dir)(p =>
          linkInto(p, path, "documents.parquet"))
        val agg = s.readStream.schema(schema).parquet(srcDir)
          .select(col("lang"), TextOps.fingerprint(col("text"), 200).as("fp"))
          .groupBy(col("lang"), col("fp"))
          .agg(count(lit(1)).as("n_copies"))
        val q = agg.writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt)) // srcDir is shared, JVM-exit cleaned
        s.table(name).groupBy(col("lang"))
          .agg(count(lit(1)).as("n_unique"),
            sum(col("n_copies")).as("n_docs"),
            sum(when(col("n_copies") > 1, col("n_copies") - 1).otherwise(0L))
              .as("n_dup_copies"))
          .orderBy(col("lang"))
      },
      Some("""WITH f AS (SELECT lang,
        |  md5(substr(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 200)) AS fp,
        |  COUNT(*) AS n_copies
        |  FROM documents GROUP BY lang, fp)
        |SELECT lang, COUNT(*) AS n_unique, CAST(SUM(n_copies) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN n_copies > 1 THEN n_copies - 1 ELSE 0 END) AS BIGINT) AS n_dup_copies
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin))
  ) ++ kernelRegistry

  private def kernelRegistry: Seq[Q] = Seq(

    // W2 — speaker-change sessionization, uncapped window flavor
    // (speaker_rematch.py:25-43): break on gap OR event_type change.
    Q("w2_change_sessions",
      (s, dir) => SegmentOps.sessionizeByChange(
          evPoints(s, dir), "user_id", "tus", "event_id", "event_type",
          lit(12L * HOUR_US))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("event_type")).as("etype"),
          min(col("tus")).as("start_us"), max(col("tus")).as("end_us"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("session_id")),
      Some(s"""WITH $evPointsSqlCte,
        |f AS (SELECT user_id, event_id, event_type, tus,
        |  CASE WHEN lag(tus) OVER w IS NULL
        |         OR tus - lag(tus) OVER w > 43200000000
        |         OR event_type <> lag(event_type) OVER w
        |       THEN 1 ELSE 0 END AS newflag
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s AS (SELECT user_id, event_type, tus,
        |  CAST(SUM(newflag) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, MIN(event_type) AS etype,
        |  MIN(tus) AS start_us, MAX(tus) AS end_us, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin)),

    // A7 — dominant-speaker branch rules (host_rematch.py:46-96): rank
    // types by total, compare top against 3×-second / 2×-rest in the
    // exact integer domain.
    Q("a7_dominance",
      (s, dir) => {
        val totals = evPoints(s, dir)
          .groupBy(col("user_id"), col("event_type"))
          .agg(sum(col("cents")).as("total"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("total").desc, col("event_type"))
        totals.withColumn("rn", row_number().over(w))
          .groupBy(col("user_id"))
          .agg(
            max(when(col("rn") === 1, col("event_type"))).as("top_type"),
            max(when(col("rn") === 1, col("total"))).as("top_cents"),
            coalesce(max(when(col("rn") === 2, col("total"))), lit(0L)).as("second_cents"),
            sum(col("total")).as("all_cents"),
            count(lit(1)).as("n_types"))
          .withColumn("verdict",
            when(col("n_types") === 1, "solo")
              .when(col("top_cents") >= lit(3L) * col("second_cents"), "dominant")
              .when(col("top_cents") >= lit(2L) * (col("all_cents") - col("top_cents")), "semi")
              .otherwise("none"))
          .select(col("user_id"), col("top_type"), col("top_cents"),
            col("n_types"), col("verdict"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH $evPointsSqlCte,
        |t AS (SELECT user_id, event_type, CAST(SUM(cents) AS BIGINT) AS total
        |  FROM e GROUP BY user_id, event_type),
        |r AS (SELECT user_id, event_type, total,
        |  row_number() OVER (PARTITION BY user_id ORDER BY total DESC, event_type) AS rn FROM t),
        |g AS (SELECT user_id,
        |  MAX(CASE WHEN rn = 1 THEN event_type END) AS top_type,
        |  MAX(CASE WHEN rn = 1 THEN total END) AS top_cents,
        |  COALESCE(MAX(CASE WHEN rn = 2 THEN total END), 0) AS second_cents,
        |  CAST(SUM(total) AS BIGINT) AS all_cents,
        |  COUNT(*) AS n_types
        |  FROM r GROUP BY user_id)
        |SELECT user_id, top_type, top_cents, n_types,
        |  CASE WHEN n_types = 1 THEN 'solo'
        |       WHEN top_cents >= 3 * second_cents THEN 'dominant'
        |       WHEN top_cents >= 2 * (all_cents - top_cents) THEN 'semi'
        |       ELSE 'none' END AS verdict
        |FROM g ORDER BY user_id""".stripMargin)),

    // Multimodal — mapPartitions decode plumbing with a deterministic
    // stub kernel whose integer outputs the oracle mirrors exactly.
    Q("mm_decode_stub",
      (s, dir) => Multimodal.decodeStub(
          Multimodal.asBinary(Tables.documents(s, dir), "doc_id", "text"))
        .toDF()
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  strlen(text) AS bytes,
        |  ((strlen(text) * 31 + 7) % 104729) % 640 AS width,
        |  ((strlen(text) * 31 + 7) % 104729) % 480 AS height,
        |  strlen(text) // 100 + 1 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Multimodal — frame-sample + aspect-fit resize over the stub-decoded
    // metadata: every 3rd frame, fitted to a 224×224 box in exact 1e-4
    // integer scale units. The codec kernels stay stubs; the relational
    // shape (explode per frame, dimension arithmetic) is real.
    Q("mm_frame_resize",
      (s, dir) => Multimodal.resizeStub(
          Multimodal.frameSample(
            Multimodal.decodeStub(
              Multimodal.asBinary(Tables.documents(s, dir), "doc_id", "text")),
            everyN = 3L),
          targetW = 224L, targetH = 224L)
        .select(col("doc_id"), col("kind"), col("frame"),
          col("scale_e4"), col("out_w"), col("out_h"))
        .orderBy(col("doc_id"), col("frame")),
      Some("""WITH m AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  ((strlen(text) * 31 + 7) % 104729) % 640 AS width,
        |  ((strlen(text) * 31 + 7) % 104729) % 480 AS height,
        |  strlen(text) // 100 + 1 AS n_frames
        |  FROM documents),
        |fr AS (SELECT doc_id, kind, width, height,
        |  unnest(range(0, (n_frames - 1) // 3 + 1)) * 3 AS frame FROM m),
        |rs AS (SELECT doc_id, kind, frame,
        |  least(2240000 // greatest(width, 1), 2240000 // greatest(height, 1)) AS scale_e4,
        |  greatest(width, 1) AS w1, greatest(height, 1) AS h1
        |  FROM fr)
        |SELECT doc_id, kind, frame, CAST(scale_e4 AS BIGINT) AS scale_e4,
        |  CAST((w1 * scale_e4) // 10000 AS BIGINT) AS out_w,
        |  CAST((h1 * scale_e4) // 10000 AS BIGINT) AS out_h
        |FROM rs ORDER BY doc_id, frame""".stripMargin)),

    // Multimodal — IMAGE NEAR-DUP by perceptual dHash: 8×9 grayscale
    // grids (deterministic stub decode — the codec seam is the stub,
    // the HASH and the dedup join are real), 64 brightness comparisons
    // packed into four 16-bit bands, pigeonhole (band, value)
    // bucket-join candidates (recall 1 for Hamming ≤ 3), exact
    // popcount verify at ≤ 2. Families (doc_id % 37) share a base
    // grid; a per-doc single-cell perturbation flips at most two
    // comparison bits — exactly the resize/re-encode robustness dHash
    // exists for. The oracle recomputes hashes closed-form and checks
    // ALL pairs exhaustively: candidate recall is part of what's
    // verified.
    Q("mm_dhash_neardup",
      (s, dir) => {
        // quadratic-in-position grids spread band values across
        // families (a linear formula made most bands collide into
        // corpus-sized LSH buckets — measured 62 s at sf0.1 vs ~1 s
        // here); bounded slice doc_id < 2000 caps the pair output
        val grid = expr("transform(sequence(0, 71), i -> CAST(" +
          "((doc_id % 37 + 1) * (i * i + 7 * i + 13)) % 256 + " +
          "IF(i = doc_id % 72, 200 * ((doc_id div 37) % 2), 0) AS INT))")
        val base = Tables.documents(s, dir)
          .filter(col("doc_id") < 2000)
          .select(col("doc_id"), grid.as("g"))
        val hashed = base
          .select(col("doc_id"), Multimodal.dHashBands(base, "g").as("bands"))
        Multimodal.dhashNearDupPairs(hashed, "doc_id", "bands", maxDist = 2)
          .orderBy(col("a"), col("b"))
      },
      Some("""WITH g AS (SELECT doc_id, list_transform(range(0, 72), i ->
        |    ((doc_id % 37 + 1) * (i * i + 7 * i + 13)) % 256 +
        |    CASE WHEN i = doc_id % 72 THEN 200 * ((doc_id // 37) % 2) ELSE 0 END) AS grid
        |  FROM documents WHERE doc_id < 2000),
        |h AS (SELECT doc_id, list_transform(range(0, 4), b ->
        |    list_sum(list_transform(range(0, 16), t ->
        |      CASE WHEN grid[CAST(((b * 16 + t) // 8) * 9 + ((b * 16 + t) % 8) + 1 AS INTEGER)]
        |             > grid[CAST(((b * 16 + t) // 8) * 9 + ((b * 16 + t) % 8) + 2 AS INTEGER)]
        |      THEN (1 << t) ELSE 0 END))) AS bands FROM g),
        |p AS (SELECT x.doc_id AS a, y.doc_id AS b,
        |    CAST(list_sum(list_transform(range(1, 5), k ->
        |      bit_count(xor(CAST(x.bands[CAST(k AS INTEGER)] AS BIGINT),
        |                    CAST(y.bands[CAST(k AS INTEGER)] AS BIGINT))))) AS BIGINT) AS dist
        |  FROM h x JOIN h y ON x.doc_id < y.doc_id)
        |SELECT a, b, dist FROM p WHERE dist <= 2 ORDER BY a, b""".stripMargin)),

    // L112 — AUDIO FINGERPRINTING (energy-contour grams): waveform
    // near-dup via exact-integer frame energies → rising-edge contour
    // bits (invariant under positive amplitude scaling) → 16-bit grams
    // → gram-bucketed Jaccard. 40 synthesized families of 3 variants
    // (identity / sparse additive noise / 51/50 integer regain); the
    // oracle replays the identical integer arithmetic (per-family sample
    // stride keeps families genuinely distinct) — quantize,
    // energies, contour, grams, pair Jaccard — in SQL. Bounded slice
    // (event_id < 120); the production path is the same gram-bucketed
    // equi join with the maxGramDf stop-gram cap.
    // L119 — SHOT-BOUNDARY DETECTION + keyframe selection: synthetic
    // per-frame perceptual hashes (slow in-shot wiggle = 1 parity bit,
    // shot transitions = 8-16 bit jumps every 8 frames, video salt in
    // the high bits cancels under xor), real lag/cumsum/agg pipeline —
    // one shuffle on the video id, shots collapse map-side.
    Q("mm_shot_keyframes",
      (s, dir) => {
        val frames = Tables.documents(s, dir).filter(col("doc_id") < 500)
          .select(col("doc_id"),
            explode(expr("sequence(0L, 23L + doc_id % 17)")).as("frame"))
          .withColumn("fhash", expr(
            """(doc_id % 256) * 4294967296L + CASE ((frame div 8) % 4)
               WHEN 0 THEN 0L WHEN 1 THEN 4080L WHEN 2 THEN 65280L
               ELSE 16711680L END + (frame % 2)"""))
        Multimodal.shotSegments(frames, "doc_id", "frame", "fhash", maxDist = 3)
          .orderBy(col("doc_id"), col("shot_id"))
      },
      Some(shotOracleSql)),

    // L122 — STREAMING SHOT DETECTION: the same frames through the
    // per-video flatMapGroupsWithState kernel (O(1) state per video =
    // the one open shot), closed by an all-ones sentinel frame whose
    // hash is Hamming-far from every bounded real hash — run to
    // completion the output IS the batch twin, so both queries share
    // one oracle.
    Q("streaming_shots",
      (s, dir) => withStreamingPartitions(s) {
        import s.implicits._
        val name = "shots_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_shots").toString
        val srcDir = stagedStreamSource("shotsrc", dir) { p =>
          val frames = Tables.documents(s, dir).filter(col("doc_id") < 500)
            .select(col("doc_id"),
              explode(expr("sequence(0L, 23L + doc_id % 17)")).as("frame"))
            .withColumn("fhash", expr(
              """(doc_id % 256) * 4294967296L + CASE ((frame div 8) % 4)
                 WHEN 0 THEN 0L WHEN 1 THEN 4080L WHEN 2 THEN 65280L
                 ELSE 16711680L END + (frame % 2)"""))
            .select(col("doc_id").as("vid"), col("frame"), col("fhash"))
          writeHeartbeat(frames, p, "aa_frames.parquet")
          writeHeartbeat(frames.select(col("vid")).distinct()
            .select(col("vid"), lit(10000000L).as("frame"), lit(-1L).as("fhash")), p)
        }
        val schema = org.apache.spark.sql.Encoders.product[
          graft.streaming.StreamingOps.FrameEvent].schema
        val raw = s.readStream.schema(schema).parquet(srcDir)
          .as[graft.streaming.StreamingOps.FrameEvent]
        val q = graft.streaming.StreamingOps.streamingShots(raw, maxDist = 3)
          .writeStream.format("memory").queryName(name).outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt))
        s.table(name).select(col("vid").as("doc_id"), col("shot_id"),
            col("key_frame"), col("n_frames"))
          .orderBy(col("doc_id"), col("shot_id"))
      },
      Some(shotOracleSql)),

    // L120 — VIDEO NEAR-DUP by shot-keyframe hash sets: family copies
    // share all shots but one (a high-bit perturbation in one shot per
    // copy), so canonical↔copy Jaccard = 3/5 ≥ 0.5 while copy↔copy =
    // 1/3 and cross-family = 0 — the pair stage is the generic L112
    // set-Jaccard bucket join over (video, keyframe-hash) grams.
    Q("mm_video_neardup",
      (s, dir) => {
        val frames = Tables.documents(s, dir).filter(col("doc_id") < 500)
          .select(col("doc_id"), explode(expr("sequence(0L, 39L)")).as("frame"))
          .withColumn("fhash", expr(
            """(doc_id div 4) * 33554432L + CASE ((frame div 8) % 4)
               WHEN 0 THEN 0L WHEN 1 THEN 4080L WHEN 2 THEN 65280L
               ELSE 16711680L END +
               IF(doc_id % 4 > 0 AND (frame div 8) = (doc_id % 4), 8388608L, 0L) +
               frame % 2"""))
        val kh = Multimodal.videoKeyHashes(frames, "doc_id", "frame", "fhash",
          maxDist = 3)
        Multimodal.audioNearDupPairs(kh, "doc_id", minJaccard = 0.5)
          .orderBy(col("a"), col("b"))
      },
      Some("""WITH f AS (SELECT doc_id, unnest(range(0, 40)) AS frame
        |  FROM documents WHERE doc_id < 500),
        |h AS (SELECT doc_id, frame,
        |  (doc_id // 4) * 33554432 + CASE ((frame // 8) % 4)
        |    WHEN 0 THEN 0 WHEN 1 THEN 4080 WHEN 2 THEN 65280
        |    ELSE 16711680 END
        |  + CASE WHEN doc_id % 4 > 0 AND (frame // 8) = (doc_id % 4)
        |      THEN 8388608 ELSE 0 END
        |  + frame % 2 AS fhash FROM f),
        |c AS (SELECT doc_id, fhash, CASE WHEN lag(fhash) OVER w IS NULL THEN 1
        |    WHEN bit_count(xor(lag(fhash) OVER w, fhash)) > 3 THEN 1 ELSE 0 END AS cut
        |  FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY frame)),
        |kh AS (SELECT DISTINCT doc_id, fhash AS gram FROM c WHERE cut = 1),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM kh GROUP BY 1),
        |p AS (SELECT x.doc_id AS a, y.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS n_shared
        |  FROM kh x JOIN kh y ON x.gram = y.gram AND x.doc_id < y.doc_id GROUP BY 1, 2)
        |SELECT p.a, p.b, p.n_shared,
        |  CAST(p.n_shared AS DOUBLE) / CAST(sa.n + sb.n - p.n_shared AS DOUBLE) AS jaccard
        |FROM p JOIN sz sa ON sa.doc_id = p.a JOIN sz sb ON sb.doc_id = p.b
        |WHERE CAST(p.n_shared AS DOUBLE) / CAST(sa.n + sb.n - p.n_shared AS DOUBLE) >= 0.5
        |ORDER BY a, b""".stripMargin)),

    Q("mm_audio_fingerprint",
      (s, dir) => {
        val ids = Tables.events(s, dir)
          .select(col("event_id").cast("long").as("id"))
          .filter(col("id") < 120).distinct()
        val waves = ids.withColumn("wave", expr(
          """transform(sequence(0, 6399), j -> CAST(CAST(
            |CASE WHEN id % 3 = 0 THEN ((id div 3) * 31 + j * (13 + 2 * ((id div 3) % 23))) % 201 * 20
            |     WHEN id % 3 = 1 THEN ((id div 3) * 31 + j * (13 + 2 * ((id div 3) % 23))) % 201 * 20 + IF(j % 33 = 0, 40, 0)
            |     ELSE ((id div 3) * 31 + j * (13 + 2 * ((id div 3) % 23))) % 201 * 20 * 51 div 50 END
            |AS DOUBLE) / 32767D AS FLOAT))""".stripMargin))
        val grams = Multimodal.audioContourGrams(waves, "id", "wave",
          frame = 64, k = 16)
        Multimodal.audioNearDupPairs(grams, "id", 0.5)
          .orderBy(col("a"), col("b"))
      },
      Some("""WITH ids AS (SELECT DISTINCT CAST(event_id AS BIGINT) AS id
        |  FROM events WHERE event_id < 120),
        |w AS (SELECT id, list_transform(range(0, 6400), j ->
        |    CASE WHEN id % 3 = 0 THEN ((id // 3) * 31 + j * (13 + 2 * ((id // 3) % 23))) % 201 * 20
        |         WHEN id % 3 = 1 THEN ((id // 3) * 31 + j * (13 + 2 * ((id // 3) % 23))) % 201 * 20
        |           + CASE WHEN j % 33 = 0 THEN 40 ELSE 0 END
        |         ELSE ((id // 3) * 31 + j * (13 + 2 * ((id // 3) % 23))) % 201 * 20 * 51 // 50 END) AS iw
        |  FROM ids),
        |en AS (SELECT id, list_transform(range(0, 100), f ->
        |    list_sum(list_transform(range(0, 64), t ->
        |      iw[CAST(f * 64 + t + 1 AS INTEGER)] * iw[CAST(f * 64 + t + 1 AS INTEGER)]))) AS e
        |  FROM w),
        |bt AS (SELECT id, list_transform(range(0, 99), i ->
        |    CASE WHEN e[CAST(i + 2 AS INTEGER)] > e[CAST(i + 1 AS INTEGER)]
        |    THEN 1 ELSE 0 END) AS b FROM en),
        |gp AS (SELECT id, unnest(range(0, 84)) AS i, b FROM bt),
        |g AS (SELECT DISTINCT id, CAST(list_sum(list_transform(range(0, 16), j ->
        |    b[CAST(i + j + 1 AS INTEGER)] * (1 << CAST(15 - j AS INTEGER)))) AS BIGINT) AS gram
        |  FROM gp),
        |sz AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY id),
        |sh AS (SELECT x.id AS a, y.id AS b, CAST(COUNT(*) AS BIGINT) AS n_shared
        |  FROM g x JOIN g y ON x.gram = y.gram AND x.id < y.id GROUP BY x.id, y.id),
        |jc AS (SELECT a, b, n_shared,
        |  CAST(n_shared AS DOUBLE) / CAST(sa.n + sb.n - n_shared AS DOUBLE) AS jaccard
        |  FROM sh JOIN sz sa ON sa.id = a JOIN sz sb ON sb.id = b)
        |SELECT a, b, n_shared, jaccard FROM jc WHERE jaccard >= 0.5
        |ORDER BY a, b""".stripMargin)),

    // S2 — REAL Ogg/Vorbis codec as an oracle-checked query (the
    // sibling of s2_mp3_roundtrip): tones through the pure-JVM Vorbis
    // encoder (floor1 + residue + MDCT, self-describing codebooks) and
    // back through the PRODUCTION decode seam; DuckDB recomputes the
    // exact output length, rate and the preserved Goertzel peak from
    // the synthesis parameters. Ids with id % 3 == 2 take the MIXED
    // 256/1024 block-size stream (asymmetric transition windows, S-S-L-L
    // pattern) — its emitted length equals the tone length too, because
    // every fixture length is a multiple of the 1280-sample S-S-L-L
    // lap cycle, so ONE oracle covers both window paths. Bounded slice
    // (event_id < 40).
    Q("s2_vorbis_roundtrip",
      (s, dir) => {
        import s.implicits._
        import graft.pipeline.{VorbisEncoder, WavAudio}
        val ids = Tables.events(s, dir).select(col("event_id").cast("long"))
          .filter(col("event_id") < 40).distinct().as[Long]
        val payloads = ids.map { id =>
          val f = 250.0 * (1 + id % 4)
          val n = (3840 + (id % 4) * 1280).toInt // 0.24-0.48 s at 16 kHz
          val tone = Array.tabulate(n)(i =>
            (0.5 * math.sin(2 * math.Pi * f * i / 16000.0)).toFloat)
          val bytes =
            if (id % 3 == 2) VorbisEncoder.encodeMixed(16000, tone)
            else VorbisEncoder.encode(16000, tone)
          (id.toString, bytes)
        }
        WavAudio.decodeDataset(payloads)
          .map { a =>
            def power(f: Double): Double = {
              var re = 0.0; var im = 0.0
              var i = 0
              while (i < a.waveform.length) {
                val w = 2 * math.Pi * f * i / a.sr
                re += a.waveform(i) * math.cos(w)
                im += a.waveform(i) * math.sin(w)
                i += 1
              }
              re * re + im * im
            }
            val peak = Seq(250, 500, 750, 1000).maxBy(c => power(c.toDouble))
            (a.file.toLong, a.sr.toLong, a.waveform.length.toLong, peak.toLong)
          }
          .toDF("event_id", "sr", "n_samples", "peak_hz")
          .orderBy(col("event_id"))
      },
      Some("""WITH ids AS (SELECT DISTINCT CAST(event_id AS BIGINT) AS event_id
        |  FROM events WHERE event_id < 40)
        |SELECT event_id, CAST(16000 AS BIGINT) AS sr,
        |  CAST(3840 + (event_id % 4) * 1280 AS BIGINT) AS n_samples,
        |  CAST(250 * (1 + event_id % 4) AS BIGINT) AS peak_hz
        |FROM ids ORDER BY event_id""".stripMargin)),

    // S2 — the REAL codec path as an oracle-checked query: per event id
    // synthesize a deterministic int16 waveform, container-encode it
    // (WAV for even ids, FLAC for odd — both real encoders), decode
    // through the production decode seam (javax.sound / pure-JVM FLAC),
    // and report the recovered sample sum. Lossless 16-bit round-trip
    // means the sum equals the synthesis formula's sum EXACTLY, which
    // DuckDB recomputes arithmetically — an external engine checking a
    // codec without decoding a byte. Bounded slice (event_id < 300).
    Q("s2_codec_roundtrip",
      (s, dir) => {
        import s.implicits._
        import graft.pipeline.{FlacAudio, WavAudio}
        val ids = Tables.events(s, dir).select(col("event_id").cast("long"))
          .filter(col("event_id") < 300).distinct().as[Long]
        val payloads = ids.map { id =>
          val n = (200 + id % 800).toInt
          val sam = Array.tabulate(n)(i =>
            ((id * 31 + i.toLong * 17) % 201 - 100) * 50 / 32767f)
          val bytes =
            if (id % 2 == 0) WavAudio.encode(8000, sam)
            else FlacAudio.encode(8000, sam)
          (id.toString, bytes)
        }
        WavAudio.decodeDataset(payloads)
          .map { a =>
            val sum = a.waveform.foldLeft(0L)((acc, x) =>
              acc + math.round(x * 32768f))
            (a.file.toLong, a.sr, a.waveform.length.toLong, sum)
          }
          .toDF("event_id", "sr", "n_samples", "sum_q")
          .withColumn("container",
            when(pmod(col("event_id"), lit(2L)) === 0L, lit("wav"))
              .otherwise(lit("flac")))
          .select(col("event_id"), col("container"), col("sr"),
            col("n_samples"), col("sum_q"))
          .orderBy(col("event_id"))
      },
      Some("""WITH ids AS (SELECT DISTINCT CAST(event_id AS BIGINT) AS event_id
        |  FROM events WHERE event_id < 300),
        |c AS (SELECT event_id, CAST(200 + event_id % 800 AS BIGINT) AS n FROM ids)
        |SELECT event_id,
        |  CASE WHEN event_id % 2 = 0 THEN 'wav' ELSE 'flac' END AS container,
        |  8000 AS sr, n AS n_samples,
        |  CAST(list_sum(list_transform(range(n),
        |    i -> ((event_id * 31 + i * 17) % 201 - 100) * 50)) AS BIGINT) AS sum_q
        |FROM c ORDER BY event_id""".stripMargin)),

    // S3 — the pre-decode probe GATE as an oracle-checked query over
    // ALL SIX reference container families (`utils.py:11-16`): WAV +
    // FLAC full payloads, CBR MP3 silence frames, Ogg/Vorbis
    // granule-position pages, M4A mvhd/mdhd box walks, ADTS AAC frame
    // walks (header-accurate minted shells — the probe reads only
    // headers). Junk payloads for id%7=0 probe as duration 0 (the
    // reference's get_duration failure contract); gate [1 s, 2.5 s];
    // DuckDB recomputes survivorship from each family's exact integer
    // duration formula. Bounded slice (event_id < 400).
    Q("s3_probe_gate",
      (s, dir) => {
        import s.implicits._
        import graft.pipeline.{AudioProbe, FlacAudio, WavAudio}
        val ids = Tables.events(s, dir).select(col("event_id").cast("long"))
          .filter(col("event_id") < 400).distinct().as[Long]
        val payloads = ids.map { id =>
          val k = (id % 50).toInt
          val bytes =
            if (id % 7 == 0) Array.fill[Byte](96)(0x5a) // foreign bytes
            else (id % 6) match {
              case 0 => WavAudio.encode(8000, new Array[Float](4000 + k * 400))
              case 1 => FlacAudio.encode(8000, new Array[Float](4000 + k * 400))
              case 2 => AudioProbe.Mint.mp3Cbr(14 + k * 2) // 36 ms/frame CBR
              case 3 => AudioProbe.Mint.ogg(16000, 8000L + k * 800L)
              case 4 => AudioProbe.Mint.m4a(24000, 12000L + k * 1200L)
              case _ => AudioProbe.Mint.adts(16000, 8 + k)
            }
          (id.toString, bytes)
        }
        AudioProbe.probeGate(payloads, minSec = 1.0, maxSec = 2.5)
          .map(_._1.toLong).toDF("event_id")
          .orderBy(col("event_id"))
      },
      Some("""WITH ids AS (SELECT DISTINCT CAST(event_id AS BIGINT) AS event_id
        |  FROM events WHERE event_id < 400),
        |c AS (SELECT event_id, event_id % 50 AS k, event_id % 6 AS fam FROM ids),
        |d AS (SELECT event_id,
        |  CASE fam
        |    WHEN 0 THEN (4000 + k * 400) * 125
        |    WHEN 1 THEN (4000 + k * 400) * 125
        |    WHEN 2 THEN (14 + k * 2) * 36000
        |    WHEN 3 THEN (8000 + k * 800) * 1000000 // 16000
        |    WHEN 4 THEN (12000 + k * 1200) * 1000000 // 24000
        |    ELSE (8 + k) * 64000 END AS dur_us
        |  FROM c)
        |SELECT event_id FROM d
        |WHERE event_id % 7 <> 0 AND dur_us >= 1000000 AND dur_us <= 2500000
        |ORDER BY event_id""".stripMargin)),

    // S2 — REAL MP3 codec as an oracle-checked query: per event id a
    // known tone is encoded by the pure-JVM MPEG-1 Layer III encoder
    // and decoded back through the PRODUCTION decode seam
    // (WavAudio.decode → Mp3Audio); the decoded stream's length, rate
    // and Goertzel-detected peak frequency are discrete facts DuckDB
    // recomputes from the synthesis parameters alone — frequency
    // preservation through a lossy codec is the roundtrip check.
    // Bounded slice (event_id < 40).
    Q("s2_mp3_roundtrip",
      (s, dir) => {
        import s.implicits._
        import graft.pipeline.{Mp3Encoder, WavAudio}
        val ids = Tables.events(s, dir).select(col("event_id").cast("long"))
          .filter(col("event_id") < 40).distinct().as[Long]
        val payloads = ids.map { id =>
          val f = 250.0 * (1 + id % 4)
          val n = (6400 + (id % 4) * 3200).toInt // 0.2-0.5 s at 32 kHz
          val tone = Array.tabulate(n)(i =>
            (0.5 * math.sin(2 * math.Pi * f * i / 32000.0)).toFloat)
          (id.toString, Mp3Encoder.encode(32000, tone, 128))
        }
        WavAudio.decodeDataset(payloads)
          .map { a =>
            def power(f: Double): Double = {
              var re = 0.0; var im = 0.0
              var i = 2000 // skip filterbank warm-up
              while (i < a.waveform.length) {
                val w = 2 * math.Pi * f * i / a.sr
                re += a.waveform(i) * math.cos(w)
                im += a.waveform(i) * math.sin(w)
                i += 1
              }
              re * re + im * im
            }
            val peak = Seq(250, 500, 750, 1000).maxBy(c => power(c.toDouble))
            (a.file.toLong, a.sr.toLong, a.waveform.length.toLong, peak.toLong)
          }
          .toDF("event_id", "sr", "n_samples", "peak_hz")
          .orderBy(col("event_id"))
      },
      Some("""WITH ids AS (SELECT DISTINCT CAST(event_id AS BIGINT) AS event_id
        |  FROM events WHERE event_id < 40)
        |SELECT event_id, CAST(32000 AS BIGINT) AS sr,
        |  ((6400 + (event_id % 4) * 3200 + 1151) // 1152) * 1152 AS n_samples,
        |  CAST(250 * (1 + event_id % 4) AS BIGINT) AS peak_hz
        |FROM ids ORDER BY event_id""".stripMargin)),

    // S10+A11 — decode fault isolation + run tallies as an oracle
    // query: every id%5=0 payload is corrupt and must yield a
    // failed-status ROW (not a job abort), everything else completes;
    // the tallies land via Incremental.statusCounts and DuckDB
    // recomputes them from the corruption rule. Bounded (event_id < 500).
    // L130 — EXTERNAL-SERVICE BATCH INFERENCE IN THE GATE: the generic
    // HTTP operator (per-executor keep-alive client, order-preserving
    // pipelining, retry ladder, S10 routing) driven end-to-end against
    // the engine-minted LineService fixture inside the correctness
    // gate. Clean docs flow through 64-row pipelined batches; docs with
    // doc_id % 97 == 0 carry the poison marker and run as singleton
    // batches (per-batch failure granularity — a poisoned doc must fail
    // ALONE), exhausting retries into deterministic failed-status rows.
    // The oracle states both legs: the service's token count for clean
    // docs, n_tok = -1 + status 'failed' for poisoned — so the S10
    // routing itself is oracle-checked, not just suite-tested.
    Q("svc_batch_inference",
      (s, dir) => {
        import s.implicits._
        import graft.pipeline.{HttpInference, HttpServiceConfig}
        val ep = tokenCountService.endpoint
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
          .as[(Long, String)]
        def run(ds: org.apache.spark.sql.Dataset[(Long, String)], tag: String,
                cfg: HttpServiceConfig) =
          HttpInference.mapService[(Long, String), (Long, Long, String)](ds, cfg,
            encode = xs => xs.map { case (id, t) =>
              s"$tag\t$id\t${HttpInference.b64t(t)}"
            }.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
            decode = bytes => new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
              .split("\n", -1).toSeq.filter(_.nonEmpty).map { l =>
                val f = l.split("\t", -1)
                (f(0).toLong, f(1).toLong, "completed")
              },
            onFailure = (x, _) => (x._1, -1L, "failed"))
        val clean = run(docs.filter(_._1 % 97 != 0), "OK",
          HttpServiceConfig(ep, batchSize = 64, maxInFlight = 4,
            maxRetries = 2, baseBackoffMs = 2))
        val poisoned = run(docs.filter(_._1 % 97 == 0), "POISON",
          HttpServiceConfig(ep, batchSize = 1, maxInFlight = 4,
            maxRetries = 1, baseBackoffMs = 1))
        clean.union(poisoned).toDF("doc_id", "n_tok", "status")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $toksSqlCte
        |SELECT doc_id,
        |  CASE WHEN doc_id % 97 = 0 THEN CAST(-1 AS BIGINT)
        |    ELSE CAST(len(toks) AS BIGINT) END AS n_tok,
        |  CASE WHEN doc_id % 97 = 0 THEN 'failed' ELSE 'completed' END AS status
        |FROM d ORDER BY doc_id""".stripMargin)),

    Q("s10_status_counts",
      (s, dir) => {
        import s.implicits._
        import graft.pipeline.WavAudio
        val ids = Tables.events(s, dir).select(col("event_id").cast("long"))
          .filter(col("event_id") < 500).distinct().as[Long]
        val payloads = ids.map { id =>
          val bytes =
            if (id % 5 == 0) "zz".getBytes ++ new Array[Byte](64)
            else WavAudio.encode(8000, new Array[Float](800))
          (id.toString, bytes)
        }
        graft.sources.Incremental.statusCounts(
            WavAudio.decodeDatasetWithStatus(payloads).toDF(), "status")
          .select(col("status"), col("count").cast("long").as("n"))
          .orderBy(col("status"))
      },
      Some("""WITH ids AS (SELECT DISTINCT CAST(event_id AS BIGINT) AS event_id
        |  FROM events WHERE event_id < 500),
        |c AS (SELECT CASE WHEN event_id % 5 = 0 THEN 'failed'
        |    ELSE 'completed' END AS status FROM ids)
        |SELECT status, CAST(COUNT(*) AS BIGINT) AS n
        |FROM c GROUP BY status ORDER BY status""".stripMargin)),

    // M7∘J7∘S11∘M9 — the TRANSCRIPTION SHELL as an oracle-checked
    // query: real segment slicing feeds the (deterministic mock) ASR
    // kernel, the per-file sidecar inner join drops files with no
    // transcript (id%4=1), and forced alignment distributes word spans
    // uniformly — constant-amplitude synthesis keeps every branch an
    // exact integer/formula DuckDB mirrors: nWords = end−start seconds,
    // loud/soft + en/xx by amplitude parity, spans at whole seconds.
    Q("m7_asr_align",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.events(s, dir).select(col("event_id").cast("long"))
          .filter(col("event_id") < 100).distinct().as[Long]
        val audio = ids.map { id =>
          val amp = if (id % 2 == 0) 0.9f else 0.1f
          graft.model.AudioFile(id.toString, 1000, Array.fill(6000)(amp))
        }
        val segs = ids.map(id => graft.model.SpeakerSegment(
          id.toString, 1.0, 2.0 + (id % 3), s"spk${id % 2}"))
        val asr = graft.pipeline.Transcription.asrStage(segs, audio)
        val transcripts = ids.filter(_ % 4 != 1)
          .map(id => (id.toString, s"t$id")).toDF("file", "sidecar")
        graft.pipeline.Transcription.alignStage(asr, transcripts)
          .select(col("file").cast("long").as("event_id"), col("speaker"),
            col("word"), col("w_start"), col("w_end"))
          .orderBy(col("event_id"), col("w_start"))
      },
      Some("""WITH ids AS (SELECT DISTINCT CAST(event_id AS BIGINT) AS id
        |  FROM events WHERE event_id < 100),
        |k AS (SELECT id, 1 + id % 3 AS nw,
        |    CASE WHEN id % 2 = 0 THEN 'loud' ELSE 'soft' END AS word
        |  FROM ids WHERE id % 4 <> 1),
        |w AS (SELECT id, word, unnest(range(nw)) AS i FROM k)
        |SELECT id AS event_id, 'spk' || CAST(id % 2 AS VARCHAR) AS speaker,
        |  word, CAST(1 + i AS DOUBLE) AS w_start, CAST(2 + i AS DOUBLE) AS w_end
        |FROM w ORDER BY event_id, w_start""".stripMargin)),

    // M8 (audio side) — language detection through the ASR kernel: the
    // deterministic energy heuristic (the reference's unseeded 30-s
    // sampling made deterministic, SURVEY §7.4.2) labels each file
    // en/xx; DuckDB mirrors the amplitude-parity rule.
    Q("m8_langid_audio",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.events(s, dir).select(col("event_id").cast("long"))
          .filter(col("event_id") < 150).distinct().as[Long]
        val audio = ids.map { id =>
          val amp = if (id % 2 == 0) 0.9f else 0.1f
          graft.model.AudioFile(id.toString, 1000, Array.fill(3000)(amp))
        }
        val segs = ids.map(id => graft.model.SpeakerSegment(
          id.toString, 0.5, 2.5, "spk"))
        graft.pipeline.Transcription.asrStage(segs, audio)
          .map(r => (r.file.toLong, r.language))
          .toDF("event_id", "language")
          .orderBy(col("event_id"))
      },
      Some("""WITH ids AS (SELECT DISTINCT CAST(event_id AS BIGINT) AS id
        |  FROM events WHERE event_id < 150)
        |SELECT id AS event_id,
        |  CASE WHEN id % 2 = 0 THEN 'en' ELSE 'xx' END AS language
        |FROM ids ORDER BY event_id""".stripMargin)),

    // M5∘A12 — the CLUSTERING KERNEL as an oracle-checked query: the
    // real HDBSCAN-shaped leader clustering runs per group inside
    // flatMapGroups (the production per-file granularity) over one-hot
    // family embeddings, where every cosine is exactly 1 or 0 — so
    // grouping, the A12 min-cluster floor (max(2, ⌊n·0.04⌋)), the
    // first-appearance label order, and the failed soft rescue of the
    // planted singleton family are all pure relational facts DuckDB
    // recomputes with windows. Bounded (event_id < 430: 43 members per
    // group, family counts {9,9,8,8,8,1} — the 1 dissolves to −1).
    Q("m5_cluster_floor",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.events(s, dir).select(col("event_id").cast("long"))
          .filter(col("event_id") < 430).distinct().as[Long]
        ids.groupByKey(_ % 10)
          .flatMapGroups { (g, it) =>
            val members = it.toArray.sorted
            val embs: IndexedSeq[Array[Float]] = members.toIndexedSeq.map { id =>
              val e = new Array[Float](16)
              val fam = if (id / 10 == 42) 5 else (id / 10) % 5
              e(fam.toInt) = 1f
              e
            }
            val labels = graft.pipeline.Clustering.clusterOne(embs)
            members.zip(labels).iterator.map { case (id, l) =>
              (id, g, l.toLong)
            }
          }
          .toDF("event_id", "grp", "label")
          .orderBy(col("event_id"))
      },
      Some("""WITH ids AS (SELECT DISTINCT CAST(event_id AS BIGINT) AS id
        |  FROM events WHERE event_id < 430),
        |m AS (SELECT id, id % 10 AS grp,
        |  CASE WHEN id // 10 = 42 THEN 5 ELSE (id // 10) % 5 END AS fam
        |  FROM ids),
        |pos AS (SELECT *, row_number() OVER (PARTITION BY grp ORDER BY id) AS p,
        |  COUNT(*) OVER (PARTITION BY grp) AS n FROM m),
        |fs AS (SELECT grp, fam, COUNT(*) AS fsz, MIN(p) AS fp, MAX(n) AS n
        |  FROM pos GROUP BY grp, fam),
        |surv AS (SELECT grp, fam,
        |    CAST(dense_rank() OVER (PARTITION BY grp ORDER BY fp) AS BIGINT) - 1 AS label
        |  FROM fs WHERE fsz >= greatest(2, CAST(trunc(n * 0.04) AS BIGINT)))
        |SELECT m.id AS event_id, m.grp, COALESCE(s.label, -1) AS label
        |FROM m LEFT JOIN surv s ON s.grp = m.grp AND s.fam = m.fam
        |ORDER BY event_id""".stripMargin)),

    // M2∘W5∘F9 — the SEPARATION COMPOSITION as an oracle-checked
    // query: margins∘STFT-frames∘kernel∘reassembly∘residual over
    // random-ish formula waveforms whose lengths straddle the chunk
    // and frame boundaries. The linear kernel must commute with the
    // whole window algebra (vocal ≡ 0.8f·mix sample-for-sample) and
    // the residual must conserve (mix ≡ vocal + nonvocal) — checked
    // per sample Spark-side, reported as booleans the oracle pins TRUE
    // for every corpus-derived length. Bounded (event_id < 150).
    Q("m2_separate_transparent",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.events(s, dir).select(col("event_id").cast("long"))
          .filter(col("event_id") < 150).distinct().as[Long]
        val audio = ids.map { id =>
          val n = (300 + (id % 9) * 700).toInt
          val w = Array.tabulate(n)(i =>
            (((id * 31 + i.toLong * 17) % 201) - 100) / 128f)
          graft.model.AudioFile(id.toString, 16000, w)
        }
        val (vocal, nonvocal) = graft.pipeline.SpeechPipeline.separateStage(audio)
        val mixDf = audio.map(a => (a.file, a.waveform)).toDF("file", "mix")
        val v = vocal.map(a => (a.file, a.waveform)).toDF("file", "voc")
        val nv = nonvocal.map(a => (a.file, a.waveform)).toDF("file", "nonvoc")
        mixDf.join(v, "file").join(nv, "file")
          .as[(String, Array[Float], Array[Float], Array[Float])]
          .map { case (f, mix, voc, non) =>
            val vocalExact = voc.length == mix.length &&
              mix.indices.forall(i => voc(i) == mix(i) * 0.8f)
            val residualExact = non.length == mix.length &&
              mix.indices.forall(i => non(i) == mix(i) - voc(i))
            (f.toLong, mix.length.toLong, vocalExact, residualExact)
          }
          .toDF("event_id", "n_samples", "vocal_exact", "residual_exact")
          .orderBy(col("event_id"))
      },
      Some("""WITH ids AS (SELECT DISTINCT CAST(event_id AS BIGINT) AS id
        |  FROM events WHERE event_id < 150)
        |SELECT id AS event_id, CAST(300 + (id % 9) * 700 AS BIGINT) AS n_samples,
        |  TRUE AS vocal_exact, TRUE AS residual_exact
        |FROM ids ORDER BY event_id""".stripMargin)),

    // M10∘W4∘A9 — the DNSMOS SHELL as an oracle-checked query: real
    // wraparound-padded hop windows + the (deterministic mock) polyfit
    // kernel + per-clip means. Amplitudes 1.0/0.0 make every window's
    // mean energy an exact constant, so the per-clip scores are pure
    // Horner constants; outputs scale to e6 integers so a 1-ulp
    // averaging wobble can never flip the compare. Hop-count formula
    // (dnsmos.py:134) checked across the pad/1..4-hop range.
    Q("m10_dnsmos_windows",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.events(s, dir).select(col("event_id").cast("long"))
          .filter(col("event_id") < 100).distinct().as[Long]
        val audio = ids.map { id =>
          val amp = if (id % 2 == 0) 1.0f else 0.0f
          graft.model.AudioFile(id.toString, 1000,
            Array.fill(1500 + (id % 5).toInt * 1000)(amp))
        }
        val wins = graft.pipeline.Transcription.dnsmosWindows(
          audio, winSec = 2.0, hopSec = 1.0)
        graft.pipeline.Transcription.dnsmosScores(wins)
          .select(col("file").cast("long").as("event_id"), col("num_hops"),
            round(col("OVRL") * 1e6d).cast("long").as("ovrl_e6"),
            round(col("SIG") * 1e6d).cast("long").as("sig_e6"),
            round(col("BAK") * 1e6d).cast("long").as("bak_e6"))
          .orderBy(col("event_id"))
      },
      Some("""WITH ids AS (SELECT DISTINCT CAST(event_id AS BIGINT) AS id
        |  FROM events WHERE event_id < 100),
        |c AS (SELECT id, 1500 + (id % 5) * 1000 AS len,
        |  CASE WHEN id % 2 = 0 THEN 1.0 ELSE 0.0 END AS x FROM ids),
        |h AS (SELECT id, x, CASE WHEN len < 2000 THEN 1
        |  ELSE (len - 2000) // 1000 + 1 END AS nh FROM c)
        |SELECT id AS event_id, CAST(nh AS BIGINT) AS num_hops,
        |  CAST(round((((-0.06)*x + 1.7)*x + 0.2) * 1000000) AS BIGINT) AS ovrl_e6,
        |  CAST(round(((0.04*x + 1.1)*x + 0.8) * 1000000) AS BIGINT) AS sig_e6,
        |  CAST(round((((-0.01)*x + 0.9)*x + 1.2) * 1000000) AS BIGINT) AS bak_e6
        |FROM h ORDER BY event_id""".stripMargin)),

    // M1∘P1∘W1 — the VAD SHELL as an oracle-checked query: the
    // (deterministic mock) VAD kernel + pad/clamp + zero-gap merge over
    // synthesized bursts. Per id: a main burst, for even ids a second
    // burst whose 0.05 s gap closes under the ±0.05 s padding (the
    // merge is observable in the output span), and a 30-sample blip
    // under the 50-sample min-run (must vanish). Output in rounded µs
    // so double pad arithmetic can never flip the compare. Bounded
    // (event_id < 120).
    Q("m1_vad_gate",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.events(s, dir).select(col("event_id").cast("long"))
          .filter(col("event_id") < 120).distinct().as[Long]
        val audio = ids.map { id =>
          val w = new Array[Float](5000)
          val l1 = 200 * (1 + (id % 3)).toInt
          for (i <- 1000 until 1000 + l1) w(i) = 0.9f
          if (id % 2 == 0) {
            val b2 = 1000 + l1 + 50
            for (i <- b2 until b2 + 300) w(i) = 0.9f
          }
          for (i <- 4500 until 4530) w(i) = 0.9f // sub-min-run blip
          graft.model.AudioFile(id.toString, 1000, w)
        }
        graft.pipeline.SpeechPipeline.vadStage(audio, padSec = 0.05)
          .map(seg => (seg.file.toLong,
            math.round(seg.start * 1e6d), math.round(seg.end * 1e6d)))
          .toDF("event_id", "s_us", "e_us")
          .orderBy(col("event_id"), col("s_us"))
      },
      Some("""WITH ids AS (SELECT DISTINCT CAST(event_id AS BIGINT) AS id
        |  FROM events WHERE event_id < 120),
        |c AS (SELECT id, 1000 + 200 * (1 + id % 3) AS e1 FROM ids)
        |SELECT id AS event_id, CAST(950000 AS BIGINT) AS s_us,
        |  CAST(CASE WHEN id % 2 = 0 THEN e1 * 1000 + 400000
        |            ELSE e1 * 1000 + 50000 END AS BIGINT) AS e_us
        |FROM c ORDER BY event_id, s_us""".stripMargin)),

    // W5 — the STFT frame plan as an oracle-checked query: run the real
    // stftFrames operator (separate_fast.py:208-221 arithmetic — trim =
    // nFft/2, gen = chunkSize − 2·trim, the full-gen pad quirk at
    // n mod gen == 0) over synthetic waveforms sized from document
    // lengths, and report per-doc (n, pad, n_frames); DuckDB mirrors
    // the arithmetic. Bounded slice (doc_id < 200), chunk 1024/nFft 512
    // → gen 512.
    Q("w5_stft_plan",
      (s, dir) => {
        import s.implicits._
        val audio = Tables.documents(s, dir)
          .filter(col("doc_id") < 200)
          .select(col("doc_id"), (pmod(col("n_chars"), lit(3000L)) + 1L).as("n"))
          .as[(Long, Long)]
          .map { case (id, n) =>
            graft.model.AudioFile(id.toString, 16000, new Array[Float](n.toInt)) }
        graft.pipeline.SpeechPipeline.stftFrames(audio, chunkSize = 1024, nFft = 512)
          .groupByKey(_.file)
          .mapGroups { (file, it) =>
            val fs = it.toArray
            (file.toLong, fs.head.nSample.toLong, fs.head.pad.toLong, fs.length.toLong)
          }
          .toDF("doc_id", "n_samples", "pad", "n_frames")
          .orderBy(col("doc_id"))
      },
      Some("""WITH b AS (SELECT doc_id, n_chars % 3000 + 1 AS n
        |  FROM documents WHERE doc_id < 200),
        |c AS (SELECT doc_id, n, 512 - (n % 512) AS pad FROM b)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_samples, CAST(pad AS BIGINT) AS pad,
        |  CAST((n + pad) // 512 AS BIGINT) AS n_frames
        |FROM c ORDER BY doc_id""".stripMargin)),

    // Multimodal — REAL audio feature extraction: decode (WAV via
    // javax.sound for id%3=0, FLAC fixed-predictor for 1, FLAC LPC for
    // 2 — three genuine codec paths), then per-100-sample window the
    // integer energy (Σq²) and zero-crossing count. Lossless 16-bit
    // round-trip keeps every feature in the exact integer domain, so
    // DuckDB recomputes them from the synthesis formula without
    // touching audio. Bounded slice (event_id < 200).
    Q("mm_audio_features",
      (s, dir) => {
        import s.implicits._
        import graft.pipeline.{FlacAudio, WavAudio}
        val ids = Tables.events(s, dir).select(col("event_id").cast("long"))
          .filter(col("event_id") < 200).distinct().as[Long]
        val payloads = ids.map { id =>
          val n = (300 + id % 500).toInt
          val sam = Array.tabulate(n)(i =>
            ((id * 13 + i.toLong * 29) % 401 - 200) * 25 / 32767f)
          val bytes = (id % 3) match {
            case 0 => WavAudio.encode(8000, sam)
            case 1 => FlacAudio.encode(8000, sam)
            case _ => FlacAudio.encode(8000, sam, lpc = true)
          }
          (id.toString, bytes)
        }
        WavAudio.decodeDataset(payloads)
          .flatMap { a =>
            val q = a.waveform.map(x => math.round(x * 32768f))
            q.grouped(100).zipWithIndex.map { case (win, wi) =>
              val ss = win.foldLeft(0L)((acc, v) => acc + v * v)
              val zc = win.sliding(2)
                .count(p => p.length == 2 && p(0) * p(1) < 0)
              (a.file.toLong, wi.toLong, win.length.toLong, ss, zc.toLong)
            }
          }
          .toDF("event_id", "win", "n", "sum_sq", "zero_cross")
          .orderBy(col("event_id"), col("win"))
      },
      Some("""WITH ids AS (SELECT DISTINCT CAST(event_id AS BIGINT) AS event_id
        |  FROM events WHERE event_id < 200),
        |c AS (SELECT event_id, CAST(300 + event_id % 500 AS BIGINT) AS n FROM ids),
        |wins AS (SELECT event_id, n, unnest(range((n + 99) // 100)) AS win FROM c),
        |b AS (SELECT event_id, win, win * 100 AS lo,
        |  least(n, win * 100 + 100) AS hi FROM wins)
        |SELECT event_id, CAST(win AS BIGINT) AS win, CAST(hi - lo AS BIGINT) AS n,
        |  CAST(list_sum(list_transform(range(lo, hi),
        |    i -> ((event_id*13 + i*29) % 401 - 200) * 25
        |       * (((event_id*13 + i*29) % 401 - 200) * 25))) AS BIGINT) AS sum_sq,
        |  CAST(COALESCE(list_sum(list_transform(range(lo, hi - 1),
        |    i -> CASE WHEN ((event_id*13 + i*29) % 401 - 200)
        |              * ((event_id*13 + (i+1)*29) % 401 - 200) < 0
        |         THEN 1 ELSE 0 END)), 0) AS BIGINT) AS zero_cross
        |FROM b ORDER BY event_id, win""".stripMargin)),

    // W3+J1+A1/A2+P2 — the reference's most operator-dense trace
    // (separation_filter windows scored with energy ratios, §3.3):
    // sliding windows over merged chunks, overlap-weighted "energy" per
    // class via a range join (F10 overlap length), purity classification.
    Q("w3a2_window_energy_ratios",
      (s, dir) => {
        val wins = SegmentOps.slidingWindows(chunks(s, dir), "start_us", "end_us",
            60000000L, 25000000L)
          .select(col("user_id").as("w_user"), col("win_start"), col("win_end"))
        val iv = Tables.eventIntervals(s, dir)
          .withColumn("vocal", col("event_type").isin("click", "view"))
        val ov = least(col("e_us"), col("win_end")) - greatest(col("s_us"), col("win_start"))
        wins.join(iv,
            col("w_user") === col("user_id") &&
              col("s_us") < col("win_end") && col("win_start") < col("e_us"),
            "left")
          .withColumn("ov", ov)
          .groupBy(col("w_user"), col("win_start"), col("win_end"))
          .agg(
            sum(when(col("vocal") === true, col("cents") * col("ov")).otherwise(0L))
              .as("v_energy"),
            sum(when(col("vocal") === false, col("cents") * col("ov")).otherwise(0L))
              .as("nv_energy"))
          .withColumn("v_r",
            when(col("v_energy") + col("nv_energy") > 0,
              col("v_energy").cast("double") /
                (col("v_energy") + col("nv_energy")).cast("double")))
          .withColumn("label",
            when(col("v_energy") + col("nv_energy") === 0, "empty")
              .when(col("v_r") >= 0.7, "vocal").otherwise("noisy"))
          .select(col("w_user").as("user_id"), col("win_start"), col("win_end"),
            col("v_energy"), col("nv_energy"), col("v_r"), col("label"))
          .orderBy(col("user_id"), col("win_start"))
      },
      Some(s"""WITH $chunksSqlCte,
        |w AS (SELECT user_id, start_us, end_us,
        |  unnest(generate_series(0, (end_us - start_us) // 25000000)) AS iw FROM ch),
        |wn AS (SELECT user_id, start_us + iw * 25000000 AS win_start,
        |    least(start_us + iw * 25000000 + 60000000, end_us) AS win_end
        |  FROM w WHERE iw = 0 OR start_us + (iw - 1) * 25000000 + 60000000 < end_us),
        |jn AS (SELECT wn.user_id, wn.win_start, wn.win_end,
        |    i.event_type IN ('click','view') AS vocal, i.cents,
        |    least(i.e_us, wn.win_end) - greatest(i.s_us, wn.win_start) AS ov
        |  FROM wn LEFT JOIN i ON i.user_id = wn.user_id
        |    AND i.s_us < wn.win_end AND wn.win_start < i.e_us),
        |ag AS (SELECT user_id, win_start, win_end,
        |    CAST(SUM(CASE WHEN vocal = true THEN cents * ov ELSE 0 END) AS BIGINT) AS v_energy,
        |    CAST(SUM(CASE WHEN vocal = false THEN cents * ov ELSE 0 END) AS BIGINT) AS nv_energy
        |  FROM jn GROUP BY user_id, win_start, win_end),
        |sc AS (SELECT user_id, win_start, win_end, v_energy, nv_energy,
        |    CASE WHEN v_energy + nv_energy > 0
        |         THEN CAST(v_energy AS DOUBLE) / CAST(v_energy + nv_energy AS DOUBLE)
        |    END AS v_r
        |  FROM ag)
        |SELECT user_id, win_start, win_end, v_energy, nv_energy, v_r,
        |  CASE WHEN v_energy + nv_energy = 0 THEN 'empty'
        |       WHEN v_r >= 0.7 THEN 'vocal' ELSE 'noisy' END AS label
        |FROM sc ORDER BY user_id, win_start""".stripMargin)),

    // W1 capped — the flatMapGroups kernel (utils.py:64-102 with the
    // max_duration cap; sequential per key, NOT window-expressible — the
    // oracle is a recursive CTE folding rows in the same order, in the
    // same converted-double domain).
    Q("w1_capped_sessions",
      (s, dir) => {
        import s.implicits._
        val segs = Tables.eventIntervals(s, dir).select(
          col("user_id").cast("string").as("file"),
          (col("s_us").cast("double") / 1e6d).as("start"),
          (col("e_us").cast("double") / 1e6d).as("end"))
          .as[graft.model.Segment]
        SegmentAlgebra.sessionizeCapped(segs, gap = 3600d, maxDuration = 7200d)
          .toDF()
          .select(col("file"), col("start"), col("end"), col("n"))
          .orderBy(col("file"), col("start"))
      },
      Some("""WITH RECURSIVE i0 AS (SELECT CAST(user_id AS VARCHAR) AS file,
        |  CAST(epoch_us(ts) AS DOUBLE)/1000000.0 AS s,
        |  CAST(epoch_us(ts) + CAST(round(value*1.0E6) AS BIGINT) AS DOUBLE)/1000000.0 AS e
        |  FROM events),
        |i AS (SELECT file, s, e, row_number() OVER (PARTITION BY file ORDER BY s, e) AS rn FROM i0),
        |rec AS (
        |  SELECT file, rn, s AS cur_s, e AS cur_e, 1 AS n, 1 AS sess FROM i WHERE rn = 1
        |  UNION ALL
        |  SELECT i.file, i.rn,
        |    CASE WHEN i.s - r.cur_e <= 3600.0 AND greatest(r.cur_e, i.e) - r.cur_s <= 7200.0
        |         THEN r.cur_s ELSE i.s END,
        |    CASE WHEN i.s - r.cur_e <= 3600.0 AND greatest(r.cur_e, i.e) - r.cur_s <= 7200.0
        |         THEN greatest(r.cur_e, i.e) ELSE i.e END,
        |    CASE WHEN i.s - r.cur_e <= 3600.0 AND greatest(r.cur_e, i.e) - r.cur_s <= 7200.0
        |         THEN r.n + 1 ELSE 1 END,
        |    CASE WHEN i.s - r.cur_e <= 3600.0 AND greatest(r.cur_e, i.e) - r.cur_s <= 7200.0
        |         THEN r.sess ELSE r.sess + 1 END
        |  FROM rec r JOIN i ON i.file = r.file AND i.rn = r.rn + 1),
        |f AS (SELECT file, sess, cur_s, cur_e, n,
        |    row_number() OVER (PARTITION BY file, sess ORDER BY rn DESC) AS rr FROM rec)
        |SELECT file, cur_s AS start, cur_e AS "end", CAST(n AS INTEGER) AS n
        |FROM f WHERE rr = 1 ORDER BY file, start""".stripMargin)),

    // W8 — recursive longest-gap splitting (silero_vad.py:81-112),
    // flatMapGroups kernel. Oracle: a recursive CTE over (lo, hi) index
    // ranges — a range splits at its globally-ranked largest internal gap
    // (first-max tie-break via the gap rank gr) until its span fits.
    Q("w8_recursive_split",
      (s, dir) => {
        import s.implicits._
        val segs = Tables.eventIntervals(s, dir).select(
          col("user_id").cast("string").as("file"),
          (col("s_us").cast("double") / 1e6d).as("start"),
          (col("e_us").cast("double") / 1e6d).as("end"))
          .as[graft.model.Segment]
        SegmentAlgebra.recursiveSplit(segs, maxDuration = 86400d)
          .toDF()
          .select(col("file"), col("start"), col("end"), col("n"))
          .orderBy(col("file"), col("start"))
      },
      Some("""WITH RECURSIVE i0 AS (SELECT CAST(user_id AS VARCHAR) AS file,
        |  CAST(epoch_us(ts) AS DOUBLE)/1000000.0 AS s,
        |  CAST(epoch_us(ts) + CAST(round(value*1.0E6) AS BIGINT) AS DOUBLE)/1000000.0 AS e
        |  FROM events),
        |i AS (SELECT file, s, e, row_number() OVER (PARTITION BY file ORDER BY s, e) AS rn FROM i0),
        |cnt AS (SELECT file, MAX(rn) AS n FROM i GROUP BY file),
        |g0 AS (SELECT a.file, a.rn AS k, a.s - b.e AS gap FROM i a
        |  JOIN i b ON b.file = a.file AND b.rn = a.rn - 1),
        |g AS (SELECT file, k, gap,
        |  row_number() OVER (PARTITION BY file ORDER BY gap DESC, k) AS gr FROM g0),
        |rec AS (
        |  SELECT file, CAST(1 AS BIGINT) AS lo, n AS hi FROM cnt
        |  UNION ALL
        |  SELECT sp.pfile AS file,
        |    CASE WHEN c.pick = 0 THEN sp.plo ELSE sp.bk END AS lo,
        |    CASE WHEN c.pick = 0 THEN sp.bk - 1 ELSE sp.phi END AS hi
        |  FROM (
        |    SELECT r.file AS pfile, r.lo AS plo, r.hi AS phi, arg_min(gg.k, gg.gr) AS bk
        |    FROM rec r
        |    JOIN i a ON a.file = r.file AND a.rn = r.lo
        |    JOIN i b ON b.file = r.file AND b.rn = r.hi
        |    JOIN g gg ON gg.file = r.file AND gg.k > r.lo AND gg.k <= r.hi
        |    WHERE r.hi > r.lo AND b.e - a.s > 86400.0
        |    GROUP BY r.file, r.lo, r.hi
        |  ) sp, (VALUES (0), (1)) c(pick)
        |)
        |SELECT r.file AS file, a.s AS start, b.e AS "end", CAST(r.hi - r.lo + 1 AS INTEGER) AS n
        |FROM rec r
        |JOIN i a ON a.file = r.file AND a.rn = r.lo
        |JOIN i b ON b.file = r.file AND b.rn = r.hi
        |WHERE r.hi = r.lo OR b.e - a.s <= 86400.0
        |ORDER BY file, start""".stripMargin)),

    // F7/F8/F9/F4 — array scalar functions: slice, trim-or-pad,
    // elementwise arithmetic, L2 norm, all in the exact quantized domain.
    Q("f_array_ops",
      (s, dir) => {
        val q = Similarity.quantize(Tables.embeddings(s, dir), "vec_id", "embedding")
        q.select(col("vec_id"),
            aggregate(slice(col("qv"), 1, 8), lit(0L), _ + _).as("head_sum"),
            size(when(size(col("qv")) < 80,
                concat(col("qv"), array_repeat(lit(0L), lit(80) - size(col("qv")))))
              .otherwise(slice(col("qv"), 1, 80))).cast("long").as("padded_len"),
            aggregate(zip_with(col("qv"), transform(col("qv"), _ * lit(2L)), _ - _),
              lit(0L), _ + _).as("resid_sum"),
            sqrt(aggregate(col("qv"), lit(0L), (a, x) => a + x * x).cast("double"))
              .as("l2"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH q AS (SELECT vec_id, list_transform(embedding,
        |  x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS qv FROM embeddings)
        |SELECT vec_id,
        |  CAST(list_sum(qv[1:8]) AS BIGINT) AS head_sum,
        |  CAST(len(CASE WHEN len(qv) < 80
        |    THEN list_concat(qv, list_transform(range(80 - len(qv)), x -> CAST(0 AS BIGINT)))
        |    ELSE qv[1:80] END) AS BIGINT) AS padded_len,
        |  CAST(list_sum(list_transform(qv, x -> x - x * 2)) AS BIGINT) AS resid_sum,
        |  sqrt(CAST(CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS DOUBLE)) AS l2
        |FROM q ORDER BY vec_id""".stripMargin)),

    // A12 — cluster-size floor (speaker_rematch.py:117): integer-domain
    // max(2, n/25) per key.
    Q("a12_cluster_floor",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .withColumn("min_cluster", greatest(lit(2L), expr("n div 25")))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, COUNT(*) AS n,
        |  greatest(2, COUNT(*) // 25) AS min_cluster
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // O3 — sortedness data-quality check (utils.py:153): violations of
    // the per-user time ordering must be zero.
    Q("o3_sortedness_check",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
        evPoints(s, dir)
          .withColumn("next_tus", lead(col("tus"), 1).over(w))
          .agg(
            sum(when(col("next_tus") < col("tus"), 1L).otherwise(0L)).as("violations"),
            count(lit(1)).as("n_rows"))
      },
      Some(s"""WITH $evPointsSqlCte,
        |l AS (SELECT tus, lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS next_tus FROM e)
        |SELECT CAST(SUM(CASE WHEN next_tus < tus THEN 1 ELSE 0 END) AS BIGINT) AS violations,
        |  COUNT(*) AS n_rows FROM l""".stripMargin)),

    // J6+P8+W6+A4+A10 — the host-match stage (§3.4, host_rematch.py:153-190)
    // as one relational query: per-speaker budgeted duration (W6 prefix),
    // host×speaker cross scoring (J6) with deterministic integer scores,
    // threshold accept (P8), per-host rollup with proportions (A10).
    // suppliers ≈ speakers, regions ≈ hosts, nations ≈ files.
    Q("hm_host_match",
      (s, dir) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("cents").desc, col("l_orderkey"), col("l_linenumber"))
        val budget = Tables.lineitem(s, dir)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            round(col("l_extendedprice") * 100d).cast("long").as("cents"))
          .withColumn("cum", sum(col("cents"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(col("cum") <= 20000000L)
          .groupBy(col("l_suppkey")).agg(sum(col("cents")).as("dur"))
        val spk = Tables.supplier(s, dir)
          .join(budget, col("s_suppkey") === col("l_suppkey"))
          .select(col("s_suppkey"), col("s_nationkey"), col("dur"))
        val scored = spk.crossJoin(broadcast(Tables.region(s, dir)))
          .withColumn("score_e2",
            (col("s_suppkey") * 7L + col("r_regionkey").cast("long") * 13L) % 100L)
          .filter(col("score_e2") > 50L)
        val hostTotals = scored.groupBy(col("s_nationkey"), col("r_name"))
          .agg(sum(col("dur")).as("host_total"), count(lit(1)).as("n_matched"))
        val nationTotals = spk.groupBy(col("s_nationkey"))
          .agg(sum(col("dur")).as("nation_total"))
        hostTotals.join(nationTotals, "s_nationkey")
          .withColumn("proportion",
            col("host_total").cast("double") / col("nation_total").cast("double"))
          .select(col("s_nationkey").cast("long").as("nationkey"), col("r_name"),
            col("host_total"), col("n_matched"), col("proportion"))
          .orderBy(col("nationkey"), col("r_name"))
      },
      Some("""WITH b AS (SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem),
        |c AS (SELECT l_suppkey, cents,
        |  CAST(SUM(cents) OVER (PARTITION BY l_suppkey
        |    ORDER BY cents DESC, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM b),
        |d AS (SELECT l_suppkey, CAST(SUM(cents) AS BIGINT) AS dur FROM c
        |  WHERE cum <= 20000000 GROUP BY l_suppkey),
        |spk AS (SELECT s_suppkey, s_nationkey, dur FROM supplier
        |  JOIN d ON s_suppkey = l_suppkey),
        |sc AS (SELECT s_suppkey, s_nationkey, dur, r_name,
        |  (s_suppkey * 7 + CAST(r_regionkey AS BIGINT) * 13) % 100 AS score_e2
        |  FROM spk CROSS JOIN region),
        |acc AS (SELECT * FROM sc WHERE score_e2 > 50),
        |ht AS (SELECT s_nationkey, r_name, CAST(SUM(dur) AS BIGINT) AS host_total,
        |  COUNT(*) AS n_matched FROM acc GROUP BY s_nationkey, r_name),
        |nt AS (SELECT s_nationkey, CAST(SUM(dur) AS BIGINT) AS nation_total
        |  FROM spk GROUP BY s_nationkey)
        |SELECT CAST(ht.s_nationkey AS BIGINT) AS nationkey, ht.r_name, ht.host_total,
        |  ht.n_matched,
        |  CAST(ht.host_total AS DOUBLE) / CAST(nt.nation_total AS DOUBLE) AS proportion
        |FROM ht JOIN nt ON nt.s_nationkey = ht.s_nationkey
        |ORDER BY nationkey, r_name""".stripMargin)),

    // J8 active sets — sweep line emitting the sorted active label set
    // per elementary interval (diarization.py:24-64). Oracle: per
    // boundary pair, a speaker is active iff its +1/-1 boundary deltas at
    // times ≤ the interval start sum positive (ends sort before starts at
    // ties automatically — both are counted at t ≤ s).
    Q("j8_active_sets",
      (s, dir) => {
        import s.implicits._
        val segs = Tables.eventIntervals(s, dir).select(
          col("user_id").cast("string").as("file"),
          (col("s_us").cast("double") / 1e6d).as("start"),
          (col("e_us").cast("double") / 1e6d).as("end"),
          col("event_type").as("speaker"))
          .as[graft.model.SpeakerSegment]
        SegmentAlgebra.sweepLineActiveSets(segs)
          .toDF()
          .select(col("file"), col("start"), col("end"),
            array_join(col("speakers"), ",").as("speakers"))
          .orderBy(col("file"), col("start"))
      },
      Some("""WITH i AS (SELECT CAST(user_id AS VARCHAR) AS file,
        |  CAST(epoch_us(ts) AS DOUBLE)/1000000.0 AS s,
        |  CAST(epoch_us(ts) + CAST(round(value*1.0E6) AS BIGINT) AS DOUBLE)/1000000.0 AS e,
        |  event_type AS speaker FROM events),
        |ev AS (SELECT file, s AS t, CAST(1 AS BIGINT) AS d, speaker FROM i
        |       UNION ALL SELECT file, e AS t, CAST(-1 AS BIGINT) AS d, speaker FROM i),
        |bounds AS (SELECT DISTINCT file, t FROM ev),
        |b2 AS (SELECT file, t AS s, lead(t) OVER (PARTITION BY file ORDER BY t) AS e FROM bounds),
        |act AS (SELECT b.file AS file, b.s AS s, b.e AS e, ev.speaker AS speaker
        |  FROM b2 b JOIN ev ON ev.file = b.file AND ev.t <= b.s
        |  WHERE b.e IS NOT NULL
        |  GROUP BY b.file, b.s, b.e, ev.speaker
        |  HAVING SUM(ev.d) > 0)
        |SELECT file, s AS start, e AS "end",
        |  array_to_string(list_sort(list(speaker)), ',') AS speakers
        |FROM act GROUP BY file, s, e ORDER BY file, start""".stripMargin)),

    // W1 typed voice-gate — the reference's most quirk-laden branch
    // (utils.py:82-99): capped merge accumulating the member `types`
    // array, then the must_include_voice gate dropping sessions with no
    // voice member. Both gate settings emitted under a tag; the oracle
    // folds the same recursive merge carrying the types string.
    Q("w1_typed_gate",
      (s, dir) => {
        import s.implicits._
        val segs = Tables.eventIntervals(s, dir).select(
          col("user_id").cast("string").as("file"),
          (col("s_us").cast("double") / 1e6d).as("start"),
          (col("e_us").cast("double") / 1e6d).as("end"),
          when(col("event_type").isin("click", "view"), "voice")
            .otherwise(col("event_type")).as("segType"))
          .as[graft.model.TypedSegment]
        def run(gate: Boolean, tag: String) =
          SegmentAlgebra.sessionizeTyped(segs, gap = 3600d, maxDuration = 7200d,
              mustIncludeVoice = gate)
            .toDF()
            .select(lit(tag).as("tag"), col("file"), col("start"), col("end"),
              col("n"), array_join(col("types"), ",").as("types"))
        run(gate = false, "all").unionAll(run(gate = true, "gated"))
          .orderBy(col("tag"), col("file"), col("start"))
      },
      Some("""WITH RECURSIVE i0 AS (SELECT CAST(user_id AS VARCHAR) AS file,
        |  CAST(epoch_us(ts) AS DOUBLE)/1000000.0 AS s,
        |  CAST(epoch_us(ts) + CAST(round(value*1.0E6) AS BIGINT) AS DOUBLE)/1000000.0 AS e,
        |  CASE WHEN event_type IN ('click','view') THEN 'voice' ELSE event_type END AS typ
        |  FROM events),
        |i AS (SELECT file, s, e, typ,
        |  row_number() OVER (PARTITION BY file ORDER BY s, e, typ) AS rn FROM i0),
        |rec AS (
        |  SELECT file, rn, s AS cur_s, e AS cur_e, 1 AS n, 1 AS sess, typ AS typs
        |  FROM i WHERE rn = 1
        |  UNION ALL
        |  SELECT i.file, i.rn,
        |    CASE WHEN i.s - r.cur_e <= 3600.0 AND greatest(r.cur_e, i.e) - r.cur_s <= 7200.0
        |         THEN r.cur_s ELSE i.s END,
        |    CASE WHEN i.s - r.cur_e <= 3600.0 AND greatest(r.cur_e, i.e) - r.cur_s <= 7200.0
        |         THEN greatest(r.cur_e, i.e) ELSE i.e END,
        |    CASE WHEN i.s - r.cur_e <= 3600.0 AND greatest(r.cur_e, i.e) - r.cur_s <= 7200.0
        |         THEN r.n + 1 ELSE 1 END,
        |    CASE WHEN i.s - r.cur_e <= 3600.0 AND greatest(r.cur_e, i.e) - r.cur_s <= 7200.0
        |         THEN r.sess ELSE r.sess + 1 END,
        |    CASE WHEN i.s - r.cur_e <= 3600.0 AND greatest(r.cur_e, i.e) - r.cur_s <= 7200.0
        |         THEN r.typs || ',' || i.typ ELSE i.typ END
        |  FROM rec r JOIN i ON i.file = r.file AND i.rn = r.rn + 1),
        |f AS (SELECT file, sess, cur_s, cur_e, n, typs,
        |    row_number() OVER (PARTITION BY file, sess ORDER BY rn DESC) AS rr FROM rec),
        |sessions AS (SELECT file, cur_s AS start, cur_e AS "end", CAST(n AS INTEGER) AS n,
        |  typs AS types FROM f WHERE rr = 1)
        |SELECT * FROM (
        |  SELECT 'all' AS tag, file, start, "end", n, types FROM sessions
        |  UNION ALL
        |  SELECT 'gated' AS tag, file, start, "end", n, types FROM sessions
        |  WHERE list_contains(string_split(types, ','), 'voice')
        |) t ORDER BY tag, file, start""".stripMargin)),

    // A6+J3+J5 composed — the local→global speaker remap trace
    // (speaker_rematch.py:211-261): longest segment per local speaker
    // (A6 argmax), max-overlap argmax against the global segments (J3),
    // then the broadcast mapping relabels every segment, dropping
    // unmapped locals (J5 inner join). Locals = event_type intervals;
    // globals = the W1 merged chunks with session_id as the global label.
    Q("rematch_remap",
      (s, dir) => {
        val i = Tables.eventIntervals(s, dir)
        val longest = i.withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id"), col("event_type"))
              .orderBy((col("e_us") - col("s_us")).desc, col("event_id"))))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("event_id"),
            col("s_us"), col("e_us"))
        val ch = chunks(s, dir)
          .select(col("user_id"), col("session_id"), col("start_us"), col("end_us"))
        val mapping = SegmentOps.maxOverlapJoin(
            longest, ch, "user_id", "event_type", "session_id",
            "s_us", "e_us", "start_us", "end_us")
          .select(col("l.user_id").as("user_id"),
            col("l.event_type").as("local_speaker"),
            col("r.session_id").as("global_speaker"))
        // no broadcast hint: the mapping scales with #files × #speakers,
        // so let AQE broadcast it only while it is actually small
        i.select(col("user_id"), col("event_id"), col("event_type").as("local_speaker"))
          .join(mapping, Seq("user_id", "local_speaker"))
          .select(col("user_id"), col("event_id"), col("local_speaker"),
            col("global_speaker"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some(s"""WITH $chunksSqlCte,
        |lg AS (SELECT user_id, event_type, event_id, s_us, e_us,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY e_us - s_us DESC, event_id) AS rn FROM i),
        |longest AS (SELECT user_id, event_type, s_us, e_us FROM lg WHERE rn = 1),
        |ov AS (SELECT l.user_id AS user_id, l.event_type AS local_speaker,
        |  ch.session_id AS global_speaker,
        |  least(l.e_us, ch.end_us) - greatest(l.s_us, ch.start_us) AS overlap
        |  FROM longest l JOIN ch ON ch.user_id = l.user_id
        |    AND l.s_us < ch.end_us AND ch.start_us < l.e_us),
        |mr AS (SELECT user_id, local_speaker, global_speaker,
        |  row_number() OVER (PARTITION BY user_id, local_speaker
        |    ORDER BY overlap DESC, global_speaker) AS rn
        |  FROM ov WHERE overlap > 0),
        |mapping AS (SELECT user_id, local_speaker, global_speaker FROM mr WHERE rn = 1)
        |SELECT i.user_id AS user_id, i.event_id AS event_id,
        |  i.event_type AS local_speaker, m.global_speaker AS global_speaker
        |FROM i JOIN mapping m ON m.user_id = i.user_id AND m.local_speaker = i.event_type
        |ORDER BY user_id, event_id""".stripMargin)),

    // The speaker_mapping map artifact itself (speaker_rematch.py:236-261).
    Q("rematch_mapping",
      (s, dir) => {
        val i = Tables.eventIntervals(s, dir)
        val longest = i.withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id"), col("event_type"))
              .orderBy((col("e_us") - col("s_us")).desc, col("event_id"))))
          .filter(col("rn") === 1)
        val ch = chunks(s, dir)
          .select(col("user_id"), col("session_id"), col("start_us"), col("end_us"))
        SegmentOps.maxOverlapJoin(
            longest, ch, "user_id", "event_type", "session_id",
            "s_us", "e_us", "start_us", "end_us")
          .select(col("l.user_id").as("user_id"),
            col("l.event_type").as("local_speaker"),
            col("r.session_id").as("global_speaker"))
          .orderBy(col("user_id"), col("local_speaker"))
      },
      Some(s"""WITH $chunksSqlCte,
        |lg AS (SELECT user_id, event_type, event_id, s_us, e_us,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY e_us - s_us DESC, event_id) AS rn FROM i),
        |longest AS (SELECT user_id, event_type, s_us, e_us FROM lg WHERE rn = 1),
        |ov AS (SELECT l.user_id AS user_id, l.event_type AS local_speaker,
        |  ch.session_id AS global_speaker,
        |  least(l.e_us, ch.end_us) - greatest(l.s_us, ch.start_us) AS overlap
        |  FROM longest l JOIN ch ON ch.user_id = l.user_id
        |    AND l.s_us < ch.end_us AND ch.start_us < l.e_us),
        |mr AS (SELECT user_id, local_speaker, global_speaker,
        |  row_number() OVER (PARTITION BY user_id, local_speaker
        |    ORDER BY overlap DESC, global_speaker) AS rn
        |  FROM ov WHERE overlap > 0)
        |SELECT user_id, local_speaker, global_speaker FROM mr WHERE rn = 1
        |ORDER BY user_id, local_speaker""".stripMargin)),

    // L32 — BLOOM-FILTER SEMI-JOIN PRUNING: build a 1024-bit filter over
    // the BUILDING customers' keys (BloomFilterAgg — bounded state,
    // word-wise-OR partial merge, map-side-combined like a built-in sum),
    // broadcast the one-row bitset, and probe every order with a pure
    // bit-arithmetic test BEFORE any join. At 100 TB this prunes the big
    // side's shuffle down to (matches + false positives); the query
    // reports n_bloom vs n_exact per priority, making the FP overhead
    // measurable. Exactly oracle-checkable because positions are public
    // md5 slices: "bit p set" ≡ "p ∈ build-side position set", so the
    // oracle mirrors the test as a set join — no bitset needed.
    Q("j_bloom_prune",
      (s, dir) => {
        import graft.expr.{BloomFilter, BloomFilterAgg}
        val k = 2; val m = 1024
        val bloomAgg = udaf(new BloomFilterAgg(m))
        val cust = Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val bits = cust
          .select(BloomFilter.positions(col("c_custkey"), k, m).as("ps"))
          .agg(bloomAgg(col("ps")).as("bits"))
        Tables.orders(s, dir)
          .crossJoin(broadcast(bits))
          .withColumn("bloom_pass", BloomFilter.mightContain(col("bits"),
            BloomFilter.positions(col("o_custkey"), k, m)))
          .join(broadcast(cust.withColumn("__hit", lit(1L))),
            col("o_custkey") === col("c_custkey"), "left")
          .groupBy(col("o_orderpriority"))
          .agg(sum(when(col("bloom_pass"), 1L).otherwise(0L)).as("n_bloom"),
            sum(when(col("__hit").isNotNull, 1L).otherwise(0L)).as("n_exact"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""WITH bk AS (SELECT c_custkey AS k FROM customer
        |  WHERE c_mktsegment = 'BUILDING'),
        |bp AS (SELECT DISTINCT
        |    ('0x' || substr(md5(CAST(k AS VARCHAR)), 1 + i.i*8, 8))::BIGINT % 1024 AS p
        |  FROM bk, range(2) i(i)),
        |op AS (SELECT o_orderkey, o_orderpriority, o_custkey,
        |    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1 + i.i*8, 8))::BIGINT % 1024 AS p
        |  FROM orders, range(2) i(i)),
        |p0 AS (SELECT o_orderkey, o_orderpriority, o_custkey,
        |    BOOL_AND(p IN (SELECT p FROM bp)) AS bloom_pass
        |  FROM op GROUP BY 1, 2, 3)
        |SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom,
        |  CAST(SUM(CASE WHEN o_custkey IN (SELECT k FROM bk) THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
        |FROM p0 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // L33 — COUNT-MIN SKETCH heavy hitters (Cormode & Muthukrishnan
    // 2005): a 3×256 counter grid over the full token stream
    // (CmsSketchAgg — fixed 768-long state, element-wise-sum partial
    // merge, so the sketch is a deterministic function of the input
    // multiset regardless of partitioning, unlike Misra–Gries). The
    // exact top-15 tokens then read their estimates from the broadcast
    // grid: est ≥ exact always, equality iff no colliding token. Row
    // hashes are public md5 slices, so the oracle rebuilds each probed
    // cell as COUNT(*) of its (row, position) group — the sketch itself
    // never needs to exist oracle-side.
    Q("sketch_cms_topk",
      (s, dir) => {
        import graft.expr.{CmsSketch, CmsSketchAgg}
        val d = 3; val w = 256
        val cms = udaf(new CmsSketchAgg(d, w))
        val toks = Tables.documents(s, dir)
          .select(explode(TextOps.tokens(col("text"))).as("tok"))
        val grid = toks.select(CmsSketch.cells(col("tok"), d, w).as("cs"))
          .agg(cms(col("cs")).as("grid"))
        toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_count"))
          .orderBy(col("exact_count").desc, col("tok")).limit(15)
          .crossJoin(broadcast(grid))
          .select(col("tok"), col("exact_count"),
            CmsSketch.estimate(col("grid"), CmsSketch.cells(col("tok"), d, w))
              .as("cms_est"))
          .orderBy(col("exact_count").desc, col("tok"))
      },
      Some(s"""WITH $toksSqlCte,
        |t AS (SELECT unnest(toks) AS tok FROM d),
        |cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_count FROM t GROUP BY tok),
        |cells AS (SELECT r.r AS r,
        |    ('0x' || substr(md5(tok), 1 + r.r*8, 8))::BIGINT % 256 AS p,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM t, range(3) r(r) GROUP BY 1, 2),
        |top AS (SELECT tok, exact_count FROM cnt
        |  ORDER BY exact_count DESC, tok LIMIT 15)
        |SELECT top.tok AS tok, top.exact_count AS exact_count, MIN(c.c) AS cms_est
        |FROM top JOIN cells c
        |  ON c.p = ('0x' || substr(md5(top.tok), 1 + c.r*8, 8))::BIGINT % 256
        |GROUP BY 1, 2
        |ORDER BY exact_count DESC, tok""".stripMargin)),

    // L34 — GOPHER QUALITY GATES (Rae et al. 2021 A1.1): the canonical
    // rule suite (word-count bounds, mean word length, symbol ratio,
    // alpha-word fraction, stop-word floor). Gate booleans decided in
    // exact integer arithmetic; ratios reported as single divisions.
    // Pure per-row expressions — the whole filter is one codegen'd map.
    Q("c_gopher_gates",
      (s, dir) => Curation.gopherGates(
          Tables.documents(s, dir), "doc_id", "text",
          minWords = 50L, maxWords = 100000L)
        .orderBy(col("doc_id")),
      Some("""WITH d AS (SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), x -> x != '') AS toks FROM documents),
        |c AS (SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS sum_word_len,
        |    CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
        |    CAST(len(list_filter(toks, t -> t IN ('the','be','to','of','and','that','have','with'))) AS BIGINT) AS n_stop,
        |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
        |    CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS n_ellipsis
        |  FROM d)
        |SELECT doc_id, n_words, sum_word_len, n_alpha_words, n_stop, n_hash, n_ellipsis,
        |  CAST(sum_word_len AS DOUBLE)/CAST(n_words AS DOUBLE) AS mean_word_len,
        |  CAST(n_alpha_words AS DOUBLE)/CAST(n_words AS DOUBLE) AS alpha_frac,
        |  CAST(n_hash + n_ellipsis AS DOUBLE)/CAST(n_words AS DOUBLE) AS symbol_ratio,
        |  n_words >= 50 AND n_words <= 100000 AS pass_word_count,
        |  sum_word_len >= 3*n_words AND sum_word_len <= 10*n_words AS pass_mean_len,
        |  5*n_alpha_words >= 4*n_words AS pass_alpha,
        |  10*(n_hash + n_ellipsis) <= n_words AS pass_symbol,
        |  n_stop >= 2 AS pass_stop,
        |  (n_words >= 50 AND n_words <= 100000)
        |    AND (sum_word_len >= 3*n_words AND sum_word_len <= 10*n_words)
        |    AND (5*n_alpha_words >= 4*n_words)
        |    AND (10*(n_hash + n_ellipsis) <= n_words)
        |    AND (n_stop >= 2) AS pass
        |FROM c ORDER BY doc_id""".stripMargin)),

    // L42 — TABLE PROFILER (the ANALYZE pass): per column of documents,
    // row/null counts, exact ndv, string-form min/max, and the KMV ndv
    // ESTIMATE side by side — one single-pass partial+final aggregation
    // for ALL columns, unpivoted to a row per column. The oracle unrolls
    // the same stats per column and the same public-md5 KMV order
    // statistic.
    Q("c_table_profile",
      (s, dir) => Curation.profileTable(
          Tables.documents(s, dir),
          Seq("doc_id", "lang", "n_chars", "source", "text"), kmvK = 16)
        .orderBy(col("column")),
      Some {
        val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
        val blocks = cols.map { c =>
          s"""(SELECT '$c' AS "column",
             |  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_rows,
             |  (SELECT CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM documents) AS n_nulls,
             |  (SELECT CAST(COUNT(DISTINCT $c) AS BIGINT) FROM documents) AS ndv_exact,
             |  (SELECT MIN(CAST($c AS VARCHAR)) FROM documents) AS min_str,
             |  (SELECT MAX(CAST($c AS VARCHAR)) FROM documents) AS max_str,
             |  (SELECT CASE WHEN MAX(CASE WHEN rn = 16 THEN hv END) IS NULL
             |     THEN CAST(COUNT(*) AS DOUBLE)
             |     ELSE 15.0 * 1152921504606846976.0
             |       / CAST(MAX(CASE WHEN rn = 16 THEN hv END) AS DOUBLE) END
             |   FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM (
             |     SELECT DISTINCT CAST(('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
             |     FROM documents WHERE $c IS NOT NULL) h) r
             |   WHERE rn <= 16) AS ndv_kmv_est)""".stripMargin
        }
        blocks.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
      }),

    // L41 / O-series — per-group top-k as a BOUNDED-STATE partial-merge
    // aggregate (TopKAgg): at most k (value, id) pairs per group per map
    // partition reach the shuffle, vs the window formulation shipping
    // and sorting EVERY row of every group. Per-group analog of Spark's
    // global TakeOrderedAndProject, which has no built-in. The window
    // formulation is the oracle — identical output by construction.
    Q("o_topk_agg",
      (s, dir) => {
        val topk = udaf(new graft.expr.TopKAgg(5))
        Tables.eventIntervals(s, dir)
          .groupBy(col("event_type"))
          .agg(topk(col("cents"), col("event_id")).as("tk"))
          .select(col("event_type"), posexplode(col("tk")))
          .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"),
            col("col.id").as("event_id"), col("col.value").as("cents"))
          .orderBy(col("event_type"), col("rank"))
      },
      Some(s"""WITH $evPointsSqlCte,
        |r AS (SELECT event_type, event_id, cents,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents DESC, event_id) AS BIGINT) AS rank
        |  FROM e)
        |SELECT event_type, rank, event_id, cents
        |FROM r WHERE rank <= 5 ORDER BY event_type, rank""".stripMargin)),

    // L38 — per-doc TF-IDF keywords, integer-exact: rank tokens by the
    // log-free monotone surrogate tf/df (score = tf·10⁹ div df — one
    // exact integer division, bit-stable ranks cross-engine), top 3 per
    // doc. One tf agg + one df agg + a token equi join + per-doc window.
    Q("t_tfidf_topk",
      (s, dir) => TextOps.tfidfTopK(Tables.documents(s, dir), "doc_id", "text", 3)
        .orderBy(col("doc_id"), col("rank")),
      Some(s"""WITH $toksSqlCte,
        |t AS (SELECT doc_id, unnest(toks) AS tok FROM d),
        |tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
        |dfq AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM t GROUP BY 1),
        |sc AS (SELECT tf.doc_id, tf.tok, tf.tf, dfq.df,
        |    (tf.tf * 1000000000) // dfq.df AS score
        |  FROM tf JOIN dfq ON dfq.tok = tf.tok),
        |r AS (SELECT doc_id, tok, tf, df, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, tok) AS BIGINT) AS rank
        |  FROM sc)
        |SELECT doc_id, rank, tok, tf, df, CAST(score AS BIGINT) AS score
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // L39 — nearest-centroid classification: per-label centroid = exact
    // integer SUM of quantized vectors (cosine is scale-invariant, so
    // the unnormalized sum is the mean direction — no division, no
    // float drift); broadcast 10 centroids, fused-dot argmax per vector.
    Q("sim_centroid_classify",
      (s, dir) => Similarity.centroidClassify(
          Tables.embeddings(s, dir), "vec_id", "embedding", "label", dim = 64)
        .orderBy(col("vec_id")),
      Some(s"""WITH $quantSqlCte,
        |cx AS (SELECT e.label AS c_label, u.i AS i,
        |    CAST(SUM(q.qv[CAST(u.i AS INTEGER)]) AS BIGINT) AS s
        |  FROM q JOIN embeddings e ON e.vec_id = q.vec_id, range(1,65) u(i)
        |  GROUP BY 1, 2),
        |cent AS (SELECT c_label, list(s ORDER BY i) AS cv FROM cx GROUP BY c_label),
        |cn AS (SELECT c_label,
        |    sqrt(CAST(CAST(list_sum(list_transform(cv, x -> x*x)) AS BIGINT) AS DOUBLE)) AS cnorm
        |  FROM cent),
        |sc AS (SELECT q.vec_id, e.label, c.c_label,
        |    CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*c.cv[i])) AS BIGINT) AS DOUBLE)
        |      / n.cnorm AS score
        |  FROM q JOIN embeddings e ON e.vec_id = q.vec_id
        |  CROSS JOIN cent c JOIN cn n ON n.c_label = c.c_label),
        |r AS (SELECT vec_id, label, c_label,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, c_label) AS rn
        |  FROM sc)
        |SELECT vec_id, label, c_label AS pred_label, label = c_label AS correct
        |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin)),

    // L36 — cross-source OVERLAP MATRIX: distinct shared shingles +
    // shingle-set Jaccard for every source pair — the contamination /
    // redundancy audit before mixing sources into a training blend. The
    // (source, shingle) distinct collapses document frequency before the
    // self-join, so hot shingles cost |sources|² rows, never df².
    Q("c_source_overlap",
      (s, dir) => Curation.sourceOverlap(
          Tables.documents(s, dir), "source", "text", shingleN = 3)
        .orderBy(col("source_a"), col("source_b")),
      Some(s"""WITH ds AS (SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x != '') AS toks FROM documents),
        |tt AS (SELECT doc_id, source, unnest(toks) AS tok,
        |    unnest(range(len(toks))) AS i FROM ds),
        |s0 AS (SELECT source, tok || ' ' || lead(tok,1) OVER w || ' ' || lead(tok,2) OVER w AS shingle
        |  FROM tt WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
        |ss AS (SELECT DISTINCT source, shingle FROM s0 WHERE shingle IS NOT NULL),
        |n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh FROM ss GROUP BY source),
        |p AS (SELECT a.source AS source_a, b.source AS source_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_shared
        |  FROM ss a JOIN ss b ON a.shingle = b.shingle AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT p.source_a, p.source_b, na.n_sh AS n_a, nb.n_sh AS n_b, p.n_shared,
        |  CAST(p.n_shared AS DOUBLE) / CAST(na.n_sh + nb.n_sh - p.n_shared AS DOUBLE) AS jaccard
        |FROM p JOIN n na ON na.source = p.source_a JOIN n nb ON nb.source = p.source_b
        |ORDER BY p.source_a, p.source_b""".stripMargin)),

    // L123 — SKETCHED SOURCE-OVERLAP MATRIX: the exact L36 join above
    // reduced to bounded KMV sketches per source (k=16, ≤16 longs of
    // state, map-side-combined) — pairwise union/Jaccard/intersection
    // estimates from the tiny sketch table alone; the corpus is
    // touched once however many sources exist. Same public-md5 hash
    // convention as L31, so the approximate sketch replays exactly.
    Q("c_overlap_sketch",
      (s, dir) => Curation.sourceOverlapSketch(
          Tables.documents(s, dir), "source", "text", shingleN = 3, k = 16)
        .orderBy(col("source_a"), col("source_b")),
      Some("""WITH ds AS (SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x != '') AS toks FROM documents),
        |tt AS (SELECT doc_id, source, unnest(toks) AS tok,
        |    unnest(range(len(toks))) AS i FROM ds),
        |s0 AS (SELECT source, tok || ' ' || lead(tok,1) OVER w || ' ' || lead(tok,2) OVER w AS shingle
        |  FROM tt WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
        |sh AS (SELECT DISTINCT source, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS hv
        |  FROM s0 WHERE shingle IS NOT NULL),
        |r AS (SELECT source, hv, row_number() OVER (PARTITION BY source ORDER BY hv) AS rn FROM sh),
        |sk AS (SELECT source, list(hv ORDER BY hv) AS sk FROM r WHERE rn <= 16 GROUP BY source),
        |p AS (SELECT a.source AS source_a, b.source AS source_b, a.sk AS ska, b.sk AS skb
        |  FROM sk a JOIN sk b ON a.source < b.source),
        |uu AS (SELECT source_a, source_b, ska, skb,
        |  list_sort(list_distinct(ska || skb))[1:16] AS u FROM p),
        |m AS (SELECT source_a, source_b,
        |  CAST(len(u) AS BIGINT) AS k_union,
        |  CAST(len(list_filter(u, h -> list_contains(ska, h) AND list_contains(skb, h))) AS BIGINT) AS n_common,
        |  len(u) < 16 AS union_exact,
        |  u[16] AS kth FROM uu)
        |SELECT source_a, source_b, k_union, n_common, union_exact,
        |  CAST(n_common AS DOUBLE) / CAST(k_union AS DOUBLE) AS j_est,
        |  CASE WHEN union_exact THEN CAST(k_union AS DOUBLE)
        |       ELSE (15.0 * 1152921504606846976.0) / CAST(kth AS DOUBLE) END AS union_est,
        |  (CAST(n_common AS DOUBLE) / CAST(k_union AS DOUBLE)) *
        |  (CASE WHEN union_exact THEN CAST(k_union AS DOUBLE)
        |        ELSE (15.0 * 1152921504606846976.0) / CAST(kth AS DOUBLE) END) AS inter_est
        |FROM m ORDER BY source_a, source_b""".stripMargin)),

    // L37 — per-source VOCABULARY stats: token count, vocabulary size,
    // type-token ratio. Two-level hash agg; TTR one exact division.
    Q("c_vocab_stats",
      (s, dir) => Curation.vocabStats(Tables.documents(s, dir), "source", "text")
        .orderBy(col("source")),
      Some(s"""WITH $toksSqlCte,
        |src AS (SELECT d.doc_id, dd.source, d.toks FROM d
        |  JOIN documents dd ON dd.doc_id = d.doc_id),
        |t AS (SELECT source, unnest(toks) AS tok FROM src)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types,
        |  CAST(COUNT(DISTINCT tok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS type_token_ratio
        |FROM t GROUP BY source ORDER BY source""".stripMargin)),

    // L35 — SemDeDup (Abbas et al. 2023): semantic dedup = embedding
    // near-dup pairs from IVF cells (broadcast centroids, same-cell
    // candidates — Σ|cell|², never n²) → connected components
    // (large/small-star, O(log² n) rounds) → keep the component-minimum
    // vector. The oracle replays the identical cell assignment and
    // verification, then computes min-reachable-id with a recursive CTE.
    Q("dedup_semdedup",
      (s, dir) => {
        val pairs = sessionIvfPairs(s, dir).select(col("a"), col("b"))
        val cc = Dedup.connectedComponents(pairs, "a", "b")
          .withColumnRenamed("id", "vec_id")
        val lbl = Tables.embeddings(s, dir).select(col("vec_id"))
          .join(cc, Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("component"), col("vec_id")).as("component"))
        val sizes = lbl.groupBy(col("component"))
          .agg(count(lit(1)).as("cluster_size"))
        lbl.join(sizes, "component")
          .select(col("vec_id"), col("component"), col("cluster_size"),
            (col("vec_id") === col("component")).as("kept"))
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH RECURSIVE $quantSqlCte,
        |seeds AS (SELECT vec_id AS seed_id, qv AS sv,
        |  sqrt(CAST(CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS DOUBLE)) AS snorm
        |  FROM q WHERE vec_id < 16),
        |scored AS (SELECT q.vec_id, s.seed_id,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*s.sv[i])) AS BIGINT) AS DOUBLE)
        |    / s.snorm AS score
        |  FROM q CROSS JOIN seeds s),
        |cells AS (SELECT vec_id, seed_id AS cell FROM (
        |  SELECT vec_id, seed_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY score DESC, seed_id) AS rn FROM scored) t WHERE rn = 1),
        |cand AS (SELECT x.vec_id AS a, y.vec_id AS b FROM cells x
        |  JOIN cells y ON x.cell = y.cell AND x.vec_id < y.vec_id),
        |vd AS (SELECT c.a, c.b,
        |  CAST(list_sum(list_transform(range(1,65), i -> qa.qv[i]*qb.qv[i])) AS BIGINT) AS dot
        |  FROM cand c JOIN q qa ON qa.vec_id = c.a JOIN q qb ON qb.vec_id = c.b),
        |jp AS (SELECT a, b FROM (SELECT a, b,
        |  CAST(dot AS DOUBLE)/(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |  FROM vd JOIN nm na ON na.vec_id = a JOIN nm nb ON nb.vec_id = b) t
        |  WHERE cos >= 0.45),
        |e AS (SELECT a AS u, b AS v FROM jp UNION SELECT b AS u, a AS v FROM jp),
        |cc AS (
        |  SELECT vec_id AS id, vec_id AS r FROM embeddings
        |  UNION
        |  SELECT cc.id, e.v FROM cc JOIN e ON e.u = cc.r),
        |lbl AS (SELECT id AS vec_id, MIN(r) AS component FROM cc GROUP BY id),
        |sz AS (SELECT component, COUNT(*) AS cluster_size FROM lbl GROUP BY component)
        |SELECT l.vec_id, l.component, s.cluster_size,
        |  l.vec_id = l.component AS kept
        |FROM lbl l JOIN sz s ON s.component = l.component
        |ORDER BY l.vec_id""".stripMargin)),

    // L43 — DSIR importance scoring (Xie et al. 2023): rank raw docs by
    // target-likeness over hashed bigram features. Target = the English
    // slice; the log-likelihood-ratio weight is replaced by the
    // integer-exact cross-multiplied surrogate (same per-feature sign),
    // so the oracle reproduces every score bit-for-bit. Bucket tables
    // are fixed-width (4096) regardless of corpus size — both
    // broadcast; the corpus side is two hash aggs, no wide shuffle.
    Q("c_dsir_score",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Curation.dsirScores(docs, docs.filter(col("lang") === "en"),
            "doc_id", "text", buckets = 4096, shingleN = 2)
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), x -> x != '') AS toks FROM documents),
        |tt AS (SELECT doc_id, lang, unnest(toks) AS tok,
        |    unnest(range(len(toks))) AS i FROM d),
        |g0 AS (SELECT doc_id, lang, tok || ' ' || lead(tok, 1)
        |    OVER (PARTITION BY doc_id ORDER BY i) AS g FROM tt),
        |f AS (SELECT doc_id, lang,
        |    ('0x' || substr(md5(g), 1, 8))::BIGINT % 4096 AS bucket
        |  FROM g0 WHERE g IS NOT NULL),
        |tc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct FROM f
        |  WHERE lang = 'en' GROUP BY 1),
        |rc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr FROM f GROUP BY 1),
        |tn AS (SELECT CAST(SUM(ct) AS BIGINT) AS n_tgt FROM tc),
        |rn AS (SELECT CAST(SUM(cr) AS BIGINT) AS n_raw FROM rc),
        |tf AS (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM f GROUP BY 1, 2),
        |sc AS (SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_feats,
        |    CAST(SUM(tf.tf * (COALESCE(tc.ct, 0) * rn.n_raw
        |      - rc.cr * tn.n_tgt)) AS BIGINT) AS score
        |  FROM tf JOIN rc USING (bucket) LEFT JOIN tc USING (bucket)
        |  CROSS JOIN tn CROSS JOIN rn
        |  GROUP BY 1)
        |SELECT doc_id, n_feats, score, score > 0 AS keep
        |FROM sc ORDER BY doc_id""".stripMargin)),

    // L44 — n-gram NOVELTY: the fraction of a doc's distinct 3-gram
    // shingles appearing in no other document — the inverse boilerplate
    // signal. df collapses on the distinct (doc, shingle) table; one
    // shingle-keyed hash agg + join back + per-doc agg.
    Q("c_novelty",
      (s, dir) => Curation.noveltyStats(
          Tables.documents(s, dir), "doc_id", "text", shingleN = 3)
        .orderBy(col("doc_id")),
      Some(s"""WITH $shingleSqlCte,
        |dfc AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM sd GROUP BY 1)
        |SELECT sd.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        |  CAST(SUM(CASE WHEN dfc.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  CAST(SUM(CASE WHEN dfc.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS novel_frac
        |FROM sd JOIN dfc USING (shingle)
        |GROUP BY sd.doc_id ORDER BY sd.doc_id""".stripMargin)),

    // L45 — LOG-HISTOGRAM QUANTILE SKETCH (the DDSketch shape, Masson
    // et al. 2019): per-language p50/p90/p99 of document length from a
    // bounded ~0.5k-counter histogram — per-value aggregation state
    // never exists, vs q_quantiles' one counter per distinct value.
    // Bucketing is integer-exact (bit-length octaves + power-of-two
    // sub-buckets, never float log), the state is CmsSketchAgg with an
    // identity "hash" on the bounded bucket space, and the merge is
    // element-wise sum — so this approximate sketch is a deterministic
    // function of the input multiset and the oracle replays it exactly.
    Q("sketch_log_quantiles",
      (s, dir) => Curation.logQuantiles(
        Tables.documents(s, dir), "lang", "n_chars",
        Seq((50, 1L, 2L), (90, 9L, 10L), (99, 99L, 100L))),
      Some("""WITH x AS (SELECT lang, greatest(n_chars, 1) AS v FROM documents),
        |b AS (SELECT lang, CAST(length(format('{:b}', v)) - 1 AS INTEGER) AS k, v FROM x),
        |bb AS (SELECT lang, CAST(k*8
        |    + ((v - (1::BIGINT << k))*8) // (1::BIGINT << k) AS INTEGER) AS bkt FROM b),
        |g AS (SELECT lang, bkt, CAST(COUNT(*) AS BIGINT) AS cnt FROM bb GROUP BY 1, 2),
        |nn AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n FROM g GROUP BY 1),
        |c AS (SELECT lang, bkt, CAST(SUM(cnt) OVER (PARTITION BY lang
        |    ORDER BY bkt) AS BIGINT) AS cum FROM g),
        |s(q_pct, qn, qd) AS (VALUES (50, 1::BIGINT, 2::BIGINT),
        |  (90, 9::BIGINT, 10::BIGINT), (99, 99::BIGINT, 100::BIGINT)),
        |r AS (SELECT c.lang, s.q_pct, nn.n,
        |    (nn.n*s.qn + s.qd - 1) // s.qd AS rank, MIN(c.bkt) AS bkt
        |  FROM c JOIN nn USING (lang)
        |  JOIN s ON c.cum >= (nn.n*s.qn + s.qd - 1) // s.qd
        |  GROUP BY 1, 2, 3, 4)
        |SELECT lang, q_pct, n, rank, bkt,
        |  (8 + bkt % 8) * (1::BIGINT << (bkt // 8)) AS rep8
        |FROM r ORDER BY lang, q_pct""".stripMargin)),

    // L46 — SCALAR-QUANTIZED ANN with asymmetric distance (the FAISS SQ
    // shape): corpus compressed to 4-bit-per-dim codes (32 bytes per
    // 64-dim vector vs 256), queries score full-precision against the
    // codes' integral reconstruction via the fused dot — approximate
    // ranks that are exact longs, bit-stable cross-engine. Per-query
    // top-k through the bounded-state TopKAgg, never a full sort.
    Q("sim_sq_adc_topk",
      (s, dir) => {
        val q = Similarity.quantize(Tables.embeddings(s, dir), "vec_id", "embedding")
        Similarity.sqAdcTopK(q.filter(col("vec_id") < 8), q, "vec_id", 10)
      },
      Some(sqAdcOracleSql)),

    // L55 — the SAME SQ-ADC scores from the COMPRESSED scan: codes
    // nibble-packed 16 per long (4 longs per 64-dim vector — the true
    // 4-bit footprint), per-query reconstruction·query products folded
    // into a 16·dim lookup table, and the inner loop is the native
    // PackedAdcSum codegen expression (FAISS's ADC table-lookup scan as
    // a Catalyst Expression). Bit-identical rows to sim_sq_adc_topk —
    // two independent plans, one oracle.
    Q("sim_sq_packed_topk",
      (s, dir) => {
        val q = Similarity.quantize(Tables.embeddings(s, dir), "vec_id", "embedding")
        Similarity.sqAdcPackedTopK(q.filter(col("vec_id") < 8), q, "vec_id", 10)
      },
      Some(sqAdcOracleSql)),

    // L47 — PER-DOMAIN CAP (RefinedWeb-style domain balancing): the
    // corpus has no URL column, so one is derived deterministically
    // from doc_id (md5-slice host + tld, mirrored verbatim in the
    // oracle — the PII-scrub posture), then host extraction is Spark's
    // native parse_url, blocklisted hosts drop via broadcast anti join,
    // and each host keeps its best 5 docs through the bounded-state
    // TopKAgg — giant hosts ship 5 rows per map partition, not all.
    Q("c_domain_cap",
      (s, dir) => {
        val md = md5(col("doc_id").cast("string"))
        val docs = Tables.documents(s, dir).withColumn("url",
          concat(lit("https://h"),
            pmod(conv(substring(md, 1, 6), 16, 10).cast("long"), lit(37L)),
            lit(".example."),
            element_at(array(lit("com"), lit("org"), lit("net")),
              (pmod(conv(substring(md, 7, 6), 16, 10).cast("long"), lit(3L)) + 1L)
                .cast("int")),
            lit("/p/"), col("doc_id")))
        Curation.domainCap(docs, "doc_id", "url", "n_chars",
          cap = 5, blocked = Seq("h3.example.com", "h17.example.org"))
      },
      Some("""WITH u AS (SELECT doc_id, n_chars,
        |    'h' || CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 37 AS VARCHAR)
        |      || '.example.'
        |      || ['com','org','net'][CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 7, 6))::BIGINT % 3 AS INTEGER) + 1]
        |      AS host
        |  FROM documents),
        |f AS (SELECT * FROM u
        |  WHERE host NOT IN ('h3.example.com', 'h17.example.org')),
        |g AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_host FROM f GROUP BY 1),
        |r AS (SELECT host, doc_id, n_chars,
        |    CAST(row_number() OVER (PARTITION BY host
        |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
        |  FROM f)
        |SELECT r.host, g.n_host, r.rank, r.doc_id, r.n_chars
        |FROM r JOIN g USING (host)
        |WHERE rank <= 5 ORDER BY host, rank""".stripMargin)),

    // L48 — TIME-DECAYED COUNTS (half-life = 1 day): the recency
    // weighting behind "trending" rankings, exactly: per-row weight is
    // the integer 2^(day − minDay) (a shift, never float pow), one
    // map-side-combined sum per event_type, one final division by
    // 2^(maxDay − minDay). The checked columns stay integral; the one
    // double is a single division, bit-stable cross-engine.
    Q("c_decayed_counts",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        Curation.decayedCounts(
          ev.select(col("event_type"), Tables.tsUs(ev).as("tus")),
          "event_type", "tus", bucketUs = 86400000000L)
      },
      Some(decayedOracleSql)),

    // L56 — the DECAYED COUNTS AS A STREAMING AGGREGATE: the integer
    // shift weights sum in streaming aggregation state across
    // maxFilesPerTrigger=1 micro-batches (complete mode, AvailableNow).
    // The decay reference window (min/max bucket) is fixed upfront from
    // the batch table — in production the trailing window is config,
    // not data — and the weighted count is a SUM, so the streamed state
    // is bit-identical to batch whatever the file split: the batch SQL
    // oracles a streaming trending rollup exactly.
    Q("streaming_decayed",
      (s, dir) => withStreamingPartitions(s) {
        val bucket = 86400000000L
        val path = s"$dir/events.parquet"
        val base = s.read.parquet(path)
        val dayCol = expr(s"(tus - pmod(tus, ${bucket}L)) div ${bucket}L")
        val bounds = base.select(Tables.tsUs(base).as("tus"))
          .agg(min(dayCol).cast("long"), max(dayCol).cast("long")).head()
        val (dmin, dmax) = (bounds.getLong(0), bounds.getLong(1))
        val name = "dk_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_dk").toString
        val srcDir = stagedStreamSource("events_link", dir)(p =>
          linkInto(p, path, "events.parquet"))
        val rawStream = s.readStream.schema(base.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
        val agg = rawStream
          .select(col("event_type"), Tables.tsUs(rawStream).as("tus"))
          .select(col("event_type"),
            call_function("shiftleft", lit(1L), (dayCol - lit(dmin)).cast("int"))
              .as("__w"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("__w")).as("decayed_num"))
        val q = agg.writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt)) // srcDir is shared, JVM-exit cleaned
        s.table(name)
          .select(col("event_type"), col("n"), col("decayed_num"),
            lit(dmax - dmin).as("scale"),
            (col("decayed_num").cast("double") /
              call_function("shiftleft", lit(1L), lit((dmax - dmin).toInt))
                .cast("double")).as("decayed"))
          .orderBy(col("event_type"))
      },
      Some(decayedOracleSql)),

    // L49 — deterministic BOTTOM-K-BY-HASH per-group sample: fixed-size
    // uniform sample per language, mergeable across shards/batches (the
    // union's bottom-k is the bottom-k of the parts), bounded-state via
    // TopKAgg on the negated 60-bit md5 prefix — no per-group sort of
    // the full corpus, the one-pass sampling shape for 100 TB.
    Q("c_bottomk_sample",
      (s, dir) => Curation.bottomKSample(
        Tables.documents(s, dir), "lang", "doc_id", 10),
      Some("""WITH h AS (SELECT lang, doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents),
        |r AS (SELECT lang, doc_id, h,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY h, doc_id) AS BIGINT) AS rank FROM h)
        |SELECT lang, rank, doc_id, h FROM r WHERE rank <= 10
        |ORDER BY lang, rank""".stripMargin)),

    // L57 — Z-ORDER DATA LAYOUT + MIN-MAX FILE SKIPPING (Delta OPTIMIZE
    // ZORDER / Iceberg sort-order analog): events clustered by the
    // bit-interleaved (user_id, event-time) key so per-file min/max
    // envelopes are tight in BOTH dimensions and a range predicate on
    // either column prunes most files. All-integer bucket + interleave
    // math, mirrored term-for-term in the oracle; the result is the
    // per-file stats manifest a skipping scan consults. OpsSpec asserts
    // the actual pruning win over a linear time-sorted layout.
    Q("c_zorder_layout",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        Curation.zorderLayout(
          ev.select(col("user_id"), Tables.tsUs(ev).as("tus"), col("event_id")),
          "user_id", "tus", "event_id", bits = 12, rowsPerFile = 4096)
      },
      Some(zorderOracleSql(bits = 12, rowsPerFile = 4096))),

    // L58 — CONTEXT-WINDOW CHUNKING: long documents split into
    // overlapping 32-token windows advancing by 24 (8-token overlap) —
    // the complement of c_pack_sequences' packing, together the standard
    // sequence prep for a fixed training context; same shape as RAG
    // passage chunking. Array-local explode + slice, NO shuffle at any
    // scale; chunk-count formula and 1-based slice mirrored exactly.
    Q("t_chunk_windows",
      (s, dir) => TextOps.chunkWindows(
        Tables.documents(s, dir), "doc_id", "text",
        maxTokens = 32, stride = 24),
      Some(s"""WITH $toksSqlCte,
        |t AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
        |  FROM d WHERE len(toks) > 0),
        |c AS (SELECT doc_id, toks,
        |    1 + CASE WHEN n > 32 THEN (n - 32 + 23) // 24 ELSE 0 END AS nc
        |  FROM t),
        |x AS (SELECT doc_id, toks, unnest(range(0, nc)) AS chunk_id FROM c),
        |sl AS (SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |    toks[chunk_id * 24 + 1 : chunk_id * 24 + 32] AS ct FROM x)
        |SELECT doc_id, chunk_id, CAST(len(ct) AS BIGINT) AS n_tokens,
        |  array_to_string(ct, ' ') AS chunk_text
        |FROM sl ORDER BY doc_id, chunk_id""".stripMargin)),

    // L59 — SPACE-SAVING HEAVY HITTERS (Metwally et al. 2005): per-lang
    // top tokens under HARD-BOUNDED state — at most 64 counters per
    // group per map partition, whatever the distinct-key count, vs one
    // counter per distinct key for exact groupBy.count (the state that
    // IS the job at 100 TB vocabularies). This corpus's vocab fits the
    // capacity, so no eviction fires, the summary is a union-sum lattice
    // (est = exact count, err = 0, partitioning-invariant) and the exact
    // SQL oracles the whole reduce/merge/finish path; the eviction
    // regime's guarantee bounds are SketchProps laws.
    Q("hh_space_saving",
      (s, dir) => {
        val ss = udaf(new graft.expr.SpaceSavingAgg(64, 10),
          org.apache.spark.sql.Encoders.STRING)
        Tables.documents(s, dir)
          .select(col("lang"), explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy(col("lang")).agg(ss(col("tok")).as("hh"))
          .select(col("lang"), posexplode(col("hh")))
          .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
            col("col.key").as("tok"), col("col.est").as("est"),
            col("col.err").as("err"))
          .orderBy(col("lang"), col("rank"))
      },
      Some(hhOracleSql)),

    // L59 (streaming flavor) — the same bounded-state summary in
    // STREAMING aggregation state across maxFilesPerTrigger=1
    // micro-batches: within capacity the summary is a lattice, so the
    // streamed state is bit-identical to batch whatever the file split —
    // the same exact SQL checks both flavors.
    Q("streaming_hh",
      (s, dir) => withStreamingPartitions(s) {
        val base = Tables.documents(s, dir)
        val name = "hh_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_hh").toString
        val srcDir = stagedStreamSource("docs_r2", dir)(p =>
          base.repartition(2).write.mode("overwrite").parquet(p.toString))
        val ss = udaf(new graft.expr.SpaceSavingAgg(64, 10),
          org.apache.spark.sql.Encoders.STRING)
        val agg = s.readStream.schema(base.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
          .select(col("lang"), explode(TextOps.tokens(col("text"))).as("tok"))
          .groupBy(col("lang")).agg(ss(col("tok")).as("hh"))
        val q = agg.writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt)) // srcDir is shared, JVM-exit cleaned
        s.table(name)
          .select(col("lang"), posexplode(col("hh")))
          .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
            col("col.key").as("tok"), col("col.est").as("est"),
            col("col.err").as("err"))
          .orderBy(col("lang"), col("rank"))
      },
      Some(hhOracleSql)),

    // L60 — LEAKAGE-SAFE TRAIN/VAL/TEST SPLIT: split by NEAR-DUP
    // COMPONENT, never by document, so no near-dup pair straddles the
    // split boundary and eval never scores memorization. Components over
    // the same banded MinHash pair graph as dedup_components (shared
    // oracle CTEs), then a deterministic 60-bit md5 hash of the
    // COMPONENT id into 10 buckets: 0-7 train, 8 val, 9 test — a pure
    // function of content, reproducible across runs and shards.
    Q("c_split_leakage_safe",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Curation.leakageSafeSplit(docs, sessionMinhashPairs(s, dir), "doc_id",
          nBuckets = 10, trainHi = 8, valHi = 9,
          ccLabels = Some(sessionCcLabels(s, dir)))
      },
      Some(s"""WITH RECURSIVE $nearDupCcSqlCtes,
        |hb AS (SELECT doc_id, component,
        |    ('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 15))::BIGINT % 10 AS bucket
        |  FROM lbl)
        |SELECT doc_id, component, bucket,
        |  CASE WHEN bucket < 8 THEN 'train' WHEN bucket < 9 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM hb ORDER BY doc_id""".stripMargin)),

    // L61 — PRODUCT-QUANTIZATION ADC top-k (Jégou 2011): the compression
    // rung between SQ (one code per dimension, sim_sq_adc_topk) and full
    // vectors — 8 subspaces × 16-entry codebooks = 8 small codes per
    // vector (32× memory cut), queries full-precision (asymmetric ADC).
    // Codebooks are the subvectors of 16 fixed seed rows so the oracle
    // mirrors training relationally (at 100 TB: per-subspace k-means,
    // encode/ADC unchanged); codebook broadcasts, encode is a map-side
    // argmin partial agg, scores are exact longs via the fused dot.
    Q("sim_pq_adc_topk",
      (s, dir) => {
        val q = Similarity.quantize(Tables.embeddings(s, dir), "vec_id", "embedding")
        Similarity.pqAdcTopK(q.filter(col("vec_id") < 8), q, "vec_id", 10)
      },
      Some(s"""WITH $quantSqlCte,
        |$pqReconSqlCtes,
        |sc AS (SELECT qq.vec_id AS query_id, r.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> qq.qv[i] * r.recon[i])) AS BIGINT) AS score_pq
        |  FROM rec r JOIN q qq ON qq.vec_id < 8 AND r.vec_id <> qq.vec_id),
        |rk AS (SELECT query_id, neighbor_id, score_pq,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score_pq DESC, neighbor_id) AS BIGINT) AS rnk FROM sc)
        |SELECT query_id, rnk, neighbor_id, score_pq
        |FROM rk WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin)),

    // L62 — IVF-PQ ANN top-k, the full FAISS IndexIVFPQ composition:
    // the coarse quantizer routes each query to its 4 nearest of 16
    // inverted lists (candidates ~4/16 of the corpus) and scoring inside
    // the probed lists runs over PQ reconstructions (8 codes per vector,
    // not 64 floats) — cells bound WHO is scored, PQ bounds what a score
    // COSTS. Both quantizers broadcast; candidates are an equi join on
    // the cell id; exact-long ADC scores; bounded-state top-k.
    Q("sim_ivfpq_topk",
      (s, dir) => {
        val q = Similarity.quantize(Tables.embeddings(s, dir), "vec_id", "embedding")
        Similarity.ivfPqTopK(q.filter(col("vec_id") < 10), q, "vec_id", 10,
          nCells = 16, nProbe = 4)
      },
      Some(s"""WITH $quantSqlCte,
        |seeds AS (SELECT vec_id AS seed_id, qv AS sv,
        |  sqrt(CAST(CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS DOUBLE)) AS snorm
        |  FROM q WHERE vec_id < 16),
        |cscored AS (SELECT q.vec_id, s.seed_id,
        |  CAST(CAST(list_sum(list_transform(range(1,65), i -> q.qv[i]*s.sv[i])) AS BIGINT) AS DOUBLE)
        |    / s.snorm AS score
        |  FROM q CROSS JOIN seeds s),
        |cl AS (SELECT vec_id AS neighbor_id, seed_id AS cell FROM (
        |  SELECT vec_id, seed_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY score DESC, seed_id) AS rn FROM cscored) t WHERE rn = 1),
        |pr AS (SELECT vec_id AS query_id, seed_id AS cell FROM (
        |  SELECT vec_id, seed_id, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY score DESC, seed_id) AS rn FROM cscored WHERE vec_id < 10) t
        |  WHERE rn <= 4),
        |$pqReconSqlCtes,
        |cand AS (SELECT p.query_id, c.neighbor_id FROM pr p
        |  JOIN cl c ON c.cell = p.cell AND c.neighbor_id <> p.query_id),
        |sc AS (SELECT cand.query_id, cand.neighbor_id,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> qq.qv[i] * r.recon[i])) AS BIGINT) AS score_pq
        |  FROM cand JOIN rec r ON r.vec_id = cand.neighbor_id
        |  JOIN q qq ON qq.vec_id = cand.query_id),
        |rk AS (SELECT query_id, neighbor_id, score_pq,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score_pq DESC, neighbor_id) AS BIGINT) AS rnk FROM sc)
        |SELECT query_id, rnk, neighbor_id, score_pq
        |FROM rk WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin)),

    // L63 — STREAM-STREAM INTERVAL JOIN (attribution): purchases joined
    // to the same user's views within the preceding hour, as Spark's
    // native two-sided streaming inner join — both sides watermarked,
    // the range condition bounds the join state (the operator §2.10 had
    // not yet exercised). Delay = the data span here so nothing retires
    // and the run-to-completion output equals the batch join exactly
    // whatever the file split; production sets the disorder SLA instead.
    Q("streaming_interval_join",
      (s, dir) => withStreamingPartitions(s) {
        val path = s"$dir/events.parquet"
        val base = s.read.parquet(path)
        val name = "ij_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ij").toString
        // 2 staged files -> 2 micro-batches: enough to exercise cross-batch
        // join state, while every extra batch pays a full state-store
        // checkpoint cycle across all shuffle partitions (measured 20.7 s
        // at 5 batches vs ~8 s at 2, sf0.1). coalesce avoids shuffling the
        // whole table just to stage it.
        val srcDir = stagedStreamSource("events_c2", dir)(p =>
          base.coalesce(2).write.mode("overwrite").parquet(p.toString))
        def side(tpe: String, pfx: String) = {
          val st = s.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", 1).parquet(srcDir)
          val t = Tables.tsUs(st)
          st.filter(col("event_type") === tpe)
            .select(col("user_id").as(s"${pfx}_user"),
              col("event_id").as(s"${pfx}_id"),
              t.as(s"${pfx}_tus"),
              timestamp_micros(t).as(s"${pfx}_wts"))
        }
        val joined = graft.streaming.StreamingOps.intervalJoin(
          side("view", "v"), side("purchase", "p"),
          expr("v_user = p_user AND p_wts >= v_wts" +
            " AND p_wts <= v_wts + INTERVAL 1 HOUR"),
          "v_wts", "p_wts", delay = "40 days")
        val q = joined
          .select(col("v_user").as("user_id"), col("v_id"), col("v_tus"),
            col("p_id"), col("p_tus"))
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt)) // srcDir is shared, JVM-exit cleaned
        s.table(name).orderBy(col("user_id"), col("v_id"), col("p_id"))
      },
      Some("""WITH v AS (SELECT user_id, event_id AS v_id, epoch_us(ts) AS v_tus
        |  FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_tus
        |  FROM events WHERE event_type = 'purchase')
        |SELECT v.user_id, v.v_id, v.v_tus, p.p_id, p.p_tus
        |FROM v JOIN p ON p.user_id = v.user_id
        |  AND p.p_tus >= v.v_tus AND p.p_tus <= v.v_tus + 3600000000
        |ORDER BY v.user_id, v.v_id, p.p_id""".stripMargin)),

    // L64 — CCNet-style LM FAMILIARITY filter (Wenzek et al. 2020):
    // rank docs by mean smoothed bigram probability under a model
    // trained on the trusted slice (here: lang='en'). Integer-exact
    // per-bigram floor(scale·(c2+1)/(c1+V)) — see Curation.lmFamiliarity;
    // the oracle reproduces every score and the adaptive below-corpus-
    // mean flag bit-for-bit (cross-multiplied in HUGEINT/DECIMAL38).
    Q("c_lm_familiarity",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Curation.lmFamiliarity(docs, docs.filter(col("lang") === "en"),
            "doc_id", "text", scale = 1000000L)
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), x -> x != '') AS toks FROM documents),
        |tt AS (SELECT doc_id, lang, unnest(toks) AS tok,
        |    unnest(range(len(toks))) AS i FROM d),
        |bg0 AS (SELECT doc_id, lang, tok AS w1, tok || ' ' || lead(tok, 1)
        |    OVER (PARTITION BY doc_id ORDER BY i) AS g FROM tt),
        |bg AS (SELECT doc_id, lang, w1, g FROM bg0 WHERE g IS NOT NULL),
        |c2 AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg
        |  WHERE lang = 'en' GROUP BY 1),
        |c1 AS (SELECT tok AS w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM tt
        |  WHERE lang = 'en' GROUP BY 1),
        |v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM c1),
        |tf AS (SELECT doc_id, g, w1, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM bg GROUP BY 1, 2, 3),
        |sc AS (SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_bigrams,
        |    CAST(SUM(tf.tf * ((1000000 * (COALESCE(c2.c2, 0) + 1))
        |      // (COALESCE(c1.c1, 0) + v.v))) AS BIGINT) AS fam_sum
        |  FROM tf LEFT JOIN c2 USING (g) LEFT JOIN c1 USING (w1)
        |  CROSS JOIN v GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_bigrams) AS BIGINT) AS tot_n,
        |    CAST(SUM(fam_sum) AS BIGINT) AS tot_fam FROM sc)
        |SELECT doc_id, n_bigrams, fam_sum, fam_sum // n_bigrams AS fam_scaled,
        |  (fam_sum::HUGEINT * tot_n::HUGEINT)
        |    < (tot_fam::HUGEINT * n_bigrams::HUGEINT) AS low_familiarity
        |FROM sc CROSS JOIN tot ORDER BY doc_id""".stripMargin)),

    // L139 — TEXTTILING SEGMENTATION: content-aware chunking that cuts
    // where the distinct-token overlap of the 10 tokens before vs after
    // a boundary drops to ≤ 2 (an exact integer cohesion score) —
    // per-row array HOFs for scoring, one per-doc window pass over the
    // tiny cut list for assembly; short docs emit one whole-doc
    // segment.
    Q("t_texttile_segments",
      (s, dir) => TextOps.textTileSegments(
          Tables.documents(s, dir), "doc_id", "text", w = 10, minOverlap = 2)
        .orderBy(col("doc_id"), col("seg_id")),
      Some(s"""WITH $toksSqlCte,
        |bb AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM d
        |  WHERE len(toks) > 0),
        |ci AS (SELECT doc_id, toks, CAST(i AS BIGINT) AS i FROM (
        |  SELECT doc_id, toks, unnest(range(10, CAST(len(toks) AS BIGINT) - 10 + 1)) AS i
        |  FROM bb WHERE n >= 20) t),
        |cuts AS (SELECT doc_id, i FROM ci
        |  WHERE len(list_filter(
        |    list_distinct(toks[CAST(i - 9 AS INTEGER):CAST(i AS INTEGER)]),
        |    x -> list_contains(toks[CAST(i + 1 AS INTEGER):CAST(i + 10 AS INTEGER)], x))) <= 2),
        |bounds AS (SELECT doc_id, i FROM cuts
        |  UNION ALL SELECT doc_id, CAST(0 AS BIGINT) FROM bb
        |  UNION ALL SELECT doc_id, n FROM bb),
        |sp AS (SELECT doc_id, i, lead(i) OVER (PARTITION BY doc_id ORDER BY i) AS e
        |  FROM bounds),
        |sv AS (SELECT doc_id, i, e FROM sp WHERE e IS NOT NULL AND e > i)
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) AS BIGINT) - 1 AS seg_id,
        |  i AS start_pos, e AS end_pos, e - i AS n_toks
        |FROM sv ORDER BY doc_id, seg_id""".stripMargin)),

    // L139b — TEXTTILING CHUNK MATERIALIZATION: the segment offsets
    // joined back to the token arrays and emitted as text — the actual
    // RAG chunk table a retrieval index ingests (offsets alone are the
    // audit view). One equi join on the doc id + a per-row slice.
    Q("t_texttile_chunks",
      (s, dir) => {
        val segs = TextOps.textTileSegments(
          Tables.documents(s, dir), "doc_id", "text", w = 10, minOverlap = 2)
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        segs.join(toks, Seq("doc_id"))
          .select(col("doc_id"), col("seg_id"), col("n_toks"),
            array_join(slice(col("toks"), (col("start_pos") + 1L).cast("int"),
              col("n_toks").cast("int")), " ").as("chunk_text"))
          .orderBy(col("doc_id"), col("seg_id"))
      },
      Some(s"""WITH $toksSqlCte,
        |bb AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM d
        |  WHERE len(toks) > 0),
        |ci AS (SELECT doc_id, toks, CAST(i AS BIGINT) AS i FROM (
        |  SELECT doc_id, toks, unnest(range(10, CAST(len(toks) AS BIGINT) - 10 + 1)) AS i
        |  FROM bb WHERE n >= 20) t),
        |cuts AS (SELECT doc_id, i FROM ci
        |  WHERE len(list_filter(
        |    list_distinct(toks[CAST(i - 9 AS INTEGER):CAST(i AS INTEGER)]),
        |    x -> list_contains(toks[CAST(i + 1 AS INTEGER):CAST(i + 10 AS INTEGER)], x))) <= 2),
        |bounds AS (SELECT doc_id, i FROM cuts
        |  UNION ALL SELECT doc_id, CAST(0 AS BIGINT) FROM bb
        |  UNION ALL SELECT doc_id, n FROM bb),
        |sp AS (SELECT doc_id, i, lead(i) OVER (PARTITION BY doc_id ORDER BY i) AS e
        |  FROM bounds),
        |sv AS (SELECT doc_id, i, e FROM sp WHERE e IS NOT NULL AND e > i),
        |sg AS (SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) AS BIGINT) - 1 AS seg_id,
        |  i, e FROM sv)
        |SELECT sg.doc_id, sg.seg_id, sg.e - sg.i AS n_toks,
        |  array_to_string(bb.toks[CAST(sg.i + 1 AS INTEGER):CAST(sg.e AS INTEGER)], ' ') AS chunk_text
        |FROM sg JOIN bb ON bb.doc_id = sg.doc_id
        |ORDER BY sg.doc_id, sg.seg_id""".stripMargin)),

    // L137 — LM NEXT-TOKEN TOP-K: per top-20 context word, the 3 most
    // likely continuations under the SAME session-memoized bigram
    // model tables the familiarity gate joins, with the identical
    // Laplace-smoothed scaled-integer probability — the completion
    // table an engineer reads to sanity-check the trained filter model.
    Q("c_lm_next_token",
      (s, dir) => {
        val base = Tables.documents(s, dir)
        val (c2, c1, vocab) = lmModelCache.computeIfAbsent(
          (s, dir), { _ =>
            val m = Curation.lmModel(base.filter(col("lang") === "en"), "text")
            m._1.cache().count(); m._2.cache().count(); m._3.cache().count()
            m
          })
        Curation.lmNextTokenTopK(c2, c1, vocab,
            nContexts = 20, k = 3, scale = 1000000L)
          .orderBy(col("ctx"), col("rnk"))
      },
      Some(s"""WITH $toksSqlCte,
        |tt AS (SELECT doc_id, lang, unnest(toks) AS tok,
        |    unnest(range(len(toks))) AS i FROM d),
        |bg0 AS (SELECT doc_id, lang, tok AS w1, tok || ' ' || lead(tok, 1)
        |    OVER (PARTITION BY doc_id ORDER BY i) AS g FROM tt),
        |bg AS (SELECT doc_id, lang, w1, g FROM bg0 WHERE g IS NOT NULL),
        |c2 AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg
        |  WHERE lang = 'en' GROUP BY 1),
        |c1 AS (SELECT tok AS w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM tt
        |  WHERE lang = 'en' GROUP BY 1),
        |v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM c1),
        |ctx AS (SELECT w1 AS ctx, c1 AS ctx_n FROM c1
        |  ORDER BY c1 DESC, w1 LIMIT 20),
        |nx AS (SELECT ctx.ctx, ctx.ctx_n,
        |    string_split(c2.g, ' ')[2] AS next_tok, c2.c2 AS cnt
        |  FROM c2 JOIN ctx ON string_split(c2.g, ' ')[1] = ctx.ctx),
        |p AS (SELECT ctx, next_tok, cnt,
        |  CAST((1000000 * (cnt + 1)) // (ctx_n + v.v) AS BIGINT) AS p_scaled,
        |  CAST(row_number() OVER (PARTITION BY ctx
        |    ORDER BY cnt DESC, next_tok) AS BIGINT) AS rnk
        |  FROM nx CROSS JOIN v)
        |SELECT ctx, rnk, next_tok, cnt, p_scaled FROM p WHERE rnk <= 3
        |ORDER BY ctx, rnk""".stripMargin)),

    // L138 — DoReMi-STYLE MIXTURE REWEIGHTING: one integer-exact round
    // of the multiplicative-weights loop — per-source familiarity vs
    // the corpus mean (cross-multiplied, no division), hard sources
    // double their weight, Hamilton re-allocates the 1M-slot budget.
    // Reuses the session-memoized model tables.
    Q("c_doremi_reweight",
      (s, dir) => {
        val base = Tables.documents(s, dir)
        val (c2, c1, vocab) = lmModelCache.computeIfAbsent(
          (s, dir), { _ =>
            val m = Curation.lmModel(base.filter(col("lang") === "en"), "text")
            m._1.cache().count(); m._2.cache().count(); m._3.cache().count()
            m
          })
        Curation.doremiReweight(base, "source", "text", c2, c1, vocab,
            scale = 1000000L, budget = 1000000L)
          .orderBy(col("source"))
      },
      Some("""WITH dd AS (SELECT doc_id, lang, source,
        |    list_filter(string_split(text, ' '), x -> x != '') AS toks FROM documents),
        |tt AS (SELECT doc_id, lang, source, unnest(toks) AS tok,
        |    unnest(range(len(toks))) AS i FROM dd),
        |bg0 AS (SELECT doc_id, lang, source, tok AS w1, tok || ' ' || lead(tok, 1)
        |    OVER (PARTITION BY doc_id ORDER BY i) AS g FROM tt),
        |bg AS (SELECT doc_id, lang, source, w1, g FROM bg0 WHERE g IS NOT NULL),
        |c2 AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg
        |  WHERE lang = 'en' GROUP BY 1),
        |c1 AS (SELECT tok AS w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM tt
        |  WHERE lang = 'en' GROUP BY 1),
        |v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM c1),
        |tf AS (SELECT source, g, w1, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM bg GROUP BY 1, 2, 3),
        |sc AS (SELECT tf.source, CAST(SUM(tf.tf) AS BIGINT) AS n_bigrams,
        |    CAST(SUM(tf.tf * ((1000000 * (COALESCE(c2.c2, 0) + 1))
        |      // (COALESCE(c1.c1, 0) + v.v))) AS BIGINT) AS fam_sum
        |  FROM tf LEFT JOIN c2 USING (g) LEFT JOIN c1 USING (w1)
        |  CROSS JOIN v GROUP BY 1),
        |nd AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_bigrams) AS BIGINT) AS tot_n,
        |    CAST(SUM(fam_sum) AS BIGINT) AS tot_fam FROM sc),
        |fl AS (SELECT sc.source, nd.n_docs, sc.n_bigrams,
        |    sc.fam_sum // sc.n_bigrams AS fam_scaled,
        |    (sc.fam_sum::HUGEINT * tot.tot_n::HUGEINT)
        |      < (tot.tot_fam::HUGEINT * sc.n_bigrams::HUGEINT) AS hard
        |  FROM sc JOIN nd USING (source) CROSS JOIN tot),
        |ww AS (SELECT source, n_docs, n_bigrams, fam_scaled, hard,
        |    CAST(n_docs * CASE WHEN hard THEN 2 ELSE 1 END AS BIGINT) AS w FROM fl),
        |wt AS (SELECT *, CAST(SUM(w) OVER () AS BIGINT) AS T FROM ww),
        |ha AS (SELECT *, (1000000 * w) // T AS fl2, (1000000 * w) % T AS rem FROM wt),
        |hr AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
        |    1000000 - CAST(SUM(fl2) OVER () AS BIGINT) AS leftover FROM ha)
        |SELECT source, n_docs, n_bigrams, fam_scaled, hard, w,
        |  CAST(fl2 + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM hr ORDER BY source""".stripMargin)),

    // L65 — BM25 KEYWORD RETRIEVAL top-k: data-derived probe terms (5
    // highest-df tokens of length >= 5), scored with the integer-exact
    // BM25 surrogate (k1=6/5, b=3/4, odds-ratio idf — Retrieval.bm25TopK)
    // and reduced per term by the bounded-state TopKAgg, not a window
    // sort. The oracle mirrors both floors and the rank tie rule.
    Q("r_bm25_topk",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Retrieval.bm25TopK(docs, "doc_id", "text",
            Retrieval.probeTerms(docs, "doc_id", "text", minLen = 5, k = 5),
            k = 10, scale = 1000000L)
          .orderBy(col("term"), col("rank"))
      },
      Some(s"""WITH $toksSqlCte,
        |t AS (SELECT doc_id, unnest(toks) AS term FROM d),
        |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM t GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(dl) AS BIGINT) AS n_toks FROM dl),
        |probes AS (SELECT term FROM (
        |    SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS pdf
        |    FROM t WHERE len(term) >= 5 GROUP BY 1)
        |  ORDER BY pdf DESC, term LIMIT 5),
        |tf AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM t JOIN probes USING (term) GROUP BY 1, 2),
        |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.term, tf.doc_id, dfq.df, tot.n_docs,
        |    ((1000000 * 22 * tf.tf * tot.n_toks)
        |      // (10 * tf.tf * tot.n_toks + 3 * tot.n_toks
        |         + 9 * tot.n_docs * dl.dl)) AS s1
        |  FROM tf JOIN dl USING (doc_id) JOIN dfq USING (term) CROSS JOIN tot),
        |sc2 AS (SELECT term, doc_id,
        |    (s1 * (2 * (n_docs - df) + 1)) // (2 * df + 1) AS score FROM sc),
        |r AS (SELECT term, doc_id, score,
        |    CAST(row_number() OVER (PARTITION BY term
        |      ORDER BY score DESC, doc_id) AS BIGINT) AS rank FROM sc2)
        |SELECT term, rank, doc_id, score
        |FROM r WHERE rank <= 10 ORDER BY term, rank""".stripMargin)),

    // L66 — C4-style BOILERPLATE STRIP: lines (5-token windows) whose
    // document frequency reaches 2 are removed from every doc; the
    // cleaned text is checked via md5 of the kept lines in order
    // (Curation.stripBoilerplate), not just counts. Contrast
    // c_dedup_lines, which keeps first occurrences.
    Q("c_boilerplate_strip",
      (s, dir) => Curation.stripBoilerplate(Tables.documents(s, dir),
          "doc_id", "text", lineLen = 5, minDf = 2L)
        .orderBy(col("doc_id")),
      Some(s"""WITH $toksSqlCte,
        |tt AS (SELECT doc_id, unnest(toks) AS tok, unnest(range(len(toks))) AS i FROM d),
        |ln AS (SELECT doc_id, i // 5 AS line_no,
        |  string_agg(tok, ' ' ORDER BY i) AS line, COUNT(*) AS n_toks
        |  FROM tt GROUP BY doc_id, i // 5),
        |dfc AS (SELECT line, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS line_df
        |  FROM ln GROUP BY 1)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CASE WHEN line_df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |  CAST(SUM(CASE WHEN line_df < 2 THEN n_toks ELSE 0 END) AS BIGINT) AS n_toks_kept,
        |  md5(COALESCE(string_agg(CASE WHEN line_df < 2 THEN line END,
        |    ' ' ORDER BY line_no), '')) AS clean_md5
        |FROM ln JOIN dfc USING (line)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // L67 — contrastive HARD-NEGATIVE mining: per query, top-10
    // candidates with cosine in [0.1, 0.3) — informative negatives above
    // random similarity but below the near-dup band (a near-dup
    // "negative" is a mislabeled positive). Same exact quantized-dot
    // scoring as sim_cosine_topk with the band as a post-filter.
    Q("sim_hard_negatives",
      (s, dir) => {
        val q = Similarity.quantize(Tables.embeddings(s, dir), "vec_id", "embedding")
        Similarity.hardNegativesTopK(q.filter(col("vec_id") < 10), q,
            "vec_id", k = 10, lo = 0.1, hi = 0.3)
          .orderBy(col("query_id"), col("rnk"))
      },
      Some(s"""WITH $quantSqlCte,
        |p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, unnest(a.qv) AS av, unnest(b.qv) AS bv
        |  FROM q a, q b WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id),
        |dt AS (SELECT query_id, neighbor_id, CAST(SUM(av*bv) AS BIGINT) AS dot FROM p GROUP BY query_id, neighbor_id),
        |sc AS (SELECT query_id, neighbor_id, dot,
        |  CAST(dot AS DOUBLE)/(sqrt(CAST(na.nn AS DOUBLE))*sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |  FROM dt JOIN nm na ON na.vec_id = query_id JOIN nm nb ON nb.vec_id = neighbor_id),
        |r AS (SELECT query_id, neighbor_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk,
        |  dot, cos FROM sc WHERE cos >= 0.1 AND cos < 0.3)
        |SELECT query_id, neighbor_id, rnk, dot, cos FROM r WHERE rnk <= 10
        |ORDER BY query_id, rnk""".stripMargin)),

    // L68 — STREAM-STATIC JOIN: streaming docs scored per micro-batch
    // against the STATIC LM model tables (broadcast bigram/unigram
    // counts trained offline on the 'en' slice), rolled up per language
    // in complete mode — one state row per lang. Stateless join +
    // commutative agg => run-to-completion equals the batch rollup
    // whatever the file split; the oracle is that batch rollup.
    Q("streaming_lm_familiarity",
      (s, dir) => withStreamingPartitions(s) {
        val base = Tables.documents(s, dir)
        // the offline-trained model is deterministic per corpus: build
        // and materialize once per session (each micro-batch would
        // otherwise re-derive all three model tables from scratch)
        val (c2, c1, vocab) = lmModelCache.computeIfAbsent(
          (s, dir), { _ =>
            val m = Curation.lmModel(base.filter(col("lang") === "en"), "text")
            m._1.cache().count(); m._2.cache().count(); m._3.cache().count()
            m
          })
        val name = "lf_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_lf").toString
        val srcDir = stagedStreamSource("docs_c2", dir)(p =>
          base.coalesce(2).write.mode("overwrite").parquet(p.toString))
        val stream = s.readStream.schema(base.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
        val rollup = graft.streaming.StreamingOps.familiarityRollup(
          stream, c2, c1, vocab, "text", "lang", scale = 1000000L)
        val q = rollup.writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt)) // srcDir is shared, JVM-exit cleaned
        s.table(name).orderBy(col("lang"))
      },
      Some("""WITH d AS (SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), x -> x != '') AS toks FROM documents),
        |tt AS (SELECT doc_id, lang, unnest(toks) AS tok,
        |    unnest(range(len(toks))) AS i FROM d),
        |bg0 AS (SELECT doc_id, lang, tok AS w1, tok || ' ' || lead(tok, 1)
        |    OVER (PARTITION BY doc_id ORDER BY i) AS g FROM tt),
        |bg AS (SELECT doc_id, lang, w1, g FROM bg0 WHERE g IS NOT NULL),
        |c2 AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg
        |  WHERE lang = 'en' GROUP BY 1),
        |c1 AS (SELECT tok AS w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM tt
        |  WHERE lang = 'en' GROUP BY 1),
        |v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM c1),
        |sc AS (SELECT bg.lang,
        |    ((1000000 * (COALESCE(c2.c2, 0) + 1))
        |      // (COALESCE(c1.c1, 0) + v.v)) AS term
        |  FROM bg LEFT JOIN c2 USING (g) LEFT JOIN c1 USING (w1) CROSS JOIN v)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(term) AS BIGINT) AS fam_sum,
        |  CAST(SUM(term) AS BIGINT) // COUNT(*) AS fam_scaled
        |FROM sc GROUP BY lang ORDER BY lang""".stripMargin)),

    // L69 — UniMax BUDGET-CAPPED language allocation (Chung et al.
    // 2023): integer water-filling of a 15k-token budget over per-lang
    // token counts — low-resource langs keep everything, high-resource
    // ones cap at the common level; the floor remainder is reported,
    // not smeared (contrast c_mix_weights' largest-remainder top-up).
    Q("c_unimax_alloc",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Curation.unimaxAllocation(
            docs.select(col("lang"), TextOps.tokenCount(col("text")).as("nt"))
              .groupBy(col("lang")).agg(sum(col("nt")).as("n")),
            "lang", "n", budget = 15000L)
          .orderBy(col("lang"))
      },
      Some("""WITH d AS (SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), x -> x != '') AS toks FROM documents),
        |cnt AS (SELECT lang, CAST(SUM(len(toks)) AS BIGINT) AS n FROM d GROUP BY 1),
        |idx AS (SELECT lang, n,
        |    CAST(row_number() OVER (ORDER BY n, lang) AS BIGINT) AS i,
        |    CAST(SUM(n) OVER (ORDER BY n, lang) AS BIGINT) AS prefix,
        |    lead(n, 1) OVER (ORDER BY n, lang) AS next_n FROM cnt),
        |l AS (SELECT CAST(COUNT(*) AS BIGINT) AS l FROM idx),
        |cand AS (SELECT i AS k, n AS nk, prefix, next_n, l.l
        |    FROM idx CROSS JOIN l
        |  UNION ALL SELECT 0, NULL, 0, NULL, l FROM l),
        |ch AS (SELECT k, CASE WHEN k < l THEN (15000 - prefix) // (l - k) END AS t,
        |    prefix AS pk, l
        |  FROM cand
        |  WHERE (k = l AND prefix <= 15000)
        |     OR (k < l AND (k = 0 OR (15000 - prefix) // (l - k) >= nk)
        |         AND ((15000 - prefix) // (l - k) < next_n OR next_n IS NULL))
        |  ORDER BY k DESC LIMIT 1)
        |SELECT idx.lang, idx.n,
        |  CASE WHEN idx.i <= ch.k THEN idx.n ELSE ch.t END AS alloc,
        |  ch.t AS level,
        |  15000 - (CASE WHEN ch.k = ch.l THEN ch.pk
        |    ELSE ch.pk + (ch.l - ch.k) * ch.t END) AS leftover
        |FROM idx CROSS JOIN ch ORDER BY lang""".stripMargin)),

    // L70 — URL/DOMAIN BLOCKLIST gate (RefinedWeb/UT1, Penedo 2023
    // §3.1): corpus has no URLs, so (c_pii_scrub precedent) docs are
    // augmented with deterministic doc_id-derived URLs IDENTICALLY in
    // Spark and the oracle — even ids get https://www.dom{id%23}.com
    // with a /casino path every third — then gated: normalized domain
    // probes the broadcast blocklist, path scans for flagged words.
    Q("c_url_blocklist",
      (s, dir) => {
        val aug = Tables.documents(s, dir).select(col("doc_id"), concat(
          col("text"),
          when(pmod(col("doc_id"), lit(2L)) === 0L, concat(
            lit(" visit https://www.dom"),
            pmod(col("doc_id"), lit(23L)).cast("string"), lit(".com"),
            when(pmod(col("doc_id"), lit(3L)) === 0L, lit("/casino/x"))
              .otherwise(concat(lit("/p"),
                pmod(col("doc_id"), lit(11L)).cast("string")))))
            .otherwise(lit(""))).as("text"))
        Curation.urlBlocklistGate(aug, "doc_id", "text",
            blockedDomains = Seq("dom1.com", "dom4.com", "dom7.com"),
            badPathWords = Seq("casino"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH aug AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 2 = 0 THEN ' visit https://www.dom'
        |    || CAST(doc_id % 23 AS VARCHAR) || '.com' ||
        |    CASE WHEN doc_id % 3 = 0 THEN '/casino/x'
        |      ELSE '/p' || CAST(doc_id % 11 AS VARCHAR) END
        |  ELSE '' END AS t FROM documents),
        |bl(bdom) AS (VALUES ('dom1.com'), ('dom4.com'), ('dom7.com')),
        |u AS (SELECT doc_id,
        |  nullif(regexp_extract(t, 'https?://[^\s]+', 0), '') AS url FROM aug),
        |x AS (SELECT doc_id, url,
        |  regexp_replace(lower(regexp_extract(url, 'https?://([^/\s]+)', 1)),
        |    '^www\.', '') AS domain,
        |  nullif(regexp_extract(url, 'https?://[^/\s]+(/[^\s]*)', 1), '') AS path
        |  FROM u)
        |SELECT doc_id, CASE WHEN url IS NOT NULL THEN domain END AS domain,
        |  COALESCE(bl.bdom IS NOT NULL, FALSE) AS blocked_domain,
        |  COALESCE(contains(path, 'casino'), FALSE) AS blocked_path,
        |  NOT COALESCE(bl.bdom IS NOT NULL, FALSE)
        |    AND NOT COALESCE(contains(path, 'casino'), FALSE) AS keep
        |FROM x LEFT JOIN bl ON bl.bdom = x.domain
        |ORDER BY doc_id""".stripMargin)),

    // L71 — HYPERLOGLOG distinct-count sketch (Flajolet 2007): 16
    // max-of-rank registers per event_type as a bounded-state
    // partial-merge aggregate over the public 60-bit md5 hash — bucket
    // = top 4 bits, rank = leading zeros of the remaining 56 + 1. The
    // oracle rebuilds every register (57 − bitlength via printf('%b')),
    // the scaled inverse-power sum, and the raw α·m²·2⁵⁷/S estimate
    // bit-for-bit; exact COUNT(DISTINCT) rides along for calibration.
    Q("sketch_hll_distinct",
      (s, dir) => {
        val hll = udaf(new graft.expr.HllSketchAgg(4))
        s.read.parquet(s"$dir/events.parquet")
          .select(col("event_type"),
            conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
              .cast("long").as("hv"), col("user_id"))
          .groupBy(col("event_type"))
          .agg(hll(col("hv")).as("h"),
            countDistinct(col("user_id")).as("exact_distinct"))
          // regs serialized to a CSV string — the driver's pandas
          // comparator cannot sort/hash raw array cells
          .select(col("event_type"),
            array_join(col("h.regs").cast("array<string>"), ",").as("regs"),
            col("h.s_scaled").as("s_scaled"), col("h.n_zero").as("n_zero"),
            ((lit(0.673) * lit(256.0)) * lit(1.44115188075855872e17)
              / col("h.s_scaled").cast("double")).as("est_distinct"),
            col("exact_distinct"))
          .orderBy(col("event_type"))
      },
      Some("""WITH h AS (SELECT event_type,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM events),
        |bk AS (SELECT event_type, hv >> 56 AS bucket,
        |    hv & 72057594037927935 AS w FROM h),
        |r AS (SELECT event_type, bucket,
        |    MAX(CASE WHEN w = 0 THEN 57
        |      ELSE 57 - length(printf('%b', w)) END) AS reg
        |  FROM bk GROUP BY 1, 2),
        |et AS (SELECT DISTINCT event_type FROM events),
        |grid AS (SELECT et.event_type, gs.bucket FROM et
        |  CROSS JOIN (SELECT unnest(range(16)) AS bucket) gs),
        |fl AS (SELECT g.event_type, g.bucket,
        |    CAST(COALESCE(r.reg, 0) AS BIGINT) AS reg
        |  FROM grid g LEFT JOIN r ON r.event_type = g.event_type
        |    AND r.bucket = g.bucket),
        |a AS (SELECT event_type, list(reg ORDER BY bucket) AS regs,
        |    CAST(SUM(1::BIGINT << (57 - reg)) AS BIGINT) AS s_scaled,
        |    CAST(SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
        |  FROM fl GROUP BY 1),
        |x AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
        |    AS exact_distinct FROM events GROUP BY 1)
        |SELECT a.event_type, array_to_string(a.regs, ',') AS regs,
        |  a.s_scaled, a.n_zero,
        |  (0.673 * 256.0) * 144115188075855872.0
        |    / CAST(a.s_scaled AS DOUBLE) AS est_distinct,
        |  x.exact_distinct
        |FROM a JOIN x USING (event_type) ORDER BY event_type""".stripMargin)),

    // L72 — ORDERED FUNNEL (signup → view → click → purchase): per user
    // the earliest completion time of each step STRICTLY AFTER the
    // previous step's; a missing step nulls the suffix. Chained keyed
    // aggregates — k equi joins on user_id, no per-user sort.
    Q("e_funnel",
      (s, dir) => EventAnalytics.funnel(
          Tables.eventIntervals(s, dir)
            .select(col("user_id"), col("event_type"), col("s_us").as("tus")),
          "user_id", "event_type", "tus",
          Seq("signup", "view", "click", "purchase"))
        .orderBy(col("user_id")),
      Some(s"""WITH $evPointsSqlCte,
        |s1 AS (SELECT user_id, MIN(tus) AS t1 FROM e
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT s1.user_id, s1.t1,
        |    MIN(CASE WHEN e.tus > s1.t1 THEN e.tus END) AS t2
        |  FROM s1 LEFT JOIN e ON e.user_id = s1.user_id
        |    AND e.event_type = 'view' GROUP BY 1, 2),
        |s3 AS (SELECT s2.user_id, s2.t1, s2.t2,
        |    MIN(CASE WHEN e.tus > s2.t2 THEN e.tus END) AS t3
        |  FROM s2 LEFT JOIN e ON e.user_id = s2.user_id
        |    AND e.event_type = 'click' GROUP BY 1, 2, 3),
        |s4 AS (SELECT s3.user_id, s3.t1, s3.t2, s3.t3,
        |    MIN(CASE WHEN e.tus > s3.t3 THEN e.tus END) AS t4
        |  FROM s3 LEFT JOIN e ON e.user_id = s3.user_id
        |    AND e.event_type = 'purchase' GROUP BY 1, 2, 3, 4)
        |SELECT user_id, t1, t2, t3, t4,
        |  CAST(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END
        |    + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
        |    + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END
        |    + CASE WHEN t4 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS steps_reached
        |FROM s4 ORDER BY user_id""".stripMargin)),

    // L73 — COHORT RETENTION: cohort = first-activity week; one row per
    // (cohort, offset) counting distinct users still active. The
    // (user, week) distinct collapse runs before the join, so join
    // input is users × weeks, not raw events.
    Q("e_retention",
      (s, dir) => EventAnalytics.retention(
          Tables.eventIntervals(s, dir)
            .select(col("user_id"), col("s_us").as("tus")),
          "user_id", "tus", bucketUs = 604800000000L)
        .orderBy(col("cohort_w"), col("week_offset")),
      Some(s"""WITH $evPointsSqlCte,
        |w AS (SELECT DISTINCT user_id, tus // 604800000000 AS w FROM e),
        |c AS (SELECT user_id, MIN(w) AS cohort_w FROM w GROUP BY 1)
        |SELECT c.cohort_w, w.w - c.cohort_w AS week_offset,
        |  CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_users
        |FROM w JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // L74 — PIVOT (long → wide): per-source token totals spread across
    // the five language columns — Spark's RelationalGroupedDataset
    // .pivot with explicit values (fixed schema: at scale you always
    // pin the pivot values; inferring them is an extra pass). Empty
    // (source, lang) cells coalesce to 0 on BOTH sides: a NULL-bearing
    // BIGINT column canonicalizes differently across engines in the
    // driver's pandas comparator.
    Q("t_pivot_matrix",
      (s, dir) => Tables.documents(s, dir)
        .select(col("source"), col("lang"),
          TextOps.tokenCount(col("text")).as("nt"))
        .groupBy(col("source"))
        .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
        .agg(sum(col("nt")))
        .na.fill(0L, Seq("de", "en", "es", "fr", "zh"))
        .orderBy(col("source")),
      Some("""WITH d AS (SELECT source, lang,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
        |      AS BIGINT) AS nt FROM documents)
        |SELECT source,
        |  CAST(COALESCE(SUM(CASE WHEN lang = 'de' THEN nt END), 0) AS BIGINT) AS de,
        |  CAST(COALESCE(SUM(CASE WHEN lang = 'en' THEN nt END), 0) AS BIGINT) AS en,
        |  CAST(COALESCE(SUM(CASE WHEN lang = 'es' THEN nt END), 0) AS BIGINT) AS es,
        |  CAST(COALESCE(SUM(CASE WHEN lang = 'fr' THEN nt END), 0) AS BIGINT) AS fr,
        |  CAST(COALESCE(SUM(CASE WHEN lang = 'zh' THEN nt END), 0) AS BIGINT) AS zh
        |FROM d GROUP BY source ORDER BY source""".stripMargin)),

    // L75 — CUBE / GROUPING SETS: event counts and cent totals at every
    // (event_type × week) granularity in one pass, grouping_id
    // disambiguating the rollup level (2·g(type) + g(week) — both
    // engines put the first cube column in the high bit).
    Q("a_cube",
      (s, dir) => Tables.eventIntervals(s, dir)
        .select(col("event_type"), expr("s_us div 604800000000L").as("w"),
          col("cents"))
        .cube(col("event_type"), col("w"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          sum(col("cents")).as("cents_sum"))
        .orderBy(col("gid"), coalesce(col("event_type"), lit("")),
          coalesce(col("w"), lit(-1L))),
      Some(s"""WITH $evPointsSqlCte,
        |b AS (SELECT event_type, tus // 604800000000 AS w, cents FROM e)
        |SELECT event_type, w,
        |  CAST(2 * GROUPING(event_type) + GROUPING(w) AS BIGINT) AS gid,
        |  CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS cents_sum
        |FROM b GROUP BY CUBE(event_type, w)
        |ORDER BY gid, COALESCE(event_type, ''), COALESCE(w, -1)""".stripMargin)),

    // L76 — EVENT TRANSITION MATRIX (next-event Markov counts, the
    // product-analytics complement of e_funnel): per user order events
    // by (time, event_id) and count consecutive type→next pairs — one
    // shuffle on the user key, the lead window runs per partition.
    Q("e_transitions",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("s_us"), col("event_id"))
        Tables.eventIntervals(s, dir)
          .select(col("user_id"), col("event_id"), col("s_us"),
            col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type"), col("next_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("event_type"), col("next_type"))
      },
      Some(s"""WITH $evPointsSqlCte,
        |nx AS (SELECT event_type, lead(event_type, 1) OVER
        |    (PARTITION BY user_id ORDER BY tus, event_id) AS next_type
        |  FROM e)
        |SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM nx WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // L77 — σ-THRESHOLD ANOMALY GATE: flag events whose cents deviate
    // from their type's mean by more than 1.5 population σ, with the
    // z-test cleared of divisions/sqrt by cross-multiplication in
    // decimal(38,0)/HUGEINT — bit-exact cross-engine (the double
    // z-score is not: Σx² accumulation order changes the low bits).
    // One stats shuffle, then a broadcast probe + map-side flag.
    Q("e_sigma_outliers",
      (s, dir) => EventAnalytics.sigmaOutliers(
          evPoints(s, dir)
            .select(col("event_id"), col("event_type"), col("cents")),
          "event_type", "cents", num = 3, den = 2)
        .select(col("event_id"), col("event_type"), col("cents"),
          col("is_outlier"), col("dev_sign"))
        .orderBy(col("event_id")),
      Some(s"""WITH $evPointsSqlCte,
        |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cents) AS HUGEINT) AS s,
        |    SUM(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS q
        |  FROM e GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.cents,
        |  4 * (CAST(st.n AS HUGEINT) * CAST(e.cents AS HUGEINT) - st.s)
        |    * (CAST(st.n AS HUGEINT) * CAST(e.cents AS HUGEINT) - st.s)
        |    > 9 * (CAST(st.n AS HUGEINT) * st.q - st.s * st.s) AS is_outlier,
        |  CAST(CASE
        |    WHEN CAST(st.n AS HUGEINT) * CAST(e.cents AS HUGEINT) - st.s > 0 THEN 1
        |    WHEN CAST(st.n AS HUGEINT) * CAST(e.cents AS HUGEINT) - st.s < 0 THEN -1
        |    ELSE 0 END AS BIGINT) AS dev_sign
        |FROM e JOIN st USING (event_type)
        |ORDER BY event_id""".stripMargin)),

    // L78 — SORTED-NEIGHBORHOOD dedup (Hernández & Stolfo 1995): docs
    // sort by their 16-char normalized prefix inside 2-char blocks,
    // each row meets only its 3 successors — O(n·w) candidates by
    // construction regardless of data skew (contrast LSH's
    // data-dependent buckets) — then exact Jaccard verify. One block
    // shuffle, partition-local sort + lead, no global sort.
    Q("dedup_snm",
      (s, dir) => Dedup.sortedNeighborhoodPairs(
          Tables.documents(s, dir),
          sessionShingles(s, dir),
          "doc_id", "text", keyChars = 16, blockChars = 2, window = 4,
          minJaccard = 0.8)
        .orderBy(col("a"), col("b")),
      Some(s"""WITH $shingleSqlCte,
        |kb AS (SELECT doc_id,
        |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 16) AS snm_key,
        |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 2) AS snm_blk
        |  FROM documents),
        |ld AS (SELECT doc_id, lead(doc_id, 1) OVER w AS l1,
        |    lead(doc_id, 2) OVER w AS l2, lead(doc_id, 3) OVER w AS l3
        |  FROM kb WINDOW w AS (PARTITION BY snm_blk ORDER BY snm_key, doc_id)),
        |cand AS (SELECT DISTINCT least(doc_id, l) AS a, greatest(doc_id, l) AS b
        |  FROM (SELECT doc_id, unnest([l1, l2, l3]) AS l FROM ld) t
        |  WHERE l IS NOT NULL),
        |co AS (SELECT t.a, t.b, COUNT(*) AS common FROM (
        |    SELECT c.a, c.b, x.shingle FROM cand c
        |    JOIN sd x ON x.doc_id = c.a
        |    JOIN sd y ON y.doc_id = c.b AND y.shingle = x.shingle) t
        |  GROUP BY t.a, t.b),
        |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sd GROUP BY doc_id),
        |j AS (SELECT co.a, co.b, co.common,
        |  CAST(co.common AS DOUBLE) / CAST(na.n_sh + nb.n_sh - co.common AS DOUBLE) AS jaccard
        |  FROM co JOIN n na ON na.doc_id = co.a JOIN n nb ON nb.doc_id = co.b)
        |SELECT a, b, common, jaccard FROM j WHERE jaccard >= 0.8 ORDER BY a, b""".stripMargin)),

    // L79 — SEQUENCE PACKING (next-fit): docs laid end-to-end into
    // 1024-token context windows, 8 independent per-shard sequential
    // packs via the secondary-sort pattern (repartition on shard +
    // spill-friendly sortWithinPartitions + one mapPartitions pass
    // holding three longs of state) — no shard ever needs to fit in
    // memory. The oracle replays the same fold as a recursive CTE
    // advancing all shards one position per step.
    Q("c_pack_nextfit",
      (s, dir) => Curation.packNextFit(
          Tables.documents(s, dir)
            .select(col("doc_id"), TextOps.tokenCount(col("text")).as("nt")),
          "doc_id", "nt", nShards = 8, budget = 1024L)
        .withColumnRenamed("len", "nt")
        .orderBy(col("shard"), col("pos")),
      Some(s"""WITH RECURSIVE $toksSqlCte,
        |o AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS len,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM d),
        |q AS (SELECT doc_id, len, h, h % 8 AS shard,
        |    CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
        |      AS BIGINT) AS pos
        |  FROM o),
        |p AS (
        |  SELECT doc_id, shard, pos, CAST(0 AS BIGINT) AS bin,
        |    CAST(0 AS BIGINT) AS off, len, len AS used
        |  FROM q WHERE pos = 1
        |  UNION ALL
        |  SELECT q.doc_id, q.shard, q.pos,
        |    CASE WHEN p.used > 0 AND p.used + q.len > 1024
        |      THEN p.bin + 1 ELSE p.bin END,
        |    CASE WHEN p.used > 0 AND p.used + q.len > 1024
        |      THEN CAST(0 AS BIGINT) ELSE p.used END,
        |    q.len,
        |    CASE WHEN p.used > 0 AND p.used + q.len > 1024
        |      THEN q.len ELSE p.used + q.len END
        |  FROM p JOIN q ON q.shard = p.shard AND q.pos = p.pos + 1)
        |SELECT doc_id, shard, pos, bin, off, len AS nt
        |FROM p ORDER BY shard, pos""".stripMargin)),

    // L128 — PADDING-MINIMAL LENGTH BUCKETING: the 3-bucket boundary
    // pair (b1 < b2 < max) minimizing total padding when every doc pads
    // to its bucket cap (dynamic-batching bucket design). One corpus
    // pass reduces to per-distinct-length (count, sum) — clamped to 512
    // so the candidate space is ≤ 512² pairs REGARDLESS of corpus size;
    // prefix sums + exhaustive enumeration give the exact argmin in
    // pure longs, ties to the smaller (b1, b2).
    Q("c_length_buckets",
      (s, dir) => Curation.lengthBuckets(
          Tables.documents(s, dir)
            .select(TextOps.tokenCount(col("text")).as("nt")),
          "nt", capLen = 512)
        .orderBy(col("bucket")),
      Some(s"""WITH $toksSqlCte,
        |ln AS (SELECT least(CAST(len(toks) AS BIGINT), 512) AS len FROM d),
        |dl AS (SELECT len, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(len) AS BIGINT) AS s FROM ln GROUP BY len),
        |pf AS (SELECT len,
        |  CAST(SUM(n) OVER (ORDER BY len ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS BIGINT) AS cum_n,
        |  CAST(SUM(s) OVER (ORDER BY len ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS BIGINT) AS cum_s FROM dl),
        |tt AS (SELECT CAST(MAX(len) AS BIGINT) AS m, CAST(SUM(n) AS BIGINT) AS nt,
        |  CAST(SUM(s) AS BIGINT) AS st FROM dl),
        |bc AS (SELECT a.len AS l1, a.cum_n AS n1, a.cum_s AS s1,
        |    b.len AS l2, b.cum_n AS n2, b.cum_s AS s2, tt.m, tt.nt, tt.st,
        |    a.len*a.cum_n - a.cum_s + b.len*(b.cum_n - a.cum_n) - (b.cum_s - a.cum_s)
        |      + tt.m*(tt.nt - b.cum_n) - (tt.st - b.cum_s) AS cost
        |  FROM pf a JOIN pf b ON a.len < b.len, tt WHERE b.len < tt.m),
        |bw AS (SELECT * FROM bc ORDER BY cost, l1, l2 LIMIT 1)
        |SELECT CAST(0 AS BIGINT) AS bucket, l1 AS cap_len, n1 AS n_docs,
        |  l1*n1 - s1 AS pad_tokens FROM bw
        |UNION ALL SELECT CAST(1 AS BIGINT), l2, n2 - n1,
        |  l2*(n2 - n1) - (s2 - s1) FROM bw
        |UNION ALL SELECT CAST(2 AS BIGINT), m, nt - n2,
        |  m*(nt - n2) - (st - s2) FROM bw
        |ORDER BY bucket""".stripMargin)),

    // L129 — ISOTONIC (PAV) CALIBRATION of the stopword-ratio score
    // against the is-English outcome: raw per-decile P(en) rarely comes
    // out monotone; the PAV fit (via the minimax identity cal_i =
    // max_{j≤i} min_{k≥i} rate(j..k), fully relational) pools adjacent
    // violators into the best non-decreasing curve — what a quality
    // threshold should be read off of. One corpus pass to (bin, n,
    // pos); everything after is bounded by nBins³ = 1000 rows.
    Q("c_isotonic_pav",
      (s, dir) => {
        val binned = docToks(s, dir)
          .select(col("lang"), size(col("toks")).cast("long").as("nt"),
            TextOps.stopwordHits(col("toks"), TextOps.langMarkers.head._2).as("sh"))
          .withColumn("bin", least(expr("sh * 10L div nt"), lit(9L)))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("lang") === "en", 1L).otherwise(0L)).as("pos"))
        Curation.isotonicCalibrate(binned).orderBy(col("bin"))
      },
      Some(s"""WITH $toksSqlCte,
        |pd AS (SELECT lang, CAST(len(toks) AS BIGINT) AS nt,
        |  CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in'], t))) AS BIGINT) AS sh
        |  FROM d),
        |bd AS (SELECT least(sh * 10 // nt, 9) AS bin, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM pd GROUP BY 1),
        |pf AS (SELECT bin, n, pos,
        |  CAST(SUM(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS BIGINT) AS cum_n,
        |  CAST(SUM(pos) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS BIGINT) AS cum_p FROM bd),
        |a AS (SELECT j.bin AS j, k.bin AS k,
        |  CAST(k.cum_p - (j.cum_p - j.pos) AS DOUBLE)
        |    / CAST(k.cum_n - (j.cum_n - j.n) AS DOUBLE) AS rate
        |  FROM pf j JOIN pf k ON j.bin <= k.bin),
        |m AS (SELECT i.bin AS i, a.j, MIN(a.rate) AS mn FROM bd i
        |  JOIN a ON a.j <= i.bin AND a.k >= i.bin GROUP BY 1, 2),
        |c AS (SELECT i, MAX(mn) AS calibrated FROM m GROUP BY i)
        |SELECT bd.bin, bd.n, bd.pos,
        |  CAST(bd.pos AS DOUBLE) / CAST(bd.n AS DOUBLE) AS raw, c.calibrated
        |FROM bd JOIN c ON c.i = bd.bin ORDER BY bd.bin""".stripMargin)),

    // L131 — FEISTEL EPOCH SHUFFLE: exact bijective per-epoch
    // permutation of the id domain (4-round Feistel, md5 round
    // function) — every doc exactly once per epoch BY CONSTRUCTION,
    // O(1) seek via the inverse, identical replay on restart. Pure
    // per-row column expressions, no shuffle at any corpus size. The
    // oracle replays permute AND invert round-by-round: `recovered`
    // must equal doc_id on every row — bijectivity is checked
    // structurally, not statistically.
    Q("c_epoch_shuffle",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"))
        Seq(0, 1).map { e =>
          docs.select(lit(e.toLong).as("epoch"), col("doc_id"),
              Curation.feistelPermute(col("doc_id"), e).as("perm"))
            .withColumn("recovered", Curation.feistelInvert(col("perm"), e))
        }.reduce(_ unionByName _).orderBy(col("epoch"), col("perm"))
      },
      Some("""WITH e(epoch) AS (SELECT * FROM (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT)))),
        |s0 AS (SELECT e.epoch, d.doc_id,
        |  (doc_id // 65536) % 65536 AS l0, doc_id % 65536 AS r0 FROM documents d, e),
        |s1 AS (SELECT epoch, doc_id, r0 AS l1, xor(l0,
        |  ('0x' || substr(md5(concat(CAST(r0 AS VARCHAR), '|0|', CAST(epoch AS VARCHAR))), 1, 4))::BIGINT) AS r1 FROM s0),
        |s2 AS (SELECT epoch, doc_id, r1 AS l2, xor(l1,
        |  ('0x' || substr(md5(concat(CAST(r1 AS VARCHAR), '|1|', CAST(epoch AS VARCHAR))), 1, 4))::BIGINT) AS r2 FROM s1),
        |s3 AS (SELECT epoch, doc_id, r2 AS l3, xor(l2,
        |  ('0x' || substr(md5(concat(CAST(r2 AS VARCHAR), '|2|', CAST(epoch AS VARCHAR))), 1, 4))::BIGINT) AS r3 FROM s2),
        |s4 AS (SELECT epoch, doc_id, r3 AS l4, xor(l3,
        |  ('0x' || substr(md5(concat(CAST(r3 AS VARCHAR), '|3|', CAST(epoch AS VARCHAR))), 1, 4))::BIGINT) AS r4 FROM s3),
        |p AS (SELECT epoch, doc_id, l4 * 65536 + r4 AS perm, l4, r4 FROM s4),
        |i3 AS (SELECT epoch, doc_id, perm, xor(r4,
        |  ('0x' || substr(md5(concat(CAST(l4 AS VARCHAR), '|3|', CAST(epoch AS VARCHAR))), 1, 4))::BIGINT) AS l3, l4 AS r3 FROM p),
        |i2 AS (SELECT epoch, doc_id, perm, xor(r3,
        |  ('0x' || substr(md5(concat(CAST(l3 AS VARCHAR), '|2|', CAST(epoch AS VARCHAR))), 1, 4))::BIGINT) AS l2, l3 AS r2 FROM i3),
        |i1 AS (SELECT epoch, doc_id, perm, xor(r2,
        |  ('0x' || substr(md5(concat(CAST(l2 AS VARCHAR), '|1|', CAST(epoch AS VARCHAR))), 1, 4))::BIGINT) AS l1, l2 AS r1 FROM i2),
        |i0 AS (SELECT epoch, doc_id, perm, xor(r1,
        |  ('0x' || substr(md5(concat(CAST(l1 AS VARCHAR), '|0|', CAST(epoch AS VARCHAR))), 1, 4))::BIGINT) AS l0, l1 AS r0 FROM i1)
        |SELECT epoch, doc_id, perm, l0 * 65536 + r0 AS recovered FROM i0
        |ORDER BY epoch, perm""".stripMargin)),

    // L134 — LUHN-VALIDATED CARD SCRUBBING: the corpus has no card
    // numbers, so candidates are minted doc_id-derived IDENTICALLY in
    // both engines (the c_pii_scrub convention) via the shared
    // check-digit dual — even docs get the valid check digit, odd docs
    // get it off by one. The engine then re-validates every candidate
    // with the Luhn HOF chain and scrubs ONLY checksum-valid numbers:
    // regex-matching but Luhn-failing strings (order ids, tracking
    // numbers) are kept, the precision gate regex-only PII lacks.
    Q("c_pii_luhn",
      (s, dir) => {
        val prefix = concat(lit("4"),
          lpad(pmod(col("doc_id"), lit(100000000L)).cast("string"), 8, "0"),
          lit("123456"))
        val check = Curation.luhnCheckDigit(prefix)
        val digit = when(pmod(col("doc_id"), lit(2L)) === 0, check)
          .otherwise(pmod(check + 1, lit(10)))
        Tables.documents(s, dir)
          .select(col("doc_id"), concat(prefix, digit.cast("string")).as("candidate"))
          .withColumn("luhn_ok", Curation.luhnValid(col("candidate")))
          .withColumn("clean",
            when(col("luhn_ok"), lit("<CARD>")).otherwise(col("candidate")))
          .orderBy(col("doc_id"))
      },
      Some("""WITH p AS (SELECT doc_id,
        |  concat('4', lpad(CAST(doc_id % 100000000 AS VARCHAR), 8, '0'), '123456') AS pre
        |  FROM documents),
        |k AS (SELECT doc_id, pre,
        |  (10 - (list_sum(list_transform(range(1, strlen(pre) + 1), i ->
        |    CASE WHEN (strlen(pre) + 1 - i + 1) % 2 = 0 THEN
        |      CASE WHEN CAST(substr(pre, CAST(i AS INTEGER), 1) AS INTEGER)*2 > 9
        |        THEN CAST(substr(pre, CAST(i AS INTEGER), 1) AS INTEGER)*2 - 9
        |        ELSE CAST(substr(pre, CAST(i AS INTEGER), 1) AS INTEGER)*2 END
        |      ELSE CAST(substr(pre, CAST(i AS INTEGER), 1) AS INTEGER) END)) % 10)) % 10 AS chk
        |  FROM p),
        |c AS (SELECT doc_id, concat(pre,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN chk ELSE (chk + 1) % 10 END AS VARCHAR)) AS candidate
        |  FROM k),
        |v AS (SELECT doc_id, candidate,
        |  (list_sum(list_transform(range(1, strlen(candidate) + 1), i ->
        |    CASE WHEN (strlen(candidate) - i + 1) % 2 = 0 THEN
        |      CASE WHEN CAST(substr(candidate, CAST(i AS INTEGER), 1) AS INTEGER)*2 > 9
        |        THEN CAST(substr(candidate, CAST(i AS INTEGER), 1) AS INTEGER)*2 - 9
        |        ELSE CAST(substr(candidate, CAST(i AS INTEGER), 1) AS INTEGER)*2 END
        |      ELSE CAST(substr(candidate, CAST(i AS INTEGER), 1) AS INTEGER) END)) % 10 = 0) AS luhn_ok
        |  FROM c)
        |SELECT doc_id, candidate, luhn_ok,
        |  CASE WHEN luhn_ok THEN '<CARD>' ELSE candidate END AS clean
        |FROM v ORDER BY doc_id""".stripMargin)),

    // L80 — RENDEZVOUS (HRW) SHARDING: shard = argmax over s of
    // md5(id|s) — scaling k→k+1 moves docs only TO the new shard
    // (~1/(k+1) of the layout), never between old ones; entirely
    // map-side (transform + array_max over (h, shard) structs), no
    // shuffle, assignment a pure function of (id, k).
    Q("c_rendezvous_shard",
      (s, dir) => Curation.rendezvousAssign(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id", 8)
        .orderBy(col("doc_id")),
      Some("""WITH u AS (SELECT unnest(range(8)) AS s),
        |sc AS (SELECT doc_id, u.s AS shard,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
        |      || CAST(u.s AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents, u),
        |r AS (SELECT doc_id, shard, h,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, shard DESC) AS rn
        |  FROM sc)
        |SELECT doc_id, shard, h FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // L81 — CALIBRATED QUALITY GATE: keep each source's top 30% by the
    // integer stopword-density score — per-source calibration so one
    // global threshold can't empty a systematically-lower-scoring
    // source. Exact-rank reference semantics; the 100 TB path swaps
    // the per-source window for an L45-sketch threshold broadcast.
    Q("c_quality_calibrated",
      (s, dir) => {
        val t = TextOps.tokens(col("text"))
        val scored = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            size(t).cast("long").as("nt"),
            TextOps.stopwordHits(t, TextOps.langMarkers.head._2).as("hits"))
          .withColumn("score", expr(
            "CASE WHEN nt = 0 THEN 0L ELSE (hits * 1000000L) div nt END"))
        Curation.calibratedQualityGate(scored, "doc_id", "source", "score",
            keepNum = 3, keepDen = 10)
          .withColumnRenamed("rank", "q_rank")
          .orderBy(col("doc_id"))
      },
      Some("""WITH s0 AS (SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |sc AS (SELECT doc_id, source, CAST(CASE WHEN len(toks) = 0 THEN 0
        |    ELSE (CAST(len(list_filter(toks,
        |        t -> list_contains(['the','a','of','and','to','in'], t))) AS BIGINT)
        |      * 1000000) // CAST(len(toks) AS BIGINT) END AS BIGINT) AS score
        |  FROM s0),
        |r AS (SELECT doc_id, source, score,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY score DESC, doc_id) AS BIGINT) AS q_rank,
        |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM sc)
        |SELECT doc_id, source, score, q_rank, n,
        |  q_rank * 10 <= 3 * n AS keep
        |FROM r ORDER BY doc_id""".stripMargin)),

    // L82 / §2.10 — STREAMING EXACT DEDUP: `dropDuplicates` on the
    // content fingerprint in append mode — the stateful streaming
    // operator whose state is the seen-key set (at 100 TB you bound it
    // with dropDuplicatesWithinWatermark; run-to-completion on a
    // finite backfill needs no expiry). Emitting ONLY the key column
    // makes the result a set — order-independent across any file
    // split, so the batch DISTINCT is an exact oracle.
    Q("streaming_dedup",
      (s, dir) => withStreamingPartitions(s) {
        val base = Tables.documents(s, dir)
        val name = "sd_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_sd").toString
        val srcDir = stagedStreamSource("docs_r2", dir)(p =>
          base.repartition(2).write.mode("overwrite").parquet(p.toString))
        val dd = s.readStream.schema(base.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
          .select(md5(col("text")).as("fp"))
          .dropDuplicates("fp")
        val q = dd.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt)) // srcDir is shared, JVM-exit cleaned
        s.table(name).orderBy(col("fp"))
      },
      Some("SELECT DISTINCT md5(text) AS fp FROM documents ORDER BY fp")),

    // L82 — STREAMING DEDUP, WATERMARK-BOUNDED STATE: the live-stream
    // flavor of `streaming_dedup` — `dropDuplicatesWithinWatermark`
    // keeps the seen-key set only within the event-time horizon, the
    // operator an unbounded stream NEEDS (plain dropDuplicates state
    // grows forever). The delay here exceeds the table's whole time
    // span, so nothing is evicted mid-run and the batch DISTINCT stays
    // an exact oracle; StreamingSpec separately pins the EVICTION
    // contract (seen keys re-emit once the watermark passes them and
    // state shrinks). Emitting only the key column keeps the result a
    // set, order-independent across file splits.
    Q("streaming_dedup_wm",
      (s, dir) => withStreamingPartitions(s) {
        val base = Tables.events(s, dir)
        val name = "sdw_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_sdw").toString
        val srcDir = stagedStreamSource("events_r2", dir)(p =>
          base.repartition(2).write.mode("overwrite").parquet(p.toString))
        val st = s.readStream.schema(base.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
        // ts may be TIMESTAMP_NTZ depending on the round's parquet
        // physical type; the watermark needs LTZ — go through exact
        // epoch micros (Tables.tsUs) like every other streaming query
        val dd = st
          .withColumn("wts", timestamp_micros(Tables.tsUs(st)))
          .withWatermark("wts", "3650 days")
          .select(col("wts"),
            md5(concat_ws("|", col("user_id").cast("string"),
              col("event_type"))).as("fp"))
          .dropDuplicatesWithinWatermark("fp")
          .select(col("fp"))
        val q = dd.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt))
        s.table(name).orderBy(col("fp"))
      },
      Some("""SELECT DISTINCT md5(concat(CAST(user_id AS VARCHAR), '|', event_type)) AS fp
        |FROM events ORDER BY fp""".stripMargin)),

    // L83 — INVERTED-INDEX HEAD BLOCKS with delta-gap encoding: per
    // term, document frequency plus the FIRST 32 postings (ascending
    // doc id) as gaps — the bounded-state head block every
    // impact-ordered index keeps hot (Lucene's skip-list first tier);
    // TopKAgg on -doc_id means ≤ 32 pairs per term per map partition
    // cross the shuffle, never a full posting list (hot terms are
    // exactly where collect_list would OOM).
    Q("r_index_head",
      (s, dir) => {
        val topk = udaf(new graft.expr.TopKAgg(32))
        // one row per doc -> per-doc array_distinct IS the (doc, term)
        // distinct; no extra shuffle needed before the aggregate
        val posts = Tables.documents(s, dir)
          .select(col("doc_id"), explode(array_distinct(
            TextOps.tokens(col("text")))).as("term"))
        posts.groupBy(col("term"))
          .agg(count(lit(1)).as("df"), topk(-col("doc_id"), col("doc_id")).as("tk"))
          .filter(col("df") >= 3)
          .withColumn("heads", transform(col("tk"), x => x.getField("id")))
          .withColumn("gaps", transform(col("heads"), (x, i) =>
            when(i === 0, x).otherwise(x - element_at(col("heads"), i))))
          // array_join to a string: the driver's pandas comparator
          // cannot sort/hash raw array cells
          .select(col("term"), col("df"),
            array_join(col("gaps").cast("array<string>"), ",").as("gaps"))
          .orderBy(col("term"))
      },
      Some("""WITH t0 AS (SELECT doc_id,
        |    unnest(list_distinct(list_filter(string_split(text, ' '),
        |      x -> x != ''))) AS term
        |  FROM documents),
        |g AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
        |    (list_sort(list(doc_id)))[1:32] AS heads
        |  FROM t0 GROUP BY term),
        |d AS (SELECT term, df,
        |    list_transform(heads, (x, i) -> CASE WHEN i = 1 THEN x
        |      ELSE x - heads[i - 1] END) AS gaps
        |  FROM g WHERE df >= 3)
        |SELECT term, df, array_to_string(gaps, ',') AS gaps
        |FROM d ORDER BY term""".stripMargin)),

    // L84 — TEMPERATURE-SCALED MIXTURE (τ = 2): allocation weights
    // n^(1/τ) = isqrt(n) flatten the language distribution between
    // proportional (τ=1, c_mix_weights) and uniform (τ→∞) — the
    // standard multilingual sampling knob (mT5 §3.1). isqrt is double
    // sqrt + a ±1 Newton correction, exact for ALL int64 (the naked
    // floor(sqrt) is only trustworthy below 2^52); the allocation
    // reuses Hamilton largest-remainder.
    Q("c_mix_temperature",
      (s, dir) => {
        val totals = Tables.documents(s, dir).groupBy(col("lang"))
          .agg(sum(col("n_chars")).as("n"))
        val s0 = floor(sqrt(col("n").cast("double"))).cast("long")
        val s1 = s0 - when(s0 * s0 > col("n"), 1L).otherwise(0L)
        val isq = s1 + when((s1 + lit(1L)) * (s1 + lit(1L)) <= col("n"), 1L)
          .otherwise(0L)
        Curation.allocateBudget(totals.select(col("lang"), isq.as("w")),
            "lang", "w", budget = 100000L)
          .withColumnRenamed("tokens", "w")
          .orderBy(col("lang"))
      },
      Some("""WITH t AS (SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS n
        |  FROM documents GROUP BY lang),
        |i0 AS (SELECT lang, n,
        |    CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS s0 FROM t),
        |i1 AS (SELECT lang, n,
        |    s0 - CASE WHEN s0 * s0 > n THEN 1 ELSE 0 END AS s1 FROM i0),
        |iq AS (SELECT lang, CAST(s1 + CASE WHEN (s1 + 1) * (s1 + 1) <= n
        |    THEN 1 ELSE 0 END AS BIGINT) AS w FROM i1),
        |ww AS (SELECT lang, w, CAST(SUM(w) OVER () AS BIGINT) AS T FROM iq),
        |f AS (SELECT lang, w, (100000 * w) // T AS fl,
        |  (100000 * w) % T AS rem FROM ww),
        |r AS (SELECT lang, w, fl,
        |  row_number() OVER (ORDER BY rem DESC, lang) AS rk,
        |  100000 - CAST(SUM(fl) OVER () AS BIGINT) AS leftover FROM f)
        |SELECT lang, w,
        |  CAST(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r ORDER BY lang""".stripMargin)),

    // L85 — EDIT-DISTANCE DEDUP: SNM candidates (L78's stage, any
    // verifier plugs in) verified by relative Levenshtein ≤ 10% of the
    // longer text — the record-linkage verifier for short fields. The
    // |len_a − len_b| lower bound gates the O(L²) DP.
    Q("dedup_edit_distance",
      (s, dir) => Dedup.editDistancePairs(
          Tables.documents(s, dir),
          Dedup.sortedNeighborhoodCandidates(Tables.documents(s, dir),
            "doc_id", "text", keyChars = 16, blockChars = 2, window = 4),
          "doc_id", "text", maxDistPermille = 100)
        .orderBy(col("a"), col("b")),
      Some("""WITH kb AS (SELECT doc_id,
        |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 16) AS snm_key,
        |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 2) AS snm_blk
        |  FROM documents),
        |ld AS (SELECT doc_id, lead(doc_id, 1) OVER w AS l1,
        |    lead(doc_id, 2) OVER w AS l2, lead(doc_id, 3) OVER w AS l3
        |  FROM kb WINDOW w AS (PARTITION BY snm_blk ORDER BY snm_key, doc_id)),
        |cand AS (SELECT DISTINCT least(doc_id, l) AS a, greatest(doc_id, l) AS b
        |  FROM (SELECT doc_id, unnest([l1, l2, l3]) AS l FROM ld) t
        |  WHERE l IS NOT NULL),
        |ed AS (SELECT c.a, c.b, da.text AS ta, db.text AS tb FROM cand c
        |  JOIN documents da ON da.doc_id = c.a
        |  JOIN documents db ON db.doc_id = c.b),
        |lf AS (SELECT a, b, ta, tb,
        |    CAST(length(ta) AS BIGINT) AS len_a,
        |    CAST(length(tb) AS BIGINT) AS len_b FROM ed
        |  WHERE abs(length(ta) - length(tb)) * 1000
        |    <= greatest(length(ta), length(tb)) * 100),
        |dd AS (SELECT a, b, CAST(levenshtein(ta, tb) AS BIGINT) AS dist,
        |    len_a, len_b FROM lf)
        |SELECT a, b, dist, len_a, len_b FROM dd
        |WHERE dist * 1000 <= greatest(len_a, len_b) * 100
        |ORDER BY a, b""".stripMargin)),

    // L86 — SUBSET-CONTAINMENT dedup: common/min(|A|,|B|) ≥ 0.8 — the
    // asymmetric measure that catches a short doc quoted whole inside
    // a long one (Jaccard ≈ |small|/|large| ≈ 0 there). Candidates
    // share a rare shingle (df ≤ 50), commons count over ALL shingles,
    // the gate is integer, the score one division.
    Q("dedup_containment",
      (s, dir) => Dedup.containmentPairs(
          sessionShingles(s, dir),
          "doc_id", minContainPermille = 800, maxShingleDocFreq = 50L)
        .orderBy(col("a"), col("b")),
      Some(s"""WITH $shingleSqlCte,
        |fq AS (SELECT shingle FROM (SELECT shingle, COUNT(*) AS df FROM sd GROUP BY shingle) t
        |  WHERE df <= 50),
        |rs AS (SELECT sd.doc_id, sd.shingle FROM sd JOIN fq ON fq.shingle = sd.shingle),
        |cand AS (SELECT DISTINCT sa.doc_id AS a, sb.doc_id AS b
        |  FROM rs sa JOIN rs sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id),
        |co AS (SELECT t.a, t.b, COUNT(*) AS common FROM (
        |    SELECT c.a, c.b, x.shingle FROM cand c
        |    JOIN sd x ON x.doc_id = c.a
        |    JOIN sd y ON y.doc_id = c.b AND y.shingle = x.shingle) t
        |  GROUP BY t.a, t.b),
        |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sd GROUP BY doc_id),
        |j AS (SELECT co.a, co.b, CAST(co.common AS BIGINT) AS common,
        |    CAST(na.n_sh AS BIGINT) AS na, CAST(nb.n_sh AS BIGINT) AS nb
        |  FROM co JOIN n na ON na.doc_id = co.a JOIN n nb ON nb.doc_id = co.b)
        |SELECT a, b, common, na, nb,
        |  CAST(common AS DOUBLE) / CAST(least(na, nb) AS DOUBLE) AS containment
        |FROM j WHERE common * 1000 >= 800 * least(na, nb)
        |ORDER BY a, b""".stripMargin)),

    // L87 — MAD ROBUST OUTLIERS: the median/MAD complement of L77 —
    // mean and σ are dragged by the very outliers they hunt; median
    // and MAD have 50% breakdown. Lower median = exact rank selection
    // at (n+1) div 2, gate dev·2 > 9·mad (≈ the 3·1.4826 rule), all
    // integer; two rank passes, 1-row-per-group results broadcast.
    Q("e_mad_outliers",
      (s, dir) => EventAnalytics.madOutliers(
          evPoints(s, dir)
            .select(col("event_id"), col("event_type"), col("cents")),
          "event_type", "cents", num = 9, den = 2)
        .select(col("event_id"), col("event_type"), col("cents"),
          col("med"), col("dev"), col("mad"), col("is_outlier"))
        .orderBy(col("event_id")),
      Some(s"""WITH $evPointsSqlCte,
        |r1 AS (SELECT event_type, cents,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY cents) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n FROM e),
        |md AS (SELECT event_type, cents AS med FROM r1 WHERE rn = (n + 1) // 2),
        |dv AS (SELECT e.event_id, e.event_type, e.cents, md.med,
        |    abs(e.cents - md.med) AS dev
        |  FROM e JOIN md USING (event_type)),
        |r2 AS (SELECT event_type, dev,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY dev) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n FROM dv),
        |mad AS (SELECT event_type, dev AS mad FROM r2 WHERE rn = (n + 1) // 2)
        |SELECT dv.event_id, dv.event_type, dv.cents, dv.med, dv.dev, mad.mad,
        |  dv.dev * 2 > mad.mad * 9 AS is_outlier
        |FROM dv JOIN mad USING (event_type) ORDER BY dv.event_id""".stripMargin)),

    // L88 — MULTI-TOUCH LINEAR ATTRIBUTION: each purchase's cents split
    // EXACTLY across the user's views in the preceding 24 h — base
    // share cents div k, the cents mod k remainder one cent each to
    // the earliest touches (largest-remainder on equal quotas), so
    // credit conserves per conversion bit-for-bit. Interval join
    // carries the user equi key; the rank window partitions on the
    // conversion id.
    Q("e_attribution",
      (s, dir) => {
        val e = evPoints(s, dir)
        EventAnalytics.linearAttribution(
            e.filter(col("event_type") === "view")
              .select(col("user_id"), col("event_id").as("touchId"),
                col("tus")),
            e.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("event_id").as("convId"),
                col("tus"), col("cents")),
            "user_id", windowUs = 86400000000L)
          .select(col("touchId").as("touch_id"), col("user_id"),
            col("n_convs"), col("attributed_cents"))
          .orderBy(col("touch_id"))
      },
      Some(s"""WITH $evPointsSqlCte,
        |v AS (SELECT user_id, event_id AS touch_id, tus FROM e WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS conv_id, tus, cents FROM e WHERE event_type = 'purchase'),
        |tp AS (SELECT p.user_id, p.conv_id, p.cents, v.touch_id, v.tus AS t_tus
        |  FROM p JOIN v ON v.user_id = p.user_id
        |    AND v.tus <= p.tus AND v.tus > p.tus - 86400000000),
        |rk AS (SELECT user_id, conv_id, cents, touch_id,
        |    CAST(row_number() OVER (PARTITION BY conv_id ORDER BY t_tus, touch_id) AS BIGINT) AS rk,
        |    CAST(COUNT(*) OVER (PARTITION BY conv_id) AS BIGINT) AS k FROM tp),
        |cr AS (SELECT user_id, conv_id, touch_id,
        |    cents // k + CASE WHEN rk <= cents % k THEN 1 ELSE 0 END AS credit FROM rk)
        |SELECT touch_id, user_id, CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
        |  CAST(SUM(credit) AS BIGINT) AS attributed_cents
        |FROM cr GROUP BY touch_id, user_id ORDER BY touch_id""".stripMargin)),

    // L89 — CUSUM DRIFT DETECTION (Page 1954), window-exact: the
    // sequential S_i = max(0, S_{i-1} + x_i) recursion closed-form over
    // prefix sums (S_i = P_i − min(0, min_{j≤i} P_j)) — one shuffle,
    // two cumulative windows, no per-key fold; target = the group's
    // lower median (rank-selected, outlier-robust), all integers.
    Q("e_cusum_drift",
      (s, dir) => {
        val e = evPoints(s, dir)
          .select(col("event_id"), col("event_type"), col("tus"),
            col("cents"))
        val med = e.select(col("event_type"), col("cents"))
          .withColumn("__rn", row_number().over(
            Window.partitionBy(col("event_type")).orderBy(col("cents")))
            .cast("long"))
          .withColumn("__n", count(lit(1)).over(
            Window.partitionBy(col("event_type"))))
          .filter(col("__rn") === expr("(__n + 1) div 2"))
          .select(col("event_type"), col("cents").as("target"))
        EventAnalytics.cusumDrift(e, med, "event_type", "cents", "tus",
            "event_id", h = 2000000L)
          .select(col("event_id"), col("event_type"), col("cents"),
            col("drift"), col("cusum"), col("alarm"))
          .orderBy(col("event_id"))
      },
      Some(s"""WITH $evPointsSqlCte,
        |r1 AS (SELECT event_type, cents,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY cents) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n FROM e),
        |md AS (SELECT event_type, cents AS target FROM r1 WHERE rn = (n + 1) // 2),
        |dr AS (SELECT e.event_id, e.event_type, e.tus, e.cents,
        |    e.cents - md.target AS drift FROM e JOIN md USING (event_type)),
        |ps AS (SELECT *, CAST(SUM(drift) OVER w AS BIGINT) AS p FROM dr
        |  WINDOW w AS (PARTITION BY event_type ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |cs AS (SELECT event_id, event_type, cents, drift,
        |    p - least(0, MIN(p) OVER w) AS cusum FROM ps
        |  WINDOW w AS (PARTITION BY event_type ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type, cents, drift,
        |  CAST(cusum AS BIGINT) AS cusum, cusum > 2000000 AS alarm
        |FROM cs ORDER BY event_id""".stripMargin)),

    // L90 — INTERLEAVED EPOCH ORDER: reproducible per-source seeded
    // shuffle + round-robin source interleave; the global rank is a
    // CLOSED FORM of (within-source pos, the |sources|-row size table)
    // — no global sort at any scale.
    Q("c_epoch_interleave",
      (s, dir) => Curation.interleavedEpochOrder(
          Tables.documents(s, dir), "doc_id", "source", seed = 7L)
        .select(col("doc_id"), col("source"), col("pos"), col("epoch_rank"))
        .orderBy(col("epoch_rank"), col("doc_id")),
      Some("""WITH h AS (SELECT doc_id, source,
        |    ('0x' || substr(md5('7|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents),
        |p AS (SELECT doc_id, source, CAST(row_number() OVER (
        |    PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS pos FROM h),
        |sz AS (SELECT source AS s2, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents GROUP BY source)
        |SELECT p.doc_id, p.source, p.pos,
        |  CAST(SUM(least(p.pos - 1, sz.n))
        |    + SUM(CASE WHEN sz.s2 < p.source AND sz.n >= p.pos THEN 1 ELSE 0 END)
        |    + 1 AS BIGINT) AS epoch_rank
        |FROM p CROSS JOIN sz GROUP BY p.doc_id, p.source, p.pos
        |ORDER BY epoch_rank, doc_id""".stripMargin)),

    // L91 — OOV RATE vs a df-fraction-truncated vocabulary: vocab =
    // tokens in ≥ 78% of docs (integer cross-multiplied gate — no
    // global top-k sort), per-doc out-of-vocab token-occurrence
    // fraction; vocab broadcasts into the token scan.
    Q("t_oov_rate",
      (s, dir) => Curation.oovRate(
          Tables.documents(s, dir), "doc_id", "text", dfNum = 78, dfDen = 100)
        .select(col("doc_id"), col("n_tokens"), col("n_oov"), col("oov_rate"))
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
        |  FROM documents),
        |nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents),
        |v AS (SELECT tok FROM (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |    FROM t GROUP BY tok) x, nd WHERE df * 100 >= 78 * n_docs)
        |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS oov_rate
        |FROM t LEFT JOIN v ON v.tok = t.tok
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin)),

    // L92 — STREAMING CUSUM run to completion: the sequential detector
    // under arrival disorder — rows buffer in group state until the
    // watermark proves their order final, then fold through the
    // (p, m) two-long prefix state in exact (ts, tie) event order.
    // Event MICROS ride the watermark clock's millis field; one
    // far-future heartbeat row on a sentinel key advances the global
    // watermark past every real event and the trailing timeout batch
    // flushes every group. Same oracle as e_cusum_drift (minus the
    // heartbeat), whatever the file split.
    Q("streaming_cusum",
      (s, dir) => withStreamingPartitions(s) {
        import s.implicits._
        val path = s"$dir/events.parquet"
        val base = s.read.parquet(path)
        val schema = base.schema
        val name = "sc_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_cusum").toString
        // staged once per session: sentinel content is deterministic
        val srcDir = stagedStreamSource("cusumsrc", dir) { p =>
          linkInto(p, path, "events.parquet")
          val maxUs = base.select(Tables.tsUs(base).as("us"))
            .agg(max(col("us"))).head.getLong(0)
          val sentinel = s.range(1).select(schema.fields.toSeq.map { f => f.name match {
            case "user_id" => lit(-1L).cast(f.dataType).as("user_id")
            case "event_id" => lit(-1L).cast(f.dataType).as("event_id")
            case "event_type" => lit("__hb").as("event_type")
            case "value" => lit(0d).cast(f.dataType).as("value")
            case "ts" =>
              Tables.usToTs(lit(maxUs + 864000L * 1000000L), f.dataType).as("ts")
            case other => lit(null).cast(f.dataType).as(other)
          }}: _*)
          writeHeartbeat(sentinel, p)
        }
        // batch-side model: the per-type lower-median target (config at
        // production scale; here derived once, like streaming_decayed's
        // bounds), broadcast into each micro-batch stream-static
        val e = evPoints(s, dir)
        val med = e.select(col("event_type"), col("cents"))
          .withColumn("__rn", row_number().over(
            Window.partitionBy(col("event_type")).orderBy(col("cents")))
            .cast("long"))
          .withColumn("__n", count(lit(1)).over(
            Window.partitionBy(col("event_type"))))
          .filter(col("__rn") === expr("(__n + 1) div 2"))
          .select(col("event_type"), col("cents").as("target"))
        val rawStream = s.readStream.schema(schema).parquet(srcDir)
        val in = rawStream
          .select(col("event_type"), col("event_id"),
            Tables.tsUs(rawStream).as("tus"),
            round(col("value") * 100d).cast("long").as("cents"))
          .join(broadcast(med), Seq("event_type"), "left")
          .select(col("event_type").as("k"),
            timestamp_millis(col("tus")).as("ts"),
            col("event_id").as("tie"),
            (col("cents") - coalesce(col("target"), lit(0L))).as("drift"))
          .as[graft.streaming.TemporalEnrich.CusumInput]
        val out = graft.streaming.TemporalEnrich.eventTimeCusum(
          in, "0 seconds", h = 2000000L)
        val q = out.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        cleanupDirs(java.nio.file.Paths.get(ckpt)) // srcDir shared, JVM-exit cleaned
        s.table(name).filter(col("k") =!= "__hb")
          .select(col("tie").as("event_id"), col("k").as("event_type"),
            col("ts").as("tus"), col("drift"), col("cusum"), col("alarm"))
          .orderBy(col("event_id"))
      },
      Some(s"""WITH $evPointsSqlCte,
        |r1 AS (SELECT event_type, cents,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY cents) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n FROM e),
        |md AS (SELECT event_type, cents AS target FROM r1 WHERE rn = (n + 1) // 2),
        |dr AS (SELECT e.event_id, e.event_type, e.tus,
        |    e.cents - md.target AS drift FROM e JOIN md USING (event_type)),
        |ps AS (SELECT *, CAST(SUM(drift) OVER w AS BIGINT) AS p FROM dr
        |  WINDOW w AS (PARTITION BY event_type ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |cs AS (SELECT event_id, event_type, tus, drift,
        |    p - least(0, MIN(p) OVER w) AS cusum FROM ps
        |  WINDOW w AS (PARTITION BY event_type ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type, tus, drift,
        |  CAST(cusum AS BIGINT) AS cusum, cusum > 2000000 AS alarm
        |FROM cs ORDER BY event_id""".stripMargin)),

    // L93 — CHAO1 capture-recapture corpus-size estimate per language:
    // d + f1(f1−1)/(2(f2+1)) from the duplicate-count histogram — the
    // crawl-planning complement of dedup (many singletons relative to
    // doubletons ⇒ keep crawling; f1 ≈ 0 ⇒ saturation). Two hash aggs,
    // all integers until the one division.
    Q("c_chao1_estimate",
      (s, dir) => Curation.chao1Estimate(
          Tables.documents(s, dir), "lang",
          TextOps.fingerprint(col("text"), 200))
        .select(col("lang"), col("n_obs"), col("d_distinct"), col("f1"),
          col("f2"), col("chao1"))
        .orderBy(col("lang")),
      Some("""WITH fp AS (SELECT lang,
        |    md5(substr(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 200)) AS fp
        |  FROM documents),
        |cnt AS (SELECT lang, fp, CAST(COUNT(*) AS BIGINT) AS c FROM fp GROUP BY lang, fp)
        |SELECT lang, CAST(SUM(c) AS BIGINT) AS n_obs,
        |  CAST(COUNT(*) AS BIGINT) AS d_distinct,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |  CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
        |  CAST(COUNT(*) AS DOUBLE)
        |    + CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
        |        * (SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1) AS DOUBLE)
        |      / CAST(2 * (SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1) AS DOUBLE) AS chao1
        |FROM cnt GROUP BY lang ORDER BY lang""".stripMargin)),

    // L94 — DISORDER PROFILE: per-user arrival-lag max and exact-rank
    // p99 — the measured watermark SLA for §2.10. Arrival order is the
    // event time plus a deterministic md5-derived ingest jitter (≤ 1
    // day), applied identically in both engines.
    Q("e_disorder_profile",
      (s, dir) => {
        val jitter = pmod(conv(substring(md5(col("event_id").cast("string")),
          1, 15), 16, 10).cast("long"), lit(86400000000L))
        EventAnalytics.disorderProfile(
            evPoints(s, dir).select(col("user_id"), col("event_id"),
              col("tus"), (col("tus") + jitter).as("arr")),
            "user_id", "tus", "arr", "event_id")
          .select(col("user_id"), col("n"), col("n_late"),
            col("max_lag_us"), col("p99_lag_us"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH $evPointsSqlCte,
        |a AS (SELECT user_id, event_id, tus,
        |    tus + ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
        |      % 86400000000 AS arr FROM e),
        |lg AS (SELECT user_id, arr, event_id,
        |    CAST(MAX(tus) OVER (PARTITION BY user_id ORDER BY arr, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tus AS BIGINT) AS lag
        |  FROM a),
        |r AS (SELECT user_id, lag,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY lag, arr, event_id) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n FROM lg),
        |p99 AS (SELECT user_id, lag AS p99_lag_us FROM r WHERE rn = (99 * n + 99) // 100),
        |ag AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN lag > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |    CAST(MAX(lag) AS BIGINT) AS max_lag_us FROM lg GROUP BY user_id)
        |SELECT ag.user_id, ag.n, ag.n_late, ag.max_lag_us, p99.p99_lag_us
        |FROM ag JOIN p99 USING (user_id) ORDER BY ag.user_id""".stripMargin))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    // a duplicated name would silently shadow the earlier query in the
    // Map (it happened: two streaming_dedup flavors) — fail loudly
    val names = registry.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    registry.map(q => q.name -> q.fn).toMap
  }

  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.sql.map(q.name -> _)).toMap
}
