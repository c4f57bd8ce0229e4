package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dedup, SegmentOps, Similarity, TextOps}

/** Shared infrastructure of the query registry (split from SparkEntry):
  * the Q entry shape, session-lifetime memos of cross-family
  * intermediates, streaming staging, the loopback fixture service, and
  * the DuckDB CTE fragments shared by many oracles. See SparkEntry for
  * the driver contract and the determinism policy.
  */
private[graft] object QuerySupport {

  private[graft] val HOUR_US = 3600L * 1000000L

  /** events as (user_id, event_id, tus, cents) point rows; time in exact
    * integer microseconds (= DuckDB `epoch_us(ts)`).
    */
  private[graft] def evPoints(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    ev.select(
      col("user_id"), col("event_id"), col("event_type"),
      Tables.tsUs(ev).as("tus"),
      round(col("value") * 100d).cast("long").as("cents"))
  }

  private[graft] val evPointsSqlCte =
    """e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
      |  CAST(round(value*100) AS BIGINT) AS cents FROM events)""".stripMargin

  /** The derived event link graph shared by the L115/L117 centrality
    * oracles: browse-chain edges (each event → the user's next) plus
    * type-hub edges (each event → the earliest event of its type), with
    * node set and out-degrees. Mirrors the Spark-side derivation in
    * `g_pagerank`/`g_ppr` exactly.
    */
  private[graft] val eventGraphSqlCte =
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
  private[graft] val shotOracleSql =
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

  /** The L181/L186 calibration-bin oracle — the reliability table over
    * the minted e6 scores; shared by batch m_ece and its streaming
    * twin (a streaming groupBy-bin aggregation must converge to the
    * identical table).
    */
  private[graft] val eceOracleSql =
    """WITH sc AS (SELECT (doc_id * 7919) % 1000001 AS s,
      |    CASE WHEN (doc_id * 104729) % 1000001 < (doc_id * 7919) % 1000001
      |      THEN 1 ELSE 0 END AS y
      |  FROM documents)
      |SELECT CAST(least(s // 100000, 9) AS BIGINT) AS bin,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(s) AS BIGINT) AS sum_conf_e6,
      |  CAST(SUM(y) AS BIGINT) AS n_pos,
      |  CAST(abs(SUM(s) - SUM(y) * 1000000) AS BIGINT) AS gap_e6_num,
      |  CAST(SUM(s) AS DOUBLE) / CAST(COUNT(*) * 1000000 AS DOUBLE) AS conf,
      |  CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS acc
      |FROM sc GROUP BY 1 ORDER BY bin""".stripMargin

  /** L197 shared mint — the script-mix fixture: per doc_id % 6 the
    * (truncated) text gains a dominating Cyrillic run, a dominating
    * CJK run, a 25% Cyrillic tail (mixed but Latin-dominant), a
    * mojibake tail (UTF-8 'é' double-encoded as 'Ã©'), or one exemplar
    * of the six remaining script classes rotating on doc_id div 6.
    * ONE string, interpolated verbatim into BOTH engines (`div` is the
    * integer-divide token: "div" Spark / "//" DuckDB) over a relation
    * (doc_id, b).
    */
  private[graft] def scriptMintCase(div: String): String =
    s"""CASE doc_id % 6
       | WHEN 1 THEN concat(b, repeat('дата', CAST(length(b) AS INT)))
       | WHEN 2 THEN concat(b, repeat('数据中心', CAST(length(b) AS INT)))
       | WHEN 3 THEN concat(b, repeat('щ', CAST(length(b) $div 4 AS INT)))
       | WHEN 4 THEN concat(b, repeat('Ã©', CAST(length(b) $div 2 AS INT)))
       | WHEN 5 THEN concat(concat(b, ' '), CASE (doc_id $div 6) % 6
       |   WHEN 0 THEN 'سلام' WHEN 1 THEN 'שלום' WHEN 2 THEN 'नमस्ते'
       |   WHEN 3 THEN 'สวัสดี' WHEN 4 THEN '안녕하세요' ELSE 'γειά σου' END)
       | ELSE b END""".stripMargin

  /** L197 shared classify — the DuckDB mirror of
    * [[graft.ops.TextOps.scriptMix]], GENERATED from the same
    * scriptClasses table (classes shared verbatim; RE2 and Java regex
    * both take the `\x{XXXX}` range syntax; both engines' `length`
    * counts code points). Expects a CTE `t(doc_id, text)`; exposes
    * `sc3` with the per-doc gate row.
    */
  private[graft] val scriptMixSqlCtes: String = {
    val cls = graft.ops.TextOps.scriptClasses
    def strip(c: String) =
      s"CAST(length(text) - length(regexp_replace(text, '[$c]', '', 'g')) AS BIGINT)"
    val cnts = cls.map { case (n, c) => s"    ${strip(c)} AS n_$n" }
      .mkString(",\n")
    val names = cls.map(_._1)
    val sumExpr = names.map("n_" + _).mkString(" + ")
    val mxExpr = s"greatest(${names.map("n_" + _).mkString(", ")})"
    val dom = names.init.map(n => s"WHEN n_$n = mx THEN '$n'").mkString(" ")
    s"""sc1 AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       |$cnts,
       |    ${strip(graft.ops.TextOps.mojiLeadClass)} AS n_moji_lead
       |  FROM t),
       |sc2 AS (SELECT *, ($sumExpr) AS n_scripted, $mxExpr AS mx FROM sc1),
       |sc3 AS (SELECT doc_id, n_chars, ${names.map("n_" + _).mkString(", ")},
       |    CAST(n_scripted AS BIGINT) AS n_scripted,
       |    CAST(n_chars - n_scripted AS BIGINT) AS n_other, n_moji_lead,
       |    CASE WHEN n_scripted = 0 THEN 'none' $dom
       |      ELSE '${names.last}' END AS dominant_script,
       |    CAST(CASE WHEN n_scripted > 0 THEN (mx * 1000000) // n_scripted
       |      ELSE -1 END AS BIGINT) AS dominant_share_e6,
       |    n_scripted > 0 AND (n_scripted - mx) * 10 >= n_scripted AS mixed,
       |    n_chars > 0 AND n_moji_lead * 20 >= n_chars AS mojibake
       |  FROM sc2)""".stripMargin
  }

  /** The L197 per-script corpus profile — shared by the batch gate's
    * streaming twin (complete-mode counts at ingest must equal it).
    */
  private[graft] val scriptProfileOracleSql: String =
    s"""WITH tb AS (SELECT doc_id, substr(text, 1, 160) AS b FROM documents),
       |t AS (SELECT doc_id, ${scriptMintCase("//")} AS text FROM tb),
       |$scriptMixSqlCtes
       |SELECT dominant_script,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN mixed THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed,
       |  CAST(SUM(CASE WHEN mojibake THEN 1 ELSE 0 END) AS BIGINT) AS n_mojibake,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM sc3 GROUP BY 1 ORDER BY dominant_script""".stripMargin

  private[graft] val evIntervalsSqlCte =
    """i AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS s_us,
      |  epoch_us(ts) + CAST(round(value*1.0E6) AS BIGINT) AS e_us,
      |  CAST(round(value*100) AS BIGINT) AS cents FROM events)""".stripMargin

  /** Merged interval chunks per user (gap 1 h), the W1 interval-union CTE
    * shared by several queries.
    */
  private[graft] def chunks(s: SparkSession, dir: String): DataFrame =
    SegmentOps.coalesceIntervals(
        Tables.eventIntervals(s, dir), "user_id", "s_us", "e_us", "event_id",
        lit(HOUR_US))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("s_us")).as("start_us"), max(col("e_us")).as("end_us"),
        count(lit(1)).as("n_merged"))

  private[graft] val chunksSqlCte =
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
  // Query registry. Names carry the SURVEY §2 operator ids they cover.
  // ---------------------------------------------------------------------
  private[graft] case class Q(
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
  private[graft] def cleanupDirs(paths: java.nio.file.Path*): Unit =
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
  private[graft] val streamStageCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Session-keyed cache of the streaming-familiarity LM model tables
    * (bigram counts, unigram counts, vocab) — deterministic per corpus.
    * Keyed by the SparkSession INSTANCE (identity equality), never by a
    * hash: identityHashCode can collide across sessions and would hand
    * a new session DataFrames bound to a stopped one. Sessions per JVM
    * are few (one in Verify/Bench), so the pin is bounded.
    */
  private[graft] val lmModelCache =
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
  private[graft] val shingleMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private[graft] val minhashPairMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Stage a deterministic shared intermediate to session-lifetime
    * LOCAL PARQUET once and hand every consumer a scan of it — the
    * cluster-scale "checkpoint the candidate graph once, fan the
    * queries out over it" design, and the reason the memos survive
    * Bench's per-query `clearCache()`: an in-memory `.cache()` dies
    * with the cache sweep and every later consumer silently re-ran
    * the full candidate chain (~2.5 s/query of pure re-derivation at
    * sf0.1), whereas the parquet scan is a few ms of local I/O.
    * Values are exact across the round-trip (longs/strings/doubles
    * and arrays thereof are bit-preserved by parquet).
    */
  private[graft] def stagedRelation(tag: String, s: SparkSession, dir: String)(
      build: => DataFrame): DataFrame = {
    val path = streamStageCache.computeIfAbsent(s"rel_$tag|$dir", { _ =>
      val d = java.nio.file.Files.createTempDirectory(s"graft_rel_$tag")
      build.write.mode("overwrite").parquet(d.resolve("rel").toString)
      Runtime.getRuntime.addShutdownHook(new Thread(() => cleanupDirs(d)))
      d.resolve("rel").toString
    })
    s.read.parquet(path)
  }

  private[graft] def sessionShingles(s: SparkSession, dir: String): DataFrame =
    shingleMemo.computeIfAbsent((s, dir), { _ =>
      stagedRelation("shingles", s, dir)(graft.ops.TextOps.shingleTable(
        Tables.documents(s, dir), "doc_id", "text", 3))
    })

  private[graft] def sessionMinhashPairs(s: SparkSession, dir: String): DataFrame =
    minhashPairMemo.computeIfAbsent((s, dir), { _ =>
      stagedRelation("mhpairs", s, dir)(graft.ops.Dedup.minhashLshPairs(
        sessionShingles(s, dir), "doc_id", 8, 0.5))
    })

  /** The CC labels over [[sessionMinhashPairs]] — four queries
    * (components, source_flow, canonical_best, leakage split) each ran
    * the full O(log² n) star-contraction loop on the same graph; one
    * run per session now. Separate map: the loader calls
    * sessionMinhashPairs (same nesting rule as above).
    */
  private[graft] val ccLabelMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private[graft] def sessionCcLabels(s: SparkSession, dir: String): DataFrame =
    ccLabelMemo.computeIfAbsent((s, dir), { _ =>
      stagedRelation("cclabels", s, dir)(graft.ops.Dedup.connectedComponents(
        sessionMinhashPairs(s, dir), "a", "b")
        .withColumnRenamed("id", "doc_id"))
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
  private[graft] val quantEmbMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private[graft] val ivfCellMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private[graft] val ivfPairMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private[graft] def sessionQuantEmb(s: SparkSession, dir: String): DataFrame =
    quantEmbMemo.computeIfAbsent((s, dir), { _ =>
      stagedRelation("quantemb", s, dir)(Similarity.quantize(
        Tables.embeddings(s, dir), "vec_id", "embedding"))
    })

  private[graft] def sessionIvfCells(s: SparkSession, dir: String): DataFrame =
    ivfCellMemo.computeIfAbsent((s, dir), { _ =>
      stagedRelation("ivfcells", s, dir)(
        Similarity.ivfCells(sessionQuantEmb(s, dir), "vec_id"))
    })

  private[graft] def sessionIvfPairs(s: SparkSession, dir: String): DataFrame =
    ivfPairMemo.computeIfAbsent((s, dir), { _ =>
      stagedRelation("ivfpairs", s, dir)(Similarity.verifyPairs(
        Similarity.ivfCandidatesFrom(sessionIvfCells(s, dir), "vec_id"),
        sessionQuantEmb(s, dir), "vec_id", 0.45))
    })

  /** One BPE training run per session serves induction (t_bpe_merges)
    * AND application (t_bpe_encode) — same key rules as the shingle
    * memos. Value = (merge-rule table: a driver-local relation; fully
    * merged word table: already eagerly localCheckpoint-materialized
    * by the training loop, nothing further to cache).
    */
  private[graft] val bpeMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (DataFrame, DataFrame)]()

  private[graft] def sessionBpe(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    bpeMemo.computeIfAbsent((s, dir), { _ =>
      TextOps.bpeTrainFull(Tables.documents(s, dir), "text", 4)
    })

  /** Session-lifetime token-count fixture service driving
    * `svc_batch_inference` (one loopback server per JVM, closed at
    * exit). Wire: request `tag TAB doc_id TAB b64(text)` → response
    * `doc_id TAB n_tok`; any body containing the POISON tag answers 500
    * unconditionally (the injected-fault leg).
    */
  private[graft] lazy val tokenCountService: graft.pipeline.LineService = {
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

  private[graft] def stagedStreamSource(tag: String, dir: String)(
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
  private[graft] def writeHeartbeat(sentinel: DataFrame, dest: java.nio.file.Path,
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
  private[graft] def eventsWithPurchaseHeartbeat(s: SparkSession, dir: String,
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
  private[graft] def linkInto(d: java.nio.file.Path, path: String, asName: String): Unit = {
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
  private[graft] def withStreamingPartitions[T](s: SparkSession)(body: => T): T = {
    Tables.tune(s) // checkpoint-manager + tz confs, whoever built the session
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, math.min(8, old.toInt).toString)
    try body finally s.conf.set(key, old)
  }


  /** DuckDB CTEs shared by the text/dedup queries: tokens and distinct
    * word-3-gram shingles (the Spark side builds shingles with
    * higher-order functions — same result set, no window shuffle).
    */
  private[graft] val toksSqlCte =
    """d AS (SELECT doc_id, lang,
      |  list_filter(string_split(text, ' '), x -> x != '') AS toks FROM documents)""".stripMargin

  /** The decayed-counts oracle — shared by the batch
    * (`c_decayed_counts`) and streaming (`streaming_decayed`) flavors:
    * the weighted count is a sum of integer shifts, order-independent,
    * so one SQL mirror checks both.
    */
  private[graft] val decayedOracleSql: String =
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
  private[graft] val hhOracleSql: String =
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
  private[graft] def zorderOracleSql(bits: Int, rowsPerFile: Int): String = {
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

  /** Mirror of [[graft.ops.Curation.hilbertLayout]] on events: the
    * same bounds/buckets as the z-order oracle, then the xy2d fold
    * UNROLLED as one chained CTE per level with level-numbered columns
    * (gx0,gy0,hd0 → gx1,… — fresh names per level, so DuckDB's
    * lateral-alias binding can never read a same-SELECT updated
    * value), then the row_number file assembly.
    */
  private[graft] def hilbertOracleSql(bits: Int, rowsPerFile: Int): String = {
    val top = (1L << bits) - 1L
    val sb = new StringBuilder
    sb ++= s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id FROM events),
bn AS (SELECT MIN(user_id) AS n0, MAX(user_id) AS x0,
    MIN(tus) AS n1, MAX(tus) AS x1 FROM e),
h0 AS (SELECT e.*,
    CAST(CASE WHEN x0 = n0 THEN 0 ELSE ((user_id - n0) * $top) // (x0 - n0) END AS BIGINT) AS gx0,
    CAST(CASE WHEN x1 = n1 THEN 0 ELSE ((tus - n1) * $top) // (x1 - n1) END AS BIGINT) AS gy0,
    CAST(0 AS BIGINT) AS hd0
  FROM e, bn)"""
    var k = 0
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val k1 = k + 1
      sb ++= s""",
h$k1 AS (SELECT user_id, tus, event_id,
    CASE WHEN (gy$k & $s) = 0 THEN CASE WHEN (gx$k & $s) > 0
      THEN $top - gy$k ELSE gy$k END ELSE gx$k END AS gx$k1,
    CASE WHEN (gy$k & $s) = 0 THEN CASE WHEN (gx$k & $s) > 0
      THEN $top - gx$k ELSE gx$k END ELSE gy$k END AS gy$k1,
    hd$k + ${s * s} * xor(CASE WHEN (gx$k & $s) > 0 THEN 3 ELSE 0 END,
      CASE WHEN (gy$k & $s) > 0 THEN 1 ELSE 0 END) AS hd$k1
  FROM h$k)"""
      k = k1
    }
    sb ++= s""",
r AS (SELECT user_id, tus, event_id,
    row_number() OVER (ORDER BY hd$k, event_id) AS rn FROM h$k)
SELECT CAST((rn - 1) // $rowsPerFile AS BIGINT) AS file_id,
  CAST(COUNT(*) AS BIGINT) AS n,
  MIN(user_id) AS min_user_id, MAX(user_id) AS max_user_id,
  MIN(tus) AS min_tus, MAX(tus) AS max_tus
FROM r GROUP BY 1 ORDER BY 1"""
    sb.toString
  }

  /** The k-round BPE training loop unrolled as chained CTEs — each
    * round: adjacent-pair counts over the delimited symbol strings, the
    * deterministic argmax, and the greedy `replace` merge feeding the
    * next round (every round's merge applied, so w`k` is the fully
    * encoded word table [[bpeEncodeOracleSql]] reads). Mirrors
    * [[graft.ops.TextOps.bpeTrainMerges]]/`bpeEncode` exactly.
    */
  private[graft] def bpeChainSql(rounds: Int): String = {
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

  private[graft] def bpeOracleSql(rounds: Int): String =
    bpeChainSql(rounds) +
      (1 to rounds).map(r =>
        s"\nSELECT $r AS round, a, b, a || b AS merged, cnt FROM b$r")
        .mkString("", "\nUNION ALL", "") +
      "\nORDER BY round"

  /** Tokenize-the-corpus mirror: split the fully merged word table back
    * into symbols and roll the frequency-weighted vocabulary histogram.
    */
  private[graft] def bpeEncodeOracleSql(rounds: Int): String =
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
  private[graft] val langProfileSqlValues: String = TextOps.langTrigramProfiles
    .map { case (l, i, t, w) => s"('$l', $i, '$t', $w)" }.mkString(", ")

  private[graft] val shingleSqlCte =
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
  private[graft] val nearDupCcSqlCtes =
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

  private[graft] val quantSqlCte =
    """q AS (SELECT vec_id, list_transform(embedding,
      |  x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS qv FROM embeddings),
      |nm AS (SELECT vec_id, CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS nn FROM q)""".stripMargin

  /** PQ encode + reconstruct over `q` — subspace split, 16-seed-row
    * codebooks, per-subspace argmin, lossless reassembly into `rec` —
    * mirror of [[graft.ops.Similarity]]'s `pqRecon`, shared by the
    * `sim_pq_adc_topk` and `sim_ivfpq_topk` oracles. Requires
    * `quantSqlCte` upstream.
    */
  private[graft] val pqReconSqlCtes =
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
  private[graft] val sqAdcOracleSql: String =
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
  private[graft] val srpSqlCte: String = {
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

  private[graft] def docToks(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      TextOps.tokens(col("text")).as("toks"))

}
