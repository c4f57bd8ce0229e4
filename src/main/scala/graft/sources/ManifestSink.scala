package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** S9/X2 upgraded — a minimal transactional stage store: parquet data
  * files committed by an atomic manifest append (Delta-style log, scoped
  * to what the pipeline needs):
  *
  *  - a commit writes its parquet files under `data/<commitId>/`, then
  *    publishes `_manifest/<version>.txt` with CREATE-IF-ABSENT
  *    semantics: the temp file is hard-linked to the final name, which
  *    fails with `FileAlreadyExistsException` if a concurrent publisher
  *    claimed the version first — the loser recomputes the next version
  *    and retries (a POSIX `rename` would silently REPLACE the winner,
  *    losing its commit);
  *  - EVERY log entry — commit manifest or checkpoint — claims from the
  *    SAME `<version>.txt` namespace, so a commit and a compaction can
  *    never both win one version number (distinct filenames would let
  *    both hard-links succeed);
  *  - a checkpoint records the fold point in its header
  *    (`checkpoint upto=<v>`): readers replay the log in version order,
  *    and a checkpoint replaces exactly the entries at or below its fold
  *    point — a commit that claimed a version above the fold while the
  *    compaction was publishing stays applied on top;
  *  - readers list the log and read exactly the published files —
  *    half-written data directories are invisible;
  *  - `doneKeys` is the incremental-skip manifest: the keys already
  *    committed, to left-anti join inputs against
  *    ([[Incremental.remaining]]) — per-key `skip_if_exist` with
  *    all-or-nothing visibility instead of per-file existence checks.
  *
  * Driver-side bookkeeping is O(#commits since compaction); data IO is
  * all executors.
  *
  * Listing-consistency caveat: directory listing is not an atomic
  * snapshot, so a reader listing WHILE a compaction is deleting folded
  * manifests could in principle miss both a just-published checkpoint
  * and a just-deleted manifest. Writers are fully safe (claims are
  * atomic); a reader racing an active compaction should retry on an
  * unexpectedly empty/shrunken snapshot — the same posture file-listing
  * table formats take without a pointer file.
  */
object ManifestSink {

  private val MaxPublishAttempts = 64
  private val CheckpointHeader = "checkpoint upto="

  private def manifestDir(root: String): Path = Paths.get(root, "_manifest")

  /** (version, path) for every published log file, version-ordered. */
  private def logFiles(root: String): Seq[(Long, Path)] = {
    val dir = manifestDir(root)
    if (!Files.exists(dir)) Seq.empty
    else Files.list(dir).iterator().asScala.flatMap { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".txt") && !n.startsWith("."))
        Some((n.stripSuffix(".txt").toLong, p))
      else None
    }.toSeq.sortBy(_._1)
  }

  private def nextVersion(root: String): Long =
    logFiles(root).lastOption.map(_._1 + 1).getOrElse(0L)

  /** Atomically publish `body` as the first free log version ≥ `from`,
    * via hard-link create-if-absent. Returns the claimed version.
    */
  private def publish(root: String, from: Long, body: String): Long = {
    Files.createDirectories(manifestDir(root))
    val tmp = manifestDir(root).resolve(
      s".tmp-${java.util.UUID.randomUUID().toString}")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    try {
      var v = from
      var attempts = 0
      while (attempts < MaxPublishAttempts) {
        try {
          Files.createLink(manifestDir(root).resolve(s"$v.txt"), tmp)
          return v
        } catch {
          case _: FileAlreadyExistsException =>
            attempts += 1
            v = math.max(v + 1, nextVersion(root))
        }
      }
      throw new IllegalStateException(
        s"could not claim a manifest version after $attempts attempts under $root")
    } finally Files.deleteIfExists(tmp)
  }

  /** Atomically commit `df` for the given unit-of-work keys. Safe under
    * concurrent committers AND concurrent compaction: each publisher
    * ends up with its own version, all visible. Returns the version.
    */
  def commit(df: DataFrame, root: String, keys: Seq[String]): Long = {
    val commitId = java.util.UUID.randomUUID().toString
    val dataPath = Paths.get(root, "data", commitId)
    df.write.parquet(dataPath.toString)
    val files = Files.list(dataPath).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet"))
      .toSeq.sorted
    val body = (Seq(s"commit=$commitId") ++
      keys.map(k => s"key=$k") ++
      files.map(f => s"file=data/$commitId/$f")).mkString("\n")
    publish(root, nextVersion(root), body)
  }

  /** Replay the log in version order: a checkpoint entry replaces the
    * accumulated entries at or below its recorded fold point; entries
    * above it (commits racing the compaction) stay applied on top.
    * Retries the whole listing when a concurrent compaction deletes a
    * listed manifest between the listing and the read.
    */
  private def manifestLines(root: String): Seq[String] = {
    var attempts = 0
    while (true) {
      try return manifestLinesFrom(logFiles(root))
      catch {
        case _: java.nio.file.NoSuchFileException if attempts < 16 =>
          attempts += 1
      }
    }
    Seq.empty // unreachable
  }

  /** Fold the log into one checkpoint entry and delete exactly the
    * folded versions. The snapshot of the log is taken ONCE: the fold
    * point is the highest version whose lines are actually in the
    * checkpoint body, so a commit landing mid-compaction (at any later
    * version, including between the fold point and the checkpoint's own
    * version) is never deleted and never masked.
    */
  def compact(root: String): Long = {
    val snapshot = logFiles(root)
    if (snapshot.isEmpty) return -1L
    // replay the snapshot only (not the live dir) for both lines & fold;
    // a concurrent compaction may delete snapshot files mid-read — its
    // checkpoint covers our fold range, so just restart from fresh state
    val folded = snapshot.map(_._1).max
    val lines =
      try manifestLinesFrom(snapshot)
      catch { case _: java.nio.file.NoSuchFileException => return compact(root) }
    if (lines.isEmpty) return -1L
    val v = publish(root, folded + 1, s"$CheckpointHeader$folded\n" + lines.mkString("\n"))
    snapshot.foreach { case (ver, p) => if (ver <= folded) Files.deleteIfExists(p) }
    v
  }

  private def manifestLinesFrom(log: Seq[(Long, Path)]): Seq[String] = {
    // (version, lines, foldPoint — Some for checkpoint entries)
    var entries = Vector.empty[(Long, Seq[String], Option[Long])]
    log.foreach { case (v, p) =>
      val lines = Files.readAllLines(p).asScala.toSeq
      lines.headOption match {
        case Some(h) if h.startsWith(CheckpointHeader) =>
          val fold = h.stripPrefix(CheckpointHeader).toLong
          // drop entries covered by this checkpoint: commits at or below
          // the fold, AND any earlier checkpoint whose fold point is not
          // beyond ours (two racing compactions fold the same range; the
          // loser's version lands above the fold and would otherwise
          // survive the version filter, duplicating every folded line)
          entries = (v, lines.tail, Some(fold)) +: entries.filter {
            case (ev, _, efold) => ev > fold && efold.forall(_ > fold)
          }
        case _ =>
          entries = entries :+ ((v, lines, None))
      }
    }
    entries.sortBy(_._1).flatMap(_._2)
  }

  /** Read the published snapshot (union of all committed files). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val files = manifestLines(root).collect {
      case l if l.startsWith("file=") => Paths.get(root, l.stripPrefix("file=")).toString
    }
    if (files.isEmpty)
      throw new IllegalStateException(s"no committed data under $root")
    spark.read.parquet(files: _*)
  }

  /** The incremental-skip manifest: keys already committed, as a one-
    * column DataFrame named `keyCol` (match the caller's join key).
    */
  def doneKeys(spark: SparkSession, root: String, keyCol: String = "file"): DataFrame = {
    import spark.implicits._
    manifestLines(root).collect {
      case l if l.startsWith("key=") => l.stripPrefix("key=")
    }.toDF(keyCol)
  }
}
