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
  *    publishes `_manifest/<version>.txt` (file list + the unit-of-work
  *    keys it covers) with CREATE-IF-ABSENT semantics: the temp manifest
  *    is hard-linked to the final name, which fails with
  *    `FileAlreadyExistsException` if a concurrent committer claimed the
  *    version first — the loser recomputes the next version and retries
  *    (a POSIX `rename` would silently REPLACE the winner's manifest,
  *    losing its commit);
  *  - readers list the manifest log and read exactly the published
  *    files — half-written data directories are invisible;
  *  - `compact` folds the log into a single checkpoint file so reader
  *    startup stays O(1) in commit count; manifests newer than the
  *    checkpoint are still applied on top;
  *  - `doneKeys` is the incremental-skip manifest: the keys already
  *    committed, to left-anti join inputs against
  *    ([[Incremental.remaining]]) — per-key `skip_if_exist` with
  *    all-or-nothing visibility instead of per-file existence checks.
  *
  * Driver-side bookkeeping is O(#commits since compaction); data IO is
  * all executors.
  */
object ManifestSink {

  private val MaxPublishAttempts = 64

  private def manifestDir(root: String): Path = Paths.get(root, "_manifest")

  /** (version, path, isCheckpoint) for every published log file. */
  private def logFiles(root: String): Seq[(Long, Path, Boolean)] = {
    val dir = manifestDir(root)
    if (!Files.exists(dir)) Seq.empty
    else Files.list(dir).iterator().asScala.flatMap { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".checkpoint")) Some((n.stripSuffix(".checkpoint").toLong, p, true))
      else if (n.endsWith(".txt")) Some((n.stripSuffix(".txt").toLong, p, false))
      else None
    }.toSeq.sortBy(_._1)
  }

  private def nextVersion(root: String): Long =
    logFiles(root).lastOption.map(_._1 + 1).getOrElse(0L)

  /** Atomically publish `body` as log version `>= from`, claiming the
    * first free version via hard-link create-if-absent. Returns the
    * version actually claimed.
    */
  private def publish(root: String, from: Long, suffix: String, body: String): Long = {
    Files.createDirectories(manifestDir(root))
    val tmp = manifestDir(root).resolve(
      s".tmp-${java.util.UUID.randomUUID().toString}")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    try {
      var v = from
      var attempts = 0
      while (true) {
        try {
          Files.createLink(manifestDir(root).resolve(s"$v$suffix"), tmp)
          return v
        } catch {
          case _: FileAlreadyExistsException =>
            attempts += 1
            if (attempts >= MaxPublishAttempts)
              throw new IllegalStateException(
                s"could not claim a manifest version after $attempts attempts under $root")
            v = math.max(v + 1, nextVersion(root))
        }
      }
      v
    } finally Files.deleteIfExists(tmp)
  }

  /** Atomically commit `df` for the given unit-of-work keys. Safe under
    * concurrent committers: each ends up with its own version, both
    * visible. Returns the published version.
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
    publish(root, nextVersion(root), ".txt", body)
  }

  private def manifestLines(root: String): Seq[String] = {
    val log = logFiles(root)
    val fromCheckpoint = log.filter(_._3).lastOption
    val (ckptV, ckptLines) = fromCheckpoint match {
      case Some((v, p, _)) => (v, Files.readAllLines(p).asScala.toSeq)
      case None => (-1L, Seq.empty[String])
    }
    ckptLines ++ log.collect {
      case (v, p, false) if v > ckptV => Files.readAllLines(p).asScala
    }.flatten
  }

  /** Fold the whole log into one checkpoint file (readers then skip the
    * per-commit manifests at or below it) and delete the superseded
    * manifests. Concurrent-commit safe: a commit racing the compaction
    * lands on a higher version and stays applied on top.
    */
  def compact(root: String): Long = {
    val lines = manifestLines(root)
    if (lines.isEmpty) return -1L
    val upto = logFiles(root).last._1
    val v = publish(root, upto + 1, ".checkpoint", lines.mkString("\n"))
    // Delete ONLY versions ≤ upto — the ones actually folded into the
    // checkpoint. A commit racing this compaction can claim a version in
    // (upto, v); its lines are NOT in the checkpoint, so deleting
    // everything < v would silently drop that commit.
    logFiles(root).foreach {
      case (ver, p, _) if ver <= upto => Files.deleteIfExists(p)
      case _ => ()
    }
    v
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
