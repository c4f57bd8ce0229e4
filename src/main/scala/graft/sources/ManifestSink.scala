package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** S9/X2 upgraded — a minimal transactional stage store: parquet data
  * files committed by an atomic manifest append (Delta-style log, scoped
  * to what the pipeline needs):
  *
  *  - a commit writes its parquet files under `data/<commitId>/`, then
  *    atomically publishes `_manifest/<version>.txt` (file list + the
  *    unit-of-work keys it covers) via temp-file + atomic rename;
  *  - readers list the manifest log and read exactly the published
  *    files — half-written data directories are invisible;
  *  - `doneKeys` is the incremental-skip manifest: the keys already
  *    committed, to left-anti join inputs against
  *    ([[Incremental.remaining]]) — per-key `skip_if_exist` with
  *    all-or-nothing visibility instead of per-file existence checks.
  *
  * Driver-side bookkeeping is O(#commits); data IO is all executors.
  */
object ManifestSink {

  private def manifestDir(root: String): Path = Paths.get(root, "_manifest")

  private def versions(root: String): Seq[(Long, Path)] = {
    val dir = manifestDir(root)
    if (!Files.exists(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".txt"))
      .map(p => (p.getFileName.toString.stripSuffix(".txt").toLong, p))
      .toSeq.sortBy(_._1)
  }

  /** Atomically commit `df` for the given unit-of-work keys. Returns the
    * published version.
    */
  def commit(df: DataFrame, root: String, keys: Seq[String]): Long = {
    val next = versions(root).lastOption.map(_._1 + 1).getOrElse(0L)
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
    Files.createDirectories(manifestDir(root))
    val tmp = manifestDir(root).resolve(s".$next.txt.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    // atomic publish: rename fails if the version already exists (a
    // concurrent committer won) — caller retries with a fresh version
    Files.move(tmp, manifestDir(root).resolve(s"$next.txt"),
      StandardCopyOption.ATOMIC_MOVE)
    next
  }

  private def manifestLines(root: String): Seq[String] =
    versions(root).flatMap { case (_, p) =>
      Files.readAllLines(p).asScala
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

  /** The incremental-skip manifest: keys already committed. */
  def doneKeys(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    manifestLines(root).collect {
      case l if l.startsWith("key=") => l.stripPrefix("key=")
    }.toDF("file")
  }
}
