package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Provenance-citation guard: every `modules/…` / `scripts/…` reference
  * path cited in a scaladoc anywhere under src/ must actually exist in
  * the read-only reference checkout. A hallucinated citation is worse
  * than none in a repo whose discipline is file:line provenance
  * (round-10 VERDICT found exactly one — this keeps the count at zero).
  */
class CitationSpec extends AnyFunSuite {

  private val referenceRoot = Paths.get("/root/reference")
  private val sourceRoots   = Seq(Paths.get("src/main"), Paths.get("src/test"))
  private val citation      = """(?:modules|scripts)/[A-Za-z0-9_/.-]+\.py""".r

  private def scalaFiles(root: Path): Seq[Path] =
    if (!Files.exists(root)) Seq.empty
    else
      Files.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".scala"))
        .toSeq

  test("every cited reference path exists under /root/reference") {
    assume(Files.isDirectory(referenceRoot), "reference checkout not present")
    val bad = for {
      root <- sourceRoots
      file <- scalaFiles(root)
      text  = new String(Files.readAllBytes(file), java.nio.charset.StandardCharsets.UTF_8)
      cited <- citation.findAllIn(text).toSeq.distinct
      if !Files.exists(referenceRoot.resolve(cited))
    } yield s"$file cites non-existent $cited"
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
