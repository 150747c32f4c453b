package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** The VERDICT_r13 #3 regression guard: no operator may splice a
  * CALLER-provided column name into a SQL string (`expr(s"...$tsCol
  * ...")`) — it breaks on names needing backticks and is the hazard
  * class ADVICE flagged in r12 (readability) and r13 (TextAnalysis).
  * The r14 sweep converted every such site to Column form (or to an
  * internal `__`-prefixed column projected first); this spec keeps
  * the class extinct. Convention checked: caller column parameters
  * end in `Col` (tsCol, valueCol, textCol, ... — uniformly true
  * across the API), so any `$...Col` interpolation inside an
  * `expr(s"` string is a violation.
  */
class SourceHygieneSpec extends AnyFunSuite {

  test("no expr(s\"...\") interpolates a caller column parameter") {
    val root = Seq("src/main/scala", "/root/repo/src/main/scala")
      .map(java.nio.file.Paths.get(_))
      .find(java.nio.file.Files.isDirectory(_))
      .getOrElse(fail("src/main/scala not found from the test working dir"))
    val bad = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        java.nio.file.Files.readAllLines(p).asScala.zipWithIndex.collect {
          case (line, i)
            if line.contains("expr(s\"") &&
              "\\$\\{?[a-zA-Z]*Col\\b".r.findFirstIn(line).isDefined =>
            s"$p:${i + 1}: $line"
        }
      }.toSeq
    assert(bad.isEmpty,
      s"string-spliced caller column names (use Column form):\n${bad.mkString("\n")}")
  }
}
