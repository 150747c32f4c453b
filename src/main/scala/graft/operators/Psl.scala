package graft.operators

/** Public Suffix List rule parsing (publicsuffix.org — PUBLIC DATA,
  * MPL 2.0; the bundled snapshot under resources/graft/ is the Debian
  * `publicsuffix` package's file, shipped verbatim). Three rule kinds:
  *
  *   - exact ("co.uk"): the named suffix is public,
  *   - wildcard ("*.ck"): ANY single label over the base is public,
  *   - exception ("!www.ck"): carve-out of a wildcard — the named
  *     host is itself a registrable domain.
  *
  * Resolution (PSL algorithm): exception rules prevail; otherwise the
  * longest matching rule; otherwise the implicit "*" default (last
  * label is public). Registrable domain = matched suffix + one label;
  * for an exception, the exception name itself.
  */
object Psl {

  /** Rules keyed by label count, the shape the join-per-depth plan in
    * TextAnalysis.urlDomainsPsl consumes: `exact(d)` = d-label public
    * suffixes, `wildcardBases(b)` = b-label bases of (b+1)-label
    * wildcard rules, `exceptions(d)` = d-label exception names.
    */
  case class Rules(
      exact: Map[Int, Seq[String]],
      wildcardBases: Map[Int, Seq[String]],
      exceptions: Map[Int, Seq[String]]) {
    /** Longest rule length present (wildcards count base + 1). */
    def maxRuleLabels: Int =
      (exact.keys ++ wildcardBases.keys.map(_ + 1) ++ exceptions.keys)
        .maxOption.getOrElse(1)
  }

  private def labelsOf(s: String): Int = s.count(_ == '.') + 1

  /** Parse `.dat` lines: trim, drop blanks and `//` comments.
    * Single-label exact rules ("com") are FOLDED into the default "*"
    * rule — both yield the last-two-label registrable domain, so the
    * join tables stay 2+ labels (verified equivalent: a 1-label rule
    * only prevails when nothing longer matches, and then produces
    * exactly the default's answer).
    */
  def parse(lines: Iterator[String]): Rules = {
    val rules = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//")).toSeq
    Rules(
      exact = rules.filterNot(r => r.startsWith("!") || r.startsWith("*."))
        .filter(labelsOf(_) >= 2).groupBy(labelsOf),
      wildcardBases = rules.filter(_.startsWith("*."))
        .map(_.drop(2)).groupBy(labelsOf),
      exceptions = rules.filter(_.startsWith("!"))
        .map(_.drop(1)).groupBy(labelsOf))
  }

  /** The bundled full snapshot (~9.5k rules). */
  lazy val default: Rules = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "graft/public_suffix_list.dat resource missing")
    try parse(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** Filesystem path of the bundled snapshot, for engines that read
    * the file directly (the DuckDB oracle's `read_text`). Resolves the
    * classpath resource — a plain file under any sbt/IDE checkout; when
    * packaged inside a jar, extracted once to a stable temp path (no
    * delete-on-exit: the oracle may run after this JVM has exited).
    */
  lazy val datFile: String = {
    val url = getClass.getResource("/graft/public_suffix_list.dat")
    require(url != null, "graft/public_suffix_list.dat resource missing")
    if (url.getProtocol == "file")
      java.nio.file.Paths.get(url.toURI).toString
    else {
      val tmp = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_public_suffix_list.dat")
      val in = url.openStream()
      try java.nio.file.Files.copy(in, tmp,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
      tmp.toString
    }
  }
}
