package graft.pipeline

/** Public-suffix (registrable-domain) resolution — the boundary the
  * per-domain cap (L47), URL blocklist (L70), and host rollups must
  * group by: `a.example.co.uk` and `b.example.co.uk` are ONE
  * registrant, while `x.github.io` and `y.github.io` are two. Naive
  * "last two labels" grouping merges every `.co.uk` registrant into
  * one cap bucket and splits none of the multi-tenant hosts.
  *
  * Implements the published publicsuffix.org algorithm over a BOUNDED
  * embedded rule subset covering all three rule kinds (normal,
  * `*.` wildcard, `!` exception): a rule matches when its labels are a
  * suffix of the host's labels (`*` matching exactly one label); a
  * matching exception rule wins outright (public suffix = the rule
  * minus its leading label; with several matching exceptions the
  * LONGEST prevails, the list's prevailing-rule order); otherwise the
  * longest matching rule; no match falls back to the implicit `*`
  * rule (the host's last label). The registrable domain is the public
  * suffix plus one more label — a host that IS a public suffix has
  * none. The rule table is a broadcast-sized constant at any corpus
  * scale; the full PSL file swaps in without touching the algorithm,
  * with one documented limitation: hosts are matched as-given after
  * lower-casing — IDN hosts must be punycode (A-label) encoded by the
  * caller first, as the PSL's U-label entries are not folded here.
  */
object PublicSuffix {

  /** Embedded subset: enough real TLD structure to exercise every
    * algorithm branch (publicsuffix.org list entries).
    */
  val rules: Seq[String] = Seq(
    "com", "org", "net", "edu", "gov", "io", "ai", "dev",
    "uk", "co.uk", "ac.uk", "gov.uk", "org.uk",
    "jp", "co.jp", "ne.jp",
    "au", "com.au", "org.au",
    "de", "fr", "nl",
    "*.ck", "!www.ck",
    // private-registry entries: each tenant is its own registrant
    "github.io", "gitlab.io", "s3.amazonaws.com")

  private val parsed: Seq[(Boolean, Array[String])] =
    rules.map { r =>
      if (r.startsWith("!")) (true, r.substring(1).split('.'))
      else (false, r.split('.'))
    }

  private def ruleMatches(rule: Array[String], labels: Array[String]): Boolean =
    rule.length <= labels.length &&
      rule.zip(labels.takeRight(rule.length)).forall {
        case (r, l) => r == "*" || r == l
      }

  /** The public suffix of `host` (lower-cased, trailing dot stripped)
    * per the publicsuffix.org algorithm.
    */
  def publicSuffix(host: String): String = {
    val h = host.toLowerCase(java.util.Locale.ROOT).stripSuffix(".")
    val labels = h.split('.')
    val matching = parsed.filter { case (_, r) => ruleMatches(r, labels) }
    // prevailing-rule semantics: among matching exceptions the longest
    // wins (table order is NOT significant in the published algorithm)
    matching.filter(_._1).sortBy(-_._2.length).headOption match {
      case Some((_, exc)) =>
        // exception: public suffix = the rule minus its leading label
        exc.drop(1).mkString(".")
      case None =>
        val best = matching.map(_._2.length) match {
          case Nil => 1 // implicit * rule
          case ls  => ls.max
        }
        labels.takeRight(best).mkString(".")
    }
  }

  /** The registrable domain (public suffix + one label), or None when
    * the host IS a public suffix.
    */
  def registrableDomain(host: String): Option[String] = {
    val h = host.toLowerCase(java.util.Locale.ROOT).stripSuffix(".")
    val suffix = publicSuffix(h)
    val labels = h.split('.')
    val sufLen = suffix.split('.').length
    if (labels.length <= sufLen) None
    else Some(labels.takeRight(sufLen + 1).mkString("."))
  }
}
