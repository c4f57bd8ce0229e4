package graft.pipeline

/** RFC 9309 Robots Exclusion Protocol — the OTHER robots surface next
  * to the in-document signals ([[HtmlText.robotsDirectives]]): a crawl
  * pipeline fetches `/robots.txt` once per host and must replay its
  * group/rule semantics for every captured URL before the document may
  * enter a corpus. The semantics here are exactly the RFC's:
  *
  *  - groups: consecutive `User-agent` lines open a group that owns
  *    the following `Allow`/`Disallow` rules (§2.2.1);
  *  - group selection: the group whose product token equals the
  *    crawler's (case-insensitive) wins; otherwise the `*` group;
  *    a matched specific group EXCLUDES the wildcard group entirely;
  *  - rule matching: path-prefix patterns with `*` (any octet
  *    sequence) and `$` (end anchor) (§2.2.3);
  *  - precedence: the MOST OCTETS matching rule wins; an
  *    Allow/Disallow tie at equal length resolves to Allow (§2.2.2);
  *  - no matching rule, no rules, or no groups at all → allowed;
  *    an empty Disallow value allows everything (it matches nothing).
  *
  * Pure string kernel — per-(host, path) row work inside expressions
  * or typed maps; the robots.txt for a host is a broadcast-sized
  * sidecar at any corpus scale.
  */
object RobotsTxt {

  /** One RFC 9309 group: its product tokens (lower-cased; `*` is the
    * wildcard token), its rules in file order as (isAllow, pattern),
    * and the group's `Crawl-delay` seconds if present (a de-facto
    * extension most crawlers honor; last occurrence in a group wins).
    */
  final case class Group(agents: Seq[String], rules: Seq[(Boolean, String)],
      crawlDelaySec: Option[Long] = None)

  /** Parse robots.txt lines: `field: value`, `#` comments stripped,
    * unknown fields ignored (§2.2.4), fields case-insensitive.
    * Rules before any User-agent line are ignored (they belong to no
    * group).
    */
  def parse(txt: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer[Group]()
    var agents = scala.collection.mutable.ArrayBuffer[String]()
    var rules = scala.collection.mutable.ArrayBuffer[(Boolean, String)]()
    var delay: Option[Long] = None
    var inAgents = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.toSeq, rules.toSeq, delay)
      agents = scala.collection.mutable.ArrayBuffer[String]()
      rules = scala.collection.mutable.ArrayBuffer[(Boolean, String)]()
      delay = None
    }
    txt.split('\n').foreach { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw
        case i  => raw.substring(0, i)
      }
      val sep = line.indexOf(':')
      if (sep > 0) {
        val field = line.substring(0, sep).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(sep + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents) flush()
            agents += value.toLowerCase(java.util.Locale.ROOT)
            inAgents = true
          case "allow" =>
            inAgents = false
            if (agents.nonEmpty) rules += ((true, value))
          case "disallow" =>
            inAgents = false
            if (agents.nonEmpty) rules += ((false, value))
          case "crawl-delay" =>
            inAgents = false
            if (agents.nonEmpty && value.nonEmpty && value.forall(_.isDigit))
              delay = Some(value.toLong)
          case _ => // sitemap, unknown: ignored (§2.2.4)
        }
      }
    }
    flush()
    groups.toSeq
  }

  /** The file-wide `Sitemap:` URLs in file order (RFC 9309 §2.2.4 —
    * sitemaps are not group-scoped).
    */
  def sitemaps(txt: String): Seq[String] =
    txt.split('\n').toSeq.flatMap { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw
        case i  => raw.substring(0, i)
      }
      val sep = line.indexOf(':')
      if (sep > 0 && line.substring(0, sep).trim
          .equalsIgnoreCase("sitemap")) {
        val v = line.substring(sep + 1).trim
        if (v.nonEmpty) Some(v) else None
      } else None
    }

  /** Effective crawl delay for `userAgent`: the MAX across its
    * governing (merged) groups — the conservative read when the same
    * token appears in several groups.
    */
  def crawlDelayFor(groups: Seq[Group], userAgent: String): Option[Long] = {
    val token = userAgent.toLowerCase(java.util.Locale.ROOT)
    val specific = groups.filter(_.agents.contains(token))
    val chosen =
      if (specific.nonEmpty) specific
      else groups.filter(_.agents.contains("*"))
    val delays = chosen.flatMap(_.crawlDelaySec)
    if (delays.isEmpty) None else Some(delays.max)
  }

  /** §2.2.3 pattern match: literal octets, `*` matches any sequence,
    * `$` at pattern end anchors; a `$` elsewhere is a literal. Empty
    * pattern matches nothing (the empty-Disallow rule).
    */
  def patternMatches(pattern: String, path: String): Boolean = {
    if (pattern.isEmpty) return false
    val (body, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true)
      else (pattern, false)
    // greedy segment walk: split on '*', require the first segment at
    // position 0, each later segment in order, and — if anchored —
    // the last segment flush with the end
    val segs = body.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < segs.length) {
      val seg = segs(i)
      if (i == 0) {
        if (!path.startsWith(seg)) return false
        pos = seg.length
      } else if (i == segs.length - 1 && anchored) {
        if (path.length - pos < seg.length || !path.endsWith(seg))
          return false
        pos = path.length
      } else {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      i += 1
    }
    if (anchored) pos == path.length else true
  }

  /** The group that governs `userAgent` (§2.2.1): a specific-token
    * match (case-insensitive product token) excludes the `*` group;
    * multiple groups naming the same token merge in file order.
    * Returns the merged rule list, or empty if no group applies.
    */
  def rulesFor(groups: Seq[Group], userAgent: String): Seq[(Boolean, String)] = {
    val token = userAgent.toLowerCase(java.util.Locale.ROOT)
    val specific = groups.filter(_.agents.contains(token))
    val chosen =
      if (specific.nonEmpty) specific
      else groups.filter(_.agents.contains("*"))
    chosen.flatMap(_.rules)
  }

  /** §2.2.2 decision: longest (most octets) matching pattern wins;
    * an Allow/Disallow tie at the same length is Allow; no match →
    * allowed.
    */
  def isAllowed(groups: Seq[Group], userAgent: String,
      path: String): Boolean = {
    val matching = rulesFor(groups, userAgent)
      .filter { case (_, p) => patternMatches(p, path) }
    if (matching.isEmpty) true
    else {
      val maxLen = matching.map(_._2.length).max
      matching.exists { case (allow, p) => allow && p.length == maxLen }
    }
  }
}
