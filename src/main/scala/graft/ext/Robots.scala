package graft.ext

/** robots.txt parsing and evaluation (RFC 9309, the Robots Exclusion
  * Protocol) — the access-control half of crawl politeness
  * ([[graft.streaming.DocStream.politeFrontier]] is the rate half):
  *
  *   - groups: consecutive `User-agent:` lines start a group; its
  *     `Allow:`/`Disallow:` rules apply to every named agent. Group
  *     selection per RFC 9309 §2.2.1: the group whose agent token is the
  *     longest case-insensitive prefix-token match of the client's
  *     product token; `*` only when nothing matches.
  *   - rule matching per §2.2.2: rules are path prefixes with `*`
  *     (any octets) and `$` (end anchor); the MOST OCTETS rule wins,
  *     Allow wins a length tie; no matching rule → allowed. An empty
  *     `Disallow:` matches nothing (the classic allow-all idiom).
  *
  * Pure per-host logic: parse ONCE per host, evaluate per URL — the
  * shapes in [[graft.streaming.DocStream.robotsGate]] keep the parse
  * host-keyed and the evaluation map-side. */
object Robots {

  /** One compiled rule: original length (the specificity key), allow bit,
    * and the compiled matcher. */
  private final case class Rule(len: Int, allow: Boolean, re: java.util.regex.Pattern)

  /** Compiled rules for one (host, agent) pair. */
  final class Rules private[Robots] (rules: Seq[Rule]) extends Serializable {
    /** Is `path` (path + optional ?query, as it appears in the URL after
      * the authority) fetchable? */
    def permits(path: String): Boolean = {
      val p = if (path.isEmpty) "/" else path
      var bestLen = -1
      var bestAllow = true
      rules.foreach { r =>
        if (r.len >= bestLen && r.re.matcher(p).lookingAt()) {
          // strict > keeps the FIRST rule of a length... but allow must
          // win ties, so order allow-before-disallow at equal length:
          // handled by comparing (len, allow) lexicographically
          if (r.len > bestLen || (r.len == bestLen && r.allow && !bestAllow)) {
            bestLen = r.len; bestAllow = r.allow
          }
        }
      }
      bestAllow
    }
  }

  /** Allow-everything rules (no robots.txt, unparseable, or empty). */
  val AllowAll: Rules = new Rules(Seq.empty)

  /** Compile one rule path: literal prefix match with `*` → any octets
    * and a trailing `$` anchor; `lookingAt` gives the implicit
    * start-of-path anchor. */
  private def compile(path: String, allow: Boolean): Rule = {
    val anchored = path.endsWith("$")
    val body = if (anchored) path.dropRight(1) else path
    val sb = new StringBuilder
    body.foreach {
      case '*' => sb.append(".*")
      case c => sb.append(java.util.regex.Pattern.quote(c.toString))
    }
    if (anchored) sb.append("$")
    Rule(path.length, allow, java.util.regex.Pattern.compile(sb.toString))
  }

  /** Parse a robots.txt body for `agent` (a product token, e.g.
    * "graftbot"): RFC 9309 group selection, then the group's rules
    * compiled for [[Rules.permits]]. Total: garbage lines are skipped,
    * a null/empty body allows everything. */
  def parse(txt: String, agent: String): Rules = {
    if (txt == null || txt.isEmpty) return AllowAll
    val agentLc = agent.toLowerCase
    // (agents, rules) per group, in file order
    val groups = scala.collection.mutable.ArrayBuffer.empty[
      (scala.collection.mutable.ArrayBuffer[String],
        scala.collection.mutable.ArrayBuffer[(String, Boolean)])]
    var inAgentRun = false // consecutive User-agent lines share one group
    txt.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgentRun) {
              groups += ((scala.collection.mutable.ArrayBuffer.empty,
                scala.collection.mutable.ArrayBuffer.empty))
              inAgentRun = true
            }
            groups.last._1 += value.toLowerCase
          case "allow" | "disallow" =>
            inAgentRun = false
            if (groups.nonEmpty && value.nonEmpty)
              groups.last._2 += ((value, field == "allow"))
            // empty Disallow: matches nothing — drop it (allow-all idiom)
          case _ => inAgentRun = false // sitemap, crawl-delay, unknown
        }
      }
    }
    // §2.2.1: longest agent token that prefix-matches ours; '*' fallback
    def specificity(a: String): Int =
      if (a == "*") 0
      else if (agentLc == a || agentLc.startsWith(a)) a.length
      else -1
    val best = groups.iterator
      .map(g => (g._1.map(specificity).maxOption.getOrElse(-1), g._2))
      .filter(_._1 >= 0)
      .foldLeft((-1, Seq.empty[(String, Boolean)])) { case (acc, (spec, rules)) =>
        if (spec > acc._1) (spec, rules.toSeq)
        // equal specificity (several groups naming the same agent):
        // rules combine per RFC
        else if (spec == acc._1) (spec, acc._2 ++ rules.toSeq)
        else acc
      }
    if (best._1 < 0) AllowAll
    else new Rules(best._2.map { case (p, allow) => compile(p, allow) })
  }

  /** The path (+query) component a rule matches against, from an
    * absolute URL; host-less or unparseable input matches "/". */
  def pathOf(url: String): String = {
    val schemeEnd = url.indexOf("://")
    if (schemeEnd < 0) return "/"
    val pathStart = url.indexOf('/', schemeEnd + 3)
    if (pathStart < 0) "/" else url.substring(pathStart)
  }
}
