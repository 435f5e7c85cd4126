package graft.engine

import graft.model.RobotsRule

/**
 * robots.txt text → `RobotsRule(host, pathPrefix, allow)` rows for the
 * Scheduler's admission filter (round-3 verdict #7: the engine consumed
 * pre-parsed rule rows; a real deploy needs the file → rules step; the
 * reference has no robots support at all — this is a north-rule addition).
 *
 * Implements the Robots Exclusion Protocol subset the engine's
 * longest-prefix-wins matcher (Scheduler.robotsFilter /
 * RefCrawler.robotsAllows) can express:
 *
 *  - `User-agent:` groups; consecutive agent lines share the following
 *    rule block. Rules are taken from every group naming `*` or `agent`
 *    (case-insensitive).
 *  - `Allow:` / `Disallow:` path-prefix rules; an EMPTY Disallow value
 *    means "allow everything" (no rule emitted). Values must start with
 *    `/` after stripping; a trailing `*` is redundant for a prefix rule
 *    and is stripped.
 *  - `#` comments, blank lines, CRLF, arbitrary field-name case.
 *  - Duplicate prefixes dedupe with ALLOW winning (the REP tie rule for
 *    equally-specific patterns), keeping prefixes distinct — the
 *    Scheduler's longest-prefix window assumes no ties.
 *
 * Out of scope (documented): mid-pattern `*` and `$` anchors (not
 * expressible as a prefix rule — such lines are skipped), Crawl-delay
 * (the engine's politeness budget is per-host row counts), Sitemap.
 */
object Robots {

  def parse(host: String, text: String, agent: String = "*"): Seq[RobotsRule] = {
    // LinkedHashMap: deterministic output order (first occurrence)
    val rules = scala.collection.mutable.LinkedHashMap.empty[String, Boolean]
    var inGroup = false    // the current rule block applies to `agent`
    var agentList = false  // we're inside a run of consecutive User-agent lines
    for (raw <- text.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val field = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          field match {
            case "user-agent" =>
              // a new agent line after a rule block starts a NEW group
              if (!agentList) { inGroup = false; agentList = true }
              if (value == "*" || value.equalsIgnoreCase(agent)) inGroup = true
            case "allow" | "disallow" =>
              agentList = false
              if (inGroup && value.nonEmpty) {
                val prefix =
                  if (value.endsWith("*")) value.dropRight(1) else value
                val usable = prefix.startsWith("/") &&
                  !prefix.contains('*') && !prefix.contains('$')
                if (usable) {
                  val allow = field == "allow"
                  // allow wins on duplicate prefixes; first disallow sticks
                  // unless an allow overrides it
                  if (allow || !rules.contains(prefix)) rules(prefix) = allow
                }
              }
            case _ =>
              // any other field (crawl-delay, sitemap, ...) ends an
              // agent-line run but not the group
              agentList = false
          }
        }
      }
    }
    rules.iterator.map { case (p, a) => RobotsRule(host, p, a) }.toSeq
  }
}
