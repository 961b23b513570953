package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt parsing + evaluation (RFC 9309) — the politeness gate a
  * crawl pipeline evaluates for every (host, path) BEFORE fetching:
  * billions of cached robots bodies, each consulted for many URLs.
  *
  * Semantics implemented (the RFC 9309 core):
  *   - groups: one or more `User-agent:` lines followed by rules; a
  *     crawler obeys THE single most-specific matching group — exact
  *     product-token match (case-insensitive) beats `*`, and the other
  *     groups are ignored entirely (no rule inheritance from `*`);
  *   - rules: `Allow:` / `Disallow:` path patterns with `*` wildcards
  *     and the `$` end anchor; empty-pattern rules are no-ops;
  *   - precedence: the LONGEST matching pattern wins (pattern octet
  *     length, not match length); on equal length Allow wins;
  *   - no matching rule, no matching group, or an empty/unparsable file
  *     => allowed (crawl-by-default, the RFC stance);
  *   - unknown directives are skipped; `#` comments stripped; keys are
  *     case-insensitive; a `User-agent:` line after rules STARTS a new
  *     group (RFC group grammar).
  *
  * Scale shape: parsing is a per-row line walk, evaluation a per-row
  * pattern match — both inside `mapPartitions`, zero shuffle. The
  * intended 100 TB layout joins a (host -> robots body) table to a URL
  * frontier on host; this operator is the per-row kernel of that join.
  */
object RobotsTxt {

  /** One rule: allow/disallow + the raw pattern. */
  final case class Rule(allow: Boolean, pattern: String)
  /** One group: lowercased agent product tokens + rules in file order. */
  final case class Group(agents: Seq[String], rules: Seq[Rule])

  /** Parse a robots.txt body into groups (never throws; junk lines skip). */
  def parse(body: String): Seq[Group] = {
    if (body == null) return Seq.empty
    val groups = Seq.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules)
      agents = Vector.empty; rules = Vector.empty; inRules = false
    }
    body.split("\r?\n", -1).foreach { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw
        case i => raw.substring(0, i)
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) flush() // a UA line after rules starts a new group
            if (value.nonEmpty) agents :+= value.toLowerCase
          case "allow" =>
            inRules = true
            if (value.nonEmpty) rules :+= Rule(allow = true, value)
          case "disallow" =>
            inRules = true
            // empty Disallow is the classic "allow all" no-op
            if (value.nonEmpty) rules :+= Rule(allow = false, value)
          case _ => if (agents.nonEmpty) inRules = true // crawl-delay etc.
        }
      }
    }
    flush()
    groups.result()
  }

  /** Does `pattern` (with `*` wildcards, optional `$` anchor) match a
    * prefix of `path`? Iterative greedy-with-backtrack — no regex
    * compilation in the per-URL hot path. */
  def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.last == '$'
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    // match p against path allowing '*' to span any run; unanchored
    // patterns are prefix patterns (trailing tail of path is free)
    var pi = 0
    var si = 0
    var starPi = -1
    var starSi = -1
    val pn = p.length
    val sn = path.length
    while (si < sn) {
      if (pi < pn && (p.charAt(pi) == path.charAt(si))) { pi += 1; si += 1 }
      else if (pi < pn && p.charAt(pi) == '*') { starPi = pi; pi += 1; starSi = si }
      else if (starPi >= 0) { pi = starPi + 1; starSi += 1; si = starSi }
      else return if (anchored) false else pi == pn
      if (pi == pn && !anchored) return true // pattern consumed: prefix hit
    }
    // path exhausted: remaining pattern must be all '*'
    while (pi < pn && p.charAt(pi) == '*') pi += 1
    pi == pn
  }

  /** Pick the group a crawler obeys: a group's agent token matches when
    * it is a case-insensitive PREFIX of the crawler's product token
    * (`googlebot` matches `googlebot-news`); exact-token groups beat
    * `*`; among matches the LONGEST token wins (most specific); None if
    * no group matches. */
  def groupFor(groups: Seq[Group], agent: String): Option[Group] = {
    val a = agent.toLowerCase
    val exact = groups.filter(_.agents.exists(t => t != "*" && a.startsWith(t)))
    if (exact.nonEmpty)
      Some(exact.maxBy(_.agents.filter(t => t != "*" && a.startsWith(t))
        .map(_.length).max))
    else groups.find(_.agents.contains("*"))
  }

  /** Evaluate (body, agent, path): (allowed, matched pattern or null).
    * Longest-pattern-wins; Allow wins length ties; default allow. */
  def evaluate(body: String, agent: String, path: String): (Boolean, String) =
    groupFor(parse(body), agent) match {
      case None => (true, null)
      case Some(g) =>
        val hits = g.rules.filter(r => patternMatches(r.pattern, path))
        if (hits.isEmpty) (true, null)
        else {
          val best = hits.maxBy(r => (r.pattern.length, r.allow))
          (best.allow, best.pattern)
        }
    }

  final case class Verdict(doc_id: Long, allowed: Long, matched_rule: String)

  /** Partition-parallel evaluation of (id, robots body, agent, path)
    * rows — the per-row kernel of the frontier-side politeness join. */
  def evaluateDocs(spark: SparkSession, df: DataFrame, idCol: String,
                   bodyCol: String, agentCol: String,
                   pathCol: String): Dataset[Verdict] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bodyCol), col(agentCol),
        col(pathCol))
      .as[(Long, String, String, String)]
      .mapPartitions(_.map { case (id, body, agent, path) =>
        val (ok, rule) = evaluate(body, agent, path)
        Verdict(id, if (ok) 1L else 0L, rule)
      })
  }
}
