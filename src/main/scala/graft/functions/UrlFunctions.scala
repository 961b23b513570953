package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus pipelines — the normalization
  * step URL-level dedup and per-host statistics stand on (a crawl sees
  * `HTTP://Example.com:80/a/../b?z=1&utm_source=x#f` and
  * `http://example.com/b?z=1` as the same document).
  *
  * Canonical form (documented, deliberately conservative):
  *   - scheme and host lowercased; default port stripped (http:80,
  *     https:443); fragment dropped
  *   - dot-segments resolved (`/a/../b` → `/b`, via `java.net.URI`
  *     normalization — RFC 3986 remove_dot_segments); empty path → `/`
  *   - query parameters stably sorted by (key, value); known tracking
  *     parameters dropped (`utm_*`, `gclid`, `fbclid`); empty query
  *     removed entirely
  *   - no percent-decoding and no duplicate-slash collapsing: both can
  *     CHANGE the resource a URL names, so a dedup key must not do them
  *
  * Scala-side parsing is `java.net.URI` (offline, JDK) wrapped
  * null-safe: unparseable URLs canonicalize to None and never throw in
  * a task.
  */
object UrlFunctions {

  private val TrackingParams: Set[String] = Set("gclid", "fbclid", "msclkid")
  private def isTracking(key: String): Boolean =
    key.startsWith("utm_") || TrackingParams.contains(key)

  /** Canonicalize one URL; None when unparseable or not http(s). */
  def canonicalizeUrl(url: String): Option[String] = {
    if (url == null) return None
    val u =
      try new java.net.URI(url.trim)
      catch { case _: java.net.URISyntaxException => return None }
    val scheme = Option(u.getScheme).map(_.toLowerCase).getOrElse(return None)
    if (scheme != "http" && scheme != "https") return None
    val host = Option(u.getHost).map(_.toLowerCase).getOrElse(return None)
    if (host.isEmpty) return None
    val defaultPort = if (scheme == "http") 80 else 443
    val port = u.getPort
    val portPart = if (port < 0 || port == defaultPort) "" else s":$port"
    val rawPath = Option(u.normalize().getRawPath).getOrElse("")
    val path = if (rawPath.isEmpty) "/" else rawPath
    val query = Option(u.getRawQuery) match {
      case None => ""
      case Some(q) =>
        val kept = q.split("&", -1).filter(_.nonEmpty).filter { p =>
          val key = p.indexOf('=') match {
            case -1 => p
            case eq => p.substring(0, eq)
          }
          !isTracking(key)
        }
        if (kept.isEmpty) ""
        else "?" + kept.sortBy(p => (p.takeWhile(_ != '='), p)).mkString("&")
    }
    Some(s"$scheme://$host$portPart$path$query")
  }

  /** Registered host of a canonical-izable URL (lowercased), else None. */
  def urlHost(url: String): Option[String] =
    canonicalizeUrl(url).map { c =>
      val afterScheme = c.indexOf("://") + 3
      val end = c.indexWhere(ch => ch == '/' || ch == ':', afterScheme)
      if (end < 0) c.substring(afterScheme) else c.substring(afterScheme, end)
    }

  private val canonUdf = udf((s: String) => canonicalizeUrl(s))
  private val hostUdf = udf((s: String) => urlHost(s))

  /** Column forms (null-safe: unparseable → null). */
  def canonicalize(c: Column): Column = canonUdf(c)
  def host(c: Column): Column = hostUdf(c)

  /** Add `canonical_url` + `url_host` columns — the keys URL-level exact
    * dedup (groupBy canonical_url) and per-host budgeting stand on.
    * Shuffle-free: one projection, no exchange. */
  def withCanonicalUrls(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("canonical_url", canonicalize(col(urlCol)))
      .withColumn("url_host", host(col(urlCol)))

  /** The dot-boundary suffix chain of a host, most-specific first:
    * `a.b.com` -> [`a.b.com`, `b.com`, `com`]. Pure built-ins (split /
    * sequence / transform / slice / array_join) so the explode stays a
    * codegen projection — no UDF in the hot path. */
  def hostSuffixes(c: Column): Column = {
    val labels = split(c, "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels) - i + 1), "."))
  }

  /** Domain-blocklist filtering (the UT1/adult-list scrub every crawl
    * pipeline runs before anything else): a doc is BLOCKED when its host
    * equals a listed domain or is a subdomain of one (suffix match on
    * dot boundaries — `x.ads.example` matches listed `ads.example`,
    * `notads.example` does not).
    *
    * Scale shape: real blocklists are millions of domains — far too big
    * to regex-alternate, small enough to broadcast (~100 MB). A host has
    * at most its label count of candidate suffixes, so each doc explodes
    * into that BOUNDED chain (a projection, no shuffle) and the match is
    * one broadcast equality semi-join against the list; the corpus is
    * never shuffled at all. The per-doc hit aggregation groups only the
    * HIT subset (<= corpus, usually tiny).
    *
    * Output: `docs` + `matched_domain` (lexicographically smallest
    * matched list entry, null when clean) + `blocked` (0/1). */
  def blocklistFilter(docs: DataFrame, idCol: String, hostCol: String,
                      blocklist: DataFrame): DataFrame = {
    require(blocklist.columns.length == 1,
      s"blocklistFilter: blocklist must be a single domain column, got " +
        blocklist.columns.mkString("(", ", ", ")"))
    val listKey = blocklist.columns.head
    val hits = docs
      .select(col(idCol), explode(hostSuffixes(lower(col(hostCol)))).as("__sfx"))
      .join(broadcast(blocklist.select(lower(col(listKey)).as("__sfx"))), Seq("__sfx"))
      .groupBy(idCol)
      .agg(min(col("__sfx")).as("matched_domain"))
    docs.join(hits, Seq(idCol), "left_outer")
      .withColumn("blocked",
        when(col("matched_domain").isNotNull, 1L).otherwise(0L))
  }
}
