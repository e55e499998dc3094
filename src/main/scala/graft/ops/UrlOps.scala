package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the web-corpus curation axis (C4/RefinedWeb
  * style): before any domain-level statistic, quota, or blocklist can
  * be trusted, raw crawl URLs must collapse to one canonical form per
  * resource. Rules (each a narrow, codegen'd string expression —
  * per-row pure, zero shuffles at any scale; the DuckDB oracle mirrors
  * every step with the same Java∩RE2 regex dialect the PII scanner
  * established):
  *
  *  1. fragment stripped (`#...` never reaches the server);
  *  2. scheme and host lowercased (RFC 3986 §6.2.2.1 — case-insensitive
  *     components; paths stay case-sensitive);
  *  3. default ports stripped (`:80` for http, `:443` for https);
  *  4. tracking parameters removed: `utm_*`, `gclid`, `fbclid`, `ref`,
  *     `msclkid` (the CCNet/C4 dedup-prep convention) — remaining
  *     params keep their original order; an emptied query string drops
  *     its `?` entirely;
  *  5. trailing slash stripped from non-root paths; an empty path
  *     becomes `/`.
  */
object UrlOps {

  /** Param names treated as tracking noise (regex alternation) — the
    * CCNet/C4 web-curation convention. Caveat: bare `ref` is in the
    * list because referral tags dominate its real-world use, but some
    * sites carry a CONTENT-BEARING ref= (a resource reference); those
    * URLs collapse onto one canonical form. That loses nothing for
    * frequency/quota stats, but if canonical URLs ever become the key
    * of an EXACT dedup, scope `ref` to known tracking values (or drop
    * it) so distinct resources don't merge. */
  final val TrackingParams = "utm_[a-z]+|gclid|fbclid|ref|msclkid"

  /** Lowercased scheme of a URL literal. */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host:port component (between `://` and the first `/`
    * or `?`). */
  def hostPort(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))

  /** Host with its default port stripped (and any port removed for
    * [[domain]] purposes when `keepNonDefault` is false). */
  private def canonHostPort(sch: Column, hp: Column): Column =
    when(sch === "https", regexp_replace(hp, ":443$", ""))
      .when(sch === "http", regexp_replace(hp, ":80$", ""))
      .otherwise(hp)

  /** The registrable host alone — canonical lowercase, no port. The
    * per-domain key every curation statistic groups by. */
  def domain(url: Column): Column =
    regexp_extract(hostPort(url), "^([^:]+)", 1)

  /** Path + query tail (everything after host:port, before `#`). */
  private def tail(url: Column): Column =
    regexp_replace(
      regexp_replace(url, "#.*$", ""),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")

  /** Canonical form per the object doc. Pure string expressions —
    * whole-stage codegen keeps this inside the scan's pipeline. */
  def canonicalize(url: Column): Column = {
    val sch = scheme(url)
    val host = canonHostPort(sch, hostPort(url))
    val t = tail(url)
    val path0 = regexp_extract(t, "^([^?]*)", 1)
    // non-root trailing slash dropped; empty path becomes "/"
    val path = when(path0 === "" , lit("/"))
      .when(path0 =!= "/", regexp_replace(path0, "/$", ""))
      .otherwise(path0)
    val query0 = when(t.contains("?"),
      regexp_extract(t, "\\?(.*)$", 1)).otherwise(lit(""))
    // strip tracking params: guard with '&', delete '&name=value'
    // globally, strip the leading guard back off
    val query = regexp_replace(
      regexp_replace(concat(lit("&"), query0),
        s"&($TrackingParams)=[^&]*", ""),
      "^&", "")
    concat(sch, lit("://"), host, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }

  // ── DuckDB oracle mirrors (same dialect; 'g' = replace-all, which
  //    Spark's regexp_replace does by default) ──────────────────────

  def sqlScheme(url: String): String =
    s"lower(regexp_extract($url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"

  def sqlHostPort(url: String): String =
    s"lower(regexp_extract($url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"

  def sqlDomain(url: String): String =
    s"regexp_extract(${sqlHostPort(url)}, '^([^:]+)', 1)"

  def sqlCanonicalize(url: String): String = {
    val sch = sqlScheme(url)
    val hp = sqlHostPort(url)
    val host =
      s"""CASE WHEN $sch = 'https' THEN regexp_replace($hp, ':443$$', '')
         |WHEN $sch = 'http' THEN regexp_replace($hp, ':80$$', '')
         |ELSE $hp END""".stripMargin.replace("\n", " ")
    val t = s"regexp_replace(regexp_replace($url, '#.*$$', ''), " +
      s"'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')"
    val path0 = s"regexp_extract($t, '^([^?]*)', 1)"
    val path =
      s"""CASE WHEN $path0 = '' THEN '/'
         |WHEN $path0 <> '/' THEN regexp_replace($path0, '/$$', '')
         |ELSE $path0 END""".stripMargin.replace("\n", " ")
    val query0 =
      s"CASE WHEN contains($t, '?') THEN regexp_extract($t, '\\?(.*)$$', 1) ELSE '' END"
    val query = s"regexp_replace(regexp_replace('&' || $query0, " +
      s"'&($TrackingParams)=[^&]*', '', 'g'), '^&', '')"
    s"""$sch || '://' || $host || $path ||
       |CASE WHEN $query = '' THEN '' ELSE '?' || $query END"""
      .stripMargin.replace("\n", " ")
  }
}
