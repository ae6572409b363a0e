package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the normalization
  * pass that runs before URL-level dedup, per-domain budgeting, and
  * robots/blocklist joins. Rules (the standard safe subset):
  *
  *  - scheme and host lowercased;
  *  - default port stripped (`:80` for http, `:443` for https; any
  *    other port is meaningful and kept);
  *  - trailing slashes stripped from the path;
  *  - tracking params (`utm_*`) removed, remaining query params sorted
  *    byte-lexicographically so param order never splits a URL;
  *  - fragment dropped (never sent to the server).
  *
  * Everything is built-in Column expressions — regexp extracts plus
  * one small-array sort per row — so the pass is map-only, codegen'd
  * where Spark can, and fuses into the scan at 100 TB. The per-row
  * higher-order filter/sort runs over ≤ a handful of params, not over
  * document content (the interpreted-HOF hot-loop trap does not apply).
  */
object UrlFunctions {

  /** Lowercased scheme (`http`, `https`, …). */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host with the scheme's default port stripped; a
    * non-default port is kept. */
  def urlHost(url: Column): Column = {
    val hostport = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val scheme = urlScheme(url)
    when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
  }

  /** Path with trailing slashes stripped (empty for a bare host). */
  def urlPath(url: Column): Column =
    regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
      "/+$", "")

  /** Query with `utm_*` tracking params removed and the rest sorted;
    * empty string when nothing survives. */
  def urlQuery(url: Column): Column = {
    val raw = regexp_extract(url, "\\?([^#]*)", 1)
    val params = filter(split(raw, "&"),
      p => p =!= "" && !p.startsWith("utm_"))
    array_join(array_sort(params), "&")
  }

  /** Both canonicalization outputs from ONE fused byte-level pass —
    * `struct(canonical_url, reg_domain)` via the native
    * [[org.apache.spark.sql.graft.CanonicalUrl]] expression (pinned
    * bit-equal to the relational reference by UrlFunctionsSpec). Use
    * this form on hot paths: the relational composition scans the URL
    * with five regexes + an interpreted HOF pair per consumer. */
  def canonicalParts(url: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.CanonicalUrl(
        org.apache.spark.sql.graft.ColumnShim.expression(url)))

  /** The canonical form: scheme://host path [?sorted-query]. */
  def canonicalUrl(url: Column): Column =
    canonicalParts(url).getField("canonical_url")

  /** The composed-builtins reference formulation of [[canonicalUrl]] —
    * kept as the independent semantic definition the native expression
    * is pinned against (UrlFunctionsSpec bit-equality). */
  def relationalCanonicalUrl(url: Column): Column = {
    val q = urlQuery(url)
    concat(urlScheme(url), lit("://"), urlHost(url), urlPath(url),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Registered domain approximation: the last two host labels
    * (`www.shop.example.com` → `example.com`) — the grouping key for
    * per-domain crawl budgets and blocklists. (A public-suffix-list
    * lookup would replace this in production; the two-label rule is the
    * deterministic, dependency-free stand-in.) */
  def registeredDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
}
