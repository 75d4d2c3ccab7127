package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL canonicalization for web-corpus deduplication: Common-Crawl-style pipelines
 * dedupe by canonical URL before (and besides) content hashing, since the same page
 * is crawled under fragment/query-order/port/www variants.
 *
 * Rules (deterministic, engine-portable — the DuckDB oracle q45 replays each):
 *   1. strip the fragment (`#...`)
 *   2. lowercase the scheme and the authority (host:port); paths stay case-sensitive
 *   3. drop a leading `www.`
 *   4. drop the scheme's default port (`:80` for http, `:443` for https)
 *   5. strip trailing slashes from the path; empty path becomes `/`
 *   6. sort query parameters lexicographically (drop empty segments); an empty query
 *      drops its `?`
 * Non-URL rows (no `scheme://`) pass through trimmed and unchanged.
 *
 * Pure builtin column expressions (regexp/split/array_sort) — codegen'd, narrow,
 * zero-shuffle; at 100 TB this runs at scan speed in the ingest projection.
 */
object Urls {

  def canonicalize(u: Column): Column = {
    val t = trim(u)
    val noFrag = regexp_replace(t, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    val hostport = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)", 1))
    val noWww = regexp_replace(hostport, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val pathq = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*(.*)$", 1)
    val rawPath = regexp_replace(pathq, "\\?.*$", "")
    val trimmedPath = regexp_replace(rawPath, "/+$", "")
    val path = when(trimmedPath === "", lit("/")).otherwise(trimmedPath)
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val sortedQuery = array_join(
      array_sort(filter(split(query, "&"), x => length(x) > 0)), "&")
    when(scheme === "", t).otherwise(concat(
      scheme, lit("://"), host, path,
      when(sortedQuery =!= "", concat(lit("?"), sortedQuery)).otherwise(lit(""))))
  }
}
