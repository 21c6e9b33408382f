package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** URL canonicalization + dedup — the FIRST dedup pass a web-crawl
  * pipeline runs, before any content hashing: two crawls of the same
  * page typically differ only in scheme/host case, a www. prefix, a
  * default port, tracking params, param order, fragments and trailing
  * slashes. Canonicalization here is a pure map-side chain of codegen'd
  * built-ins (regexp_extract/replace, split + array_sort — no UDF, no
  * custom expression needed); dedup is then d1's keep-min-id hash
  * groupBy on the canonical key, so the only exchange carries
  * (canon_url, id) rows. Reference behavior: the id-absent insert
  * filter (loaders/__init__.py:67-75) applied at URL granularity.
  */
object Urls {

  /** Tracking params every canonicalizer strips (utm_*, common click
    * ids) — shared with the oracle SQL so the two lists cannot drift.
    * Java∩RE2 syntax only.
    */
  private[graft] val TrackingRe = "^(utm_[^=]*|ref|fbclid|gclid)="

  /** Canonicalize one URL column:
    *  1. drop the fragment;
    *  2. lowercase scheme and authority, strip a `www.` prefix and the
    *     scheme's default port (:443 for https, :80 for http);
    *  3. strip trailing slashes from the path (empty path → "/");
    *  4. drop tracking params, sort the survivors bytewise, rejoin.
    * Every step is a codegen'd built-in over the row — canonicalizing
    * 100 TB of crawl records shuffles nothing.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth0 = regexp_replace(
      lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
      "^www\\.", "")
    val auth = when(scheme === "https", regexp_replace(auth0, ":443$", ""))
      .when(scheme === "http", regexp_replace(auth0, ":80$", ""))
      .otherwise(auth0)
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val path0 = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val q0 = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val kept = array_sort(filter(split(q0, "&"),
      p => !(p.rlike(TrackingRe) || p === "")))
    val q = array_join(kept, "&")
    concat(scheme, lit("://"), auth, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** d11 `queries()` row: the corpus carries no URL column, so each doc
    * deterministically synthesizes the kind of messy URL a crawler
    * records — host-case noise, www. prefixes, a default port, shuffled
    * query params with tracking junk, fragments, trailing slashes —
    * with (source, doc_id%12)-wide collision groups so canonical merges
    * genuinely happen at gate scale. The oracle replays synthesis AND
    * canonicalization in SQL: canonical key, keeper and group size are
    * all hash-verified (t9's synthesize-and-replay pattern).
    */
  def urlDedup(t: Tables): DataFrame = {
    val d = col("doc_id")
    val host0 = concat(col("source"), lit(".example.com"))
    val host = when(pmod(d, lit(3)) === 0, upper(host0))
      .when(pmod(d, lit(3)) === 1, concat(lit("WWW."), host0))
      .otherwise(host0)
    val scheme = when(pmod(d, lit(4)) === 0, lit("HTTPS")).otherwise(lit("https"))
    val port = when(pmod(d, lit(7)) === 0, lit(":443")).otherwise(lit(""))
    val slug = pmod(d, lit(12)).cast("string")
    val path = concat(lit("/p/"), slug,
      when(pmod(d, lit(5)) === 0, lit("/")).otherwise(lit("")))
    val query = when(pmod(d, lit(2)) === 0,
        concat(lit("?a="), slug, lit("&sort=asc&utm_source=feed")))
      .otherwise(concat(lit("?utm_campaign=x&sort=asc&a="), slug))
    val frag = when(pmod(d, lit(2)) === 1,
      concat(lit("#sec"), pmod(col("n_chars"), lit(10)))).otherwise(lit(""))
    t.documents
      .select(d.as("doc_id"),
        concat(scheme, lit("://"), host, port, path, query, frag).as("url"))
      .withColumn("canon_url", canonicalizeUrl(col("url")))
      .groupBy(col("canon_url"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_urls"))
      .orderBy(col("canon_url"))
  }
}
