package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL/IRI canonicalization for KG subject minting — the normalization
  * pass every web-scale pipeline runs before URLs become stable IRIs
  * (the reference's analog is its stable-IRI discipline: one subject per
  * document identity, never two spellings of the same thing —
  * CityModel.cpp's instance IRIs are minted once from the document).
  *
  * Rules (the RFC 3986 syntax-based normalizations that are safe without
  * fetching, plus the tracking-param strip every crawler applies):
  *  - scheme and host lowercased (case-insensitive by spec; path is NOT
  *    touched — it is case-sensitive),
  *  - default port dropped (`:443` for https, `:80` for http),
  *  - fragment dropped (never sent to the server; two spellings of one
  *    resource),
  *  - a query string consisting of `utm_*` tracking params dropped,
  *  - trailing slashes stripped (including the bare root — one canonical
  *    spelling per resource; documented choice, not RFC-mandated).
  *
  * Built entirely from codegen'd built-in expressions (regexp_extract /
  * regexp_replace / lower / when) — no UDF, stays inside whole-stage
  * codegen, and every regex is anchored so Spark's replace-all and other
  * engines' replace-first semantics agree (at most one match possible).
  */
object UrlCanon {

  def canonical(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host0 = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .otherwise(host0)
    val rest0 = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val noFrag = regexp_replace(rest0, "#.*$", "")
    // strip the query only when EVERY param is a utm_* tracking param — a
    // mixed query ('?utm_source=x&page=2') keeps its meaningful params
    val noUtm = regexp_replace(noFrag, "\\?utm_[^&#]*(&utm_[^&#]*)*$", "")
    concat(scheme, lit("://"), host, regexp_replace(noUtm, "/+$", ""))
  }
}
