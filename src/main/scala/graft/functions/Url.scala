package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus dedup — the normalization applied
  * before exact/near dedup so that trivially-different URLs of the same
  * resource collapse to one key (the reference dedups extracted rows on
  * business keys; a web-scale corpus dedups on the canonical URL first).
  *
  * Canonical form:
  *   - scheme and host lowercased; a leading `www.` stripped from the host
  *   - default ports dropped (`:80` for http, `:443` for https); other
  *     ports kept
  *   - fragment (`#...`) dropped
  *   - tracking query params (`utm_*`) dropped; remaining params sorted
  *     byte-wise; `?` dropped when nothing survives
  *   - trailing `/` stripped from the path; an empty path becomes `/`
  *
  * Everything is a single codegen'd projection over Spark's regexp/array
  * functions — no UDF, no shuffle; the DuckDB oracle replays the identical
  * steps with `regexp_extract` / `list_filter` / `list_sort` (q96).
  */
object Url {

  /** Canonicalize a URL column (`scheme://host[:port][/path][?query][#frag]`).
    * Input without a `scheme://` prefix is returned UNCHANGED: an earlier
    * form reassembled `://host/...` around whatever it could parse, so
    * re-canonicalizing an already-processed corpus turned `example.com/p`
    * into `://example.com/p` and split dedup keys — pass-through keeps the
    * operator idempotent on every input (the property test generates both
    * schemed and schemeless cases). Garbage stays garbage (canonicalization
    * is a dedup key, not a validator). */
  def canonicalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = regexp_extract(rest, "^([^/?]*)", 1)
    val host = regexp_replace(
      lower(regexp_replace(hostPort, ":[0-9]+$", "")), "^www\\.", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val portPart = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"),
      lit("")).otherwise(concat(lit(":"), port))
    val pathQuery = substring(rest, length(hostPort) + 1, lit(1 << 20))
    val rawPath = regexp_extract(pathQuery, "^([^?]*)", 1)
    val path = when(regexp_replace(rawPath, "/+$", "") === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "/+$", ""))
    val rawQuery = regexp_extract(pathQuery, "\\?(.*)$", 1)
    val params = sort_array(filter(split(rawQuery, "&"),
      p => p =!= "" && !p.startsWith("utm_")))
    val queryPart = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), host, portPart, path, queryPart))
  }
}
