package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the dedup KEY a web-corpus pipeline applies
  * before any content hash (RefinedWeb, Penedo et al. 2023 §3.1
  * dedups by URL; CCNet keys its shards the same way): two fetches of
  * the same page routinely differ only in scheme/host case, default
  * ports, `www.`, trailing slashes, tracking parameters, parameter
  * order, or fragments, and a byte-grain key would count each variant
  * as a distinct document.
  *
  * The whole rule is ONE codegen'd Column program (regexp extraction
  * + array algebra, no UDF), so it pushes into scans, runs map-only,
  * and replays verbatim in any SQL engine with regex + list functions
  * (the DuckDB oracle mirrors it function for function).
  *
  * Canonical form: `scheme://host[:port]path[?query]` with
  *  - scheme and host lowercased, a leading `www.` stripped;
  *  - the port dropped when it is the scheme default (http:80,
  *    https:443), kept otherwise;
  *  - the path's trailing slashes stripped, the empty path restored
  *    to `/`;
  *  - query parameters split on `&`, tracking parameters removed
  *    (`utm_*` prefixes and the [[trackingParams]] list), the rest
  *    sorted BINARY (ASCII parameter names are the contract — both
  *    engines sort UTF-8 bytewise) and rejoined;
  *  - the fragment dropped.
  *
  * Out of contract (documented, not folded): percent-encoding
  * normalization, IDN/punycode, path dot-segment resolution. A URL
  * with no `scheme://` yields NULL — unparseable inputs opt OUT of
  * URL dedup loudly (the cross-lingual empty-fold convention), never
  * merge.
  */
object Urls {

  /** Exact-name tracking parameters dropped by [[canonicalize]]
    * (`utm_*` is handled as a prefix rule).
    */
  val trackingParams: Seq[String] =
    Seq("fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "igshid")

  /** The canonical-URL Column program (see object doc). */
  def canonicalize(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([^:/?#]+)://", 1))
    val hostport = lower(regexp_extract(u, "^[^:/?#]+://([^/?#]*)", 1))
    val host = regexp_replace(
      regexp_extract(hostport, "^([^:]*)", 1), "^www\\.", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val rawPath = regexp_extract(u, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    val stripped = regexp_replace(rawPath, "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    val rawQuery = regexp_extract(u, "\\?([^#]*)", 1)
    val kept = filter(split(rawQuery, "&"), p => {
      val name = regexp_extract(p, "^([^=]*)", 1)
      length(p) > 0 && !name.startsWith("utm_") &&
        !name.isin(trackingParams: _*)
    })
    val query = array_join(array_sort(kept), "&")
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path,
        when(query =!= "", concat(lit("?"), query)).otherwise(lit(""))))
  }
}
