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
  *  - the fragment stripped FIRST (everything from the first `#`),
  *    so a `?` hiding inside a fragment can never be misread as the
  *    query delimiter;
  *  - percent-encoding normalized over the whole pre-fragment URL
  *    before the structural split: `%XX` hex digits folded to
  *    UPPERCASE, and triplets encoding an unreserved character
  *    (RFC 3986 §2.3: ALPHA / DIGIT / `-._~`) decoded to the
  *    character itself (`%7Euser` ≡ `~user`; `%2f` ≡ `%2F` but NOT
  *    `/` — reserved characters stay encoded, so decoding can never
  *    mint a new delimiter); malformed triplets (`%G1`, trailing
  *    `%`) pass through untouched.
  *
  *  - path dot segments resolved (RFC 3986 §5.2.4: `/./` dropped,
  *    `/seg/../` pops `seg`, leading `..` at the root vanishes) by
  *    the string-buffer fold in [[resolveDotSegments]] — and because
  *    percent normalization runs FIRST, a dot segment hiding as
  *    `%2E` (`.` is unreserved) resolves too.
  *
  * Out of contract (documented, not folded): IDN/punycode, userinfo
  * (`user@host` — the `@` rides along inside the host field),
  * bracketed IPv6 hosts (the `:` of `[::1]:8080` splits at the
  * wrong colon), and percent-encoded HOSTS (host lowercasing runs
  * after percent normalization, so a triplet there comes out
  * lowercase — IDN territory). A URL with no `scheme://` yields
  * NULL — unparseable inputs opt OUT of URL dedup loudly (the
  * cross-lingual empty-fold convention), never merge.
  */
object Urls {

  /** Exact-name tracking parameters dropped by [[canonicalize]]
    * (`utm_*` is handled as a prefix rule).
    */
  val trackingParams: Seq[String] =
    Seq("fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "igshid")

  /** Percent-encoding normalization (see object doc): split on `%`
    * (a plain one-char split — RE2 has no lookahead, so the DuckDB
    * oracle mirrors the split verbatim), then every piece after the
    * first was preceded by one `%`: a piece opening with two hex
    * digits is a triplet — uppercase it, or decode it when it
    * encodes an unreserved byte; anything else re-attaches its `%`
    * unchanged. Pure Column program (split → transform →
    * array_join), map-only and codegen-resident like the rest of
    * the key.
    */
  def normalizePercent(s: Column): Column = {
    val hexChars = "0123456789ABCDEFabcdef".map(_.toString)
    val parts = split(s, "%", -1)
    val fixed = transform(parts, (p, i) => {
      val d1 = substring(p, 1, 1)
      val d2 = substring(p, 2, 1)
      val hex = upper(concat(d1, d2))
      val code = conv(hex, 16, 10).cast("int")
      val unreserved = (code >= 48 && code <= 57) ||
        (code >= 65 && code <= 90) || (code >= 97 && code <= 122) ||
        code.isin(45, 46, 95, 126)
      when(i === 0, p)
        .when(!(d1.isin(hexChars: _*) && d2.isin(hexChars: _*)),
          concat(lit("%"), p))
        .otherwise(concat(
          when(unreserved, chr(code)).otherwise(concat(lit("%"), hex)),
          substring(p, 3, 1 << 24)))
    })
    array_join(fixed, "")
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over an ABSOLUTE path
    * column (`""` or starting with `/` — what the [[canonicalize]]
    * path extraction yields by construction): one `aggregate` fold
    * over the `/`-split segments with the path-so-far STRING as the
    * accumulator — `.` keeps it, `..` pops the last segment
    * (`regexp_replace(acc, "/[^/]*$", "")`, which also pops an
    * empty segment, the RFC's behavior for `//..`), anything else
    * appends. A leading `..` pops the empty root and vanishes (the
    * RFC's merge rule for absolute paths). Bounded by segment count
    * — paths have bounded depth — and still a pure Column program
    * (HOF fold, no UDF), mirrored accumulator-for-accumulator by
    * DuckDB's `list_reduce` in every URL oracle. The RFC's
    * trailing-slash nuance (`/a/b/..` → `/a/` there, `/a` here) is
    * immaterial downstream: [[canonicalize]] strips trailing
    * slashes right after.
    */
  def resolveDotSegments(path: Column): Column = {
    val segs = split(path, "/", -1)
    val tail = slice(segs, lit(2), greatest(lit(0), size(segs) - 1))
    val folded = aggregate(tail, lit(""), (acc, s) =>
      when(s === ".", acc)
        .when(s === "..", regexp_replace(acc, "/[^/]*$", ""))
        .otherwise(concat(acc, lit("/"), s)))
    when(path === "", lit("")).otherwise(
      when(folded === "", lit("/")).otherwise(folded))
  }

  /** The canonical-URL Column program (see object doc). */
  def canonicalize(url: Column): Column = {
    // fragment first (the first '#' ends the parseable region — a
    // '?' inside a fragment is fragment text, not a query), percent
    // normalization second, structural split third
    val u = normalizePercent(regexp_extract(trim(url), "^([^#]*)", 1))
    val scheme = lower(regexp_extract(u, "^([^:/?#]+)://", 1))
    val hostport = lower(regexp_extract(u, "^[^:/?#]+://([^/?#]*)", 1))
    val host = regexp_replace(
      regexp_extract(hostport, "^([^:]*)", 1), "^www\\.", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val rawPath = regexp_extract(u, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    val stripped = regexp_replace(resolveDotSegments(rawPath), "/+$", "")
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
