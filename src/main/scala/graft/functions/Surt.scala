package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SURT (Sort-friendly URI Reordering Transform) canonicalization,
  * composed from codegen'd built-ins (SURVEY.md §2.2 `surt_key`).
  *
  * Mirrors the behavior of the public `surt` package as used by the
  * reference pipeline (indexwarcsjob.py via pywb write_cdx_index, recon):
  * lowercase; strip scheme, `www\d*.` prefix, default port, userinfo and
  * fragment; KEEP non-default ports (`com,example:8080)`); reverse host
  * labels joined by `,` with `)` separator; sort query params. Returns
  * null for URLs with no parseable host (agreeing with [[SurtAlg]]).
  *
  * IDN unification: `try_parse_url` returns a NULL host for raw-IDN
  * URLs (java.net.URI can't parse them), so the composed arms would
  * null the key where the native [[SurtKeyExpr]] punycodes it. Any URL
  * carrying a non-ASCII byte therefore DELEGATES to the registered
  * `surt_key_native` expression — the two paths are identical by
  * construction on the non-ASCII tail, and the ~100% ASCII common case
  * stays on the pure-built-in codegen path. Callers must have run
  * [[GraftFunctions.register]] on the session (the driver key and the
  * specs do); analysis fails loudly otherwise.
  */
object Surt {

  /** `www.a.b.com` -> `com,b,a` (exercises ArrayType ops). */
  def hostReverse(host: Column): Column =
    concat_ws(",", reverse(split(regexp_replace(lower(host), "^www\\d*\\.", ""), "\\.")))

  /** `b=2&a=1` -> `a=1&b=2` (binary-collation ascending, like surt). */
  def querySort(q: Column): Column =
    concat_ws("&", array_sort(split(q, "&")))

  /** Full URL -> SURT key, e.g.
    * `http://www.Example.com/Path?b=2&a=1` -> `com,example)/path?a=1&b=2`;
    * `http://example.com:8080/p` -> `com,example:8080)/p`.
    */
  def surtKey(url: Column): Column =
    when(url.rlike("[^\\x00-\\x7F]"), call_udf("surt_key_native", url))
      .otherwise(surtKeyAscii(url))

  private def surtKeyAscii(url: Column): Column = {
    // try_parse_url: ANSI-mode parse_url (Spark 4 default) throws on
    // malformed URLs; the SURT contract is null for those
    val host  = try_parse_url(url, lit("HOST"))
    val path  = lower(coalesce(try_parse_url(url, lit("PATH")), lit("/")))
    val q     = lower(try_parse_url(url, lit("QUERY")))
    val proto = lower(try_parse_url(url, lit("PROTOCOL")))
    // port lives only in AUTHORITY (HOST strips it); scheme-default ports
    // are dropped, the rest survive in the key — public surt behavior
    val port = regexp_extract(try_parse_url(url, lit("AUTHORITY")), ":(\\d+)$", 1)
    val defaultPort = when(proto === "http", lit("80"))
      .when(proto === "https", lit("443"))
      .when(proto === "ftp", lit("21"))
      .otherwise(lit(""))
    val portSuffix = when(port =!= lit("") && port =!= defaultPort,
      concat(lit(":"), port)).otherwise(lit(""))
    // no otherwise(): null host (schemeless/malformed URL) -> null key,
    // matching SurtAlg.surtKey
    when(host.isNotNull && length(host) > 0,
      concat(
        hostReverse(host),
        portSuffix,
        lit(")"),
        when(length(path) === 0, lit("/")).otherwise(path),
        when(q.isNotNull && length(q) > 0, concat(lit("?"), querySort(q))).otherwise(lit(""))))
  }
}
