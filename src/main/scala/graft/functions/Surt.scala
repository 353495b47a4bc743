package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SURT (Sort-friendly URI Reordering Transform) canonicalization,
  * composed from codegen'd built-ins (SURVEY.md §2.2 `surt_key`).
  *
  * Mirrors the behavior of the public `surt` package as used by the
  * reference pipeline (indexwarcsjob.py via pywb write_cdx_index, recon):
  * lowercase; strip scheme, `www\d*.` prefix, port and fragment; reverse
  * host labels joined by `,` with `)` separator; sort query params.
  * Deviation from full surt, documented: ALL ports are stripped (surt keeps
  * non-default ports); IDN hosts are not punycoded.
  */
object Surt {

  /** `www.a.b.com` -> `com,b,a` (exercises ArrayType ops). */
  def hostReverse(host: Column): Column =
    concat_ws(",", reverse(split(regexp_replace(lower(host), "^www\\d*\\.", ""), "\\.")))

  /** `b=2&a=1` -> `a=1&b=2` (binary-collation ascending, like surt). */
  def querySort(q: Column): Column =
    concat_ws("&", array_sort(split(q, "&")))

  /** Full URL -> SURT key, e.g.
    * `http://www.Example.com/Path?b=2&a=1` -> `com,example)/path?a=1&b=2`.
    */
  def surtKey(url: Column): Column = {
    val host = parse_url(url, lit("HOST"))
    val path = lower(coalesce(parse_url(url, lit("PATH")), lit("/")))
    val q    = lower(parse_url(url, lit("QUERY")))
    concat(
      hostReverse(host),
      lit(")"),
      when(length(path) === 0, lit("/")).otherwise(path),
      when(q.isNotNull && length(q) > 0, concat(lit("?"), querySort(q))).otherwise(lit("")))
  }
}
