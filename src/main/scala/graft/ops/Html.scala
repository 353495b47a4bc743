package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level HTML text extraction — the bridge from crawled payloads
  * (`warc_records.payload`, SURVEY §1.1) to the `documents`-shaped corpus
  * the §2.10 curation ops consume. The reference pipeline stops at the
  * index (pywb renders payloads at replay time); a training-data pipeline
  * needs the payload → clean-text step inside the engine, so it lives here
  * as pure catalyst expressions: every function below composes built-in
  * codegen'd string ops (regexp_replace / decode / when) — no UDFs, stays
  * inside whole-stage codegen, fully distributed.
  *
  * Fidelity scope: tag/script/style/comment stripping, the HTML entities
  * crawled text actually carries, per-row charset decode for the charsets
  * web archives actually declare (utf-8 / iso-8859-1 / us-ascii families).
  * A DOM-accurate extractor is a deliberate non-goal (needs a parser lib);
  * the regex subset is the 80% that matters for corpus building and is
  * golden-tested in HtmlSpec.
  */
object Html {

  /** charset declared in a Content-Type value, lowercased; utf-8 default */
  def charsetOf(mime: Column): Column =
    lower(coalesce(
      nullif(regexp_extract(mime, "(?i)charset=\"?([A-Za-z0-9_\\-]+)", 1), lit("")),
      lit("utf-8")))

  /** payload bytes → string via the row's declared charset. Unknown
    * charsets fall back to UTF-8 (the dominant correct guess on the web).
    * Each branch is the built-in `decode` with a literal charset, so the
    * CASE stays codegen'd. */
  def decodePayload(payload: Column, cs: Column): Column =
    when(cs.isin("iso-8859-1", "iso8859-1", "latin-1", "latin1", "windows-1252"),
      decode(payload, "ISO-8859-1"))
      .when(cs.isin("us-ascii", "ascii"), decode(payload, "US-ASCII"))
      .otherwise(decode(payload, "UTF-8"))

  /** the entities crawled text actually carries, in decode-safe order */
  private def decodeEntities(c: Column): Column =
    Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'",
      "&amp;" -> "&" // last: &amp;lt; must become &lt;, not <
    ).foldLeft(c) { case (acc, (e, r)) => regexp_replace(acc, e, r) }

  /** `<title>` text (entity-decoded, trimmed), null when absent */
  def title(html: Column): Column =
    nullif(trim(decodeEntities(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1))), lit(""))

  /** visible text: drop script/style subtrees and comments, strip tags,
    * decode the common entities, collapse whitespace */
  def text(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<(script|style)[^>]*>.*?</\\1\\s*>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    trim(regexp_replace(decodeEntities(noTags), "\\s+", " "))
  }

  /** one-call extraction over a `warc_records`-shaped frame: keeps 200
    * text/html responses, decodes per-row charset, emits the
    * documents-shaped columns downstream curation ops expect */
  def extract(warc: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cs = charsetOf(col("mime"))
    val html = decodePayload(col("payload"), cs)
    warc
      .filter(col("record_type") === "response" &&
        // lower(): Content-Type arrives as 'Text/HTML; ...' in real crawls
        // (charsetOf is already (?i) for the same reason)
        col("status") === 200 && lower(col("mime")).contains("html"))
      .select(
        col("url"), col("ts"), cs.as("charset"),
        title(html).as("title"), text(html).as("text"))
      .withColumn("n_tokens", Text.wordCount(col("text")))
  }
}
