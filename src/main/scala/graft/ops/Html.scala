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
  * crawled text actually carries — the common named set plus full
  * numeric/hex character references (`&#233;`, `&#x263A;`) — per-row
  * charset decode for the charsets web archives actually declare
  * (utf-8 / iso-8859-1 / us-ascii families).
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

  /** one Unicode codepoint as a string, from its integer value — built
    * from the UTF-32BE byte form (4 hex-padded bytes → decode), since
    * the builtin `chr` masks to one byte and would corrupt anything
    * past U+00FF. Callers must range-guard (≤ U+10FFFF, no surrogates):
    * Spark 4's decode throws on malformed coding. */
  private def codepointChar(cp: Column): Column =
    decode(to_binary(lpad(hex(cp), 8, "0"), lit("hex")), "UTF-32")

  /** numeric (`&#247;`) and hex (`&#x41;`) character references — real
    * pages carry both. Split on lookahead boundaries so each piece
    * starts with at most one reference; invalid codepoints (out of
    * range, surrogates) stay literal text, like browsers render
    * unparseable references. The containment guard keeps reference-free
    * text (the overwhelmingly common case) to one `contains`. */
  private def decodeNumericEntities(c: Column): Column = {
    // codepoint 38 ('&') is DEFERRED to decodeEntities' final pass: an
    // early '&' would merge with following text into a named-entity
    // shape ('&#38;lt;' -> '&lt;' -> '<'), double-decoding what a
    // browser renders literally as '&lt;' — the same single-pass rule
    // the '&amp;-last' ordering protects for the named form
    def cpOk(cp: Column) =
      cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF) && cp =!= 38
    val decoded = array_join(
      transform(split(c, "(?=&#)"), p => {
        val dec = nullif(regexp_extract(p, "^&#([0-9]{1,7});", 1), lit(""))
        val hx = nullif(regexp_extract(p, "^&#[xX]([0-9A-Fa-f]{1,6});", 1), lit(""))
        when(dec.isNotNull && cpOk(dec.cast("int")),
          concat(codepointChar(dec.cast("int")),
            regexp_replace(p, "^&#[0-9]{1,7};", "")))
          .when(hx.isNotNull && cpOk(conv(hx, 16, 10).cast("int")),
            concat(codepointChar(conv(hx, 16, 10).cast("int")),
              regexp_replace(p, "^&#[xX][0-9A-Fa-f]{1,6};", "")))
          .otherwise(p)
      }), "")
    when(c.contains("&#"), decoded).otherwise(c)
  }

  /** the entities crawled text actually carries, in decode-safe order:
    * numeric/hex references first (matching the browser result for
    * `&amp;#65;` — the `&amp;` stays escaped through one decode pass;
    * `&#39;` decodes on the numeric path, so no named rule for it), then
    * the named set, then the DEFERRED ampersand references (`&#38;` /
    * `&#x26;`, leading zeros included) — after the named pass, exactly
    * like `&amp;`, so one decode pass never cascades into a second */
  private def decodeEntities(c: Column): Column = {
    val named = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&apos;" -> "'",
      "&amp;" -> "&" // last: &amp;lt; must become &lt;, not <
    ).foldLeft(decodeNumericEntities(c)) {
      case (acc, (e, r)) => regexp_replace(acc, e, r)
    }
    regexp_replace(named, "&#0*38;|&#[xX]0*26;", "&")
  }

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

  /** stopword list for the main-content block classifier: the Gopher
    * stop-signal set ∪ [[Text.defaultStopwords]] — closed-class English
    * words whose per-block density separates prose from chrome (the
    * jusText signal, Pomikálek 2011 §4.2). KEEP IN LOCKSTEP with the
    * html_main_content oracle literal (Curation.scala). */
  val contentStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with",
      "a", "in", "is", "for")

  /** block-level segmentation boundaries — any open or close of a tag
    * that starts a new visual block (the jusText paragraph unit) */
  private[graft] val blockSplitRe =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|td|th|tr|table|thead|tbody|" +
      "section|article|blockquote|pre|figure|figcaption|main|center)" +
      "(?:\\s[^>]*)?>|<(?:br|hr)\\s*/?+>"

  /** script/style/comment strip PLUS whole-subtree removal of the chrome
    * containers (head/title/nav/header/footer/aside/form) — the tags a
    * browser never renders as main content. Non-greedy, so a nested
    * same-tag chrome element closes at the first matching close tag (the
    * documented regex-subset fidelity bound, same as script/style). */
  private def chromeStripped(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<(script|style)[^>]*>.*?</\\1\\s*>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    regexp_replace(noComment,
      "(?is)<(head|title|nav|header|footer|aside|form)(\\s[^>]*)?>.*?</\\1\\s*>", " ")
  }

  /** one block's visible text: strip inline tags, decode entities,
    * collapse whitespace */
  private def blockText(b: Column): Column =
    trim(regexp_replace(decodeEntities(regexp_replace(b, "(?s)<[^>]*>", " ")), "\\s+", " "))

  /** per-block (text, link-chars) structs after chrome removal. Link
    * chars are measured as the character loss from deleting `<a>`
    * subtrees — no second parse, stays in codegen. */
  private def blockStructs(html: Column): Column =
    transform(split(chromeStripped(html), blockSplitRe), b => {
      val total = blockText(b)
      val nonLink = blockText(regexp_replace(b, "(?is)<a(\\s[^>]*)?>.*?</a\\s*>", " "))
      struct(total.as("t"), (length(total) - length(nonLink)).as("lc"))
    })

  /** jusText-shaped keep decision for one scored block, integer-exact
    * (cross-multiplied thresholds so a SQL oracle replays bit-for-bit):
    * link density ≤ 1/3, ≥ 40 chars, and either stopword density ≥ 1/4
    * (prose signal) or ≥ 200 chars (long low-link text is content even
    * when the stop list's language doesn't match). */
  private def isContent(s: Column): Column = {
    val bc = length(s("t"))
    val toks = Dedup.tokens(s("t"))
    s("lc") * 3 <= bc && bc >= 40 &&
      (size(filter(toks, w => w.isInCollection(contentStops))) * 4 >= size(toks) ||
        bc >= 200)
  }

  /** the blocks [[mainContent]] keeps, as (t: text, lc: link-chars)
    * structs — exposed so callers can count/inspect without re-splitting */
  def mainBlocks(html: Column): Column = filter(blockStructs(html), isContent _)

  /** main-content extraction (boilerplate removal): chrome subtrees
    * dropped, the remainder segmented into blocks, and only
    * content-classified blocks kept (jusText/trafilatura shape), joined
    * with newlines. Pure codegen'd built-ins end-to-end — at 100 TB this
    * is a map-side projection that fuses into the WARC scan's
    * WholeStageCodegen, zero shuffles. */
  def mainContent(html: Column): Column =
    array_join(transform(mainBlocks(html), s => s("t")), "\n")

  /** resolve `href` against `base` — absolute kept, protocol-relative
    * gets the base scheme, root-relative the base origin, path-relative
    * the base directory. Shared by the per-anchor resolution and the
    * `<base href>` resolution in [[links]] (a base href may itself be
    * relative to the page URL). */
  private def resolve(base: Column, href: Column): Column = {
    val scheme = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    val origin = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/]+)", 1)
    val dir = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://.*/)[^/]*$", 1)
    when(href.rlike("(?i)^[a-z][a-z0-9+.-]*://"), href)
      .when(href.startsWith("//"), concat(scheme, lit(":"), href))
      .when(href.startsWith("/"), concat(origin, href))
      .otherwise(concat(
        coalesce(nullif(dir, lit("")), concat(origin, lit("/"))), href))
  }

  /** RFC 3986 §5.2.4-shaped dot-segment removal on the PATH component
    * of an absolute URL: `/./` and a trailing `/.` vanish, `/seg/../`
    * collapses (up to 6 levels per URL — a deeper `../` chain stays
    * partially normalized, the documented bound of this loop-free
    * codegen form), a leading `/../` clamps to root. Query/fragment
    * bytes are never touched — resolvers only normalize paths. */
  private[graft] def normalizeDots(u: Column): Column = {
    val origin = regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val rest = u.substr(length(origin) + 1, length(u))
    val path0 = regexp_extract(rest, "^([^?#]*)", 1)
    val tail = rest.substr(length(path0) + 1, length(rest))
    // lookaheads keep the boundary slash unconsumed, so adjacent /./././
    // collapse in ONE pass; the ../ collapse genuinely needs iteration
    // (each pass removes one nesting level)
    val noDot = regexp_replace(path0, "/\\.(?=/|$)", "")
    val collapsed = (1 to 6).foldLeft(noDot)((p, _) =>
      regexp_replace(regexp_replace(p,
        "/(?!\\.\\.(?=/|$))[^/]+/\\.\\.(?=/|$)", ""),
        "^/\\.\\.(?=/|$)", ""))
    val path = when(collapsed === "" && path0 =!= "", lit("/")).otherwise(collapsed)
    concat(origin, path, tail)
  }

  /** Outlink extraction — the web-graph edge feed when WAT sidecars are
    * absent (the in-engine twin of [[graft.Pipeline.watLinks]]): every
    * `<a href>` element yields a (dst, anchor) struct with the href
    * RESOLVED against the page's effective base — the first
    * `<base href>` when present (itself resolved against the page URL,
    * per HTML spec), the page URL otherwise — then dot-segments
    * normalized ([[normalizeDots]]; the when() guard keeps the common
    * dotless link on the cheap path). Fragment/javascript/mailto
    * pseudo-links drop. Anchor text is tag-stripped/entity-decoded/
    * whitespace-collapsed. All codegen'd built-ins (regexp_extract_all +
    * HOFs) — map-side, zero shuffles, fuses into the scan. */
  def links(html: Column, baseUrl: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<(script|style)[^>]*>.*?</\\1\\s*>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val anchors = regexp_extract_all(noComment,
      lit("(?is)<a\\s[^>]*href[^>]*>.*?</a\\s*>"), lit(0))
    // the same quoted-first coalesce chain as the per-anchor href below:
    // a quoted base value may legally contain spaces (`href="/my dir/"`),
    // which the bare-form pattern would truncate at the space — silently
    // re-rooting every relative link on the page
    val baseTag = nullif(regexp_extract(noComment,
      "(?is)<base\\s[^>]*?href[^>]*>", 0), lit(""))
    val rawBase = nullif(trim(coalesce(
      nullif(regexp_extract(baseTag, "(?is)href\\s*=\\s*\"([^\"]*)\"", 1), lit("")),
      nullif(regexp_extract(baseTag, "(?is)href\\s*=\\s*'([^']*)'", 1), lit("")),
      nullif(regexp_extract(baseTag, "(?is)href\\s*=\\s*([^\\s\"'>]+)", 1), lit("")))),
      lit(""))
    val effBase = when(rawBase.isNull, baseUrl).otherwise(resolve(baseUrl, rawBase))
    // HOIST the per-PAGE work out of the per-ANCHOR lambda: effBase (and
    // its scheme/origin/dir derivations) embed the full-document
    // script-strip/<base> regexes — inlined into the lambda they would
    // re-run per anchor (HOF lambdas have no subexpression caching),
    // turning the map-side pass into O(anchors × page bytes). The
    // one-element transform() binds them to a lambda VARIABLE, evaluated
    // once per row; only the cheap per-anchor string ops stay inside.
    val pageCtx = struct(
      regexp_extract(effBase, "^([A-Za-z][A-Za-z0-9+.-]*):", 1).as("sch"),
      regexp_extract(effBase, "^([A-Za-z][A-Za-z0-9+.-]*://[^/]+)", 1).as("org"),
      regexp_extract(effBase, "^([A-Za-z][A-Za-z0-9+.-]*://.*/)[^/]*$", 1).as("dir"),
      anchors.as("anchors"))
    element_at(
      transform(array(pageCtx), c =>
        filter(
          transform(c("anchors"), a => {
            // quoted forms first; the bare form stops at whitespace/>/quote
            val href = trim(coalesce(
              nullif(regexp_extract(a, "(?is)href\\s*=\\s*\"([^\"]*)\"", 1), lit("")),
              nullif(regexp_extract(a, "(?is)href\\s*=\\s*'([^']*)'", 1), lit("")),
              nullif(regexp_extract(a, "(?is)href\\s*=\\s*([^\\s\"'>]+)", 1), lit(""))))
            val dst0 =
              when(href.isNull || href === "" || href.startsWith("#") ||
                lower(href).startsWith("javascript:") || lower(href).startsWith("mailto:"),
                lit(null).cast("string"))
                .when(href.rlike("(?i)^[a-z][a-z0-9+.-]*://"), href)
                .when(href.startsWith("//"), concat(c("sch"), lit(":"), href))
                .when(href.startsWith("/"), concat(c("org"), href))
                .otherwise(concat(
                  coalesce(nullif(c("dir"), lit("")), concat(c("org"), lit("/"))), href))
            val dst = when(dst0.contains("/."), normalizeDots(dst0)).otherwise(dst0)
            struct(dst.as("dst"), blockText(a).as("anchor"))
          }),
          s => s("dst").isNotNull)),
      1)
  }

  /** one-call extraction over a `warc_records`-shaped frame: keeps 200
    * text/html responses, decodes per-row charset, emits the
    * documents-shaped columns downstream curation ops expect */
  def extract(warc: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    extractWith(warc, text)

  /** [[extract]] with boilerplate removal: `text` is [[mainContent]]
    * (nav/footer/link-farm chrome dropped), the corpus-building default —
    * the published pipelines (C4, Gopher, RefinedWeb) all extract main
    * content BEFORE their quality gates, so chrome never inflates
    * token counts. */
  def extractMain(warc: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    extractWith(warc, mainContent)

  /** the page gate every HTML consumer shares — 200 text/html responses
    * (lower(): Content-Type arrives as 'Text/HTML; ...' in real crawls;
    * charsetOf is (?i) for the same reason). ONE definition, so
    * extract/extractMain and the WET/WAT generators
    * ([[graft.Pipeline.toWet]]/[[graft.Pipeline.toWat]]) can never
    * diverge on what counts as a page. */
  def htmlResponses(warc: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    warc.filter(col("record_type") === "response" &&
      col("status") === 200 && lower(col("mime")).contains("html"))

  private def extractWith(
      warc: org.apache.spark.sql.DataFrame,
      toText: Column => Column): org.apache.spark.sql.DataFrame = {
    val cs = charsetOf(col("mime"))
    val html = decodePayload(col("payload"), cs)
    htmlResponses(warc)
      .select(
        col("url"), col("ts"), cs.as("charset"),
        title(html).as("title"), toText(html).as("text"))
      .withColumn("n_tokens", Text.wordCount(col("text")))
  }
}
