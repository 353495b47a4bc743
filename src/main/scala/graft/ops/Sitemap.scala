package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sitemaps.org XML expansion — the crawl-seed format every discovery
  * pipeline ingests (robots.txt `Sitemap:` lines point at these; the
  * reference's crawl inputs are downstream of exactly this fan-out).
  * Handles the two-level shape: a `<sitemapindex>` naming child
  * sitemaps, each a `<urlset>` of `<url>` entries with optional
  * `<lastmod>`/`<changefreq>`/`<priority>`.
  *
  * Parsing is regex block extraction (codegen'd `regexp_extract_all`,
  * `(?s)` for multi-line entries), not a DOM: sitemap files are spec-
  * capped (50k URLs / 50 MB), so the per-doc array is bounded, and the
  * tolerant non-greedy block grammar survives the attribute noise and
  * namespace prefixes real sitemaps carry. Missing optional fields
  * surface as null (`nullif('')` — both engines return '' for a
  * no-match extract).
  *
  * Plan shape at scale: the fetched sitemap corpus is rows of
  * (name, xml); the index's child list is a bounded explode joined back
  * to the corpus on name (broadcast when the index side is small, which
  * it is by the 50k cap); per-sitemap URL extraction is one map-side
  * explode+projection. Nothing global, no driver round trips.
  */
object Sitemap {

  /** Child sitemap names declared by `indexName`'s `<sitemapindex>`. */
  def children(texts: DataFrame, indexName: String): DataFrame =
    texts.where(col("name") === indexName)
      .select(explode(
        regexp_extract_all(col("xml"), lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1)))
        .as("block"))
      .select(wstrip(regexp_extract(col("block"), "(?s)<loc>(.*?)</loc>", 1)).as("sitemap"))

  /** Whitespace strip — NOT `trim`, which in Spark AND DuckDB removes
    * only 0x20 spaces; pretty-printed `<loc>` content carries newlines. */
  private def wstrip(c: org.apache.spark.sql.Column) =
    regexp_replace(c, "^\\s+|\\s+$", "")

  /** Expand index -> child sitemaps -> URL entries:
    * `(sitemap, loc, lastmod, changefreq, priority)`. Children named by
    * the index but absent from `texts` simply contribute no rows (the
    * fetch layer's miss, not the parser's). */
  def expand(texts: DataFrame, indexName: String): DataFrame = {
    def field(tag: String) =
      nullif(wstrip(regexp_extract(col("block"), s"(?s)<$tag>(.*?)</$tag>", 1)), lit(""))
    children(texts, indexName)
      .join(texts, col("sitemap") === col("name"))
      .select(col("sitemap"), explode(
        regexp_extract_all(col("xml"), lit("(?s)<url>(.*?)</url>"), lit(1)))
        .as("block"))
      .select(
        col("sitemap"),
        wstrip(regexp_extract(col("block"), "(?s)<loc>(.*?)</loc>", 1)).as("loc"),
        field("lastmod").as("lastmod"),
        field("changefreq").as("changefreq"),
        // regex-gated cast, NOT a bare cast: Spark 4's default ANSI mode
        // throws on '<priority>high</priority>' (tolerant grammar must
        // yield null); the gate is replayed identically in the oracle
        when(field("priority").rlike("^\\d*\\.?\\d+$"),
          field("priority").cast("double")).as("priority"))
  }

  /** Fixture: an index naming two present children plus one the fetch
    * missed; a multi-line urlset with every optional-field combination
    * (including pretty-printed whitespace INSIDE `<loc>` — the dominant
    * real-world shape, which must trim away or the child join silently
    * drops the sitemap); and an orphan urlset no index references (must
    * contribute nothing). */
  val fixture: Seq[(String, String)] = Seq(
    "sitemap_index.xml" ->
      ("<sitemapindex>\n  <sitemap>\n    <loc>\n      sitemap_a.xml\n    </loc>\n    <lastmod>2024-01-05</lastmod>\n  </sitemap>\n" +
        "  <sitemap><loc>sitemap_b.xml</loc></sitemap>\n" +
        "  <sitemap><loc>sitemap_missing.xml</loc></sitemap>\n</sitemapindex>"),
    "sitemap_a.xml" ->
      ("<urlset>\n<url>\n  <loc>\n    http://www.urgent.example.org/order/1\n  </loc>\n" +
        "  <lastmod>2024-02-01</lastmod>\n  <changefreq>daily</changefreq>\n  <priority>0.8</priority>\n</url>\n" +
        "<url><loc>http://www.urgent.example.org/order/2</loc><priority>0.5</priority></url>\n" +
        "<url><loc>http://www.high.example.org/</loc></url>\n</urlset>"),
    "sitemap_b.xml" ->
      ("<urlset><url><loc>http://www.medium.example.org/a</loc><lastmod>2024-03-01</lastmod></url>" +
        "<url><loc>http://www.medium.example.org/b</loc><changefreq>never</changefreq></url></urlset>"),
    "orphan.xml" ->
      "<urlset><url><loc>http://www.low.example.org/ignored</loc></url></urlset>")

  /** The fixture as a DuckDB VALUES clause (escape-string literals). */
  def fixtureDuck: String =
    fixture.map { case (n, x) =>
      val esc = x.replace("\\", "\\\\").replace("'", "''").replace("\n", "\\n")
      s"('$n', e'$esc')"
    }.mkString("(VALUES ", ", ", ") AS sm(name, xml)")
}
