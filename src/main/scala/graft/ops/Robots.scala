package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFC 9309 robots.txt parsing and longest-match checking — the crawl-side
  * policy twin of the serving-side ACL sweep ([[graft.CdxServer.aclApply]]).
  * The reference pipeline indexes crawls that were themselves driven by
  * robots.txt (the CDX `robotflags` column records the verdict; SURVEY
  * §1.2); this implements the verdict computation so an indexing cluster
  * can re-derive or audit it at corpus scale.
  *
  * Grammar subset (documented, RFC 9309 §2.2): `User-agent` / `Allow` /
  * `Disallow` directives, case-insensitive names, `#` comments, stacked
  * `User-agent` lines forming one group, rules before any group ignored,
  * empty rule values ignored. Patterns are treated as plain path prefixes
  * (the pre-RFC subset every engine honors); `*`/`$` wildcard support
  * would slot into [[check]]'s match predicate without changing the plan
  * shape.
  *
  * Match semantics (RFC 9309 §2.2.2): for the chosen group — the agent's
  * own group if one exists for the host, else the `*` group — the rule
  * with the LONGEST matching path prefix wins; an allow/disallow tie at
  * equal length resolves to allow (least restrictive); no matching rule,
  * or no robots.txt at all, means allow.
  *
  * Plan shape at 100 TB: [[parse]] runs windows partitioned by host over
  * the robots corpus — one host's file is a few hundred lines, so the
  * per-partition sort is trivial and the table is O(hosts), tiny next to
  * the capture corpus. [[check]] joins captures to rules on HOST equality
  * (prefix match rides as a join residual): web-scale rule tables (~10⁸
  * hosts) shuffle-join co-partitioned on host, and the winner window
  * keys on (host, id) so HashPartitioning(host) already satisfies its
  * ClusteredDistribution — the window REUSES the join exchange, no second
  * corpus shuffle. When the rule table is broadcast-small Catalyst takes
  * BHJ instead and the window's (host, id) exchange becomes the single
  * corpus shuffle; either regime has exactly one.
  *
  * Hot-host skew: the exchange-reuse trades balance for a shuffle — a
  * host holding a disproportionate share of captures concentrates on
  * one task in the SMJ regime. The degradation is graceful, not a
  * cliff: AQE's skew-join split divides the hot join partition, and the
  * window's ClusteredDistribution([host, id]) is then re-satisfied by a
  * balanced hash(host, id) exchange AQE inserts — two exchanges under
  * skew, one when balanced, never a straggler bound by |hot host|
  * (SkewSpec measures this).
  */
object Robots {

  /** Directive lines of robots.txt texts `(host, txt)`: comments stripped,
    * blanks dropped, names lowercased, each line tagged with its rule
    * GROUP id (running count of group starts; stacked `User-agent` lines
    * share one group). Columns: host, ln (1-based), directive, value,
    * block (0 = before any group). */
  def directives(texts: DataFrame, hostCol: String = "host", txtCol: String = "txt",
      extra: Seq[String] = Nil): DataFrame = {
    val lines = texts
      .select(col(hostCol).as("host"), posexplode(split(col(txtCol), "\n")).as(Seq("pos", "raw")))
      .select(col("host"), (col("pos") + 1).as("ln"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .where(col("line") =!= "")
      .select(col("host"), col("ln"),
        lower(regexp_extract(col("line"), "^([A-Za-z-]+)\\s*:", 1)).as("directive"),
        trim(regexp_extract(col("line"), "^[A-Za-z-]+\\s*:\\s*(.*)$", 1)).as("value"))
      .where(col("directive").isin("user-agent" +: "allow" +: "disallow" +: extra: _*))
    val byLn = Window.partitionBy("host").orderBy("ln")
    val isUa = col("directive") === "user-agent"
    lines
      .withColumn("prev_ua", lag(isUa, 1).over(byLn))
      .withColumn("block",
        sum(when(isUa && !coalesce(col("prev_ua"), lit(false)), 1).otherwise(0))
          .over(byLn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ua")
  }

  /** `(host, block, agent)` — one row per `User-agent` line. */
  def agents(d: DataFrame): DataFrame =
    d.where(col("directive") === "user-agent")
      .select(col("host"), col("block"), lower(col("value")).as("agent"))

  /** `(host, block, ln, rule, path)` — allow/disallow rows inside a group
    * with a non-empty pattern (empty `Disallow:` means "no restriction",
    * RFC 9309 §2.2.3, and pre-group rules are ignored). */
  def rules(d: DataFrame): DataFrame =
    d.where(col("directive").isin("allow", "disallow") &&
        col("value") =!= "" && col("block") > 0)
      .select(col("host"), col("block"), col("ln"),
        col("directive").as("rule"), col("value").as("path"))

  /** Flattened rule table `(host, ln, agent, rule, path)`: each rule row
    * repeated per agent of its group (stacked `User-agent` lines fan
    * out). This is `robots_parse`'s shape — the auditable form of the
    * policy corpus. */
  def parse(texts: DataFrame): DataFrame = {
    val d = directives(texts)
    rules(d).join(agents(d), Seq("host", "block"))
      .select("host", "ln", "agent", "rule", "path")
  }

  /** Rules governing `agent` per host: the agent's own group(s) when any
    * exist for the host, otherwise the `*` group(s) — groups with the
    * same chosen agent merge (RFC 9309 §2.2.1). */
  def applicable(texts: DataFrame, agent: String): DataFrame = {
    // product tokens compare case-insensitively (RFC 9309 §2.2.1) —
    // stored agents are already lowercased by [[directives]]
    val ag = agent.toLowerCase(java.util.Locale.ROOT)
    val d = directives(texts)
    val a = agents(d)
    val spec = a.where(col("agent").isin(ag, "*"))
      .groupBy("host")
      .agg(max(when(col("agent") === ag, 1).otherwise(0)).as("spec"))
    rules(d).join(a, Seq("host", "block"))
      .join(spec, Seq("host"))
      .where(col("agent") === when(col("spec") === 1, ag).otherwise("*"))
      .select("host", "rule", "path")
  }

  /** Per-URL verdict for `agent`: `urls` needs (host, `pathCol`) plus an
    * `idCol` unique within host. Output: urls' id and host plus `allowed`
    * (boolean) and `rule_path` (winning rule, null = no match → allow),
    * plus any `keep` columns of `urls` carried through unchanged (lets a
    * composition ride this one corpus shuffle instead of joining verdicts
    * back on id). The winner window partitions by (host, id) ON PURPOSE —
    * see the class note on exchange reuse. */
  def check(urls: DataFrame, texts: DataFrame, agent: String,
      idCol: String = "id", pathCol: String = "upath",
      keep: Seq[String] = Nil): DataFrame = {
    val r = applicable(texts, agent)
    val cand = urls.join(r,
      urls("host") === r("host") && col(pathCol).startsWith(col("path")), "left")
      .select(urls("host") +: col(idCol) +: col(pathCol) +: col("rule") +:
        col("path") +: keep.map(urls(_)): _*)
    // longest path wins; equal length resolves 'allow' < 'disallow'
    // lexically; two distinct equal-length prefixes cannot both match one
    // path, so (length, rule) is already a total deterministic order
    val w = Window.partitionBy(col("host"), col(idCol))
      .orderBy(length(col("path")).desc, col("rule").asc)
    cand.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col(idCol) +: col("host") +:
        coalesce(col("rule") === "allow", lit(true)).as("allowed") +:
        col("path").as("rule_path") +: keep.map(col): _*)
  }

  /** `(host, delay_sec)` — the `Crawl-delay` each host's chosen group
    * grants `agent` (the de-facto extension most engines honor; not in
    * RFC 9309, hence parsed through a WIDENED directive view so the
    * strict [[parse]]/[[check]] surface is untouched). Semantics:
    * specific group beats `*`; the FIRST delay line of the chosen
    * group(s) wins; non-numeric values are ignored; a delay before any
    * group is ignored; hosts granting none take `defaultSec`. Note the
    * widened view is also where a Crawl-delay BETWEEN stacked
    * `User-agent` lines correctly ends the stack (RFC 9309 §2.2.1:
    * only adjacent agent lines share a group) — visible here, invisible
    * to the strict rule surface. O(hosts) output — broadcast it. */
  def crawlDelays(texts: DataFrame, agent: String, defaultSec: Long): DataFrame = {
    val ag = agent.toLowerCase(java.util.Locale.ROOT)
    val d = directives(texts, extra = Seq("crawl-delay"))
    val a = agents(d)
    val spec = a.where(col("agent").isin(ag, "*"))
      .groupBy("host")
      .agg(max(when(col("agent") === ag, 1).otherwise(0)).as("spec"))
    val w = Window.partitionBy("host").orderBy("ln")
    val granted = d
      .where(col("directive") === "crawl-delay" &&
        col("value").rlike("^[0-9]{1,6}$") && col("block") > 0)
      .select(col("host"), col("block"), col("ln"),
        col("value").cast("long").as("delay_sec"))
      .join(a, Seq("host", "block"))
      .join(spec, Seq("host"))
      .where(col("agent") === when(col("spec") === 1, ag).otherwise("*"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("host", "delay_sec")
    texts.select(col("host")).distinct()
      .join(granted, Seq("host"), "left")
      .select(col("host"), coalesce(col("delay_sec"), lit(defaultSec)).as("delay_sec"))
  }

  /** Fixture robots.txt corpus over the synthetic CDX hosts
    * ([[graft.Cdx]]): urgent pins specific-group-beats-`*` and
    * longest-allow-inside-disallow; high pins stacked agents, the
    * equal-length allow/disallow tie, and the ignored empty `Disallow:`;
    * medium pins case-insensitive directives and comments; low pins
    * pre-group rules being ignored; notspecified has NO robots.txt →
    * default allow. */
  val fixture: Seq[(String, String)] = Seq(
    // Crawl-delay arms (crawlDelays; inert to the strict rule surface):
    // urgent = specific group's 2 beats the * group's 10; high = a
    // non-numeric delay is ignored (→ default); medium = lowercase
    // directive, * group grants 5; low = a delay BEFORE any group is
    // ignored (→ default)
    "www.urgent.example.org" ->
      ("# crawl policy\nUser-agent: graftbot\nDisallow: /order/1\nAllow: /order/12\nCrawl-delay: 2\n" +
        "User-agent: *\nDisallow: /\nCrawl-delay: 10"),
    "www.high.example.org" ->
      "User-agent: graftbot\nUser-agent: otherbot\nDisallow: /order/2\nAllow: /order/2\nDisallow: /order/3\nDisallow:\nCrawl-delay: fast",
    "www.medium.example.org" ->
      "USER-AGENT: *\nDISALLOW: /order/4\nallow: /order/44\ncrawl-delay: 5\n# comment line",
    "www.low.example.org" ->
      "Crawl-delay: 9\nDisallow: /order/5\nUser-agent: *\nDisallow: /order/6")

  /** (host, txt) rows as a DuckDB VALUES clause (escape-string
    * literals) — ONE escaping chain for every robots fixture, so an
    * escaping fix can never reach one oracle and miss the other. */
  private def duckValues(rows: Seq[(String, String)]): String =
    rows.map { case (h, t) =>
      val esc = t.replace("\\", "\\\\").replace("'", "''").replace("\n", "\\n")
      s"('$h', e'$esc')"
    }.mkString("(VALUES ", ", ", ") AS rb(host, txt)")

  /** The fixture as a DuckDB VALUES clause. */
  def fixtureDuck: String = duckValues(fixture)

  /** sitemaps.org discovery directive: `Sitemap: <absolute-url>`,
    * group-INDEPENDENT per the spec (it applies file-wide, wherever it
    * appears — even before any User-agent group), case-insensitive,
    * optional space after the colon. ONE pattern constant; the Spark
    * side gets it via lit() (no SQL-literal escape processing) and the
    * DuckDB oracle interpolates it into a plain '...' literal, where
    * backslashes are verbatim — both regex engines see the same chars. */
  private[graft] val SitemapRe = "(?im)^[ \\t]*sitemap:[ \\t]*(\\S+)[ \\t]*$"

  /** robots.txt sitemap discovery over a (host, txt) table — the loop
    * that feeds [[graft.ops.Sitemap.expand]]: crawlers learn sitemap
    * URLs from robots.txt, then expand index → urlsets → the frontier.
    * Map-side regexp per host file; O(hosts), never corpus-sized. */
  def sitemaps(texts: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    texts.select(col("host"),
      explode(regexp_extract_all(col("txt"), lit(SitemapRe), lit(1))).as("sitemap"))
  }

  /** fixture hosts carrying Sitemap directives — a SEPARATE fixture
    * (fixture ++ plants) so the rule-grammar keys' oracles are untouched:
    * a spaced directive, an UPPERCASE one on a CDN host (cross-host
    * sitemaps are legal and common), a space-less one, and one BEFORE
    * any group (spec: group-independent); the base hosts are the
    * negative arm (no directive → no row). */
  val sitemapFixture: Seq[(String, String)] = fixture ++ Seq(
    "www.maps.example.org" ->
      ("User-agent: *\nDisallow: /tmp\nSitemap: https://www.maps.example.org/sitemap_index.xml\n" +
        "SITEMAP: https://cdn.example.net/maps/extra-sitemap.xml"),
    "www.mixed.example.org" ->
      ("Sitemap: https://www.mixed.example.org/sm.xml\nUser-agent: *\nCrawl-delay: 3\n" +
        "sitemap:https://www.mixed.example.org/sm2.xml"))

  /** the sitemap fixture as a DuckDB VALUES clause */
  def sitemapFixtureDuck: String = duckValues(sitemapFixture)
}
