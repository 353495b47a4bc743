package graft

import graft.formats.Warc
import graft.ops.Html
import org.apache.spark.sql.functions._

/** Golden contract for the payload→corpus extraction (ops/Html): exact
  * extracted text over the deterministic HTML WARC fixture, including the
  * charset case a UTF-8-only decoder gets wrong. */
class HtmlSpec extends SparkSpec {

  private lazy val extracted = {
    val file = java.nio.file.Files.createTempDirectory("html_spec")
      .resolve("fixture_html.warc.gz").toString
    Warc.writeFixture(file, Warc.htmlFixtureRecords)
    Html.extract(Warc.scan(spark, file)).orderBy("url").collect()
  }

  test("only 200 text/html responses survive the extract filter") {
    assert(extracted.map(_.getAs[String]("url")).toSeq == Seq(
      "http://www.example.com/bare",
      "http://www.example.com/latin",
      "http://www.example.com/menu"))
  }

  test("scripts, styles, comments, tags and entities are stripped exactly") {
    val menu = extracted.find(_.getAs[String]("url").endsWith("/menu")).get
    assert(menu.getAs[String]("title") == "Alpha & Beta")
    assert(menu.getAs[String]("text") ==
      "Alpha & Beta Café menu Tea <hot> & biscuits' price")
    assert(menu.getAs[String]("charset") == "utf-8")
  }

  test("numeric and hex character references decode; invalid ones stay literal") {
    def tx(html: String): String =
      spark.range(1).select(Html.text(lit(html)).as("t")).head().getString(0)
    // decimal, hex (both cases), BMP and supplementary-plane codepoints
    assert(tx("<p>caf&#233; &#x263A; &#X41; &#128512;</p>") == "café ☺ A 😀")
    // &amp;#65; is an ESCAPED reference: one decode pass yields the
    // literal text &#65;, never A (the browser behavior)
    assert(tx("<p>&amp;#65;</p>") == "&#65;")
    // out-of-range / surrogate / malformed references pass through as
    // text instead of killing the task (real pages carry junk)
    assert(tx("<p>&#9999999; &#xD800; &#x110000; &#12abc; &#; stays</p>") ==
      "&#9999999; &#xD800; &#x110000; &#12abc; &#; stays")
    // adjacent references and a reference at string start
    assert(tx("&#65;&#66;&#67;") == "ABC")
    // the old literal &#39; arm agrees with the numeric path
    assert(tx("<p>it&#39;s</p>") == "it's")
    // the DEFERRED ampersand: &#38;lt; is an escaped reference — one
    // decode pass yields the literal &lt;, never < (browser behavior);
    // leading zeros and the hex spelling defer identically
    assert(tx("<p>&#38;lt;b&#38;gt;</p>") == "&lt;b&gt;")
    assert(tx("<p>&#038;amp; &#x26;quot; &#X26;</p>") == "&amp; &quot; &")
    // a BARE ampersand reference still decodes to '&'
    assert(tx("<p>fish &#38; chips</p>") == "fish & chips")
  }

  test("ISO-8859-1 payloads decode through the declared charset") {
    val latin = extracted.find(_.getAs[String]("url").endsWith("/latin")).get
    assert(latin.getAs[String]("charset") == "iso-8859-1")
    assert(latin.getAs[String]("text") == "Latin résumé")
  }

  test("titleless pages yield null title, text still extracted") {
    val bare = extracted.find(_.getAs[String]("url").endsWith("/bare")).get
    assert(bare.getAs[String]("title") == null)
    assert(bare.getAs[String]("text") == "no title here")
    assert(bare.getAs[Int]("n_tokens") == 3)
  }

  test("warcToCorpus dedups identical content keeping the earliest capture") {
    // two captures of the same page at different times + one distinct
    // page; bodies are content-sized stop-dense sentences so the
    // main-content classifier keeps them (warcToCorpus extracts MAIN
    // content — a chrome-sized body would never reach the dedup stage)
    val dir = java.nio.file.Files.createTempDirectory("corpus_spec")
    val file = dir.resolve("dup.warc.gz").toString
    def b32(s: String) = s.padTo(32, '2').take(32).toUpperCase
    val page = ("<html><title>Same</title><body>The same body is here to " +
      "be kept for all of the captures in this test.</body></html>")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Warc.writeFixture(file, Seq(
      Warc.FixtureRecord("response", "http://a.example.com/", "2016-02-01T00:00:00Z",
        b32("p1"), 200, "text/html", page),
      Warc.FixtureRecord("response", "http://b.example.com/", "2016-01-01T00:00:00Z",
        b32("p2"), 200, "text/html", page),
      Warc.FixtureRecord("response", "http://c.example.com/", "2016-03-01T00:00:00Z",
        b32("p3"), 200, "text/html",
        ("<html><title>Other</title><body>A different body is here to " +
          "be kept for all of the captures in this test.</body></html>")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))))
    val corpus = Pipeline.warcToCorpus(spark, file).collect()
    assert(corpus.length == 2, "exact dup must collapse to one row")
    val kept = corpus.map(_.getAs[String]("url")).toSet
    // b is the EARLIER capture of the duplicated content
    assert(kept == Set("http://b.example.com/", "http://c.example.com/"))
    corpus.foreach { r =>
      assert(r.getAs[Double]("quality") > 0.0)
      assert(r.getAs[String]("fingerprint").length == 16)
    }
  }

  // ---- main-content extraction (boilerplate removal) ----

  private def mc(html: String): String =
    spark.range(1).select(Html.mainContent(lit(html)).as("m")).head.getString(0)

  private val goodPara =
    "Tea and biscuits are served with a pot of cream for the price of a song."

  test("mainContent: chrome subtrees drop, the content paragraph stays") {
    val html = "<html><head><title>T</title><script>var x = '<p>no</p>';</script>" +
      "</head><body><nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
      "<h1>Tiny head</h1><p>" + goodPara + "</p>" +
      "<aside>Related links here</aside>" +
      "<footer>&copy; 2024 Example. All rights reserved.</footer></body></html>"
    assert(mc(html) == goodPara)
  }

  test("mainContent: link-dense blocks drop even when long") {
    val farm = "<div><a href=\"/x\">the quick brown fox and the lazy dog</a> " +
      "<a href=\"/y\">jumps over all of the fences today</a></div>"
    assert(mc("<html><body>" + farm + "<p>" + goodPara + "</p></body></html>")
      == goodPara)
    assert(mc("<html><body>" + farm + "</body></html>") == "")
  }

  test("mainContent: short blocks drop; long low-stopword text keeps via the length arm") {
    assert(mc("<html><body><div>Read more</div><p>" + goodPara + "</p></body></html>")
      == goodPara)
    // 240 chars of a word that never hits the stop list: the >=200-char
    // override must keep it (non-English prose is still content)
    val cjkish = Seq.fill(60)("zzz").mkString(" ")
    assert(mc("<html><body><p>" + cjkish + "</p></body></html>") == cjkish)
    // but the same text at 120 chars (under the override, no stop signal) drops
    val short = Seq.fill(30)("zzz").mkString(" ")
    assert(mc("<html><body><p>" + short + "</p></body></html>") == "")
  }

  test("mainContent: kept blocks join with newlines in document order") {
    val p2 = "And that is the point of the story we have to be told with care."
    assert(mc("<html><body><p>" + goodPara + "</p><div>x</div><p>" + p2 +
      "</p></body></html>") == goodPara + "\n" + p2)
  }

  test("links: href resolution arms, quote styles, and pseudo-link drops") {
    def lk(html: String, base: String): Seq[(String, String)] =
      spark.range(1).select(explode(Html.links(lit(html), lit(base))).as("l"))
        .select(col("l")("dst"), col("l")("anchor"))
        .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    val base = "http://www.example.com/a/b/page.html"
    // double-quoted absolute (uppercase scheme normal-matched), single-
    // quoted root-relative, bare path-relative, protocol-relative
    assert(lk("<a href=\"HTTPS://x.example/p\">A</a>" +
      "<a href='/root'>B</a><a href=rel.html>C</a>" +
      "<a href=\"//cdn.example/y\">D</a>", base) == Seq(
      ("HTTPS://x.example/p", "A"),
      ("http://www.example.com/root", "B"),
      ("http://www.example.com/a/b/rel.html", "C"),
      ("http://cdn.example/y", "D")))
    // pseudo-links and missing/empty hrefs never emit
    assert(lk("<a href=\"#sec\">x</a><a href=\"javascript:void(0)\">y</a>" +
      "<a href=\"mailto:a@b\">z</a><a href=\"\">w</a>", base).isEmpty)
    // a base URL with no path resolves path-relative links under /
    assert(lk("<a href=\"p.html\">E</a>", "http://host.example") ==
      Seq(("http://host.example/p.html", "E")))
    // anchor markup and entities strip; uppercase HREF attribute matches
    assert(lk("<a HREF=\"/x\"><b>Bold</b>&amp;&nbsp;co</a>", base) ==
      Seq(("http://www.example.com/x", "Bold & co")))

    // <base href>: the FIRST base overrides path-relative resolution;
    // root-relative stays on the page origin; an absolute base rehomes
    // everything; a RELATIVE base resolves against the page URL first
    assert(lk("<head><base href=\"/based/\"></head>" +
      "<a href=rel.html>R</a><a href='/root'>O</a>", base) == Seq(
      ("http://www.example.com/based/rel.html", "R"),
      ("http://www.example.com/root", "O")))
    assert(lk("<base href=\"https://other.example/deep/\">" +
      "<a href=p.html>P</a><a href=/q>Q</a>", base) == Seq(
      ("https://other.example/deep/p.html", "P"),
      ("https://other.example/q", "Q")))
    assert(lk("<base href=\"sub/\"><a href=p.html>S</a>", base) ==
      Seq(("http://www.example.com/a/b/sub/p.html", "S")))
    // a QUOTED base value may contain spaces — must not truncate at the
    // space (that would silently re-root every relative link); the
    // single-quoted form goes through the same chain
    assert(lk("<base href=\"/my dir/\"><a href=p.html>W</a>", base) ==
      Seq(("http://www.example.com/my dir/p.html", "W")))
    assert(lk("<base href='/sq dir/'><a href=p.html>V</a>", base) ==
      Seq(("http://www.example.com/sq dir/p.html", "V")))

    // dot segments: ./ drops, seg/../ collapses (chained), leading ../
    // clamps at root, query strings pass untouched
    assert(lk("<a href=\"../up.html\">U</a>", base) ==
      Seq(("http://www.example.com/a/up.html", "U")))
    assert(lk("<a href=\"./same.html\">S</a>", base) ==
      Seq(("http://www.example.com/a/b/same.html", "S")))
    assert(lk("<a href=\"../../../../too-far.html\">T</a>", base) ==
      Seq(("http://www.example.com/too-far.html", "T")))
    assert(lk("<a href=\"./x/../y/./z/../w.html?q=/../keep\">M</a>", base) ==
      Seq(("http://www.example.com/a/b/y/w.html?q=/../keep", "M")))
    // dotfile segments are NOT dot segments
    assert(lk("<a href=\"/.well-known/x\">W</a>", base) ==
      Seq(("http://www.example.com/.well-known/x", "W")))
  }

  test("extractMain: the old chrome-only menu page extracts to empty text") {
    // htmlFixtureRecords' menu page has only sub-40-char blocks (heading
    // + a short line) — under main-content extraction its text is empty,
    // so chrome-sized pages contribute ZERO tokens downstream
    val file = java.nio.file.Files.createTempDirectory("html_spec_main")
      .resolve("fixture_html.warc.gz").toString
    Warc.writeFixture(file, Warc.htmlFixtureRecords)
    val main = Html.extractMain(Warc.scan(spark, file)).orderBy("url").collect()
    val menu = main.find(_.getAs[String]("url").endsWith("/menu")).get
    assert(menu.getAs[String]("text") == "")
    assert(menu.getAs[Int]("n_tokens") == 0)
    // title extraction is unaffected by the chrome strip
    assert(menu.getAs[String]("title") == "Alpha & Beta")
  }
}
