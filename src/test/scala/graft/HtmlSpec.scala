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
    // two captures of the same page at different times + one distinct page
    val dir = java.nio.file.Files.createTempDirectory("corpus_spec")
    val file = dir.resolve("dup.warc.gz").toString
    def b32(s: String) = s.padTo(32, '2').take(32).toUpperCase
    val page = "<html><title>Same</title><body>same body</body></html>"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Warc.writeFixture(file, Seq(
      Warc.FixtureRecord("response", "http://a.example.com/", "2016-02-01T00:00:00Z",
        b32("p1"), 200, "text/html", page),
      Warc.FixtureRecord("response", "http://b.example.com/", "2016-01-01T00:00:00Z",
        b32("p2"), 200, "text/html", page),
      Warc.FixtureRecord("response", "http://c.example.com/", "2016-03-01T00:00:00Z",
        b32("p3"), 200, "text/html",
        "<html><title>Other</title><body>different body</body></html>"
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
}
