package graft

import org.apache.spark.sql.functions._
import graft.ops.Robots

/** RFC 9309 semantics pins for [[graft.ops.Robots]] beyond the DuckDB
  * grammar-replay oracle: each precedence rule gets a closed-form check
  * against the committed fixture so a refactor that keeps the oracle
  * shape but breaks one precedence arm fails by name here. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def texts = Robots.fixture.toDF("host", "txt")

  private def verdicts(urls: Seq[(Long, String, String)], agent: String = "graftbot") =
    Robots.check(urls.toDF("id", "host", "upath"), texts, agent)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), Option(r.getString(3)))).toMap

  test("parse: grammar — comments, case folding, stacked agents, empty/pre-group rules") {
    val rows = Robots.parse(texts)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3), r.getString(4)))
      .toSet
    // stacked User-agent lines fan each rule out to BOTH agents
    assert(rows.count(_._1 == "www.high.example.org") == 6)
    assert(rows.contains(("www.high.example.org", 3, "otherbot", "disallow", "/order/2")))
    // empty `Disallow:` (high ln 6) is dropped
    assert(!rows.exists(r => r._1 == "www.high.example.org" && r._2 == 6))
    // UPPER/lower directive names fold; the trailing comment line is gone
    assert(rows.contains(("www.medium.example.org", 2, "*", "disallow", "/order/4")))
    assert(rows.contains(("www.medium.example.org", 3, "*", "allow", "/order/44")))
    // low's ln 2 Disallow precedes any group -> ignored (ln 1 is the
    // pre-group Crawl-delay, invisible to the strict rule surface)
    assert(rows.filter(_._1 == "www.low.example.org").map(_._2) == Set(4))
  }

  test("check: specific group beats *, longest prefix wins within it; agent match is case-insensitive") {
    // RFC 9309 §2.2.1: 'GraftBot' must select the 'graftbot' group
    val vCase = verdicts(Seq((9L, "www.urgent.example.org", "/order/9?x=1")), agent = "GraftBot")
    assert(vCase(9L) == (true, None))
    val v = verdicts(Seq(
      (1L, "www.urgent.example.org", "/order/9?x=1"),   // graftbot group: no match -> allow (not *'s Disallow: /)
      (2L, "www.urgent.example.org", "/order/19?a=b"),  // Disallow /order/1
      (3L, "www.urgent.example.org", "/order/129?z=")   // Allow /order/12 (longer) inside Disallow /order/1
    ))
    assert(v(1L) == (true, None))
    assert(v(2L) == (false, Some("/order/1")))
    assert(v(3L) == (true, Some("/order/12")))
  }

  test("check: * group applies when the agent has no group of its own") {
    val v = verdicts(Seq((1L, "www.urgent.example.org", "/anything?q=1")), agent = "strangerbot")
    assert(v(1L) == (false, Some("/")))
  }

  test("check: equal-length allow/disallow tie resolves to allow; empty Disallow is no rule") {
    val v = verdicts(Seq(
      (1L, "www.high.example.org", "/order/2?k=v"), // Disallow /order/2 vs Allow /order/2 -> allow
      (2L, "www.high.example.org", "/order/3?k=v"), // Disallow /order/3
      (3L, "www.high.example.org", "/other?k=v")    // empty `Disallow:` must NOT mean "disallow everything"
    ))
    assert(v(1L) == (true, Some("/order/2")))
    assert(v(2L) == (false, Some("/order/3")))
    assert(v(3L) == (true, None))
  }

  test("check: pre-group rules ignored; missing robots.txt defaults to allow") {
    val v = verdicts(Seq(
      (1L, "www.low.example.org", "/order/5?x=y"),         // ln-1 pre-group Disallow must not apply
      (2L, "www.low.example.org", "/order/6?x=y"),         // in-group Disallow does
      (3L, "www.notspecified.example.org", "/order/6?x=y") // host absent from the robots corpus
    ))
    assert(v(1L) == (true, None))
    assert(v(2L) == (false, Some("/order/6")))
    assert(v(3L) == (true, None))
  }

  test("crawlDelays: group choice, first-wins, junk/pre-group ignored, stack-break") {
    import spark.implicits._
    val texts = Seq(
      // specific group grants 2; the * group's 10 must lose
      "s.test" -> "User-agent: graftbot\nCrawl-delay: 2\nUser-agent: *\nCrawl-delay: 10",
      // first numeric delay of the chosen group wins
      "f.test" -> "User-agent: *\nCrawl-delay: 3\nCrawl-delay: 7",
      // non-numeric ignored -> default
      "j.test" -> "User-agent: *\nCrawl-delay: soon",
      // a delay before any group is ignored -> default
      "p.test" -> "Crawl-delay: 9\nUser-agent: *\nDisallow: /x",
      // RFC 9309 stacking: the delay BETWEEN agent lines ends the first
      // stack, so it belongs to graftbot's group alone — otherbot's
      // separate group grants nothing and graftbot still reads 4
      "b.test" -> "User-agent: graftbot\nCrawl-delay: 4\nUser-agent: otherbot\nCrawl-delay: 8",
      // no delay anywhere -> default
      "n.test" -> "User-agent: *\nDisallow: /y"
    ).toDF("host", "txt")
    val got = graft.ops.Robots.crawlDelays(texts, agent = "graftbot", defaultSec = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("s.test" -> 2L, "f.test" -> 3L, "j.test" -> 1L,
      "p.test" -> 1L, "b.test" -> 4L, "n.test" -> 1L), s"got $got")
  }
}
