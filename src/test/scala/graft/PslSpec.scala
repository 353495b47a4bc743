package graft

import org.apache.spark.sql.functions._
import graft.ops.Psl

/** Closed-form pins for the publicsuffix.org precedence arms
  * ([[graft.ops.Psl]]) and the revisit / split / sitemap contract
  * properties the DuckDB oracles check only by replay. */
class PslSpec extends SparkSpec {
  import spark.implicits._

  test("registeredDomain: every PSL precedence arm") {
    val out = Psl.registeredDomain(Psl.fixtureHosts.toDF("host"))
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), Option(r.getString(2))))
      .toMap
    // wildcard rule: one label under *.wild.test is part of the suffix
    assert(out("a.b.wild.test") == ("b.wild.test", Some("a.b.wild.test")))
    // a host that IS a wildcard-matched suffix has no registered domain
    assert(out("b.wild.test") == ("b.wild.test", None))
    // exception beats the wildcard: suffix drops the exception's 1st label
    assert(out("free.wild.test") == ("wild.test", Some("free.wild.test")))
    assert(out("sub.free.wild.test") == ("wild.test", Some("free.wild.test")))
    // multi-label (ccSLD-style) listed suffix
    assert(out("x.city.test") == ("city.test", Some("x.city.test")))
    assert(out("city.test") == ("city.test", None))
    // no rule matches -> implicit default '*': top label is the suffix
    assert(out("unknown.zz") == ("zz", Some("unknown.zz")))
    assert(out("zz") == ("zz", None))
  }

  test("registeredDomain: longest listed suffix beats shorter ('org' vs 'example.org')") {
    val out = Psl.registeredDomain(Seq("www.a.example.org", "a.example.org", "mirror.org").toDF("host"))
      .collect().map(r => r.getString(0) -> Option(r.getString(2))).toMap
    assert(out("www.a.example.org").contains("a.example.org"))
    assert(out("a.example.org").contains("a.example.org"))
    assert(out("mirror.org").contains("mirror.org")) // only 'org' matches
  }

  test("cdx_revisit_generate: one original per digest, revisits refer to the time-first capture") {
    val rows = SparkEntry.queries("cdx_revisit_generate")(spark, sfDir)
    val perDigest = rows.groupBy("digest").agg(
      sum(when(col("out_type") === "response", 1).otherwise(0)).as("n_orig"),
      count(lit(1)).as("n"),
      min(struct(col("ts"), col("out_type"))).as("first"))
    // exactly one stored original per digest, and it is the earliest row
    assert(perDigest.where(col("n_orig") =!= 1).count() == 0)
    assert(perDigest.where(col("first.out_type") =!= "response").count() == 0)
    // every revisit's refers_to_ts equals its digest's original ts
    val orig = rows.where(col("out_type") === "response")
      .select(col("digest"), col("ts").as("o_ts"))
    val bad = rows.where(col("out_type") === "revisit")
      .join(orig, "digest")
      .where(col("refers_to_ts") =!= col("o_ts") || col("refers_to_url").isNull)
    assert(bad.count() == 0)
  }

  test("scan_sitemap: expansion boundaries — missing child silent, orphan unread, fields nullable") {
    val rows = SparkEntry.queries("scan_sitemap")(spark, sfDir).collect()
    assert(rows.length == 5)
    val bySm = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(bySm == Map("sitemap_a.xml" -> 3, "sitemap_b.xml" -> 2)) // no missing/orphan rows
    val full = rows.find(_.getString(1).endsWith("/order/1")).get
    assert(full.getString(2) == "2024-02-01" && full.getString(3) == "daily" && full.getDouble(4) == 0.8)
    val bare = rows.find(_.getString(1) == "http://www.high.example.org/").get
    assert(bare.isNullAt(2) && bare.isNullAt(3) && bare.isNullAt(4))
  }

  // sf0.01 (500 docs / ~100 clusters), NOT the suite default sf0.001:
  // the 90/5/5 fraction assertion needs enough clusters for statistical
  // power (at 50 docs a single 10-doc cluster swings train by 20 points)
  private val splitSfDir = "/root/testdata/sf0.01"

  test("corpus_split_leakage_safe: no cluster straddles splits; fractions are sane") {
    val s = SparkEntry.queries("corpus_split_leakage_safe")(spark, splitSfDir)
    s.cache()
    val straddling = s.select("cluster_id", "split").distinct()
      .groupBy("cluster_id").count().where(col("count") > 1).count()
    assert(straddling == 0, "a near-dup cluster was split across train/eval")
    val n = s.count().toDouble
    val train = s.where(col("split") === "train").count() / n
    assert(train > 0.75 && train < 1.0, s"train fraction $train implausible for 90%")
    s.unpersist()
  }

  test("Blocklist.blockedHostSet blocks through the full PSL precedence") {
    import spark.implicits._
    // free.wild.test is an EXCEPTION rule (beats *.wild.test), so its
    // registered domain is itself and subdomains inherit it; a.b.wild.test
    // sits under the wildcard suffix (reg = a.b.wild.test ≠ listed);
    // city.test IS a public suffix (reg null) — blocked only via the
    // host-equals fallback when listed directly
    val hosts = Seq("free.wild.test", "sub.free.wild.test", "deep.sub.free.wild.test",
      "a.b.wild.test", "unknown.zz", "www.low.example.org", "low.example.org",
      "city.test").toDF("host")
    val blocked = graft.ops.Blocklist
      .blockedHostSet(hosts, Seq("low.example.org", "free.wild.test", "city.test"))
      .collect().map(_.getString(0)).toSet
    assert(blocked == Set("free.wild.test", "sub.free.wild.test",
      "deep.sub.free.wild.test", "www.low.example.org", "low.example.org", "city.test"))
    // and the gate arms: term matching is on the LOWERCASED url
    val caps = Seq(("www.low.example.org", "http://www.low.example.org/x"),
      ("ok.example.org", "http://ok.example.org/ORDER/13"),
      ("ok.example.org", "http://ok.example.org/fine")).toDF("host", "url")
    val gated = graft.ops.Blocklist.gate(caps).orderBy("url")
      .select("blocked_domain", "blocked_term", "keep")
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)))
    assert(gated.toSeq == Seq(
      (false, true, false),   // /ORDER/13 -> lowercased term hit
      (false, false, true),   // clean
      (true, false, false)))  // domain hit
    // the mega-domain escape hatch (broadcastHint = false, DEPLOY §4)
    // must compute the identical gate through a shuffled join
    val hinted = graft.ops.Blocklist.gate(caps).orderBy("url").collect().map(_.toSeq)
    val shuffled = graft.ops.Blocklist.gateWith(caps,
      graft.ops.Blocklist.blockedHostSet(caps.select("host").distinct()),
      graft.ops.Blocklist.fixtureUrlTerms, broadcastHint = false)
      .orderBy("url").collect().map(_.toSeq)
    assert(hinted.toSeq == shuffled.toSeq)
  }
}
