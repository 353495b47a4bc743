package graft

import java.nio.file.{Files, Paths}

import graft.formats.{Warc, ZipNum}

/** End-to-end: WARC fixture -> CDXJ -> ZipNum cluster -> indexed lookup.
  * This is the reference's whole workflow in one plan (SURVEY §3.3). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val warcFile = "/tmp/graft_test/pipeline.warc.gz"
  private val outDir = "/tmp/graft_test/pipeline_zipnum"

  private def run(): Unit = {
    Files.createDirectories(Paths.get(warcFile).getParent)
    Warc.writeFixture(warcFile, Warc.fixtureRecords)
    Pipeline.warcToZipNum(spark, warcFile, outDir, shards = 2, linesPerBlock = 2)
  }

  test("pipeline keeps exactly the response/revisit records, globally sorted") {
    run()
    val lines = ZipNum.readLines(spark, outDir).as[String].collect().toSeq
    val expectedCount = Warc.fixtureRecords.count(r =>
      (r.recordType == "response" || r.recordType == "revisit") && r.url != null)
    assert(lines.size == expectedCount)
    assert(lines == lines.sorted, "cluster must be globally sorted")
    // SURT keys: fixture URLs canonicalize as expected
    val keys = lines.map(_.split(" ", 2).head)
    assert(keys.contains("com,example)/path?a=1&b=2"), keys.mkString(", "))
    assert(keys.contains("org,iana,sub)/x"))
  }

  test("observed metrics report the mrjob-counter analogs in one pass") {
    Files.createDirectories(Paths.get(warcFile).getParent)
    Warc.writeFixture(warcFile, Warc.fixtureRecords)
    val (df, obs) = Pipeline.cdxLinesObserved(spark, warcFile)
    val n = df.count() // one action materializes data AND counters
    val metrics = obs.get
    assert(metrics("n_lines") == n)
    assert(metrics("total_line_bytes").asInstanceOf[Long] > 0)
    val exactKeys = df.selectExpr("element_at(split(line, ' ', 3), 1)")
      .distinct().count()
    val approx = metrics("approx_urlkeys").asInstanceOf[Long]
    assert(math.abs(approx - exactKeys) <= math.max(1, exactKeys / 10))
  }

  test("prefix lookup through cluster.idx answers the index's core query") {
    run()
    val hits = ZipNum.readLines(spark, outDir, prefix = Some("com,example)/path"))
      .as[String].collect().toSeq
    // 1 response + 1 revisit for that URL in the fixture
    assert(hits.size == 2, hits.mkString("\n"))
    assert(hits.forall(_.startsWith("com,example)/path?a=1&b=2")))
    // timestamps come back in capture order (ts is the secondary sort key)
    val tss = hits.map(_.split(" ", 3)(1))
    assert(tss == tss.sorted)
  }

  test("CDXJ payload carries digest/offset/length for replay") {
    run()
    val line = ZipNum.readLines(spark, outDir, prefix = Some("com,example)/path"))
      .as[String].collect().head
    val json = line.split(" ", 3)(2)
    assert(json.contains("\"digest\""))
    assert(json.contains("\"offset\""))
    assert(json.contains("\"filename\":\"pipeline.warc.gz\""))
  }

  test("curateCorpus: planted near-dups collapse to one keeper, singletons survive") {
    import org.apache.spark.sql.functions._
    val docs = Tables.t(spark, sfDir, "documents")
    val plants = docs.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 400000L)
      .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
    val corpus = docs.unionByName(plants)
    val kept = Pipeline.curateCorpus(corpus, exactThreshold = true).cache()
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    // one keeper per cluster, and the quality gate dropped some docs but
    // nowhere near all of them
    assert(kept.count() == kept.select("cluster_id").distinct().count())
    assert(kept.count() > corpus.count() / 2)
    assert(kept.count() < corpus.count())
    // near-dup collapse: of the planted (orig, copy) pairs where BOTH
    // passed the quality gate, at most a small LSH-miss fraction survive
    // as two separate keepers
    val plantIds = plants.select("doc_id").as[Long].collect().toSeq
    val bothKept = plantIds.count(p => keptIds.contains(p) && keptIds.contains(p - 400000L))
    assert(plantIds.nonEmpty)
    assert(bothKept <= math.max(1, plantIds.size / 5),
      s"$bothKept of ${plantIds.size} planted pairs escaped collapse")
    // clusters of size >= 2 exist (the collapses), and every keeper's
    // cluster_size is consistent with one-keeper-per-cluster
    assert(kept.filter(col("cluster_size") >= 2).count() > 0)
    kept.unpersist()
  }

  test("pipeline_warc_corpus: every stage bites exactly once; packing is consistent (golden)") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("pipeline_warc_corpus")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // surviving capture set: /menu earliest capture + /long.
    //  - the 2016-02-01 duplicate /menu capture fell to earliest-dedup
    //  - /latin ("résumé") and /bare ("no title here") extract to EMPTY
    //    main content (sub-40-char blocks) and fall to the token gate,
    //    as does /tiny (1 word)
    //  - /gone (404) and /raw (text/plain) fell to the extract filter
    val urls = rows.map(r => (r._1, r._2)).toSet
    assert(urls == Set(
      ("http://www.example.com/menu", "20160102100000"),
      ("http://www.example.com/long", "20160108160000")), s"got $urls")
    // golden token counts from the pinned MAIN-CONTENT texts — the menu
    // page's nav bar ("Home Menu Contact"), heading, and footer
    // contribute ZERO of these (the boilerplate-removal demonstration):
    // "Tea and biscuits are served with a pot of cream for the price of
    // a song in the morning." -> 19; "The quick brown fox jumps over the
    // lazy dog and runs to the river every morning for a drink of water"
    // -> 21 (the <title> subtree "Guide" no longer leaks into body text)
    val byUrl = rows.map(r => r._1 -> r).toMap
    assert(byUrl("http://www.example.com/menu")._3 == 19L)
    assert(byUrl("http://www.example.com/long")._3 == 21L)
    // packing invariants: cum_before is the prefix sum of n_tok in doc_id
    // (hash) order, and seq_id = cum_before DIV 8
    assert(rows.forall(r => r._5 == r._4 / 8))
    val cums = rows.map(r => (r._4, r._3)).sortBy(_._1)
    assert(cums.head._1 == 0L)
    assert(cums(1)._1 == cums.head._2, "second doc's offset must equal the first doc's tokens")
    // determinism: a second run returns the identical frame
    val again = SparkEntry.queries("pipeline_warc_corpus")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == again.toSeq)
  }
}
