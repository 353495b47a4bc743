package graft

import graft.formats.ZipNum
import org.apache.spark.sql.functions._

/** pywb parameter-MATRIX sweep over [[CdxServer]]: every individual
  * parameter is green in CdxServerSpec, but pywb clients combine them —
  * matchType × filter × fl × collapse × closest × resumeKey paging — and
  * an interaction bug (a filter probing a column the projection already
  * dropped, a page boundary inside a duplicate-ts run, a collapse
  * tie-break flipping under a filter) never shows up in single-parameter
  * tests. Every combination here is checked against a BRUTE-FORCE
  * in-memory evaluator over the raw capture list, so the ZipNum path,
  * the idx pruning, and the composition order all have an independent
  * answer to agree with. */
class CdxMatrixSpec extends SparkSpec {
  import spark.implicits._

  private case class Cap(urlkey: String, ts: String, fields: Map[String, String]) {
    def json: String =
      fields.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
  }

  /** ~153 captures over 4 hosts (one a subdomain) × 6 paths × query
    * variants; rotating status/mime/digest; warc/revisit rows on i%11;
    * duplicate (urlkey, ts) TWINS on i%16 (distinct json — the runs that
    * break naive pagination and collapse tie-breaks). */
  private lazy val caps: Seq[Cap] = {
    val hosts = Seq("com,alpha", "com,alpha,sub", "com,beta", "org,gamma")
    (0 until 144).flatMap { i =>
      val host = hosts(i % 4)
      val q = if (i % 7 == 0) s"?q=${i % 3}" else ""
      val urlkey = s"$host)/p${i % 6}$q"
      val ts = f"201${i % 3}%d0${1 + i % 8}%d${10 + i % 19}%d${i % 24}%02d${i % 60}%02d00"
      val mime =
        if (i % 11 == 0) "warc/revisit"
        else Seq("text/html", "application/json", "image/png")(i % 3)
      val base = Map(
        "url" -> s"http://${host.split(",").reverse.mkString(".")}/p${i % 6}$q",
        "mime" -> mime,
        "status" -> Seq("200", "404", "301")(i % 3).toString,
        "digest" -> s"d${i % 10}",
        "filename" -> "f.warc.gz", "offset" -> s"${i * 100}", "length" -> "90")
      val c = Cap(urlkey, ts, base)
      if (i % 16 == 0) Seq(c, Cap(urlkey, ts, base.updated("digest", s"tw$i")))
      else Seq(c)
    }
  }

  private val dir = "/tmp/graft_test/matrix_zipnum"
  private lazy val server: CdxServer = {
    ZipNum.write(caps.map(c => s"${c.urlkey} ${c.ts} ${c.json}").toDF("line"),
      dir, shards = 3, linesPerBlock = 4)
    new CdxServer(spark, dir)
  }

  // ------------------------------------------------- brute-force evaluator

  private def bruteMatch(kind: String, arg: String): Seq[Cap] = kind match {
    case "exact" => caps.filter(_.urlkey == arg)
    case "prefix" => caps.filter(_.urlkey.startsWith(arg))
    case "host" => caps.filter(_.urlkey.startsWith(arg + ")"))
    case "domain" => caps.filter(c =>
      c.urlkey.startsWith(arg + ")") || c.urlkey.startsWith(arg + ","))
  }

  /** pywb filter= semantics: re.match (start-anchored), absent field
    * never matches, `!` negates, colon-less spec matches the whole line */
  private def bruteFilter(rows: Seq[Cap], spec: String): Seq[Cap] = {
    val negate = spec.startsWith("!")
    val body = if (negate) spec.substring(1) else spec
    def matches(c: Cap): Boolean = body.split(":", 2) match {
      case Array(f, p) =>
        val v = f match {
          case "urlkey" => Some(c.urlkey)
          case "ts" | "timestamp" => Some(c.ts)
          case other => c.fields.get(other)
        }
        v.exists(s =>
          java.util.regex.Pattern.compile("^(?:" + p + ")").matcher(s).find())
      case _ =>
        java.util.regex.Pattern.compile("^(?:" + body + ")")
          .matcher(s"${c.urlkey} ${c.ts} ${c.json}").find()
    }
    rows.filter(c => if (negate) !matches(c) else matches(c))
  }

  private def bruteFields(c: Cap, fl: String): Seq[Option[String]] =
    fl.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map {
      case "urlkey" => Some(c.urlkey)
      case "timestamp" | "ts" => Some(c.ts)
      case other => c.fields.get(other)
    }

  private def collectRows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Option[String]]] =
    df.collect().toSeq.map(r =>
      r.toSeq.map(v => Option(v).map(String.valueOf(_))))

  private def canon(rows: Seq[Seq[Option[String]]]): Seq[Seq[Option[String]]] =
    rows.sortBy(_.toString)

  test("matrix: matchType × filter × fl agree with brute force (72 combos)") {
    val matches = Seq(
      ("exact", "com,alpha)/p0?q=0", server.exactUrl("com,alpha)/p0?q=0")),
      ("prefix", "com,alpha)/", server.prefix("com,alpha)/")),
      ("host", "com,alpha", server.host("com,alpha")),
      ("domain", "com,alpha", server.domain("com,alpha")))
    val filters = Seq(
      None, Some("status:200"), Some("!status:200"), Some("mime:text/.*"),
      Some("!mime:warc/revisit"), Some("com,alpha\\)/p2"))
    val fls = Seq(None, Some("urlkey,timestamp,status"), Some("urlkey,redirect"))
    var combos = 0
    for ((kind, arg, base) <- matches; f <- filters; fl <- fls) {
      combos += 1
      val engineDf0 = f.map(server.withFilter(base, _)).getOrElse(base)
      val engineDf = fl.map(server.withFields(engineDf0, _)).getOrElse(engineDf0)
      val engine = canon(collectRows(engineDf))
      val brute0 = f.foldLeft(bruteMatch(kind, arg))((r, s) => bruteFilter(r, s))
      val brute = canon(brute0.map { c =>
        fl match {
          case Some(l) => bruteFields(c, l)
          case None => Seq(Some(c.urlkey), Some(c.ts), Some(c.json))
        }
      })
      assert(engine == brute,
        s"mismatch for matchType=$kind filter=$f fl=$fl: " +
          s"engine ${engine.size} rows vs brute ${brute.size}\n" +
          s"engine head: ${engine.take(3)}\nbrute head:  ${brute.take(3)}")
    }
    info(s"$combos combinations checked")
  }

  test("matrix: resumeKey paging walks the twin runs losslessly at every page size") {
    // full listing in the engine's (urlkey, ts, json asc) page order
    val full = bruteMatch("prefix", "com,alpha)")
      .map(c => (c.urlkey, c.ts, c.json)).sorted
    for (pageSize <- Seq(2, 3, 7)) {
      var cursor = ("", "", Option.empty[String])
      val walked = Seq.newBuilder[(String, String, String)]
      var done = false
      while (!done) {
        val page = server
          .pageByKey("com,alpha)", cursor._1, cursor._2, pageSize, cursor._3)
          .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getString(2)))
        walked ++= page
        if (page.size < pageSize) done = true
        else cursor = (page.last._1, page.last._2, Some(page.last._3))
      }
      assert(walked.result() == full,
        s"pageSize=$pageSize walk must equal the full listing exactly " +
          "(twin (urlkey, ts) runs included — the 3-field cursor is lossless)")
    }
  }

  test("matrix: collapse × filter × fl composes against brute force") {
    // engine: collapse to month granularity, then filter, then project
    val engine = canon(collectRows(
      server.withFields(
        server.withFilter(server.collapse("com,beta)", 6), "status:(200|301)"),
        "urlkey,timestamp,digest")))
    // brute: min (ts, json) per (urlkey, month), then the same filter/fl
    val collapsed = bruteMatch("prefix", "com,beta)")
      .groupBy(c => (c.urlkey, c.ts.take(6)))
      .map(_._2.minBy(c => (c.ts, c.json))).toSeq
    val brute = canon(bruteFilter(collapsed, "status:(200|301)")
      .map(bruteFields(_, "urlkey,timestamp,digest")))
    assert(engine == brute, s"engine ${engine.size} vs brute ${brute.size}")
  }

  test("matrix: fuzzyMatchRules × filter × fl composes against brute force") {
    // rules: strip the q= cache param on com,alpha (longest prefix);
    // drop-everything catch-all below it — the longest-prefix precedence
    // must hold INSIDE a composed filter/fl chain too. The table is
    // LOADED from the rules.yaml form (the pywb file format), so the
    // whole matrix arm drives the loader's output, not a hand-built Seq.
    val rules = CdxServer.parseRulesYaml(
      """rules:
        |  - url_prefix: 'com,alpha)'
        |    fuzzy_lookup: '\?q=\d+'
        |  - url_prefix: ''
        |    fuzzy_lookup: '\?.*'
        |""".stripMargin)
    assert(rules == Seq(
      CdxServer.FuzzyRule("com,alpha)", "\\?q=\\d+", ""),
      CdxServer.FuzzyRule("", "\\?.*", "")), rules.toString)
    def canonOf(k: String): String = {
      val r = rules.filter(r2 => k.startsWith(r2.prefix)).maxBy(_.prefix.length)
      k.replaceAll(r.pattern, r.replace)
    }
    for (miss <- Seq("com,alpha)/p0?q=9", "com,alpha,sub)/p3?q=9");
         filter <- Seq("status:200", "!mime:warc");
         fl <- Seq("urlkey,timestamp,mime", "urlkey,digest")) {
      val engine = collectRows(server.withFields(
        server.withFilter(server.fuzzyMatchRules(miss, rules), filter), fl))
      // brute: the planted q=9 never exists, so the result is every
      // capture whose LONGEST-PREFIX-rule canonical form equals the
      // query's, through the same filter and projection
      val cand = caps.filter(c => canonOf(c.urlkey) == canonOf(miss))
      assert(cand.nonEmpty, s"fixture must offer fuzzy targets for $miss")
      val brute = canon(bruteFilter(cand, filter).map(bruteFields(_, fl)))
      assert(canon(engine) == brute,
        s"fuzzy($miss)×$filter×$fl: engine ${engine.size} vs brute ${brute.size}")
    }
    // and an exact HIT under the same rules suppresses the fuzzy leg
    val hitKey = caps.find(_.urlkey.contains("?q=")).get.urlkey
    val hit = collectRows(server.fuzzyMatchRules(hitKey, rules))
    val bruteHit = caps.filter(_.urlkey == hitKey)
    assert(hit.size == bruteHit.size,
      s"exact hit must suppress the fuzzy leg: ${hit.size} vs ${bruteHit.size}")
  }

  test("matrix: closest × filter keeps the k-nearest order before filtering") {
    val key = caps.groupBy(_.urlkey).collect {
      case (k, cs) if cs.size >= 4 && cs.map(_.ts).distinct.size == cs.size => k
    }.toSeq.sorted.head // a twin-free key: (dist, ts) is a total order
    val target = "20110615000000"
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
      .withZone(java.time.ZoneOffset.UTC)
    def epoch(ts: String) = java.time.Instant.from(fmt.parse(ts)).getEpochSecond
    val k = 5
    val engine = collectRows(
      server.withFilter(server.closest(key, target, k), "status:200"))
    val brute = bruteMatch("exact", key)
      .sortBy(c => (math.abs(epoch(c.ts) - epoch(target)), c.ts))
      .take(k)
    val bruteFiltered = bruteFilter(brute, "status:200")
      .map(c => Seq(Some(c.urlkey), Some(c.ts), Some(c.json)))
    assert(canon(engine) == canon(bruteFiltered),
      s"closest($key)×filter: engine ${engine.size} vs brute ${bruteFiltered.size}")
  }
}
