package graft

/** Classic CDX-11 dialect golden checks beyond the DuckDB oracle round
  * trip: field order (` CDX N b a m s k r M S V g`), `-` placeholders for
  * absent redirect/robotflags, and parse(pack(x)) == x on the typed
  * columns. */
class Cdx11Spec extends SparkSpec {

  test("11 space-separated fields, '-' placeholders, V offsets tile per file") {
    val lines = SparkEntry.queries("cdx11_pack")(spark, sfDir)
      .collect().map(_.getString(1))
    assert(lines.nonEmpty)
    assert(lines.forall(_.split(" ").length == 11), "every line has exactly 11 fields")
    val sample = lines.head.split(" ")
    assert(sample(0).contains(")"), "N = SURT urlkey")
    assert(sample(1).matches("\\d{14}"), "b = 14-digit timestamp")
    assert(sample(2).startsWith("http"), "a = original url")
    assert(sample(4).matches("\\d{3}"), "s = status code")
    // redirect (r) and robotflags (M) use '-' when absent
    assert(lines.exists(_.split(" ")(6) == "-"))
    assert(lines.exists(_.split(" ")(6) != "-"))
    assert(lines.exists(_.split(" ")(7) == "-"))
    // V: per-file offsets start at 0 and strictly increase within a file
    val byFile = lines.map(_.split(" ")).groupBy(_(10))
    byFile.values.foreach { recs =>
      val offs = recs.map(_(9).toLong).sorted
      assert(offs.head == 0L, "first record of each file at offset 0")
      assert(offs.distinct.length == offs.length, "offsets strictly increase")
    }
  }

  test("parse(pack(x)) recovers the typed columns") {
    import org.apache.spark.sql.functions._
    val parsed = SparkEntry.queries("cdx11_parse")(spark, sfDir)
    val orig = Cdx.df(spark, sfDir)
      .select("id", "urlkey", "ts", "url", "status", "digest",
        "redirect", "robotflags", "length", "filename")
    val joined = parsed.alias("p").join(orig.alias("o"), "id")
    val mismatches = joined.filter(
      not(col("p.urlkey") <=> col("o.urlkey")) ||
        not(col("p.ts") <=> col("o.ts")) ||
        not(col("p.url") <=> col("o.url")) ||
        not(col("p.status") <=> col("o.status")) ||
        not(col("p.digest") <=> col("o.digest")) ||
        not(col("p.redirect") <=> col("o.redirect")) ||
        not(col("p.robotflags") <=> col("o.robotflags")) ||
        not(col("p.length") <=> col("o.length")) ||
        not(col("p.filename") <=> col("o.filename")))
    assert(mismatches.count() == 0)
    assert(parsed.count() == orig.count())
  }
}
