package graft

/** Driver smoke contract: SparkEntry.entry returns rows, and every
  * declared oracle key has a query (and vice versa for SQL-expressible
  * ones). */
class EntrySpec extends SparkSpec {

  test("entry (flagship) returns rows on sf0.001") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    // latest 200-status capture per urlkey: keys unique
    val keys = rows.map(_.getString(0))
    assert(keys.distinct.length == keys.length)
  }

  test("every oracle key has a query; no dangling oracles") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val dangling = o.diff(q)
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("all queries are distinct objects and total count matches COVERAGE.md") {
    assert(SparkEntry.queries.size == 245, s"got ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size == 205, s"got ${SparkEntry.oracleSql.size}")
  }
}
