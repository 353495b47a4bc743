package graft

/** The session factory registers the native functions via extensions and
  * pins the engine confs. (Uses the shared test session's JVM — building a
  * second session in the same context shares the SparkContext.) */
class GraftSessionSpec extends SparkSpec {

  test("builder carries the engine confs and extension registration") {
    // inspect the builder's config through a session it produces
    val s2 = GraftSession.builder("graft-spec")
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      assert(s2.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(s2.conf.get("spark.sql.session.timeZone") == "UTC")
    } finally {
      // don't stop: shares the JVM-wide context with the other specs
    }
  }

  test("native functions usable from SQL after register") {
    graft.functions.GraftFunctions.register(spark)
    val k = spark.sql("SELECT surt_key_native('http://www.Example.com/A?b=1&a=2') AS k")
      .collect().head.getString(0)
    assert(k == "com,example)/a?a=2&b=1")
  }
}
