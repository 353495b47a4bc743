package graft

/** Pins the bench outlier guard (the rerun-keep-minimum trigger) — the
  * protocol that keeps a host-contention spike from masquerading as a
  * regression AND keeps a genuinely slow new query from shipping
  * silently (round 7's 1914 s dedup_winnow_pairs had no reference row,
  * so the multiplier rule alone could never flag it). Round 10 split the
  * band: UNTOUCHED queries trigger at 2× (a slowdown there cannot be a
  * code change — round 9's graph_pagerank sat at 2.22× and sailed under
  * the uniform 3×), TOUCHED queries keep 3×.
  */
class BenchSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val refs = Map("fast_q" -> 0.2, "slow_q" -> 4.0)
  private val none = Set.empty[String]

  test("untouched query: >2x its idle reference (and >1s) triggers") {
    // 2x of 0.2s is under the 1s absolute floor — small lines never flag
    assert(!Bench.suspicious(refs, none, "fast_q", 0.9))
    assert(Bench.suspicious(refs, none, "fast_q", 1.1))
    assert(!Bench.suspicious(refs, none, "slow_q", 7.9)) // 1.98x
    assert(Bench.suspicious(refs, none, "slow_q", 8.1)) // 2.02x
    // the round-9 escape artist: 2.22x on an untouched module now flags
    assert(Bench.suspicious(refs, none, "slow_q", 4.0 * 2.22))
  }

  test("touched query keeps the looser 3x band") {
    val touched = Set("slow_q")
    assert(!Bench.suspicious(refs, touched, "slow_q", 11.9)) // 2.97x
    assert(Bench.suspicious(refs, touched, "slow_q", 12.1)) // 3.02x
    // a touched fast query still respects the 1s absolute floor
    assert(!Bench.suspicious(refs, touched ++ Set("fast_q"), "fast_q", 0.9))
  }

  test("parseRefs reads both JSON spellings (compact and colon-space)") {
    // Bench writes "k":v; the round-15 splice committed the reference as
    // "k": v — the old no-whitespace regex matched nothing and silently
    // disabled the rerun protocol for a whole driver run. Pin both.
    val compact = """{"value":1.5,"queries":{"agg_mode":0.25,"sort_global":1.2}}"""
    val spaced = """{"value": 1.5, "queries": {"agg_mode": 0.25, "sort_global": 1.2}}"""
    val want = Map("agg_mode" -> 0.25, "sort_global" -> 1.2)
    assert((Bench.parseRefs(compact) - "n_queries") == want)
    assert((Bench.parseRefs(spaced) - "n_queries") == want)
    // the headline total must never masquerade as a query reference
    assert(!Bench.parseRefs(spaced).contains("value"))
  }

  test("unreferenced (new) query: the absolute 20s guard triggers") {
    assert(!Bench.suspicious(refs, none, "new_q", 19.0))
    assert(Bench.suspicious(refs, none, "new_q", 20.5))
    // a synthetic 1914s winnow-class line can no longer ship silently
    assert(Bench.suspicious(refs, none, "new_q", 1914.0))
  }

  test("touched-set parsing: unset env means the 2x band everywhere") {
    assert(Bench.touchedFromEnv(None) == Set.empty[String])
    assert(Bench.touchedFromEnv(Some("")) == Set.empty[String])
    assert(Bench.touchedFromEnv(Some("a, b ,,c")) == Set("a", "b", "c"))
  }

  test("heavy-write median-of-3 protocol (round 14): members exist, median is the middle sample") {
    // the designated ±70%-swing write lines must all be REAL query keys —
    // a renamed key would silently drop out of the protocol
    Bench.HeavyWriteMedian3.foreach(k =>
      assert(SparkEntry.queries.contains(k), s"HeavyWriteMedian3 names unknown key '$k'"))
    assert(Bench.HeavyWriteMedian3.size == 5)
    // upper-median semantics: 3 samples -> middle; 2 -> upper; 1 -> itself
    assert(Bench.median(Seq(1.0, 5.0, 90.0)) == 5.0) // the cold outlier loses
    assert(Bench.median(Seq(2.0, 8.0)) == 8.0)
    assert(Bench.median(Seq(3.0)) == 3.0)
  }
}
