package graft

/** Pins the bench outlier guard (the rerun-keep-minimum trigger) — the
  * protocol that keeps a host-contention spike from masquerading as a
  * regression AND keeps a genuinely slow new query from shipping
  * silently (round 7's 1914 s dedup_winnow_pairs had no reference row,
  * so the 3× rule alone could never flag it). */
class BenchSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val refs = Map("fast_q" -> 0.2, "slow_q" -> 4.0)

  test("referenced query: >3x its idle reference (and >1s) triggers") {
    // 3x of 0.2s is under the 1s absolute floor — small lines never flag
    assert(!Bench.suspicious(refs, "fast_q", 0.9))
    assert(Bench.suspicious(refs, "fast_q", 1.1))
    assert(!Bench.suspicious(refs, "slow_q", 11.9)) // 2.97x
    assert(Bench.suspicious(refs, "slow_q", 12.1)) // 3.02x
  }

  test("unreferenced (new) query: the absolute 20s guard triggers") {
    assert(!Bench.suspicious(refs, "new_q", 19.0))
    assert(Bench.suspicious(refs, "new_q", 20.5))
    // a synthetic 1914s winnow-class line can no longer ship silently
    assert(Bench.suspicious(refs, "new_q", 1914.0))
  }
}
