package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-substring matcher over raw UTF-8 BYTES — the
  * scale-correct form of `any term contained in url` for realistic
  * blocklists (C4's badwords list is ~400 entries): one O(len) automaton
  * pass per row instead of |terms| naive substring scans, and unlike a
  * Java-regex alternation (which backtracks through the alternatives at
  * every position) the cost is INDEPENDENT of term count. Byte-level
  * matching gives exactly `UTF8String.contains` semantics, so the
  * [[MultiContainsExpr]] kernel is bit-parity with the `exists(contains)`
  * HOF it replaces (NativeExprSpec pins it).
  *
  * Memory: full goto table, 256 ints per trie node (~1 KB/node; a
  * 400-term list is a few thousand nodes) — built once per plan via the
  * expression's transient lazy, never per row.
  */
final class AhoCorasick private (
    gotoTab: Array[Array[Int]], hit: Array[Boolean], anyEmpty: Boolean)
  extends Serializable {

  /** allocation-free match straight off the UTF8String's bytes */
  def matches(s: UTF8String): Boolean = {
    if (anyEmpty) return true // contains(x, "") is true — parity with the HOF
    var st = 0
    var i = 0
    val n = s.numBytes()
    while (i < n) {
      st = gotoTab(st)(s.getByte(i) & 0xff)
      if (hit(st)) return true
      i += 1
    }
    false
  }
}

object AhoCorasick {

  /** build from UTF-8 term bytes; empty list matches nothing, an empty
    * TERM matches everything (the `contains` convention) */
  def build(terms: Seq[Array[Byte]]): AhoCorasick = {
    val next = scala.collection.mutable.ArrayBuffer(Array.fill(256)(-1))
    val hit = scala.collection.mutable.ArrayBuffer(false)
    val anyEmpty = terms.exists(_.isEmpty)
    for (t <- terms if t.nonEmpty) {
      var s = 0
      for (b <- t) {
        val c = b & 0xff
        if (next(s)(c) < 0) {
          next += Array.fill(256)(-1)
          hit += false
          next(s)(c) = next.size - 1
        }
        s = next(s)(c)
      }
      hit(s) = true
    }
    // BFS fail links, folded straight into a full goto table (matching
    // never chases fail chains) and hit-propagation through fails (a
    // node is terminal if ANY suffix of its path is a term)
    val fail = Array.fill(next.size)(0)
    val queue = scala.collection.mutable.Queue.empty[Int]
    var c = 0
    while (c < 256) {
      val v = next(0)(c)
      if (v < 0) next(0)(c) = 0 else { fail(v) = 0; queue += v }
      c += 1
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      hit(u) = hit(u) || hit(fail(u))
      var c2 = 0
      while (c2 < 256) {
        val v = next(u)(c2)
        if (v < 0) next(u)(c2) = next(fail(u))(c2)
        else { fail(v) = next(fail(u))(c2); queue += v }
        c2 += 1
      }
    }
    new AhoCorasick(next.toArray, hit.toArray, anyEmpty)
  }

  def buildFromStrings(terms: Seq[String]): AhoCorasick =
    build(terms.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
}
