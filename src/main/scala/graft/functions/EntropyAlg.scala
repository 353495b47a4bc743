package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Character-entropy kernel backing [[CharEntropyExpr]] (static entry
  * point so generated code calls it directly, like [[SimHashAlg]]).
  *
  * Shannon entropy (natural log) of the per-character distribution — the
  * classic cheap gibberish/boilerplate detector a corpus quality filter
  * runs per document: random bytes score near ln(256), natural language
  * sits around 2.8–3.2, repeated padding collapses toward 0.
  *
  * The composed form (explode per character → two hash aggs → join) puts
  * |text| rows per document through a shuffle; this kernel is one narrow
  * per-row pass inside whole-stage codegen, so at 100 TB the signal costs
  * a map stage and nothing else. NativeExprSpec pins the two paths equal
  * on the documents corpus.
  */
object EntropyAlg {

  /** entropy over UTF-16 units (== code points == DuckDB's per-character
    * split for the ASCII corpora this engine processes); empty → 0.0 */
  def charEntropy(text: UTF8String): java.lang.Double = {
    if (text == null) return null
    val s = text.toString
    val n = s.length
    if (n == 0) return java.lang.Double.valueOf(0.0)
    // ASCII fast path + map fallback for anything above 0x7F
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Character, Int] = null
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c < 128) ascii(c) += 1
      else {
        if (other == null) other = new java.util.HashMap[Character, Int]()
        other.merge(Character.valueOf(c), 1, (a, b) => a + b)
      }
      i += 1
    }
    var h = 0.0
    val nd = n.toDouble
    var j = 0
    while (j < 128) {
      val c = ascii(j)
      if (c > 0) { val p = c / nd; h -= p * math.log(p) }
      j += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) { val p = it.next() / nd; h -= p * math.log(p) }
    }
    java.lang.Double.valueOf(h)
  }
}
