package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Byte-level tokenizer kernel shared by the fused sketch expressions
  * ([[SimHashAlg.simhash64Text]], [[MinHashAlg.signatureText]]).
  *
  * Token contract (bit-parity with the relational tokenizer
  * `graft.ops.Dedup.tokens` = `filter(split(lower(text), '[^a-z0-9]+'),
  * t -> t != '')`): lowercase with the SAME UTF8String.toLowerCase the
  * `lower()` builtin calls (so Unicode cases like U+212A KELVIN SIGN → k
  * agree), then take maximal runs of ASCII [a-z0-9]. UTF-8 multibyte
  * sequences never contain ASCII bytes, so a byte scan is exact.
  */
object TokenAlg {

  /** s -> (lowercased bytes, flattened [start,end) run offsets) */
  def lowerAndRuns(s: UTF8String): (Array[Byte], Array[Int], Int) = {
    val bytes = s.toLowerCase.getBytes
    val len = bytes.length
    // worst case alternates token/sep: <= (len+1)/2 runs -> len+2 ints
    val runs = new Array[Int](len + 2)
    var cnt = 0
    var i = 0
    while (i < len) {
      val c = bytes(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        i += 1
        while (i < len && {
          val d = bytes(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        runs(cnt) = start; runs(cnt + 1) = i; cnt += 2
      } else i += 1
    }
    (bytes, runs, cnt / 2)
  }
}
