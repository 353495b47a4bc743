package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Byte-level tokenizer kernel shared by the fused sketch expressions
  * ([[SimHashAlg.simhash64Text]], [[MinHashAlg.signatureText]]).
  *
  * Token contract (bit-parity with the relational sketch tokenizer
  * `graft.ops.Dedup.sketchTokens` — NativeExprSpec pins it): lowercase
  * with the SAME UTF8String.toLowerCase the `lower()` builtin calls (so
  * Unicode cases like U+212A KELVIN SIGN → k agree), then emit
  *
  *  - maximal runs of ASCII [a-z0-9] (one token per word), and
  *  - each CJK character as its OWN single-char token.
  *
  * The CJK arm is what makes near-dedup work on UNSEGMENTED scripts
  * (Chinese/Japanese/Korean text carries no spaces, so the Latin rule
  * would reduce a whole document to zero tokens and null signatures):
  * with one token per character, the sketch kernels' word-k-shingles
  * become character-k-grams — the standard CJK dedup unit (CCNet /
  * fineweb-2 multilingual practice, public). Covered ranges (all 3-byte
  * UTF-8, decoded inline — multibyte sequences never contain ASCII
  * bytes, so the byte scan stays exact): Hiragana+Katakana U+3040–30FF,
  * CJK Ext-A U+3400–4DBF, CJK Unified U+4E00–9FFF, Hangul syllables
  * U+AC00–D7AF. CJK has no case, so lowercasing never moves these
  * bytes. Pure-Latin text tokenizes EXACTLY as before the CJK arm
  * (OperatorPropertiesSpec pins golden signatures).
  */
object TokenAlg {

  private def isCjk(cp: Int): Boolean =
    (cp >= 0x3040 && cp <= 0x30ff) || (cp >= 0x3400 && cp <= 0x4dbf) ||
      (cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0xac00 && cp <= 0xd7af)

  /** s -> (lowercased bytes, flattened [start,end) run offsets) */
  def lowerAndRuns(s: UTF8String): (Array[Byte], Array[Int], Int) = {
    val bytes = s.toLowerCase.getBytes
    val len = bytes.length
    // worst cases: ASCII alternates token/sep -> (len+1)/2 runs; CJK is
    // one run per 3 bytes -> len/3 runs. Both fit len+2 ints.
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
      } else if ((c & 0xf0) == 0xe0 && i + 2 < len &&
        (bytes(i + 1) & 0xc0) == 0x80 && (bytes(i + 2) & 0xc0) == 0x80) {
        // well-formed 3-byte sequence: decode once, emit if CJK
        val cp = ((c & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) |
          (bytes(i + 2) & 0x3f)
        if (isCjk(cp)) { runs(cnt) = i; runs(cnt + 1) = i + 3; cnt += 2 }
        i += 3
      } else i += 1
    }
    (bytes, runs, cnt / 2)
  }
}
