package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM SimHash kernel backing [[SimHash64Expr]] (static entry point so
  * generated code can call it directly, like [[SurtAlg]]).
  *
  * Semantics mirror `graft.ops.Dedup.simhash64` (the composed
  * explode→64-bit-sum→pack form): per token, hash with xxhash64 at Spark's
  * default seed 42; per bit, accumulate +1 when set else -1; the output bit
  * is set iff its signed count is > 0 (a tie packs 0, matching the
  * composed `IF(s > 0, ...)`). SimilaritySpec asserts the two paths agree
  * on the whole documents corpus.
  *
  * The composed form needs an explode (|tokens| rows) plus a 64-buffer
  * hash aggregation — a full shuffle of the corpus. This kernel is one
  * narrow per-row pass inside whole-stage codegen: at 100 TB the sketch
  * costs a map stage, and the only shuffle left in simhash dedup is the
  * banded candidate join itself.
  */
object SimHashAlg {

  /** array<string> tokens -> 64-bit SimHash. Null elements are skipped
    * (the shared tokenizer never emits them); an empty array packs 0L. */
  def simhash64(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          // +1 when bit b of h is set, -1 otherwise, branch-free
          counts(b) += ((((h >>> b) & 1L) << 1) - 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  /** Fused tokenize+sketch: raw text -> SimHash, or null when the text
    * has no tokens (the row the explode semantics would drop). Unlike
    * [[simhash64]] over a pre-built array, nothing here touches a
    * higher-order function, so the whole sketch projection stays inside
    * whole-stage codegen — at 100 TB the interpreted-lambda tokenizer is
    * the sketch's real cost, not the hashing. */
  def simhash64Text(text: UTF8String): java.lang.Long = {
    val (bytes, runs, nTok) = TokenAlg.lowerAndRuns(text)
    if (nTok == 0) return null
    val counts = new Array[Int](64)
    var t = 0
    while (t < nTok) {
      val start = runs(2 * t)
      val h = XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + start, runs(2 * t + 1) - start, 42L)
      var b = 0
      while (b < 64) {
        counts(b) += ((((h >>> b) & 1L) << 1) - 1L).toInt
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(out)
  }
}
