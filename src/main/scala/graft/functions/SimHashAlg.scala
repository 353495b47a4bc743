package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData

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
}
