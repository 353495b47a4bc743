package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM MinHash-signature kernel backing [[MinHashSigExpr]].
  *
  * Bit-parity contract with the composed form in `graft.ops.Dedup`
  * (`min(xxhash64(shingle, lit(i)))` per seed column): Spark's
  * `xxhash64(s, i)` folds left from seed 42 — first the string's UTF-8
  * bytes, then the int literal — so seed i's per-shingle hash is
  * `hashInt(i, hashUnsafeBytes(s, 42))`. The kernel hashes each shingle's
  * bytes ONCE and derives all n seeds from that single 64-bit state,
  * where the composed aggregation re-hashes the full string per seed
  * column — n× less string hashing on top of needing no explode/shuffle.
  * NativeExprSpec pins kernel == composed on the documents corpus.
  */
object MinHashAlg {

  /** array<string> shingles -> length-n minhash signature (array<long>).
    * Null for an empty/all-null array (min over nothing is undefined —
    * callers filter token-poor docs out first, matching the composed
    * form's explode semantics). Null elements are skipped. */
  def signature(shingles: ArrayData, n: Int): ArrayData = {
    val m = shingles.numElements()
    val sig = new Array[Long](n)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var seen = false
    var i = 0
    while (i < m) {
      if (!shingles.isNullAt(i)) {
        seen = true
        val s = shingles.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var k = 0
        while (k < n) {
          val hk = XXH64.hashInt(k, h)
          if (hk < sig(k)) sig(k) = hk
          k += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(sig)
  }

  /** Fused tokenize+shingle+sketch: raw text -> length-n signature over
    * word `shingleSize`-grams, or null when the text has fewer than
    * `shingleSize` tokens (the rows the composed form's size filter
    * drops). Shingle bytes are the tokens joined by a single space —
    * byte-identical to `concat_ws(' ', ...)` since tokens are ASCII —
    * assembled in a reused buffer, hashed once, and fanned out to the n
    * seeds from that 64-bit state. No higher-order functions anywhere,
    * so the signature projection codegens whole-stage. */
  def signatureText(text: UTF8String, n: Int, shingleSize: Int): ArrayData = {
    val (bytes, runs, nTok) = TokenAlg.lowerAndRuns(text)
    if (nTok < shingleSize) return null
    val sig = new Array[Long](n)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val buf = new Array[Byte](bytes.length + shingleSize)
    var t = 0
    while (t <= nTok - shingleSize) {
      var pos = 0
      var k = 0
      while (k < shingleSize) {
        if (k > 0) { buf(pos) = ' '; pos += 1 }
        val s0 = runs(2 * (t + k)); val e0 = runs(2 * (t + k) + 1)
        System.arraycopy(bytes, s0, buf, pos, e0 - s0)
        pos += e0 - s0
        k += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, 42L)
      var j = 0
      while (j < n) {
        val hj = XXH64.hashInt(j, h)
        if (hj < sig(j)) sig(j) = hj
        j += 1
      }
      t += 1
    }
    new GenericArrayData(sig)
  }
}
