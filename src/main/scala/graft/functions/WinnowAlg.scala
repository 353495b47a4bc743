package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Fused winnowing-fingerprint kernel (Schleimer/Wilkerson/Aiken '03, the
  * MOSS fingerprinter) backing [[WinnowTextExpr]].
  *
  * Replaces the composed higher-order-function form
  * (`graft.ops.Dedup.winnowFingerprintsComposed`): there, the nested
  * `transform` lambdas re-evaluate their argument subtrees per element —
  * each of ~|tokens| outer window-min elements re-evaluates the whole
  * shingle-hash `transform`, whose lambda re-evaluates the interpreted
  * (CodegenFallback `filter`) tokenizer per token access — O(tokens³)
  * interpreted work per document (the round-7 1914 s bench line). This
  * kernel is ONE O(tokens) pass: byte-tokenize ([[TokenAlg]]), hash each
  * k-gram once (same bytes + seed as `xxhash64(concat_ws(' ', ...))`),
  * sliding-window minima via a monotonic deque, distinct in
  * first-occurrence order (== `array_distinct`).
  *
  * Bit-parity contract with the composed form (NativeExprSpec pins it on
  * the documents corpus): shingle bytes are the tokens joined by a single
  * space hashed with Spark's xxhash64 seed 42; windows are every `w`
  * consecutive shingle hashes, with one truncated window when a document
  * has fewer than `w` shingles; documents with < k tokens return null
  * (the composed form's empty array — both explode to zero rows).
  */
object WinnowAlg {

  /** text -> distinct winnowing fingerprints (array<long>), null when the
    * text has fewer than k tokens. Expected density 2/(w+1) fingerprints
    * per shingle, so the result is a bounded fraction of the token count. */
  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val (bytes, runs, nTok) = TokenAlg.lowerAndRuns(text)
    if (nTok < k) return null
    val nH = nTok - k + 1
    val hs = new Array[Long](nH)
    val buf = new Array[Byte](bytes.length + k)
    var t = 0
    while (t < nH) {
      var pos = 0
      var j = 0
      while (j < k) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        val s0 = runs(2 * (t + j)); val e0 = runs(2 * (t + j) + 1)
        System.arraycopy(bytes, s0, buf, pos, e0 - s0)
        pos += e0 - s0
        j += 1
      }
      hs(t) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, 42L)
      t += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (nH < w) {
      // single truncated window: min over all shingle hashes
      var mn = Long.MaxValue
      var i = 0
      while (i < nH) { if (hs(i) < mn) mn = hs(i); i += 1 }
      out.add(mn)
    } else {
      // monotonic deque of indices with increasing hash values; the head
      // is the current window's minimum. One push+<=1 evict per step.
      val deque = new Array[Int](nH)
      var head = 0; var tail = 0
      var i = 0
      while (i < nH) {
        while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) out.add(hs(deque(head)))
        i += 1
      }
    }
    val res = new Array[Long](out.size)
    var p = 0
    val it = out.iterator
    while (it.hasNext) { res(p) = it.next(); p += 1 }
    new GenericArrayData(res)
  }
}
