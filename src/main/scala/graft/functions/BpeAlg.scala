package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Kernel #15: BPE segmentation piece-count (the [[graft.ops.Bpe]] encode
  * hot loop as a codegen-friendly reference-object call, replacing the
  * last per-row Scala UDF on a corpus-sized path).
  *
  * Semantics are EXACTLY `Bpe.applyMerges` — each merge in rank order,
  * applied as one left-to-right non-overlapping fold — pinned by
  * NativeExprSpec parity against that reference implementation. The fast
  * path differs only mechanically: an in-place write-pointer fold over a
  * reused array (no per-merge buffer churn) and a per-thread word→count
  * memo. Words are Zipf-distributed, so the memo turns the per-ROW cost
  * into a per-DISTINCT-WORD cost within each task thread — the same
  * observation behind `dedup_image_phash`'s collapse-to-distinct.
  */
object BpeAlg {

  /** merge table → plan-embeddable binary literal (rank order preserved) */
  def serialize(merges: Seq[(String, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(merges.size)
    merges.foreach { case (l, r) => out.writeUTF(l); out.writeUTF(r) }
    out.flush()
    bos.toByteArray
  }

  /** Deserialized merge table + per-thread memo. One instance rides the
    * plan per expression (lazy val in BpePieceCountExpr, shared by
    * interpreted eval and the codegen reference object); the memo is a
    * ThreadLocal because one executor's task threads may share the
    * reference object. */
  final class Coder(bytes: Array[Byte]) extends Serializable {
    private val (ls, rs, fused): (Array[String], Array[String], Array[String]) = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val n = in.readInt()
      val l = new Array[String](n); val r = new Array[String](n)
      val f = new Array[String](n)
      var i = 0
      while (i < n) { l(i) = in.readUTF(); r(i) = in.readUTF(); f(i) = l(i) + r(i); i += 1 }
      (l, r, f)
    }

    // bounded per-thread memo: Zipf words hit-rate is near 1; the cap
    // bounds executor heap if a fixture ever feeds high-cardinality words
    @transient private lazy val memo =
      ThreadLocal.withInitial[java.util.HashMap[String, Integer]](
        () => new java.util.HashMap[String, Integer]())
    private val MemoCap = 1 << 16

    /** `Bpe.applyMerges(word, merges).size`, allocation-light */
    def pieceCount(word: String): Int = {
      val len = word.length
      if (len <= 1) return len
      var syms = new Array[String](len)
      var i = 0
      while (i < len) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
      var size = len
      var m = 0
      while (m < ls.length && size > 1) {
        val l = ls(m); val r = rs(m)
        // left-to-right non-overlapping fold, in place: syms[0..w) is the
        // accumulator, so a fusion is visible to the very next compare —
        // 'aaaa' under (a,a) folds to [aa, aa], the applyMerges contract
        var w = 0
        var j = 0
        while (j < size) {
          val x = syms(j)
          if (w > 0 && syms(w - 1) == l && x == r) syms(w - 1) = fused(m)
          else { syms(w) = x; w += 1 }
          j += 1
        }
        size = w
        m += 1
      }
      size
    }

    def pieceCountMemo(word: String): Int = {
      val m = memo.get()
      val hit = m.get(word)
      if (hit != null) hit.intValue()
      else {
        val v = pieceCount(word)
        if (m.size < MemoCap) m.put(word, v)
        v
      }
    }

    /** sum of piece counts over an array of words (null elements count 0,
      * matching the tokens-are-never-null producer contract defensively) */
    def pieceCountAll(arr: ArrayData): Int = {
      var s = 0
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val u = arr.getUTF8String(i)
        if (u != null) s += pieceCountMemo(u.toString)
        i += 1
      }
      s
    }
  }
}
