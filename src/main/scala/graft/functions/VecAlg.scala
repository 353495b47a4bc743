package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Dense-vector kernels backing the native embedding expressions
  * (cosine_sim / l2_dist / pq_encode / lsh_bucket). Static methods so
  * whole-stage codegen can call them directly, mirroring [[SurtAlg]] /
  * [[SimHashAlg]].
  *
  * Bit-parity contract: every kernel accumulates IN ARRAY ORDER with plain
  * double adds, exactly like the composed higher-order-function forms they
  * replace (`aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,v) -> acc+v)`
  * etc.) — the HOF lambdas are CodegenFallback (interpreted per row, the
  * round-3 sim_ann_pq hot-loop finding), but their VALUES are the oracle
  * contract, so the kernels must reproduce them bit-for-bit
  * (NativeExprSpec pins parity on the embeddings corpus).
  */
object VecAlg {

  /** Σ aᵢ·bᵢ in array order — caller must have checked equal lengths
    * (the pairwise entry points below return null on mismatch) */
  private def dotEq(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** √(Σ aᵢ²) in array order */
  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** any NULL slot (corrupt row) — the HOF forms propagate it to NULL */
  private def hasNullSlot(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  /** Σ aᵢ·bᵢ; NULL on length mismatch or null elements (see [[cosine]]) —
    * the projection kernel under power iteration / any v·x scoring pass */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double =
    if (a.numElements() != b.numElements() || hasNullSlot(a) || hasNullSlot(b)) null
    else java.lang.Double.valueOf(dotEq(a, b))

  /** dot/(‖a‖·‖b‖), each factor computed exactly like the composed form
    * (dot / (sqrt(Σa²) * sqrt(Σb²)) — NOT sqrt of the product). NULL on
    * length mismatch OR a null element: zip_with pads the shorter side
    * with nulls and null slots null the product, so the HOF forms return
    * NULL for a truncated/corrupt vector — silently scoring a prefix (or
    * a null-as-zero slot) would hide exactly the malformed rows the
    * parity contract is supposed to surface. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double =
    if (a.numElements() != b.numElements() || hasNullSlot(a) || hasNullSlot(b)) null
    else java.lang.Double.valueOf(dotEq(a, b) / (norm(a) * norm(b)))

  /** √(Σ (aᵢ−bᵢ)²) in array order; NULL on length mismatch or null
    * elements (see [[cosine]]) */
  def l2Dist(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a.numElements() != b.numElements() || hasNullSlot(a) || hasNullSlot(b)) return null
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1 }
    java.lang.Double.valueOf(math.sqrt(s))
  }

  /** driver-side twin of [[l2Dist]] (ADC tables, k-means shifts) — same
    * accumulation order so driver-computed distances equal kernel ones.
    * All intended callers pass same-dimension arrays, so a mismatch is a
    * driver-side shape BUG (e.g. a mis-shaped codebook handed to an ADC
    * table builder) — fail loudly rather than score a plausible prefix. */
  def l2DistArr(a: Array[Double], b: Array[Double]): Double = {
    require(a.length == b.length,
      s"l2DistArr dimension mismatch: ${a.length} vs ${b.length}")
    val n = a.length
    var s = 0.0
    var i = 0
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  /** PQ / nearest-centroid encode: split `ed` (length m·subDim) into m
    * subvectors; for each subspace j pick argmin_c l2Dist(sub_j, book[j·nCent+c])
    * over the flat codebook, ties to the LOWEST c (strict `<` while
    * scanning c ascending — the relational form's `row_number() ORDER BY
    * dist, cid` tie-break). subDim == dim gives m = 1: plain
    * nearest-centroid assignment (IVF cells, k-means).
    *
    * `nCent` makes the codebook's shape AUTHORITATIVE (m = book.length /
    * nCent): deriving m from the row's own length let a corrupt vector of
    * a wrong exact multiple (2·dim) reinterpret the codebook as twice the
    * subspaces and quantize garbage. A malformed ROW (wrong length, null
    * slots) yields a NULL code array — row damage must neither kill the
    * task nor quietly quantize a prefix. Plan-level misuse (bad subDim /
    * nCent / a foldable codebook whose shape doesn't match) fails at
    * ANALYSIS in PqEncodeExpr.checkInputDataTypes. */
  def pqEncode(ed: ArrayData, book: ArrayData, subDim: Int, nCent: Int): ArrayData = {
    if (subDim <= 0 || nCent <= 0 || book.numElements() % nCent != 0) return null
    val m = book.numElements() / nCent
    val dim = ed.numElements()
    if (m == 0 || dim != m * subDim || hasNullSlot(ed)) return null
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < nCent) {
        // a NULL codebook entry is row-level corruption when the codebook
        // is a non-foldable column (analysis-time validation only covers
        // foldable books) — NULL the code array, never NPE the task
        if (book.isNullAt(j * nCent + c)) return null
        val cent = book.getArray(j * nCent + c)
        if (cent == null || cent.numElements() != subDim) return null // corrupt codebook entry
        var s = 0.0
        var i = 0
        while (i < subDim) {
          val d = ed.getDouble(j * subDim + i) - cent.getDouble(i)
          s += d * d
          i += 1
        }
        val dist = math.sqrt(s)
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** elementwise a − b (residual vectors for IVF-PQ); NULL on length
    * mismatch or null slots. NOTE: this follows the KERNEL family's
    * whole-value-NULL convention (like [[cosine]]) by design — zip_with
    * itself would return a padded array / an array holding null elements,
    * which every downstream kernel would then reject anyway. */
  def sub(a: ArrayData, b: ArrayData): ArrayData = {
    if (a.numElements() != b.numElements() || hasNullSlot(a) || hasNullSlot(b)) return null
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = a.getDouble(i) - b.getDouble(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance (ADC) score: Σⱼ l2(res subvector j,
    * book[j·nCent + codes[j]]) — the kernel twin of the per-query
    * literal-ADC-table path ([[graft.queries.Similarity]] `ivfpqProbe`:
    * dtab entries are [[l2DistArr]] per subspace, summed left-to-right),
    * accumulated in the same order so batch-probe distances equal the
    * driver-table ones bit-for-bit. The BATCH form exists because the
    * table path does O(nQ·nProbe·m·nCent·subDim) work on the DRIVER —
    * fine for one query, a serial bottleneck for a query batch; this
    * kernel moves the arithmetic to the executors where it distributes.
    *
    * `nCent` makes the codebook's COUNT authoritative (m = book.length /
    * nCent, same convention as [[pqEncode]]); subDim comes from the
    * residual itself (res.length / m), so a null book entry only damages
    * rows whose codes actually REFERENCE it.
    * NULL on any row-level damage: code count ≠ m, out-of-range code,
    * residual length not a multiple of m, null slots, or a corrupt
    * referenced codebook entry (analysis-time validation in PqAdcExpr
    * only covers foldable books).
    */
  def pqAdc(res: ArrayData, codes: ArrayData, book: ArrayData, nCent: Int): java.lang.Double = {
    if (nCent <= 0 || book.numElements() == 0 || book.numElements() % nCent != 0) return null
    val m = book.numElements() / nCent
    if (codes.numElements() != m || hasNullSlot(codes) || hasNullSlot(res)) return null
    if (res.numElements() % m != 0) return null
    val subDim = res.numElements() / m
    var total = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      if (c < 0 || c >= nCent) return null
      val idx = j * nCent + c
      if (book.isNullAt(idx)) return null
      val cent = book.getArray(idx)
      if (cent == null || cent.numElements() != subDim) return null
      var s = 0.0
      var i = 0
      while (i < subDim) {
        val d = res.getDouble(j * subDim + i) - cent.getDouble(i)
        s += d * d
        i += 1
      }
      total += math.sqrt(s)
      j += 1
    }
    java.lang.Double.valueOf(total)
  }

  /** hyperplane-sign bucket: bit i set iff dot(ed, planes[i]) > 0 — the
    * value-parity twin of the composed
    * `aggregate(transform(planes, (p,i) -> IF(dot > 0, shiftleft(1,i), 0)), 0, +)`.
    * A length-mismatched vector — or one with null slots — leaves every
    * bit unset, matching the HOF form (NULL dot → the IF's else branch
    * → 0). A NULL plane slot, or a plane containing a null element,
    * likewise leaves THAT bit unset (its dot is NULL in the composed
    * form) rather than NPEing the task. */
  def lshBucket(ed: ArrayData, planes: ArrayData): Int = {
    if (hasNullSlot(ed)) return 0
    val n = planes.numElements()
    var bucket = 0
    var i = 0
    while (i < n) {
      if (!planes.isNullAt(i)) {
        val p = planes.getArray(i)
        if (p != null && !hasNullSlot(p) &&
            ed.numElements() == p.numElements() && dotEq(ed, p) > 0) {
          bucket |= (1 << i)
        }
      }
      i += 1
    }
    bucket
  }
}
