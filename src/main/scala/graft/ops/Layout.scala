package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering for
  * file/row-group skipping, the storage-layout optimization behind
  * Delta's OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite
  * (north-star extension; no reference analog — the reference's single
  * sort dimension is the SURT key, recon `zipnumclusterjob.py §reducer`).
  *
  * Why it matters at 100 TB: a table can only be range-sorted on ONE
  * dimension, so min/max footer stats prune scans on that dimension
  * alone — a predicate on any other column reads every file. Mapping k
  * dimensions onto the Morton space-filling curve and range-partitioning
  * on the interleaved z-value gives every file a compact hyper-box in
  * ALL k dimensions at once: each dimension's per-file min/max range
  * shrinks to ~n^(1/k) of the domain, so parquet row-group pruning fires
  * for a predicate on ANY clustered dimension — no index structure, no
  * extra storage, just row order.
  *
  * Everything here is a pure per-row bit-twiddling [[Column]] expression
  * (shiftleft / bitwiseAND / bitwiseOR chains — whole-stage codegen, no
  * UDF): the classic power-of-two magic-mask spread, then an OR of the
  * spread dimensions. The write itself is the standard
  * repartitionByRange(z) + sortWithinPartitions(z) — exactly one range
  * exchange, the same plan shape as sort_global.
  */
object Layout {

  /** 16-bit value -> 32 bits with a zero interleaved after every bit
    * (0b1111 -> 0b01010101): the magic-mask doubling spread. Input is
    * masked to 16 bits, so callers must pre-normalize each dimension
    * into [0, 65535]. */
  def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton z-value of two 16-bit dimensions: bits of `a` at even
    * positions, bits of `b` at odd. Sorting by this walks the 2-d
    * Z-curve, so consecutive rows stay close in BOTH dimensions. */
  def zvalue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Linear normalization of a dimension into the 16-bit z-domain given
    * its global [lo, hi] bounds (the one-row ANALYZE agg every z-order
    * job runs first — Delta's OPTIMIZE does the same stats pass).
    * Scaled in DOUBLE: the integer form ((c−lo)·65535) wraps Long once
    * the domain spans > ~1.4e14 (a µs-timestamp column a few years wide
    * — routine for the tables this targets), silently garbling z-values;
    * a double loses at most ulp precision ≪ one z-cell, and the layout
    * is advisory (dropped before write), so rounding cannot affect
    * results — only clustering quality, which overflow destroyed. */
  def norm16(c: Column, lo: Long, hi: Long): Column =
    ((c - lit(lo)).cast("double") * 65535.0 / math.max(hi - lo, 1L).toDouble)
      .cast("long")

  /** Reference JVM implementation of [[zvalue]] for spec parity. */
  def zvalueRef(a: Int, b: Int): Long = {
    def spread(v: Int): Long = {
      var x = v.toLong & 0xFFFFL
      x = (x | (x << 8)) & 0x00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0FL
      x = (x | (x << 2)) & 0x33333333L
      (x | (x << 1)) & 0x55555555L
    }
    spread(a) | (spread(b) << 1)
  }
}
