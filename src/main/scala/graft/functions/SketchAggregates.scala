package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** The Misra-Gries kernel itself, shared between the batch aggregate
  * ([[MisraGriesAgg]]) and the streaming processor
  * (`StreamOps.HeavyHittersProcessor`) — ONE definition of the update /
  * merge / wire format, so the two surfaces cannot drift. */
object MisraGries {

  /** decrement-on-overflow update (Misra & Gries 1982) */
  def update(buf: mutable.HashMap[Long, Long], k: Long, capacity: Int): Unit =
    buf.get(k) match {
      case Some(c) => buf.update(k, c + 1)
      case None if buf.size < capacity => buf.update(k, 1L)
      case None =>
        val dead = buf.iterator.collect { case (key, 1L) => key }.toList
        buf.mapValuesInPlace((_, c) => c - 1)
        dead.foreach(buf.remove)
    }

  /** pairwise-sum then subtract-(capacity+1)-th-largest (Agarwal et al.
    * PODS 2012) — preserves the n/(capacity+1) bound across merges */
  def merge(buf: mutable.HashMap[Long, Long],
      other: mutable.HashMap[Long, Long], capacity: Int): Unit = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    if (buf.size > capacity) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - capacity - 1)
      val dead = buf.iterator.collect { case (key, c) if c <= sub => key }.toList
      buf.mapValuesInPlace((_, c) => c - sub)
      dead.foreach(buf.remove)
    }
  }

  /** deterministic report order: count desc, key asc */
  def top(buf: mutable.HashMap[Long, Long]): Array[(Long, Long)] =
    buf.toArray.sortBy { case (k, c) => (-c, k) }

  def serialize(buf: mutable.HashMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (k, c) => bb.putLong(k); bb.putLong(c) }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[Long, Long]
    (0 until n).foreach(_ => buf.update(bb.getLong, bb.getLong))
    buf
  }
}

/** Misra-Gries heavy hitters as a native MERGEABLE aggregate — the
  * repo's first [[TypedImperativeAggregate]], because this summary
  * genuinely cannot be composed from built-ins the way the CMS / KMV /
  * minhash keys are: the buffer is a BOUNDED map whose update rule
  * (decrement-all on overflow) is imperative by nature.
  *
  * Semantics (Misra & Gries 1982; merge rule from Agarwal et al.
  * "Mergeable Summaries", PODS 2012 — both public):
  *  - state: at most `capacity` (key, count) pairs;
  *  - update: increment if present; insert at 1 if room; else decrement
  *    every counter by 1 and drop zeros (amortized O(1): each
  *    decrement round retires capacity+1 input rows);
  *  - merge: sum counts pairwise, then if over capacity subtract the
  *    (capacity+1)-th largest count from everything and drop ≤ 0 —
  *    exactly the PODS-12 rule that preserves the error bound;
  *  - guarantee: reported ≤ true, and true − reported ≤ n/(capacity+1)
  *    over n total rows, REGARDLESS of how partials were partitioned.
  *    Any key with frequency > n/(capacity+1) is guaranteed present.
  *  - EXACT when distinct keys ≤ capacity (no decrement ever fires) —
  *    which is what lets `agg_heavy_hitters` keep a full DuckDB oracle
  *    while the bound-typed behavior is property-tested separately.
  *
  * At 100 TB this is the "which hosts dominate the crawl" one-pass
  * answer: partial maps combine MAP-SIDE (ObjectHashAggregate), the
  * shuffle moves ≤ capacity pairs per partition, and the final state is
  * capacity-bounded no matter the corpus. eval() orders by
  * (count desc, key asc) so the output is deterministic. */
case class MisraGriesAgg(
    child: Expression,
    capacityExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Long, Long]]
  with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def children: Seq[Expression] = Seq(child, capacityExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("key", LongType), StructField("cnt", LongType))),
    containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else PositiveLiteralGuard.check(prettyName, "capacity" -> capacityExpr)
  }

  private lazy val capacity: Int = capacityExpr.eval().asInstanceOf[Number].intValue()

  override def createAggregationBuffer(): mutable.HashMap[Long, Long] =
    mutable.HashMap.empty[Long, Long]

  override def update(
      buf: mutable.HashMap[Long, Long], input: InternalRow): mutable.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) MisraGries.update(buf, v.asInstanceOf[Long], capacity)
    buf
  }

  override def merge(
      buf: mutable.HashMap[Long, Long],
      other: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    MisraGries.merge(buf, other, capacity)
    buf
  }

  override def eval(buf: mutable.HashMap[Long, Long]): Any =
    new GenericArrayData(MisraGries.top(buf).map { case (k, c) => InternalRow(k, c) })

  override def serialize(buf: mutable.HashMap[Long, Long]): Array[Byte] =
    MisraGries.serialize(buf)

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Long] =
    MisraGries.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0), capacityExpr = newChildren(1))
}
