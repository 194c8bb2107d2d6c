package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedAggregateWithHashMapAsBuffer
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.util.collection.OpenHashMap

/** TOPFREQ / MODE — the approximate most-frequent-values aggregate of
  * the reference (docs builtins/aggregation.md#topfreq-mode; the UDAF
  * lives in yql/essentials/minikql — TopFreq keeps a bounded counter
  * buffer). Returns `List<Struct<Frequency:Uint64, Value:T>>`, top
  * `numItems` by estimated frequency.
  *
  * Spark-first shape: a [[TypedAggregateWithHashMapAsBuffer]] — the
  * same partial/final hash-map machinery Spark's own `mode()` rides,
  * so partial aggregation (map-side combine) applies and only the
  * bounded counter map crosses the shuffle, never rows.
  *
  * Bounded memory like the reference: when the map exceeds `bufSize`
  * the Misra–Gries step subtracts the smallest count from every entry
  * and drops the zeros — counts become lower bounds (≤ true count,
  * classic frequent-items guarantee: any value with true frequency
  * > n/bufSize survives). With `bufSize` ≥ the number of distinct
  * values the result is EXACT and partitioning-invariant, which is the
  * regime the oracle pins; the compressed regime is spec-tested for
  * the size bound.
  *
  * Ties order deterministically: frequency descending, then value
  * ascending in the child type's ordering (the reference leaves tie
  * order unspecified).
  */
case class TopFreqAgg(
    child: Expression,
    numItems: Int,
    bufSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedAggregateWithHashMapAsBuffer with UnaryLike[Expression] {

  require(numItems > 0, "TOPFREQ needs a positive item count")
  require(bufSize >= numItems, "TOPFREQ buffer must hold at least num items")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("Frequency", LongType, nullable = false),
    StructField("Value", child.dataType))), containsNull = false)

  private lazy val valueOrdering = TypeUtils.getInterpretedOrdering(child.dataType)

  private def compress(buf: OpenHashMap[AnyRef, Long]): OpenHashMap[AnyRef, Long] = {
    if (buf.size <= bufSize) return buf
    // Misra–Gries batch step: subtract the (bufSize)-th largest count
    // from every entry and keep the strictly-positive survivors —
    // fewer than bufSize remain, and every surviving count is a lower
    // bound on the true frequency (the frequent-items guarantee).
    val counts = buf.iterator.map(_._2).toArray.sorted(Ordering[Long].reverse)
    val cut = counts(bufSize - 1)
    val next = new OpenHashMap[AnyRef, Long](bufSize * 2)
    buf.iterator.foreach { case (k, v) => if (v > cut) next.update(k, v - cut) }
    next
  }

  override def update(buf: OpenHashMap[AnyRef, Long], input: InternalRow): OpenHashMap[AnyRef, Long] = {
    val key = child.eval(input)
    if (key == null) return buf
    val copied = InternalRow.copyValue(key).asInstanceOf[AnyRef]
    buf.changeValue(copied, 1L, _ + 1L)
    if (buf.size > bufSize * 2) compress(buf) else buf
  }

  override def merge(buf: OpenHashMap[AnyRef, Long],
      other: OpenHashMap[AnyRef, Long]): OpenHashMap[AnyRef, Long] = {
    other.iterator.foreach { case (k, v) => buf.changeValue(k, v, _ + v) }
    if (buf.size > bufSize * 2) compress(buf) else buf
  }

  override def eval(buf: OpenHashMap[AnyRef, Long]): Any = {
    val entries = buf.iterator.toArray
    val top = entries.sortWith { (a, b) =>
      if (a._2 != b._2) a._2 > b._2
      else valueOrdering.compare(a._1, b._1) < 0
    }.take(numItems)
    new GenericArrayData(top.map { case (v, n) =>
      new GenericInternalRow(Array[Any](n, v))
    })
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopFreqAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopFreqAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopFreqAgg =
    copy(child = newChild)
  override def prettyName: String = "topfreq"
}
