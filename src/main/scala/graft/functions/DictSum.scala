package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.graft.{shims => S}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** dict_sum (reference builtin_function_registry.cpp:270-278, runtime
  * DictSum in cg_routines.cpp): merge map values by summing per-key —
  * the aggregate behind per-key counter dictionaries.
  *
  * A native [[TypedImperativeAggregate]] over a mutable
  * `java.util.HashMap[String, Long]`: `update` reads the input
  * `MapData` directly off the unsafe row (no Scala-Map encoder round
  * trip per row, the cost that makes an `Aggregator[Map, ...]` ~40µs a
  * row), and the buffer serializes only at the partial→final exchange.
  * Output keys are sorted, so results are deterministic.
  */
case class DictSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with ExpectsInputTypes {

  override def inputTypes = Seq(MapType(StringType, LongType))
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long], input: InternalRow)
      : java.util.HashMap[String, Long] = {
    val m = child.eval(input).asInstanceOf[MapData]
    if (m != null) {
      val keys = m.keyArray()
      val vals = m.valueArray()
      var i = 0
      val n = m.numElements()
      while (i < n) {
        if (!keys.isNullAt(i) && !vals.isNullAt(i)) {
          val k = keys.getUTF8String(i).toString
          buf.put(k, buf.getOrDefault(k, 0L) + vals.getLong(i))
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.put(e.getKey, buf.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val keys = new Array[String](buf.size)
    val it = buf.keySet().iterator()
    var i = 0
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]])
    val ks = new Array[Any](keys.length)
    val vs = new Array[Any](keys.length)
    i = 0
    while (i < keys.length) {
      ks(i) = UTF8String.fromString(keys(i))
      vs(i) = buf.get(keys(i))
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // length-prefixed bytes, not writeUTF: keys are data-derived and
      // writeUTF throws past 64 KiB of encoded key
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      val k = new String(kb, java.nio.charset.StandardCharsets.UTF_8)
      m.put(k, in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DictSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DictSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object DictSumAgg {
  /** Column form: `dict_sum(mapCol)` with sorted output keys. */
  def apply(c: Column): Column =
    S.column(new DictSumAgg(S.expression(c)).toAggregateExpression())
}
