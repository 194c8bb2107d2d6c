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

/** `dict_sum` as an AGGREGATE-COLUMN merge over the Any carrier
  * (cg_routines.cpp:3313 DictSum; test_aggregate_columns.py
  * test_aggregate_dict_sum): the dynamic-table write path folds each
  * aggregate write into the stored YSON dict.
  *
  * The reference's exact rules, per merge step:
  *   - delta missing or not a map   → state unchanged
  *   - state missing                → delta
  *   - state present but not a map  → null
  *   - recursive merge: keys only in delta are added; int64+int64 sum,
  *     and a sum of exactly 0 removes the entry AND prunes any parent
  *     maps it empties; map+map recurses; ANY other type pairing
  *     aborts the whole merge and returns the PRE-MERGE state.
  *
  * Output maps serialize with recursively sorted keys — the engine's
  * canonical carrier convention, so merged results compare stably
  * across engines (the reference compares dicts unordered; a string
  * carrier needs one canonical order).
  */
object DictSumMerge {
  import com.fasterxml.jackson.databind.JsonNode
  import com.fasterxml.jackson.databind.node.ObjectNode
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private class Mismatch extends RuntimeException

  private def mergeInto(state: ObjectNode, delta: ObjectNode): Unit = {
    val fields = delta.fields()
    while (fields.hasNext) {
      val e = fields.next()
      val key = e.getKey
      val dv = e.getValue
      val sv = state.get(key)
      if (sv == null) {
        state.set(key, dv)
      } else if (sv.isIntegralNumber && dv.isIntegralNumber) {
        val sum = sv.longValue + dv.longValue
        if (sum == 0L) state.remove(key)
        else state.put(key, sum)
      } else if (sv.isObject && dv.isObject) {
        mergeInto(sv.asInstanceOf[ObjectNode], dv.asInstanceOf[ObjectNode])
        // zero-sum removal pruned the child empty → prune it here too
        if (sv.isEmpty) state.remove(key)
      } else throw new Mismatch
    }
  }

  private def sortedJson(n: JsonNode): String =
    if (n.isObject) {
      val names = new java.util.ArrayList[String]()
      n.fieldNames().forEachRemaining(k => { names.add(k); () })
      java.util.Collections.sort(names)
      val sb = new java.lang.StringBuilder("{")
      var first = true
      names.forEach { k =>
        if (!first) sb.append(',')
        first = false
        sb.append('"').append(k).append("\":").append(sortedJson(n.get(k)))
        ()
      }
      sb.append('}').toString
    } else if (n.isArray) {
      val sb = new java.lang.StringBuilder("[")
      var i = 0
      while (i < n.size) {
        if (i > 0) sb.append(',')
        sb.append(sortedJson(n.get(i)))
        i += 1
      }
      sb.append(']').toString
    } else n.toString

  def merge(state: UTF8String, delta: UTF8String): UTF8String = {
    try {
      val dNode = if (delta == null) null else mapper.readTree(delta.toString)
      if (dNode == null || !dNode.isObject) return state
      if (state == null)
        return UTF8String.fromString(sortedJson(dNode))
      val sNode = mapper.readTree(state.toString)
      if (sNode == null || !sNode.isObject) return null
      try {
        mergeInto(sNode.asInstanceOf[ObjectNode], dNode.asInstanceOf[ObjectNode])
        UTF8String.fromString(sortedJson(sNode))
      } catch {
        // type mismatch: the WHOLE merge is abandoned (canonicalized —
        // sNode may be half-mutated, so re-read the original)
        case _: Mismatch =>
          UTF8String.fromString(sortedJson(mapper.readTree(state.toString)))
      }
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  def apply(state: Column, delta: Column): Column =
    S.column(DictSumMergeExpr(S.expression(state), S.expression(delta)))
}

case class DictSumMergeExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  // null handling is part of the merge contract (null delta → state,
  // null state → delta), so do NOT use nullSafeEval
  override def eval(input: InternalRow): Any =
    DictSumMerge.merge(
      left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String])
  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${l.code}
        ${r.code}
        UTF8String ${ev.value} = graft.functions.DictSumMerge.merge(
          ${l.isNull} ? null : ${l.value},
          ${r.isNull} ? null : ${r.value});
        boolean ${ev.isNull} = ${ev.value} == null;""")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : DictSumMergeExpr = copy(left = l, right = r)
}
