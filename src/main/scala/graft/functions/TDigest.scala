package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.{shims => S}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}


/** Stat::TDigest — the reference's mergeable quantile sketch
  * (yql/essentials/udfs/common/stat/static/stat_udf.h: TDigest_Create/
  * AddValue/Merge/Serialize/Deserialize/GetPercentile over
  * library/cpp/tdigest/tdigest.cpp).
  *
  * The 100 TB shape this enables: build one small sketch per partition /
  * shard / day with a map-side-combined aggregation, PERSIST the sketch
  * column (it serializes to a few KB regardless of input size), then
  * answer any percentile later by merging sketches — no re-scan of the
  * raw data, and cross-table/cross-day rollups are a second tiny
  * aggregation over sketch bytes. Spark's `percentile_approx` can only
  * answer the quantiles asked in the original pass; a stored t-digest
  * answers all of them forever.
  *
  * Algorithm mirror of tdigest.cpp (NOT a translation of its C++
  * mechanics — the data structure is the published Dunning t-digest):
  *   - centroids (mean, weight); new points buffer unmerged until
  *     K/delta accumulate, then one sorted merge pass re-compresses
  *   - a neighbor merge is allowed when combined weight stays under the
  *     threshold 4·N·delta·q·(1−q) at the tighter of the two quantile
  *     positions (tdigest.cpp:76-100)
  *   - GetPercentile interpolates with C=1/2 midpoints
  *     (tdigest.cpp:164-180), GetRank is its inverse (tdigest.cpp:183)
  *   - serialization is the reference's proto2 wire layout
  *     (tdigest.proto: Delta=1, K=2, repeated TCentroid{Mean=1,
  *     Weight=2}=3, Nans=4), so sketch bytes are exchangeable
  *   - NaN inputs are tracked out-of-band like stat_udf's
  *     supportsNaN=true resources: they never enter centroids;
  *     percentile(>=1.0) of a NaN-bearing sketch is NaN
  */
final class TDigestSketch(var delta: Double, var kLimit: Double) {
  private var centroids = new java.util.ArrayList[Array[Double]]() // (mean, weight), sorted
  private var unmerged = new java.util.ArrayList[Array[Double]]()
  private var n: Double = 0.0
  private var hasNaN: Boolean = false

  def count: Double = n

  def add(x: Double, w: Double = 1.0): Unit = {
    if (java.lang.Double.isNaN(x)) { hasNaN = true; return }
    unmerged.add(Array(x, w))
    n += w
    if (unmerged.size() >= kLimit / delta) compress()
  }

  /** Fold another sketch in (TDigest::Add): replay its centroids as
    * weighted points; delta/K adopt the tighter/larger of the pair like
    * the merge constructor (tdigest.cpp:39-47). */
  def addSketch(other: TDigestSketch): Unit = {
    delta = math.min(delta, other.delta)
    kLimit = math.max(kLimit, other.kLimit)
    hasNaN ||= other.hasNaN
    var i = 0
    while (i < other.centroids.size()) { val c = other.centroids.get(i); add(c(0), c(1)); i += 1 }
    i = 0
    while (i < other.unmerged.size()) { val c = other.unmerged.get(i); add(c(0), c(1)); i += 1 }
  }

  private def threshold(q: Double): Double = 4.0 * n * delta * q * (1.0 - q)

  def compress(): Unit = {
    if (unmerged.isEmpty) return
    unmerged.sort((a: Array[Double], b: Array[Double]) => java.lang.Double.compare(a(0), b(0)))
    val merged = new java.util.ArrayList[Array[Double]](centroids.size())
    var sum = 0.0
    def push(c: Array[Double]): Unit = {
      if (merged.isEmpty) { merged.add(c.clone()); sum += c(1); return }
      val last = merged.get(merged.size() - 1)
      // the tighter of the two quantile positions bounds the merge
      val q1 = (sum - last(1) * 0.5) / n
      val q2 = (sum + c(1) * 0.5) / n
      val k = math.min(threshold(q1), threshold(q2))
      if (last(1) + c(1) <= k) {
        last(1) += c(1)
        last(0) += c(1) * (c(0) - last(0)) / last(1)
      } else merged.add(c.clone())
      sum += c(1)
    }
    var i = 0
    var j = 0
    while (i < centroids.size() && j < unmerged.size()) {
      if (centroids.get(i)(0) <= unmerged.get(j)(0)) { push(centroids.get(i)); i += 1 }
      else { push(unmerged.get(j)); j += 1 }
    }
    while (i < centroids.size()) { push(centroids.get(i)); i += 1 }
    while (j < unmerged.size()) { push(unmerged.get(j)); j += 1 }
    centroids = merged
    unmerged = new java.util.ArrayList[Array[Double]]()
  }

  /** C=1/2 interpolated percentile (tdigest.cpp:146-181). Empty → 0.0
    * (NaN if only NaNs were added); p>=1.0 with NaNs present → NaN. */
  def percentile(p: Double): Double = {
    compress()
    if (centroids.isEmpty) return if (hasNaN) Double.NaN else 0.0
    if (hasNaN && p >= 1.0) return Double.NaN
    val x = p * n
    var sum = 0.0
    var prevX = 0.0
    var prevMean = centroids.get(0)(0)
    var i = 0
    while (i < centroids.size()) {
      val c = centroids.get(i)
      val curX = sum + c(1) * 0.5
      if (x <= curX) {
        val k = if (curX == prevX) 1.0 else (x - prevX) / (curX - prevX)
        return prevMean + k * (c(0) - prevMean)
      }
      sum += c(1)
      prevX = curX
      prevMean = c(0)
      i += 1
    }
    centroids.get(centroids.size() - 1)(0)
  }

  /** Inverse of [[percentile]] (tdigest.cpp:183-211). */
  def rank(value: Double): Double = {
    compress()
    if (java.lang.Double.isNaN(value)) return 1.0
    if (centroids.isEmpty) return 0.0
    val first = centroids.get(0)
    if (value < first(0)) return 0.0
    if (value == first(0)) return first(1) * 0.5 / n
    var sum = 0.0
    var prevX = 0.0
    var prevMean = first(0)
    var i = 0
    while (i < centroids.size()) {
      val c = centroids.get(i)
      val curX = sum + c(1) * 0.5
      if (value <= c(0)) {
        val k = if (c(0) == prevMean) 1.0 else (value - prevMean) / (c(0) - prevMean)
        return (prevX + k * (curX - prevX)) / n
      }
      sum += c(1)
      prevMean = c(0)
      prevX = curX
      i += 1
    }
    1.0
  }

  /** Reference proto2 wire layout (tdigest.proto). Compresses first like
    * TDigest::Serialize. */
  def serialize(): Array[Byte] = {
    compress()
    val out = new java.io.ByteArrayOutputStream(16 + centroids.size() * 20)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def dbl(tag: Int, x: Double): Unit = {
      out.write(tag)
      var bits = java.lang.Double.doubleToLongBits(x)
      var i = 0
      while (i < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; i += 1 }
    }
    dbl(0x09, delta) // Delta = 1, wire 1
    dbl(0x11, kLimit) // K = 2, wire 1
    var i = 0
    while (i < centroids.size()) {
      val c = centroids.get(i)
      out.write(0x1a) // Centroids = 3, wire 2
      varint(18) // 2 × (tag + fixed64)
      dbl(0x09, c(0)) // Mean = 1
      dbl(0x11, c(1)) // Weight = 2
      i += 1
    }
    if (hasNaN) { out.write(0x20); varint(1) } // Nans = 4, wire 0
    out.toByteArray
  }
}

object TDigestSketch {
  val DefaultDelta = 0.01
  val DefaultK = 25.0

  def apply(delta: Double = DefaultDelta, k: Double = DefaultK): TDigestSketch = {
    require(delta > 0 && k / delta >= 1, "Invalid combination of delta/K values")
    new TDigestSketch(delta, k)
  }

  /** Parse reference proto2 bytes; centroids replay through add() like
    * TDigest's deserializing constructor (tdigest.cpp:24-37). */
  def deserialize(bytes: Array[Byte]): TDigestSketch = {
    var pos = 0
    def varint(): Long = {
      var v = 0L; var shift = 0
      while ({ val b = bytes(pos); pos += 1; v |= (b & 0x7fL) << shift; shift += 7; (b & 0x80) != 0 }) ()
      v
    }
    def dbl(): Double = {
      var bits = 0L
      var i = 0
      while (i < 8) { bits |= (bytes(pos) & 0xffL) << (8 * i); pos += 1; i += 1 }
      java.lang.Double.longBitsToDouble(bits)
    }
    var delta = DefaultDelta
    var k = DefaultK
    val cents = new java.util.ArrayList[Array[Double]]()
    var nans = false
    while (pos < bytes.length) {
      val key = varint()
      (key >> 3, (key & 7).toInt) match {
        case (1, 1) => delta = dbl()
        case (2, 1) => k = dbl()
        case (3, 2) =>
          val end = varint().toInt + pos
          var mean = 0.0
          var weight = 0.0
          while (pos < end) {
            val ck = varint()
            (ck >> 3, (ck & 7).toInt) match {
              case (1, 1) => mean = dbl()
              case (2, 1) => weight = dbl()
              case (_, 0) => varint()
              case (_, 2) => pos += varint().toInt
              case (_, 1) => pos += 8
              case _ => pos = end
            }
          }
          cents.add(Array(mean, weight))
        case (4, 0) => nans = varint() != 0
        case (_, 0) => varint()
        case (_, 2) => pos += varint().toInt
        case (_, 1) => pos += 8
        case _ => pos = bytes.length
      }
    }
    val d = new TDigestSketch(delta, k)
    var i = 0
    while (i < cents.size()) { val c = cents.get(i); d.add(c(0), c(1)); i += 1 }
    if (nans) d.add(Double.NaN)
    d
  }

  /** `Stat::TDigest(value)` aggregate → serialized sketch bytes. */
  def agg(value: Column, delta: Double = DefaultDelta, k: Double = DefaultK): Column =
    S.column(TDigestAgg(S.expression(value), delta, k).toAggregateExpression())

  /** `Stat::TDigest_Merge` as an aggregate over a sketch-bytes column →
    * merged sketch bytes (rollup of persisted shard sketches). */
  def mergeAgg(sketch: Column): Column =
    S.column(TDigestMergeAgg(S.expression(sketch)).toAggregateExpression())

  /** `Stat::TDigest_GetPercentile(sketch, p)`. */
  def percentileOf(sketch: Column, p: Column): Column =
    S.column(TDigestPercentile(S.expression(sketch), S.expression(p)))

  /** GetRank(sketch, value) — estimated CDF position of a value. */
  def rankOf(sketch: Column, value: Column): Column =
    S.column(TDigestRank(S.expression(sketch), S.expression(value)))

  // static entry points for codegen
  def evalPercentile(bytes: Array[Byte], p: Double): Double =
    deserialize(bytes).percentile(p)
  def evalRank(bytes: Array[Byte], v: Double): Double =
    deserialize(bytes).rank(v)
}

/** Build a t-digest from raw doubles: mutable sketch buffer, map-side
  * partial aggregation, serialize only at the exchange. */
case class TDigestAgg(
    child: Expression,
    delta: Double,
    kLimit: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestSketch]
  with ExpectsInputTypes {

  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TDigestSketch = TDigestSketch(delta, kLimit)

  override def update(buf: TDigestSketch, input: InternalRow): TDigestSketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TDigestSketch, other: TDigestSketch): TDigestSketch = {
    buf.addSketch(other); buf
  }

  override def eval(buf: TDigestSketch): Any = buf.serialize()
  override def serialize(buf: TDigestSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDigestSketch =
    TDigestSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Merge pre-built sketch bytes (the rollup pass over persisted shard
  * sketches — the whole reason the sketch serializes). */
case class TDigestMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestSketch]
  with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TDigestSketch = TDigestSketch()

  override def update(buf: TDigestSketch, input: InternalRow): TDigestSketch = {
    val v = child.eval(input)
    if (v != null) buf.addSketch(TDigestSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: TDigestSketch, other: TDigestSketch): TDigestSketch = {
    buf.addSketch(other); buf
  }

  override def eval(buf: TDigestSketch): Any = buf.serialize()
  override def serialize(buf: TDigestSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDigestSketch =
    TDigestSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

case class TDigestPercentile(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(sketch: Any, p: Any): Any =
    TDigestSketch.evalPercentile(sketch.asInstanceOf[Array[Byte]], p.asInstanceOf[Double])
  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (s, p) => s"graft.functions.TDigestSketch.evalPercentile($s, $p)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : TDigestPercentile = copy(left = l, right = r)
}

case class TDigestRank(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(sketch: Any, v: Any): Any =
    TDigestSketch.evalRank(sketch.asInstanceOf[Array[Byte]], v.asInstanceOf[Double])
  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (s, v) => s"graft.functions.TDigestSketch.evalRank($s, $v)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : TDigestRank = copy(left = l, right = r)
}
