package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.immutable.TreeMap

/** Custom aggregate functions the reference has and Spark lacks
  * (SURVEY.md §7.3): dict_sum, top_by/bottom_by, checked_sum, bool_xor,
  * linear histogram. All are `Aggregator[IN, BUF, OUT]` — merge-able
  * buffers, so Spark runs them partial+final like any builtin (map-side
  * combine works; nothing is collected to the driver).
  *
  * Register with `functions.udaf(...)`; see Agg.register.
  */
object Aggregators {

  /** dict_sum (builtin_function_registry.cpp:270-278): merge maps,
    * summing values per key.
    */
  /** dict_sum moved to [[graft.functions.DictSumAgg]], a native
    * TypedImperativeAggregate — an `Aggregator[Map, Map, Map]` pays an
    * encoder round trip of the whole map per input row. */
  def dictSum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.DictSumAgg(c)

  /** top_by(value, key, k): the k values with largest keys, descending —
    * a bounded heap per buffer (YQL top/bottom_by, builtin.cpp). Ties on
    * key are broken by value ordering for determinism.
    */
  def topBy(k: Int): Aggregator[(Long, Double), Seq[(Double, Long)], Seq[Long]] =
    new Aggregator[(Long, Double), Seq[(Double, Long)], Seq[Long]] {
      private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
        s.sortBy { case (key, v) => (-key, v) }.take(k)
      def zero: Seq[(Double, Long)] = Seq.empty
      def reduce(b: Seq[(Double, Long)], a: (Long, Double)): Seq[(Double, Long)] =
        trim(b :+ ((a._2, a._1)))
      def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
        trim(x ++ y)
      def finish(r: Seq[(Double, Long)]): Seq[Long] = r.map(_._2)
      def bufferEncoder: Encoder[Seq[(Double, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
      def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }

  /** bottom_by(value, key, k): the k values with smallest keys,
    * ascending — mirror of [[topBy]] (YQL BottomBy, builtin.cpp).
    */
  def bottomBy(k: Int): Aggregator[(Long, Double), Seq[(Double, Long)], Seq[Long]] =
    new Aggregator[(Long, Double), Seq[(Double, Long)], Seq[Long]] {
      private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
        s.sortBy { case (key, v) => (key, v) }.take(k)
      def zero: Seq[(Double, Long)] = Seq.empty
      def reduce(b: Seq[(Double, Long)], a: (Long, Double)): Seq[(Double, Long)] =
        trim(b :+ ((a._2, a._1)))
      def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
        trim(x ++ y)
      def finish(r: Seq[(Double, Long)]): Seq[Long] = r.map(_._2)
      def bufferEncoder: Encoder[Seq[(Double, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
      def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }

  /** top(value, k): the k largest values, descending (YQL Top — plain
    * form, builtin.cpp:3244). Bounded buffer, so map-side partials stay
    * k-sized through the shuffle. */
  def top(k: Int): Aggregator[Double, Seq[Double], Seq[Double]] =
    new Aggregator[Double, Seq[Double], Seq[Double]] {
      private def trim(s: Seq[Double]): Seq[Double] = s.sorted(Ordering[Double].reverse).take(k)
      def zero: Seq[Double] = Seq.empty
      def reduce(b: Seq[Double], a: Double): Seq[Double] = trim(b :+ a)
      def merge(x: Seq[Double], y: Seq[Double]): Seq[Double] = trim(x ++ y)
      def finish(r: Seq[Double]): Seq[Double] = r
      def bufferEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
      def outputEncoder: Encoder[Seq[Double]] = bufferEncoder
    }

  /** bottom(value, k): the k smallest values, ascending (YQL Bottom). */
  def bottom(k: Int): Aggregator[Double, Seq[Double], Seq[Double]] =
    new Aggregator[Double, Seq[Double], Seq[Double]] {
      private def trim(s: Seq[Double]): Seq[Double] = s.sorted.take(k)
      def zero: Seq[Double] = Seq.empty
      def reduce(b: Seq[Double], a: Double): Seq[Double] = trim(b :+ a)
      def merge(x: Seq[Double], y: Seq[Double]): Seq[Double] = trim(x ++ y)
      def finish(r: Seq[Double]): Seq[Double] = r
      def bufferEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
      def outputEncoder: Encoder[Seq[Double]] = bufferEncoder
    }

  /** checked_sum: like sum but overflow errors instead of wrapping
    * (YQL CheckedSum).
    */
  val checkedSum: Aggregator[Long, Long, Long] = new Aggregator[Long, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: Long): Long = Math.addExact(b, a)
    def merge(x: Long, y: Long): Long = Math.addExact(x, y)
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** bool_xor: true iff an odd number of true inputs (YQL BoolXor). */
  val boolXor: Aggregator[Boolean, Boolean, Boolean] =
    new Aggregator[Boolean, Boolean, Boolean] {
      def zero: Boolean = false
      def reduce(b: Boolean, a: Boolean): Boolean = b ^ a
      def merge(x: Boolean, y: Boolean): Boolean = x ^ y
      def finish(r: Boolean): Boolean = r
      def bufferEncoder: Encoder[Boolean] = Encoders.scalaBoolean
      def outputEncoder: Encoder[Boolean] = Encoders.scalaBoolean
    }

  /** Linear histogram (YQL LinearHistogram): fixed-width bins from 0,
    * returns (binStart, count) pairs sorted by bin.
    */
  def linearHistogram(binWidth: Double): Aggregator[Double, Map[Long, Long], Seq[(Double, Long)]] =
    new Aggregator[Double, Map[Long, Long], Seq[(Double, Long)]] {
      def zero: Map[Long, Long] = Map.empty
      def reduce(b: Map[Long, Long], a: Double): Map[Long, Long] = {
        val bin = math.floor(a / binWidth).toLong
        b.updated(bin, b.getOrElse(bin, 0L) + 1L)
      }
      def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] =
        y.foldLeft(x) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
      def finish(r: Map[Long, Long]): Seq[(Double, Long)] =
        r.toSeq.sortBy(_._1).map { case (bin, n) => (bin * binWidth, n) }
      def bufferEncoder: Encoder[Map[Long, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
      def outputEncoder: Encoder[Seq[(Double, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    }

  /** Running-sum view: histogram bins → CDF bins (the YQL *CDF
    * histogram variants, builtin.cpp histogram_cdf_* factories). */
  private def toCdf(bins: Seq[(Double, Long)]): Seq[(Double, Long)] =
    bins.scanLeft((0.0, 0L)) { case ((_, acc), (p, c)) => (p, acc + c) }.drop(1)

  /** Adaptive histogram core (YQL Adaptive*Histogram family,
    * udfs/common/histogram; the Ben-Haim/Tom-Tov streaming histogram):
    * keeps at most `maxBins` (position, count) centroids; inserting
    * past the cap merges the adjacent pair with the lowest
    * `mergeCost(p1,c1,p2,c2)` into its weighted mean — the cost
    * function is what distinguishes the reference's Distance / Ward /
    * Weight variants. Deterministic for a given partition order;
    * totals are exact, bin positions approximate.
    */
  /** Mutable centroid buffer: parallel sorted position/count arrays.
    * Same rationale as HistogramModule.WBuf — ScalaAggregator keeps
    * buffers live between rows, so in-place binary-search inserts
    * replace the per-row immutable-Seq rebuild. */
  final class ABuf(var pos: Array[Double], var cnt: Array[Long],
      var n: Int) extends Serializable

  private def adaptiveCore(maxBins: Int,
      mergeCost: (Double, Long, Double, Long) => Double,
      cdf: Boolean): Aggregator[Double, ABuf, Seq[(Double, Long)]] =
    new Aggregator[Double, ABuf, Seq[(Double, Long)]] {
      private def lowerBound(a: Array[Double], n: Int, p: Double): Int = {
        var lo = 0; var hi = n
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (a(mid) >= p) hi = mid else lo = mid + 1
        }
        lo
      }
      // first minimal adjacent pair (strict <), weighted-mean merge —
      // byte-identical arithmetic to the previous recursive compact
      private def compact(b: ABuf): Unit = while (b.n > maxBins) {
        var best = 0; var bestCost = Double.MaxValue
        var i = 0
        while (i < b.n - 1) {
          val cost = mergeCost(b.pos(i), b.cnt(i), b.pos(i + 1), b.cnt(i + 1))
          if (cost < bestCost) { bestCost = cost; best = i }
          i += 1
        }
        val c = b.cnt(best) + b.cnt(best + 1)
        b.pos(best) =
          (b.pos(best) * b.cnt(best) + b.pos(best + 1) * b.cnt(best + 1)) / c
        b.cnt(best) = c
        System.arraycopy(b.pos, best + 2, b.pos, best + 1, b.n - best - 2)
        System.arraycopy(b.cnt, best + 2, b.cnt, best + 1, b.n - best - 2)
        b.n -= 1
      }
      private def insert(b: ABuf, p: Double, c: Long): Unit = {
        val i = lowerBound(b.pos, b.n, p)
        if (i < b.n && b.pos(i) == p) b.cnt(i) += c
        else {
          if (b.n == b.pos.length) {
            val cap = math.max(8, b.pos.length * 2)
            b.pos = java.util.Arrays.copyOf(b.pos, cap)
            b.cnt = java.util.Arrays.copyOf(b.cnt, cap)
          }
          System.arraycopy(b.pos, i, b.pos, i + 1, b.n - i)
          System.arraycopy(b.cnt, i, b.cnt, i + 1, b.n - i)
          b.pos(i) = p; b.cnt(i) = c; b.n += 1
          compact(b)
        }
      }
      def zero: ABuf = new ABuf(new Array[Double](0), new Array[Long](0), 0)
      def reduce(b: ABuf, a: Double): ABuf = { insert(b, a, 1L); b }
      def merge(x: ABuf, y: ABuf): ABuf = {
        var j = 0
        while (j < y.n) { insert(x, y.pos(j), y.cnt(j)); j += 1 }
        x
      }
      def finish(r: ABuf): Seq[(Double, Long)] = {
        val bins = (0 until r.n).map(i => (r.pos(i), r.cnt(i)))
        if (cdf) toCdf(bins) else bins
      }
      def bufferEncoder: Encoder[ABuf] =
        org.apache.spark.sql.Encoders.kryo[ABuf]
      def outputEncoder: Encoder[Seq[(Double, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    }

  /** AdaptiveDistanceHistogram: merge the closest pair by position. */
  def adaptiveHistogram(maxBins: Int): Aggregator[Double, ABuf, Seq[(Double, Long)]] =
    adaptiveCore(maxBins, (p1, _, p2, _) => p2 - p1, cdf = false)

  /** AdaptiveWardHistogram: merge the pair with the least variance
    * increase — Ward's criterion c1·c2/(c1+c2)·(p2-p1)². */
  def adaptiveWardHistogram(maxBins: Int): Aggregator[Double, ABuf, Seq[(Double, Long)]] =
    adaptiveCore(maxBins,
      (p1, c1, p2, c2) => (c1.toDouble * c2 / (c1 + c2)) * (p2 - p1) * (p2 - p1),
      cdf = false)

  /** AdaptiveWeightHistogram: merge the lightest adjacent pair. */
  def adaptiveWeightHistogram(maxBins: Int): Aggregator[Double, ABuf, Seq[(Double, Long)]] =
    adaptiveCore(maxBins, (_, c1, _, c2) => (c1 + c2).toDouble, cdf = false)

  /** CDF forms of the adaptive family (cumulative counts). */
  def adaptiveHistogramCdf(maxBins: Int): Aggregator[Double, ABuf, Seq[(Double, Long)]] =
    adaptiveCore(maxBins, (p1, _, p2, _) => p2 - p1, cdf = true)
  def adaptiveWardHistogramCdf(maxBins: Int): Aggregator[Double, ABuf, Seq[(Double, Long)]] =
    adaptiveCore(maxBins,
      (p1, c1, p2, c2) => (c1.toDouble * c2 / (c1 + c2)) * (p2 - p1) * (p2 - p1),
      cdf = true)
  def adaptiveWeightHistogramCdf(maxBins: Int): Aggregator[Double, ABuf, Seq[(Double, Long)]] =
    adaptiveCore(maxBins, (_, c1, _, c2) => (c1 + c2).toDouble, cdf = true)

  /** LinearHistogramCDF: fixed-width bins, cumulative counts. */
  def linearHistogramCdf(binWidth: Double): Aggregator[Double, Map[Long, Long], Seq[(Double, Long)]] =
    new Aggregator[Double, Map[Long, Long], Seq[(Double, Long)]] {
      private val base = linearHistogram(binWidth)
      def zero: Map[Long, Long] = base.zero
      def reduce(b: Map[Long, Long], a: Double): Map[Long, Long] = base.reduce(b, a)
      def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] = base.merge(x, y)
      def finish(r: Map[Long, Long]): Seq[(Double, Long)] = toCdf(base.finish(r))
      def bufferEncoder: Encoder[Map[Long, Long]] = base.bufferEncoder
      def outputEncoder: Encoder[Seq[(Double, Long)]] = base.outputEncoder
    }

  /** LogHistogramCDF: logarithmic bins, cumulative counts. */
  def logHistogramCdf(base10: Double = 10.0): Aggregator[Double, Map[Long, Long], Seq[(Double, Long)]] =
    new Aggregator[Double, Map[Long, Long], Seq[(Double, Long)]] {
      private val base = logHistogram(base10)
      def zero: Map[Long, Long] = base.zero
      def reduce(b: Map[Long, Long], a: Double): Map[Long, Long] = base.reduce(b, a)
      def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] = base.merge(x, y)
      def finish(r: Map[Long, Long]): Seq[(Double, Long)] = toCdf(base.finish(r))
      def bufferEncoder: Encoder[Map[Long, Long]] = base.bufferEncoder
      def outputEncoder: Encoder[Seq[(Double, Long)]] = base.outputEncoder
    }

  /** Logarithmic histogram (YQL LogHistogram,
    * udfs/common/histogram): bin = floor(log_base(x)) for x > 0, bin
    * -1 collects non-positives. Returns (binStart, count) sorted. */
  def logHistogram(base: Double = 10.0): Aggregator[Double, Map[Long, Long], Seq[(Double, Long)]] =
    new Aggregator[Double, Map[Long, Long], Seq[(Double, Long)]] {
      def zero: Map[Long, Long] = Map.empty
      def reduce(b: Map[Long, Long], a: Double): Map[Long, Long] = {
        val bin = if (a <= 0.0) -1L
          else math.floor(math.log(a) / math.log(base)).toLong
        b.updated(bin, b.getOrElse(bin, 0L) + 1L)
      }
      def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] =
        y.foldLeft(x) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
      def finish(r: Map[Long, Long]): Seq[(Double, Long)] =
        r.toSeq.sortBy(_._1).map { case (bin, n) =>
          (if (bin < 0) 0.0 else math.pow(base, bin.toDouble), n) }
      def bufferEncoder: Encoder[Map[Long, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
      def outputEncoder: Encoder[Seq[(Double, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    }
}
