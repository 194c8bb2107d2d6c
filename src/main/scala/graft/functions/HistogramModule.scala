package graft.functions

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions.udf

/** The `Histogram::` post-processing module
  * (udfs/common/histogram/histogram_udf.cpp:18-28 method maps, 614
  * Print, 711 ToCumulativeDistributionFunction, 782 Normalize;
  * interpolation arithmetic library/cpp/histogram/adaptive/
  * adaptive_histogram.cpp:296-465) over the reference's histogram
  * STRUCT result {Kind, Bins:[{Position, Frequency}], Min, Max,
  * WeightsSum}.
  *
  * The struct producers register too: `HISTOGRAM(x)` (=
  * AdaptiveWardHistogram, the reference's default) and the
  * AdaptiveDistance/Ward/Weight spellings — merge-able Aggregators, so
  * partial aggregation stays map-side. Post-processing runs once per
  * GROUP on an ≤maxBins struct, so Scala UDFs are the right cost
  * tier here (the per-row hot path is the aggregate, which is typed).
  *
  * The GetSum and Calc families reproduce the piecewise-linear
  * trapezoid interpolation of GetSumAboveBoundImpl /
  * GetSumBelowBoundImpl / CalcUpperBound / CalcLowerBound bit-for-bit
  * in double arithmetic.
  */
object HistogramModule {

  final case class HBin(position: Double, frequency: Double)
  final case class HGram(kind: String, bins: Seq[HBin], min: Double,
      max: Double, weightssum: Double)

  // ——— struct-producing aggregates ———

  /** The weighted streaming-histogram core behind every struct
    * producer (histogram_udf.cpp TAdaptiveWardHistogram default;
    * TLinearHistogram/TLogarithmicHistogram snap values first and
    * inherit the Ward core with an effectively-unbounded bin cap;
    * adaptive_histogram.cpp Ben-Haim/Tom-Tov insert-then-merge):
    * sorted (position, weight) centroids; past `maxBins` the
    * lowest-`cost` adjacent pair merges into its weighted mean. True
    * min/max track beside the bins (merged positions are means, not
    * extremes). `tf` is the bin-snap transform; NaN positions drop,
    * as TLogarithmicHistogram::Add does.
    */
  /** Mutable aggregation buffer: parallel sorted position/weight
    * arrays. ScalaAggregator keeps buffers as live objects between
    * rows (serialization only at shuffle), so in-place inserts with
    * binary search + arraycopy replace the previous immutable-Seq
    * buffer whose per-row indexWhere + take/drop rebuild (boxed
    * tuples) dominated the aggregate's profile. */
  final class WBuf(var pos: Array[Double], var wts: Array[Double],
      var n: Int, var mn: Double, var mx: Double) extends Serializable

  private def weightedCore(kind: String, maxBins: Int,
      tf: Double => Double,
      cost: (Double, Double, Double, Double) => Double)
      : Aggregator[(Option[Double], Option[Double]), WBuf, HGram] =
    new Aggregator[(Option[Double], Option[Double]), WBuf, HGram] {
      private def lowerBound(a: Array[Double], n: Int, p: Double): Int = {
        // first index with a(i) >= p — same slot indexWhere found
        var lo = 0; var hi = n
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (a(mid) >= p) hi = mid else lo = mid + 1
        }
        lo
      }
      /** Merge the adjacent pair with the least cost until within the
        * cap — the FIRST minimal pair on ties, exactly like the old
        * recursive compact (strict <). Weighted-mean position. */
      private def compact(b: WBuf): Unit = while (b.n > maxBins) {
        var best = 0; var bestCost = Double.MaxValue
        var i = 0
        while (i < b.n - 1) {
          val c = cost(b.pos(i), b.wts(i), b.pos(i + 1), b.wts(i + 1))
          if (c < bestCost) { bestCost = c; best = i }
          i += 1
        }
        val w = b.wts(best) + b.wts(best + 1)
        b.pos(best) =
          (b.pos(best) * b.wts(best) + b.pos(best + 1) * b.wts(best + 1)) / w
        b.wts(best) = w
        System.arraycopy(b.pos, best + 2, b.pos, best + 1, b.n - best - 2)
        System.arraycopy(b.wts, best + 2, b.wts, best + 1, b.n - best - 2)
        b.n -= 1
      }
      /** Insert an already-snapped position (merge path / post-tf). */
      private def insertSnapped(b: WBuf, p: Double, w: Double): Unit = {
        val i = lowerBound(b.pos, b.n, p)
        if (i < b.n && b.pos(i) == p) b.wts(i) += w
        else {
          if (b.n == b.pos.length) {
            val cap = math.max(8, b.pos.length * 2)
            b.pos = java.util.Arrays.copyOf(b.pos, cap)
            b.wts = java.util.Arrays.copyOf(b.wts, cap)
          }
          System.arraycopy(b.pos, i, b.pos, i + 1, b.n - i)
          System.arraycopy(b.wts, i, b.wts, i + 1, b.n - i)
          b.pos(i) = p; b.wts(i) = w; b.n += 1
          compact(b)
        }
      }
      def zero: WBuf = new WBuf(new Array[Double](0), new Array[Double](0),
        0, Double.PositiveInfinity, Double.NegativeInfinity)
      // Optional input: a NULL value or weight adds nothing — the
      // reference's HISTOGRAM(Double?) skips NULLs (a primitive-typed
      // aggregator would silently coerce them to 0.0 bins)
      def reduce(b: WBuf, a: (Option[Double], Option[Double])): WBuf = {
        (a._1, a._2) match {
          case (Some(v), Some(w)) =>
            val p = tf(v)
            if (!p.isNaN) {
              insertSnapped(b, p, w)
              b.mn = math.min(b.mn, p); b.mx = math.max(b.mx, p)
            }
          case _ =>
        }
        b
      }
      def merge(x: WBuf, y: WBuf): WBuf = {
        x.mn = math.min(x.mn, y.mn); x.mx = math.max(x.mx, y.mx)
        var j = 0
        while (j < y.n) {
          // positions are already snapped; insert with identity
          insertSnapped(x, y.pos(j), y.wts(j))
          j += 1
        }
        x
      }
      def finish(r: WBuf): HGram = {
        if (r.n == 0) HGram(kind, Nil, 0.0, 0.0, 0.0)
        else {
          val bins = (0 until r.n).map(i => HBin(r.pos(i), r.wts(i)))
          HGram(kind, bins, r.mn, r.mx, bins.map(_.frequency).sum)
        }
      }
      def bufferEncoder: Encoder[WBuf] =
        org.apache.spark.sql.Encoders.kryo[WBuf]
      def outputEncoder: Encoder[HGram] = ExpressionEncoder[HGram]()
    }

  /** Ward criterion (TAdaptiveWardHistogram): least variance
    * increase. */
  private val wardCost =
    (p1: Double, w1: Double, p2: Double, w2: Double) =>
      (w1 * w2 / (w1 + w2)) * (p2 - p1) * (p2 - p1)

  /** TLinearHistogram::Add — clamp to [begin,end], else snap to the
    * nearest step multiple. */
  private def linearSnap(step: Double, begin: Double, end: Double)
      (v: Double): Double =
    if (v < begin) begin
    else if (v > end) end
    else math.floor(v / step + 0.5) * step

  /** TLogarithmicHistogram::Add — snap to the nearest power of the
    * base, then clamp. */
  private def logSnap(base: Double, begin: Double, end: Double)
      (v: Double): Double = {
    val l = math.log(v) / math.log(base)
    val prev = math.pow(base, math.floor(l))
    val next = math.pow(base, math.ceil(l))
    val snapped = if (math.abs(v - next) > math.abs(v - prev)) prev else next
    if (snapped < begin) begin else if (snapped > end) end else snapped
  }

  // ——— the interpolation arithmetic (adaptive_histogram.cpp) ———

  private def parse(h: Row): HGram = {
    val bins = h.getAs[scala.collection.Seq[Row]]("bins").map(b =>
      HBin(b.getAs[Double]("position"), b.getAs[Double]("frequency"))).toSeq
    HGram(h.getAs[String]("kind"), bins, h.getAs[Double]("min"),
      h.getAs[Double]("max"), h.getAs[Double]("weightssum"))
  }
  private def total(h: HGram): Double = h.bins.map(_.frequency).sum

  /** adaptive_histogram.cpp:303 GetSumAboveBound. */
  private def sumAbove(h: HGram, bound: Double): Double = {
    val bins = h.bins
    if (bins.isEmpty) 0.0
    else if (bound < h.min) total(h)
    else if (bound > h.max) 0.0
    else {
      val idx = bins.indexWhere(_.position >= bound) match {
        case -1 => bins.length; case i => i
      }
      val left = if (idx > 0) bins(idx - 1) else HBin(h.min, 0.0)
      val right = if (idx < bins.length) bins(idx) else HBin(h.max, 0.0)
      val base = right.frequency / 2 + (
        if (right.position == left.position)
          (left.frequency + right.frequency) / 2
        else (left.frequency + right.frequency) / 2 *
          (right.position - bound) / (right.position - left.position))
      if (idx == bins.length) base
      else base + bins.drop(idx + 1).map(_.frequency).sum
    }
  }

  /** adaptive_histogram.cpp:336 GetSumBelowBound. */
  private def sumBelow(h: HGram, bound: Double): Double = {
    val bins = h.bins
    if (bins.isEmpty) 0.0
    else if (bound < h.min) 0.0
    else if (bound > h.max) total(h)
    else {
      val idx = bins.indexWhere(_.position >= bound) match {
        case -1 => bins.length; case i => i
      }
      val left = if (idx > 0) bins(idx - 1) else HBin(h.min, 0.0)
      val right = if (idx < bins.length) bins(idx) else HBin(h.max, 0.0)
      val base = left.frequency / 2 + (
        if (right.position == left.position)
          (left.frequency + right.frequency) / 2
        else (left.frequency + right.frequency) / 2 *
          (bound - left.position) / (right.position - left.position))
      if (idx == 0) base
      else base + bins.take(idx - 1).map(_.frequency).sum
    }
  }

  /** adaptive_histogram.cpp:296 GetSumInRange. */
  private def sumInRange(h: HGram, lo: Double, hi: Double): Double =
    if (lo > hi) 0.0 else sumAbove(h, lo) + sumBelow(h, hi) - total(h)

  /** adaptive_histogram.cpp:368 CalcUpperBound: the position below
    * which ~`sum` of the weight mass lies. */
  private def calcUpper(h: HGram, sum: Double): Double = {
    require(sum >= 0, "Sum must be >= 0")
    val bins = h.bins
    if (sum == 0.0) h.min
    else if (bins.isEmpty) h.max
    else {
      var i = 0; var gathered = 0.0
      while (i < bins.length && gathered < sum) {
        gathered += bins(i).frequency; i += 1
      }
      val cur = i - 1
      if (gathered < sum) h.max
      else {
        val left = if (cur > 0) bins(cur - 1) else HBin(h.min, 0.0)
        val right = if (cur + 1 < bins.length) bins(cur + 1)
          else HBin(h.max, 0.0)
        val c = bins(cur)
        var sumToAdd = sum - (gathered - c.frequency - left.frequency / 2)
        if (sumToAdd <= (c.frequency + left.frequency) / 2)
          left.position + 2 * sumToAdd * (c.position - left.position) /
            (c.frequency + left.frequency)
        else {
          sumToAdd -= (c.frequency + left.frequency) / 2
          c.position + 2 * sumToAdd * (right.position - c.position) /
            (right.frequency + c.frequency)
        }
      }
    }
  }

  /** adaptive_histogram.cpp:409 CalcLowerBound. */
  private def calcLower(h: HGram, sum: Double): Double = {
    require(sum >= 0, "Sum must be >= 0")
    val bins = h.bins
    if (sum == 0.0) h.max
    else if (bins.isEmpty) h.min
    else {
      var i = bins.length; var gathered = 0.0
      while (i > 0 && gathered < sum) { i -= 1; gathered += bins(i).frequency }
      val cur = i
      if (gathered < sum) h.min
      else {
        val left = if (cur > 0) bins(cur - 1) else HBin(h.min, 0.0)
        val right = if (cur + 1 < bins.length) bins(cur + 1)
          else HBin(h.max, 0.0)
        val c = bins(cur)
        var sumToAdd = sum - (gathered - c.frequency - right.frequency / 2)
        if (sumToAdd <= (c.frequency + right.frequency) / 2)
          right.position - 2 * sumToAdd * (right.position - c.position) /
            (c.frequency + right.frequency)
        else {
          sumToAdd -= (c.frequency + right.frequency) / 2
          c.position - 2 * sumToAdd * (c.position - left.position) /
            (left.frequency + c.frequency)
        }
      }
    }
  }

  /** adaptive_histogram.cpp:449/456 Calc*BoundSafe: clamp `sum` up to
    * the first/last bin's own weight before the plain calculation. */
  private def calcUpperSafe(h: HGram, sum: Double): Double =
    calcUpper(h, if (h.bins.nonEmpty) math.max(h.bins.head.frequency, sum)
      else sum)
  private def calcLowerSafe(h: HGram, sum: Double): Double =
    calcLower(h, if (h.bins.nonEmpty) math.max(h.bins.last.frequency, sum)
      else sum)

  /** histogram_udf.cpp:782 Normalize(h[, area=100[, cdf=false]]). */
  private def normalize(h: HGram, area: Double, cdf: Boolean): HGram = {
    val sum = total(h)
    val lastF = h.bins.lastOption.map(_.frequency).getOrElse(0.0)
    val scaled = h.bins.map { b =>
      val f = if (cdf) area * b.frequency / lastF else area * b.frequency / sum
      HBin(b.position, f)
    }
    HGram(if (cdf) h.kind + "Cdf" else h.kind, scaled, h.min, h.max,
      scaled.map(_.frequency).sum)
  }

  /** histogram_udf.cpp:711 ToCumulativeDistributionFunction: running
    * frequency sums; WeightsSum accumulates the PARTIAL sums (that is
    * what the reference stores there). */
  private def toCdf(h: HGram): HGram = {
    var run = 0.0; var ws = 0.0
    val out = h.bins.map { b =>
      run += b.frequency; ws += run; HBin(b.position, run)
    }
    HGram(h.kind + "Cdf", out, h.min, h.max, ws)
  }

  /** histogram_udf.cpp:614 Print(h[, bars=25]): the bar-chart text,
    * byte-compatible modulo printf rounding mode. */
  private def printH(h: HGram, bars: Int): String = {
    val sb = new StringBuilder
    sb.append("Kind: ").append(h.kind).append(' ')
    sb.append(f"Bins: ${h.bins.length}%d WeightsSum: ${h.weightssum}%.3f " +
      f"Min: ${h.min}%.3f Max: ${h.max}%.3f")
    val maxFreq = if (h.bins.isEmpty) 0.0 else h.bins.map(_.frequency).max
    val pw = h.bins.map(b => f"${b.position}%.3f".length).maxOption.getOrElse(0)
    val fw = h.bins.map(b => f"${b.frequency}%.3f".length).maxOption.getOrElse(0)
    h.bins.foreach { b =>
      sb.append('\n')
      if (bars > 0 && maxFreq > 0) {
        val filled = (bars * b.frequency / maxFreq).toInt
        (0 until bars).foreach(i => sb.append(if (i < filled) '█' else '░'))
      }
      sb.append(" P: ").append(f"${b.position}%.3f".reverse.padTo(pw, ' ').reverse)
      sb.append(" F: ").append(f"${b.frequency}%.3f".reverse.padTo(fw, ' ').reverse)
    }
    sb.toString
  }

  // ——— registration ———

  /** Register the aggregate producers and module functions. The
    * producers dispatch on the reference's overloads
    * (aggregation.md#histogram): `HISTOGRAM(x)`,
    * `HISTOGRAM(x, weight)`, `HISTOGRAM(x, intervals)` (an integer
    * LITERAL second argument means intervals, anything else is
    * weight — the reference's own disambiguation rule),
    * `HISTOGRAM(x, weight, intervals)`;
    * `LinearHistogram/LogarithmicHistogram/LogHistogram(x[, step
    * [, min[, max]]])`. Variadic module spellings (Print/Normalize
    * optional args) pad defaults through registry builders onto
    * fixed-arity internal UDFs. */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.functions.{lit, udaf}
    import org.apache.spark.sql.graft.{shims => S}
    val r = spark.sessionState.functionRegistry
    def reg(name: String)(b: Seq[Expression] => Expression): Unit =
      r.createOrReplaceTempFunction(name, b, "built-in")
    def litD(e: Expression, fn: String): Double = {
      require(e.foldable, s"$fn takes constant numeric parameters")
      val v = e.eval(null)
      require(v != null, s"$fn constant parameter is null")
      v match {
        case n: Number => n.doubleValue()
        case other => other.toString.toDouble
      }
    }
    def isIntLit(e: Expression): Boolean = e.foldable && (e.dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    })
    def cc(e: Expression) = S.column(e)
    // adaptive family: (x[, weight][, intervals-literal])
    def adaptive(name: String, kind: String,
        cost: (Double, Double, Double, Double) => Double): Unit =
      reg(name) { es =>
        require(es.nonEmpty && es.length <= 3,
          s"$name takes (value[, weight][, intervals])")
        val (weight, bins) = es.drop(1) match {
          case Seq() => (lit(1.0), 100)
          case Seq(e) if isIntLit(e) => (lit(1.0), litD(e, name).toInt)
          case Seq(e) => (cc(e).cast("double"), 100)
          case Seq(w, n) =>
            require(isIntLit(n), s"$name intervals must be an integer literal")
            (cc(w).cast("double"), litD(n, name).toInt)
        }
        require(bins > 0, s"$name intervals must be positive")
        S.convert(udaf(weightedCore(kind, bins, identity, cost))
          .apply(cc(es.head).cast("double"), weight))
      }
    adaptive("histogram", "AdaptiveWard", wardCost)
    adaptive("adaptivewardhistogram", "AdaptiveWard", wardCost)
    adaptive("adaptivedistancehistogram", "AdaptiveDistance",
      (p1, _, p2, _) => p2 - p1)
    adaptive("adaptiveweighthistogram", "AdaptiveWeight",
      (_, w1, _, w2) => w1 + w2)
    // fixed-grid family: (x[, step/base[, min[, max]]]) — snap, then
    // the Ward core with the reference's effectively-unbounded cap
    def fixedGrid(name: String, kind: String,
        snap: (Double, Double, Double) => Double => Double): Unit =
      reg(name) { es =>
        require(es.nonEmpty && es.length <= 4,
          s"$name takes (value[, step[, min[, max]]])")
        val step = es.lift(1).map(litD(_, name)).getOrElse(10.0)
        val begin = es.lift(2).map(litD(_, name))
          .getOrElse(Double.NegativeInfinity)
        val end = es.lift(3).map(litD(_, name))
          .getOrElse(Double.PositiveInfinity)
        S.convert(udaf(weightedCore(kind, 1 << 24,
            snap(step, begin, end), wardCost))
          .apply(cc(es.head).cast("double"), lit(1.0)))
      }
    fixedGrid("linearhistogram", "Linear",
      (s, b, e) => linearSnap(s, b, e))
    fixedGrid("logarithmichistogram", "Logarithmic",
      (s, b, e) => logSnap(s, b, e))
    fixedGrid("loghistogram", "Logarithmic",
      (s, b, e) => logSnap(s, b, e))

    spark.udf.register("histogram_getsumabovebound",
      udf((h: Row, b: Double) => sumAbove(parse(h), b)))
    spark.udf.register("histogram_getsumbelowbound",
      udf((h: Row, b: Double) => sumBelow(parse(h), b)))
    spark.udf.register("histogram_getsuminrange",
      udf((h: Row, lo: Double, hi: Double) => sumInRange(parse(h), lo, hi)))
    spark.udf.register("histogram_calcupperbound",
      udf((h: Row, s: Double) => calcUpper(parse(h), s)))
    spark.udf.register("histogram_calclowerbound",
      udf((h: Row, s: Double) => calcLower(parse(h), s)))
    spark.udf.register("histogram_calcupperboundsafe",
      udf((h: Row, s: Double) => calcUpperSafe(parse(h), s)))
    spark.udf.register("histogram_calclowerboundsafe",
      udf((h: Row, s: Double) => calcLowerSafe(parse(h), s)))
    spark.udf.register("histogram_tocumulativedistributionfunction",
      udf((h: Row) => toCdf(parse(h))))
    spark.udf.register("__histogram_print2",
      udf((h: Row, bars: Int) => printH(parse(h), bars)))
    spark.udf.register("__histogram_normalize3",
      udf((h: Row, area: Double, cdf: Boolean) =>
        normalize(parse(h), area, cdf)))

    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    import org.apache.spark.sql.catalyst.expressions.Literal
    def pad(name: String, target: String, defaults: Seq[Literal]): Unit =
      reg(name) { es =>
        require(es.nonEmpty && es.length <= 1 + defaults.length,
          s"$name takes 1..${1 + defaults.length} arguments")
        UnresolvedFunction(Seq(target), es ++ defaults.drop(es.length - 1),
          isDistinct = false)
      }
    pad("histogram_print", "__histogram_print2", Seq(Literal(25)))
    pad("histogram_normalize", "__histogram_normalize3",
      Seq(Literal(100.0), Literal(false)))
  }
}
