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

  /** Wrap a (position, count) adaptive aggregator with true-min/max
    * tracking (the reference keeps MinValue/MaxValue beside the bins —
    * merged bin positions are weighted means, not extremes). */
  private def structAgg(kind: String,
      base: Aggregator[Double, Seq[(Double, Long)], Seq[(Double, Long)]])
      : Aggregator[Double, (Seq[(Double, Long)], Double, Double), HGram] =
    new Aggregator[Double, (Seq[(Double, Long)], Double, Double), HGram] {
      def zero = (base.zero, Double.PositiveInfinity, Double.NegativeInfinity)
      def reduce(b: (Seq[(Double, Long)], Double, Double), a: Double) =
        (base.reduce(b._1, a), math.min(b._2, a), math.max(b._3, a))
      def merge(x: (Seq[(Double, Long)], Double, Double),
          y: (Seq[(Double, Long)], Double, Double)) =
        (base.merge(x._1, y._1), math.min(x._2, y._2), math.max(x._3, y._3))
      def finish(r: (Seq[(Double, Long)], Double, Double)): HGram = {
        val bins = base.finish(r._1).map { case (p, c) => HBin(p, c.toDouble) }
        if (bins.isEmpty) HGram(kind, Nil, 0.0, 0.0, 0.0)
        else HGram(kind, bins, r._2, r._3, bins.map(_.frequency).sum)
      }
      def bufferEncoder: Encoder[(Seq[(Double, Long)], Double, Double)] =
        ExpressionEncoder[(Seq[(Double, Long)], Double, Double)]()
      def outputEncoder: Encoder[HGram] = ExpressionEncoder[HGram]()
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

  /** Register the aggregate producers and module functions; the
    * variadic spellings (Print/Normalize optional args) pad defaults
    * through registry builders onto fixed-arity internal UDFs. */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.udaf
    spark.udf.register("histogram",
      udaf(structAgg("AdaptiveWard", Aggregators.adaptiveWardHistogram(100))))
    spark.udf.register("adaptivewardhistogram",
      udaf(structAgg("AdaptiveWard", Aggregators.adaptiveWardHistogram(100))))
    spark.udf.register("adaptivedistancehistogram",
      udaf(structAgg("AdaptiveDistance", Aggregators.adaptiveHistogram(100))))
    spark.udf.register("adaptiveweighthistogram",
      udaf(structAgg("AdaptiveWeight", Aggregators.adaptiveWeightHistogram(100))))

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

    val r = spark.sessionState.functionRegistry
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    def pad(name: String, target: String, defaults: Seq[Literal]): Unit =
      r.createOrReplaceTempFunction(name, (es: Seq[Expression]) => {
        require(es.nonEmpty && es.length <= 1 + defaults.length,
          s"$name takes 1..${1 + defaults.length} arguments")
        val padded = es ++ defaults.drop(es.length - 1)
        UnresolvedFunction(Seq(target), padded, isDistinct = false)
      }, "built-in")
    pad("histogram_print", "__histogram_print2", Seq(Literal(25)))
    pad("histogram_normalize", "__histogram_normalize3",
      Seq(Literal(100.0), Literal(false)))
  }
}
