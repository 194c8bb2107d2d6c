package graft.functions

/** The Math:: special-function tail (udfs/common/math/math_udf.cpp —
  * thin libm bindings; docs udf/list/math.md): erf/erfinv/erfcinv,
  * lgamma/tgamma, IEEE remainder. Spark has no built-ins for these, so
  * they are implemented here in pure double arithmetic (Taylor series +
  * Lentz continued fraction for erf, Lanczos for gamma), accurate to
  * ~1e-14 over the real line — the same contract as the reference's
  * libm build modulo the last couple of ulps.
  */
object MathOps {

  private val TwoOverSqrtPi = 1.1283791670955126 // 2/sqrt(pi)
  private val SqrtPi = 1.7724538509055160

  /** erf via Taylor series, |x| <= 2 (alternating, peak term ~x^8/4!,
    * no harmful cancellation at double precision in this range). */
  private def erfSeries(x: Double): Double = {
    val x2 = x * x
    var term = x
    var sum = 0.0
    var n = 0
    var cont = true
    while (cont && n < 200) {
      val add = term / (2 * n + 1)
      sum += add
      if (math.abs(add) < math.abs(sum) * 1e-18) cont = false
      n += 1
      term = -term * x2 / n
    }
    TwoOverSqrtPi * sum
  }

  /** erfc for x >= 2 via the asymptotic continued fraction
    * erfc(x) = e^(-x^2)/(x*sqrt(pi)) * 1/(1+q1/(1+q2/(1+...))),
    * q_k = k/(2x^2), evaluated with modified Lentz. */
  private def erfcCF(x: Double): Double = {
    val inv2x2 = 1.0 / (2.0 * x * x)
    val tiny = 1e-300
    var f = tiny
    var c = f
    var d = 0.0
    var k = 0
    var cont = true
    while (cont && k < 300) {
      val a = if (k == 0) 1.0 else k * inv2x2
      val b = 1.0
      d = b + a * d
      if (d == 0.0) d = tiny
      c = b + a / c
      if (c == 0.0) c = tiny
      d = 1.0 / d
      val delta = c * d
      f *= delta
      if (math.abs(delta - 1.0) < 1e-17) cont = false
      k += 1
    }
    // f converged to the CF value 1/(1+q1/(1+q2/...))
    math.exp(-x * x) / (x * SqrtPi) * f
  }

  def erf(x: Double): Double = {
    if (x.isNaN) Double.NaN
    else if (x >= 6.5) 1.0
    else if (x <= -6.5) -1.0
    else if (math.abs(x) <= 2.0) erfSeries(x)
    else {
      val e = erfcCF(math.abs(x))
      if (x > 0) 1.0 - e else e - 1.0
    }
  }

  def erfc(x: Double): Double =
    if (x.isNaN) Double.NaN
    else if (x >= 2.0 && x < 27.3) erfcCF(x)
    else if (x >= 27.3) 0.0
    else 1.0 - erf(x)

  /** Inverse erf: Winitzki initial guess + Newton to full precision. */
  def erfInv(y: Double): Double = {
    if (y.isNaN) return Double.NaN
    if (y >= 1.0) return if (y == 1.0) Double.PositiveInfinity else Double.NaN
    if (y <= -1.0) return if (y == -1.0) Double.NegativeInfinity else Double.NaN
    if (y == 0.0) return 0.0
    val a = 0.147
    val ln1my2 = math.log1p(-y * y)
    val t1 = 2.0 / (math.Pi * a) + ln1my2 / 2.0
    var x = math.signum(y) * math.sqrt(math.sqrt(t1 * t1 - ln1my2 / a) - t1)
    var i = 0
    while (i < 6) {
      val err = erf(x) - y
      x -= err * SqrtPi / 2.0 * math.exp(x * x)
      i += 1
    }
    x
  }

  /** Inverse complementary erf over (0, 2). */
  def erfcInv(z: Double): Double =
    if (z.isNaN) Double.NaN
    else if (z <= 0.0) { if (z == 0.0) Double.PositiveInfinity else Double.NaN }
    else if (z >= 2.0) { if (z == 2.0) Double.NegativeInfinity else Double.NaN }
    else erfInv(1.0 - z)

  // Lanczos g=7, n=9 (the standard published coefficient set)
  private val LanczosG = 7.0
  private val Lanczos = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  /** Gamma via Lanczos, reflection for x < 0.5. */
  def tgamma(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    if (x == math.rint(x) && x <= 0.0) return Double.NaN // poles
    if (x < 0.5)
      math.Pi / (math.sin(math.Pi * x) * tgamma(1.0 - x))
    else {
      val z = x - 1.0
      var a = Lanczos(0)
      var i = 1
      while (i < Lanczos.length) { a += Lanczos(i) / (z + i); i += 1 }
      val t = z + LanczosG + 0.5
      math.sqrt(2.0 * math.Pi) * math.pow(t, z + 0.5) * math.exp(-t) * a
    }
  }

  /** log|Gamma| (C lgamma contract). */
  def lgamma(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    if (x == math.rint(x) && x <= 0.0) return Double.PositiveInfinity
    if (x < 0.5)
      math.log(math.Pi / math.abs(math.sin(math.Pi * x))) - lgamma(1.0 - x)
    else {
      val z = x - 1.0
      var a = Lanczos(0)
      var i = 1
      while (i < Lanczos.length) { a += Lanczos(i) / (z + i); i += 1 }
      val t = z + LanczosG + 0.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }
  }
}

/** Scalar dispatch expression for the Math:: special functions —
  * 1-arg double in, double out (remainder: 2-arg), NULL-strict like
  * the reference's {Flags:AutoMap} signatures. */
final case class MathFnExpr(fn: String,
    children: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
  extends org.apache.spark.sql.catalyst.expressions.Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.InternalRow

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = s"math_$fn"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val want = if (fn == "remainder") 2 else 1
    if (children.length == want &&
        children.forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckSuccess
    else TypeCheckFailure(
      s"Math::$fn expects $want numeric argument(s), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  private def num(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
  }

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    fn match {
      case "erf" => MathOps.erf(num(vs.head))
      case "erfinv" => MathOps.erfInv(num(vs.head))
      case "erfcinv" => MathOps.erfcInv(num(vs.head))
      case "lgamma" => MathOps.lgamma(num(vs.head))
      case "tgamma" => MathOps.tgamma(num(vs.head))
      case "remainder" => java.lang.Math.IEEEremainder(num(vs(0)), num(vs(1)))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(children = newChildren)
}
