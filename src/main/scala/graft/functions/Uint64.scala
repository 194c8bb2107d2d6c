package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.{shims => ExpressionUtils}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Uint64 semantics over LongType (SURVEY.md §7.4 hard part #1).
  *
  * The reference's uint64 wire type (row_base.h EValueType::Uint64) has
  * no JVM/Spark counterpart; we carry the 64 raw bits in a LongType and
  * give the operations unsigned meaning:
  *   - ordering: flip the sign bit, then signed compare — a pure
  *     built-in-expression rewrite, fully codegen'd;
  *   - div/mod: native Catalyst expressions emitting
  *     Long.divideUnsigned/remainderUnsigned in codegen;
  *   - to/from string: Long.toUnsignedString / parseUnsignedLong.
  *
  * add/subtract/multiply wrap identically for signed and unsigned 2's
  * complement, so built-in arithmetic is already correct (use
  * `u64_add`-style wrappers to escape ANSI overflow checks).
  */
object Uint64 {
  private val signBit = lit(Long.MinValue)

  /** Biased view: unsigned order of x equals signed order of x^MIN. */
  private def biased(c: Column): Column = c.bitwiseXOR(signBit)

  def u64_lt(a: Column, b: Column): Column = biased(a) < biased(b)
  def u64_leq(a: Column, b: Column): Column = biased(a) <= biased(b)
  def u64_gt(a: Column, b: Column): Column = biased(a) > biased(b)
  def u64_geq(a: Column, b: Column): Column = biased(a) >= biased(b)
  def u64_min(a: Column, b: Column): Column = when(u64_lt(a, b), a).otherwise(b)
  def u64_max(a: Column, b: Column): Column = when(u64_gt(a, b), a).otherwise(b)

  /** Sort key giving unsigned order under an ordinary ascending sort. */
  def u64_sort(a: Column): Column = biased(a)

  /** Unsigned aggregate MIN/MAX: bias, fold with the native aggregate,
    * unbias — map-side partials and codegen come free. */
  def u64_agg_min(a: Column): Column =
    org.apache.spark.sql.functions.min(biased(a)).bitwiseXOR(signBit)
  def u64_agg_max(a: Column): Column =
    org.apache.spark.sql.functions.max(biased(a)).bitwiseXOR(signBit)

  /** Unsigned SUM wraps mod 2^64 — two's-complement addition already
    * does; fold with LEGACY eval so ANSI overflow checks don't fire on
    * the signed view. */
  def u64_sum(a: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.aggregate.Sum(expr(a),
        org.apache.spark.sql.catalyst.expressions.NumericEvalContext(
          org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))
        .toAggregateExpression())

  def u64_div(a: Column, b: Column): Column =
    ExpressionUtils.column(UnsignedDivide(expr(a), expr(b)))
  def u64_mod(a: Column, b: Column): Column =
    ExpressionUtils.column(UnsignedRemainder(expr(a), expr(b)))

  def u64_to_string(a: Column): Column =
    ExpressionUtils.column(UnsignedToString(expr(a)))
  def parse_u64(a: Column): Column =
    ExpressionUtils.column(ParseUnsigned(expr(a)))

  private def expr(c: Column): Expression = ExpressionUtils.expression(c)
}

/** QL `/`: integer division on integral operands, float division on
  * doubles (cg_fragment_compiler.cpp lowers EBinaryOp::Divide per
  * operand type; Spark's ANSI `/` always returns double, so the QL
  * surface routes through this expression). Zero divisor on the
  * integral path throws, like QL (cg_routines.cpp
  * ThrowQueryException).
  */
case class QlDivide(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types._
  private def isIntegral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }
  private def isNumeric(dt: DataType): Boolean =
    isIntegral(dt) || dt == DoubleType || dt == FloatType
  private lazy val integral: Boolean =
    isIntegral(left.dataType) && isIntegral(right.dataType)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (isNumeric(left.dataType) && isNumeric(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ql_div expects numeric operands, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType =
    if (integral) LongType else DoubleType
  private def toL(v: Any): Long = v match {
    case x: Long => x; case x: Int => x.toLong
    case x: Short => x.toLong; case x: Byte => x.toLong
  }
  private def toD(v: Any): Double = v match {
    case x: Double => x; case x: Float => x.toDouble
    case x: Long => x.toDouble; case x: Int => x.toDouble
    case x: Short => x.toDouble; case x: Byte => x.toDouble
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    if (integral) QlDivide.divChecked(toL(a), toL(b)) else toD(a) / toD(b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      if (integral)
        s"${ev.value} = graft.functions.QlDivide.divChecked((long) $a, (long) $b);"
      else s"${ev.value} = (double) $a / (double) $b;")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object QlDivide {
  /** Java long division wraps INT_MIN/-1 silently; QL raises
    * (cg_routines.cpp: "Division of INT_MIN by -1"). */
  def divChecked(a: Long, b: Long): Long = {
    if (b == 0L) // reference error text (cg_routines.cpp ThrowQueryException)
      throw new ArithmeticException("Division by zero")
    if (a == Long.MinValue && b == -1L)
      throw new ArithmeticException("Division of INT_MIN by -1")
    a / b
  }
  def modChecked(a: Long, b: Long): Long = {
    if (b == 0L)
      throw new ArithmeticException("Division by zero")
    if (a == Long.MinValue && b == -1L)
      throw new ArithmeticException("Division of INT_MIN by -1")
    a % b
  }
}

/** QL `%`: integral remainder with the reference's error surface
  * (zero divisor and INT_MIN % -1 raise); double remainder for
  * floating operands. */
case class QlModulo(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types._
  private def isIntegral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }
  private def isNumeric(dt: DataType): Boolean =
    isIntegral(dt) || dt == DoubleType || dt == FloatType
  private lazy val integral: Boolean =
    isIntegral(left.dataType) && isIntegral(right.dataType)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (isNumeric(left.dataType) && isNumeric(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ql_mod expects numeric operands, got ${left.dataType} % ${right.dataType}")
  override def dataType: DataType =
    if (integral) LongType else DoubleType
  private def toL(v: Any): Long = v match {
    case x: Long => x; case x: Int => x.toLong
    case x: Short => x.toLong; case x: Byte => x.toLong
  }
  private def toD(v: Any): Double = v match {
    case x: Double => x; case x: Float => x.toDouble
    case x: Long => x.toDouble; case x: Int => x.toDouble
    case x: Short => x.toDouble; case x: Byte => x.toDouble
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    if (integral) QlDivide.modChecked(toL(a), toL(b)) else toD(a) % toD(b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      if (integral)
        s"${ev.value} = graft.functions.QlDivide.modChecked((long) $a, (long) $b);"
      else s"${ev.value} = (double) $a % (double) $b;")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Long.divideUnsigned as a codegen'd expression; throws on zero
  * divisor like QL does (cg_routines.cpp ThrowQueryException on
  * division by zero).
  */
case class UnsignedDivide(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def inputTypes = Seq(LongType, LongType)
  override def nullSafeEval(a: Any, b: Any): Any =
    UnsignedDivide.divU(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.UnsignedDivide.divU($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object UnsignedDivide {
  def divU(a: Long, b: Long): Long = {
    if (b == 0L) throw new ArithmeticException("Division by zero")
    java.lang.Long.divideUnsigned(a, b)
  }
  def remU(a: Long, b: Long): Long = {
    if (b == 0L) throw new ArithmeticException("Division by zero")
    java.lang.Long.remainderUnsigned(a, b)
  }
}

case class UnsignedRemainder(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def inputTypes = Seq(LongType, LongType)
  override def nullSafeEval(a: Any, b: Any): Any =
    UnsignedDivide.remU(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.UnsignedDivide.remU($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class UnsignedToString(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.lang.Long.toUnsignedString(v.asInstanceOf[Long]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.lang.Long.toUnsignedString($a));")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class ParseUnsigned(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    java.lang.Long.parseUnsignedLong(v.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = java.lang.Long.parseUnsignedLong($a.toString());")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
