package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Small basics of builtins/basic.md that have no Spark spelling:
  * Unwrap (null → runtime error), ByteAt (byte indexing over the
  * engine's byte-string columns), ToBytes/FromBytes (little-endian
  * primitive wire form). */
object BasicOps

/** Unwrap (basic.md#optional-ops): the value, raising a runtime error
  * when it is NULL; non-optional inputs pass through. */
final case class UnwrapExpr(child: Expression, message: String)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = false
  override def prettyName: String = "unwrap"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) throw new RuntimeException(
      if (message.nonEmpty) message else "Unwrap: value is NULL")
    v
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ByteAt (basic.md#byteat): the byte at a 0-based index of the
  * string's byte payload (YQL String IS bytes); NULL when out of
  * range. */
final case class ByteAtExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "byteat"

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case StringType | BinaryType => right.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ByteAt index must be integral, got ${other.simpleString}")
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"ByteAt expects a string, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s == null || i == null) return null
    val bytes = s match {
      case u: UTF8String => u.getBytes
      case b: Array[Byte] => b
    }
    val idx = i.asInstanceOf[Number].longValue()
    if (idx < 0 || idx >= bytes.length) null
    else bytes(idx.toInt) & 0xff
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ToBytes (basic.md#to-from-bytes): the little-endian binary image of
  * a primitive value (strings pass their payload through). */
final case class ToBytesExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "tobytes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | BooleanType | StringType | BinaryType | DateType |
         TimestampType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ToBytes expects a primitive, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    def le(x: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((x >>> (8 * i)) & 0xff).toByte)
    child.dataType match {
      case BooleanType => Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0)
      case ByteType => le(v.asInstanceOf[Byte].toLong, 1)
      case ShortType => le(v.asInstanceOf[Short].toLong, 2)
      case IntegerType | DateType => le(v.asInstanceOf[Int].toLong, 4)
      case LongType | TimestampType => le(v.asInstanceOf[Long], 8)
      case FloatType =>
        le(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]).toLong, 4)
      case DoubleType =>
        le(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 8)
      case StringType => v.asInstanceOf[UTF8String].getBytes
      case BinaryType => v
      case other => throw new IllegalStateException(other.simpleString)
    }
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** TestBit/SetBit/ClearBit/FlipBit (basic.md#bitops): bit surgery on
  * unsigned numbers; the result keeps the input's own type (computed
  * on the 64-bit image, narrowed back). */
final case class BitOpExpr(left: Expression, right: Expression, op: String)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType =
    if (op == "test") BooleanType else left.dataType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = op + "bit"

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      right.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"bit index must be integral, got ${other.simpleString}")
      }
    case other => TypeCheckResult.TypeCheckFailure(
      s"${prettyName} expects an integer, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    val i = right.eval(input)
    if (v == null || i == null) return null
    val x = v.asInstanceOf[Number].longValue()
    val bit = i.asInstanceOf[Number].intValue()
    val r = op match {
      case "test" => return ((x >>> bit) & 1L) == 1L
      case "set" => x | (1L << bit)
      case "clear" => x & ~(1L << bit)
      case "flip" => x ^ (1L << bit)
    }
    left.dataType match {
      case ByteType => r.toByte
      case ShortType => r.toShort
      case IntegerType => r.toInt
      case LongType => r
      case other => throw new IllegalStateException(other.simpleString)
    }
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** TypeOf (builtins/types.md#typeof): the argument's type — in this
  * engine a TYPE VALUE is its canonical YQL type text, so TypeOf is a
  * per-schema constant string. */
final case class TypeOfExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  private lazy val text: UTF8String = UTF8String.fromString(
    EnsureTypeExpr.print(child.dataType, child.nullable))

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  override def prettyName: String = "typeof"

  override def eval(input: InternalRow): Any = text
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** FromBytes (basic.md#to-from-bytes): parse the little-endian binary
  * image back into the named primitive type; NULL when the payload
  * length does not match. */
final case class FromBytesExpr(child: Expression, typeText: String)
  extends UnaryExpression with CodegenFallback {

  private lazy val target: DataType = EnsureTypeExpr.parse(typeText)

  override def dataType: DataType = target
  override def nullable: Boolean = true
  override def prettyName: String = "frombytes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => target match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | BooleanType | StringType | BinaryType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"FromBytes target must be primitive, got ${other.simpleString}")
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"FromBytes expects bytes, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val bytes = v match {
      case u: UTF8String => u.getBytes
      case b: Array[Byte] => b
    }
    def le(n: Int): Option[Long] =
      if (bytes.length != n) None
      else Some((0 until n).foldLeft(0L)((acc, i) =>
        acc | ((bytes(i) & 0xffL) << (8 * i))))
    target match {
      case BooleanType => if (bytes.length != 1) null else bytes(0) != 0
      case ByteType => le(1).map(_.toByte).orNull
      case ShortType => le(2).map(_.toShort).orNull
      case IntegerType => le(4).map(x => x.toInt: java.lang.Integer).orNull
      case LongType => le(8).map(x => x: java.lang.Long).orNull
      case FloatType => le(4)
        .map(x => java.lang.Float.intBitsToFloat(x.toInt): java.lang.Float)
        .orNull
      case DoubleType => le(8)
        .map(x => java.lang.Double.longBitsToDouble(x): java.lang.Double)
        .orNull
      case StringType => UTF8String.fromBytes(bytes)
      case BinaryType => bytes
      case other => throw new IllegalStateException(other.simpleString)
    }
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
