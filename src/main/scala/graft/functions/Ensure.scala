package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.types._

import graft.types.YtTypes

/** `EnsureType` / `EnsureConvertibleTo` (reference
  * yql/essentials/sql/v1/builtin.cpp:3005-3006 TYqlTypeAssert; docs
  * yt/docs/en/yql/builtins/basic.md "Ensure..."): assert at ANALYSIS
  * time that the expression's type exactly matches (strict) or is
  * implicitly convertible to (lenient) the named type, then pass the
  * value through untouched — zero runtime cost, the check lives in
  * `checkInputDataTypes` and the codegen is the child's.
  *
  * The type argument is YQL type text (`Uint64`, `Optional<Utf8>`,
  * `List<Int64>`, ...) resolved through the engine's type bijection
  * (types/YtTypes.scala) — Uint64/Int64 both map to LongType there, so
  * strict matching is up to that documented erasure.
  */
final case class EnsureTypeExpr(
    child: Expression,
    typeText: String,
    strict: Boolean,
    message: Option[String]) extends UnaryExpression {

  private lazy val expected: DataType = EnsureTypeExpr.parse(typeText)
  private def fn = if (strict) "EnsureType" else "EnsureConvertibleTo"

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = fn.toLowerCase

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok =
      // .sql ignores nullability — the right equivalence here, since
      // Optional<> nullability lives at the field level in this engine
      if (strict) child.dataType.sql == expected.sql
      else Cast.canCast(child.dataType, expected)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(message.getOrElse(
      s"$fn: expression type ${child.dataType.simpleString} " +
        (if (strict) "does not match " else "is not convertible to ") +
        typeText))
  }

  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EnsureTypeExpr {
  import YtTypes._

  /** Split on commas outside nested `<>` depth. */
  private[functions] def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var d = 0; var start = 0; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '<' => d += 1
        case '>' => d -= 1
        case ',' if d == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq.map(_.trim)
  }

  /** YQL type text → Spark DataType (subset: simple types +
    * Optional/List/Dict composites; Spark DDL accepted as a
    * fallback spelling). */
  def parse(text0: String): DataType = {
    val text = text0.trim
    val lower = text.toLowerCase
    def inner(prefix: String): String = {
      require(lower.endsWith(">"), s"malformed type: $text0")
      text.substring(prefix.length, text.length - 1)
    }
    val simple: Map[String, YtType] = Map(
      "bool" -> YtBoolean, "boolean" -> YtBoolean,
      "int8" -> YtInt8, "int16" -> YtInt16, "int32" -> YtInt32,
      "int64" -> YtInt64, "uint8" -> YtUint8, "uint16" -> YtUint16,
      "uint32" -> YtUint32, "uint64" -> YtUint64,
      "float" -> YtFloat, "double" -> YtDouble,
      "string" -> YtString, "utf8" -> YtUtf8, "json" -> YtJson,
      "uuid" -> YtUuid, "date" -> YtDate, "datetime" -> YtDatetime,
      "timestamp" -> YtTimestamp, "interval" -> YtInterval)
    if (simple.contains(lower)) toSpark(simple(lower))
    // the `T?` optional suffix spelling (types/type_string.md)
    else if (lower.endsWith("?")) parse(text.dropRight(1))
    else if (lower.startsWith("optional<")) parse(inner("Optional<"))
    else if (lower.startsWith("list<"))
      ArrayType(parse(inner("List<")), containsNull = true)
    else if (lower.startsWith("dict<")) {
      val parts = splitTop(inner("Dict<"))
      require(parts.length == 2, s"malformed Dict type: $text0")
      MapType(parse(parts(0)), parse(parts(1)), valueContainsNull = true)
    } else if (lower.startsWith("variant<")) {
      // Variant over struct (name: T pairs) or tuple (positional) —
      // the engine's shape is a __tag discriminator plus one nullable
      // member per alternative
      val parts = splitTop(inner("Variant<"))
      val named = parts.forall(_.contains(":"))
      val fields = if (named) parts.map { p =>
        val i = p.indexOf(':')
        StructField(p.substring(0, i).trim, parse(p.substring(i + 1)))
      } else parts.zipWithIndex.map { case (t, i) =>
        StructField(s"_${i + 1}", parse(t)) }
      StructType(StructField("__tag", toSpark(YtUtf8), nullable = false) +:
        fields)
    } else if (lower.startsWith("enum<")) {
      // enum values are their tag strings in this engine
      toSpark(YtUtf8)
    } else if (lower.startsWith("tagged<")) {
      // Tagged<T, tag>: the tag is type-level metadata the engine's
      // bijection erases — the physical type is T
      val parts = splitTop(inner("Tagged<"))
      require(parts.length == 2, s"malformed Tagged type: $text0")
      parse(parts(0))
    } else if (lower.startsWith("tuple<")) {
      // YQL tuples are the engine's canonical _1.._n positional structs
      val parts = splitTop(inner("Tuple<"))
      StructType(parts.zipWithIndex.map { case (t, i) =>
        StructField(s"_${i + 1}", parse(t)) })
    } else if (lower.startsWith("struct<") && text.contains(":")) {
      val parts = splitTop(inner("Struct<"))
      StructType(parts.map { p =>
        val i = p.indexOf(':')
        require(i > 0, s"malformed Struct member: $p")
        StructField(p.substring(0, i).trim, parse(p.substring(i + 1)))
      })
    } else
      try DataType.fromDDL(text)
      catch { case _: Exception => throw new IllegalArgumentException(
        s"unknown type in EnsureType/EnsureConvertibleTo: $text0") }
  }

  /** The canonical YQL type TEXT of a Spark type — the inverse of
    * [[parse]] up to the engine's documented erasures (unsigned widths
    * collapse onto the signed Spark integrals, String prints for
    * BinaryType, Utf8 for StringType). Tuples (the canonical `_1.._n`
    * positional structs) print as Tuple<...>; variant-shaped structs
    * (leading `__tag`) print as Variant<...>. */
  def print(dt: DataType, nullable: Boolean = false): String = {
    val base = dt match {
      case org.apache.spark.sql.types.NullType => "Null"
      case org.apache.spark.sql.types.ByteType => "Int8"
      case org.apache.spark.sql.types.ShortType => "Int16"
      case org.apache.spark.sql.types.IntegerType => "Int32"
      case org.apache.spark.sql.types.LongType => "Int64"
      case org.apache.spark.sql.types.FloatType => "Float"
      case org.apache.spark.sql.types.DoubleType => "Double"
      case org.apache.spark.sql.types.BooleanType => "Bool"
      case org.apache.spark.sql.types.BinaryType => "String"
      case org.apache.spark.sql.types.StringType => "Utf8"
      case org.apache.spark.sql.types.DateType => "Date"
      case org.apache.spark.sql.types.TimestampType => "Timestamp"
      case _: org.apache.spark.sql.types.DayTimeIntervalType => "Interval"
      case d: org.apache.spark.sql.types.DecimalType =>
        s"Decimal(${d.precision},${d.scale})"
      case ArrayType(e, n) => s"List<${print(e, n)}>"
      case org.apache.spark.sql.types.MapType(k, v, n) =>
        s"Dict<${print(k)},${print(v, n)}>"
      case s: StructType
          if s.fields.nonEmpty && s.fieldNames.head == "__tag" =>
        "Variant<" + s.fields.tail.map(f =>
          s"${f.name}:${print(f.dataType)}").mkString(",") + ">"
      case s: StructType if s.fields.nonEmpty &&
          s.fieldNames.zipWithIndex.forall { case (n, i) => n == s"_${i + 1}" } =>
        "Tuple<" + s.fields.map(f =>
          print(f.dataType, f.nullable)).mkString(",") + ">"
      case s: StructType =>
        "Struct<" + s.fields.map(f =>
          s"${f.name}:${print(f.dataType, f.nullable)}").mkString(",") + ">"
      case other => other.sql
    }
    if (nullable && base != "Null") s"Optional<$base>" else base
  }
}
