package graft.types

import org.apache.spark.sql.types._

/** The reference's logical-type system mapped onto Spark SQL types
  * (SURVEY.md §1.2).
  *
  * Wire types: EValueType (row_base.h:11) — Null, Int64, Uint64,
  * Double, Boolean, String, Any, Composite. Logical types: the
  * ELogicalMetatype tree (logical_type.h:24-44) over
  * ESimpleLogicalValueType (row_base.h:41-79).
  *
  * The mapping is a bijection up to the documented deviations:
  *   - Uint64 carries its 64 raw bits in LongType; unsigned semantics
  *     come from [[graft.functions.Uint64]] expressions (§7.4 #1).
  *   - String (non-utf8 binary) → BinaryType; Utf8 → StringType.
  *   - Any/Json → StringType holding JSON, accessed via the
  *     `get_*`/`try_get_*` family ([[graft.functions.QLFunctions]]).
  *   - Optional<T> at top level = nullable field; nested optionals
  *     wrap in a 1-field struct (`value`), mirroring how the reference
  *     distinguishes `#` from `[#]` (logical_type.h Optional).
  *   - Tagged is metadata-only and erases (DetagLogicalType,
  *     logical_type.h:140-141).
  *   - Variant<T...> → struct of a discriminant byte + one nullable
  *     field per alternative.
  */
object YtTypes {

  sealed trait YtType { def name: String }

  // ESimpleLogicalValueType (row_base.h:41-79)
  case object YtNull extends YtType { val name = "null" }
  case object YtInt8 extends YtType { val name = "int8" }
  case object YtInt16 extends YtType { val name = "int16" }
  case object YtInt32 extends YtType { val name = "int32" }
  case object YtInt64 extends YtType { val name = "int64" }
  case object YtUint8 extends YtType { val name = "uint8" }
  case object YtUint16 extends YtType { val name = "uint16" }
  case object YtUint32 extends YtType { val name = "uint32" }
  case object YtUint64 extends YtType { val name = "uint64" }
  case object YtFloat extends YtType { val name = "float" }
  case object YtDouble extends YtType { val name = "double" }
  case object YtBoolean extends YtType { val name = "boolean" }
  case object YtString extends YtType { val name = "string" }
  case object YtUtf8 extends YtType { val name = "utf8" }
  case object YtJson extends YtType { val name = "json" }
  case object YtAny extends YtType { val name = "any" }
  case object YtUuid extends YtType { val name = "uuid" }
  case object YtDate extends YtType { val name = "date" }
  case object YtDatetime extends YtType { val name = "datetime" }
  case object YtTimestamp extends YtType { val name = "timestamp" }
  case object YtInterval extends YtType { val name = "interval" }
  // ELogicalMetatype composites (logical_type.h:24-44)
  final case class YtOptional(inner: YtType) extends YtType { val name = "optional" }
  final case class YtList(elem: YtType) extends YtType { val name = "list" }
  final case class YtStructT(fields: Seq[(String, YtType)]) extends YtType { val name = "struct" }
  final case class YtTuple(elems: Seq[YtType]) extends YtType { val name = "tuple" }
  final case class YtDict(key: YtType, value: YtType) extends YtType { val name = "dict" }
  final case class YtDecimal(precision: Int, scale: Int) extends YtType { val name = "decimal" }
  final case class YtTagged(tag: String, inner: YtType) extends YtType { val name = "tagged" }
  final case class YtVariant(alts: Seq[(String, YtType)]) extends YtType { val name = "variant" }

  /** Marker in field metadata for semantic types Spark lacks natively. */
  val YtTypeKey = "yt.logicalType"
  /** Computed-column expression text (TColumnSchema::Expression) —
    * carried in field metadata so prepare-time analyses (explain's
    * key-prefix evaluability, schema.h:116-246) can see it. */
  val YtExprKey = "yt.expression"

  /** Field-metadata marker for key columns (TColumnSchema::SortOrder,
    * schema.h) — value "ascending"/"descending". Consumers: SelectRows'
    * allow_join_without_index prepare check, plan-contract asserts. */
  val YtSortOrderKey = "yt.sortOrder"

  /** YT logical type → Spark DataType (nullability handled by Optional
    * at the field level; nested Optional wraps). */
  def toSpark(t: YtType): DataType = t match {
    case YtNull => NullType
    case YtInt8 => ByteType
    case YtInt16 => ShortType
    case YtInt32 => IntegerType
    case YtInt64 => LongType
    case YtUint8 => ShortType // widen: JVM bytes are signed
    case YtUint16 => IntegerType
    case YtUint32 => LongType
    case YtUint64 => LongType // raw bits + unsigned expressions
    case YtFloat => FloatType
    case YtDouble => DoubleType
    case YtBoolean => BooleanType
    case YtString => BinaryType
    case YtUtf8 => StringType
    case YtJson => StringType
    case YtAny => StringType // canonical JSON encoding of YSON docs
    case YtUuid => StringType
    case YtDate => DateType
    case YtDatetime => TimestampType
    case YtTimestamp => TimestampType // µs precision both sides
    case YtInterval => DayTimeIntervalType()
    case YtOptional(inner) => toSpark(inner) // nullability at field level
    case YtList(e) => ArrayType(toSpark(e), containsNullable(e))
    case YtStructT(fs) => StructType(fs.map { case (n, ft) =>
      StructField(n, toSpark(ft), nullable = containsNullable(ft)) })
    case YtTuple(es) => StructType(es.zipWithIndex.map { case (e, i) =>
      StructField(s"_${i + 1}", toSpark(e), nullable = containsNullable(e)) })
    case YtDict(k, v) => MapType(toSpark(k), toSpark(v), containsNullable(v))
    case YtDecimal(p, s) => DecimalType(p, s)
    case YtTagged(_, inner) => toSpark(inner) // erased for compute
    case YtVariant(alts) => StructType(
      StructField("tag", ByteType, nullable = false) +:
        alts.map { case (n, at) => StructField(n, toSpark(at), nullable = true) })
  }

  def containsNullable(t: YtType): Boolean = t match {
    case YtOptional(_) | YtNull => true
    case YtTagged(_, inner) => containsNullable(inner)
    case _ => false
  }

  /** Spark DataType → YT logical type (the reverse direction used when
    * exporting our schemas; nullable fields become Optional). */
  def fromSpark(dt: DataType, nullable: Boolean = false): YtType = {
    val base = dt match {
      case NullType => YtNull
      case ByteType => YtInt8
      case ShortType => YtInt16
      case IntegerType => YtInt32
      case LongType => YtInt64
      case FloatType => YtFloat
      case DoubleType => YtDouble
      case BooleanType => YtBoolean
      case BinaryType => YtString
      case StringType => YtUtf8
      case DateType => YtDate
      case TimestampType => YtTimestamp
      case _: DayTimeIntervalType => YtInterval
      case d: DecimalType => YtDecimal(d.precision, d.scale)
      case ArrayType(e, n) => YtList(maybeOpt(fromSpark(e), n))
      case MapType(k, v, n) => YtDict(fromSpark(k), maybeOpt(fromSpark(v), n))
      case StructType(fs) => YtStructT(fs.toSeq.map(f =>
        f.name -> maybeOpt(fromSpark(f.dataType), f.nullable)))
      case other => throw new IllegalArgumentException(s"no YT mapping for $other")
    }
    maybeOpt(base, nullable)
  }

  private def maybeOpt(t: YtType, nullable: Boolean): YtType =
    if (nullable && !t.isInstanceOf[YtOptional] && t != YtNull) YtOptional(t) else t

  /** Table schema model (§1.3): strict flag, unique keys, per-column
    * sort order and aggregate function — TTableSchema/TColumnSchema
    * (schema.h:116-246). */
  final case class YtColumn(
      name: String,
      ytType: YtType,
      sortOrder: Option[String] = None, // ascending | descending
      expression: Option[String] = None, // computed column
      aggregate: Option[String] = None, // sum | min | max | first
      required: Boolean = false)

  final case class YtSchema(
      columns: Seq[YtColumn],
      strict: Boolean = true,
      uniqueKeys: Boolean = false) {

    def keyColumns: Seq[YtColumn] = columns.filter(_.sortOrder.isDefined)

    def toStructType: StructType = StructType(columns.map { c =>
      val mb = new MetadataBuilder().putString(YtTypeKey, c.ytType.name)
      c.sortOrder.foreach(mb.putString(YtSortOrderKey, _))
      c.expression.foreach(mb.putString(YtExprKey, _))
      StructField(c.name, toSpark(c.ytType),
        nullable = !c.required,
        metadata = mb.build())
    })
  }

  /** Per-row data weight — GetDataWeight
    * (client/table_client/unversioned_row.h:189-222, .cpp:530): 1 per
    * row, plus per non-null value: fixed-width numerics 8, boolean 1,
    * string-likes their byte length. Composite/Any columns weigh their
    * serialized carrier (JSON here vs YSON there — same role, different
    * byte counts). Feeds the TQueryStatistics.DataWeightRead surface
    * (ql_query_ut.cpp DataWeightRead): `df.agg(sum(dataWeight(df)))`
    * over the scanned rows is the statistic.
    */
  def dataWeight(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val per = df.schema.fields.toSeq.map { f =>
      val c = df.col("`" + f.name.replace("`", "``") + "`")
      val w = f.dataType match {
        case StringType => octet_length(c).cast("long")
        case BinaryType => length(c).cast("long")
        case BooleanType => lit(1L)
        case ByteType | ShortType | IntegerType | LongType | FloatType |
             DoubleType | TimestampType | DateType => lit(8L)
        case _: DecimalType => lit(8L)
        case _ => octet_length(to_json(c)).cast("long") // composite carrier
      }
      when(c.isNull, lit(0L)).otherwise(w)
    }
    per.reduceOption(_ + _).map(_ + lit(1L)).getOrElse(lit(1L))
  }
}
