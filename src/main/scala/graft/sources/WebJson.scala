package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.types.YtTypes
import graft.types.YtTypes._

/** WebJson (EFormatType::WebJson) — the web-UI result envelope, both
  * value formats of the reference's writer
  * (yt/yt/library/formats/web_json_writer.cpp):
  *
  *   - `schemaless`: values as `{"$type": t, "$value": "..."}` maps
  *     with string truncation flagged `"$incomplete": true`.
  *   - `yql`: values as `[encoded, "typeIndex"]` pairs against a
  *     `yql_type_registry` of YQL type trees (`["DataType";"Int64"]`,
  *     `["OptionalType", ...]`, web_json_writer.cpp SerializeAsYqlType)
  *     with the YQL JSON value encoding (yql_yson_converter.cpp):
  *     ints/doubles stringified, booleans plain, optionals
  *     list-wrapped, strings weight-limited into `{"val":...,
  *     "inc":true}` wrappers, non-UTF8 bytes base64 with `"b64":true`,
  *     lists/dicts `{"val": [...]}`, structs/tuples plain lists, Any
  *     carriers re-annotated `{"$type": ..., "$value": ...}` trees
  *     under a forced `val` map.
  *
  * Both share the envelope: a row list, `incomplete_columns` (a column
  * was rejected by the `column_names` filter or the selected-column
  * cap), `incomplete_all_column_names` (the distinct-name cap
  * overflowed), and lexicographically sorted `all_column_names`
  * (web_json_writer.cpp DoClose).
  *
  * This is a UI handoff format over an already-LIMITed result: the
  * driver-side materialization is bounded by `maxRows` exactly like
  * the reference's row caps — format choice never feeds a full scan
  * to a UI page, the plan's LIMIT is pushed to the scan.
  */
object WebJson {

  /** TWebJsonFormatConfig (client/formats/config.cpp:321-338 defaults). */
  final case class Config(
      maxSelectedColumnCount: Int = 50,
      fieldWeightLimit: Int = 1024,
      stringWeightLimit: Int = 200,
      maxAllColumnNamesCount: Int = 2000,
      columnNames: Option[Seq[String]] = None,
      maxRows: Int = 1000)

  private def jsonEscape(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  /** The logical type of a field: the `yt.logicalType` metadata tag
    * wins (uint64 raw-bits longs, `any` JSON carriers, timestamps kept
    * as integers), else the structural Spark mapping. */
  private def fieldYtType(f: StructField): YtType = {
    val tagged =
      if (f.metadata.contains(YtTypeKey)) f.metadata.getString(YtTypeKey) match {
        case "uint64" => Some(YtUint64)
        case "any" => Some(YtAny)
        case "timestamp" => Some(YtTimestamp)
        case "datetime" => Some(YtDatetime)
        case "date" => Some(YtDate)
        case "interval" => Some(YtInterval)
        case "string" => Some(YtString)
        case _ => None
      } else None
    tagged match {
      case Some(t) => if (f.nullable) YtOptional(t) else t
      case None => YtTypes.fromSpark(f.dataType, f.nullable)
    }
  }

  /** Column selection per TWebJsonColumnFilter: an explicit name set,
    * or the first `maxSelectedColumnCount` columns. Returns (selected
    * field indices, incompleteColumns). */
  private def selectColumns(schema: StructType, cfg: Config): (Array[Int], Boolean) = {
    cfg.columnNames match {
      case Some(names) =>
        val set = names.toSet
        require(set.size == names.size,
          "Duplicate column name in \"column_names\" parameter of web_json format config")
        val sel = schema.fields.zipWithIndex.collect {
          case (f, i) if set(f.name) => i }
        (sel, sel.length < schema.fields.length)
      case None =>
        val sel = schema.fields.indices.take(cfg.maxSelectedColumnCount).toArray
        (sel, sel.length < schema.fields.length)
    }
  }

  /** Envelope tail shared by both formats: incomplete flags + sorted
    * all_column_names (DoClose). */
  private def writeEnvelopeTail(
      sb: java.lang.StringBuilder, schema: StructType, cfg: Config,
      incompleteColumns: Boolean): Unit = {
    val all = schema.fields.map(_.name).take(cfg.maxAllColumnNamesCount).sorted
    val incompleteAll = schema.fields.length > cfg.maxAllColumnNamesCount
    sb.append("],\"incomplete_columns\":\"").append(incompleteColumns).append('"')
    sb.append(",\"incomplete_all_column_names\":\"").append(incompleteAll).append('"')
    sb.append(",\"all_column_names\":[")
    all.zipWithIndex.foreach { case (n, i) =>
      if (i > 0) sb.append(','); jsonEscape(sb, n)
    }
    sb.append(']')
  }

  // --------------------------------------------------------------------
  // schemaless value format

  def schemaless(df: DataFrame, cfg: Config = Config()): String = {
    val schema = df.schema
    val (sel, incompleteCols) = selectColumns(schema, cfg)
    // $type names are EValueType names (the schemaless writer sees
    // physical values): optional erases, utf8 prints as string
    val ytNames = sel.map { i =>
      val base = fieldYtType(schema.fields(i)) match {
        case YtOptional(inner) => inner
        case t => t
      }
      base match {
        case YtUtf8 => "string"
        case t @ (YtList(_) | YtStructT(_) | YtTuple(_) | YtDict(_, _)) => "any"
        case t => t.name
      }
    }
    val rows = df.limit(cfg.maxRows).collect()
    val sb = new java.lang.StringBuilder()
    sb.append("{\"rows\":[")
    rows.zipWithIndex.foreach { case (r, ri) =>
      if (ri > 0) sb.append(',')
      sb.append('{')
      sel.zipWithIndex.foreach { case (fi, si) =>
        val f = schema.fields(fi)
        if (si > 0) sb.append(',')
        jsonEscape(sb, f.name); sb.append(':')
        if (r.isNullAt(fi)) sb.append("null") // entity
        else {
          val full = r.get(fi).toString
          val truncated = full.length > cfg.fieldWeightLimit
          sb.append("{\"$type\":"); jsonEscape(sb, ytNames(si))
          if (truncated) sb.append(",\"$incomplete\":true")
          sb.append(",\"$value\":")
          jsonEscape(sb, if (truncated) full.take(cfg.fieldWeightLimit) else full)
          sb.append('}')
        }
      }
      sb.append('}')
    }
    writeEnvelopeTail(sb, schema, cfg, incompleteCols)
    sb.append('}')
    sb.toString
  }

  // --------------------------------------------------------------------
  // yql value format

  /** SerializeAsYqlType (web_json_writer.cpp:168-280): a YQL type tree
    * as a JSON list. */
  private[sources] def yqlTypeJson(t: YtType): String = t match {
    case YtNull => """["NullType"]"""
    case YtOptional(inner) => s"""["OptionalType",${yqlTypeJson(inner)}]"""
    case YtList(e) => s"""["ListType",${yqlTypeJson(e)}]"""
    case YtStructT(fs) =>
      fs.map { case (n, ft) => s"""["${n}",${yqlTypeJson(ft)}]""" }
        .mkString("""["StructType",[""", ",", "]]")
    case YtTuple(es) =>
      es.map(yqlTypeJson).mkString("""["TupleType",[""", ",", "]]")
    case YtDict(k, v) => s"""["DictType",${yqlTypeJson(k)},${yqlTypeJson(v)}]"""
    case YtDecimal(p, s) => s"""["DataType","Decimal","$p","$s"]"""
    case YtTagged(tag, inner) => s"""["TaggedType","$tag",${yqlTypeJson(inner)}]"""
    case YtVariant(alts) =>
      alts.map { case (n, ft) => s"""["${n}",${yqlTypeJson(ft)}]""" }
        .mkString("""["VariantType",["StructType",[""", ",", "]]]")
    case simple => s"""["DataType","${simpleYqlName(simple)}"]"""
  }

  /** GetSimpleYqlTypeName (web_json_writer.cpp:110-166). */
  private def simpleYqlName(t: YtType): String = t match {
    case YtInt8 => "Int8"; case YtInt16 => "Int16"
    case YtInt32 => "Int32"; case YtInt64 => "Int64"
    case YtUint8 => "Uint8"; case YtUint16 => "Uint16"
    case YtUint32 => "Uint32"; case YtUint64 => "Uint64"
    case YtFloat => "Float"; case YtDouble => "Double"
    case YtBoolean => "Boolean"; case YtString => "String"
    case YtUtf8 => "Utf8"; case YtAny => "Yson"; case YtJson => "Json"
    case YtDate => "Date"; case YtDatetime => "Datetime"
    case YtTimestamp => "Timestamp"; case YtInterval => "Interval"
    case YtUuid => "Uuid"
    case other => throw new IllegalArgumentException(s"not a simple type: $other")
  }

  /** ::FloatToString PREC_AUTO: shortest decimal, no trailing ".0",
    * C-style specials. */
  private def floatToString(d: Double): String =
    if (d.isNaN) "nan"
    else if (d == Double.PositiveInfinity) "inf"
    else if (d == Double.NegativeInfinity) "-inf"
    else {
      val s = d.toString
      if (s.endsWith(".0")) s.dropRight(2) else s
    }

  private val B64 = java.util.Base64.getEncoder

  /** TYqlJsonWriter.OnStringScalarWeightLimited: UTF-8 strings
    * truncate into a {"val":...,"inc":true} wrapper past the limit. */
  private def yqlString(sb: java.lang.StringBuilder, s: String, limit: Int): Unit = {
    if (s.length <= limit) jsonEscape(sb, s)
    else {
      sb.append("{\"val\":")
      jsonEscape(sb, s.take(limit))
      sb.append(",\"inc\":true}")
    }
  }

  /** Non-UTF8 bytes: always base64 (`b64` marker), truncated to the
    * 3-bytes-per-4-chars budget when over the limit. */
  private def yqlBytes(sb: java.lang.StringBuilder, b: Array[Byte], limit: Int): Unit = {
    val maxEncoded = (b.length + 2) / 3 * 4
    val (bytes, inc) =
      if (maxEncoded > limit) {
        val truncatedLen = math.max(0, (limit - 1) / 4 * 3)
        (b.take(truncatedLen), truncatedLen < b.length)
      } else (b, false)
    sb.append("{\"val\":\"").append(B64.encodeToString(bytes)).append('"')
    if (inc) sb.append(",\"inc\":true")
    sb.append(",\"b64\":true}")
  }

  /** The JSON format's AnnotateWithTypes+Stringify encoding of an Any
    * carrier (our canonical-JSON text): scalars become
    * {"$type": t, "$value": "..."} maps, containers recurse. */
  private def annotateAny(sb: java.lang.StringBuilder,
      node: com.fasterxml.jackson.databind.JsonNode): Unit = {
    import com.fasterxml.jackson.databind.JsonNode
    if (node.isNull) sb.append("null")
    else if (node.isObject) {
      sb.append('{')
      val it = node.fields()
      var first = true
      while (it.hasNext) {
        val e = it.next()
        if (!first) sb.append(',')
        first = false
        jsonEscape(sb, e.getKey); sb.append(':')
        annotateAny(sb, e.getValue)
      }
      sb.append('}')
    } else if (node.isArray) {
      sb.append('[')
      var i = 0
      while (i < node.size()) {
        if (i > 0) sb.append(',')
        annotateAny(sb, node.get(i))
        i += 1
      }
      sb.append(']')
    } else {
      val (t, v) =
        if (node.isBoolean) ("boolean", node.asBoolean.toString)
        else if (node.isIntegralNumber) ("int64", node.asText)
        else if (node.isFloatingPointNumber) ("double", floatToString(node.asDouble))
        else ("string", node.asText)
      sb.append("{\"$type\":\"").append(t).append("\",\"$value\":")
      jsonEscape(sb, v)
      sb.append('}')
    }
  }

  private lazy val jackson = new com.fasterxml.jackson.databind.ObjectMapper()

  /** One YQL-encoded value (yql_yson_converter.cpp converters). */
  private def yqlValue(sb: java.lang.StringBuilder, v: Any, t: YtType,
      cfg: Config): Unit = t match {
    case YtOptional(inner) =>
      if (v == null) sb.append("null")
      else { sb.append('['); yqlValue(sb, v, inner, cfg); sb.append(']') }
    case YtNull => sb.append("null")
    case YtUint64 =>
      sb.append('"').append(java.lang.Long.toUnsignedString(v.asInstanceOf[Long]))
        .append('"')
    case YtInt8 | YtInt16 | YtInt32 | YtInt64 | YtUint8 | YtUint16 | YtUint32 |
        YtInterval =>
      sb.append('"').append(v.toString).append('"')
    case YtFloat | YtDouble =>
      sb.append('"').append(floatToString(v match {
        case f: Float => f.toDouble
        case d: Double => d
        case other => other.toString.toDouble
      })).append('"')
    case YtBoolean => sb.append(v.toString)
    case YtUtf8 | YtJson | YtUuid =>
      yqlString(sb, v.toString, math.min(cfg.stringWeightLimit, cfg.fieldWeightLimit))
    case YtString => v match {
      case b: Array[Byte] => yqlBytes(sb, b, math.min(cfg.stringWeightLimit, cfg.fieldWeightLimit))
      case s => yqlString(sb, s.toString, math.min(cfg.stringWeightLimit, cfg.fieldWeightLimit))
    }
    case YtDate =>
      sb.append('"').append(v match {
        case d: java.sql.Date => d.toLocalDate.toEpochDay.toString
        case d: java.time.LocalDate => d.toEpochDay.toString
        case n => n.toString
      }).append('"')
    case YtDatetime =>
      sb.append('"').append(v match {
        case ts: java.sql.Timestamp => (ts.getTime / 1000L).toString
        case i: java.time.Instant => i.getEpochSecond.toString
        case n => n.toString
      }).append('"')
    case YtTimestamp =>
      sb.append('"').append(v match {
        case ts: java.sql.Timestamp =>
          (ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L).toString
        case i: java.time.Instant =>
          (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
        case n => n.toString // raw integer carrier (uint64 microseconds)
      }).append('"')
    case YtAny =>
      // {"val": <annotated tree>} under a forced map
      // (TYqlJsonWriter.TransferYsonWeightLimited); oversized carriers
      // collapse to an incomplete empty string
      val carrier = v.toString
      if (carrier.length > cfg.fieldWeightLimit)
        sb.append("{\"val\":\"\",\"inc\":true}")
      else {
        sb.append("{\"val\":")
        annotateAny(sb, jackson.readTree(carrier))
        sb.append('}')
      }
    case YtList(e) =>
      val items = v match {
        case s: scala.collection.Seq[_] => s
        case a: Array[_] => a.toSeq
      }
      sb.append("{\"val\":[")
      items.zipWithIndex.foreach { case (item, i) =>
        if (i > 0) sb.append(',')
        yqlValue(sb, item, e, cfg)
      }
      sb.append("]}")
    case YtStructT(fs) =>
      val row = v.asInstanceOf[Row]
      sb.append('[')
      fs.zipWithIndex.foreach { case ((_, ft), i) =>
        if (i > 0) sb.append(',')
        yqlValue(sb, if (row.isNullAt(i)) null else row.get(i), ft, cfg)
      }
      sb.append(']')
    case YtTuple(es) =>
      val row = v.asInstanceOf[Row]
      sb.append('[')
      es.zipWithIndex.foreach { case (et, i) =>
        if (i > 0) sb.append(',')
        yqlValue(sb, if (row.isNullAt(i)) null else row.get(i), et, cfg)
      }
      sb.append(']')
    case YtDict(k, vt) =>
      // dict = list<tuple<key, value>> (yql_yson_converter.cpp:616)
      val m = v.asInstanceOf[scala.collection.Map[_, _]]
      sb.append("{\"val\":[")
      m.toSeq.zipWithIndex.foreach { case ((mk, mv), i) =>
        if (i > 0) sb.append(',')
        sb.append('[')
        yqlValue(sb, mk, k, cfg)
        sb.append(',')
        yqlValue(sb, mv, vt, cfg)
        sb.append(']')
      }
      sb.append("]}")
    case YtDecimal(p, s) =>
      yqlString(sb, v.toString, cfg.fieldWeightLimit)
    case YtTagged(_, inner) => yqlValue(sb, v, inner, cfg)
    case YtVariant(_) =>
      throw new IllegalArgumentException("variant values not supported in web_json yql format")
  }

  /** The yql value-format writer: rows of `[value, "typeIndex"]` pairs
    * plus the `yql_type_registry` (TYqlValueWriter.WriteValue /
    * WriteMetaInfo). */
  def yql(df: DataFrame, cfg: Config = Config()): String = {
    val schema = df.schema
    val (sel, incompleteCols) = selectColumns(schema, cfg)
    val types = sel.map(i => fieldYtType(schema.fields(i)))
    val rows = df.limit(cfg.maxRows).collect()
    val sb = new java.lang.StringBuilder()
    sb.append("{\"rows\":[")
    rows.zipWithIndex.foreach { case (r, ri) =>
      if (ri > 0) sb.append(',')
      sb.append('{')
      var first = true
      sel.zipWithIndex.foreach { case (fi, si) =>
        val f = schema.fields(fi)
        // null cells of an optional column still print (entity), only
        // absent (unschematized) values would be skipped — our frames
        // always carry the full schema
        if (!first) sb.append(',')
        first = false
        jsonEscape(sb, f.name); sb.append(":[")
        yqlValue(sb, if (r.isNullAt(fi)) null else r.get(fi), types(si), cfg)
        sb.append(",\"").append(si).append("\"]")
      }
      sb.append('}')
    }
    writeEnvelopeTail(sb, schema, cfg, incompleteCols)
    sb.append(",\"yql_type_registry\":[")
    types.zipWithIndex.foreach { case (t, i) =>
      if (i > 0) sb.append(',')
      sb.append(yqlTypeJson(t))
    }
    sb.append("]}")
    sb.toString
  }
}
