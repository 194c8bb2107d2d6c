package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The I/O format surface (SURVEY.md §1.4, EFormatType,
  * yt/yt/client/formats/format.h:49-62) on Spark's native readers:
  *
  *   - Dsv ("delimiter-separated", tab by default, `k=v` free schema) —
  *     `spark.read.csv` with tab separator for the schemaful flavor.
  *   - SchemafulDsv: fixed column order, tab-separated, no header.
  *   - Yamr: legacy `key<TAB>value` (optionally subkey) pairs.
  *   - YamredDsv: the Yamr/Dsv hybrid — yamr key framing over DSV
  *     values ([[Formats.readYamredDsv]] / [[Formats.writeYamredDsv]]).
  *   - Json: `spark.read.json` (one document per line).
  *   - Yson: [[Yson.ysonToJson]] over a text column, then the JSON
  *     reader — the documented YSON⇄JSON bridge.
  *   - Arrow/Parquet: Spark's columnar formats (the default storage).
  *   - Skiff/Protobuf: binary row formats — see [[Skiff]] and [[Proto]]
  *     (self-describing descriptors from the table schema).
  *   - WebJson: the web-UI result envelope ([[Formats.toWebJson]]).
  *   - Yaml: block-style rows ([[Formats.writeYamlRows]] /
  *     [[Formats.readYamlRows]]).
  *
  * All readers return ordinary DataFrames, so format choice never
  * affects the query surface — same as the reference, where formats
  * only exist at the job I/O boundary (user_job.cpp).
  */
object Formats {

  /** SchemafulDsv: tab-separated values in declared column order. */
  def readSchemafulDsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("sep", "\t").csv(path)

  def writeSchemafulDsv(df: DataFrame, path: String): Unit =
    df.write.option("sep", "\t").mode("overwrite").csv(path)

  /** Yamr: `key \t value` (lenient: extra tabs stay in value). */
  def readYamr(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).select(
      substring_index(col("value"), "\t", 1).as("key"),
      when(col("value").contains("\t"),
        expr("substring(value, instr(value, '\t') + 1)")).otherwise(lit(""))
        .as("value"))

  /** Dsv: `k1=v1 \t k2=v2 ...` per line — parsed into a map and
    * projected onto the requested column names (missing keys → null,
    * the non-strict schema behavior of §1.3). */
  def readDsv(spark: SparkSession, path: String, columns: Seq[String]): DataFrame = {
    val m = map_from_entries(transform(
      filter(split(col("value"), "\t"), p => length(p) > 0),
      p => {
        val k = substring_index(p, "=", 1)
        struct(k.as("k"), p.substr(length(k) + 2, length(p)).as("v"))
      }))
    // the map parse lands in its own projection: referenced once per
    // requested column, an inlined `m` would re-split the line N times
    // (CollapseProject keeps multi-referenced non-cheap expressions)
    spark.read.text(path)
      .select(m.as("__kv"))
      .select(columns.map(c => element_at(col("__kv"), lit(c)).as(c)): _*)
  }

  /** YamredDsv (EFormatType::YamredDsv, format.h:49-62; parser
    * yamred_dsv_parser.cpp, writer yamred_dsv_writer.cpp): the
    * Yamr/Dsv hybrid — each line is
    * `key[\t subkey]\t k1=v1\t k2=v2...` where `key` is the key
    * columns' VALUES joined by `yamr_keys_separator` (default space),
    * `subkey` likewise for the subkey columns, and the value section
    * is DSV over the remaining columns. Key splitting matches the
    * reference exactly: the last declared field absorbs any extra
    * separators, an empty section yields one empty field, and a field
    * count mismatch raises. Escaping (default on, symbol '\\') covers
    * \0, \t, \n and the symbol itself.
    */
  private def yamrEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '\u0000' => sb.append("\\0")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\n' => sb.append("\\n")
      case '\\' => sb.append("\\\\")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def yamrUnescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '0' => sb.append('\u0000')
          case 'r' => sb.append('\r')
          case 't' => sb.append('\t')
          case 'n' => sb.append('\n')
          case other => sb.append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Split a key/subkey section into exactly `names.size` fields: the
    * reference's ConsumeFields (yamred_dsv_parser.cpp:50-78) — the
    * LAST field absorbs remaining separators, an empty section is one
    * empty field, and a count mismatch is an error. */
  def splitYamrKeys(section: String, names: Seq[String],
      sep: Char): Seq[String] = {
    val fields =
      if (section.isEmpty) Seq("")
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var pos = 0
        var done = false
        while (!done) {
          val next = if (out.size + 1 == names.size) -1
            else section.indexOf(sep, pos)
          if (next < 0) { out += section.substring(pos); done = true }
          else { out += section.substring(pos, next); pos = next + 1 }
        }
        out.toSeq
      }
    if (fields.size != names.size) throw new IllegalArgumentException(
      s"Invalid number of key fields in YAMRed DSV: expected ${names.size}, " +
      s"actual ${fields.size}")
    fields
  }

  def readYamredDsv(spark: SparkSession, path: String,
      keyColumns: Seq[String], valueColumns: Seq[String],
      subkeyColumns: Seq[String] = Nil,
      yamrKeysSeparator: Char = ' ',
      enableEscaping: Boolean = true): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val hasSubkey = subkeyColumns.nonEmpty
    val outCols = keyColumns ++ subkeyColumns ++ valueColumns
    val schema = StructType(outCols.map(c => StructField(c, StringType)))
    val (kc, sc, vc) = (keyColumns, subkeyColumns, valueColumns)
    spark.read.text(path).mapPartitions { rows =>
      rows.map { r =>
        val line = r.getString(0)
        def un(s: String) = if (enableEscaping) yamrUnescape(s) else s
        // delimited Yamr framing: key [tab subkey] tab value-rest —
        // the value section keeps its own tabs (DSV pairs)
        val t1 = line.indexOf('\t')
        require(t1 >= 0, s"YAMRed DSV line has no value section: ${line.take(60)}")
        val keySec = line.substring(0, t1)
        val (subSec, valSec) =
          if (hasSubkey) {
            val t2 = line.indexOf('\t', t1 + 1)
            require(t2 >= 0, "YAMRed DSV line has no subkey/value boundary")
            (line.substring(t1 + 1, t2), line.substring(t2 + 1))
          } else ("", line.substring(t1 + 1))
        val keys = splitYamrKeys(un(keySec), kc, yamrKeysSeparator)
        val subs = if (hasSubkey)
          splitYamrKeys(un(subSec), sc, yamrKeysSeparator) else Nil
        val kv = valSec.split('\t').filter(_.nonEmpty).map { pair =>
          val eq = pair.indexOf('=')
          if (eq < 0) un(pair) -> ""
          else un(pair.substring(0, eq)) -> un(pair.substring(eq + 1))
        }.toMap
        Row.fromSeq(keys ++ subs ++ vc.map(kv.get(_).orNull))
      }
    }(Encoders.row(schema))
  }

  def writeYamredDsv(df: DataFrame, path: String,
      keyColumns: Seq[String], subkeyColumns: Seq[String] = Nil,
      yamrKeysSeparator: Char = ' ',
      enableEscaping: Boolean = true): Unit = {
    val fields = df.schema.fieldNames.toSeq
    val valueColumns = fields.filterNot((keyColumns ++ subkeyColumns).contains)
    val idx = fields.zipWithIndex.toMap
    import org.apache.spark.sql.Encoders
    df.mapPartitions { rows =>
      rows.map { r =>
        def cell(c: String): String = {
          val i = idx(c)
          val raw = if (r.isNullAt(i)) "" else r.get(i).toString
          if (enableEscaping) yamrEscape(raw) else raw
        }
        val sb = new StringBuilder
        sb.append(keyColumns.map(cell).mkString(yamrKeysSeparator.toString))
        if (subkeyColumns.nonEmpty) sb.append('\t')
          .append(subkeyColumns.map(cell).mkString(yamrKeysSeparator.toString))
        sb.append('\t')
        sb.append(valueColumns.map(c => s"$c=${cell(c)}").mkString("\t"))
        sb.toString
      }
    }(Encoders.STRING).write.mode("overwrite").text(path)
  }

  /** Json lines. */
  def readJson(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.map(r.schema).getOrElse(r).json(path)
  }

  /** Yson rows in a text file → JSON string column `doc`. */
  def readYsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).select(Yson.ysonToJson(col("value")).as("doc"))

  /** WebJson (EFormatType::WebJson, web_json_writer.cpp; Schemaless
    * value format, config.h:346-352): the web-UI result envelope
    * `{"rows": [{"col": {"$type": t, "$value": "..."}}...],
    * "incomplete_columns": ..., "all_column_names": [...]}`. Values are
    * stringified with their YT type; strings over `fieldWeightLimit`
    * truncate and gain `"$incomplete": true`. This is a UI handoff
    * format, bounded by design — `maxRows` caps the materialized rows
    * exactly like the reference's row limit, and the plan's LIMIT is
    * pushed down (no full scan feeds a UI page).
    */
  def toWebJson(df: DataFrame, maxRows: Int = 1000,
      fieldWeightLimit: Int = 1024): String =
    WebJson.schemaless(df, WebJson.Config(
      maxRows = maxRows, fieldWeightLimit = fieldWeightLimit))

  /** WebJson with `value_format=yql` (EWebJsonValueFormat::Yql):
    * values as `[encoded, "typeIndex"]` against `yql_type_registry`.
    * See [[WebJson.yql]]. */
  def toWebJsonYql(df: DataFrame, maxRows: Int = 1000,
      columnNames: Option[Seq[String]] = None): String =
    WebJson.yql(df, WebJson.Config(maxRows = maxRows, columnNames = columnNames))

  /** Yaml rows (EFormatType::Yaml, format.h:49-62): each row a block
    * mapping under a `-` sequence entry — scalars only, strings quoted
    * when they need it. Distributed: one YAML text line-block per row
    * via a text sink.
    */
  def writeYamlRows(df: DataFrame, path: String): Unit = {
    val fields = df.schema.fields
    val quoteNeeded = "[:#\\[\\]{}&*!|>'\"%@`,\n-]".r
    df.mapPartitions { rows =>
      rows.map { r =>
        val sb = new StringBuilder
        fields.zipWithIndex.foreach { case (f, i) =>
          sb.append(if (i == 0) "- " else "  ").append(f.name).append(": ")
          if (r.isNullAt(i)) sb.append("null")
          else {
            val v = r.get(i).toString
            val isStr = f.dataType == org.apache.spark.sql.types.StringType
            if (isStr && (v.isEmpty || quoteNeeded.findFirstIn(v).isDefined))
              sb.append('"').append(v.replace("\\", "\\\\").replace("\"", "\\\"")).append('"')
            else sb.append(v)
          }
          sb.append('\n')
        }
        sb.toString
      }
    }(org.apache.spark.sql.Encoders.STRING)
      .write.mode("overwrite").text(path)
  }

  /** Read the subset [[writeYamlRows]] emits: `- k: v` blocks with
    * scalar values, typed by the supplied schema. Distributed: the
    * text source splits records on the `\n- ` sequence boundary (the
    * Hadoop line reader handles custom separators across file splits),
    * then each block parses independently. */
  def readYamlRows(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val fields = schema.fields
    import org.apache.spark.sql.types._
    spark.read.option("lineSep", "\n- ").text(path)
      .mapPartitions { it =>
        it.flatMap { rec =>
          val block = rec.getString(0).stripPrefix("- ").trim
          if (block.isEmpty) None
          else {
            val kv = block.linesIterator.flatMap { line =>
              val t = line.trim
              val sep = t.indexOf(": ")
              if (sep >= 0) Some(t.take(sep) -> t.drop(sep + 2))
              else if (t.endsWith(":")) Some(t.dropRight(1) -> "")
              else None
            }.toMap
            def parse(raw: String, dt: DataType): Any =
              if (raw == "null" || raw.isEmpty) null
              else {
                val v =
                  if (raw.startsWith("\"") && raw.endsWith("\"") && raw.length >= 2)
                    raw.substring(1, raw.length - 1)
                      .replace("\\\"", "\"").replace("\\\\", "\\")
                  else raw
                dt match {
                  case LongType => v.toLong
                  case IntegerType => v.toInt
                  case DoubleType => v.toDouble
                  case BooleanType => v.toBoolean
                  case _ => v
                }
              }
            Some(org.apache.spark.sql.Row.fromSeq(
              fields.toSeq.map(f => kv.get(f.name).map(parse(_, f.dataType)).orNull)))
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }
}
