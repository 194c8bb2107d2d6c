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
