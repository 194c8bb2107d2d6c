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
  *   - Skiff/Protobuf: binary row formats; out of scope without their
  *     schema registries.
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
    spark.read.text(path)
      .select(columns.map(c => element_at(m, lit(c)).as(c)): _*)
  }

  /** Json lines. */
  def readJson(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.map(r.schema).getOrElse(r).json(path)
  }

  /** Yson rows in a text file → JSON string column `doc`. */
  def readYsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).select(Yson.ysonToJson(col("value")).as("doc"))
}
