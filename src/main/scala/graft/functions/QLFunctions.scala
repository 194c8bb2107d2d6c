package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** The QL builtin scalar-function registry (SURVEY.md §2.A "QL scalar
  * functions"; reference builtin_function_registry.cpp) as Column
  * combinators over Spark builtins — everything stays inside
  * whole-stage codegen. `registerAll` additionally exposes the QL names
  * to `spark.sql(...)`.
  *
  * The `Any`/YSON document column is canonically carried as a JSON
  * string; the get_* and try_get_* accessor families (DEFINE_YPATH_GET,
  * cg_routines.cpp) map to get_json_object + casts. YPath `/a/b` is
  * accepted and translated to JSONPath `$.a.b`.
  */
object QLFunctions {
  // --- null / numeric predicates --------------------------------------
  def if_null(a: Column, b: Column): Column = coalesce(a, b)
  def is_null(a: Column): Column = a.isNull
  def is_nan(a: Column): Column = isnan(a)
  def is_finite(a: Column): Column =
    !isnan(a) && a =!= lit(Double.PositiveInfinity) && a =!= lit(Double.NegativeInfinity)
  def `if`(c: Column, t: Column, f: Column): Column = when(c, t).otherwise(f)

  // --- casts (QL int64()/uint64()/double()/boolean()/string()) --------
  def int64(a: Column): Column = a.cast("long")
  def uint64(a: Column): Column = a.cast("long") // raw-bits carrier, see Uint64
  def double(a: Column): Column = a.cast("double")
  def boolean(a: Column): Column = a.cast("boolean")
  def string(a: Column): Column = a.cast("string")
  def numeric_to_string(a: Column): Column = a.cast("string")
  def parse_int64(a: Column): Column = a.cast("long")
  def parse_double(a: Column): Column = a.cast("double")

  // --- strings ---------------------------------------------------------
  def is_substr(needle: Column, hay: Column): Column = hay.contains(needle)
  def is_prefix(prefix: Column, hay: Column): Column = hay.startsWith(prefix)

  // --- regex (re2 in the reference; Java regex here) -------------------
  def regex_full_match(pattern: String, s: Column): Column = s.rlike(s"^(?:$pattern)$$")
  def regex_partial_match(pattern: String, s: Column): Column = s.rlike(pattern)
  def regex_replace_first(pattern: String, s: Column, rewrite: String): Column =
    regexp_replace(s, lit(s"(?s)(?:$pattern)(.*)"), lit(rewrite + "$1"))
  def regex_replace_all(pattern: String, s: Column, rewrite: String): Column =
    regexp_replace(s, pattern, rewrite)
  def regex_extract(pattern: String, s: Column, group: Int = 1): Column =
    regexp_extract(s, pattern, group)
  def regex_escape(s: Column): Column =
    regexp_replace(s, "([.\\[\\]{}()*+?\\\\^$|])", "\\\\$1")

  // --- hashes -----------------------------------------------------------
  /** 64-bit content hash. The reference uses FarmHash
    * (udf/farm_hash.cpp); we standardize on xxhash64 — same role
    * (stable 64-bit mix), different constants. Documented deviation:
    * values differ from the reference's, properties don't.
    */
  def farm_hash(cols: Column*): Column = xxhash64(cols: _*)
  def simple_hash(cols: Column*): Column = hash(cols: _*).cast("long")
  def bigb_hash(c: Column): Column = xxhash64(lit("bigb"), c)

  // --- datetime (format_timestamp / timestamp_floor_*) ------------------
  def format_timestamp(ts: Column, fmt: String): Column = date_format(ts, fmt)
  def timestamp_floor_hour(ts: Column): Column = date_trunc("hour", ts)
  def timestamp_floor_day(ts: Column): Column = date_trunc("day", ts)
  def timestamp_floor_week(ts: Column): Column = date_trunc("week", ts)
  def timestamp_floor_month(ts: Column): Column = date_trunc("month", ts)
  def timestamp_floor_year(ts: Column): Column = date_trunc("year", ts)

  // --- lists / maps ------------------------------------------------------
  def make_list(cols: Column*): Column = array(cols: _*)
  def make_map(cols: Column*): Column = map(cols: _*)
  def list_contains(l: Column, v: Column): Column = array_contains(l, v)
  def list_has_intersection(a: Column, b: Column): Column = arrays_overlap(a, b)

  // --- Any / YSON document accessors -------------------------------------
  private def ypathToJsonPath(ypath: String): String =
    "$" + (if (ypath.isEmpty) "" else ypath.split("/").filter(_.nonEmpty)
      .map(seg => if (seg.forall(_.isDigit)) s"[$seg]" else s".$seg").mkString)

  def try_get_string(any: Column, ypath: String): Column =
    get_json_object(any, ypathToJsonPath(ypath))
  def try_get_int64(any: Column, ypath: String): Column =
    try_get_string(any, ypath).cast("long")
  def try_get_uint64(any: Column, ypath: String): Column = try_get_int64(any, ypath)
  def try_get_double(any: Column, ypath: String): Column =
    try_get_string(any, ypath).cast("double")
  def try_get_boolean(any: Column, ypath: String): Column =
    try_get_string(any, ypath).cast("boolean")
  def try_get_any(any: Column, ypath: String): Column = try_get_string(any, ypath)
  // get_* differ from try_get_* only in error behavior (throw vs null);
  // with ANSI casts the throwing behavior comes from the cast itself.
  def get_string(any: Column, ypath: String): Column = try_get_string(any, ypath)
  def get_int64(any: Column, ypath: String): Column = try_get_int64(any, ypath)
  def get_double(any: Column, ypath: String): Column = try_get_double(any, ypath)
  def get_boolean(any: Column, ypath: String): Column = try_get_boolean(any, ypath)
  def yson_length(any: Column): Column =
    coalesce(json_array_length(any), size(json_object_keys(any)).cast("int"))

  // --- TRANSFORM(expr, from, to[, default]) -------------------------------
  def transform_value(e: Column, from: Seq[Any], to: Seq[Any],
      default: Column = lit(null)): Column = {
    require(from.length == to.length, "TRANSFORM lists must align")
    from.zip(to).foldLeft(default) { case (acc, (f, t)) =>
      when(e === lit(f), lit(t)).otherwise(acc)
    }
  }

  /** Expose the QL names to SQL. Column-combinator functions register as
    * session-scoped SQL functions built from the same expressions.
    */
  def registerAll(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    import org.apache.spark.sql.catalyst.expressions._
    r.createOrReplaceTempFunction("if_null", es => Coalesce(es), "built-in")
    r.createOrReplaceTempFunction("u64_div",
      es => UnsignedDivide(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("u64_mod",
      es => UnsignedRemainder(es(0), es(1)), "built-in")
    r.createOrReplaceTempFunction("u64_to_string",
      es => UnsignedToString(es.head), "built-in")
    r.createOrReplaceTempFunction("parse_u64",
      es => ParseUnsigned(es.head), "built-in")
    r.createOrReplaceTempFunction("farm_hash", es => new XxHash64(es), "built-in")
  }
}
