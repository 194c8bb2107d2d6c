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
  /** parse_uint64 — unsigned parse onto the raw-bits Long carrier
    * (str_conv udf; values above Long.MaxValue keep their bit
    * pattern, see functions/Uint64). */
  def parse_uint64(a: Column): Column =
    graft.functions.Uint64.parse_u64(a)

  /** make_entity (builtin_function_registry.cpp:107-112): the YSON
    * entity `#`, i.e. null in the canonical-JSON Any encoding. */
  def make_entity(): Column = lit(null).cast("string")

  /** format_guid(id_hi, id_lo) (udf/format_guid.c:84-91): YT GUID text
    * form — four 32-bit components in lowercase hex without leading
    * zeros, ordered lo.hi-lo.lo-hi.hi-hi.lo. Spark's `hex` prints
    * minimal uppercase digits, so lower(hex(...)) matches exactly. */
  def format_guid(idHi: Column, idLo: Column): Column = {
    def comp(c: Column): Column = lower(hex(c))
    val m32 = lit(0xFFFFFFFFL)
    concat_ws("-",
      comp(shiftrightunsigned(idLo, 32)), comp(idLo.bitwiseAND(m32)),
      comp(shiftrightunsigned(idHi, 32)), comp(idHi.bitwiseAND(m32)))
  }

  // --- strings ---------------------------------------------------------
  def is_substr(needle: Column, hay: Column): Column = hay.contains(needle)
  def is_prefix(prefix: Column, hay: Column): Column = hay.startsWith(prefix)

  // --- regex (re2 in the reference; Java regex here) -------------------
  // a null subject is NOT a match (ql_query_ut.cpp RegexFullMatch)
  def regex_full_match(pattern: String, s: Column): Column =
    coalesce(s.rlike(s"^(?:$pattern)$$"), lit(false))
  def regex_partial_match(pattern: String, s: Column): Column =
    coalesce(s.rlike(pattern), lit(false))

  /** Convert an re2 rewrite string (regex_udf.cpp: `\1`..`\9` group
    * refs, `\\` literal backslash, `$` literal) to Java's replacement
    * syntax (`$N` refs, `\` escapes). Without this, a user rewrite
    * containing `$` or `\` is misread as Java rewrite syntax. */
  private[graft] def javaRewrite(re2: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < re2.length) {
      val c = re2.charAt(i)
      if (c == '\\' && i + 1 < re2.length) {
        val n = re2.charAt(i + 1)
        if (n.isDigit) { sb.append('$').append(n); i += 2 }
        else if (n == '\\') { sb.append("\\\\"); i += 2 }
        else { sb.append("\\\\"); i += 1 } // lone backslash stays literal
      } else if (c == '\\') { sb.append("\\\\"); i += 1 }
      else if (c == '$') { sb.append("\\$"); i += 1 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Tail capture for replace-first: a NAMED group, so the
    * backreference stays correct when the user pattern has its own
    * capturing groups (with `(.*)`+`$1`, `$1` would bind to the user's
    * first group and drop the string tail). */
  private[graft] def replaceFirstPattern(pattern: String): String =
    s"(?s)(?:$pattern)(?<qlReplTail>.*)"
  private[graft] def replaceFirstRewrite(rewrite: String): String =
    javaRewrite(rewrite) + "$" + "{qlReplTail}"

  def regex_replace_first(pattern: String, s: Column, rewrite: String): Column =
    regexp_replace(s, lit(replaceFirstPattern(pattern)), lit(replaceFirstRewrite(rewrite)))
  def regex_replace_all(pattern: String, s: Column, rewrite: String): Column =
    regexp_replace(s, lit(pattern), lit(javaRewrite(rewrite)))
  def regex_extract(pattern: String, s: Column, group: Int = 1): Column =
    regexp_extract(s, pattern, group)
  def regex_escape(s: Column): Column =
    regexp_replace(s, "([.\\[\\]{}()*+?\\\\^$|])", "\\\\$1")

  // --- hashes -----------------------------------------------------------
  /** BIT-EXACT reference hashes (ql_query_ut.cpp FarmHash pins the
    * vectors): farm_hash = per-value Google FarmHash fingerprints
    * chained through Fingerprint(Uint128) from 0xdeadc0de;
    * simple_hash = the FarmHash/Murmur row-hash hybrid
    * (cg_routines.cpp:2009). See [[graft.functions.FarmHash]]. */
  def farm_hash(cols: Column*): Column = FarmHashExpr(cols: _*)
  def simple_hash(cols: Column*): Column = SimpleHashExpr(cols: _*)
  /** bigb_hash (udf/bigb_hash.cpp), BIT-EXACT: "" → 0u; "y" + a
    * parseable uint64 → that numeric uid verbatim; everything else is
    * the reference's MultiHash("shard", uid) =
    * IntHash64(CityHash64(uid)) ^ CityHash64("shard") — see
    * [[graft.functions.CityHash]]. ql_query_ut.cpp BigbHash's pinned
    * vectors reproduce exactly.
    */
  def bigb_hash(c: Column): Column = {
    val tail = c.substr(lit(2), length(c))
    val fitsU64 = tail.rlike("^[0-9]{1,19}$") ||
      (tail.rlike("^[0-9]{20}$") && tail <= lit("18446744073709551615"))
    when(length(c) === 0, lit(0L))
      .when(c.startsWith("y") && fitsU64, Uint64.parse_u64(tail))
      .otherwise(graft.functions.BigbFallbackExpr(c))
  }

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
    graft.sources.Yson.ypathToJsonPathStrict(ypath)

  def try_get_string(any: Column, ypath: String): Column =
    graft.sources.Yson.getJsonFast(any, lit(ypathToJsonPath(ypath)))
  def try_get_int64(any: Column, ypath: String): Column =
    try_get_string(any, ypath).try_cast("long")
  /** uint64 carries the engine's raw-bits convention: the full unsigned
    * range parses (values above Long.MaxValue keep their bit pattern —
    * a signed cast would null them), negatives are a type mismatch
    * (null under try; the canonical-JSON carrier erases the reference's
    * int64/uint64 node distinction, so range is the discriminator). */
  private def u64FromCarrier(s: Column): Column = {
    val fits = s.rlike("^[0-9]{1,19}$") ||
      (s.rlike("^[0-9]{20}$") && s <= lit("18446744073709551615"))
    when(fits, graft.functions.Uint64.parse_u64(s))
  }
  def try_get_uint64(any: Column, ypath: String): Column =
    u64FromCarrier(try_get_string(any, ypath))
  def try_get_double(any: Column, ypath: String): Column =
    try_get_string(any, ypath).try_cast("double")
  def try_get_boolean(any: Column, ypath: String): Column =
    try_get_string(any, ypath).try_cast("boolean")
  def try_get_any(any: Column, ypath: String): Column = {
    import org.apache.spark.sql.graft.{shims => S}
    S.column(graft.sources.Yson.JsonGetRaw(S.expression(any),
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(ypathToJsonPath(ypath)),
        org.apache.spark.sql.types.StringType)))
  }
  // get_* differ from try_get_* in error behavior (DEFINE_YPATH_GET vs
  // DEFINE_YPATH_TRY_GET): a missing value at the path raises when both
  // inputs are present, and a type mismatch raises via the ANSI cast.
  private def getRequired(any: Column, ypath: String): Column =
    when(any.isNull, lit(null).cast("string")).otherwise(
      coalesce(try_get_string(any, ypath), raise_error(
        lit(s"get_*: no value at ypath '$ypath'"))))
  def get_string(any: Column, ypath: String): Column = getRequired(any, ypath)
  def get_any(any: Column, ypath: String): Column =
    when(any.isNull, lit(null).cast("string")).otherwise(
      coalesce(try_get_any(any, ypath), raise_error(
        lit(s"get_any: no value at ypath '$ypath'"))))
  def get_int64(any: Column, ypath: String): Column =
    getRequired(any, ypath).cast("long")
  def get_uint64(any: Column, ypath: String): Column =
    graft.functions.Uint64.parse_u64(getRequired(any, ypath))
  def get_double(any: Column, ypath: String): Column =
    getRequired(any, ypath).cast("double")
  def get_boolean(any: Column, ypath: String): Column =
    getRequired(any, ypath).cast("boolean")
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

  /** Expose the full QL builtin registry to `spark.sql` (reference
    * builtin_function_registry.cpp) so a [[graft.ql.SelectRows]] string
    * can use QL names directly. Everything lowers to native Catalyst
    * expressions — no UDFs, all codegen'd. Idempotent — registration
    * happens once per session (guarded below), so repeat SelectRows
    * calls never churn the registry (or log replace WARNs).
    *
    * QL names that COLLIDE with Spark builtins of different semantics
    * (`if`, `greatest`, `transform`, `cardinality`) register ONLY under
    * `ql__`-prefixed names; [[graft.ql.QLEmitter]] rewrites QL call
    * sites to the prefixed spelling. Spark's own `transform` HOF,
    * `if`, `greatest` and `cardinality` stay untouched session-wide —
    * a plain `spark.sql` after a SelectRows call sees stock Spark.
    */
  def registerAll(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    if (r.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("ql__if"))) return
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType, StringType}
    def reg(name: String)(b: Seq[Expression] => Expression): Unit =
      r.createOrReplaceTempFunction(name, b, "built-in")
    // a foldable ypath folds to a JSON-path literal at build time; a
    // column-valued ypath (ql_query_ut.cpp YPathTryGetInt64 passes the
    // path as a table column) converts per row, malformed paths raise
    def ypathArg(e: Expression): Expression =
      if (e.foldable) {
        val raw = e.eval(null)
        if (raw == null) Literal.create(null, StringType)
        else {
          val s = raw.toString
          val jp = if (s.startsWith("$")) s else ypathToJsonPath(s)
          Literal(org.apache.spark.unsafe.types.UTF8String.fromString(jp), StringType)
        }
      } else graft.sources.Yson.YPathToJsonPath(e)
    // Literal paths keep GetJsonObject SEMANTICS but run through the
    // byte-walker fast path (JsonGetSpark; the real evaluator
    // arbitrates punts) — Spark's GetJsonObject builds a Jackson
    // parser per ROW, whose buffer-recycler lookup was the hottest
    // executor frame on the accessor benches. Column-valued paths go
    // through our tree navigator as before.
    def jsonGet(es: Seq[Expression]): Expression = {
      val p = ypathArg(es(1))
      if (p.foldable) graft.sources.Yson.JsonGetSpark(es(0), p)
      else graft.sources.Yson.JsonGetScalar(es(0), p)
    }
    // get_* raise when the path finds nothing while both inputs are
    // present (DEFINE_YPATH_GET); try_get_* return null instead
    def jsonGetRequired(es: Seq[Expression]): Expression =
      CaseWhen(Seq(
        (Or(IsNull(es(0)), IsNull(es(1))), Literal.create(null, StringType))),
        Some(Coalesce(Seq(jsonGet(es), RaiseError(Concat(Seq(
          Literal(org.apache.spark.unsafe.types.UTF8String.fromString(
            "get_*: no value at ypath "), StringType), es(1))))))))
    def tryCast(e: Expression, t: org.apache.spark.sql.types.DataType): Expression =
      Cast(e, t, None, EvalMode.TRY)
    def ansiCast(e: Expression, t: org.apache.spark.sql.types.DataType): Expression =
      Cast(e, t, None, EvalMode.ANSI)

    // null / conditionals
    // QL if() propagates a NULL condition to a NULL result
    // (ql_expressions_ut.cpp FunctionNullArgument: if(null, 1, 2) → #);
    // Spark's native `if` would take the else branch — lower to a CASE
    // with no ELSE so a null condition matches no branch.
    reg("ql__if") { es =>
      // an untyped NULL condition types as VOID, which CaseWhen's
      // type-check rejects — cast it to boolean (stays NULL, so the
      // null-propagation semantics below are unchanged)
      val c = if (es(0).dataType == org.apache.spark.sql.types.NullType)
        Cast(es(0), BooleanType) else es(0)
      CaseWhen(Seq((c, es(1)), (Not(c), es(2))), None)
    }
    reg("if_null")(es => Coalesce(es))
    reg("is_null")(es => IsNull(es.head))
    reg("is_nan")(es => IsNaN(es.head))
    reg("is_finite")(es => And(Not(IsNaN(es.head)),
      And(Not(EqualTo(es.head, Literal(Double.PositiveInfinity))),
        Not(EqualTo(es.head, Literal(Double.NegativeInfinity))))))
    // casts
    reg("int64")(es => Cast(es.head, LongType))
    reg("uint64")(es => Cast(es.head, LongType))
    reg("numeric_to_string")(es => Cast(es.head, StringType))
    reg("parse_int64")(es => Cast(es.head, LongType))
    reg("parse_double")(es => Cast(es.head, DoubleType))
    // strings
    reg("is_substr")(es => Contains(es(1), es(0)))
    reg("is_prefix")(es => StartsWith(es(1), es(0)))
    // variadic greatest incl. the 1-arg form (ql_query_ut.cpp Greatest)
    reg("ql__greatest")(es => if (es.length == 1) es.head else Greatest(es))
    // regex (argument order per the reference: pattern first)
    // a null subject is NOT a match (ql_query_ut.cpp RegexFullMatch:
    // the empty row evaluates to %false, not null)
    reg("regex_full_match")(es => Coalesce(Seq(RLike(es(1),
      Literal.create("^(?:" + es(0).eval(null) + ")$", StringType)),
      Literal(false))))
    reg("regex_partial_match")(es =>
      Coalesce(Seq(RLike(es(1), es(0)), Literal(false))))
    reg("regex_replace_all")(es => RegExpReplace(es(1), es(0),
      Literal.create(javaRewrite(es(2).eval(null).toString), StringType)))
    reg("regex_replace_first")(es => RegExpReplace(es(1),
      Literal.create(replaceFirstPattern(es(0).eval(null).toString), StringType),
      Literal.create(replaceFirstRewrite(es(2).eval(null).toString), StringType)))
    reg("regex_escape")(es => RegExpReplace(es.head,
      Literal.create("([.\\[\\]{}()*+?\\\\^$|])", StringType),
      Literal.create("\\\\$1", StringType)))
    // reference signature (ql_query_ut.cpp RegexExtract): the third
    // argument is an RE2 REWRITE template ("\1 at \2"), not a group
    // index — extract the leftmost match, then expand the template on
    // it; no match → null (RE2::Extract returns false). An integer
    // third arg keeps the group-index form for the Column API surface.
    reg("regex_extract") { es =>
      val isRewrite = es.length > 2 && es(2).dataType == StringType
      if (isRewrite) {
        val whole = RegExpExtract(es(1), es(0), Literal(0))
        CaseWhen(Seq(
          (EqualTo(whole, Literal("")), Literal.create(null, StringType))),
          Some(RegExpReplace(whole, es(0),
            Literal.create(javaRewrite(es(2).eval(null).toString), StringType))))
      } else RegExpExtract(es(1), es(0),
        if (es.length > 2) es(2) else Literal(1))
    }
    // hashes
    reg("farm_hash")(es => FarmHashExpr(es))
    reg("simple_hash")(es => SimpleHashExpr(es))
    reg("bigb_hash")(es => org.apache.spark.sql.graft.shims.convert(
      bigb_hash(org.apache.spark.sql.graft.shims.column(es.head))))
    // datetime
    def floorReg(name: String, unit: String): Unit =
      reg(name)(es => TruncTimestamp(
        Literal(org.apache.spark.unsafe.types.UTF8String.fromString(unit), StringType),
        es.head))
    floorReg("timestamp_floor_hour", "hour")
    floorReg("timestamp_floor_day", "day")
    floorReg("timestamp_floor_week", "week")
    floorReg("timestamp_floor_month", "month")
    floorReg("timestamp_floor_year", "year")
    // _localtime variants (builtin_function_registry.cpp:280-300): the
    // reference floors in the cluster's local zone; here "local" is the
    // Spark session timezone, which date_trunc/date_format already use.
    floorReg("timestamp_floor_hour_localtime", "hour")
    floorReg("timestamp_floor_day_localtime", "day")
    floorReg("timestamp_floor_week_localtime", "week")
    floorReg("timestamp_floor_month_localtime", "month")
    floorReg("timestamp_floor_year_localtime", "year")
    // format_timestamp (udf/format_timestamp.c, cg_routines.cpp
    // FormatTimestamp): int64 UNIX seconds format through the year
    // [1, 10000) window — out-of-range raises, and the format string
    // caps at 30 chars. Format syntax is Java patterns here vs strptime
    // there (documented deviation); bounds and errors are
    // reference-exact. Timestamp-typed input (our Column surface)
    // formats directly.
    def formatTs(es: Seq[Expression]): Expression = {
      es(1) match {
        case lit if lit.foldable =>
          val v = lit.eval(null)
          if (v != null && v.toString.length > 30)
            throw new IllegalArgumentException("Format string is too long")
        case _ => ()
      }
      val input = es(0).dataType match {
        case LongType | org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType =>
          val sec = es(0)
          If(LessThan(sec, Literal(-62135596800L)),
            Cast(RaiseError(Literal(org.apache.spark.unsafe.types.UTF8String
              .fromString("Timestamp is smaller than minimal value"),
              StringType)), org.apache.spark.sql.types.TimestampType),
            If(GreaterThanOrEqual(sec, Literal(253402300800L)),
              Cast(RaiseError(Literal(org.apache.spark.unsafe.types.UTF8String
                .fromString("Timestamp is greater than maximal value"),
                StringType)), org.apache.spark.sql.types.TimestampType),
              SecondsToTimestamp(sec)))
        case _ => es(0)
      }
      DateFormatClass(input, es(1))
    }
    reg("format_timestamp")(formatTs)
    reg("format_timestamp_localtime")(formatTs)
    // QL's `||` concatenates strings ONLY — int operands are a type
    // error (ql_expressions_ut.cpp ConcatenateOperator "Type mismatch
    // in expression"), where Spark's || would silently stringify
    reg("ql_concat") { es =>
      es.foreach { e =>
        val ok = e.dataType == StringType ||
          e.dataType == org.apache.spark.sql.types.BinaryType ||
          e.dataType == org.apache.spark.sql.types.NullType
        if (!ok) throw new IllegalArgumentException(
          s"Type mismatch in expression: || expects string operands, got ${e.dataType.simpleString}")
      }
      Concat(es)
    }
    // lists / maps
    reg("make_list")(es => CreateArray(es))
    reg("make_map")(es => CreateMap(es))
    // Any-carrier builders for MIXED-typed make_list/make_map
    // (ql_query_ut.cpp MakeList/MakeMapSuccess: the reference's builders
    // return Any). Arguments arrive as canonical-JSON fragments (the
    // emitter wraps non-Any args in to_any); SQL NULL embeds as JSON
    // null. Emitted only by QLEmitter's Any rewrite.
    reg("any_make_list") { es =>
      val items = es.map(e => Coalesce(Seq(e, Literal("null"))))
      val body = items.zipWithIndex.flatMap { case (e, i) =>
        if (i == 0) Seq(e) else Seq(Literal(","), e)
      }
      Concat(Literal("[") +: body :+ Literal("]"))
    }
    reg("any_make_map") { es =>
      val body = es.grouped(2).toSeq.zipWithIndex.flatMap { case (kv, i) =>
        val kvSeq = Seq(Coalesce(Seq(kv(0), Literal("null"))), Literal(":"),
          Coalesce(Seq(kv(1), Literal("null"))))
        if (i == 0) kvSeq else Literal(",") +: kvSeq
      }
      Concat(Literal("{") +: body :+ Literal("}"))
    }
    reg("list_contains")(es => ArrayContains(es(0), es(1)))
    reg("list_has_intersection")(es => ArraysOverlap(es(0), es(1)))
    // Any-carrier list forms (emitted by QLEmitter when an operand is
    // an Any column): element-wise canonical-fragment comparison;
    // entity (NULL) elements never match, and a no-match-with-nulls
    // result is false, not SQL NULL (ListHasIntersection rows 4-6)
    reg("any_list_has_intersection")(es => Coalesce(Seq(
      ArraysOverlap(graft.sources.Yson.JsonArrayFragments(es(0)),
        graft.sources.Yson.JsonArrayFragments(es(1))),
      Literal(false))))
    reg("any_list_contains")(es => Coalesce(Seq(
      ArrayContains(graft.sources.Yson.JsonArrayFragments(es(0)), es(1)),
      Literal(false))))
    // Any / YSON accessors (try_get_* null on miss; get_* differ only
    // under ANSI cast errors); yson_string_to_any parses YSON text into
    // the canonical JSON Any carrier
    reg("yson_string_to_any")(es => graft.sources.Yson.YsonToJson(es.head))
    reg("any_to_yson_string")(es => graft.sources.Yson.JsonToYsonText(es.head))
    // typed Any ordering (composite_compare.cpp CompareYsonValues)
    reg("any_compare")(es => graft.sources.Yson.AnyCompare(es(0), es(1)))
    reg("any_sort_key")(es => graft.sources.Yson.AnySortKey(es.head))
    reg("try_get_string")(jsonGet)
    reg("get_string")(jsonGetRequired)
    // *_any keep the raw carrier fragment (string leaves stay quoted)
    def jsonGetAny(es: Seq[Expression]): Expression =
      graft.sources.Yson.JsonGetRaw(es(0), ypathArg(es(1)))
    reg("try_get_any")(jsonGetAny)
    reg("get_any")(es =>
      CaseWhen(Seq(
        (Or(IsNull(es(0)), IsNull(es(1))), Literal.create(null, StringType))),
        Some(Coalesce(Seq(jsonGetAny(es), RaiseError(Concat(Seq(
          Literal(org.apache.spark.unsafe.types.UTF8String.fromString(
            "get_any: no value at ypath "), StringType), es(1))))))))
    )
    // to_any(v): typed value → canonical-JSON Any carrier. Lowered as
    // to_json of a 1-element array with the brackets stripped, which
    // JSON-encodes ANY input type (strings gain their quotes) without
    // type dispatch at registration time.
    reg("to_any") { es =>
      val js = StructsToJson(Map.empty, CreateArray(es))
      // a NULL value maps to a NULL Any (storage null, same as the
      // entity cell `#`), NOT to the JSON text "null" — otherwise
      // null-matching Any equality sees a non-null carrier
      If(IsNull(es.head),
        Literal.create(null, StringType),
        Substring(js, Literal(2), Subtract(Length(js), Literal(2))))
    }
    def ysonLen(es: Seq[Expression]): Expression = Coalesce(Seq(
      LengthOfJsonArray(es.head),
      Size(JsonObjectKeys(es.head))))
    reg("yson_length")(ysonLen)

    // ——— Yson:: module (docs udf/list/yson.md) over the canonical-JSON
    // Any representation. Parse/Serialize bridge YSON text/binary;
    // ParseJson/SerializeJson are identities BY DESIGN (the Any carrier
    // IS canonical JSON); ConvertTo* read the ROOT scalar with strict
    // (ANSI) casts — the module's "fails the query" contract; Lookup*/
    // YPath* are the optional (try) forms per the docs' Optional return
    // types. Attributes are not modeled (WithAttributes/Attributes
    // raise at resolution since they are not registered). ———
    def ysonRoot(es: Seq[Expression]): Expression =
      graft.sources.Yson.JsonGetSpark(es.head, Literal("$"))
    for (n <- Seq("yson_parse", "yson_parsetext", "yson_parsebinary"))
      reg(n)(es => graft.sources.Yson.YsonToJson(es.head))
    reg("yson_parsejson")(es => es.head)
    reg("yson_from") { es =>
      val js = StructsToJson(Map.empty, CreateArray(es))
      If(IsNull(es.head),
        Literal.create(null, StringType),
        Substring(js, Literal(2), Subtract(Length(js), Literal(2))))
    }
    for (n <- Seq("yson_serialize", "yson_serializetext",
        "yson_serializebinary", "yson_serializepretty"))
      reg(n)(es => graft.sources.Yson.JsonToYsonText(es.head))
    reg("yson_serializejson")(es => es.head)
    // Yson::Options (yson2_udf.cpp TOptions): the parser lowers the
    // named-bool call to an opaque token literal ('ysonopts:aXsX');
    // every convert/lookup lowering sniffs a trailing token and
    // dispatches its (Strict, AutoConvert) mode. No-options call sites
    // keep the engine's original lowering bit-for-bit.
    def ysonOptsOf(es: Seq[Expression]): Option[(Boolean, Boolean)] =
      es.drop(1).collectFirst {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType)
            if s != null && s.toString.startsWith("ysonopts:") =>
          val t = s.toString
          (t.contains("s1"), t.contains("a1")) // (strict, autoConvert)
      }
    def ysonModeName(es: Seq[Expression]): String = ysonOptsOf(es) match {
      case None => "legacy"
      case Some((_, true)) => "auto" // AutoConvert beats Strict per table
      case Some((true, _)) => "strict"
      case Some(_) => "lenient"
    }
    def scalarConv(target: String, legacy: Seq[Expression] => Expression)
        (es: Seq[Expression]): Expression = ysonOptsOf(es) match {
      case None => legacy(es)
      case Some((strict, auto)) =>
        graft.sources.Yson.YsonConvertScalar(es.head, target, strict, auto)
    }
    reg("yson_converttoint64")(
      scalarConv("int64", es => ansiCast(ysonRoot(es), LongType)))
    reg("yson_converttouint64")(
      scalarConv("uint64", es => ParseUnsigned(ysonRoot(es))))
    reg("yson_converttodouble")(
      scalarConv("double", es => ansiCast(ysonRoot(es), DoubleType)))
    reg("yson_converttobool")(
      scalarConv("bool", es => ansiCast(ysonRoot(es), BooleanType)))
    reg("yson_converttostring")(
      scalarConv("string", es => ysonRoot(es)))
    // Lookup takes a bare dict KEY (docs #ysonlookup) — it becomes a
    // one-segment ypath
    def keyed(es: Seq[Expression]): Seq[Expression] =
      Seq(es(0), Concat(Seq(Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("/"),
        StringType), es(1))))
    // Lookup/YPath typed forms take an optional Options 3rd argument
    // (yson2_udf.cpp LookupImpl/YPathImpl): the mode applies to the
    // extracted fragment's scalar conversion.
    def lookupConv(target: String, legacy: Seq[Expression] => Expression,
        path: Seq[Expression] => Seq[Expression])
        (es: Seq[Expression]): Expression = ysonOptsOf(es) match {
      case None => legacy(es)
      case Some((strict, auto)) => graft.sources.Yson.YsonConvertScalar(
        jsonGetAny(path(es)), target, strict, auto)
    }
    reg("yson_lookup")(es => jsonGetAny(keyed(es)))
    reg("yson_lookupint64")(lookupConv("int64",
      es => tryCast(jsonGet(keyed(es)), LongType), keyed))
    reg("yson_lookupuint64")(lookupConv("uint64",
      es => u64Carrier(jsonGet(keyed(es))), keyed))
    reg("yson_lookupdouble")(lookupConv("double",
      es => tryCast(jsonGet(keyed(es)), DoubleType), keyed))
    reg("yson_lookupbool")(lookupConv("bool",
      es => tryCast(jsonGet(keyed(es)), BooleanType), keyed))
    reg("yson_lookupstring")(lookupConv("string",
      es => jsonGet(keyed(es)), keyed))
    reg("yson_ypath")(jsonGetAny)
    reg("yson_ypathint64")(lookupConv("int64",
      es => tryCast(jsonGet(es), LongType), _.take(2)))
    reg("yson_ypathuint64")(lookupConv("uint64",
      es => u64Carrier(jsonGet(es)), _.take(2)))
    reg("yson_ypathdouble")(lookupConv("double",
      es => tryCast(jsonGet(es), DoubleType), _.take(2)))
    reg("yson_ypathbool")(lookupConv("bool",
      es => tryCast(jsonGet(es), BooleanType), _.take(2)))
    reg("yson_ypathstring")(lookupConv("string", jsonGet, _.take(2)))
    // ConvertTo*List / ConvertTo*Dict family + Attributes
    // (yson2 udf; typed element extraction with the strict default)
    import graft.sources.Yson.YsonTypedExpr
    for (kind <- Seq("any", "string", "int64", "uint64", "double", "bool")) {
      val prefix = if (kind == "any") "" else kind
      reg(s"yson_convertto${prefix}list")(es =>
        YsonTypedExpr("list", kind, es.take(1), ysonModeName(es)))
      reg(s"yson_convertto${prefix}dict")(es =>
        YsonTypedExpr("dict", kind, es.take(1), ysonModeName(es)))
    }
    reg("yson_lookuplist")(es =>
      YsonTypedExpr("list", "any", Seq(jsonGetAny(keyed(es)))))
    reg("yson_lookupdict")(es =>
      YsonTypedExpr("dict", "any", Seq(jsonGetAny(keyed(es)))))
    reg("yson_ypathlist")(es =>
      YsonTypedExpr("list", "any", Seq(jsonGetAny(es))))
    reg("yson_ypathdict")(es =>
      YsonTypedExpr("dict", "any", Seq(jsonGetAny(es))))
    reg("yson_attributes")(es => YsonTypedExpr("attributes", "any", es))
    reg("yson_withattributes")(es =>
      YsonTypedExpr("withattributes", "any", es))
    reg("yson_parsejsondecodeutf8")(es => es.head)
    // Yson::Options itself: the parser sugar already folded the named
    // bools into the token literal — pass it through so the enclosing
    // convert/lookup lowering can sniff it.
    reg("yson_options")(es => es.headOption.getOrElse(Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("ysonopts:a0s0"),
      StringType)))
    reg("yson_contains")(es => IsNotNull(jsonGetAny(keyed(es))))
    reg("yson_getlength")(ysonLen)
    reg("yson_equals")(es =>
      EqualTo(graft.sources.Yson.AnyCompare(es(0), es(1)), Literal(0)))
    reg("yson_gethash")(es => XxHash64(Seq(es.head), 42L))
    // Is* family: node-kind tests read the canonical text's shape
    def txt(es: Seq[Expression]) = es.head
    reg("yson_isentity")(es => EqualTo(txt(es), Literal("null")))
    reg("yson_isstring")(es => StartsWith(txt(es), Literal("\"")))
    reg("yson_isbool")(es => In(txt(es),
      Seq(Literal("true"), Literal("false"))))
    reg("yson_isint64")(es => RLike(txt(es), Literal("^-?\\d+$")))
    reg("yson_isuint64")(es => RLike(txt(es), Literal("^\\d+$")))
    reg("yson_isdouble")(es => And(
      RLike(txt(es),
        Literal("^-?(\\d+\\.\\d*|\\.\\d+|\\d+)([eE][+-]?\\d+)?$")),
      RLike(txt(es), Literal("[.eE]"))))
    reg("yson_islist")(es => StartsWith(txt(es), Literal("[")))
    reg("yson_isdict")(es => StartsWith(txt(es), Literal("{")))
    reg("try_get_int64")(es => tryCast(jsonGet(es), LongType))
    reg("get_int64")(es => ansiCast(jsonGetRequired(es), LongType))
    // uint64 accessors: raw-bits parse of the full unsigned range (a
    // signed cast nulls values above Long.MaxValue); negatives and
    // non-integers are a type mismatch — null under try, raise under get
    // (ParseUnsigned throws)
    def u64Carrier(s: Expression): Expression = {
      val fits = Or(RLike(s, Literal("^[0-9]{1,19}$")),
        And(RLike(s, Literal("^[0-9]{20}$")),
          LessThanOrEqual(s, Literal("18446744073709551615"))))
      CaseWhen(Seq((fits, ParseUnsigned(s))), None)
    }
    reg("try_get_uint64")(es => u64Carrier(jsonGet(es)))
    reg("get_uint64")(es => ParseUnsigned(jsonGetRequired(es)))
    reg("try_get_double")(es => tryCast(jsonGet(es), DoubleType))
    reg("get_double")(es => ansiCast(jsonGetRequired(es), DoubleType))
    reg("try_get_boolean")(es => tryCast(jsonGet(es), BooleanType))
    reg("get_boolean")(es => ansiCast(jsonGetRequired(es), BooleanType))
    // uint64 ops (two's-complement Long carrier, see functions/Uint64)
    val bias = Literal(Long.MinValue)
    def biased(e: Expression): Expression = BitwiseXor(e, bias)
    reg("u64_lt")(es => LessThan(biased(es(0)), biased(es(1))))
    reg("u64_leq")(es => LessThanOrEqual(biased(es(0)), biased(es(1))))
    reg("u64_gt")(es => GreaterThan(biased(es(0)), biased(es(1))))
    reg("u64_geq")(es => GreaterThanOrEqual(biased(es(0)), biased(es(1))))
    reg("u64_sort")(es => biased(es.head))
    reg("u64_sort_key")(es => biased(es.head))
    // ORDER BY key guard: sorting by NaN is an error in QL
    // (ql_query_ut.cpp OrderBy); identity for non-floating keys
    reg("ql_order_guard")(es => NanGuard(es.head))
    reg("u64_agg_min")(es => BitwiseXor(
      aggregate.Min(biased(es.head)).toAggregateExpression(), bias))
    reg("u64_agg_max")(es => BitwiseXor(
      aggregate.Max(biased(es.head)).toAggregateExpression(), bias))
    reg("u64_sum")(es => aggregate.Sum(es.head,
      NumericEvalContext(EvalMode.LEGACY)).toAggregateExpression())
    reg("u64_div")(es => UnsignedDivide(es(0), es(1)))
    // QL `/`: integer division on integral operands (the SelectRows
    // emitter lowers `/` to this)
    reg("ql_div")(es => QlDivide(es(0), es(1)))
    reg("ql_mod")(es => QlModulo(es(0), es(1)))
    reg("u64_mod")(es => UnsignedRemainder(es(0), es(1)))
    reg("u64_to_string")(es => UnsignedToString(es.head))
    reg("parse_u64")(es => ParseUnsigned(es.head))
    reg("parse_uint64")(es => ParseUnsigned(es.head))
    // argmin/argmax (ql_query_ut.cpp ArgMin): value at the extremum of
    // the second argument
    reg("argmin")(es =>
      aggregate.MinBy(es(0), es(1)).toAggregateExpression())
    reg("argmax")(es =>
      aggregate.MaxBy(es(0), es(1)).toAggregateExpression())
    // QL cardinality = HyperLogLog count-distinct
    // (builtin_function_registry.cpp:255-268, udf/hyperloglog.cpp).
    // Registered under the prefixed name only — Spark's array-size
    // `cardinality` builtin keeps its meaning outside QL strings.
    // rsd 0.01 ≈ the reference's 2^14-register precision
    // (ql_query_ut.cpp CardinalityAggregate expects ±1% on 2000 keys)
    reg("ql__cardinality")(es =>
      aggregate.HyperLogLogPlusPlus(es.head, 0.01).toAggregateExpression())
    reg("make_entity")(_ => Literal.create(null, StringType))
    reg("format_guid") { es =>
      import org.apache.spark.sql.graft.{shims => S}
      S.convert(format_guid(S.column(es(0)), S.column(es(1))))
    }
    // QL TRANSFORM(expr, (from...), (to...)[, default]). Registered
    // under the prefixed name so Spark's array-transform HOF keeps the
    // bare spelling; the lambda dispatch stays for QL strings that use
    // the HOF form through the same call site.
    reg("ql__transform") {
      case Seq(x, l: LambdaFunction) => ArrayTransform(x, l)
      case es if es.length >= 3 =>
        def elems(e: Expression): Seq[Expression] = e match {
          case s: CreateNamedStruct => s.valExprs
          case a: CreateArray => a.children
          case other => Seq(other)
        }
        val from = elems(es(1))
        val to = elems(es(2))
        require(from.length == to.length, "TRANSFORM lists must align")
        val default = if (es.length > 3) Some(es(3)) else None
        CaseWhen(from.zip(to).map { case (f, t) => (EqualTo(es(0), f), t) }, default)
      case es => throw new IllegalArgumentException(
        s"transform expects (expr, from, to[, default]) or (array, lambda), got ${es.length} args")
    }
  }
}
