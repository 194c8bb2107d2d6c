package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.graft.{shims => S}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-YSON → JSON shim (SURVEY.md §1.4: EFormatType::Yson,
  * format.h:49-62).
  *
  * YSON is the reference's document format for `Any` columns and I/O
  * (yt/docs/en/_includes/user-guide/storage/yson.md): maps
  * `{k=v;...}`, lists `[a;b]`, attributes `<k=v>node`, entity `#`,
  * `%true/%false`, int64 `42`, uint64 `42u`, double `3.14`, strings
  * quoted or bare-identifier. Our engine canonically carries `Any` as
  * a JSON string (types/YtTypes §1.2 mapping), so the format surface
  * is one total function text-YSON → JSON, exposed as a scalar
  * expression usable at scan time ([[Yson.ysonToJson]]).
  *
  * Attributed nodes use the reference's own JSON convention
  * (`$attributes`/`$value`, the same encoding its JSON format writes).
  * Entities become JSON null; uint64 keeps its decimal digits.
  */
object Yson {

  /** Parse one text-YSON document to a JSON string; malformed input →
    * null (the try_get_* contract). */
  def parseToJson(yson: String): String =
    try {
      val p = new Parser(yson)
      val sb = new java.lang.StringBuilder(yson.length + 16)
      p.parseNode(sb)
      p.skipWs()
      if (!p.atEnd) null else sb.toString
    } catch { case _: Exception => null }

  private final class Parser(s: String) {
    private var i = 0
    def atEnd: Boolean = i >= s.length
    def skipWs(): Unit = while (!atEnd && Character.isWhitespace(s.charAt(i))) i += 1
    private def fail(): Nothing = throw new IllegalArgumentException(s"bad yson at $i")
    private def expect(c: Char): Unit = { if (atEnd || s.charAt(i) != c) fail(); i += 1 }

    def parseNode(sb: java.lang.StringBuilder): Unit = {
      skipWs()
      if (atEnd) fail()
      s.charAt(i) match {
        case '<' =>
          // attributes: emit {"$attributes": {...}, "$value": node}
          sb.append("{\"$attributes\":")
          parseMapBody(sb, '<', '>')
          sb.append(",\"$value\":")
          parseNode(sb)
          sb.append('}')
        case '{' => parseMapBody(sb, '{', '}')
        case '[' =>
          expect('[')
          sb.append('[')
          var first = true
          skipWs()
          while (!atEnd && s.charAt(i) != ']') {
            if (!first) sb.append(',')
            first = false
            parseNode(sb)
            skipWs()
            if (!atEnd && s.charAt(i) == ';') { i += 1; skipWs() }
          }
          expect(']')
          sb.append(']')
        case '#' => i += 1; sb.append("null")
        case '%' =>
          i += 1
          if (s.startsWith("true", i)) { i += 4; sb.append("true") }
          else if (s.startsWith("false", i)) { i += 5; sb.append("false") }
          else fail()
        case '"' => sb.append(parseQuoted())
        case c if c == '-' || c == '+' || Character.isDigit(c) => parseNumber(sb)
        case c if isIdentStart(c) =>
          val start = i
          while (!atEnd && isIdentChar(s.charAt(i))) i += 1
          sb.append(jsonString(s.substring(start, i)))
        case _ => fail()
      }
    }

    private def parseMapBody(sb: java.lang.StringBuilder, open: Char, close: Char): Unit = {
      expect(open)
      sb.append('{')
      var first = true
      skipWs()
      while (!atEnd && s.charAt(i) != close) {
        if (!first) sb.append(',')
        first = false
        val key = parseKey()
        sb.append(key).append(':')
        skipWs(); expect('='); // key = value
        parseNode(sb)
        skipWs()
        if (!atEnd && s.charAt(i) == ';') { i += 1; skipWs() }
      }
      expect(close)
      sb.append('}')
    }

    private def parseKey(): String = {
      skipWs()
      if (atEnd) fail()
      if (s.charAt(i) == '"') parseQuoted()
      else {
        val start = i
        while (!atEnd && isIdentChar(s.charAt(i))) i += 1
        if (i == start) fail()
        jsonString(s.substring(start, i))
      }
    }

    private def parseQuoted(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder()
      while (!atEnd && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          val n = s.charAt(i + 1)
          n match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r'); case '\\' => sb.append('\\')
            case '"' => sb.append('"')
            case 'x' =>
              if (i + 3 >= s.length) fail()
              sb.append(Integer.parseInt(s.substring(i + 2, i + 4), 16).toChar)
              i += 2
            case other => sb.append(other)
          }
          i += 2
        } else { sb.append(c); i += 1 }
      }
      expect('"')
      jsonString(sb.toString)
    }

    private def parseNumber(sb: java.lang.StringBuilder): Unit = {
      val start = i
      if (s.charAt(i) == '-' || s.charAt(i) == '+') i += 1
      var isDouble = false
      while (!atEnd && (Character.isDigit(s.charAt(i)) || "+-.eE".indexOf(s.charAt(i)) >= 0)) {
        if (s.charAt(i) == '.' || s.charAt(i) == 'e' || s.charAt(i) == 'E') isDouble = true
        i += 1
      }
      var text = s.substring(start, i)
      if (!atEnd && s.charAt(i) == 'u') { i += 1 } // uint64 suffix
      if (isDouble) {
        java.lang.Double.parseDouble(text)
        // YSON allows `4.` / `.5`; JSON does not — canonicalize the edges
        if (text.endsWith(".")) text += "0"
        if (text.startsWith(".")) text = "0" + text
        else if (text.startsWith("-.")) text = "-0" + text.substring(1)
      } else java.lang.Long.parseLong(text)
      sb.append(text)
    }

    private def isIdentStart(c: Char): Boolean =
      Character.isLetter(c) || c == '_'
    private def isIdentChar(c: Char): Boolean =
      Character.isLetterOrDigit(c) || c == '_' || c == '-' || c == '.'

    /** One textual scalar atom (quoted string / number / %bool /
      * identifier) → JSON appended to `sb`; returns chars consumed or
      * -1. Used by the binary parser for interleaved text tokens. */
    def parseScalarToken(sb: java.lang.StringBuilder): Int = {
      val start = i
      if (atEnd) return -1
      s.charAt(i) match {
        case '"' => sb.append(parseQuoted()); i - start
        case '%' =>
          i += 1
          if (s.startsWith("true", i)) { i += 4; sb.append("true"); i - start }
          else if (s.startsWith("false", i)) { i += 5; sb.append("false"); i - start }
          else -1
        case c if c == '-' || c == '+' || Character.isDigit(c) =>
          parseNumber(sb); i - start
        case c if isIdentStart(c) =>
          while (!atEnd && isIdentChar(s.charAt(i))) i += 1
          sb.append(jsonString(s.substring(start, i))); i - start
        case _ => -1
      }
    }
  }

  private def jsonString(v: String): String = {
    val sb = new java.lang.StringBuilder(v.length + 2)
    sb.append('"')
    v.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  /** Binary (wire) YSON → JSON. Scalars use the marker bytes of
    * library/cpp/yson/detail.h:46-55 — 0x01 string (zigzag-varint32
    * length + bytes), 0x02 int64 (zigzag varint64), 0x03 double (8
    * bytes LE), 0x04 false, 0x05 true, 0x06 uint64 (plain varint64) —
    * while structure (`{}[]<>;=#`) and any interleaved textual scalars
    * keep the text syntax, so this parser accepts the same mixed
    * streams the reference's lexer does (parser_detail.h:115-199).
    * Malformed input → null, as [[parseToJson]].
    */
  def parseBinaryToJson(data: Array[Byte]): String =
    try {
      val p = new BinParser(data)
      val sb = new java.lang.StringBuilder(data.length + 16)
      p.parseNode(sb)
      p.skipWs()
      if (!p.atEnd) null else sb.toString
    } catch { case _: Exception => null }

  private final class BinParser(b: Array[Byte]) {
    private var i = 0
    def atEnd: Boolean = i >= b.length
    def skipWs(): Unit =
      while (!atEnd && Character.isWhitespace((b(i) & 0xff).toChar)) i += 1
    private def fail(): Nothing =
      throw new IllegalArgumentException(s"bad binary yson at $i")
    private def expect(c: Char): Unit = { if (atEnd || b(i) != c.toByte) fail(); i += 1 }

    private def varint64(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        if (atEnd) fail()
        val x = b(i); i += 1
        v |= (x.toLong & 0x7f) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
        if (shift > 63) fail()
      }
      v
    }
    private def zigzag(u: Long): Long = (u >>> 1) ^ -(u & 1L)

    def parseNode(sb: java.lang.StringBuilder): Unit = {
      skipWs()
      if (atEnd) fail()
      (b(i) & 0xff) match {
        case 0x01 => // binary string
          i += 1
          val len = zigzag(varint64()).toInt
          if (len < 0 || i + len > b.length) fail()
          sb.append(jsonString(new String(b, i, len, "UTF-8")))
          i += len
        case 0x02 => i += 1; sb.append(zigzag(varint64()).toString)
        case 0x03 => // double, 8 bytes LE
          i += 1
          if (i + 8 > b.length) fail()
          var bits = 0L; var j = 0
          while (j < 8) { bits |= (b(i + j).toLong & 0xff) << (8 * j); j += 1 }
          i += 8
          val d = java.lang.Double.longBitsToDouble(bits)
          if (d.isNaN || d.isInfinite) sb.append("null") else sb.append(d.toString)
        case 0x04 => i += 1; sb.append("false")
        case 0x05 => i += 1; sb.append("true")
        case 0x06 => i += 1; sb.append(java.lang.Long.toUnsignedString(varint64()))
        case '<' =>
          sb.append("{\"$attributes\":")
          parseMapBody(sb, '<', '>')
          sb.append(",\"$value\":")
          parseNode(sb)
          sb.append('}')
        case '{' => parseMapBody(sb, '{', '}')
        case '[' =>
          expect('[')
          sb.append('[')
          var first = true
          skipWs()
          while (!atEnd && b(i) != ']'.toByte) {
            if (!first) sb.append(',')
            first = false
            parseNode(sb)
            skipWs()
            if (!atEnd && b(i) == ';'.toByte) { i += 1; skipWs() }
          }
          expect(']')
          sb.append(']')
        case '#' => i += 1; sb.append("null")
        case _ =>
          // textual scalar inside a binary stream: delegate the token
          // to the text parser over the remaining bytes
          val rest = new String(b, i, b.length - i, "UTF-8")
          val consumed = textScalar(rest, sb)
          if (consumed <= 0) fail()
          // re-measure in bytes (the token is ASCII for numbers/idents
          // and utf-8 counted for quoted strings)
          i += rest.substring(0, consumed).getBytes("UTF-8").length
      }
    }

    private def parseMapBody(sb: java.lang.StringBuilder, open: Char, close: Char): Unit = {
      expect(open)
      sb.append('{')
      var first = true
      skipWs()
      while (!atEnd && b(i) != close.toByte) {
        if (!first) sb.append(',')
        first = false
        skipWs()
        // key: binary string marker or textual identifier/quoted
        if (!atEnd && (b(i) & 0xff) == 0x01) {
          i += 1
          val len = zigzag(varint64()).toInt
          if (len < 0 || i + len > b.length) fail()
          sb.append(jsonString(new String(b, i, len, "UTF-8")))
          i += len
        } else {
          val rest = new String(b, i, b.length - i, "UTF-8")
          val keySb = new java.lang.StringBuilder
          val consumed = textScalar(rest, keySb)
          if (consumed <= 0) fail()
          sb.append(keySb)
          i += rest.substring(0, consumed).getBytes("UTF-8").length
        }
        sb.append(':')
        skipWs(); expect('=')
        parseNode(sb)
        skipWs()
        if (!atEnd && b(i) == ';'.toByte) { i += 1; skipWs() }
      }
      expect(close)
      sb.append('}')
    }

    /** Parse one textual scalar (quoted string, number, %bool,
      * identifier) from `s`, appending its JSON to `sb`; returns chars
      * consumed. */
    private def textScalar(s: String, sb: java.lang.StringBuilder): Int = {
      val p = new Parser(s)
      p.parseScalarToken(sb)
    }
  }

  /** Codegen entry point: parse or null, staying in UTF8String. A
    * top-level object method has a JVM static forwarder, so generated
    * code calls it directly — the expression stays inside whole-stage
    * codegen, and repeated `ysonToJson(x)` calls in one projection
    * collapse via codegen subexpression elimination (the
    * CodegenFallback form re-parsed per accessor). */
  def parseOrNull(input: UTF8String): UTF8String = {
    val out = parseToJson(input.toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  case class YsonToJson(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      parseOrNull(input.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.sources.Yson.parseOrNull($c);
        ${ev.isNull} = ${ev.value} == null;
      """)
    override protected def withNewChildInternal(newChild: Expression): YsonToJson =
      copy(child = newChild)
  }

  /** Column form: `yson_string_to_any` (builtin_function_registry.cpp)
    * into our canonical JSON Any encoding. */
  def ysonToJson(yson: Column): Column = S.column(YsonToJson(S.expression(yson)))

  def parseBinaryOrNull(input: Array[Byte]): UTF8String = {
    val out = parseBinaryToJson(input)
    if (out == null) null else UTF8String.fromString(out)
  }

  /** Binary-YSON column (wire form) → canonical JSON Any. */
  case class YsonBinaryToJson(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(org.apache.spark.sql.types.BinaryType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      parseBinaryOrNull(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.sources.Yson.parseBinaryOrNull($c);
        ${ev.isNull} = ${ev.value} == null;
      """)
    override protected def withNewChildInternal(c: Expression): YsonBinaryToJson =
      copy(child = c)
  }

  def ysonBinaryToJson(yson: Column): Column =
    S.column(YsonBinaryToJson(S.expression(yson)))

  /** Canonical JSON Any → text YSON (the write side of the bridge, for
    * emitting job I/O in the reference's native format). Inverse of
    * [[parseToJson]] on its own output: `$attributes`/`$value` wrappers
    * fold back to `<attrs>value`, null → `#`, booleans → `%true/%false`,
    * strings always quoted. Numbers re-emit verbatim. */
  def jsonToYson(json: String): String = {
    import com.fasterxml.jackson.databind.JsonNode
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def emit(n: JsonNode, sb: java.lang.StringBuilder): Unit = {
      if (n.isNull) sb.append('#')
      else if (n.isBoolean) sb.append(if (n.asBoolean) "%true" else "%false")
      else if (n.isNumber) sb.append(n.asText)
      else if (n.isTextual) {
        sb.append('"')
        n.asText.foreach {
          case '"' => sb.append("\\\"")
          case '\\' => sb.append("\\\\")
          case '\n' => sb.append("\\n")
          case '\t' => sb.append("\\t")
          case '\r' => sb.append("\\r")
          case c => sb.append(c)
        }
        sb.append('"')
      } else if (n.isArray) {
        sb.append('[')
        val it = n.elements()
        while (it.hasNext) {
          emit(it.next(), sb)
          sb.append(';')
        }
        sb.append(']')
      } else if (n.has("$attributes") && n.has("$value")) {
        sb.append('<')
        emitMapBody(n.get("$attributes"), sb)
        sb.append('>')
        emit(n.get("$value"), sb)
      } else {
        sb.append('{')
        emitMapBody(n, sb)
        sb.append('}')
      }
    }
    def emitMapBody(n: JsonNode, sb: java.lang.StringBuilder): Unit = {
      // the reference's text writer terminates EVERY item with ';'
      // (test_query.py:1653 test_any_to_yson_string expects {"x"=7;})
      val it = n.fields()
      while (it.hasNext) {
        val e = it.next()
        sb.append('"')
        e.getKey.foreach {
          case '"' => sb.append("\\\""); case '\\' => sb.append("\\\\")
          case c => sb.append(c)
        }
        sb.append("\"=")
        emit(e.getValue, sb)
        sb.append(';')
      }
    }
    try {
      val sb = new java.lang.StringBuilder(json.length + 8)
      emit(mapper.readTree(json), sb)
      sb.toString
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Codegen entry point for the write side (same static-forwarder
    * trick as [[parseOrNull]]). */
  def jsonToYsonOrNull(input: UTF8String): UTF8String = {
    val out = jsonToYson(input.toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  /** `any_to_yson_string(any)` (builtin_function_registry.cpp,
    * test_query.py:1653): canonical JSON Any carrier → text YSON. */
  case class JsonToYsonText(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      jsonToYsonOrNull(input.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.sources.Yson.jsonToYsonOrNull($c);
        ${ev.isNull} = ${ev.value} == null;
      """)
    override protected def withNewChildInternal(c: Expression): JsonToYsonText =
      copy(child = c)
  }

  def anyToYsonString(any: Column): Column =
    S.column(JsonToYsonText(S.expression(any)))

  /** Typed comparison of two Any values (composite_compare.cpp:110-153
    * CompareYsonItems, cg_routines.cpp:3734 CompareAny): lists compare
    * itemwise with the shorter list first (EndList < value), entity
    * (null) sorts below every value, and mismatched scalar types order
    * by the EValueType rank (int < double < boolean < string < list).
    * Scalars of one type compare by value — strings bytewise, doubles
    * NaN-safe (NaN above all, NaN == NaN). Divergences from the JSON
    * carrier: int64/uint64 collapse into one integer rank, and maps
    * (incomparable in the reference — it throws) order last by their
    * serialized form.
    */
  // readTree is thread-safe; shared so per-row eval doesn't allocate a mapper
  private lazy val anyMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Thrown (stackless) when the streaming comparator meets a shape it
    * does not handle (objects, over-long integers, malformed input) —
    * the caller re-runs the Jackson tree comparison, which owns those
    * edges. */
  private object AnyCmpFallback
      extends scala.util.control.ControlThrowable("any-cmp-fallback")

  /** Streaming cursor over one canonical-JSON value; [[cmpStream]]
    * advances two in lock-step. */
  private final class AnyCur(val b: Array[Byte]) {
    var p = 0
    def skipWs(): Unit = {
      while (p < b.length && (b(p) == ' ' || b(p) == '\t' ||
        b(p) == '\n' || b(p) == '\r')) p += 1
    }
    def at: Byte = if (p < b.length) b(p) else { throw AnyCmpFallback }
    /** rank of the value starting at p (see [[compareAnyJson]]), without
      * consuming; numbers need a lookahead scan to split int/double. */
    def rank: Int = at match {
      case 'n' => 0
      case 't' | 'f' => 3
      case '"' => 4
      case '[' => 5
      case '{' => 6
      case c if c == '-' || (c >= '0' && c <= '9') =>
        var i = p
        if (b(i) == '-') i += 1
        while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
        if (i < b.length && (b(i) == '.' || b(i) == 'e' || b(i) == 'E')) 2
        else 1
      case _ => throw AnyCmpFallback
    }
    def expect(lit: String): Unit = {
      if (p + lit.length > b.length) throw AnyCmpFallback
      var i = 0
      while (i < lit.length) {
        if (b(p + i) != lit.charAt(i)) throw AnyCmpFallback
        i += 1
      }
      p += lit.length
    }
    /** consume an integral number; overflow → fallback (Jackson's
      * BigInteger truncation semantics live in the tree path). */
    def readLong(): Long = {
      var i = p
      var neg = false
      if (b(i) == '-') { neg = true; i += 1 }
      var v = 0L
      val i0 = i
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        val d = b(i) - '0'
        if (v > (Long.MaxValue - d) / 10) throw AnyCmpFallback
        v = v * 10 + d
        i += 1
      }
      if (i == i0) throw AnyCmpFallback
      p = i
      if (neg) -v else v
    }
    def readDouble(): Double = {
      var i = p
      if (i < b.length && b(i) == '-') i += 1
      while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
      if (i < b.length && b(i) == '.') {
        i += 1
        while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
      }
      if (i < b.length && (b(i) == 'e' || b(i) == 'E')) {
        i += 1
        if (i < b.length && (b(i) == '+' || b(i) == '-')) i += 1
        while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
      }
      val s = new String(b, p, i - p, java.nio.charset.StandardCharsets.US_ASCII)
      p = i
      try java.lang.Double.parseDouble(s)
      catch { case _: NumberFormatException => throw AnyCmpFallback }
    }
    /** consume a string; returns (start, end) of the raw bytes between
      * the quotes, or null via escape flag when a backslash appears (the
      * caller decodes). */
    def readStringSpan(): (Int, Int, Boolean) = {
      if (at != '"') throw AnyCmpFallback
      p += 1
      val start = p
      var esc = false
      while (p < b.length && b(p) != '"') {
        if (b(p) == '\\') {
          esc = true
          p += 1
          if (p >= b.length) throw AnyCmpFallback
        }
        p += 1
      }
      if (p >= b.length) throw AnyCmpFallback
      val end = p
      p += 1 // closing quote
      (start, end, esc)
    }
    /** JSON-unescape the span into a String (escapes present). */
    def decode(start: Int, end: Int): String = {
      val sb = new java.lang.StringBuilder(end - start)
      var i = start
      while (i < end) {
        val c = b(i)
        if (c == '\\') {
          i += 1
          b(i) match {
            case '"' => sb.append('"'); i += 1
            case '\\' => sb.append('\\'); i += 1
            case '/' => sb.append('/'); i += 1
            case 'b' => sb.append('\b'); i += 1
            case 'f' => sb.append('\f'); i += 1
            case 'n' => sb.append('\n'); i += 1
            case 'r' => sb.append('\r'); i += 1
            case 't' => sb.append('\t'); i += 1
            case 'u' =>
              if (i + 4 >= end) throw AnyCmpFallback
              var v = 0
              var k = 1
              while (k <= 4) {
                val h = Character.digit(b(i + k), 16)
                if (h < 0) throw AnyCmpFallback
                v = (v << 4) | h
                k += 1
              }
              sb.append(v.toChar)
              i += 5
            case _ => throw AnyCmpFallback
          }
        } else {
          // raw UTF-8 bytes pass through: appending each byte of a
          // multi-byte sequence as a char would mangle it, so decode
          // the maximal non-escape run at once
          var j = i
          while (j < end && b(j) != '\\') j += 1
          sb.append(new String(b, i, j - i,
            java.nio.charset.StandardCharsets.UTF_8))
          i = j
        }
      }
      sb.toString
    }
  }

  /** One comparison step: consumes exactly as much of each cursor as is
    * needed. Same order as the tree comparison; objects and numeric
    * edge cases punt to it via [[AnyCmpFallback]]. */
  private def cmpStream(a: AnyCur, c: AnyCur): Int = {
    a.skipWs(); c.skipWs()
    val (ra, rc) = (a.rank, c.rank)
    if (ra != rc) return Integer.compare(ra, rc)
    ra match {
      case 0 => a.expect("null"); c.expect("null"); 0
      case 1 => java.lang.Long.compare(a.readLong(), c.readLong())
      case 2 => java.lang.Double.compare(a.readDouble(), c.readDouble())
      case 3 =>
        val va = if (a.at == 't') { a.expect("true"); true }
          else { a.expect("false"); false }
        val vc = if (c.at == 't') { c.expect("true"); true }
          else { c.expect("false"); false }
        java.lang.Boolean.compare(va, vc)
      case 4 =>
        val (sa, ea, escA) = a.readStringSpan()
        val (sc_, ec, escC) = c.readStringSpan()
        if (!escA && !escC) {
          // raw UTF-8 bytes compare == decoded-text byte compare when
          // no escapes are present
          var i = 0
          val n = math.min(ea - sa, ec - sc_)
          while (i < n) {
            val d = (a.b(sa + i) & 0xff) - (c.b(sc_ + i) & 0xff)
            if (d != 0) return Integer.signum(d)
            i += 1
          }
          Integer.compare(ea - sa, ec - sc_)
        } else {
          val xa = a.decode(sa, ea)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val xc = c.decode(sc_, ec)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          java.util.Arrays.compareUnsigned(xa, xc)
        }
      case 5 =>
        a.expect("["); c.expect("[")
        a.skipWs(); c.skipWs()
        var doneA = a.at == ']'
        var doneC = c.at == ']'
        while (!doneA && !doneC) {
          val d = cmpStream(a, c)
          // a non-zero element verdict propagates straight to the top —
          // cursor positions no longer matter
          if (d != 0) return d
          a.skipWs(); c.skipWs()
          if (a.at == ',') { a.p += 1; a.skipWs() }
          else if (a.at == ']') doneA = true
          else throw AnyCmpFallback
          if (c.at == ',') { c.p += 1; c.skipWs() }
          else if (c.at == ']') doneC = true
          else throw AnyCmpFallback
        }
        // consume the terminators so an ENCLOSING array's scan resumes
        // cleanly after an all-equal nested pair
        if (doneA) a.expect("]")
        if (doneC) c.expect("]")
        // EndList < any value: the shorter list sorts first
        if (doneA && doneC) 0 else if (doneA) -1 else 1
      case _ => throw AnyCmpFallback // objects: serialized-form order
    }
  }

  def compareAnyJson(l: UTF8String, r: UTF8String): Int =
    try cmpStream(new AnyCur(l.getBytes), new AnyCur(r.getBytes))
    catch { case AnyCmpFallback => compareAnyJsonTree(l, r) }

  /** Jackson tree comparison — the fallback arbiter for shapes the
    * streaming path punts on, and the semantics reference for it. */
  def compareAnyJsonTree(l: UTF8String, r: UTF8String): Int = {
    import com.fasterxml.jackson.databind.JsonNode
    def rank(n: JsonNode): Int =
      if (n.isNull) 0
      else if (n.isIntegralNumber) 1
      else if (n.isFloatingPointNumber) 2
      else if (n.isBoolean) 3
      else if (n.isTextual) 4
      else if (n.isArray) 5
      else 6
    def cmpBytes(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      java.util.Arrays.compareUnsigned(x, y)
    }
    def cmp(a: JsonNode, b: JsonNode): Int = {
      val (ra, rb) = (rank(a), rank(b))
      if (ra != rb) Integer.compare(ra, rb)
      else ra match {
        case 0 => 0
        case 1 => java.lang.Long.compare(a.asLong, b.asLong)
        case 2 => java.lang.Double.compare(a.asDouble, b.asDouble)
        case 3 => java.lang.Boolean.compare(a.asBoolean, b.asBoolean)
        case 4 => cmpBytes(a.asText, b.asText)
        case 5 =>
          val (ia, ib) = (a.elements(), b.elements())
          var res = 0
          while (res == 0 && ia.hasNext && ib.hasNext) res = cmp(ia.next(), ib.next())
          if (res != 0) res
          else Integer.compare(a.size, b.size) // EndList < any value
        case _ => cmpBytes(a.toString, b.toString)
      }
    }
    cmp(anyMapper.readTree(l.toString), anyMapper.readTree(r.toString))
  }

  case class AnyCompare(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType, StringType)
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def nullable: Boolean = true
    override def nullSafeEval(l: Any, r: Any): Any =
      compareAnyJson(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) =>
        s"${ev.value} = graft.sources.Yson.compareAnyJson($l, $r);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): AnyCompare =
      copy(left = newLeft, right = newRight)
  }

  def anyCompare(a: Column, b: Column): Column =
    S.column(AnyCompare(S.expression(a), S.expression(b)))

  /** Order-preserving byte encoding of an Any value: unsigned
    * lexicographic order of the output equals [[compareAnyJson]]'s
    * typed order (the same trick as the reference's key encoding used
    * for sorting composite values). Layout: 1 rank byte (null 0, int 1,
    * double 2, bool 3, string 4, list 5, map 6), then int64 as
    * big-endian with the sign bit flipped, double via the
    * total-order bit trick, strings 0x00-escaped (0x00→0x00 0x01) with
    * a 0x00 0x00 terminator, lists as 0x01-prefixed items closed by
    * 0x00 (EndList sorts below any value). Makes ORDER BY / range
    * partitioning on Any columns a plain binary sort — distributed,
    * no custom comparator. */
  def anySortKeyBytes(s: UTF8String): Array[Byte] = {
    import com.fasterxml.jackson.databind.JsonNode
    val out = new java.io.ByteArrayOutputStream(64)
    def writeLong(v: Long): Unit = {
      var i = 56
      while (i >= 0) { out.write(((v >>> i) & 0xff).toInt); i -= 8 }
    }
    def writeEscaped(bytes: Array[Byte]): Unit = {
      var i = 0
      while (i < bytes.length) {
        out.write(bytes(i))
        if (bytes(i) == 0) out.write(1)
        i += 1
      }
      out.write(0); out.write(0)
    }
    def enc(n: JsonNode): Unit = {
      if (n.isNull) out.write(0)
      else if (n.isIntegralNumber) { out.write(1); writeLong(n.asLong ^ Long.MinValue) }
      else if (n.isFloatingPointNumber) {
        out.write(2)
        val bits = java.lang.Double.doubleToLongBits(n.asDouble) // canonical NaN > +inf
        writeLong(if (bits < 0) ~bits else bits ^ Long.MinValue)
      } else if (n.isBoolean) { out.write(3); out.write(if (n.asBoolean) 1 else 0) }
      else if (n.isTextual) {
        out.write(4)
        writeEscaped(n.asText.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } else if (n.isArray) {
        out.write(5)
        val it = n.elements()
        while (it.hasNext) { out.write(1); enc(it.next()) }
        out.write(0)
      } else {
        out.write(6)
        writeEscaped(n.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    enc(anyMapper.readTree(s.toString))
    out.toByteArray
  }

  case class AnySortKey(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = org.apache.spark.sql.types.BinaryType
    override protected def nullSafeEval(v: Any): Any =
      anySortKeyBytes(v.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.sources.Yson.anySortKeyBytes($c)")
    override protected def withNewChildInternal(c: Expression): AnySortKey =
      copy(child = c)
  }

  def anySortKey(a: Column): Column = S.column(AnySortKey(S.expression(a)))

  /** YPath → JSON path over the canonical-JSON Any carrier, with the
    * reference's error surface (ypath.cpp via DEFINE_YPATH_GET: the
    * path is tokenized strictly — empty segments and attribute steps
    * are errors, ql_query_ut.cpp YPathGetInt64Fail's `//d/1`, `/@d/1`
    * rows). Digit-only segments address list items. Strict on purpose:
    * a malformed path is a query error even under try_get_*, while a
    * MISSING path is a null (that part is GetJsonObject's contract).
    */
  def ypathToJsonPathStrict(raw: String): String = {
    if (raw.isEmpty) return "$"
    if (!raw.startsWith("/"))
      throw new IllegalArgumentException(
        s"malformed ypath '$raw': expected '/' at the start")
    val sb = new java.lang.StringBuilder("$")
    raw.substring(1).split("/", -1).foreach { seg =>
      if (seg.isEmpty)
        throw new IllegalArgumentException(
          s"malformed ypath '$raw': empty path segment")
      if (seg.startsWith("@"))
        throw new IllegalArgumentException(
          s"unsupported ypath '$raw': attribute access")
      if (seg.forall(_.isDigit)) sb.append('[').append(seg).append(']')
      else sb.append('.').append(seg)
    }
    sb.toString
  }

  def ypathOrThrow(input: UTF8String): UTF8String =
    UTF8String.fromString(ypathToJsonPathStrict(input.toString))

  private val rawMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** One-row tree cache: accessors run consecutively over the same row
    * inside the codegen loop, so `try_get_int64(props, p),
    * try_get_any(props, p)` hit the same doc back-to-back — the second
    * parse is free. Thread-local (one per task thread), keyed by the
    * doc's content. */
  private val lastTree =
    new ThreadLocal[(String, com.fasterxml.jackson.databind.JsonNode)]()
  private def treeOf(doc: String): com.fasterxml.jackson.databind.JsonNode = {
    val cached = lastTree.get()
    if (cached != null && cached._1 == doc) cached._2
    else {
      val t = rawMapper.readTree(doc)
      lastTree.set((doc, t))
      t
    }
  }

  /** Navigate a JSON-path (as produced by [[ypathToJsonPathStrict]]:
    * `$`, `.name`, `[idx]` steps) and return the RAW JSON fragment —
    * string leaves keep their quotes, composites serialize as JSON.
    * This is the `get_any`/`try_get_any` result type: the Any carrier
    * itself, not an unquoted scalar (get_json_object strips quotes,
    * which breaks Any-to-Any comparison against to_any(...) values).
    * Missing path / malformed doc → null. */
  private def navigate(doc: String, p: String): com.fasterxml.jackson.databind.JsonNode = {
    var node = treeOf(doc)
    var i = if (p.startsWith("$")) 1 else 0
    while (node != null && i < p.length) {
      p.charAt(i) match {
        case '.' =>
          var j = i + 1
          while (j < p.length && p.charAt(j) != '.' && p.charAt(j) != '[') j += 1
          node = node.get(p.substring(i + 1, j))
          i = j
        case '[' =>
          val j = p.indexOf(']', i)
          node = node.get(p.substring(i + 1, j).toInt)
          i = j + 1
        case _ => return null
      }
    }
    node
  }

  // ——— streaming accessor fast path ———————————————————————————————
  //
  // The tree accessors below pay one UTF8String→String conversion per
  // call plus a Jackson parser/tree per distinct document (and Spark's
  // own GetJsonObject pays a parser PER ROW — its buffer-recycler
  // lookup was the hottest executor frame on the accessor benches).
  // This walker navigates the pre-lowered `$`/`.name`/`[idx]` path
  // grammar directly over the document's UTF-8 bytes in ONE strict
  // validating pass, allocation-free until extraction. It returns a
  // value ONLY when it can prove the arbiter would return the same
  // bytes; every shape where Jackson's tree (`mode = tree`) or Spark's
  // GetJsonObject (`mode = spark`) could differ from the raw span —
  // escaped strings in raw mode, doubles whose text is not the
  // Double.toString fixpoint (both arbiters print via Double.toString:
  // Jackson's fast double writer is off by default), `-0`, whitespace
  // or duplicate keys inside a composite span, escaped keys at a
  // navigated level, trailing bytes after the root value (readTree
  // ignores them, GetJsonObject rejects), over-deep nesting — PUNTS to
  // the original arbiter via a stackless throwable. Malformed JSON
  // anywhere in the document returns SQL NULL, which both arbiters do.

  private[graft] object JsonFastPunt
      extends scala.util.control.ControlThrowable("json-fast-punt")
  private object JsonBad
      extends scala.util.control.ControlThrowable("json-malformed")

  /** True when both arbiters would print this JSON number token
    * exactly as written. */
  private def numCanonical(b: Array[Byte], s: Int, e: Int): Boolean = {
    var isInt = true
    var i = s
    while (i < e) {
      val c = b(i)
      if (c == '.' || c == 'e' || c == 'E') isInt = false
      i += 1
    }
    if (isInt) !(e - s == 2 && b(s) == '-' && b(s + 1) == '0') // "-0" → "0"
    else if (e - s > 32) false
    else {
      val t = new String(b, s, e - s, java.nio.charset.StandardCharsets.US_ASCII)
      try java.lang.Double.toString(java.lang.Double.parseDouble(t)) == t
      catch { case _: NumberFormatException => false }
    }
  }

  /** One navigating + validating pass; see the block comment above. */
  private final class JsonWalker(b: Array[Byte], path: String, raw: Boolean,
      sparkMode: Boolean) {
    private var p = 0
    private var depth = 0
    private def punt(): Nothing = throw JsonFastPunt
    private def bad(): Nothing = throw JsonBad

    // pre-parsed path: Array[Byte] = object key, Integer = list index
    private val steps: Array[AnyRef] = {
      if (path.isEmpty || path.charAt(0) != '$') punt()
      val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
      var i = 1
      while (i < path.length) {
        path.charAt(i) match {
          case '.' =>
            var j = i + 1
            while (j < path.length && path.charAt(j) != '.' &&
              path.charAt(j) != '[') j += 1
            if (j == i + 1) punt()
            val key = path.substring(i + 1, j)
            if (key.exists(c => c == '\\' || c == '"' || c < ' ')) punt()
            out += key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            i = j
          case '[' =>
            val j = path.indexOf(']', i)
            if (j < 0) punt()
            val t = path.substring(i + 1, j)
            if (t.isEmpty || !t.forall(_.isDigit) || t.length > 9) punt()
            out += Integer.valueOf(t.toInt)
            i = j + 1
          case _ => punt()
        }
      }
      out.toArray
    }

    // matched span
    private var found = false
    private var s0 = -1
    private var s1 = -1
    // canonicality of a composite span (raw bytes == re-serialization)
    private var inSpan = false
    private var spanCanonical = true

    private def skipWs(): Unit =
      while (p < b.length && (b(p) == ' ' || b(p) == '\t' || b(p) == '\n' ||
        b(p) == '\r')) { if (inSpan) spanCanonical = false; p += 1 }

    def run(): Any = {
      skipWs()
      value(0)
      skipWs()
      if (p < b.length) punt() // trailing bytes: arbiters disagree
      if (!found) return null  // valid document, missing path
      extract()
    }

    /** Parse one value; `si` is the position in `steps` this value sits
      * at (si == steps.length ⇒ this value IS the target; -1 ⇒ pure
      * validation). */
    private def value(si: Int): Unit = {
      skipWs()
      if (p >= b.length) bad()
      if (si == steps.length && !found) {
        s0 = p
        inSpan = true
        dispatch(-1)
        s1 = p
        inSpan = false
        found = true
      } else dispatch(si)
    }

    private def dispatch(si: Int): Unit = b(p) match {
      case '{' => obj(si)
      case '[' => arr(si)
      case '"' => str()
      case 't' => lit3("true")
      case 'f' => lit3("false")
      case 'n' => lit3("null")
      case c if c == '-' || (c >= '0' && c <= '9') => num()
      case _ => bad()
    }

    private def lit3(s: String): Unit = {
      if (p + s.length > b.length) bad()
      var i = 0
      while (i < s.length) {
        if (b(p + i) != s.charAt(i)) bad()
        i += 1
      }
      p += s.length
    }

    /** String token: validates escapes and control bytes; returns
      * (contentStart, contentEnd, sawEscape); cursor past the quote. */
    private def str(): (Int, Int, Boolean) = {
      if (b(p) != '"') bad()
      p += 1
      val start = p
      var esc = false
      while (p < b.length && b(p) != '"') {
        val c = b(p)
        if (c == '\\') {
          esc = true
          if (inSpan) spanCanonical = false
          p += 1
          if (p >= b.length) bad()
          b(p) match {
            case '"' | '\\' | '/' | 'b' | 'f' | 'n' | 'r' | 't' => p += 1
            case 'u' =>
              if (p + 4 >= b.length) bad()
              var k = 1
              while (k <= 4) {
                if (Character.digit(b(p + k), 16) < 0) bad()
                k += 1
              }
              p += 5
            case _ => bad()
          }
        } else if ((c & 0xff) < 0x20) bad() // raw control char: rejected
        else p += 1
      }
      if (p >= b.length) bad()
      val end = p
      p += 1
      (start, end, esc)
    }

    private def num(): Unit = {
      val start = p
      if (b(p) == '-') p += 1
      if (p >= b.length) bad()
      // int part: 0 | [1-9][0-9]*
      if (b(p) == '0') p += 1
      else if (b(p) >= '1' && b(p) <= '9') {
        while (p < b.length && b(p) >= '0' && b(p) <= '9') p += 1
      } else bad()
      if (p < b.length && b(p) == '.') {
        p += 1
        if (p >= b.length || b(p) < '0' || b(p) > '9') bad()
        while (p < b.length && b(p) >= '0' && b(p) <= '9') p += 1
      }
      if (p < b.length && (b(p) == 'e' || b(p) == 'E')) {
        p += 1
        if (p < b.length && (b(p) == '+' || b(p) == '-')) p += 1
        if (p >= b.length || b(p) < '0' || b(p) > '9') bad()
        while (p < b.length && b(p) >= '0' && b(p) <= '9') p += 1
      }
      if (p - start > 900) punt() // Jackson number-length constraint zone
      if (inSpan && spanCanonical && !numCanonical(b, start, p))
        spanCanonical = false
    }

    private def bytesEq(s: Int, e: Int, k: Array[Byte]): Boolean = {
      if (e - s != k.length) return false
      var i = 0
      while (i < k.length) {
        if (b(s + i) != k(i)) return false
        i += 1
      }
      true
    }

    private def obj(si: Int): Unit = {
      depth += 1
      if (depth > 400) punt() // near Jackson's depth constraint: punt
      val targetKey: Array[Byte] =
        if (si >= 0 && si < steps.length) steps(si) match {
          case k: Array[Byte] => k
          case _ => null
        } else null
      p += 1
      skipWs()
      // duplicate-key detection inside a composite span: the tree
      // arbiter collapses duplicates (last value, first position), so a
      // span object with any duplicate key is non-canonical
      var keys: scala.collection.mutable.ArrayBuffer[(Int, Int)] =
        if (inSpan && spanCanonical) scala.collection.mutable.ArrayBuffer.empty
        else null
      var matchedTarget = false
      if (p < b.length && b(p) == '}') { p += 1; depth -= 1; return }
      var continue = true
      while (continue) {
        skipWs()
        if (p >= b.length) bad()
        val (ks, ke, kesc) = str()
        if (keys != null) {
          def sameSpan(a1: Int, e1: Int): Boolean = {
            if (e1 - a1 != ke - ks) false
            else {
              var i = 0
              var eq = true
              while (eq && i < ke - ks) { eq = b(a1 + i) == b(ks + i); i += 1 }
              eq
            }
          }
          if (keys.exists { case (a, e2) => sameSpan(a, e2) }) spanCanonical = false
          else keys += ((ks, ke))
          if (kesc) spanCanonical = false
        }
        skipWs()
        if (p >= b.length || b(p) != ':') bad()
        p += 1
        if (targetKey != null && kesc) punt() // escaped key could decode-match
        if (targetKey != null && !kesc && bytesEq(ks, ke, targetKey)) {
          if (matchedTarget) punt() // duplicate of a navigated key
          matchedTarget = true
          value(si + 1)
        } else value(-1)
        skipWs()
        if (p >= b.length) bad()
        b(p) match {
          case ',' => p += 1
          case '}' => p += 1; continue = false
          case _ => bad()
        }
      }
      depth -= 1
    }

    private def arr(si: Int): Unit = {
      depth += 1
      if (depth > 400) punt()
      val targetIdx: Int =
        if (si >= 0 && si < steps.length) steps(si) match {
          case i: Integer => i.intValue
          case _ => -1
        } else -1
      p += 1
      skipWs()
      if (p < b.length && b(p) == ']') { p += 1; depth -= 1; return }
      var idx = 0
      var continue = true
      while (continue) {
        if (targetIdx == idx) value(si + 1) else value(-1)
        skipWs()
        if (p >= b.length) bad()
        b(p) match {
          case ',' => p += 1; idx += 1
          case ']' => p += 1; continue = false
          case _ => bad()
        }
      }
      depth -= 1
    }

    private def extract(): Any = b(s0) match {
      case '"' =>
        var hasEsc = false
        var i = s0 + 1
        while (i < s1 - 1 && !hasEsc) { if (b(i) == '\\') hasEsc = true; i += 1 }
        if (raw) {
          if (hasEsc) punt() // re-escaping may differ (\b/\f/\uXXXX forms)
          else UTF8String.fromBytes(b, s0, s1 - s0)
        } else if (!hasEsc) UTF8String.fromBytes(b, s0 + 1, s1 - s0 - 2)
        else { // decode escapes exactly as the arbiters do
          val cur = new AnyCur(b)
          UTF8String.fromString(cur.decode(s0 + 1, s1 - 1))
        }
      case '{' | '[' =>
        if (spanCanonical) UTF8String.fromBytes(b, s0, s1 - s0) else punt()
      case 't' => UTF8String.fromString("true")
      case 'f' => UTF8String.fromString("false")
      case 'n' =>
        // raw (Any-carrier) form: the fragment text. Scalar forms: the
        // tree navigator maps a JSON null to SQL NULL at any depth;
        // Spark's evaluator maps it to SQL NULL only when the FINAL
        // path step is an object key (`.name`) — a null matched by the
        // root `$` or an array index emits the text "null" (probed
        // behavior, pinned by JsonFastSpec).
        if (raw || (sparkMode && (steps.length == 0 ||
            steps.last.isInstanceOf[Integer])))
          UTF8String.fromString("null")
        else null
      case _ =>
        if (numCanonical(b, s0, s1)) UTF8String.fromBytes(b, s0, s1 - s0)
        else punt()
    }
  }

  /** Fast-path accessor: UTF8String result, null for SQL NULL; throws
    * [[JsonFastPunt]] when the arbiter must decide. */
  private def fastJsonGet(doc: UTF8String, path: UTF8String,
      raw: Boolean, sparkMode: Boolean = false): Any =
    try new JsonWalker(doc.getBytes, path.toString, raw, sparkMode).run()
    catch { case JsonBad => null }

  /** [[jsonGetScalar]] semantics through the walker; tree fallback. */
  def jsonGetScalarFast(doc: UTF8String, path: UTF8String): UTF8String = {
    if (doc == null || path == null) return null
    try fastJsonGet(doc, path, raw = false).asInstanceOf[UTF8String]
    catch { case JsonFastPunt => jsonGetScalar(doc, path) }
  }

  /** [[jsonGetRaw]] semantics through the walker; tree fallback. */
  def jsonGetRawFast(doc: UTF8String, path: UTF8String): UTF8String = {
    if (doc == null || path == null) return null
    try fastJsonGet(doc, path, raw = true).asInstanceOf[UTF8String]
    catch { case JsonFastPunt => jsonGetRaw(doc, path) }
  }

  /** Spark-GetJsonObject semantics through the walker; on punt, the
    * genuine article decides (per-thread evaluator, path re-set per
    * call — fallbacks are rare). */
  private val sparkGjoTl =
    new ThreadLocal[org.apache.spark.sql.catalyst.expressions.json.GetJsonObjectEvaluator]()
  def getJsonObjectFast(doc: UTF8String, path: UTF8String): UTF8String = {
    if (doc == null || path == null) return null
    try fastJsonGet(doc, path, raw = false, sparkMode = true)
      .asInstanceOf[UTF8String]
    catch {
      case JsonFastPunt =>
        var ev = sparkGjoTl.get()
        if (ev == null) {
          ev = org.apache.spark.sql.catalyst.expressions.json
            .GetJsonObjectEvaluator(null)
          sparkGjoTl.set(ev)
        }
        ev.setJson(doc)
        ev.setPath(path)
        ev.evaluate().asInstanceOf[UTF8String]
    }
  }

  /** get_json_object with the walker fast path — drop-in for Spark's
    * GetJsonObject on the engine's lowered accessor paths (identical
    * output by the punt rules above; the real evaluator arbitrates
    * every punt). */
  case class JsonGetSpark(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType, StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override protected def nullSafeEval(doc: Any, path: Any): Any =
      getJsonObjectFast(doc.asInstanceOf[UTF8String], path.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (d, p) => s"""
        ${ev.value} = graft.sources.Yson.getJsonObjectFast($d, $p);
        ${ev.isNull} = ${ev.value} == null;
      """)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JsonGetSpark =
      copy(left = l, right = r)
  }

  def getJsonFast(doc: Column, path: Column): Column =
    S.column(JsonGetSpark(S.expression(doc), S.expression(path)))

  def jsonGetRaw(doc: UTF8String, path: UTF8String): UTF8String = {
    if (doc == null || path == null) return null
    try {
      val node = navigate(doc.toString, path.toString)
      if (node == null || node.isMissingNode) null
      else UTF8String.fromString(node.toString)
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** get_json_object semantics over the same navigator (string leaves
    * unquoted, composites serialized, JSON null / missing → SQL null) —
    * the runtime-path scalar accessor. Spark's GetJsonObject re-parses
    * its JSON path per row when the path is non-foldable (a
    * RegexParsers grammar — the dominant cost of column-valued ypaths);
    * this walks the pre-lowered `$.a[0].b` form directly and shares the
    * one-row tree cache with [[jsonGetRaw]]. */
  def jsonGetScalar(doc: UTF8String, path: UTF8String): UTF8String = {
    if (doc == null || path == null) return null
    try {
      val node = navigate(doc.toString, path.toString)
      if (node == null || node.isMissingNode || node.isNull) null
      else if (node.isTextual) UTF8String.fromString(node.textValue)
      else UTF8String.fromString(node.toString)
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Runtime-path counterpart of GetJsonObject (see [[jsonGetScalar]]). */
  case class JsonGetScalar(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType, StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override protected def nullSafeEval(doc: Any, path: Any): Any =
      jsonGetScalarFast(doc.asInstanceOf[UTF8String], path.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (d, p) => s"""
        ${ev.value} = graft.sources.Yson.jsonGetScalarFast($d, $p);
        ${ev.isNull} = ${ev.value} == null;
      """)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JsonGetScalar =
      copy(left = l, right = r)
  }

  /** An Any-carrier JSON array → its elements as canonical JSON
    * fragments (string leaves keep quotes, entities are SQL NULL
    * elements). Non-array / malformed input → null. Both sides of an
    * Any-list operation see the same canonical encoding, so fragment
    * equality IS carrier equality. */
  def jsonArrayFragments(doc: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (doc == null) return null
    try {
      val node = rawMapper.readTree(doc.toString)
      if (node == null || !node.isArray) return null
      val out = new Array[Any](node.size)
      var i = 0
      while (i < node.size) {
        val el = node.get(i)
        out(i) = if (el.isNull) null else UTF8String.fromString(el.toString)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Typed element extraction for Yson::ConvertTo*List/Dict
    * (yson2 udf docs): container mismatch → null result; element type
    * mismatch raises (the reference's strict default); entities are
    * null elements. kind ∈ any|string|int64|uint64|double|bool. */
  private def typedOf(el: com.fasterxml.jackson.databind.JsonNode,
      kind: String): Any = {
    if (el == null || el.isNull) return null
    kind match {
      case "any" => UTF8String.fromString(el.toString)
      case "string" =>
        if (!el.isTextual)
          throw new IllegalArgumentException(
            s"Yson::ConvertTo: expected string, got: ${el.toString.take(40)}")
        UTF8String.fromString(el.asText)
      case "int64" =>
        if (!el.canConvertToLong || !el.isIntegralNumber)
          throw new IllegalArgumentException(
            s"Yson::ConvertTo: expected int64, got: ${el.toString.take(40)}")
        el.asLong
      case "uint64" =>
        if (!el.isIntegralNumber)
          throw new IllegalArgumentException(
            s"Yson::ConvertTo: expected uint64, got: ${el.toString.take(40)}")
        java.lang.Long.parseUnsignedLong(el.asText)
      case "double" =>
        if (!el.isNumber)
          throw new IllegalArgumentException(
            s"Yson::ConvertTo: expected double, got: ${el.toString.take(40)}")
        el.asDouble
      case "bool" =>
        if (!el.isBoolean)
          throw new IllegalArgumentException(
            s"Yson::ConvertTo: expected bool, got: ${el.toString.take(40)}")
        el.asBoolean
    }
  }

  def jsonArrayTyped(doc: UTF8String, kind: String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    if (doc == null) return null
    val node =
      try rawMapper.readTree(doc.toString)
      catch { case scala.util.control.NonFatal(_) => return null }
    if (node == null || !node.isArray) return null
    val out = new Array[Any](node.size)
    var i = 0
    while (i < node.size) { out(i) = typedOf(node.get(i), kind); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def jsonDictTyped(doc: UTF8String, kind: String)
      : org.apache.spark.sql.catalyst.util.MapData = {
    if (doc == null) return null
    val node =
      try rawMapper.readTree(doc.toString)
      catch { case scala.util.control.NonFatal(_) => return null }
    if (node == null || !node.isObject) return null
    val ks = new Array[Any](node.size)
    val vs = new Array[Any](node.size)
    val it = node.fields()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      ks(i) = UTF8String.fromString(e.getKey)
      vs(i) = typedOf(e.getValue, kind)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(ks),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(vs))
  }

  // ——— Yson::Options modes (yson2_udf.cpp:33-99 TOptions +
  // minikql/dom/convert.h conversion tables). A mode is one of:
  //   legacy  — the engine's pre-Options posture (kept verbatim so the
  //             no-options call sites keep their proven semantics)
  //   strict  — type mismatch fails the query (convert.h `Strict`)
  //   lenient — Strict=false: mismatch → NULL scalar; list/dict
  //             conversions DROP unconvertible elements and a
  //             non-container input becomes an EMPTY container
  //             (ConvertToListImpl yson2_udf.cpp:203-252)
  //   auto    — AutoConvert=true: scalars coerce per convert.h
  //             (numbers↔bool, string parse-or-zero, entity/containers
  //             → zero values); checked BEFORE Strict in every table.

  private def convFail(what: String, node: com.fasterxml.jackson.databind.JsonNode): Nothing =
    throw new IllegalArgumentException(
      s"Yson::ConvertTo: cannot parse $what value from " +
        (if (node == null) "malformed input" else node.toString.take(60)))

  /** AutoConvert coercion table (convert.h, the `AutoConvert` arms). */
  private def autoOf(node: com.fasterxml.jackson.databind.JsonNode,
      target: String): Any = target match {
    case "bool" =>
      if (node.isNull) false
      else if (node.isNumber) node.asDouble != 0.0
      else if (node.isArray || node.isObject) node.size > 0
      else node.asText.nonEmpty // string not "true"/"false"
    case "int64" | "uint64" =>
      if (node.isNull || node.isArray || node.isObject) 0L
      else if (node.isBoolean) { if (node.asBoolean) 1L else 0L }
      else if (node.isTextual) {
        // FromStringWithDefault(str, 0): full integer parse or zero
        val t = node.asText
        try {
          if (target == "uint64") java.lang.Long.parseUnsignedLong(t)
          else java.lang.Long.parseLong(t)
        } catch { case _: NumberFormatException => 0L }
      } else if (node.isIntegralNumber) node.bigIntegerValue.longValue // wrap
      else node.asDouble.toLong // C-cast truncation toward zero
    case "double" =>
      if (node.isNull || node.isArray || node.isObject) 0.0
      else if (node.isBoolean) { if (node.asBoolean) 1.0 else 0.0 }
      else if (node.isTextual) {
        try java.lang.Double.parseDouble(node.asText)
        catch { case _: NumberFormatException => 0.0 }
      } else node.asDouble
    case _ => // string
      if (node.isNull || node.isArray || node.isObject)
        UTF8String.fromString("")
      else UTF8String.fromString(node.asText) // bool → true/false, numbers → decimal text
  }

  /** One node → target scalar under (strict, auto) — the four
    * ConvertTo{Bool,Integral,Float,String} tables of convert.h.
    * Returns null for a lenient mismatch. */
  private[graft] def convertNode(node: com.fasterxml.jackson.databind.JsonNode,
      target: String, strict: Boolean, auto: Boolean): Any = {
    if (node == null || node.isMissingNode) return null
    // attributed carrier {"$attributes":..,"$value":..} = ENodeType::Attr
    if (node.isObject && node.has("$value") && node.has("$attributes"))
      return convertNode(node.get("$value"), target, strict, auto)
    def miss(what: String): Any =
      if (auto) autoOf(node, target)
      else if (strict) convFail(what, node)
      else null
    target match {
      case "bool" =>
        if (node.isBoolean) node.asBoolean
        else if (node.isTextual) node.asText match {
          case "true" => true
          case "false" => false
          case _ => miss("boolean")
        }
        else miss("boolean")
      case "int64" =>
        if (!node.isIntegralNumber) miss("integer")
        else if (auto) node.bigIntegerValue.longValue // wrap-through
        else {
          val big = node.bigIntegerValue
          if (big.bitLength <= 63) big.longValue
          else if (strict) convFail("integer", node) else null
        }
      case "uint64" =>
        if (!node.isIntegralNumber) miss("integer")
        else if (auto) node.bigIntegerValue.longValue
        else {
          val big = node.bigIntegerValue
          if (big.signum >= 0 && big.bitLength <= 64) big.longValue
          else if (strict) convFail("integer", node) else null
        }
      case "double" =>
        // int64/uint64/double ALWAYS convert (ConvertToFloat)
        if (node.isNumber) node.asDouble else miss("floating point")
      case _ => // string
        if (node.isTextual) UTF8String.fromString(node.asText)
        else miss("string")
    }
  }

  /** Root-scalar conversion with an explicit Options mode. */
  def convertScalar(doc: UTF8String, target: String,
      strict: Boolean, auto: Boolean): Any = {
    if (doc == null) return null
    // Strict mode errors on input that is not parseable Yson/Json
    // (dom/convert.h docs); only the lenient modes map it to NULL.
    val node =
      try rawMapper.readTree(doc.toString)
      catch {
        case scala.util.control.NonFatal(e) =>
          if (strict) throw new IllegalArgumentException(
            s"Yson::ConvertTo (Strict): unparseable input: ${e.getMessage}")
          return null
      }
    convertNode(node, target, strict, auto)
  }

  /** Yson::ConvertToX(node, Yson::Options(...)) — the scalar family
    * with an explicit mode (the no-options sites keep their original
    * ansi-cast lowering untouched). */
  case class YsonConvertScalar(child: Expression, target: String,
      strict: Boolean, autoConvert: Boolean)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    import org.apache.spark.sql.types._
    override def dataType: DataType = target match {
      case "int64" | "uint64" => LongType
      case "double" => DoubleType
      case "bool" => BooleanType
      case _ => StringType
    }
    override def nullable: Boolean = true
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      if (child.dataType == StringType) TypeCheckSuccess
      else TypeCheckFailure("Yson::ConvertTo: expects an Any argument")
    }
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) null
      else convertScalar(v.asInstanceOf[UTF8String], target, strict, autoConvert)
    }
    override protected def withNewChildInternal(c: Expression): YsonConvertScalar =
      copy(child = c)
  }

  /** Mode-aware list conversion (ConvertToListImpl): non-list input is
    * an error under strict and an EMPTY list otherwise; lenient DROPS
    * unconvertible elements; auto coerces every element. */
  def jsonArrayTypedMode(doc: UTF8String, kind: String, mode: String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    if (mode == "legacy") return jsonArrayTyped(doc, kind)
    if (doc == null) return null
    var node =
      try rawMapper.readTree(doc.toString)
      catch {
        case scala.util.control.NonFatal(e) =>
          if (mode == "strict") throw new IllegalArgumentException(
            s"Yson::ConvertToList (Strict): unparseable input: ${e.getMessage}")
          return null
      }
    if (node != null && node.isObject && node.has("$value") &&
        node.has("$attributes")) node = node.get("$value")
    val empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Any](0))
    if (node == null || !node.isArray) {
      if (mode == "strict") convFail("list", node) else return empty
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < node.size) {
      val el = node.get(i)
      val v = kind match {
        case "any" => if (el.isNull) null else UTF8String.fromString(el.toString)
        case k => convertNode(el, k,
          strict = mode == "strict", auto = mode == "auto")
      }
      // lenient: failed conversions (null from a non-entity, or an
      // entity itself — convert.h's `{}` arm) are dropped
      if (mode == "lenient") { if (v != null) out += v }
      else out += v
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Mode-aware dict conversion (ConvertToDictImpl): same contract as
    * [[jsonArrayTypedMode]] over values; lenient drops failed pairs. */
  def jsonDictTypedMode(doc: UTF8String, kind: String, mode: String)
      : org.apache.spark.sql.catalyst.util.MapData = {
    if (mode == "legacy") return jsonDictTyped(doc, kind)
    if (doc == null) return null
    var node =
      try rawMapper.readTree(doc.toString)
      catch {
        case scala.util.control.NonFatal(e) =>
          if (mode == "strict") throw new IllegalArgumentException(
            s"Yson::ConvertToDict (Strict): unparseable input: ${e.getMessage}")
          return null
      }
    if (node != null && node.isObject && node.has("$value") &&
        node.has("$attributes")) node = node.get("$value")
    def emptyMap = new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0)),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0)))
    if (node == null || !node.isObject) {
      if (mode == "strict") convFail("dict", node) else return emptyMap
    }
    val ks = scala.collection.mutable.ArrayBuffer.empty[Any]
    val vs = scala.collection.mutable.ArrayBuffer.empty[Any]
    val it = node.fields()
    while (it.hasNext) {
      val e = it.next()
      val v = kind match {
        case "any" =>
          if (e.getValue.isNull) null
          else UTF8String.fromString(e.getValue.toString)
        case k => convertNode(e.getValue, k,
          strict = mode == "strict", auto = mode == "auto")
      }
      if (mode != "lenient" || v != null) {
        ks += UTF8String.fromString(e.getKey); vs += v
      }
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(ks.toArray),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(vs.toArray))
  }

  /** Yson::Attributes — the node's attribute dict as an Any carrier
    * (`{}` when the node carries none). */
  def jsonAttributes(doc: UTF8String): UTF8String = {
    if (doc == null) return null
    try {
      val node = rawMapper.readTree(doc.toString)
      if (node != null && node.isObject && node.has("$attributes"))
        UTF8String.fromString(node.get("$attributes").toString)
      else UTF8String.fromString("{}")
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Yson::WithAttributes — attach an attribute dict to a node
    * (the `$attributes`/`$value` carrier encoding). */
  def jsonWithAttributes(doc: UTF8String, attrs: UTF8String): UTF8String = {
    if (doc == null || attrs == null) return null
    try {
      val a = rawMapper.readTree(attrs.toString)
      if (a == null || !a.isObject) return null
      val node = rawMapper.readTree(doc.toString)
      val value =
        if (node != null && node.isObject && node.has("$value"))
          node.get("$value").toString
        else doc.toString
      UTF8String.fromString(
        "{\"$attributes\":" + a.toString + ",\"$value\":" + value + "}")
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Dispatch for the typed list/dict conversions + attribute pair.
    * `mode` ∈ legacy|strict|lenient|auto (Yson::Options; "legacy" is
    * the pre-Options engine default, kept for no-options call sites). */
  case class YsonTypedExpr(fn: String, kind: String, children: Seq[Expression],
      mode: String = "legacy")
      extends Expression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    import org.apache.spark.sql.types._
    private def elemType: DataType = kind match {
      case "int64" | "uint64" => LongType
      case "double" => DoubleType
      case "bool" => BooleanType
      case _ => StringType
    }
    override def dataType: DataType = fn match {
      case "list" => ArrayType(elemType, containsNull = true)
      case "dict" => MapType(StringType, elemType, valueContainsNull = true)
      case _ => StringType
    }
    override def nullable: Boolean = true
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      val want = if (fn == "withattributes") 2 else 1
      if (children.length == want &&
          children.forall(_.dataType == StringType)) TypeCheckSuccess
      else TypeCheckFailure(s"Yson::$fn: expects $want Any argument(s)")
    }
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = children.head.eval(input)
      if (v == null) return null
      val doc = v.asInstanceOf[UTF8String]
      fn match {
        case "list" => jsonArrayTypedMode(doc, kind, mode)
        case "dict" => jsonDictTypedMode(doc, kind, mode)
        case "attributes" => jsonAttributes(doc)
        case "withattributes" =>
          val a = children(1).eval(input)
          if (a == null) null
          else jsonWithAttributes(doc, a.asInstanceOf[UTF8String])
      }
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(children = newChildren)
  }

  case class JsonArrayFragments(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(StringType, containsNull = true)
    override def nullable: Boolean = true
    override protected def nullSafeEval(v: Any): Any =
      jsonArrayFragments(v.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.sources.Yson.jsonArrayFragments($c);
        ${ev.isNull} = ${ev.value} == null;
      """)
    override protected def withNewChildInternal(c: Expression): JsonArrayFragments =
      copy(child = c)
  }

  /** `get_any`/`try_get_any`: Any carrier in, Any carrier out. */
  case class JsonGetRaw(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType, StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override protected def nullSafeEval(doc: Any, path: Any): Any =
      jsonGetRawFast(doc.asInstanceOf[UTF8String], path.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (d, p) => s"""
        ${ev.value} = graft.sources.Yson.jsonGetRawFast($d, $p);
        ${ev.isNull} = ${ev.value} == null;
      """)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JsonGetRaw =
      copy(left = l, right = r)
  }

  /** Runtime form for column-valued ypaths (the reference's accessor
    * tests pass the path as a table column, ql_query_ut.cpp
    * YPathTryGetInt64). Null path → null; malformed path → error. */
  case class YPathToJsonPath(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override protected def nullSafeEval(v: Any): Any =
      ypathOrThrow(v.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.sources.Yson.ypathOrThrow($c)")
    override protected def withNewChildInternal(c: Expression): YPathToJsonPath =
      copy(child = c)
  }
}
