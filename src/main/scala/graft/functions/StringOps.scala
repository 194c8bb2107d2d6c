package graft.functions

/** The String:: formatting/escaping tail (udfs/common/string/
  * string_udf.cpp; docs udf/list/string.md) — pure-JVM ports of the
  * PUBLIC util semantics the reference binds:
  *
  *   - EscapeC/UnescapeC       (util/string/escape.cpp rules: \" \\,
  *     printable as-is with the `??` trigraph guard, \r \n \t, one-digit
  *     octal for c<8 when the next char is not an octal digit, \xHH when
  *     the next char is not a hex digit, else 3-digit octal)
  *   - EncodeHtml/DecodeHtml   (library/cpp/html/pcdata: " < > ' & →
  *     &quot; &lt; &gt; &#39; &amp;)
  *   - CgiEscape/CgiUnescape   (library/cpp/string_utils/quote escape
  *     map: [A-Za-z0-9!$*-./;@_~] kept, space → '+', rest %XX)
  *   - Collapse/CollapseText   (util/string/strip.h CollapseImpl +
  *     the " ..." word-boundary truncation)
  *   - Hex/SHex/Bin/SBin, HexText/BinText (util/stream/format.h:
  *     HF_FULL|HF_ADDX zero-padded 0x/0b forms; per-byte HF_FULL text)
  *   - HumanReadableBytes/Quantity/Duration and Prec
  *     (util/stream/format.cpp PrintDoubleShortly + util/string/cast.cpp
  *     FloatToString PREC_NDIGITS with the EMIT_POSITIVE_EXPONENT_SIGN /
  *     -10..21 / 4-leading-zero converter and FixZeros/FixEnd cleanup)
  *   - Base64Decode (lenient) / Base64StrictDecode
  */
object StringOps {

  private def isPrintable(c: Int): Boolean = c >= 0x20 && c <= 0x7e
  private def hexDigit(i: Int): Char = "0123456789ABCDEF".charAt(i)

  def escapeC(data: Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    val n = data.length
    while (i < n) {
      val c = data(i) & 0xff
      val next = if (i + 1 < n) data(i + 1) & 0xff else 0
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case _ if isPrintable(c) && !(c == '?' && next == '?') =>
          sb.append(c.toChar)
        case '\r' => sb.append("\\r")
        case '\n' => sb.append("\\n")
        case '\t' => sb.append("\\t")
        case _ if c < 8 && !(next >= '0' && next <= '7') =>
          sb.append('\\').append(('0' + c).toChar)
        case _ if !isHexDigit(next) =>
          sb.append("\\x").append(hexDigit(c >> 4)).append(hexDigit(c & 0xf))
        case _ =>
          sb.append('\\').append(('0' + ((c >> 6) & 7)).toChar)
            .append(('0' + ((c >> 3) & 7)).toChar)
            .append(('0' + (c & 7)).toChar)
      }
      i += 1
    }
    sb.toString
  }

  private def isHexDigit(c: Int): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  def unescapeC(s: String): String = {
    val out = new java.io.ByteArrayOutputStream
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c != '\\' || i + 1 >= n) { out.write(c.toInt); i += 1 }
      else {
        val e = s.charAt(i + 1)
        i += 2
        e match {
          case 'n' => out.write('\n')
          case 'r' => out.write('\r')
          case 't' => out.write('\t')
          case 'b' => out.write('\b')
          case 'f' => out.write('\f')
          case 'a' => out.write(7)
          case 'v' => out.write(11)
          case 'x' =>
            var v = 0; var k = 0
            while (k < 2 && i < n && isHexDigit(s.charAt(i))) {
              v = v * 16 + Character.digit(s.charAt(i), 16); i += 1; k += 1
            }
            out.write(v)
          case 'u' =>
            var v = 0; var k = 0
            while (k < 4 && i < n && isHexDigit(s.charAt(i))) {
              v = v * 16 + Character.digit(s.charAt(i), 16); i += 1; k += 1
            }
            out.write(new String(Character.toChars(v))
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          case d if d >= '0' && d <= '7' =>
            var v = d - '0'; var k = 0
            while (k < 2 && i < n && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
              v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1
            }
            out.write(v & 0xff)
          case other => out.write(other.toInt)
        }
      }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  def encodeHtml(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("&quot;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '\'' => sb.append("&#39;")
      case '&' => sb.append("&amp;")
      case c => sb.append(c)
    }
    sb.toString
  }

  private val HtmlCodes = Seq(
    "&quot;" -> '"', "&lt;" -> '<', "&gt;" -> '>', "&#39;" -> '\'',
    "&#039;" -> '\'', "&amp;" -> '&', "&apos;" -> '\'')

  def decodeHtml(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        HtmlCodes.find { case (code, _) => s.startsWith(code, i) } match {
          case Some((code, ch)) => sb.append(ch); i += code.length
          case None => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** quote.cpp chars_to_url_escape complement: bytes kept verbatim. */
  private val CgiSafe: Set[Int] =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9')).map(_.toInt).toSet ++
      "!$*-./;@_~".map(_.toInt)

  def cgiEscape(data: Array[Byte]): String = {
    val sb = new StringBuilder
    data.foreach { b =>
      val c = b & 0xff
      if (c == ' ') sb.append('+')
      else if (CgiSafe(c)) sb.append(c.toChar)
      else sb.append('%').append(hexDigit(c >> 4)).append(hexDigit(c & 0xf))
    }
    sb.toString
  }

  def cgiUnescape(s: String): String = {
    val out = new java.io.ByteArrayOutputStream
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '+' => out.write(' '); i += 1
        case '%' if i + 2 < s.length &&
            isHexDigit(s.charAt(i + 1)) && isHexDigit(s.charAt(i + 2)) =>
          out.write(Character.digit(s.charAt(i + 1), 16) * 16 +
            Character.digit(s.charAt(i + 2), 16))
          i += 3
        case c => out.write(c.toInt); i += 1
      }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\u000b' || c == '\f'

  /** strip.h Collapse: whitespace runs → one ' ' within the first
    * maxLen chars (0 = whole string); the tail past maxLen is kept. */
  def collapse(s: String, maxLen: Int = 0): String = {
    val limit = if (maxLen == 0) s.length else math.min(maxLen, s.length)
    val sb = new StringBuilder
    var i = 0
    while (i < limit) {
      if (isAsciiSpace(s.charAt(i))) {
        var j = i
        while (j < limit && isAsciiSpace(s.charAt(j))) j += 1
        sb.append(' ')
        i = j
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.append(s.substring(limit)).toString
  }

  /** strip.cpp CollapseText: collapse + strip, then cut to maxLen-5 at
    * a trailing " .,;" boundary within 32 chars and append " ...". */
  def collapseText(s: String, maxLen: Int): String = {
    var t = collapse(s, maxLen).trim
    if (t.length >= maxLen && maxLen >= 5) {
      t = t.substring(0, maxLen - 5)
      val rev = t.reverse
      val pos = rev.indexWhere(c => " .,;".indexOf(c.toInt) >= 0)
      if (pos >= 0 && pos < 32) t = t.substring(0, t.length - pos - 1)
      t = t + " ..."
    }
    t
  }

  /** format.h Hex/SHex/Bin/SBin (HF_FULL | HF_ADDX). */
  def hexU64(v: Long): String =
    "0x" + padLeft(java.lang.Long.toHexString(v).toUpperCase, 16)
  def hexI64(v: Long): String =
    if (v < 0) "-0x" + padLeft(java.lang.Long.toHexString(-v).toUpperCase, 16)
    else "0x" + padLeft(java.lang.Long.toHexString(v).toUpperCase, 16)
  def binU64(v: Long): String =
    "0b" + padLeft(java.lang.Long.toBinaryString(v), 64)
  def binI64(v: Long): String =
    if (v < 0) "-0b" + padLeft(java.lang.Long.toBinaryString(-v), 64)
    else "0b" + padLeft(java.lang.Long.toBinaryString(v), 64)
  private def padLeft(s: String, w: Int): String =
    if (s.length >= w) s else ("0" * (w - s.length)) + s

  /** format.h HexText/BinText: per-byte HF_FULL (no 0x/0b), space-sep. */
  def hexText(data: Array[Byte]): String =
    data.map(b => f"${b & 0xff}%02X").mkString(" ")
  def binText(data: Array[Byte]): String =
    data.map(b => padLeft(java.lang.Integer.toBinaryString(b & 0xff), 8))
      .mkString(" ")

  /** cast.cpp FloatToString(PREC_NDIGITS): n significant digits through
    * the EMIT_POSITIVE_EXPONENT_SIGN converter (decimal for
    * -3 <= decimal_point-1 < n, else exponential), FixZeros (strip
    * trailing fraction zeros), FixEnd (two-digit exponent minimum). */
  def prec(d: Double, nDigits: Int): String = {
    if (d.isNaN) return "nan"
    if (d.isInfinite) return if (d > 0) "inf" else "-inf"
    val n = math.max(1, math.min(nDigits, 120))
    if (d == 0.0) return "0"
    val bd = new java.math.BigDecimal(d)
      .round(new java.math.MathContext(n, java.math.RoundingMode.HALF_EVEN))
    val unscaled0 = bd.unscaledValue.abs.toString
    val neg = bd.signum < 0
    val dp = unscaled0.length - bd.scale
    val digits = unscaled0.padTo(n, '0')
    def stripZeros(t: String): String = t.reverse.dropWhile(_ == '0').reverse
    val sb = new StringBuilder
    if (neg) sb += '-'
    val asExp = (1 - dp > 4) || (dp - n > 0)
    if (asExp) {
      sb += digits.head
      val frac = stripZeros(digits.tail)
      if (frac.nonEmpty) { sb += '.'; sb ++= frac }
      val e = dp - 1
      sb += 'e'
      sb += (if (e >= 0) '+' else '-')
      val ea = math.abs(e)
      sb ++= (if (ea < 10) "0" + ea else ea.toString)
    } else if (dp <= 0) {
      sb ++= "0."
      sb ++= "0" * (-dp)
      sb ++= stripZeros(digits)
    } else {
      sb ++= digits.take(dp)
      val frac = stripZeros(digits.drop(dp))
      if (frac.nonEmpty) { sb += '.'; sb ++= frac }
    }
    sb.toString
  }

  /** format.cpp PrintDoubleShortly: fixed 2/1/0 point digits with
    * stripped zeros for |d| < 1e12, else 3 significant digits. */
  def doubleShortly(d: Double): String = {
    if (!d.isNaN && !d.isInfinite && math.abs(d) < 1e12) {
      val nd =
        if ((math.abs(d) * 100).toLong < 1000) 2
        else if ((math.abs(d) * 10).toLong < 1000) 1
        else 0
      val fixed = new java.math.BigDecimal(d)
        .setScale(nd, java.math.RoundingMode.HALF_EVEN).toPlainString
      if (fixed.contains('.'))
        fixed.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
      else fixed
    } else prec(d, 3)
  }

  /** format.cpp THumanReadableSize. */
  def humanReadableSize(value: Double, bytes: Boolean): String = {
    val base = if (bytes) 1024.0 else 1000.0
    val sb = new StringBuilder
    var v = value
    if (v < 0) { sb += '-'; v = -v }
    val (scaled, suffix) =
      if (v < base) (v, "")
      else if (v < base * base) (v / base, "K")
      else if (v < base * base * base) (v / (base * base), "M")
      else if (v < base * base * base * base) (v / (base * base * base), "G")
      else (v / (base * base * base * base), "T")
    sb ++= doubleShortly(scaled)
    sb ++= suffix
    if (bytes) sb ++= (if (v < base) "B" else "iB")
    sb.toString
  }

  /** format.cpp THumanReadableDuration over microseconds. */
  def humanReadableDuration(micros: Long): String = {
    if (micros < 1000L) return s"${micros}us"
    if (micros < 1000L * 1000L)
      return doubleShortly(micros / 1000.0) + "ms"
    val seconds = (micros / 1000L) / 1000.0
    if (seconds < 60) return doubleShortly(seconds) + "s"
    // reference Round: nearest of floor/ceil (ties up), over sec*1000+0.5
    val x = seconds * 1000 + 0.5
    val r1 = math.floor(x); val r2 = math.ceil(x)
    var s = (if (x - r1 < r2 - x) r1.toLong else r2.toLong) / 1000L
    var m = s / 60; s %= 60
    var h = m / 60; m %= 60
    val d = h / 24; h %= 24
    val parts = Seq(d -> 'd', h -> 'h', m -> 'm', s -> 's')
      .filter(_._1 > 0).map { case (t, u) => s"$t$u" }
    parts.mkString(" ")
  }

  def base64Decode(s: String, strict: Boolean): Array[Byte] = {
    // lenient mode also accepts the url-safe alphabet, embedded
    // whitespace and missing padding; strict is RFC 4648 exactly
    val canon =
      if (strict) {
        // RFC 4648 exactly: full 4-char quanta (the JDK decoder would
        // otherwise tolerate a missing-padding final quantum)
        if (s.length % 4 != 0)
          throw new IllegalArgumentException("Base64StrictDecode: input not padded to a 4-char quantum")
        s
      } else {
        val t = s.filterNot(_.isWhitespace).replace('-', '+').replace('_', '/')
        t + "=" * ((4 - t.length % 4) % 4)
      }
    java.util.Base64.getDecoder.decode(canon)
  }

  /** string_udf.cpp TRemoveFirst/TRemoveLast: drop ONE occurrence of
    * any byte from `set` (first / last in the string). */
  def removeFirst(s: String, set: String): String = {
    val at = s.indexWhere(c => set.indexOf(c.toInt) >= 0)
    if (at < 0) s else s.substring(0, at) + s.substring(at + 1)
  }
  def removeLast(s: String, set: String): String = {
    val at = s.lastIndexWhere(c => set.indexOf(c.toInt) >= 0)
    if (at < 0) s else s.substring(0, at) + s.substring(at + 1)
  }

  /** ASCII title case: first char upper, rest lower (to_title). */
  def asciiToTitle(s: String): String =
    if (s.isEmpty) s
    else {
      val sb = new StringBuilder(s.length)
      sb.append(if (s.charAt(0) >= 'a' && s.charAt(0) <= 'z')
        (s.charAt(0) - 32).toChar else s.charAt(0))
      var i = 1
      while (i < s.length) {
        val c = s.charAt(i)
        sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        i += 1
      }
      sb.toString
    }
}

/** Scalar dispatch for the String:: formatting tail — CodegenFallback
  * (breadth surface, not a scan hot path). NULL-strict. */
final case class StringFnExpr(fn: String,
    children: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
  extends org.apache.spark.sql.catalyst.expressions.Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = fn match {
    case "tobytelist" => ArrayType(ShortType, containsNull = false)
    case _ => StringType
  }
  override def nullable: Boolean = true
  override def prettyName: String = s"string_$fn"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val ok = fn match {
      case "collapsetext" | "prec" => children.length == 2
      case "removefirst" | "removelast" => children.length == 2
      case _ => children.length == 1
    }
    if (ok) TypeCheckSuccess
    else TypeCheckFailure(s"String::$fn: wrong argument count")
  }

  private def str(v: Any): String = v match {
    case u: UTF8String => u.toString
    case b: Array[Byte] =>
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    case other => other.toString
  }
  private def bytes(v: Any): Array[Byte] = v match {
    case u: UTF8String => u.getBytes
    case b: Array[Byte] => b
  }
  private def long(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case d: org.apache.spark.sql.types.Decimal => d.toLong
  }
  private def dbl(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => long(other).toDouble
  }
  private def u64ToDouble(v: Long): Double =
    if (v >= 0) v.toDouble else v.toDouble + 1.8446744073709552e19

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    def s0 = str(vs.head)
    def out(s: String): Any = UTF8String.fromString(s)
    fn match {
      case "escapec" => out(StringOps.escapeC(bytes(vs.head)))
      case "unescapec" => out(StringOps.unescapeC(s0))
      case "encodehtml" => out(StringOps.encodeHtml(s0))
      case "decodehtml" => out(StringOps.decodeHtml(s0))
      case "cgiescape" => out(StringOps.cgiEscape(bytes(vs.head)))
      case "cgiunescape" => out(StringOps.cgiUnescape(s0))
      case "collapsetext" =>
        out(StringOps.collapseText(s0, long(vs(1)).toInt))
      case "hex" => out(StringOps.hexU64(long(vs.head)))
      case "shex" => out(StringOps.hexI64(long(vs.head)))
      case "bin" => out(StringOps.binU64(long(vs.head)))
      case "sbin" => out(StringOps.binI64(long(vs.head)))
      case "hextext" => out(StringOps.hexText(bytes(vs.head)))
      case "bintext" => out(StringOps.binText(bytes(vs.head)))
      case "humanreadablebytes" =>
        out(StringOps.humanReadableSize(u64ToDouble(long(vs.head)), bytes = true))
      case "humanreadablequantity" =>
        out(StringOps.humanReadableSize(u64ToDouble(long(vs.head)), bytes = false))
      case "humanreadableduration" =>
        out(StringOps.humanReadableDuration(long(vs.head)))
      case "prec" => out(StringOps.prec(dbl(vs.head), long(vs(1)).toInt))
      case "base64decode" =>
        try out(new String(StringOps.base64Decode(s0, strict = false),
          java.nio.charset.StandardCharsets.UTF_8))
        catch { case _: IllegalArgumentException => null }
      case "base64strictdecode" =>
        try out(new String(StringOps.base64Decode(s0, strict = true),
          java.nio.charset.StandardCharsets.UTF_8))
        catch { case _: IllegalArgumentException => null }
      case "removefirst" => out(StringOps.removeFirst(s0, str(vs(1))))
      case "removelast" => out(StringOps.removeLast(s0, str(vs(1))))
      case "asciitotitle" => out(StringOps.asciiToTitle(s0))
      case "tobytelist" =>
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          bytes(vs.head).map(b => (b & 0xff).toShort))
      case "frombytelist" =>
        val arr = vs.head
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val n = arr.numElements()
        val bs = new Array[Byte](n)
        var i = 0
        val et = children.head.dataType
          .asInstanceOf[ArrayType].elementType
        while (i < n) {
          val v = et match {
            case ShortType => arr.getShort(i).toLong
            case IntegerType => arr.getInt(i).toLong
            case LongType => arr.getLong(i)
            case ByteType => arr.getByte(i).toLong
          }
          bs(i) = (v & 0xff).toByte
          i += 1
        }
        UTF8String.fromBytes(bs)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(children = newChildren)
}
