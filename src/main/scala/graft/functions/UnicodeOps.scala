package graft.functions

/** The Unicode:: tail (udfs/common/unicode_base; docs
  * yt/docs/en/yql/udf/list/unicode.md) — codepoint-aware kernels the
  * existing YqlModules.Unicode surface (case, classes, strip, find,
  * substring, reverse, NFC normalize) doesn't cover:
  * Normalize NFD/NFKC/NFKD, Fold, IsUtf/IsAscii/IsHex, IsUnicodeSet
  * (bracket sets), RFind, Replace/Remove families, To/FromCodePointList,
  * SplitToList/JoinFromList, To/TryToUint64, codepoint Levenstein.
  * Translit needs the reference's per-language transliteration tables
  * and raises naming that.
  */
object UnicodeOps {

  private def cps(s: String): Array[Int] = s.codePoints().toArray

  private def fromCps(cp: Iterable[Int]): String = {
    val sb = new java.lang.StringBuilder
    cp.foreach(sb.appendCodePoint)
    sb.toString
  }

  def normalize(s: String, form: String): String =
    java.text.Normalizer.normalize(s,
      java.text.Normalizer.Form.valueOf(form))

  /** Fold to the searchable form (docs unicode.md Fold, defaults:
    * DoLowerCase=true): full case fold (upper→lower roundtrip expands
    * ß→ss and friends), NFD-decompose, drop combining marks, NFC
    * re-compose — "Kongreßstraße"→"kongressstrasse", "Eylül"→"eylul".
    * Language-specific extra tables (DoRenyxa/DoSimpleCyr) are the
    * reference library's data files; the default path is what's bound. */
  def fold(s: String): String = {
    val folded = s.toUpperCase.toLowerCase
    val nfd = java.text.Normalizer.normalize(folded,
      java.text.Normalizer.Form.NFD)
    val kept = fromCps(cps(nfd).filter(c =>
      Character.getType(c) != Character.NON_SPACING_MARK))
    java.text.Normalizer.normalize(kept, java.text.Normalizer.Form.NFC)
  }

  /** UTF-8 validity of raw bytes (strings decoded by the engine are
    * valid by construction; the byte form is what IsUtf really asks). */
  def isUtf(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      val len =
        if (c < 0x80) 1
        else if ((c & 0xe0) == 0xc0) { if (c < 0xc2) return false else 2 }
        else if ((c & 0xf0) == 0xe0) 3
        else if ((c & 0xf8) == 0xf0) { if (c > 0xf4) return false else 4 }
        else return false
      if (i + len > n) return false
      var j = 1
      while (j < len) {
        if ((b(i + j) & 0xc0) != 0x80) return false
        j += 1
      }
      // reject overlongs / surrogates / beyond U+10FFFF
      if (len == 3) {
        val cp = ((c & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f)
        if (cp < 0x800 || (cp >= 0xd800 && cp <= 0xdfff)) return false
      } else if (len == 4) {
        val cp = ((c & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
          ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f)
        if (cp < 0x10000 || cp > 0x10ffff) return false
      }
      i += len
    }
    true
  }

  def isAscii(s: String): Boolean = s.forall(_ < 0x80)
  def isHex(s: String): Boolean = s.nonEmpty && s.forall(c =>
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))

  /** Unicode-set membership (docs IsUnicodeSet; reference:
    * unicode_base_udf.h:632 TUnicodeSetMatcher over an ICU-style
    * UnicodeSet): every codepoint of `s` is in the set. Supports the
    * literal forms (`[chars]`, ranges `a-b`, negation `[^...]`) AND
    * property classes — `\p{L}`/`\P{N}` (Java's Unicode property
    * engine carries the same UCD categories/scripts/blocks ICU reads)
    * plus the ICU POSIX spelling `[:Alpha:]`, translated to `\p{..}`.
    * Compiled per distinct set text (per-thread cache), matched
    * codepoint-at-a-time so supplementary planes behave. */
  def isUnicodeSet(s: String, set: String): Boolean = {
    require(set.length >= 2 && set.head == '[' && set.last == ']',
      s"Unicode::IsUnicodeSet: expected a [..] set, got: $set")
    val p = compiledSet(set)
    cps(s).forall { c =>
      p.matcher(new String(Character.toChars(c))).matches()
    }
  }

  private val setCache =
    new ThreadLocal[java.util.HashMap[String, java.util.regex.Pattern]] {
      override def initialValue() =
        new java.util.HashMap[String, java.util.regex.Pattern]()
    }

  private def compiledSet(set: String): java.util.regex.Pattern = {
    val cache = setCache.get()
    val hit = cache.get(set)
    if (hit != null) return hit
    if (cache.size > 256) cache.clear()
    // ICU's POSIX-style [:Name:] inner sets → Java \p{Name}
    val javaSet = "\\[:([A-Za-z][A-Za-z0-9_= ]*):\\]".r
      .replaceAllIn(set, m => java.util.regex.Matcher
        .quoteReplacement(s"\\p{${m.group(1)}}"))
    // ICU POSIX classes ([:Alpha:] etc.) are Unicode-wide; Java's
    // \p{Alpha} is US-ASCII-only unless UNICODE_CHARACTER_CLASS is on.
    val p =
      try java.util.regex.Pattern.compile(javaSet,
        java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)
      catch {
        case e: java.util.regex.PatternSyntaxException =>
          throw new IllegalArgumentException(
            s"Unicode::IsUnicodeSet: unsupported set syntax: $set " +
              s"(${e.getDescription})")
      }
    cache.put(set, p)
    p
  }

  /** Codepoint index of the LAST occurrence of sub at or before pos
    * (codepoint index; default: end of string); null (None) if absent. */
  def rfind(s: String, sub: String, pos: Long): Option[Long] = {
    val scp = cps(s); val tcp = cps(sub)
    val maxStart = math.min(pos, (scp.length - tcp.length).toLong)
    if (tcp.isEmpty) return Some(math.min(pos, scp.length.toLong))
    var i = maxStart.toInt
    while (i >= 0) {
      var j = 0
      while (j < tcp.length && scp(i + j) == tcp(j)) j += 1
      if (j == tcp.length) return Some(i.toLong)
      i -= 1
    }
    None
  }

  def replaceAll(s: String, find: String, rep: String): String =
    if (find.isEmpty) s else s.replace(find, rep)
  def replaceFirst(s: String, find: String, rep: String): String = {
    val at = s.indexOf(find)
    if (at < 0 || find.isEmpty) s
    else s.substring(0, at) + rep + s.substring(at + find.length)
  }
  def replaceLast(s: String, find: String, rep: String): String = {
    val at = s.lastIndexOf(find)
    if (at < 0 || find.isEmpty) s
    else s.substring(0, at) + rep + s.substring(at + find.length)
  }

  /** Remove families: `symbols` is a SET of codepoints (docs:
    * RemoveAll("abandon", "an") -> "bdo"). */
  def removeAll(s: String, symbols: String): String = {
    val set = cps(symbols).toSet
    fromCps(cps(s).filterNot(set))
  }
  def removeFirst(s: String, symbols: String): String = {
    val set = cps(symbols).toSet
    val a = cps(s)
    val at = a.indexWhere(set)
    if (at < 0) s else fromCps(a.patch(at, Nil, 1))
  }
  def removeLast(s: String, symbols: String): String = {
    val set = cps(symbols).toSet
    val a = cps(s)
    val at = a.lastIndexWhere(set)
    if (at < 0) s else fromCps(a.patch(at, Nil, 1))
  }

  def toCodePointList(s: String): Array[Long] = cps(s).map(_.toLong)
  def fromCodePointList(cp: Array[Long]): String = fromCps(cp.map(_.toInt))

  /** Split on a literal separator (DelimeterString=true default),
    * keeping empties (SkipEmpty=false default). */
  def splitToList(s: String, sep: String): Array[String] =
    if (sep.isEmpty) Array(s)
    else s.split(java.util.regex.Pattern.quote(sep), -1)

  /** Codepoint-level Levenstein distance. */
  def levenstein(a: String, b: String): Long = {
    val x = cps(a); val y = cps(b)
    val prev = new Array[Int](y.length + 1)
    val cur = new Array[Int](y.length + 1)
    var j = 0
    while (j <= y.length) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= x.length) {
      cur(0) = i
      j = 1
      while (j <= y.length) {
        val cost = if (x(i - 1) == y(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + cost)
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, y.length + 1)
      i += 1
    }
    prev(y.length).toLong
  }

  /** ToUint64 (unicode_base_udf.h:501-513 → strtoull): base 0
    * auto-detects 0x/0-prefixes like strtoull; "-77741" wraps to
    * 2^64-77741 (two's complement, the documented behavior). Raises on
    * garbage; the Try variant maps that to null. */
  def toUint64(s: String, base0: Int): Long = {
    var t = s.trim
    var neg = false
    if (t.startsWith("-")) { neg = true; t = t.substring(1) }
    else if (t.startsWith("+")) t = t.substring(1)
    var base = base0
    if (base == 0 || base == 16) {
      if (t.length > 1 && (t.startsWith("0x") || t.startsWith("0X"))) {
        t = t.substring(2); base = 16
      } else if (base == 0 && t.length > 1 && t.startsWith("0")) base = 8
      else if (base == 0) base = 10
    }
    val mag = java.lang.Long.parseUnsignedLong(t, base)
    if (neg) -mag else mag
  }
}

/** Scalar dispatch for the Unicode:: tail — CodegenFallback (breadth
  * surface). NULL-strict like the reference's AutoMap signatures. */
final case class UnicodeFnExpr(fn: String,
    children: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
  extends org.apache.spark.sql.catalyst.expressions.Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = fn match {
    case "isutf" | "isascii" | "ishex" | "isunicodeset" => BooleanType
    case "rfind" | "levensteindistance" | "touint64" | "trytouint64" =>
      LongType
    case "tocodepointlist" => ArrayType(LongType, containsNull = false)
    case "splittolist" => ArrayType(StringType, containsNull = false)
    case _ => StringType
  }
  override def nullable: Boolean = true
  override def prettyName: String = s"unicode_$fn"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val ok = fn match {
      case "replaceall" | "replacefirst" | "replacelast" =>
        children.length == 3
      case "removeall" | "removefirst" | "removelast" | "isunicodeset" |
           "splittolist" | "joinfromlist" | "levensteindistance" =>
        children.length == 2
      case "rfind" => children.length == 2 || children.length == 3
      case "touint64" | "trytouint64" =>
        children.length == 1 || children.length == 2
      case _ => children.length == 1
    }
    if (ok) TypeCheckSuccess
    else TypeCheckFailure(s"Unicode::$fn: wrong argument count")
  }

  private def str(v: Any): String = v match {
    case u: UTF8String => u.toString
    case b: Array[Byte] =>
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    case other => other.toString
  }
  private def long(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case d: org.apache.spark.sql.types.Decimal => d.toLong
  }

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    def s0 = str(vs.head)
    def out(s: String): Any = UTF8String.fromString(s)
    import UnicodeOps._
    fn match {
      case "normalizenfc" => out(normalize(s0, "NFC"))
      case "normalizenfd" => out(normalize(s0, "NFD"))
      case "normalizenfkc" => out(normalize(s0, "NFKC"))
      case "normalizenfkd" => out(normalize(s0, "NFKD"))
      case "fold" => out(fold(s0))
      case "isutf" => vs.head match {
        case b: Array[Byte] => isUtf(b)
        case u: UTF8String => isUtf(u.getBytes)
        case _ => true
      }
      case "isascii" => isAscii(s0)
      case "ishex" => isHex(s0)
      case "isunicodeset" => isUnicodeSet(s0, str(vs(1)))
      case "rfind" =>
        rfind(s0, str(vs(1)),
          if (vs.length > 2) long(vs(2)) else Long.MaxValue)
          .map(Long.box).orNull
      case "replaceall" => out(replaceAll(s0, str(vs(1)), str(vs(2))))
      case "replacefirst" => out(replaceFirst(s0, str(vs(1)), str(vs(2))))
      case "replacelast" => out(replaceLast(s0, str(vs(1)), str(vs(2))))
      case "removeall" => out(removeAll(s0, str(vs(1))))
      case "removefirst" => out(removeFirst(s0, str(vs(1))))
      case "removelast" => out(removeLast(s0, str(vs(1))))
      case "tocodepointlist" =>
        org.apache.spark.sql.catalyst.util.ArrayData
          .toArrayData(toCodePointList(s0))
      case "fromcodepointlist" =>
        val arr = vs.head
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val et = children.head.dataType
          .asInstanceOf[ArrayType].elementType
        val n = arr.numElements()
        val cp = new Array[Long](n)
        var i = 0
        while (i < n) {
          cp(i) = et match {
            case LongType => arr.getLong(i)
            case IntegerType => arr.getInt(i).toLong
            case ShortType => arr.getShort(i).toLong
            case _ => str(arr.get(i, et)).toLong
          }
          i += 1
        }
        out(fromCodePointList(cp))
      case "splittolist" =>
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          splitToList(s0, str(vs(1))).map(UTF8String.fromString))
      case "joinfromlist" =>
        val arr = vs.head
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val parts = (0 until arr.numElements())
          .map(i => str(arr.getUTF8String(i)))
        out(parts.mkString(str(vs(1))))
      case "levensteindistance" => levenstein(s0, str(vs(1)))
      case "touint64" =>
        toUint64(s0, if (vs.length > 1) long(vs(1)).toInt else 0)
      case "trytouint64" =>
        try toUint64(s0, if (vs.length > 1) long(vs(1)).toInt else 0)
        catch { case _: Exception => null }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(children = newChildren)
}
