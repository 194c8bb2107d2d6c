package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.UnicodeOps

/** Pure-kernel pins for the Unicode:: tail (unicode_base_udf.h; the
  * SQL-surface half rides the yql_fn_unicode_tail oracle). */
class UnicodeOpsSpec extends AnyFunSuite {

  test("normalization forms") {
    val composed = "é" // é
    val decomposed = "é"
    assert(UnicodeOps.normalize(decomposed, "NFC") == composed)
    assert(UnicodeOps.normalize(composed, "NFD") == decomposed)
    assert(UnicodeOps.normalize("Ⅸ", "NFKC") == "IX") // Ⅸ
    assert(UnicodeOps.normalize("ﬁ", "NFKD") == "fi") // ﬁ ligature
  }

  test("fold: case fold + accent strip (docs examples)") {
    assert(UnicodeOps.fold("Kongreßstraße") == "kongressstrasse")
    assert(UnicodeOps.fold("Eylül") == "eylul")
    assert(UnicodeOps.fold("CAFÉ") == "cafe")
    assert(UnicodeOps.fold("plain") == "plain")
  }

  test("isUtf: overlongs, surrogates, truncation rejected") {
    assert(UnicodeOps.isUtf("héllo ✓".getBytes("UTF-8")))
    assert(UnicodeOps.isUtf(Array[Byte]()))
    assert(!UnicodeOps.isUtf(Array(0xc0.toByte, 0xaf.toByte))) // overlong
    assert(!UnicodeOps.isUtf(Array(0xed.toByte, 0xa0.toByte, 0x80.toByte))) // surrogate
    assert(!UnicodeOps.isUtf(Array(0xe2.toByte, 0x82.toByte))) // truncated
    assert(!UnicodeOps.isUtf(Array(0xff.toByte)))
  }

  test("isUnicodeSet: literal sets, ranges, negation, raises") {
    assert(UnicodeOps.isUnicodeSet("ваоао",
      "[вао]")) // docs example
    assert(!UnicodeOps.isUnicodeSet("ваоао",
      "[ваб]"))
    assert(UnicodeOps.isUnicodeSet("abc129", "[a-z0-9]"))
    assert(!UnicodeOps.isUnicodeSet("abc!", "[a-z]"))
    assert(UnicodeOps.isUnicodeSet("xyz", "[^0-9]"))
    intercept[IllegalArgumentException] {
      UnicodeOps.isUnicodeSet("x", "no-brackets")
    }
  }

  test("isUnicodeSet: property classes (unicode_base_udf.h:632)") {
    // general categories
    assert(UnicodeOps.isUnicodeSet("Кongreß", "[\\p{L}]"))
    assert(!UnicodeOps.isUnicodeSet("a1", "[\\p{L}]"))
    assert(UnicodeOps.isUnicodeSet("a1", "[\\p{L}\\p{N}]"))
    assert(UnicodeOps.isUnicodeSet("١٢٣", "[\\p{N}]")) // Arabic-Indic digits
    assert(UnicodeOps.isUnicodeSet("ABC", "[\\p{Lu}]"))
    assert(!UnicodeOps.isUnicodeSet("AbC", "[\\p{Lu}]"))
    // complement property
    assert(UnicodeOps.isUnicodeSet("!?.", "[\\P{L}]"))
    // negated set of a property
    assert(UnicodeOps.isUnicodeSet("123", "[^\\p{L}]"))
    // scripts
    assert(UnicodeOps.isUnicodeSet("привет", "[\\p{IsCyrillic}]"))
    assert(!UnicodeOps.isUnicodeSet("hello", "[\\p{IsCyrillic}]"))
    // mixed literal + property
    assert(UnicodeOps.isUnicodeSet("ab-cd", "[\\p{Ll}\\-]"))
    // ICU POSIX spelling translates
    assert(UnicodeOps.isUnicodeSet("abc", "[[:Alpha:]]"))
    assert(!UnicodeOps.isUnicodeSet("ab1", "[[:Alpha:]]"))
    // ICU POSIX classes are Unicode-wide, not US-ASCII-only
    // (UNICODE_CHARACTER_CLASS compile flag)
    assert(UnicodeOps.isUnicodeSet("абв", "[[:Alpha:]]"))
    assert(UnicodeOps.isUnicodeSet("١٢٣", "[[:Digit:]]"))
    assert(UnicodeOps.isUnicodeSet("ПРИВЕТ", "[[:Upper:]]"))
    assert(!UnicodeOps.isUnicodeSet("привет", "[[:Upper:]]"))
    assert(UnicodeOps.isUnicodeSet("aб1٢", "[[:Alnum:]]"))
    // supplementary plane: mathematical alphanumerics are \p{L}
    assert(UnicodeOps.isUnicodeSet(
      new String(Character.toChars(0x1d538)), "[\\p{L}]"))
    // empty string is vacuously inside any set
    assert(UnicodeOps.isUnicodeSet("", "[\\p{L}]"))
    // garbage property still raises a named error
    intercept[IllegalArgumentException] {
      UnicodeOps.isUnicodeSet("x", "[\\p{NoSuchProp}]")
    }
  }

  test("rfind over codepoints") {
    assert(UnicodeOps.rfind("abcabc", "bc", Long.MaxValue).contains(4L))
    assert(UnicodeOps.rfind("abcabc", "bc", 3L).contains(1L))
    assert(UnicodeOps.rfind("abc", "zz", Long.MaxValue).isEmpty)
    // non-BMP: codepoint indexing, not UTF-16 units
    assert(UnicodeOps.rfind("a😀b", "b", Long.MaxValue)
      .contains(2L))
  }

  test("replace/remove families (docs examples)") {
    assert(UnicodeOps.replaceLast("absence", "enc", "") == "abse")
    assert(UnicodeOps.removeAll("abandon", "an") == "bdo")
    assert(UnicodeOps.removeFirst("abandon", "an") == "bandon")
    assert(UnicodeOps.removeLast("abandon", "an") == "abando")
    assert(UnicodeOps.replaceFirst("aaa", "a", "b") == "baa")
    assert(UnicodeOps.replaceAll("aaa", "a", "b") == "bbb")
  }

  test("codepoint lists + split/join") {
    assert(UnicodeOps.toCodePointList("aБ").toSeq == Seq(97L, 1041L))
    assert(UnicodeOps.fromCodePointList(Array(99L, 111L, 100L, 101L)) ==
      "code")
    assert(UnicodeOps.splitToList("a,b,,c", ",").toSeq ==
      Seq("a", "b", "", "c"))
    assert(UnicodeOps.splitToList("abc", "").toSeq == Seq("abc"))
  }

  test("levenstein over codepoints") {
    assert(UnicodeOps.levenstein("kitten", "sitting") == 3L)
    assert(UnicodeOps.levenstein("", "abc") == 3L)
    // each emoji is ONE codepoint
    assert(UnicodeOps.levenstein("😀", "😁") == 1L)
  }

  test("toUint64: bases, wrap, garbage (docs examples)") {
    assert(UnicodeOps.toUint64("77741", 0) == 77741L)
    assert(UnicodeOps.toUint64("-77741", 0) == -77741L) // 2^64-77741 bits
    assert(java.lang.Long.toUnsignedString(
      UnicodeOps.toUint64("-77741", 0)) == "18446744073709473875")
    assert(UnicodeOps.toUint64("0xFF", 0) == 255L)
    assert(UnicodeOps.toUint64("010", 0) == 8L) // strtoull octal
    assert(UnicodeOps.toUint64("ff", 16) == 255L)
    assert(UnicodeOps.toUint64(
      "18446744073709551615", 0) == -1L) // u64 max
    intercept[NumberFormatException] {
      UnicodeOps.toUint64("asdh831", 0)
    }
  }
}
