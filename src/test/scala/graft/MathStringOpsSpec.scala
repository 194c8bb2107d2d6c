package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{MathOps, StringOps}

/** Pure-function pins for the Math::/String:: long tails
  * (udfs/common/{math,string}; the SQL-surface halves ride the
  * yql_fn_math_tail / yql_fn_string_tail oracles). */
class MathStringOpsSpec extends AnyFunSuite {

  private def approx(a: Double, b: Double, eps: Double = 1e-12): Unit =
    assert(math.abs(a - b) <= eps * math.max(1.0, math.abs(b)),
      s"$a !~ $b")

  test("erf/erfc known values and symmetry") {
    approx(MathOps.erf(0.5), 0.5204998778130465)
    approx(MathOps.erf(1.0), 0.8427007929497149)
    approx(MathOps.erf(2.5), 0.999593047982555)
    approx(MathOps.erf(-1.5), -0.9661051464753107)
    assert(MathOps.erf(0.0) == 0.0)
    assert(MathOps.erf(10.0) == 1.0)
    approx(MathOps.erfc(2.0), 0.004677734981063127)
    approx(MathOps.erfc(5.0), 1.5374597944280351e-12, 1e-9)
    assert(MathOps.erf(Double.NaN).isNaN)
  }

  test("erfInv/erfcInv roundtrip + edges") {
    for (u <- Seq(-0.999, -0.75, -0.1, 1e-8, 0.3, 0.9, 0.99999))
      approx(MathOps.erf(MathOps.erfInv(u)), u, 1e-13)
    assert(MathOps.erfInv(1.0).isPosInfinity)
    assert(MathOps.erfInv(-1.0).isNegInfinity)
    assert(MathOps.erfInv(1.5).isNaN)
    approx(MathOps.erfcInv(0.5), MathOps.erfInv(0.5))
    assert(MathOps.erfcInv(0.0).isPosInfinity)
    assert(MathOps.erfcInv(2.0).isNegInfinity)
  }

  test("tgamma/lgamma: factorials, reflection, poles") {
    approx(MathOps.tgamma(6.0), 120.0)
    approx(MathOps.tgamma(0.5), math.sqrt(math.Pi))
    approx(MathOps.tgamma(-0.5), -2.0 * math.sqrt(math.Pi))
    assert(MathOps.tgamma(-3.0).isNaN) // pole
    approx(MathOps.lgamma(4.5), 2.4537365708424423)
    approx(MathOps.lgamma(0.25), 1.2880225246980774)
    assert(MathOps.lgamma(0.0).isPosInfinity)
  }

  test("EscapeC/UnescapeC: escape.cpp rules") {
    def esc(s: String) = StringOps.escapeC(s.getBytes("UTF-8"))
    assert(esc("a\"b\\c") == "a\\\"b\\\\c")
    assert(esc("t\tr\rn\n") == "t\\tr\\rn\\n")
    // one-digit octal for c<8 when next is not an octal digit
    assert(StringOps.escapeC(Array[Byte](1, 'x')) == "\\1x")
    // 3-digit octal when next IS an octal digit
    assert(StringOps.escapeC(Array[Byte](1, '7')) == "\\0017")
    // \xHH when next is not a hex digit
    assert(StringOps.escapeC(Array[Byte](0x1f, 'z')) == "\\x1Fz")
    // trigraph guard: "??" escapes the first '?'
    assert(esc("a??b") == "a\\x3F?b")
    assert(StringOps.unescapeC(esc("mixed\t\"\\  end")) ==
      "mixed\t\"\\  end")
    assert(StringOps.unescapeC("\\101\\x42\\n") == "AB\n")
  }

  test("html/cgi escape pairs") {
    assert(StringOps.encodeHtml("<a b=\"c\">&'") ==
      "&lt;a b=&quot;c&quot;&gt;&amp;&#39;")
    assert(StringOps.decodeHtml("&lt;&gt;&amp;&quot;&#39;&apos;") ==
      "<>&\"''")
    assert(StringOps.cgiEscape("a b/c?=%".getBytes("UTF-8")) ==
      "a+b/c%3F%3D%25")
    assert(StringOps.cgiUnescape("a+b/c%3F%3D%25") == "a b/c?=%")
  }

  test("Collapse/CollapseText limits") {
    assert(StringOps.collapse("a  b\t\tc") == "a b c")
    // collapse only touches the first maxLen chars; tail is verbatim
    assert(StringOps.collapse("a  b  c  d", 6) == "a b c  d")
    // cut to maxLen-5=7 ("one two"), then back to the last " .,;"
    // boundary, which is ALSO dropped: "one" + " ..."
    assert(StringOps.collapseText("one two three four five", 12) ==
      "one ...")
    assert(StringOps.collapseText("short", 12) == "short")
  }

  test("Hex/Bin/HexText/BinText widths") {
    assert(StringOps.hexU64(255L) == "0x00000000000000FF")
    assert(StringOps.hexU64(-1L) == "0xFFFFFFFFFFFFFFFF") // u64 max
    assert(StringOps.hexI64(-255L) == "-0x00000000000000FF")
    assert(StringOps.binU64(5L) ==
      "0b" + "0" * 61 + "101")
    assert(StringOps.binI64(-5L) == "-0b" + "0" * 61 + "101")
    assert(StringOps.hexText("AB".getBytes("UTF-8")) == "41 42")
    assert(StringOps.binText(Array[Byte](5, -1)) == "00000101 11111111")
  }

  test("Prec: PREC_NDIGITS converter shapes") {
    assert(StringOps.prec(1234.5678, 4) == "1235")
    assert(StringOps.prec(1234.5678, 6) == "1234.57")
    assert(StringOps.prec(0.000123456, 4) == "0.0001235")
    assert(StringOps.prec(0.0000123, 3) == "1.23e-05")
    assert(StringOps.prec(123456789.0, 3) == "1.23e+08")
    assert(StringOps.prec(-2.5, 2) == "-2.5")
    assert(StringOps.prec(0.0, 5) == "0")
    assert(StringOps.prec(Double.NaN, 3) == "nan")
    assert(StringOps.prec(Double.NegativeInfinity, 3) == "-inf")
  }

  test("HumanReadable bytes/quantity/duration") {
    assert(StringOps.humanReadableSize(1234567890.0, bytes = true) ==
      "1.15GiB")
    assert(StringOps.humanReadableSize(1234567890.0, bytes = false) ==
      "1.23G")
    assert(StringOps.humanReadableSize(512.0, bytes = true) == "512B")
    assert(StringOps.humanReadableSize(-2048.0, bytes = true) == "-2KiB")
    assert(StringOps.humanReadableDuration(93784000000L) == "1d 2h 3m 4s")
    assert(StringOps.humanReadableDuration(1500L) == "1.5ms")
    assert(StringOps.humanReadableDuration(999L) == "999us")
    assert(StringOps.humanReadableDuration(45000000L) == "45s")
  }

  test("base64 lenient vs strict") {
    val b = "hello".getBytes("UTF-8") // 5 bytes -> padded base64
    val enc = java.util.Base64.getEncoder.encodeToString(b)
    assert(StringOps.base64Decode(enc, strict = true).sameElements(b))
    // lenient: url-safe alphabet, whitespace, missing padding
    val urlSafe = enc.replace('+', '-').replace('/', '_')
      .replace("=", "") + "\n"
    assert(StringOps.base64Decode(urlSafe, strict = false).sameElements(b))
    intercept[IllegalArgumentException] {
      StringOps.base64Decode(enc.replace("=", ""), strict = true)
    }
  }

  test("RemoveFirst/RemoveLast/AsciiToTitle") {
    assert(StringOps.removeFirst("a-b-c", "-") == "ab-c")
    assert(StringOps.removeLast("a-b-c", "-") == "a-bc")
    assert(StringOps.removeFirst("abc", "-") == "abc")
    assert(StringOps.removeFirst("xAyB", "BA") == "xyB")
    assert(StringOps.asciiToTitle("hELLO wORLD") == "Hello world")
    assert(StringOps.asciiToTitle("") == "")
  }
}
