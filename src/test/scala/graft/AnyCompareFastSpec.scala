package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.Yson

/** Differential audit of the streaming Any comparator against the
  * Jackson tree comparison it replaced on the hot path: for every pair
  * drawn from a generated corpus of canonical-JSON values (all ranks,
  * escapes, nesting, numeric edges), the two must return the same sign.
  * The tree path stays the semantics reference; the streaming path may
  * punt to it (objects, long overflow) but must never disagree.
  */
class AnyCompareFastSpec extends AnyFunSuite {
  private def cmpFast(l: String, r: String): Int =
    Integer.signum(Yson.compareAnyJson(
      UTF8String.fromString(l), UTF8String.fromString(r)))
  private def cmpTree(l: String, r: String): Int =
    Integer.signum(Yson.compareAnyJsonTree(
      UTF8String.fromString(l), UTF8String.fromString(r)))

  private val scalars = Seq(
    "null", "0", "1", "-1", "7", "42", "-42",
    "9223372036854775807", "-9223372036854775808",
    "18446744073709551610", // > Long.MaxValue: forces the fallback
    "0.0", "-0.0", "1.5", "-2.25", "1e3", "-1.5E-2", "3.0",
    "true", "false",
    "\"\"", "\"a\"", "\"ab\"", "\"b\"", "\"é\"", "\"日本\"",
    "\"a\\nb\"", "\"a\\u0041b\"", "\"q\\\"x\"", "\"back\\\\slash\"",
    "\"nul\\u0000byte\"")

  private val composites = Seq(
    "[]", "[1]", "[1,2]", "[1,2,3]", "[2,1]", "[1,[2,3]]", "[[1,2],[3]]",
    "[[],[]]", "[[1],[1]]", "[[1,2],[1,2]]", "[null,1]", "[\"a\",\"b\"]",
    "[1,\"a\",true,null,2.5]", "[[1,2],3]", "[[[1]]]", "[ 1 , 2 ]",
    "{\"k\":1}", "{\"k\":1,\"j\":[2]}", "{}")

  private val corpus = scalars ++ composites

  test("streaming comparator agrees with the tree comparison on every pair") {
    for (l <- corpus; r <- corpus) {
      assert(cmpFast(l, r) == cmpTree(l, r),
        s"disagree on ($l, $r): fast=${cmpFast(l, r)} tree=${cmpTree(l, r)}")
    }
  }

  test("antisymmetry and nested-equal-array resume") {
    // regression shape: an inner all-equal array must leave the outer
    // scan positioned after its terminator
    assert(cmpFast("[[1,2],3]", "[[1,2],4]") == -1)
    assert(cmpFast("[[1,2],4]", "[[1,2],3]") == 1)
    assert(cmpFast("[[1,2],[3]]", "[[1,2],[3]]") == 0)
    assert(cmpFast("[[],1]", "[[],1]") == 0)
    assert(cmpFast("[[],1]", "[[],2]") == -1)
  }

  test("randomized lists agree") {
    val rnd = new scala.util.Random(4242)
    def value(depth: Int): String = rnd.nextInt(if (depth > 2) 8 else 10) match {
      case 0 => "null"
      case 1 => rnd.nextInt(5).toString
      case 2 => (rnd.nextInt(5) - 2).toString + ".5"
      case 3 => if (rnd.nextBoolean()) "true" else "false"
      case 4 => "\"" + ("ab" * rnd.nextInt(3)) + "\""
      case 5 => rnd.nextLong().toString
      case 6 => "\"x\\t" + rnd.nextInt(3) + "\""
      case 7 => rnd.nextInt(3).toString
      case _ =>
        (0 until rnd.nextInt(4)).map(_ => value(depth + 1))
          .mkString("[", ",", "]")
    }
    for (_ <- 0 until 3000) {
      val (l, r) = (value(0), value(0))
      assert(cmpFast(l, r) == cmpTree(l, r), s"disagree on ($l, $r)")
    }
  }
}
