package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.{QLFunctions => F, Uint64 => U}

/** Reference-semantics scenarios ported from the QL engine's own test
  * corpus (yt/yt/library/query/unittests/ql_query_ut.cpp pattern:
  * literal rows + query + expected rows; integration cases
  * dynamic_tables/test_query.py).
  */
class QLSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("join on common key prefix behaves as merge join (test_query.py:697)") {
    // both tables keyed by (a, b) — join on the shared prefix a
    val left = Seq((1L, 10L, "l1"), (1L, 11L, "l2"), (2L, 20L, "l3"), (3L, 30L, "l4"))
      .toDF("a", "b", "lv")
    val right = Seq((1L, 100L, "r1"), (2L, 200L, "r2"), (4L, 400L, "r3"))
      .toDF("a", "c", "rv")
    val got = left.join(right, Seq("a"))
      .orderBy("a", "b").select("a", "b", "lv", "rv").collect()
    assert(got.toSeq == Seq(
      Row(1L, 10L, "l1", "r1"), Row(1L, 11L, "l2", "r1"),
      Row(2L, 20L, "l3", "r2")))
  }

  test("left join keeps unmatched primary rows with nulls (ast.h:445 IsLeft)") {
    val left = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val right = Seq((1L, 5.0)).toDF("k", "w")
    val got = left.join(right, Seq("k"), "left").orderBy("k").collect()
    assert(got.toSeq == Seq(Row(1L, "x", 5.0), Row(2L, "y", null)))
  }

  test("tuple BETWEEN is lexicographic over the key prefix (ast.h:319 range literals)") {
    val t = Seq((1L, 1L), (1L, 5L), (2L, 0L), (2L, 9L), (3L, 3L), (4L, 0L))
      .toDF("a", "b")
    // QL: (a, b) BETWEEN (1, 4) AND (3, 3) — lexicographic tuple range
    val got = t.filter(
        struct(col("a"), col("b")) >= struct(lit(1L), lit(4L)) &&
        struct(col("a"), col("b")) <= struct(lit(3L), lit(3L)))
      .orderBy("a", "b").collect()
    assert(got.toSeq == Seq(Row(1L, 5L), Row(2L, 0L), Row(2L, 9L), Row(3L, 3L)))
  }

  test("IN over tuple list hits exact keys (IsRowInRowset, cg_routines.cpp:1951)") {
    val t = Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 1L, "c")).toDF("a", "b", "v")
    val got = t.filter(struct(col("a"), col("b"))
        .isin(struct(lit(1L), lit(2L)), struct(lit(2L), lit(1L))))
      .orderBy("a").select("v").as[String].collect()
    assert(got.toSeq == Seq("b", "c"))
  }

  test("integer division by zero throws, as QL does (cg_routines ThrowQueryException)") {
    // Spark 4 runs ANSI mode by default — same contract as QL.
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val t = Seq((10L, 0L)).toDF("a", "b")
    val e = intercept[Exception] { t.select(col("a") / col("b")).collect() }
    assert(e.getMessage.toLowerCase.contains("divide") ||
      e.getMessage.contains("DIVIDE_BY_ZERO"))
  }

  test("uint64 ordering: a value with the top bit set sorts above Long.MaxValue") {
    // QL: 18446744073709551615u (= -1 as raw bits) is the largest uint64
    val t = Seq(-1L, 0L, 1L, Long.MaxValue, Long.MinValue).toDF("u")
    val got = t.orderBy(U.u64_sort(col("u"))).as[Long].collect()
    assert(got.toSeq == Seq(0L, 1L, Long.MaxValue, Long.MinValue, -1L))
  }

  test("TRANSFORM with default falls through unmapped values (ast.h:337)") {
    val t = Seq("a", "b", "z").toDF("x")
    val got = t.select(F.transform_value(col("x"),
      Seq("a", "b"), Seq("A", "B"), lit("?")).as("y")).as[String].collect()
    assert(got.toSeq == Seq("A", "B", "?"))
  }

  test("group by with null keys groups nulls together (SQL semantics)") {
    val t = Seq((Some(1L), 10.0), (None, 1.0), (None, 2.0), (Some(1L), 5.0))
      .toDF("k", "v")
    val got = t.groupBy("k").agg(sum("v").as("s")).orderBy(asc_nulls_first("k")).collect()
    assert(got.toSeq == Seq(Row(null, 3.0), Row(1L, 15.0)))
  }

  test("WITH TOTALS BeforeHaving totals all groups, AfterHaving only survivors") {
    val t = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0)).toDF("k", "v")
    val groups = t.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
    val before = groups.filter(col("c") >= 2).unionByName(
      groups.agg(lit(null).cast("string").as("k"), sum("s").as("s"), sum("c").as("c")))
    val after = {
      val surv = groups.filter(col("c") >= 2)
      surv.unionByName(surv.agg(lit(null).cast("string").as("k"),
        sum("s").as("s"), sum("c").as("c")))
    }
    assert(before.orderBy(asc_nulls_first("k")).collect().toSeq ==
      Seq(Row(null, 13.0, 3L), Row("a", 3.0, 2L)))
    assert(after.orderBy(asc_nulls_first("k")).collect().toSeq ==
      Seq(Row(null, 3.0, 2L), Row("a", 3.0, 2L)))
  }
}
