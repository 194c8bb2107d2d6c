package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.queries.QL

/** QL operator semantics on the reference's minimal fixture shape
  * (FIXTURES.md A.2: rows {a: i, b: 10*i}, mirroring
  * test_query.py test_simple/test_project1/test_group_by1) plus
  * smoke checks of every queries() entry on sf0.001.
  */
class QLSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ab = (1 to 9).map(i => (i.toLong, 10L * i)).toDF("a", "b")

  test("project arithmetic: 2*a + b - 1 as s (test_project1)") {
    val got = ab.select((col("a") * 2 + col("b") - 1).as("s"))
      .orderBy("s").as[Long].collect().toSeq
    assert(got == (1 to 9).map(i => 2L * i + 10L * i - 1))
  }

  test("group by with sum (test_group_by1)") {
    val got = ab.groupBy((col("a") % 2).as("g")).agg(sum("b").as("s"))
      .orderBy("g").as[(Long, Long)].collect().toSeq
    // odd a: 1,3,5,7,9 -> 250; even a: 2,4,6,8 -> 200
    assert(got == Seq((0L, 200L), (1L, 250L)))
  }

  test("order by + limit is total (top-k)") {
    val got = ab.orderBy(col("b").desc).limit(3).select("a")
      .as[Long].collect().toSeq
    assert(got == Seq(9L, 8L, 7L))
  }

  test("with-totals rollup emits group rows plus one grand total") {
    val rows = ab.rollup((col("a") % 2).as("g")).agg(sum("b").as("s")).collect()
    assert(rows.length == 3)
    val total = rows.find(_.isNullAt(0)).get.getLong(1)
    assert(total == 450L)
  }

  test("left join keeps unmatched rows with nulls") {
    val dim = Seq((1L, "x"), (2L, "y")).toDF("a", "name")
    val got = ab.join(dim, Seq("a"), "left")
    assert(got.count() == 9)
    assert(got.filter(col("name").isNull).count() == 7)
  }

  test("every SparkEntry query runs non-empty on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("oracle keys are a subset of query keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("bench headline keys exist and the JSON line fits the driver's tail capture") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline keys without queries: $missing")
    // bench-only operator overrides must shadow real correctness keys
    val orphan = (graft.queries.Llm.benchOnly ++ graft.queries.Yql.benchOnly)
      .keys.filterNot(SparkEntry.queries.contains)
    assert(orphan.isEmpty, s"benchOnly keys without queries: $orphan")
    // worst case: every headline query present at 999.999s (base covers
    // the fixed fields incl. "stat":"median3")
    val worst = 110 + Bench.headline.map(k => k.length + 12).sum
    assert(worst < 1850, s"worst-case bench line $worst chars — trim the headline")
  }
}
