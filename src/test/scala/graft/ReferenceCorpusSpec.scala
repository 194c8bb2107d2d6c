package graft

import org.apache.spark.sql.Row
import graft.ql.SelectRows

/** The reference's own QL integration tests
  * (yt/yt/tests/integration/dynamic_tables/test_query.py:126-460)
  * ported verbatim: same fixture (`_sample_data`: a=i, b=10·i for
  * i in 1..9, key-sorted), same QL strings through [[SelectRows]],
  * same expected rows.
  */
class ReferenceCorpusSpec extends SparkSpec {
  import spark.implicits._

  // _sample_data (test_query.py:64-76), key-sorted single tablet
  private lazy val t = (1 to 9).map(i => (i.toLong, 10L * i))
    .toDF("a", "b").repartition(1).sortWithinPartitions("a")

  private def q(ql: String) = SelectRows(spark, ql, Map("//tmp/t" -> t))

  test("test_simple: 'a, b from [t]' returns every row") {
    assert(q("a, b from [//tmp/t]").count() == 9)
  }

  test("test_project1: '2 * a + b - 1 as s'") {
    val expected = (1 to 9).map(i => 2L * i + 10L * i - 1)
    val got = q("2 * a + b - 1 as s from [//tmp/t]").as[Long].collect().sorted
    assert(got.toSeq == expected.sorted)
    val limited = q("2 * a + b - 1 as s from [//tmp/t] limit 1000").as[Long].collect()
    assert(limited.sorted.toSeq == expected.sorted)
  }

  test("test_group_by1: 'sum(b) as s ... group by 1 as k' → one global group") {
    val got = q("sum(b) as s from [//tmp/t] group by 1 as k")
      .select("s").as[Long].collect()
    assert(got.toSeq == Seq(450L))
  }

  test("test_group_by2: 'k, sum(b) as s ... group by a % 2 as k'") {
    val got = q("k, sum(b) as s from [//tmp/t] group by a % 2 as k")
      .orderBy("k").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 200L), (1L, 250L)))
  }

  test("test_response_parameters query shape: totals + limit") {
    val got = q("sum(1) as c from [//tmp/t] group by b with totals limit 10")
    assert(got.count() == 10) // 9 groups + totals row
  }

  test("test_limit: limit without order reads in key order") {
    val got = q("* from [//tmp/t] limit 1").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 10L)))
  }

  test("test_order_by: where + order by + limit / offset-limit") {
    // deterministic stand-in for the reference's shuffled values
    val rnd = new scala.util.Random(7)
    val vs = rnd.shuffle((0 until 300).toList)
    val data = (0 until 100).map(i => (i.toLong, vs(i).toLong, (i * 37 % 1000).toLong))
    val ot = data.toDF("k", "v", "u")
    val filtered = data.filter(_._3 > 500).sortBy(_._2)
    val expect10 = filtered.take(10).map(r => (r._1, r._2))
    val got = SelectRows(spark,
      "k, v from [//tmp/ot] where u > 500 order by v limit 10",
      Map("//tmp/ot" -> ot)).as[(Long, Long)].collect()
    assert(got.toSeq == expect10)

    val expectOff = filtered.slice(20, 30).map(r => (r._1, r._2))
    val got2 = SelectRows(spark,
      "k, v from [//tmp/ot] where u > 500 order by v offset 20 limit 10",
      Map("//tmp/ot" -> ot)).as[(Long, Long)].collect()
    assert(got2.toSeq == expectOff)
  }
}
