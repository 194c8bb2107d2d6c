package graft

import graft.functions.YqlSql

/** AGGREGATE_BY / MULTI_AGGREGATE_BY / AggregationFactory
  * (builtins/aggregation.md#aggregate-by, basic.md#aggregationfactory). */
class AggregateBySpec extends SparkSpec {

  import spark.implicits._

  test("AGGREGATE_BY applies a named factory; DISTINCT; parameters") {
    Seq(1, 2, 2, 3, 3, 3).toDF("v").createOrReplaceTempView("ab")
    val r = YqlSql.sql(spark,
      """$cnt = AggregationFactory("COUNT");
        |SELECT
        |  AGGREGATE_BY(v, $cnt) AS c,
        |  AGGREGATE_BY(DISTINCT v, $cnt) AS cd,
        |  AGGREGATE_BY(v, AggregationFactory("sum")) AS s,
        |  AGGREGATE_BY(v, AggregationFactory("percentile", 0.5)) AS p50,
        |  AGGREGATE_BY(v, AggregationFactory("median")) AS med
        |FROM ab""".stripMargin).head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L && r.getLong(2) == 14L)
    assert(r.getDouble(3) == 2.5 && r.getDouble(4) == 2.5)
  }

  test("MULTI_AGGREGATE_BY: item-by-item, shortest list wins") {
    // lists of different lengths: result truncates to the shortest (2)
    Seq(Seq(1, 10, 100), Seq(3, 30), Seq(5, 50, 500, 5000))
      .toDF("nums").createOrReplaceTempView("mab")
    val r = YqlSql.sql(spark,
      """SELECT
        |  MULTI_AGGREGATE_BY(nums, AggregationFactory("count")) AS c,
        |  MULTI_AGGREGATE_BY(nums, AggregationFactory("min")) AS mn,
        |  MULTI_AGGREGATE_BY(nums, AggregationFactory("max")) AS mx,
        |  MULTI_AGGREGATE_BY(nums, AggregationFactory("sum")) AS s,
        |  MULTI_AGGREGATE_BY(nums, AggregationFactory("avg")) AS a
        |FROM mab""".stripMargin).head()
    assert(r.getSeq[Long](0) == Seq(3L, 3L))
    assert(r.getSeq[Int](1) == Seq(1, 10))
    assert(r.getSeq[Int](2) == Seq(5, 50))
    assert(r.getSeq[Int](3) == Seq(9, 90))
    assert(r.getSeq[Double](4) == Seq(3.0, 30.0))
  }

  test("MULTI_AGGREGATE_BY percentile: exact linear interpolation") {
    Seq(Seq(1.0, 100.0), Seq(2.0, 200.0), Seq(3.0, 300.0),
      Seq(4.0, 400.0)).toDF("nums").createOrReplaceTempView("mabp")
    val r = YqlSql.sql(spark,
      """SELECT MULTI_AGGREGATE_BY(nums,
        |  AggregationFactory("percentile", 0.5)) AS p
        |FROM mabp""".stripMargin).head()
    assert(r.getSeq[Double](0) == Seq(2.5, 250.0))
  }

  test("raises: bad factory, unsupported multi factory, DISTINCT multi") {
    Seq(Seq(1)).toDF("nums").createOrReplaceTempView("mabr")
    def bad(q: String, frag: String): Unit = {
      val e = intercept[Exception](YqlSql.sql(spark, q).collect())
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("SELECT AGGREGATE_BY(nums, 42) FROM mabr",
      "must be AggregationFactory")
    bad("SELECT MULTI_AGGREGATE_BY(nums, AggregationFactory('topfreq')) " +
      "FROM mabr", "supports count/min/max/sum/avg")
    bad("SELECT MULTI_AGGREGATE_BY(DISTINCT nums, " +
      "AggregationFactory('count')) FROM mabr", "does not take DISTINCT")
  }
}
